"""Equivariant layer normalization (reference E3LayerNorm,
tensor_decomposition.py:685-807): per-chunk statistics — scalars get mean
subtraction, every channel is scaled by the RMS of its norm over the batch
feature, with learnable per-channel weight and scalar bias."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .irreps import Irreps


class E3LayerNorm(fnn.Module):
    irreps_in: Irreps
    eps: float = 1e-5
    affine: bool = True
    subtract_mean: bool = True
    divide_norm: bool = False
    normalization: str = "component"

    @fnn.compact
    def __call__(self, x):
        irreps = Irreps(self.irreps_in)
        out = []
        w_idx = b_idx = 0
        for sl, (mul, ir) in zip(irreps.slices(), irreps):
            c = x[..., sl].reshape(x.shape[:-1] + (mul, ir.dim))
            if self.subtract_mean and ir.l == 0:
                c = c - jnp.mean(c, axis=-2, keepdims=True)
            norm2 = jnp.mean(jnp.sum(c * c, axis=-1), axis=-1, keepdims=True)
            if self.normalization == "component":
                norm2 = norm2 / ir.dim
            field_norm = jnp.reciprocal(jnp.sqrt(norm2 + self.eps))
            if self.divide_norm:
                field_norm = field_norm / np.sqrt(ir.dim)
            c = c * field_norm[..., None]
            if self.affine:
                w = self.param(f"w{w_idx}", fnn.initializers.ones, (mul,))
                c = c * w[:, None]
                w_idx += 1
                if ir.l == 0:
                    b = self.param(f"b{b_idx}", fnn.initializers.zeros, (mul,))
                    c = c + b[:, None]
                    b_idx += 1
            out.append(c.reshape(x.shape[:-1] + (mul * ir.dim,)))
        return jnp.concatenate(out, axis=-1)
