"""Real spherical harmonics (e3nn convention) evaluated in JAX.

Matches the composite behavior of the reference's edge encoding
(/root/reference/hamgnn/toolbox/nequip/nn/embedding/_edge.py:45,59-67):
a physical Cartesian edge vector is internally reindexed to (y, z, x) and the
standard real spherical harmonics are evaluated with ``component``
normalization (|Y_l|^2 = 2l+1 on the unit sphere, m ordered -l..l).

Construction: CG recursion Y_l = c_l * w3j(l-1,1,l) . (Y_{l-1} (x) Y_1), with
the positive scale c_l fixed so the component normalization holds exactly —
this is the same generating recursion e3nn uses, so signs agree with the
standard real-SH table (verified in tests against explicit l<=3 formulas).
All constants are precomputed host-side; the JAX path is a short chain of
small einsums that XLA fuses into the surrounding kernels.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .wigner import wigner_3j


@functools.lru_cache(maxsize=None)
def _recursion_constants(lmax: int):
    """Per-l (w3j matrix, scale) so that |Y_l|^2 = 2l+1 exactly."""
    consts = []
    # evaluate recursion at a fixed generic unit vector to fix scales
    v = np.array([0.2672612419124244, 0.5345224838248488, 0.8017837257372732])
    q = v[[1, 2, 0]]
    y_prev = np.sqrt(3.0) * q
    for l in range(2, lmax + 1):
        C = wigner_3j(l - 1, 1, l)
        y_raw = np.einsum("i,j,ijk->k", y_prev, np.sqrt(3.0) * q, C)
        scale = float(np.sqrt((2 * l + 1) / np.dot(y_raw, y_raw)))
        consts.append((C, scale))
        y_prev = y_raw * scale
    return consts


def spherical_harmonics(ls: Sequence[int], vectors, normalize: bool = True,
                        eps: float = 1e-12):
    """Evaluate real SH for each l in ``ls`` on physical Cartesian vectors.

    Args:
      ls: list of l values (need not be contiguous; computed up to max).
      vectors: (..., 3) physical Cartesian vectors (x, y, z).
      normalize: normalize input vectors to the unit sphere first.

    Returns:
      (..., sum(2l+1)) concatenation in the order of ``ls``.
    """
    lmax = max(ls) if ls else 0
    v = jnp.asarray(vectors)
    if normalize:
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(n, eps)
    q = v[..., jnp.array([1, 2, 0])]  # (y, z, x) SH ordering

    ys = {0: jnp.ones(v.shape[:-1] + (1,), dtype=v.dtype)}
    if lmax >= 1:
        y1 = jnp.sqrt(jnp.asarray(3.0, dtype=v.dtype)) * q
        ys[1] = y1
        consts = _recursion_constants(lmax)
        y_prev = y1
        for l in range(2, lmax + 1):
            C, scale = consts[l - 2]
            Cj = jnp.asarray(scale * C, dtype=v.dtype)
            # (..., 2l-1) x (..., 3) -> (..., 2l+1); small einsum, fused by XLA
            y_prev = jnp.einsum("...i,...j,ijk->...k", y_prev, y1, Cj)
            ys[l] = y_prev
    return jnp.concatenate([ys[l] for l in ls], axis=-1)
