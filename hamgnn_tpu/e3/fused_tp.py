"""Fused spherical-harmonic tensor product: the TPU-native hot-path kernel.

The reference's e3nn ``o3.TensorProduct`` enumerates ~100+ weighted CG
instructions per block and executes them one-by-one (message_passing.py:80-97);
a direct port generates tens of thousands of HLO ops per layer (slow compile,
fragmented execution).  Here the feature (x) SH coupling is restructured as:

  1. per input chunk (mul, l1): a constant coupling tensor
     ``C[j, i, k]`` over all SH components j and all allowed output columns k
     (one (l2 -> l3) path per column), built host-side from Wigner-3j;
  2. at runtime, ``W[b] = einsum('bj,jik->bik', sh, C)`` — one small einsum —
     followed by ``out[b] = einsum('bui,bik->buk', x_chunk, W)`` — a batched
     GEMM over edges that XLA tiles onto the MXU.

Channel mixing moves into the equivariant Linear that follows (already a block
matmul), so the per-path ``uvw`` weights of the reference are generalized by a
full channel-mixing map — same function space, two orders of magnitude fewer
ops.  Each TP is ~2 einsums per distinct input chunk instead of ~10 per
instruction.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .irreps import Irrep, Irreps, MulIrrep
from .wigner import wigner_3j


@functools.lru_cache(maxsize=None)
def _coupling_tensor(l1: int, p1: int, sh_key: Tuple[Tuple[int, int], ...],
                     target_key: Tuple[Tuple[int, int], ...]):
    """Constant C[j, i, k] coupling SH components to output columns.

    j: SH component index (concatenated over sh irreps);
    i: m1 index (2l1+1);
    k: concatenated output columns, one (2l3+1)-block per allowed (l2, l3).

    Returns (C, out_irreps_per_column) with component normalization
    alpha = sqrt(2l3+1) per path (w3j tensors are sum-normalized).
    """
    sh_irreps = [Irrep(l, p) for l, p in sh_key]
    target = [Irrep(l, p) for l, p in target_key]
    target_set = set(target)

    S = sum(ir.dim for ir in sh_irreps)
    cols: List[Tuple[int, Irrep, int]] = []  # (sh offset j0, ir_out, l2)
    j0 = 0
    for ir_sh in sh_irreps:
        for ir3 in Irrep(l1, p1) * ir_sh:
            if ir3 in target_set:
                cols.append((j0, ir3, ir_sh.l))
        j0 += ir_sh.dim
    # group columns by output irrep so each group flattens into one
    # (mul * n_cols) x ir3 chunk
    cols.sort(key=lambda t: t[1])

    d1 = 2 * l1 + 1
    K = sum(ir3.dim for _, ir3, _ in cols)
    C = np.zeros((S, d1, K))
    k0 = 0
    groups: List[Tuple[Irrep, int, int, int]] = []  # (ir3, n_cols, k_start, k_end)
    for j0, ir3, l2 in cols:
        w = wigner_3j(l1, l2, ir3.l) * np.sqrt(ir3.dim)  # (d1, 2l2+1, d3)
        C[j0 : j0 + 2 * l2 + 1, :, k0 : k0 + ir3.dim] = np.transpose(w, (1, 0, 2))
        if groups and groups[-1][0] == ir3:
            ir_, n_, s_, _ = groups[-1]
            groups[-1] = (ir_, n_ + 1, s_, k0 + ir3.dim)
        else:
            groups.append((ir3, 1, k0, k0 + ir3.dim))
        k0 += ir3.dim
    return np.ascontiguousarray(C), tuple(groups)


class SHTensorProductExpansion(fnn.Module):
    """Unweighted channel-preserving CG expansion of features with edge SH.

    __call__(x, sh): x (..., irreps_in.dim), sh (..., sh_dim) ->
    (..., irreps_mid.dim) where irreps_mid has, per input chunk (mul, l1), a
    (mul, l3) chunk for every allowed (l2 -> l3) path into ``target_irreps``.
    """

    irreps_in: Irreps
    irreps_sh: Irreps
    target_irreps: Irreps

    @staticmethod
    def mid_irreps(irreps_in, irreps_sh, target_irreps) -> Irreps:
        irreps_in = Irreps(irreps_in)
        sh_key = tuple((mi.ir.l, mi.ir.p) for mi in Irreps(irreps_sh))
        t_key = tuple((mi.ir.l, mi.ir.p) for mi in Irreps(target_irreps))
        out = []
        for mul, ir1 in irreps_in:
            _, groups = _coupling_tensor(ir1.l, ir1.p, sh_key, t_key)
            for ir3, n_cols, _, _ in groups:
                out.append(MulIrrep(mul * n_cols, ir3))
        return Irreps(out)

    def __call__(self, x, sh):
        outs = [
            c.reshape(c.shape[:-2] + (mul * c.shape[-1],))
            for mul, _, c in self.chunk_call(x, sh)
        ]
        return jnp.concatenate(outs, axis=-1)

    def chunk_call(self, x, sh):
        """Streaming variant: list of ``(mul * n_cols, ir3, chunk)`` with chunk
        shape (..., mul * n_cols, ir3.dim) — no concatenated mid tensor.

        Feed these into ``Linear.call_chunks`` / ``ElementwiseChannelScale
        .call_chunks`` so the wide mid-irreps vector (O(10k) columns for
        production feature sets) is never materialized in HBM.
        """
        irreps_in = Irreps(self.irreps_in)
        sh_key = tuple((mi.ir.l, mi.ir.p) for mi in Irreps(self.irreps_sh))
        t_key = tuple((mi.ir.l, mi.ir.p) for mi in Irreps(self.target_irreps))
        chunks = []
        for sl, (mul, ir1) in zip(irreps_in.slices(), irreps_in):
            C, groups = _coupling_tensor(ir1.l, ir1.p, sh_key, t_key)
            if C.shape[-1] == 0:
                continue
            xc = x[..., sl].reshape(x.shape[:-1] + (mul, ir1.dim))
            Cj = jnp.asarray(C, x.dtype)
            W = jnp.einsum("...j,jik->...ik", sh, Cj)
            out = jnp.einsum("...ui,...ik->...uk", xc, W)
            # split per output-irrep group: (.., mul, n_cols*d3) becomes a
            # (mul*n_cols, ir3) chunk with (u, c)-major channel order
            for ir3, n_cols, k0, k1 in groups:
                chunks.append((mul * n_cols, ir3, out[..., k0:k1].reshape(
                    x.shape[:-1] + (mul * n_cols, ir3.dim))))
        return chunks
