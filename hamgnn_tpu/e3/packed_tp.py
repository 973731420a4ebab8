"""Packed (lane-dense) execution of the TP -> radial-scale -> Linear pipeline.

Device traces of the chunked hot path (e3/fused_tp.py chunk_call streamed into
e3/linear.py call_chunks) show ~49k XLA ops per train step with last-dim
extents of 3..55 — at most ~10% lane utilization under the TPU's (8,128)
tiling, plus thousands of lane-misaligned slice copies running at <10% of HBM
bandwidth.  This module computes the *same function with the same parameters*
in a packed layout:

  per input chunk g = (mul, l1, p1):
    W    = einsum('ej,jik->eik', sh, C_g)          # (E, d1, K) one MXU matmul
    mid  = sum_i W[:,i,:,None] * x_g[:,None,:,i]   # (E, K, mul) -> (E, K*mul)
    mid *= w[:, scale_idx]                         # one static lane gather
    out += (E*d3, n_cols*mul) @ perm(flat_w)       # big MXU matmuls per ir3

The mid tensor keeps (k, u) flattened on the lane axis — full 128-lane tiles
regardless of irrep dimension — and the column order inside each output-irrep
group is m3-major so the final matmul operands are contiguous reshapes, not
strided slices.  The per-channel radial weights and the equivariant Linear's
flat weight are *reindexed* (static permutations applied to parameter views,
never to data) so outputs match the chunked path bit-for-bit in exact
arithmetic.

Reference semantics being reproduced: e3nn TensorProduct + per-path weights +
o3.Linear as composed in /root/reference/hamgnn/nn/tensor_products.py:51-189
and message_passing.py:80-107.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .irreps import Irrep, Irreps
from .wigner import wigner_3j


@functools.lru_cache(maxsize=None)
def _packed_coupling(l1: int, p1: int, sh_key: Tuple[Tuple[int, int], ...],
                     target_key: Tuple[Tuple[int, int], ...]):
    """Coupling tensor with m3-major column order inside each ir3 group.

    Returns (C, groups) where C is (S, d1, K) and groups is a tuple of
    (ir3, n_cols, k0, k1): columns [k0, k1) of C hold the ir3 block laid out
    (m3-major, path-minor): column index k0 + m3 * n_cols + j for path j.
    Path order within a group matches e3/fused_tp.py's enumeration (sh-irrep
    order), so path j here corresponds to column j of the chunked layout.
    """
    sh_irreps = [Irrep(l, p) for l, p in sh_key]
    target_set = set(Irrep(l, p) for l, p in target_key)

    S = sum(ir.dim for ir in sh_irreps)
    cols: List[Tuple[int, Irrep, int]] = []  # (sh offset j0, ir3, l2)
    j0 = 0
    for ir_sh in sh_irreps:
        for ir3 in Irrep(l1, p1) * ir_sh:
            if ir3 in target_set:
                cols.append((j0, ir3, ir_sh.l))
        j0 += ir_sh.dim
    cols.sort(key=lambda t: t[1])  # stable: same group order as fused_tp

    d1 = 2 * l1 + 1
    # group by ir3
    groups: List[Tuple[Irrep, List[Tuple[int, int]]]] = []
    for j0, ir3, l2 in cols:
        if groups and groups[-1][0] == ir3:
            groups[-1][1].append((j0, l2))
        else:
            groups.append((ir3, [(j0, l2)]))

    K = sum(ir3.dim * len(paths) for ir3, paths in groups)
    C = np.zeros((S, d1, K))
    out_groups = []
    k0 = 0
    for ir3, paths in groups:
        n_cols = len(paths)
        d3 = ir3.dim
        for j, (j0, l2) in enumerate(paths):
            w = wigner_3j(l1, l2, ir3.l) * np.sqrt(d3)  # (d1, 2l2+1, d3)
            # column for (m3, path j) at k0 + m3 * n_cols + j
            for m3 in range(d3):
                C[j0 : j0 + 2 * l2 + 1, :, k0 + m3 * n_cols + j] = w[:, :, m3].T
        out_groups.append((ir3, n_cols, k0, k0 + n_cols * d3))
        k0 += n_cols * d3
    return np.ascontiguousarray(C), tuple(out_groups)


class PackedTPPlan:
    """Static plan for one TP -> scale -> Linear pipeline.

    Built from the same irreps metadata as ``SHTensorProductExpansion`` +
    ``ElementwiseChannelScale`` (or a bare ``Linear`` in lite mode), with all
    channel/row permutations precomputed as numpy index arrays.
    """

    def __init__(self, irreps_in, irreps_sh, target_irreps, irreps_out):
        irreps_in = Irreps(irreps_in)
        irreps_sh_ = Irreps(irreps_sh)
        target = Irreps(target_irreps)
        irreps_out = Irreps(irreps_out)
        sh_key = tuple((mi.ir.l, mi.ir.p) for mi in irreps_sh_)
        t_key = tuple((mi.ir.l, mi.ir.p) for mi in target)

        self.irreps_in = irreps_in
        self.irreps_out = irreps_out
        # canonical cache key (usable with get_plan / pallas_tp._get_spec)
        self.key = (repr(irreps_in), repr(irreps_sh_), repr(target),
                    repr(irreps_out))

        # ---- enumerate mid channels exactly like the chunked path ----
        # chunk sequence: for g (input chunk), for grp (ir3 group):
        #   (mul_g * n_cols) channels in (u-major, path-minor) order.
        self.per_chunk = []   # (slice, mul, d1, C, groups)
        n_ch = 0              # running scale-channel count
        # linear row bases: per ir3 (as hashable), running row count
        row_count: dict = {}
        chunk_meta = []       # (g, grp_idx, ir3, n_cols, mul, ch_base, row_base)
        for sl, mi in zip(irreps_in.slices(), irreps_in):
            C, groups = _packed_coupling(mi.ir.l, mi.ir.p, sh_key, t_key)
            self.per_chunk.append((sl, mi.mul, mi.ir.dim, C, groups))
            for gi, (ir3, n_cols, k0, k1) in enumerate(groups):
                rb = row_count.get(ir3, 0)
                chunk_meta.append((len(self.per_chunk) - 1, gi, ir3, n_cols,
                                   mi.mul, n_ch, rb))
                n_ch += mi.mul * n_cols
                row_count[ir3] = rb + mi.mul * n_cols
        self.weight_numel = n_ch
        self._chunk_meta = chunk_meta

        # ---- scale channel permutation ----
        # chunked-path channel order (what the radial MLP emits by default):
        # per (g, grp) block in chunk-major order, (u-major, path-minor)
        # inside.  Packed order: blocks arranged OUT-CHUNK-MAJOR (the order
        # out_sources visits them; ties broken by first use) with
        # (path-major, u-minor) inside — so each group's scale vector
        # broadcasts over m3 as one contiguous multiply AND each output
        # chunk's radial weights form one contiguous span (the Pallas kernels
        # then scale a whole fan-in block with a single multiply).
        # scale_perm[packed_pos] = original channel.
        packed_base = {}   # (g, grp_idx) -> packed offset into weight vector
        pos = 0
        for mio in irreps_out:
            for (g, gi, ir3, n_cols, mul, ch_base, rb) in chunk_meta:
                if ir3 != mio.ir or (g, gi) in packed_base:
                    continue
                packed_base[(g, gi)] = pos
                pos += n_cols * mul
        for (g, gi, ir3, n_cols, mul, ch_base, rb) in chunk_meta:
            if (g, gi) not in packed_base:  # target-only groups (no out chunk)
                packed_base[(g, gi)] = pos
                pos += n_cols * mul
        assert pos == n_ch
        perm = np.zeros(n_ch, np.int32)
        for (g, gi, ir3, n_cols, mul, ch_base, rb) in chunk_meta:
            pb = packed_base[(g, gi)]
            j_idx = np.repeat(np.arange(n_cols), mul)
            u_idx = np.tile(np.arange(mul), n_cols)
            perm[pb : pb + n_cols * mul] = ch_base + u_idx * n_cols + j_idx
        self.scale_perm = perm
        self._grp_w_base = packed_base

        # ---- linear plan: same as e3/linear.py Linear(mid.simplify(), out) ----
        # flat-weight layout: for each output chunk k (irreps_out order), a
        # (fan_in, mul_out) block; rows ordered by the chunk sequence
        # (u-major, path-minor within each contributing mid chunk).
        plans = []
        total = 0
        for mio in irreps_out:
            fan_in = row_count.get(mio.ir, 0)
            plans.append((fan_in, total))
            total += fan_in * mio.mul
        self.out_plans = plans
        self.linear_numel = total

        # per output chunk: list of (g, grp_idx, row_perm) where row_perm maps
        # packed rows (j-major? -> we emit (j, u) pairs in (path-major, u-minor)
        # packed matmul order) into flat-weight row indices rb + u*n_cols + j.
        self.out_sources = []
        for k_out, mio in enumerate(irreps_out):
            srcs = []
            for (g, gi, ir3, n_cols, mul, ch_base, rb) in chunk_meta:
                if ir3 != mio.ir:
                    continue
                # packed matmul lhs columns ordered (path j major, u minor)
                j_idx = np.repeat(np.arange(n_cols), mul)
                u_idx = np.tile(np.arange(mul), n_cols)
                row_perm = rb + u_idx * n_cols + j_idx  # (n_cols*mul,)
                srcs.append((g, gi, row_perm.astype(np.int32)))
            self.out_sources.append(srcs)

    # -- runtime ---------------------------------------------------------

    def __call__(self, x, sh, weight, flat_w, weight_packed=False,
                 compute_dtype=None, sh_needs_grad=True):
        """Apply the fused pipeline (rematerialized in the backward pass).

        x: (..., irreps_in.dim); sh: (..., S); weight: (..., weight_numel)
        per-sample radial weights or None (lite mode / plain linear);
        flat_w: (linear_numel,) the Linear's flat parameter.
        ``weight_packed``: weight channels are already in packed
        (path-major, u-minor) order — see ``scale_perm`` (the radial MLP can
        emit this order directly via a static column permutation of its last
        layer, e.g. ``make_weight_generator(..., out_perm=plan.scale_perm)``).
        Returns (..., irreps_out.dim).

        The wide mid tensors (O(10k) floats per sample) must not become AD
        residuals — at production sizes they exceed HBM — so the whole
        pipeline runs under ``jax.checkpoint``: the backward recomputes mids
        from (x, sh, weight), which costs one extra small matmul + a few
        broadcast FMAs per chunk.
        """
        if weight is not None and not weight_packed:
            weight = jnp.take(weight, jnp.asarray(self.scale_perm), axis=-1)

        import os as _os

        from .pallas_tp import pallas_apply, use_pallas

        eng = _os.environ.get("HAMGNN_TP_ENGINE", "auto")
        if eng == "zonal":
            # edge-frame (zonal) Pallas kernels — see e3/pallas_zonal.py
            from .pallas_zonal import zonal_pallas_apply

            return zonal_pallas_apply(self, x, sh, weight, flat_w)
        if eng == "zonal-xla":
            # edge-frame (zonal) execution, XLA reference path — exact same
            # function, ~6x fewer mid-stage FMAs (see e3/zonal_tp.py)
            from .zonal_tp import zonal_apply

            if weight is None:
                return jax.checkpoint(
                    lambda a, b, c: zonal_apply(self, a, b, None, c,
                                                compute_dtype)
                )(x, sh, flat_w)
            return jax.checkpoint(
                lambda a, b, w, c: zonal_apply(self, a, b, w, c,
                                               compute_dtype)
            )(x, sh, weight, flat_w)

        if use_pallas():
            # the Pallas engine has its own VMEM-resident backward kernel
            # (mids are never AD residuals there either); ``sh_needs_grad``
            # lets edge-SH callers skip the (large) dsh cotangent dots
            return pallas_apply(self, x, sh, weight, flat_w,
                                sh_needs_grad=sh_needs_grad)

        if weight is None:
            return jax.checkpoint(
                lambda a, b, c: self._apply(a, b, None, c, compute_dtype)
            )(x, sh, flat_w)
        return jax.checkpoint(
            lambda a, b, w, c: self._apply(a, b, w, c, compute_dtype)
        )(x, sh, weight, flat_w)

    def _apply(self, x, sh, weight, flat_w, compute_dtype=None):
        batch_shape = x.shape[:-1]
        E = int(np.prod(batch_shape)) if batch_shape else 1
        x2 = x.reshape(E, x.shape[-1])
        sh2 = sh.reshape(E, sh.shape[-1])
        w2 = weight.reshape(E, weight.shape[-1]) if weight is not None else None
        dt = compute_dtype or x.dtype

        mids = []
        for g, (sl, mul, d1, C, groups) in enumerate(self.per_chunk):
            K = C.shape[-1]
            if K == 0:
                mids.append(None)
                continue
            xc = x2[:, sl].reshape(E, mul, d1)
            Cj = jnp.asarray(C.reshape(C.shape[0], d1 * K), dt)
            W = (sh2.astype(dt) @ Cj).reshape(E, d1, K)
            mid = None
            for i in range(d1):
                term = W[:, i, :, None] * xc[:, None, :, i]
                mid = term if mid is None else mid + term
            mids.append(mid.reshape(E, K * mul))

        out_chunks = []
        for k_out, mio in enumerate(self.irreps_out):
            fan_in, ofs = self.out_plans[k_out]
            if fan_in == 0:
                out_chunks.append(jnp.zeros((E, mio.dim), dtype=x.dtype))
                continue
            wblk = flat_w[ofs : ofs + fan_in * mio.mul].reshape(fan_in, mio.mul)
            scale = 1.0 / np.sqrt(fan_in)
            d3 = mio.ir.dim
            acc = None
            for g, gi, row_perm in self.out_sources[k_out]:
                mid = mids[g]
                _, mul, _, _, groups = self.per_chunk[g]
                ir3, n_cols, k0, k1 = groups[gi]
                ncm = n_cols * mul
                # lanes [k0*mul, k1*mul) hold (m3, path, u) m3-major
                blk = mid[:, k0 * mul : k1 * mul].reshape(E, d3, ncm)
                if w2 is not None:
                    cb = self._grp_w_base[(g, gi)]
                    # packed-order scale: one contiguous slice broadcast over
                    # m3 — no gather fwd, no scatter bwd
                    blk = blk * w2[:, None, cb : cb + ncm]
                blk = blk.reshape(E * d3, ncm)
                wsub = (scale * wblk[jnp.asarray(row_perm)]).astype(blk.dtype)
                y = blk @ wsub  # (E*d3, mul_out)
                acc = y if acc is None else acc + y
            # (E, d3, V) -> (E, V, d3) -> (E, V*d3)
            y = acc.reshape(E, d3, mio.mul)
            y = jnp.swapaxes(y, -1, -2).reshape(E, mio.mul * d3)
            out_chunks.append(y.astype(x.dtype))
        out = jnp.concatenate(out_chunks, axis=-1)
        return out.reshape(*batch_shape, out.shape[-1])


@functools.lru_cache(maxsize=None)
def get_plan(irreps_in: str, irreps_sh: str, target_irreps: str,
             irreps_out: str) -> PackedTPPlan:
    return PackedTPPlan(irreps_in, irreps_sh, target_irreps, irreps_out)
