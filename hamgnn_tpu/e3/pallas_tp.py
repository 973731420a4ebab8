"""Pallas TPU kernels for the packed TP -> radial-scale -> Linear pipeline.

Device traces of the packed XLA path (e3/packed_tp.py) show the train step is
HBM/op-bound: the wide mid-irreps tensors (O(10k) lanes x O(10k) edges, ~0.5 GB
each at production sizes) are materialized in HBM several times per pipeline
(construction FMAs, radial scale, matmul read, AD remat), spreading the step
over ~1.5k ops of ~0.1-0.3 ms each while the MXU idles.

These kernels compute the SAME function with the SAME parameters (matching
``PackedTPPlan._apply`` up to float reassociation) but keep every mid tensor
in VMEM: one grid step processes a tile of TILE_E edges end-to-end, and HBM
traffic per tile is just the operands (x, sh, w) and the output.

Mosaic (TPU Pallas) restricts vector ops to 2D-friendly forms — no 3D lane
merges/splits, no element-repeat along lanes, no lane-axis reductions, no
scatter-add (probed on v5e; see tools_dev/mosaic_probe*.py) — so the kernel is
formulated entirely in flat 2D lane layouts:

  per input chunk g (mul copies of irrep l1, d1 = 2*l1+1), per i < d1:
    W_rep_i = sh_tile @ Crep_gi       one MXU dot; Crep is the coupling matrix
                                      with every column pre-duplicated mul
                                      times on the host, so the
                                      "element-repeat" the VPU cannot do comes
                                      straight out of the matmul
    mid    += W_rep_i * tile(x[:, (g,i)-block], K)
                                      (pltpu.repeat = whole-vector tile)
    lanes of mid are k*mul + u with k m3-major inside each ir3 group
  per output chunk, per m3:
    BLK = concat over source groups of (mid group-m3 slice * radial w slice)
    out[:, b+m3*V : +V] = BLK @ Wcat[rows(out), :V]     one MXU dot
                                      (dot count ~ out chunks x d3, not
                                      sources x d3 — per-dot setup dominates
                                      at small M, so fewer/wider dots win)

The backward pass is a second kernel with the same structure (recomputes mids
in VMEM — nothing wide is ever an AD residual): dWcat/dw/dsh come from
transposed dots; dx sums the k-blocks of (dmid * W_rep_i) by exact
tree-halving lane adds (bit-identical fp32, no bf16 matmul rounding); dWcat
accumulates across grid steps into a revisited output block.

Layout contract (precomputed in ``PallasSpec``, applied with static gathers
outside the kernels where XLA autodiff handles them):
  * x enters m-major per chunk: lane ofs_g + i*mul + u  (i = m1 index)
  * out leaves the kernel m3-major per output chunk (lane b + m3*V + v) and is
    de-interleaved to the standard u-major irreps layout by one static gather
  * the equivariant Linear's flat weight enters as ``Wcat``: every (out chunk,
    source group) block's (ncm, V) matrix stacked on rows in packed lane order
    with 1/sqrt(fan_in) folded in; built from flat_w by one static gather so
    XLA autodiff routes dWcat back to the flat parameter

Reference semantics: e3nn TensorProduct + per-path radial weights + o3.Linear
as composed in /root/reference/hamgnn/nn/tensor_products.py:51-189 and
message_passing.py:80-107.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_cfg(name, default):
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


# optional global overrides; by default the tile is sized per plan from its
# VMEM footprint (see PallasSpec.tile_fwd/tile_bwd)
TILE_FWD = _tile_cfg("HAMGNN_TP_TILE_FWD", 0)
TILE_BWD = _tile_cfg("HAMGNN_TP_TILE_BWD", 0)


def _storemid() -> bool:
    """Stored-mid VJP: the forward kernel writes the flat mid tensors to HBM
    as an extra output and the backward reads them back instead of recomputing
    (saves the _mids dots + FMAs in bwd at the cost of one (E, midw) fp32
    round-trip through HBM).  Same math bit-for-bit — the mids are the exact
    fp32 values either way.  Read at trace time; set before process start.
    """
    return os.environ.get("HAMGNN_TP_STOREMID", "") == "1"


def _dx_merged() -> bool:
    """Merged dx stage: one W_rep dot per chunk (width d1*K*mul) with the
    dmid flat tensor lane-tiled d1 times, instead of one dot + multiply per
    (chunk, i).  Fewer, wider ops; costs a transient (te, d1*K*mul) slab.
    """
    return os.environ.get("HAMGNN_TP_DX", "") == "merged"


def _bf16_mode() -> str:
    """MXU input precision: '' (fp32), 'bwd' (backward only), 'all'.

    bf16 operands with fp32 accumulation run the MXU at full rate instead of
    the fp32 multi-pass decomposition.  'bwd' keeps the forward (and thus the
    loss/prediction parity surface) exactly fp32 while gradients — which
    AdamW normalizes per-parameter anyway — absorb the bf16 product rounding.
    Read at kernel trace time: set before process start for benchmarking.
    """
    v = os.environ.get("HAMGNN_TP_BF16", "").lower()
    return v if v in ("bwd", "all") else ""


def _mxu_dot(a, b, bf16: bool):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mxu_dot_general(a, b, dims, bf16: bool):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)

# per-edge-row VMEM working set that scales with the tile (fp32 words); the
# budgets are calibrated on v5e against the bench node pipeline (measured:
# bwd@512 compiles and runs inside the 120MB limit at ~45k words/row by this
# formula, i.e. the formula overestimates ~1.5x — budget adjusted to match).
# fwd tiles are CAPPED at 256: measured on v5e, fwd@256 beats fwd@512/1024
# by 6-10% on both bench pipelines (smaller live slabs schedule better) even
# when more VMEM is available.
# The bwd budget is tight by design: the example-config node plan
# (bwd_words 27.5k, ~35% heavier than the bench plan's 20.3k) triggers
# ~90 MB of Mosaic register-allocator SPILLS at tile 512 (132.6 MB total,
# measured VMEM OOM during sk_siesta training) that the word formula cannot
# see — so anything heavier than the bench plan must drop to tile 256.
_FWD_BUDGET_WORDS = 15_000_000
_BWD_BUDGET_WORDS = 22_000_000
_FWD_TILE_CAP = 256
_BWD_TILE_CAP = 512


def _auto_tile(words_per_row, budget, cap=1024):
    te = 128
    while te < cap and words_per_row * te * 2 <= budget:
        te *= 2
    return te


def use_pallas() -> bool:
    eng = os.environ.get("HAMGNN_TP_ENGINE", "auto")
    if eng == "pallas":
        return True
    if eng == "xla":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _tile_lanes(a, n, interpret):
    """Whole-vector tile along the lane axis: (E, L) -> (E, n*L)."""
    if n == 1:
        return a
    if interpret:
        return jnp.concatenate([a] * n, axis=1)
    return pltpu.repeat(a, n, axis=1)


def _tree_ksum(a, K, mul):
    """Exact fp32 sum of the K blocks of mul lanes: (E, K*mul) -> (E, mul).

    Tree-halving lane adds (the VPU path); Mosaic has no lane-axis reduce and
    a 0/1 sum-matmul would round through bf16 on the MXU.
    """
    K2 = 1
    while K2 < K:
        K2 *= 2
    if K2 != K:
        a = jnp.concatenate(
            [a, jnp.zeros((a.shape[0], (K2 - K) * mul), a.dtype)], axis=1)
    w = K2
    while w > 1:
        h = w // 2
        a = a[:, : h * mul] + a[:, h * mul : w * mul]
        w = h
    return a


class PallasSpec:
    """Static kernel schedule derived from a PackedTPPlan."""

    def __init__(self, plan):
        self.plan = plan
        irreps_in = plan.irreps_in
        irreps_out = plan.irreps_out
        self.d_in = irreps_in.dim
        self.d_out = irreps_out.dim
        self.n_ch = plan.weight_numel

        # ---- x m-major permutation: x_m[:, ofs + i*mul + u] = x[:, sl.start + u*d1 + i]
        xperm = []
        chunks = []  # (ofs_m, mul, d1, K, crofs)
        ofs_m = 0
        crofs = 0
        crep_cols = []
        for (sl, mul, d1, C, groups) in plan.per_chunk:
            K = C.shape[-1]
            for i in range(d1):
                for u in range(mul):
                    xperm.append(sl.start + u * d1 + i)
            chunks.append((ofs_m, mul, d1, K, crofs))
            ofs_m += d1 * mul
            if K:
                # Crep_g: (S, d1*K*mul), column (i*K + k)*mul + u = C[:, i*K+k]
                Cg = C.reshape(C.shape[0], d1 * K)
                crep_cols.append(np.repeat(Cg, mul, axis=1))
            crofs += d1 * K * mul
        self.x_perm = np.asarray(xperm, np.int32)
        self.chunks = chunks
        # flat stored-mid layout: chunk g's (E, K*mul) mid lives at
        # columns [mid_ofs[g], mid_ofs[g] + K*mul) of the (E, midw) tensor
        self.mid_ofs = list(np.cumsum(
            [0] + [K * mul for (_o, mul, _d, K, _c) in chunks])[:-1])
        self.midw = int(sum(K * mul for (_o, mul, _d, K, _c) in chunks))
        S = plan.per_chunk[0][3].shape[0] if plan.per_chunk else 0
        self.Crep = (np.concatenate(crep_cols, axis=1) if crep_cols
                     else np.zeros((S, 0))).astype(np.float32)
        self.sum_rep = crofs

        # ---- out chunk bases (m3-major kernel layout) + de-interleave gather
        out_bases = []
        o = 0
        for mio in irreps_out:
            out_bases.append(o)
            o += mio.dim
        self.out_bases = out_bases
        deint = np.zeros(max(self.d_out, 1), np.int32)
        for k_out, mio in enumerate(irreps_out):
            b = out_bases[k_out]
            d3, V = mio.ir.dim, mio.mul
            for v in range(V):
                for m3 in range(d3):
                    deint[b + v * d3 + m3] = b + m3 * V + v
        self.out_deint = deint[: self.d_out]

        # ---- per-out-chunk schedule (merged dots): Wcat rows for an out
        # chunk are its source-group blocks stacked contiguously, in
        # PackedTPPlan.out_sources order (same enumeration as _apply)
        self.Vmax = max((mio.mul for mio in irreps_out), default=1)
        rows = 0
        sched = []  # (k_out, b, d3, V, r0, fan_rows, sources)
        wcat_rows = []
        for k_out, mio in enumerate(irreps_out):
            fan_in, ofs = plan.out_plans[k_out]
            if fan_in == 0:
                continue
            scale = 1.0 / np.sqrt(fan_in)
            V = mio.mul
            r0 = rows
            sources = []  # (g, k0, mul, ncols, cb)
            for (g, gi, row_perm) in plan.out_sources[k_out]:
                sl, mul, d1, C, groups = plan.per_chunk[g]
                ir3, n_cols, k0, k1 = groups[gi]
                cb = plan._grp_w_base[(g, gi)]
                ncm = n_cols * mul
                sources.append((g, k0, mul, n_cols, cb))
                wcat_rows.append((rows, ncm, V, ofs, row_perm, scale))
                rows += ncm
            # 8-align each out chunk's row block: unaligned sublane slices of
            # Wcat force a relayout before every dot; the pad rows are zero
            # (and BLK gets matching zero lanes), so results are unchanged
            pad = (-(rows - r0)) % 8
            rows += pad
            # contiguous radial-weight span (out-chunk-major packed order):
            # one multiply per BLK instead of one per source
            wb = sources[0][4] if sources else 0
            run = wb
            fast = True
            for (g, k0, mul, ncols, cb) in sources:
                if cb != run:
                    fast = False  # duplicate out irreps share a group's span
                    break
                run += ncols * mul
            sched.append((k_out, self.out_bases[k_out], mio.ir.dim, V, r0,
                          rows - r0, tuple(sources), wb, fast))
        self.sched = sched
        self.n_rows = max(rows, 1)

        # Wcat build plan: per out chunk, a contiguous flat_w slice viewed as
        # (fan_in, V) with rows permuted — a ROW gather (fast DMA on TPU; a
        # flat element gather here measured ~1.4 ms per call on v5e).
        build = []  # (ofs, fan_in, V, scale, row_perm over concatenated srcs)
        i = 0
        for (k_out, b, d3, V, r0, fan_rows, sources, wb, fast) in sched:
            fan_in, ofs = plan.out_plans[k_out]
            perms = []
            n_src = len(sources)
            for _ in range(n_src):
                (rr0, ncm, VV, oofs, row_perm, scale) = wcat_rows[i]
                perms.append(np.asarray(row_perm, np.int32))
                i += 1
            perm = np.concatenate(perms) if perms else np.zeros(0, np.int32)
            build.append((ofs, fan_in, V, float(1.0 / np.sqrt(fan_in)),
                          perm, fan_rows))
        self.wcat_build = build

        # ---- per-plan tile sizes from the VMEM working set (fp32 words/row)
        midw = sum(K * mul for (_o, mul, _d, K, _c) in chunks)
        max_wrep = max((d1 * K * mul for (_o, mul, d1, K, _c) in chunks),
                       default=0)
        max_fan = max((fr for (_k, _b, _d, _V, _r, fr, _s, _w, _f) in sched),
                      default=0)
        base = self.d_in + self.n_ch + self.d_out + 32 + max_fan
        fwd_words = base + midw + max_wrep
        bwd_words = base + 2 * midw + max_wrep + 3 * max_fan
        self.tile_fwd = TILE_FWD or _auto_tile(fwd_words, _FWD_BUDGET_WORDS,
                                               _FWD_TILE_CAP)
        self.tile_bwd = TILE_BWD or _auto_tile(bwd_words, _BWD_BUDGET_WORDS,
                                               _BWD_TILE_CAP)
        # stored-mid variant: fwd additionally streams the (te, midw) mid
        # output; bwd replaces the recompute buffer with the input block
        # (word count unchanged)
        self.tile_fwd_store = TILE_FWD or _auto_tile(
            fwd_words + midw, _FWD_BUDGET_WORDS, _FWD_TILE_CAP)

    # ------------------------------------------------------------------
    def build_wcat(self, flat_w):
        if flat_w is None or self.plan.linear_numel == 0:
            return jnp.zeros((self.n_rows, self.Vmax), jnp.float32)
        fw = flat_w.astype(jnp.float32)
        blocks = []
        for (ofs, fan_in, V, scale, perm, fan_rows) in self.wcat_build:
            W2 = fw[ofs : ofs + fan_in * V].reshape(fan_in, V)
            Wp = jnp.take(W2, jnp.asarray(perm), axis=0) * scale
            if V < self.Vmax:
                Wp = jnp.pad(Wp, ((0, 0), (0, self.Vmax - V)))
            if fan_rows > fan_in:  # 8-alignment pad rows
                Wp = jnp.pad(Wp, ((0, fan_rows - fan_in), (0, 0)))
            blocks.append(Wp)
        return (jnp.concatenate(blocks, axis=0) if blocks
                else jnp.zeros((self.n_rows, self.Vmax), jnp.float32))

    # ------------------------------------------------------------------
    def _mids(self, x_ref, sh, crep_ref, interpret, bf16=False):
        """Flat per-chunk mid tensors (E, K*mul), lanes k*mul + u.

        Per-(chunk, i) W_rep dots: merging them into one per-chunk dot was
        measured SLOWER end-to-end (80k vs 101k edges/s at the bench config)
        because the live merged slab halves the auto tile size — dispatch
        overhead is cheaper than smaller tiles here.
        """
        mids = {}
        for g, (ofs_m, mul, d1, K, crofs) in enumerate(self.chunks):
            if K == 0:
                continue
            midf = None
            for i in range(d1):
                W_rep = _mxu_dot(
                    sh,
                    crep_ref[:, crofs + i * K * mul : crofs + (i + 1) * K * mul],
                    bf16)
                B = _tile_lanes(
                    x_ref[:, ofs_m + i * mul : ofs_m + (i + 1) * mul], K,
                    interpret)
                term = W_rep * B
                midf = term if midf is None else midf + term
            mids[g] = midf
        return mids

    def _fwd_body(self, x_ref, sh_ref, w_ref, wcat_ref, crep_ref, out_ref,
                  interpret, mid_out_ref=None):
        f32 = jnp.float32
        bf16 = _bf16_mode() == "all"
        mids = self._mids(x_ref, sh_ref[:], crep_ref, interpret, bf16)
        if mid_out_ref is not None:  # stored-mid VJP: persist for the bwd
            for g, (ofs_m, mul, d1, K, crofs) in enumerate(self.chunks):
                if K == 0:
                    continue
                mo = self.mid_ofs[g]
                mid_out_ref[:, mo : mo + K * mul] = mids[g]

        for (k_out, b, d3, V, r0, fan_rows, sources, wb, fast) in self.sched:
            wrows = wcat_ref[r0 : r0 + fan_rows, :V]
            fan_in = sum(nc * mu for (_g, _k, mu, nc, _c) in sources)
            wspan = (w_ref[:, wb : wb + fan_in]
                     if (w_ref is not None and fast) else None)
            for m3 in range(d3):
                parts = []
                for (g, k0, mul, ncols, cb) in sources:
                    ncm = ncols * mul
                    lo = k0 * mul + m3 * ncm
                    blk = mids[g][:, lo : lo + ncm]
                    if w_ref is not None and wspan is None:
                        blk = blk * w_ref[:, cb : cb + ncm]
                    parts.append(blk)
                BLK = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                       else parts[0])
                if wspan is not None:
                    BLK = BLK * wspan
                if fan_rows > fan_in:
                    BLK = jnp.concatenate(
                        [BLK, jnp.zeros((x_ref.shape[0], fan_rows - fan_in),
                                        f32)], axis=1)
                out_ref[:, b + m3 * V : b + (m3 + 1) * V] = _mxu_dot(
                    BLK, wrows, bf16)

        covered = {k_out for (k_out, *_r) in self.sched}
        for k_out, mio in enumerate(self.plan.irreps_out):
            if k_out in covered:
                continue
            b = self.out_bases[k_out]
            out_ref[:, b : b + mio.dim] = jnp.zeros(
                (x_ref.shape[0], mio.dim), f32)

    # ------------------------------------------------------------------
    def _bwd_body(self, x_ref, sh_ref, w_ref, wcat_ref, crep_ref, g_ref,
                  dx_ref, dsh_ref, dw_ref, dwcat_ref, interpret,
                  need_dsh=True, mid_in_ref=None):
        f32 = jnp.float32

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dwcat_ref[:] = jnp.zeros_like(dwcat_ref)

        sh = sh_ref[:]
        bf16 = _bf16_mode() in ("bwd", "all")
        if mid_in_ref is not None:  # stored-mid VJP: fwd already paid for them
            mids = {}
            for g, (ofs_m, mul, d1, K, crofs) in enumerate(self.chunks):
                if K == 0:
                    continue
                mo = self.mid_ofs[g]
                mids[g] = mid_in_ref[:, mo : mo + K * mul]
        else:
            mids = self._mids(x_ref, sh, crep_ref, interpret, bf16)

        if dw_ref is not None:
            dw_ref[:] = jnp.zeros_like(dw_ref)

        dmid_blocks = {}  # (g, k0, m3, ncm) -> (E, ncm)
        for (k_out, b, d3, V, r0, fan_rows, sources, wb, fast) in self.sched:
            wrows = wcat_ref[r0 : r0 + fan_rows, :V]
            fan_in = sum(nc * mu for (_g, _k, mu, nc, _c) in sources)
            wspan = (w_ref[:, wb : wb + fan_in]
                     if (w_ref is not None and fast) else None)
            dwr = None
            dw_sum = None
            for m3 in range(d3):
                parts = []
                for (g, k0, mul, ncols, cb) in sources:
                    ncm = ncols * mul
                    lo = k0 * mul + m3 * ncm
                    blk = mids[g][:, lo : lo + ncm]
                    if w_ref is not None and wspan is None:
                        blk = blk * w_ref[:, cb : cb + ncm]
                    parts.append(blk)
                BLK = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                       else parts[0])   # unscaled iff fast
                BLK_s = BLK * wspan if wspan is not None else BLK
                if fan_rows > fan_in:
                    BLK_s = jnp.concatenate(
                        [BLK_s, jnp.zeros((x_ref.shape[0],
                                           fan_rows - fan_in), f32)], axis=1)
                gy = g_ref[:, b + m3 * V : b + (m3 + 1) * V]
                d = _mxu_dot_general(
                    BLK_s, gy, (((0,), (0,)), ((), ())), bf16)
                dwr = d if dwr is None else dwr + d
                dBLK = _mxu_dot_general(
                    gy, wrows, (((1,), (1,)), ((), ())), bf16)[:, :fan_in]
                if wspan is not None:
                    # fast path: whole-span dw + unscaled dmid in 2 multiplies
                    add = dBLK * BLK
                    dw_sum = add if dw_sum is None else dw_sum + add
                    dblk_u_all = dBLK * wspan
                    pos = 0
                    for (g, k0, mul, ncols, cb) in sources:
                        ncm = ncols * mul
                        km = (g, k0, m3, ncm)
                        piece = dblk_u_all[:, pos : pos + ncm]
                        pos += ncm
                        dmid_blocks[km] = (piece if km not in dmid_blocks
                                           else dmid_blocks[km] + piece)
                else:
                    pos = 0
                    for (g, k0, mul, ncols, cb) in sources:
                        ncm = ncols * mul
                        dblk_s = dBLK[:, pos : pos + ncm]
                        pos += ncm
                        lo = k0 * mul + m3 * ncm
                        if w_ref is not None:
                            blk_u = mids[g][:, lo : lo + ncm]
                            dw_ref[:, cb : cb + ncm] += dblk_s * blk_u
                            dblk_u = dblk_s * w_ref[:, cb : cb + ncm]
                        else:
                            dblk_u = dblk_s
                        km = (g, k0, m3, ncm)
                        dmid_blocks[km] = (dblk_u if km not in dmid_blocks
                                           else dmid_blocks[km] + dblk_u)
            dwcat_ref[r0 : r0 + fan_rows, :V] += dwr
            if wspan is not None and dw_sum is not None:
                dw_ref[:, wb : wb + fan_in] += dw_sum

        # assemble per-chunk dmid in lane order, then dx / dsh
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dsh = None
        E = x_ref.shape[0]
        for g, (ofs_m, mul, d1, K, crofs) in enumerate(self.chunks):
            if K == 0:
                continue
            blocks = sorted(
                ((k0, m3, ncm, v) for (gg, k0, m3, ncm), v
                 in dmid_blocks.items() if gg == g),
                key=lambda t: t[0] * mul + t[1] * t[2])
            pieces = []
            pos = 0
            for (k0, m3, ncm, v) in blocks:
                lo = k0 * mul + m3 * ncm
                if lo > pos:
                    pieces.append(jnp.zeros((E, lo - pos), f32))
                pieces.append(v)
                pos = lo + ncm
            total = K * mul
            if pos < total:
                pieces.append(jnp.zeros((E, total - pos), f32))
            dmidf = (jnp.concatenate(pieces, axis=1) if len(pieces) > 1
                     else pieces[0])

            if _dx_merged() and d1 > 1 and not need_dsh:
                # one W_rep dot per chunk (width d1*K*mul) + one tiled
                # multiply, instead of d1 dots + d1 multiplies; the tree
                # reductions stay per-i (strided halving across i-blocks is
                # not a Mosaic-expressible lane op)
                W_all = _mxu_dot(
                    sh, crep_ref[:, crofs : crofs + d1 * K * mul], bf16)
                prod = _tile_lanes(dmidf, d1, interpret) * W_all
                for i in range(d1):
                    dx_ref[:, ofs_m + i * mul : ofs_m + (i + 1) * mul] = (
                        _tree_ksum(prod[:, i * K * mul : (i + 1) * K * mul],
                                   K, mul))
                continue

            for i in range(d1):
                cslice = crep_ref[
                    :, crofs + i * K * mul : crofs + (i + 1) * K * mul]
                W_rep = _mxu_dot(sh, cslice, bf16)
                xi = x_ref[:, ofs_m + i * mul : ofs_m + (i + 1) * mul]
                dx_ref[:, ofs_m + i * mul : ofs_m + (i + 1) * mul] = (
                    _tree_ksum(dmidf * W_rep, K, mul))
                if need_dsh:
                    # sh is usually edge spherical harmonics (data, no grad):
                    # the cotangent is only built when a caller asks for it
                    B = _tile_lanes(xi, K, interpret)
                    ds = _mxu_dot_general(
                        dmidf * B, cslice, (((1,), (1,)), ((), ())), bf16)
                    dsh = ds if dsh is None else dsh + ds
        dsh_ref[:] = (dsh if dsh is not None
                      else jnp.zeros_like(dsh_ref[:]))


# ----------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _get_spec(plan_key):
    from .packed_tp import get_plan

    return PallasSpec(get_plan(*plan_key))


def _pad_e(a, te):
    E = a.shape[0]
    pe = (E + te - 1) // te * te
    if pe == E:
        return a
    return jnp.pad(a, ((0, pe - E), (0, 0)))


def _fwd_call(spec: PallasSpec, x_m, sh, w, wcat, interpret,
              store_mid=False):
    E = x_m.shape[0]
    te = spec.tile_fwd_store if store_mid else spec.tile_fwd
    xp, shp = _pad_e(x_m, te), _pad_e(sh, te)
    wp = _pad_e(w, te) if w is not None else None
    Ep = xp.shape[0]

    def body(*refs):
        mid_ref = None
        if store_mid:
            *refs, mid_ref = refs
        if w is not None:
            x_ref, sh_ref, w_ref, wcat_ref, crep_ref, out_ref = refs
        else:
            x_ref, sh_ref, wcat_ref, crep_ref, out_ref = refs
            w_ref = None
        spec._fwd_body(x_ref, sh_ref, w_ref, wcat_ref, crep_ref, out_ref,
                       interpret, mid_out_ref=mid_ref)

    ematch = lambda i: (i, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    crep = jnp.asarray(spec.Crep)
    in_specs = [pl.BlockSpec((te, spec.d_in), ematch),
                pl.BlockSpec((te, sh.shape[1]), ematch)]
    args = [xp, shp]
    if w is not None:
        in_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
        args.append(wp)
    in_specs += [pl.BlockSpec(wcat.shape, const),
                 pl.BlockSpec(crep.shape, const)]
    args += [wcat, crep]

    out_specs = pl.BlockSpec((te, spec.d_out), ematch)
    out_shape = jax.ShapeDtypeStruct((Ep, spec.d_out), jnp.float32)
    if store_mid:
        out_specs = [out_specs, pl.BlockSpec((te, spec.midw), ematch)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((Ep, spec.midw), jnp.float32)]

    out = pl.pallas_call(
        body,
        grid=(Ep // te,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)
    if store_mid:
        return out[0][:E], out[1]  # mids stay padded (bwd repads anyway)
    return out[:E]


def _bwd_call(spec: PallasSpec, x_m, sh, w, wcat, gout, interpret,
              need_dsh=True, mids=None):
    E = x_m.shape[0]
    te = spec.tile_bwd
    xp, shp, gp = _pad_e(x_m, te), _pad_e(sh, te), _pad_e(gout, te)
    wp = _pad_e(w, te) if w is not None else None
    midp = _pad_e(mids, te) if mids is not None else None
    Ep = xp.shape[0]
    S = sh.shape[1]

    def body(*refs):
        refs = list(refs)
        # input order: x, sh, [w], wcat, crep, g, [mid]; outputs follow
        mid_ref = None
        if mids is not None:
            # inputs before mid: x, sh, [w], wcat, crep, g
            mid_ref = refs.pop(5 + (1 if w is not None else 0))
        if w is not None:
            (x_ref, sh_ref, w_ref, wcat_ref, crep_ref, g_ref,
             dx_ref, dsh_ref, dw_ref, dwcat_ref) = refs
        else:
            (x_ref, sh_ref, wcat_ref, crep_ref, g_ref,
             dx_ref, dsh_ref, dwcat_ref) = refs
            w_ref, dw_ref = None, None
        spec._bwd_body(x_ref, sh_ref, w_ref, wcat_ref, crep_ref, g_ref,
           dx_ref, dsh_ref, dw_ref, dwcat_ref, interpret, need_dsh,
           mid_in_ref=mid_ref)

    ematch = lambda i: (i, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    crep = jnp.asarray(spec.Crep)
    in_specs = [pl.BlockSpec((te, spec.d_in), ematch),
                pl.BlockSpec((te, S), ematch)]
    args = [xp, shp]
    if w is not None:
        in_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
        args.append(wp)
    in_specs += [pl.BlockSpec(wcat.shape, const),
                 pl.BlockSpec(crep.shape, const),
                 pl.BlockSpec((te, spec.d_out), ematch)]
    args += [wcat, crep, gp]
    if mids is not None:
        in_specs.append(pl.BlockSpec((te, spec.midw), ematch))
        args.append(midp)

    out_shapes = [jax.ShapeDtypeStruct((Ep, spec.d_in), jnp.float32),
                  jax.ShapeDtypeStruct((Ep, S), jnp.float32)]
    out_specs = [pl.BlockSpec((te, spec.d_in), ematch),
                 pl.BlockSpec((te, S), ematch)]
    if w is not None:
        out_shapes.append(jax.ShapeDtypeStruct((Ep, spec.n_ch), jnp.float32))
        out_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
    out_shapes.append(jax.ShapeDtypeStruct(wcat.shape, jnp.float32))
    out_specs.append(pl.BlockSpec(wcat.shape, const))

    outs = pl.pallas_call(
        body,
        grid=(Ep // te,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)
    if w is not None:
        dx, dsh, dw, dwcat = outs
        return dx[:E], dsh[:E], dw[:E], dwcat
    dx, dsh, dwcat = outs
    return dx[:E], dsh[:E], None, dwcat


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _pipeline(plan_key, has_w, interpret, need_dsh, x_m, sh, w, wcat):
    spec = _get_spec(plan_key)
    return _fwd_call(spec, x_m, sh, w if has_w else None, wcat, interpret)


def _pipeline_fwd(plan_key, has_w, interpret, need_dsh, x_m, sh, w, wcat):
    if _storemid():
        spec = _get_spec(plan_key)
        out, mids = _fwd_call(spec, x_m, sh, w if has_w else None, wcat,
                              interpret, store_mid=True)
        return out, (x_m, sh, w, wcat, mids)
    out = _pipeline(plan_key, has_w, interpret, need_dsh, x_m, sh, w, wcat)
    return out, (x_m, sh, w, wcat, None)


def _pipeline_bwd(plan_key, has_w, interpret, need_dsh, res, g):
    x_m, sh, w, wcat, mids = res
    spec = _get_spec(plan_key)
    dx, dsh, dw, dwcat = _bwd_call(
        spec, x_m, sh, w if has_w else None, wcat, g, interpret,
        need_dsh=need_dsh, mids=mids)
    if dw is None:
        dw = jnp.zeros_like(w)
    return dx, dsh, dw, dwcat


_pipeline.defvjp(_pipeline_fwd, _pipeline_bwd)


def pallas_apply(plan, x, sh, weight, flat_w, interpret=None,
                 sh_needs_grad=True):
    """Run the packed pipeline through the Pallas kernels.

    Same contract as ``PackedTPPlan._apply`` with ``weight`` already in packed
    order.  ``plan.key`` identifies the plan in ``packed_tp.get_plan``'s cache
    so the custom-VJP closure stays hashable/static.
    """
    spec = _get_spec(plan.key)
    if interpret is None:  # compiled on TPU, interpreter elsewhere (tests)
        interpret = jax.devices()[0].platform != "tpu"
    batch_shape = x.shape[:-1]
    E = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = x.reshape(E, x.shape[-1]).astype(jnp.float32)
    sh2 = sh.reshape(E, sh.shape[-1]).astype(jnp.float32)
    x_m = jnp.take(x2, jnp.asarray(spec.x_perm), axis=-1)
    wcat = spec.build_wcat(flat_w)
    has_w = weight is not None
    w2 = (weight.reshape(E, weight.shape[-1]).astype(jnp.float32)
          if has_w else jnp.zeros((E, max(spec.n_ch, 1)), jnp.float32))
    out_m3 = _pipeline(plan.key, has_w, interpret, bool(sh_needs_grad),
                       x_m, sh2, w2, wcat)
    out = jnp.take(out_m3, jnp.asarray(spec.out_deint), axis=-1)
    return out.reshape(*batch_shape, spec.d_out).astype(x.dtype)
