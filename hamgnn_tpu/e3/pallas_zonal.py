"""Pallas TPU kernels for the ZONAL (edge-frame) TP pipeline execution.

Same function as e3/pallas_tp.py (the v1 per-m3 schedule) and
e3/zonal_tp.py's XLA path — this is the edge-frame formulation lowered to
Mosaic.  The per-edge rotations (batched Wigner-D) and frame transforms run
in XLA outside the kernel; the kernel consumes the ROTATED x in the m-major
packed layout and emits the rotated out in the m3-major layout:

  mid construction per (chunk g, out group, m3):
      mid_block = c1 * repeat(x_rot[m1=i1 block], n_cols)
                [+ c2 * repeat(x_rot[m1=i2 block], n_cols)]
  with STATIC per-path coefficient vectors (zonal CG couples only
  m1 = +-m3) — <=2 VPU FMAs per mid lane instead of the d1-term per-edge
  contraction, and no sh/Crep operands at all.  The radial-scale and Wcat
  MXU out-stage are identical to the v1 schedule (mids share its exact lane
  layout), as is the VMEM-resident backward (recompute mids, transposed
  dots, dx via tree-halving lane sums through the same static sparsity).

Exact op counts at the bench node pipeline (see docs/performance.md):
mid stage 21,106 -> 3,202 FMA/edge; rotations add 2x1,424 (outside, XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tp import (
    PallasSpec,
    _bf16_mode,
    _mxu_dot,
    _mxu_dot_general,
    _pad_e,
    _tile_lanes,
    _tree_ksum,
)
from .zonal_tp import (
    _get_zonal_spec,
    align_to_z,
    batched_wigner_D,
    direction_from_sh,
)


class ZonalPallasSpec(PallasSpec):
    """PallasSpec + static zonal mid-construction tables.

    ``zblocks[g]`` lists, in mid-lane order, one entry per (out group, m3):
    (ncm, [(x_lane_ofs, coeff_vec (ncm,)), ...] with 0..2 sources).
    """

    def __init__(self, plan):
        super().__init__(plan)
        zspec = _get_zonal_spec(plan.key)
        self.sh_l1_slice = zspec.sh_l1_slice
        self.max_l_feat = zspec.max_l_feat

        self.zblocks = []
        coef_chunks = []   # all coefficient vectors, one packed lane table
        coef_pos = 0
        for g, (sl, mul, d1, C, groups) in enumerate(plan.per_chunk):
            K = C.shape[-1]
            ofs_m, _mul, _d1, _K, _cr = self.chunks[g]
            if K == 0:
                self.zblocks.append(None)
                continue
            i1, c1, i2, c2 = zspec.chunk_zonal[g]
            blocks = []
            for (ir3, n_cols, k0, k1) in groups:
                d3 = ir3.dim
                for m3 in range(d3):
                    ks = k0 + m3 * n_cols + np.arange(n_cols)
                    srcs = {}
                    for j, k in enumerate(ks):
                        for (ii, cc) in ((i1[k], c1[k]), (i2[k], c2[k])):
                            if cc == 0.0:
                                continue
                            vec = srcs.setdefault(int(ii), np.zeros(n_cols))
                            vec[j] += cc
                    entries = []
                    for ii, vec in sorted(srcs.items()):
                        cvec = np.repeat(vec, mul)  # path-major, u-minor lanes
                        coef_chunks.append(np.asarray(cvec, np.float32))
                        entries.append((ofs_m + ii * mul, coef_pos))
                        coef_pos += cvec.shape[0]
                    assert len(entries) <= 2, len(entries)
                    blocks.append((n_cols * mul, entries))
            self.zblocks.append(blocks)
        coef = (np.concatenate(coef_chunks) if coef_chunks
                else np.zeros(1, np.float32))
        # (1, W) constant operand; rides the crep_ref slot of the kernel
        # bodies (the zonal kernels have no Crep)
        self.zcoef = np.ascontiguousarray(coef[None, :])

    # -- zonal mids: same output layout/contract as PallasSpec._mids ------
    # (crep_ref carries the packed zonal coefficient table self.zcoef)
    def _mids(self, x_ref, sh, crep_ref, interpret, bf16=False):
        f32 = jnp.float32
        mids = {}
        for g, (ofs_m, mul, d1, K, crofs) in enumerate(self.chunks):
            if K == 0:
                continue
            parts = []
            for (ncm, entries) in self.zblocks[g]:
                acc = None
                for (lane0, cofs) in entries:
                    xb = x_ref[:, lane0 : lane0 + mul]
                    t = _tile_lanes(xb, ncm // mul, interpret) \
                        * crep_ref[0:1, cofs : cofs + ncm]
                    acc = t if acc is None else acc + t
                if acc is None:
                    acc = jnp.zeros((x_ref.shape[0], ncm), f32)
                parts.append(acc)
            mids[g] = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                       else parts[0])
        return mids

    # -- forward: v1 out-stage over zonal mids (no sh/crep operands) ------
    def _fwd_body(self, x_ref, sh_ref, w_ref, wcat_ref, crep_ref, out_ref,
                  interpret):
        f32 = jnp.float32
        bf16 = _bf16_mode() == "all"
        mids = self._mids(x_ref, None, crep_ref, interpret, bf16)

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

    # -- backward: identical out-stage, zonal dx (no dsh) -----------------
    def _bwd_body(self, x_ref, sh_ref, w_ref, wcat_ref, crep_ref, g_ref,
                  dx_ref, dsh_ref, dw_ref, dwcat_ref, interpret,
                  need_dsh=False):
        f32 = jnp.float32

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dwcat_ref[:] = jnp.zeros_like(dwcat_ref)

        bf16 = _bf16_mode() in ("bwd", "all")
        mids = self._mids(x_ref, None, crep_ref, interpret, bf16)

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

        # assemble per-chunk dmid in lane order, then dx through the static
        # zonal sparsity (transposed 2-term combination; no dsh at all)
        dx_ref[:] = jnp.zeros_like(dx_ref)
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

            # walk the zonal blocks in mid-lane order, accumulate dx
            dx_acc = {}
            lane = 0
            for (ncm, entries) in self.zblocks[g]:
                dblk = dmidf[:, lane : lane + ncm]
                lane += ncm
                for (lane0, cofs) in entries:
                    contrib = _tree_ksum(
                        dblk * crep_ref[0:1, cofs : cofs + ncm],
                        ncm // mul, mul)
                    dx_acc[lane0] = (contrib if lane0 not in dx_acc
                                     else dx_acc[lane0] + contrib)
            for lane0, v in sorted(dx_acc.items()):
                dx_ref[:, lane0 : lane0 + mul] = v
        dsh_ref[:] = jnp.zeros_like(dsh_ref[:])


@functools.lru_cache(maxsize=None)
def _get_zspec(plan_key):
    from .packed_tp import get_plan

    return ZonalPallasSpec(get_plan(*plan_key))


# ----------------------------------------------------------------------
# pallas_call wrappers (no sh / crep operands)
# ----------------------------------------------------------------------


def _zfwd_call(spec, x_m, w, wcat, interpret):
    E = x_m.shape[0]
    te = spec.tile_fwd
    xp = _pad_e(x_m, te)
    wp = _pad_e(w, te) if w is not None else None
    Ep = xp.shape[0]

    def body(*refs):
        if w is not None:
            x_ref, w_ref, wcat_ref, coef_ref, out_ref = refs
        else:
            x_ref, wcat_ref, coef_ref, out_ref = refs
            w_ref = None
        spec._fwd_body(x_ref, None, w_ref, wcat_ref, coef_ref, out_ref,
                       interpret)

    ematch = lambda i: (i, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    coef = jnp.asarray(spec.zcoef)
    in_specs = [pl.BlockSpec((te, spec.d_in), ematch)]
    args = [xp]
    if w is not None:
        in_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
        args.append(wp)
    in_specs += [pl.BlockSpec(wcat.shape, const),
                 pl.BlockSpec(coef.shape, const)]
    args += [wcat, coef]

    out = pl.pallas_call(
        body,
        grid=(Ep // te,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((te, spec.d_out), ematch),
        out_shape=jax.ShapeDtypeStruct((Ep, spec.d_out), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)
    return out[:E]


def _zbwd_call(spec, x_m, w, wcat, gout, interpret):
    E = x_m.shape[0]
    te = spec.tile_bwd
    xp, gp = _pad_e(x_m, te), _pad_e(gout, te)
    wp = _pad_e(w, te) if w is not None else None
    Ep = xp.shape[0]

    def body(*refs):
        if w is not None:
            (x_ref, w_ref, wcat_ref, coef_ref, g_ref,
             dx_ref, dw_ref, dwcat_ref, dsh_ref) = refs
        else:
            (x_ref, wcat_ref, coef_ref, g_ref,
             dx_ref, dwcat_ref, dsh_ref) = refs
            w_ref, dw_ref = None, None
        spec._bwd_body(x_ref, None, w_ref, wcat_ref, coef_ref, g_ref,
                       dx_ref, dsh_ref, dw_ref, dwcat_ref, interpret,
                       need_dsh=False)

    ematch = lambda i: (i, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    coef = jnp.asarray(spec.zcoef)
    in_specs = [pl.BlockSpec((te, spec.d_in), ematch)]
    args = [xp]
    if w is not None:
        in_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
        args.append(wp)
    in_specs += [pl.BlockSpec(wcat.shape, const),
                 pl.BlockSpec(coef.shape, const),
                 pl.BlockSpec((te, spec.d_out), ematch)]
    args += [wcat, coef, gp]

    out_shapes = [jax.ShapeDtypeStruct((Ep, spec.d_in), jnp.float32)]
    out_specs = [pl.BlockSpec((te, spec.d_in), ematch)]
    if w is not None:
        out_shapes.append(jax.ShapeDtypeStruct((Ep, spec.n_ch), jnp.float32))
        out_specs.append(pl.BlockSpec((te, spec.n_ch), ematch))
    out_shapes.append(jax.ShapeDtypeStruct(wcat.shape, jnp.float32))
    out_specs.append(pl.BlockSpec(wcat.shape, const))
    # dummy dsh slot (8 lanes) to satisfy the shared bwd body signature
    out_shapes.append(jax.ShapeDtypeStruct((Ep, 8), jnp.float32))
    out_specs.append(pl.BlockSpec((te, 8), ematch))

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
        dx, dw, dwcat, _dsh = outs
        return dx[:E], dw[:E], dwcat
    dx, dwcat, _dsh = outs
    return dx[:E], None, dwcat


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _zpipeline(plan_key, has_w, interpret, x_m, w, wcat):
    spec = _get_zspec(plan_key)
    return _zfwd_call(spec, x_m, w if has_w else None, wcat, interpret)


def _zpipeline_fwd(plan_key, has_w, interpret, x_m, w, wcat):
    out = _zpipeline(plan_key, has_w, interpret, x_m, w, wcat)
    return out, (x_m, w, wcat)


def _zpipeline_bwd(plan_key, has_w, interpret, res, g):
    x_m, w, wcat = res
    spec = _get_zspec(plan_key)
    dx, dw, dwcat = _zbwd_call(
        spec, x_m, w if has_w else None, wcat, g, interpret)
    if dw is None:
        dw = jnp.zeros_like(w)
    return dx, dw, dwcat


_zpipeline.defvjp(_zpipeline_fwd, _zpipeline_bwd)


def zonal_pallas_apply(plan, x, sh, weight, flat_w, interpret=None):
    """Edge-frame Pallas execution; same contract as pallas_tp.pallas_apply
    (sh gradients are never produced — all hot call sites pass edge SH with
    sh_needs_grad=False)."""
    spec = _get_zspec(plan.key)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    batch_shape = x.shape[:-1]
    E = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = x.reshape(E, x.shape[-1]).astype(jnp.float32)
    sh2 = sh.reshape(E, sh.shape[-1]).astype(jnp.float32)

    # per-edge frame rotation (computed once per call; XLA CSEs the D
    # construction across the several pipelines sharing one edge set)
    r_hat = direction_from_sh(jax.lax.stop_gradient(sh2), spec.sh_l1_slice)
    R = align_to_z(r_hat)
    Ds = [jax.lax.stop_gradient(D) for D in
          batched_wigner_D(spec.max_l_feat, R)]

    # rotate + m-major pack in one shot: x_m lanes are ofs_m + i*mul + u
    parts = []
    for (sl, mul, d1, C, groups) in plan.per_chunk:
        l1 = (d1 - 1) // 2
        xc = x2[:, sl].reshape(E, mul, d1)
        xr = jnp.einsum("eij,euj->eui", Ds[l1], xc)      # (E, mul, d1)
        parts.append(jnp.swapaxes(xr, 1, 2).reshape(E, d1 * mul))
    x_m = jnp.concatenate(parts, axis=1)

    wcat = spec.build_wcat(flat_w)
    has_w = weight is not None
    w2 = (weight.reshape(E, weight.shape[-1]).astype(jnp.float32)
          if has_w else jnp.zeros((E, max(spec.n_ch, 1)), jnp.float32))
    out_m3 = _zpipeline(plan.key, has_w, interpret, x_m, w2, wcat)

    # rotate each output chunk back (m3-major layout), then de-interleave
    rot_chunks = []
    for k_out, mio in enumerate(plan.irreps_out):
        b = spec.out_bases[k_out]
        d3, V = mio.ir.dim, mio.mul
        l3 = (d3 - 1) // 2
        blk = out_m3[:, b : b + d3 * V].reshape(E, d3, V)
        blk = jnp.einsum("eji,ejv->eiv", Ds[l3], blk)    # D^T y
        rot_chunks.append(blk.reshape(E, d3 * V))
    out_rot = jnp.concatenate(rot_chunks, axis=1)
    out = jnp.take(out_rot, jnp.asarray(spec.out_deint), axis=-1)
    return out.reshape(*batch_shape, spec.d_out).astype(x.dtype)
