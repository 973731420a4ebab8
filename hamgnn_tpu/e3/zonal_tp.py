"""Zonal (edge-frame) execution of the TP -> radial-scale -> Linear pipeline.

Mathematically identical to :class:`hamgnn_tpu.e3.packed_tp.PackedTPPlan`
(same parameters, same outputs up to float reassociation), but restructured
around the rotation equivariance of the pipeline — the eSCN observation
(Passaro & Zitnick) applied to this framework's packed layout:

  For each edge, let R_e be a rotation taking the edge direction to +z (the
  zonal axis of this codebase's real-SH convention: sh_l(z) = sqrt(2l+1) *
  e_{m=0}, probed in e3/spherical.py's yzx basis).  Equivariance of the
  whole pipeline (CG contraction, per-(path,u) radial scale, equivariant
  Linear — all commute blockwise with D(R_e)) gives

      out(x, sh(r)) = D_out(R_e)^T  out( D_in(R_e) x,  sh(z) )

  and sh(z) is a CONSTANT.  In the edge frame the mid construction
  collapses: CG with a zonal (m2=0) operand couples only m1 = ±m3, so each
  mid lane is a 2-term static-coefficient combination of x_rot lanes instead
  of a d1-term per-edge contraction.  Exact op counts at the bench config
  (tools_dev notes, lmax-4 node pipeline): 21,106 -> 3,202 FMA/edge for the
  mid stage, + 2x1,424 rotation FMA — ~2.2x less forward VPU work, ~2.0x
  backward, with the MXU Wcat dots unchanged.

The rotation matrices need no gradient: edge spherical harmonics are data
(sh_needs_grad=False at every hot call site), so D(R_e) is wrapped in
stop_gradient, exactly matching the packed engine's dsh elision.

This module is the XLA reference implementation + the static ``ZonalSpec``
shared with the Pallas kernels (e3/pallas_zonal.py).  The direction is
recovered from the sh operand itself (its l=1 block is sqrt(3) * (y, z, x)),
so the engine slots into the same (x, sh, w, flat_w) interface.

Reference semantics: e3nn TensorProduct + per-path radial weights + o3.Linear
as composed in /root/reference/hamgnn/nn/tensor_products.py:51-189 and
message_passing.py:80-107.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .wigner import wigner_3j


# ----------------------------------------------------------------------
# batched Wigner-D from edge directions (jax, differentiation-free)
# ----------------------------------------------------------------------

_PERM_YZX = np.array([[0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0],
                      [1.0, 0.0, 0.0]])  # rows: (y, z, x) <- (x, y, z)


def align_to_z(r_hat: jnp.ndarray) -> jnp.ndarray:
    """(E, 3) unit vectors -> (E, 3, 3) rotations R with R @ r_hat = +z.

    Rodrigues about axis r x z; the antipodal branch (r ~ -z) goes through
    the well-conditioned rotation to -z composed with a flip about x.
    """
    x, y, z = r_hat[:, 0], r_hat[:, 1], r_hat[:, 2]
    safe = z >= 0.0

    def rodrigues(c, sign):
        # axis v = r x (sign * z-hat) = sign * (y, -x, 0); R = I + [v]x + [v]x^2/(1+c)
        vx, vy = sign * y, -sign * x
        k = 1.0 / jnp.maximum(1.0 + c, 1e-12)
        R = jnp.empty(0)  # placeholder to keep shape clear
        r00 = 1.0 - k * vy * vy
        r01 = k * vx * vy
        r02 = vy
        r10 = k * vx * vy
        r11 = 1.0 - k * vx * vx
        r12 = -vx
        r20 = -vy
        r21 = vx
        r22 = 1.0 - k * (vx * vx + vy * vy)
        return jnp.stack([
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ], -2)

    R_pos = rodrigues(z, 1.0)          # r -> +z, conditioned for z >= 0
    R_neg = rodrigues(-z, -1.0)        # r -> -z, conditioned for z < 0
    flip = jnp.asarray([[1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0],
                        [0.0, 0.0, -1.0]], r_hat.dtype)  # pi about x: -z -> z
    R = jnp.where(safe[:, None, None], R_pos,
                  jnp.einsum("ij,ejk->eik", flip, R_neg))
    return R


def batched_wigner_D(max_l: int, R: jnp.ndarray) -> List[jnp.ndarray]:
    """[D_0 .. D_max_l], D_l: (E, 2l+1, 2l+1), real Wigner-D in this
    codebase's yzx real-SH basis (same CG recursion as e3.wigner.wigner_D)."""
    E = R.shape[0]
    P = jnp.asarray(_PERM_YZX, R.dtype)
    D1 = jnp.einsum("ij,ejk,lk->eil", P, R, P)
    Ds = [jnp.ones((E, 1, 1), R.dtype), D1]
    for l in range(2, max_l + 1):
        W = jnp.asarray(
            wigner_3j(l - 1, 1, l).reshape((2 * l - 1) * 3, 2 * l + 1),
            R.dtype)
        big = jnp.einsum("eab,ecd->eacbd", Ds[l - 1], D1).reshape(
            E, (2 * l - 1) * 3, (2 * l - 1) * 3)
        Ds.append((2.0 * l + 1.0) * jnp.einsum("ma,emn,nb->eab", W, big, W))
    return Ds


def direction_from_sh(sh: jnp.ndarray, sh_slices_l1: slice) -> jnp.ndarray:
    """Unit edge direction from the sh operand's l=1 block (= sqrt(3)*(y,z,x)).

    Padded edges carry sh of a dummy unit vector — any direction is fine,
    their outputs are masked downstream.  Renormalized for safety."""
    blk = sh[:, sh_slices_l1]
    v = jnp.stack([blk[:, 2], blk[:, 0], blk[:, 1]], axis=-1)  # (x, y, z)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, 1e-12)


# ----------------------------------------------------------------------
# static spec
# ----------------------------------------------------------------------


class ZonalSpec:
    """Static zonal-frame schedule derived from a PackedTPPlan.

    Per chunk g, the packed mid (E, K*mul) with lane k*mul+u becomes

        mid[:, k*mul+u] = c1[k] * x_rot[:, i1[k]*mul+u]
                        + c2[k] * x_rot[:, i2[k]*mul+u]

    with STATIC (i1, c1, i2, c2) from the zonal coupling Wz = sh(z)^T C_g
    (<=2 nonzero m1 per column by the m-selection rule of zonal CG).
    """

    def __init__(self, plan):
        self.plan = plan
        # sh(z): sqrt(2l+1) at the m=0 (middle) index of each l block
        sh_irreps = []
        # reconstruct the sh layout from any chunk's coupling width S
        # plan doesn't store irreps_sh; recover from plan.key
        from .irreps import Irreps

        irreps_sh = Irreps(plan.key[1])
        S = irreps_sh.dim
        sh_z = np.zeros(S)
        ofs = 0
        l1_slice = None
        for mul, ir in irreps_sh:
            assert mul == 1, "sh irreps are simple"
            sh_z[ofs + ir.l] = np.sqrt(2 * ir.l + 1)
            if ir.l == 1:
                l1_slice = slice(ofs, ofs + 3)
            ofs += ir.dim
        assert l1_slice is not None, "zonal engine needs l=1 in sh"
        self.sh_l1_slice = l1_slice
        self.max_l_sh = max(ir.l for _, ir in irreps_sh)

        self.max_l_feat = max(
            [(d1 - 1) // 2 for (_s, _m, d1, _C, _g) in plan.per_chunk]
            + [mio.ir.dim // 2 for mio in plan.irreps_out])

        # per chunk: static 2-sparse combination
        self.chunk_zonal = []   # (i1 (K,), c1 (K,), i2 (K,), c2 (K,))
        for (sl, mul, d1, C, groups) in plan.per_chunk:
            K = C.shape[-1]
            if K == 0:
                self.chunk_zonal.append(None)
                continue
            Wz = np.einsum("s,sik->ik", sh_z, C)  # (d1, K)
            i1 = np.zeros(K, np.int32)
            c1 = np.zeros(K)
            i2 = np.zeros(K, np.int32)
            c2 = np.zeros(K)
            for k in range(K):
                nz = np.nonzero(np.abs(Wz[:, k]) > 1e-12)[0]
                assert len(nz) <= 2, (len(nz), "zonal coupling must be <=2-sparse")
                if len(nz) >= 1:
                    i1[k], c1[k] = nz[0], Wz[nz[0], k]
                if len(nz) == 2:
                    i2[k], c2[k] = nz[1], Wz[nz[1], k]
            self.chunk_zonal.append((i1, c1, i2, c2))


@functools.lru_cache(maxsize=None)
def _get_zonal_spec(plan_key) -> ZonalSpec:
    from .packed_tp import get_plan

    return ZonalSpec(get_plan(*plan_key))


# ----------------------------------------------------------------------
# XLA apply (reference semantics; Pallas version in pallas_zonal.py)
# ----------------------------------------------------------------------


def zonal_apply(plan, x, sh, weight, flat_w, compute_dtype=None):
    """Drop-in equivalent of ``PackedTPPlan._apply`` via the edge frame."""
    spec = _get_zonal_spec(plan.key)
    batch_shape = x.shape[:-1]
    E = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = x.reshape(E, x.shape[-1])
    sh2 = sh.reshape(E, sh.shape[-1])
    w2 = weight.reshape(E, weight.shape[-1]) if weight is not None else None
    dt = compute_dtype or x.dtype

    r_hat = direction_from_sh(jax.lax.stop_gradient(sh2), spec.sh_l1_slice)
    R = align_to_z(r_hat)
    Ds = batched_wigner_D(spec.max_l_feat, R)
    Ds = [jax.lax.stop_gradient(D).astype(dt) for D in Ds]

    mids = []
    for g, (sl, mul, d1, C, groups) in enumerate(plan.per_chunk):
        K = C.shape[-1]
        if K == 0:
            mids.append(None)
            continue
        l1 = (d1 - 1) // 2
        xc = x2[:, sl].reshape(E, mul, d1).astype(dt)
        # rotate into the edge frame: x_rot[e,u,i] = sum_j D[e,i,j] x[e,u,j]
        xr = jnp.einsum("eij,euj->eui", Ds[l1], xc)
        i1, c1, i2, c2 = spec.chunk_zonal[g]
        take1 = xr[:, :, jnp.asarray(i1)]              # (E, mul, K)
        take2 = xr[:, :, jnp.asarray(i2)]
        mid = (take1 * jnp.asarray(c1, dt) + take2 * jnp.asarray(c2, dt))
        mids.append(jnp.swapaxes(mid, 1, 2).reshape(E, K * mul))

    out_chunks = []
    for k_out, mio in enumerate(plan.irreps_out):
        fan_in, ofs = plan.out_plans[k_out]
        if fan_in == 0:
            out_chunks.append(jnp.zeros((E, mio.dim), dtype=x.dtype))
            continue
        wblk = flat_w[ofs : ofs + fan_in * mio.mul].reshape(fan_in, mio.mul)
        scale = 1.0 / np.sqrt(fan_in)
        d3 = mio.ir.dim
        l3 = (d3 - 1) // 2
        acc = None
        for g, gi, row_perm in plan.out_sources[k_out]:
            mid = mids[g]
            _, mul, _, _, groups = plan.per_chunk[g]
            ir3, n_cols, k0, k1 = groups[gi]
            ncm = n_cols * mul
            blk = mid[:, k0 * mul : k1 * mul].reshape(E, d3, ncm)
            if w2 is not None:
                cb = plan._grp_w_base[(g, gi)]
                blk = blk * w2[:, None, cb : cb + ncm].astype(blk.dtype)
            blk = blk.reshape(E * d3, ncm)
            wsub = (scale * wblk[jnp.asarray(row_perm)]).astype(blk.dtype)
            y = blk @ wsub
            acc = y if acc is None else acc + y
        y = acc.reshape(E, d3, mio.mul)
        # rotate the l3 block back to the global frame: D^T y
        y = jnp.einsum("eji,ejv->eiv", Ds[l3], y)
        y = jnp.swapaxes(y, -1, -2).reshape(E, mio.mul * d3)
        out_chunks.append(y.astype(x.dtype))
    out = jnp.concatenate(out_chunks, axis=-1)
    return out.reshape(*batch_shape, out.shape[-1])
