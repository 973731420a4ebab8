"""Zonal (edge-frame) TP engine parity: e3/zonal_tp.py + e3/pallas_zonal.py
must reproduce the packed engine exactly (same parameters, same math).

The zonal reformulation computes out = D^T . pipeline(D x, sh(z)) per edge
(sh(z) constant, zonal CG 2-sparse); correctness hinges on the Wigner-D
convention matching e3/spherical.py's yzx real-SH basis and on the antipodal
rotation branch, so those get explicit cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.e3.packed_tp import get_plan
from hamgnn_tpu.e3.pallas_zonal import zonal_pallas_apply
from hamgnn_tpu.e3.spherical import spherical_harmonics
from hamgnn_tpu.e3.zonal_tp import (
    align_to_z,
    batched_wigner_D,
    zonal_apply,
)
from hamgnn_tpu.e3.wigner import wigner_D

FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+2x3o+2x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"
SH_LS = [0, 1, 2, 3, 4]


def _case(seed=0, E=40):
    plan = get_plan(FEAT, SH, FEAT, FEAT)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(E, plan.irreps_in.dim)), jnp.float32)
    vec = rng.normal(size=(E, 3))
    vec[0] = [0, 0, 1]       # exactly zonal
    vec[1] = [0, 0, -1]      # antipodal branch
    vec[2] = [1e-7, -1e-7, -1]  # near-antipodal
    sh = spherical_harmonics(SH_LS, jnp.asarray(vec, jnp.float32),
                             normalize=True)
    w = jnp.asarray(rng.normal(size=(E, plan.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(plan.linear_numel,)), jnp.float32)
    return plan, x, sh, w, fw


def test_batched_wigner_matches_reference():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 3, 3))
    Rs = []
    for m in a:
        q, _ = np.linalg.qr(m)
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        Rs.append(q)
    Rs = np.stack(Rs)
    Ds = batched_wigner_D(4, jnp.asarray(Rs))  # f32 under the test config
    for l in range(5):
        for e in range(len(Rs)):
            np.testing.assert_allclose(np.asarray(Ds[l][e]),
                                       wigner_D(l, Rs[e]), atol=2e-5)


def test_align_to_z():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(64, 3))
    v[0] = [0, 0, 1]
    v[1] = [0, 0, -1]
    v[2] = [1e-8, 0, -1]
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    R = np.asarray(align_to_z(jnp.asarray(v, jnp.float32)))
    # R r = z, R orthogonal, det +1
    np.testing.assert_allclose(np.einsum("eij,ej->ei", R, v),
                               np.tile([0, 0, 1.0], (64, 1)), atol=1e-5)
    np.testing.assert_allclose(np.einsum("eij,ekj->eik", R, R),
                               np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    assert np.all(np.linalg.det(R) > 0.99)


def test_zonal_xla_matches_packed():
    plan, x, sh, w, fw = _case()
    ref = plan._apply(x, sh, w, fw)
    zon = zonal_apply(plan, x, sh, w, fw)
    np.testing.assert_allclose(np.asarray(zon), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    ref0 = plan._apply(x, sh, None, fw)
    zon0 = zonal_apply(plan, x, sh, None, fw)
    np.testing.assert_allclose(np.asarray(zon0), np.asarray(ref0),
                               atol=2e-5, rtol=1e-4)


def test_zonal_pallas_fwd_bwd_matches_packed():
    plan, x, sh, w, fw = _case(seed=3)

    ref = plan._apply(x, sh, w, fw)
    zon = zonal_pallas_apply(plan, x, sh, w, fw, interpret=True)
    np.testing.assert_allclose(np.asarray(zon), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    def loss_ref(x, w, fw):
        return jnp.sum(plan._apply(x, sh, w, fw) ** 2)

    def loss_zon(x, w, fw):
        return jnp.sum(zonal_pallas_apply(plan, x, sh, w, fw,
                                          interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, fw)
    gz = jax.grad(loss_zon, argnums=(0, 1, 2))(x, w, fw)
    for name, a, b in zip(("dx", "dw", "dflat_w"), gr, gz):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        scale = max(np.abs(a).max(), 1e-9)
        assert err / scale < 1e-4, (name, err, scale)


def test_zonal_pallas_no_weight():
    plan, x, sh, w, fw = _case(seed=4)
    ref = plan._apply(x, sh, None, fw)
    zon = zonal_pallas_apply(plan, x, sh, None, fw, interpret=True)
    np.testing.assert_allclose(np.asarray(zon), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
