"""Closed-form e3nn-convention golden vectors (VERDICT r2 item 7).

e3nn is not installable in this sandbox, so the compat surface cannot be
checked against live e3nn outputs.  These tests pin the *hand-derived*
numerical conventions instead — exact literals computed from the published
e3nn 0.5 semantics (component-normalized spherical harmonics, orthonormal
wigner-3j with sqrt(2L+1) component scaling, uvw path weights with
1/sqrt(fan_in) normalization, o3.Linear 1/sqrt(fan_in)) and from basis-
independent identities (Parseval completeness of the CG decomposition),
so a convention regression cannot hide behind a same-convention reimpl.

Reference surface: /root/reference/hamgnn/nn/tensor_products.py:51-189
(e3nn o3.TensorProduct uvw + o3.Linear), toolbox/nequip/nn/embedding/
_edge.py:45,59-67 (xyz->yzx input permutation before o3.SphericalHarmonics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.linear import Linear
from hamgnn_tpu.e3.spherical import spherical_harmonics
from hamgnn_tpu.e3.tensor_product import TensorProduct
from hamgnn_tpu.e3.wigner import wigner_3j


def _tp_out(ir1, ir2, iro, instructions, x, y, weights):
    tp = TensorProduct(irreps_in1=Irreps(ir1), irreps_in2=Irreps(ir2),
                       irreps_out=Irreps(iro), instructions=tuple(instructions))
    import jax

    params = tp.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    flat = {}
    for name, val in params["params"].items():
        flat[name] = jnp.asarray(np.broadcast_to(
            np.asarray(weights[name]), val.shape).astype(np.float32))
    return np.asarray(tp.apply({"params": flat}, jnp.asarray(x),
                               jnp.asarray(y)))


def test_wigner_3j_literals():
    """Known exact wigner-3j values (Racah closed form)."""
    w = wigner_3j(1, 1, 1)
    # antisymmetric epsilon / sqrt(6) in any real basis: check norm + total
    # antisymmetry + single-element magnitude
    assert np.allclose(np.abs(w[w != 0]), 1 / np.sqrt(6))
    assert np.isclose((w ** 2).sum(), 1.0)
    assert np.allclose(w, -np.transpose(w, (1, 0, 2)))
    # w3j(0,1,1) = delta / sqrt(3)
    w0 = wigner_3j(0, 1, 1)
    assert np.allclose(w0[0], np.eye(3) / np.sqrt(3))
    # orthonormality: sum over (m1,m2) of w3j(L)_k w3j(L)_k' = delta/(2L+1)...
    for L in (0, 1, 2):
        wL = wigner_3j(L, 1, 1).reshape(2 * L + 1, -1)
        assert np.allclose(wL @ wL.T, np.eye(2 * L + 1) / (2 * L + 1),
                           atol=1e-12)
        assert np.isclose((wL ** 2).sum(), 1.0)


def test_spherical_harmonics_component_norm_and_convention():
    """e3nn 'component' normalization: sum_m Y_lm^2 = 2l+1 on the unit
    sphere; and the reference's xyz->yzx input permutation composed with
    e3nn's (y,z,x) irrep-1 basis maps z_hat -> sqrt(3)*(0,1,0)."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(16, 3))
    for l in range(5):
        Y = np.asarray(spherical_harmonics([l], jnp.asarray(v),
                                           normalize=True))
        assert Y.shape == (16, 2 * l + 1)
        np.testing.assert_allclose((Y ** 2).sum(-1), 2 * l + 1, rtol=1e-5)

    # e3nn's l=1 basis order is (y, z, x): o3.spherical_harmonics returns
    # the input as-is for l=1 (sqrt(3)-scaled) and ASSUMES the caller feeds
    # vectors in that convention — which is exactly why the reference
    # permutes edge vectors xyz->yzx before calling it (_edge.py:45).  The
    # composed convention: SH_1(v) = sqrt(3) * (v_y, v_z, v_x) / |v|.
    for vec, expect in ((([0.0, 0.0, 1.0]), [0.0, 1.0, 0.0]),
                        (([1.0, 0.0, 0.0]), [0.0, 0.0, 1.0]),
                        (([0.0, 1.0, 0.0]), [1.0, 0.0, 0.0])):
        y1 = np.asarray(spherical_harmonics(
            [1], jnp.asarray([vec]), normalize=True))[0]
        np.testing.assert_allclose(y1, np.sqrt(3.0) * np.array(expect),
                                   atol=1e-6)


def test_tp_scalar_literal():
    """uvw TP of scalars: out = w * x * y exactly (fan_in 1, no norm)."""
    out = _tp_out("1x0e", "1x0e", "1x0e", [(0, 0, 0, "uvw", True)],
                  np.array([[2.0]]), np.array([[3.0]]), {"w0": 1.5})
    np.testing.assert_allclose(out, [[9.0]], rtol=1e-6)


def test_tp_uvw_fan_in_normalization():
    """uvw with mul1=2: out = (w1 x1 + w2 x2) y / sqrt(2) — the e3nn
    1/sqrt(fan_in) path normalization as an exact literal."""
    x = np.array([[1.0, 10.0]])
    y = np.array([[2.0]])
    out = _tp_out("2x0e", "1x0e", "1x0e", [(0, 0, 0, "uvw", True)],
                  x, y, {"w0": np.array([[[1.0]], [[1.0]]])})
    np.testing.assert_allclose(out, [[(1 + 10) * 2 / np.sqrt(2)]], rtol=1e-6)


def test_tp_vector_dot_literal():
    """1o x 1o -> 0e: out = w * (x . y) / sqrt(3) (w3j(0,1,1) = I/sqrt(3))."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 3))
    y = rng.normal(size=(4, 3))
    out = _tp_out("1x1o", "1x1o", "1x0e", [(0, 0, 0, "uvw", True)],
                  x, y, {"w0": 2.0})
    np.testing.assert_allclose(out[:, 0], 2.0 * (x * y).sum(-1) / np.sqrt(3),
                               rtol=1e-5)


def test_tp_cross_norm_literal():
    """1o x 1o -> 1e with component normalization: |out| = |w| |x cross y| /
    sqrt(2) (basis-independent norm; the basis itself is convention)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 3))
    y = rng.normal(size=(4, 3))
    out = _tp_out("1x1o", "1x1o", "1x1e", [(0, 0, 0, "uvw", True)],
                  x, y, {"w0": 1.0})
    cross = np.cross(x, y)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1),
        np.linalg.norm(cross, axis=-1) / np.sqrt(2), rtol=1e-5)
    # and antisymmetry: TP(x, x) -> 1e vanishes identically
    out_xx = _tp_out("1x1o", "1x1o", "1x1e", [(0, 0, 0, "uvw", True)],
                     x, x, {"w0": 1.0})
    np.testing.assert_allclose(out_xx, 0.0, atol=1e-6)


def test_tp_parseval_completeness():
    """CG completeness: with unit weights, sum_L |out_L|^2 = |x|^2 |y|^2 —
    pins the sqrt(2L+1) component scaling across ALL output L at once."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 3))
    y = rng.normal(size=(4, 3))
    total = np.zeros(4)
    for iro, L in (("1x0e", 0), ("1x1e", 1), ("1x2e", 2)):
        out = _tp_out("1x1o", "1x1o", iro, [(0, 0, 0, "uvw", True)],
                      x, y, {"w0": 1.0})
        total += (out ** 2).sum(-1)
    np.testing.assert_allclose(
        total, (x ** 2).sum(-1) * (y ** 2).sum(-1), rtol=1e-5)


def test_linear_fan_in_literal():
    """o3.Linear('2x0e' -> '1x0e'): out = (w1 x1 + w2 x2)/sqrt(2); and
    mul-1 identity path: out = w * x exactly."""
    import jax

    lin = Linear(Irreps("2x0e"), Irreps("1x0e"))
    p = lin.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))
    (wname, wval), = p["params"].items()
    ones = jnp.ones_like(wval)
    out = lin.apply({"params": {wname: ones}}, jnp.asarray([[3.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(out), [[8.0 / np.sqrt(2)]],
                               rtol=1e-6)

    lin1 = Linear(Irreps("1x1o"), Irreps("1x1o"))
    p1 = lin1.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    (wn, wv), = p1["params"].items()
    out1 = lin1.apply({"params": {wn: 2.0 * jnp.ones_like(wv)}},
                      jnp.asarray([[1.0, -2.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(out1), [[2.0, -4.0, 1.0]],
                               rtol=1e-6)
