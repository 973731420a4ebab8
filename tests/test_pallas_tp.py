"""Pallas TP kernels (e3/pallas_tp.py) vs the packed XLA path: identical
inputs and parameters must give matching outputs and gradients (fwd kernel +
custom-VJP bwd kernel, run in interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.packed_tp import get_plan
from hamgnn_tpu.e3.pallas_tp import pallas_apply

CASES = [
    ("8x0e+4x0o+3x1o+2x1e+2x2e+1x2o+1x3o", "0e+1o+2e+3o",
     "6x0e+2x0o+3x1o+1x1e+2x2e+1x2o+1x3o+1x3e"),
    ("4x0e+2x1o+1x2e", "0e+1o+2e", "4x0e+2x1o+2x2e"),
    # output irreps missing some ls the TP could produce (path filtering)
    ("4x0e+2x1o+1x2e+1x3o", "0e+1o+2e+3o+4e", "3x0e+1x1o"),
    ("8x0e", "0e+1o+2e", "4x0e+2x1o+1x2e"),
]


def _setup(irreps_in, irreps_sh, irreps_out, seed=0, E=23):
    plan = get_plan(irreps_in, irreps_sh, irreps_out, irreps_out)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(E, Irreps(irreps_in).dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, Irreps(irreps_sh).dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, plan.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(plan.linear_numel,)), jnp.float32)
    return plan, x, sh, w, fw


@pytest.mark.parametrize("case", CASES)
def test_pallas_forward_matches_xla(case):
    plan, x, sh, w, fw = _setup(*case)
    a = plan._apply(x, sh, w, fw)
    b = pallas_apply(plan, x, sh, w, fw, interpret=True)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("case", CASES[:2])
def test_pallas_forward_no_weight(case):
    plan, x, sh, _, fw = _setup(*case)
    a = plan._apply(x, sh, None, fw)
    b = pallas_apply(plan, x, sh, None, fw, interpret=True)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


@pytest.mark.slow


def test_pallas_multi_tile_and_padding():
    """E spanning several 128-edge tiles + a ragged tail; dWcat accumulates
    across grid steps."""
    plan, x, sh, w, fw = _setup(*CASES[0], E=300)

    def loss_p(x, sh, w, fw):
        return jnp.sum(jnp.sin(pallas_apply(plan, x, sh, w, fw,
                                            interpret=True)))

    def loss_x(x, sh, w, fw):
        return jnp.sum(jnp.sin(plan._apply(x, sh, w, fw)))

    va, ga = jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3))(x, sh, w, fw)
    vb, gb = jax.value_and_grad(loss_p, argnums=(0, 1, 2, 3))(x, sh, w, fw)
    np.testing.assert_allclose(va, vb, atol=1e-3, rtol=1e-5)
    for a, b, name in zip(ga, gb, ["dx", "dsh", "dw", "dflat_w"]):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4,
                                   err_msg=name)


@pytest.mark.parametrize("case", CASES)
def test_pallas_gradients_match(case):
    plan, x, sh, w, fw = _setup(*case)

    def loss_p(x, sh, w, fw):
        return jnp.sum(jnp.sin(pallas_apply(plan, x, sh, w, fw,
                                            interpret=True)))

    def loss_x(x, sh, w, fw):
        return jnp.sum(jnp.sin(plan._apply(x, sh, w, fw)))

    ga = jax.grad(loss_x, argnums=(0, 1, 2, 3))(x, sh, w, fw)
    gb = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, sh, w, fw)
    for a, b, name in zip(ga, gb, ["dx", "dsh", "dw", "dflat_w"]):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4, err_msg=name)


def test_pallas_gradients_no_weight():
    plan, x, sh, _, fw = _setup(*CASES[1])

    def loss_p(x, sh, fw):
        return jnp.sum(jnp.sin(pallas_apply(plan, x, sh, None, fw,
                                            interpret=True)))

    def loss_x(x, sh, fw):
        return jnp.sum(jnp.sin(plan._apply(x, sh, None, fw)))

    ga = jax.grad(loss_x, argnums=(0, 1, 2))(x, sh, fw)
    gb = jax.grad(loss_p, argnums=(0, 1, 2))(x, sh, fw)
    for a, b, name in zip(ga, gb, ["dx", "dsh", "dflat_w"]):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4, err_msg=name)


@pytest.mark.slow


def test_pallas_sh_needs_grad_false():
    """sh_needs_grad=False must not change out/dx/dw/dflat_w (dsh is the only
    cotangent skipped)."""
    plan, x, sh, w, fw = _setup(*CASES[0])

    def loss(flag, x, w, fw):
        return jnp.sum(jnp.sin(pallas_apply(
            plan, x, sh, w, fw, interpret=True, sh_needs_grad=flag)))

    va, ga = jax.value_and_grad(lambda *a: loss(True, *a),
                                argnums=(0, 1, 2))(x, w, fw)
    vb, gb = jax.value_and_grad(lambda *a: loss(False, *a),
                                argnums=(0, 1, 2))(x, w, fw)
    np.testing.assert_allclose(va, vb, rtol=1e-6)
    for a, b, name in zip(ga, gb, ["dx", "dw", "dflat_w"]):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6, err_msg=name)
