"""Env-gated Pallas VJP variants must match the default path.

HAMGNN_TP_STOREMID=1 (forward persists the flat mid tensors; backward reads
them instead of recomputing) is bit-exact by construction — the stored values
are the same fp32 mids.  HAMGNN_TP_DX=merged (one W_rep dot per chunk in the
dx stage) reassociates the MXU dots, so it is checked to float tolerance.
Both run here through the interpret-mode kernels (CPU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.packed_tp import get_plan
from hamgnn_tpu.e3 import pallas_tp as ptp

FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+1x3o+1x3e+1x4e"
SH = "0e + 1o + 2e + 3o + 4e"


@pytest.fixture(scope="module")
def pipeline_case():
    p = get_plan(FEAT, SH, FEAT, FEAT)
    E = 200
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, Irreps(FEAT).dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, 25)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, p.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(p.linear_numel,)), jnp.float32)
    return p, x, sh, w, fw


def _run(p, x, sh, w, fw, needs_dsh):
    def loss(x, sh, w, fw):
        return jnp.sum(ptp.pallas_apply(p, x, sh, w, fw, interpret=True,
                                        sh_needs_grad=needs_dsh) ** 2)
    argnums = (0, 1, 2, 3) if needs_dsh else (0, 2, 3)
    return jax.value_and_grad(loss, argnums=argnums)(x, sh, w, fw)


@pytest.fixture()
def clean_env():
    saved = {k: os.environ.pop(k, None)
             for k in ("HAMGNN_TP_STOREMID", "HAMGNN_TP_DX")}
    jax.clear_caches()
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    jax.clear_caches()


@pytest.mark.parametrize("needs_dsh", [False, True])
def test_storemid_bit_exact(pipeline_case, clean_env, needs_dsh):
    p, x, sh, w, fw = pipeline_case
    v0, g0 = _run(p, x, sh, w, fw, needs_dsh)
    os.environ["HAMGNN_TP_STOREMID"] = "1"
    jax.clear_caches()
    v1, g1 = _run(p, x, sh, w, fw, needs_dsh)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_dx_merged_close(pipeline_case, clean_env):
    p, x, sh, w, fw = pipeline_case
    v0, g0 = _run(p, x, sh, w, fw, False)
    os.environ["HAMGNN_TP_DX"] = "merged"
    jax.clear_caches()
    v1, g1 = _run(p, x, sh, w, fw, False)
    # forward identical (merged only changes the dx stage)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
