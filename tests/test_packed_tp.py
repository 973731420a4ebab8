"""Packed lane-dense TP pipeline (e3/packed_tp.py) vs the chunked reference
path: identical parameters must give identical outputs and gradients.

The packed path is the TPU hot-path implementation used by the blocks in
hamgnn_tpu/nn/blocks.py; the chunked path (e3/fused_tp.py chunk_call +
e3/linear.py call_chunks) is kept as the readable reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn
from jax.flatten_util import ravel_pytree

from hamgnn_tpu.e3.fused_tp import SHTensorProductExpansion
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.linear import ElementwiseChannelScale, Linear

CASES = [
    # (irreps_in, irreps_sh, irreps_out)
    ("8x0e+4x0o+3x1o+2x1e+2x2e+1x2o+1x3o", "0e+1o+2e+3o",
     "6x0e+2x0o+3x1o+1x1e+2x2e+1x2o+1x3o+1x3e"),
    ("4x0e+2x1o+1x2e", "0e+1o+2e", "4x0e+2x1o+2x2e"),
    # output irreps missing some ls the TP could produce (path filtering)
    ("4x0e+2x1o+1x2e+1x3o", "0e+1o+2e+3o+4e", "3x0e+1x1o"),
    # scalar-only input
    ("8x0e", "0e+1o+2e", "4x0e+2x1o+1x2e"),
]


def _setup(irreps_in, irreps_sh, irreps_out, seed=0, E=23):
    irreps_in, irreps_sh, irreps_out = map(Irreps, (irreps_in, irreps_sh, irreps_out))
    mid = SHTensorProductExpansion.mid_irreps(irreps_in, irreps_sh, irreps_out)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(E, irreps_in.dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, irreps_sh.dim)), jnp.float32)
    nch = ElementwiseChannelScale(irreps_in=mid.simplify(),
                                  irreps_out=irreps_out).weight_numel
    w = jnp.asarray(rng.normal(size=(E, nch)), jnp.float32)
    return irreps_in, irreps_sh, irreps_out, mid, x, sh, w


@pytest.mark.parametrize("case", CASES)
def test_packed_matches_chunked_scaled(case):
    irreps_in, irreps_sh, irreps_out, mid, x, sh, w = _setup(*case)

    class Both(fnn.Module):
        @fnn.compact
        def __call__(self, x, sh, w):
            tp = SHTensorProductExpansion(irreps_in, irreps_sh, irreps_out,
                                          name="tp")
            scaler = ElementwiseChannelScale(irreps_in=mid.simplify(),
                                             irreps_out=irreps_out, name="s")
            return (scaler.call_chunks(tp.chunk_call(x, sh), w),
                    scaler.packed_tp_call(irreps_in, irreps_sh, x, sh, w))

    m = Both()
    params = m.init(jax.random.PRNGKey(0), x, sh, w)
    a, b = m.apply(params, x, sh, w)
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("case", CASES)
def test_packed_weight_order(case):
    """weight_packed=True with a pre-permuted weight equals the default."""
    irreps_in, irreps_sh, irreps_out, mid, x, sh, w = _setup(*case)

    class Both(fnn.Module):
        @fnn.compact
        def __call__(self, x, sh, w):
            scaler = ElementwiseChannelScale(irreps_in=mid.simplify(),
                                             irreps_out=irreps_out, name="s")
            plan = scaler.packed_plan(irreps_in, irreps_sh)
            wp = w[:, np.asarray(plan.scale_perm)]
            return (scaler.packed_tp_call(irreps_in, irreps_sh, x, sh, w),
                    scaler.packed_tp_call(irreps_in, irreps_sh, x, sh, wp,
                                          weight_packed=True))

    m = Both()
    params = m.init(jax.random.PRNGKey(0), x, sh, w)
    a, b = m.apply(params, x, sh, w)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("case", CASES[:2])
def test_packed_matches_chunked_lite(case):
    irreps_in, irreps_sh, irreps_out, mid, x, sh, _ = _setup(*case)

    class Lite(fnn.Module):
        @fnn.compact
        def __call__(self, x, sh):
            tp = SHTensorProductExpansion(irreps_in, irreps_sh, irreps_out,
                                          name="tp")
            lin = Linear(mid.simplify(), irreps_out, name="lin")
            return (lin.call_chunks(tp.chunk_call(x, sh)),
                    lin.packed_tp_call(irreps_in, irreps_sh, x, sh))

    m = Lite()
    params = m.init(jax.random.PRNGKey(1), x, sh)
    a, b = m.apply(params, x, sh)
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-5)


@pytest.mark.slow


def test_packed_gradients_match():
    irreps_in, irreps_sh, irreps_out, mid, x, sh, w = _setup(*CASES[0])

    class G(fnn.Module):
        packed: bool

        @fnn.compact
        def __call__(self, x, sh, w):
            tp = SHTensorProductExpansion(irreps_in, irreps_sh, irreps_out,
                                          name="tp")
            scaler = ElementwiseChannelScale(irreps_in=mid.simplify(),
                                             irreps_out=irreps_out, name="s")
            if self.packed:
                return scaler.packed_tp_call(irreps_in, irreps_sh, x, sh, w)
            return scaler.call_chunks(tp.chunk_call(x, sh), w)

    ga, gb = G(packed=False), G(packed=True)
    params = ga.init(jax.random.PRNGKey(2), x, sh, w)

    def loss(mod, p, xx, ww):
        return jnp.sum(jnp.sin(mod.apply(p, xx, sh, ww)))

    _, da = jax.value_and_grad(lambda p: loss(ga, p, x, w))(params)
    _, db = jax.value_and_grad(lambda p: loss(gb, p, x, w))(params)
    fa, fb = ravel_pytree(da)[0], ravel_pytree(db)[0]
    np.testing.assert_allclose(fa, fb, atol=5e-5, rtol=5e-4)

    ia = jax.grad(lambda xx, ww: loss(ga, params, xx, ww), argnums=(0, 1))(x, w)
    ib = jax.grad(lambda xx, ww: loss(gb, params, xx, ww), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(ia[0], ib[0], atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(ia[1], ib[1], atol=5e-5, rtol=5e-4)
