"""Numerical parity against an independent PyTorch+autograd implementation.

VERDICT r3 item 6: the torch transcription of the packed
TP -> radial-scale -> Linear pipeline (tools_dev/torch_baseline.py — the
same math as the reference composition
/root/reference/hamgnn/nn/tensor_products.py:51-189 +
message_passing.py:80-107, written against torch autograd) must agree with
the JAX engines on identical weights, forward AND gradients.  This closes
the gap between "checkpoint import is structurally complete" and "the
imported model computes the same numbers": e3nn itself is not installable
here (no network), but torch is, and autograd differentiates the
transcription independently of JAX's AD.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools_dev"))

from torch_baseline import torch_apply  # noqa: E402

from hamgnn_tpu.e3.packed_tp import get_plan  # noqa: E402
from hamgnn_tpu.e3.spherical import spherical_harmonics  # noqa: E402

FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+2x3o+2x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"


def _case(seed=0, E=32):
    plan = get_plan(FEAT, SH, FEAT, FEAT)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(E, plan.irreps_in.dim)).astype(np.float64)
    vec = rng.normal(size=(E, 3))
    sh = np.asarray(spherical_harmonics(
        [0, 1, 2, 3, 4], jnp.asarray(vec, jnp.float64), normalize=True),
        np.float64)
    w = rng.normal(size=(E, plan.weight_numel)).astype(np.float64)
    fw = rng.normal(size=(plan.linear_numel,)).astype(np.float64)
    return plan, x, sh, w, fw


def test_packed_pipeline_matches_torch_forward_and_grads():
    plan, x, sh, w, fw = _case()

    # torch forward + grads (fp64)
    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    fwt = torch.tensor(fw, requires_grad=True)
    sht = torch.tensor(sh)
    out_t = torch_apply(plan, xt, sht, wt, fwt)
    loss_t = (out_t ** 2).sum()
    loss_t.backward()

    # jax forward + grads (f32 numerics; tolerance set accordingly)
    xj = jnp.asarray(x, jnp.float32)
    shj = jnp.asarray(sh, jnp.float32)
    wj = jnp.asarray(w, jnp.float32)
    fwj = jnp.asarray(fw, jnp.float32)
    out_j = plan._apply(xj, shj, wj, fwj)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), atol=5e-4, rtol=1e-3)

    def loss_j(x, w, fw):
        return jnp.sum(plan._apply(x, shj, w, fw) ** 2)

    gx, gw, gfw = jax.grad(loss_j, argnums=(0, 1, 2))(xj, wj, fwj)
    for name, a, b in (("dx", gx, xt.grad), ("dw", gw, wt.grad),
                       ("dflat_w", gfw, fwt.grad)):
        a = np.asarray(a)
        b = b.numpy()
        scale = max(np.abs(b).max(), 1e-9)
        assert np.abs(a - b).max() / scale < 2e-3, name


def test_zonal_engine_matches_torch():
    """The edge-frame (zonal) engine against the independent torch autograd
    implementation — transitively pins the whole reformulation chain
    (rotation construction, Wigner-D recursion, zonal sparsity) to a
    non-JAX ground truth."""
    from hamgnn_tpu.e3.zonal_tp import zonal_apply

    plan, x, sh, w, fw = _case(seed=1)
    xt = torch.tensor(x)
    out_t = torch_apply(plan, xt, torch.tensor(sh), torch.tensor(w),
                        torch.tensor(fw))
    out_z = zonal_apply(plan, jnp.asarray(x, jnp.float32),
                        jnp.asarray(sh, jnp.float32),
                        jnp.asarray(w, jnp.float32),
                        jnp.asarray(fw, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out_z), out_t.numpy(), atol=5e-4, rtol=1e-3)
