"""Torch-checkpoint import shim: exact o3.Linear weight conversion + loaders."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.linear import Linear
from hamgnn_tpu.interfaces.torch_ckpt import (
    assign_params,
    convert_fcn_weights,
    convert_o3_linear_weight,
    e3nn_linear_instructions,
    flatten_params,
    load_torch_checkpoint,
    suggest_shape_matches,
)
from hamgnn_tpu.nn.mlp import FullyConnectedNet


def e3nn_linear_forward(x, flat_w, irreps_in, irreps_out):
    """Direct transcription of e3nn o3.Linear semantics (input-major
    instruction order, per-output 1/sqrt(fan_in)) for the parity check."""
    irreps_in, irreps_out = Irreps(irreps_in), Irreps(irreps_out)
    instr = e3nn_linear_instructions(irreps_in, irreps_out)
    in_slices = irreps_in.slices()

    fan_in = {j: sum(irreps_in[i].mul for i, jj in instr if jj == j)
              for j in range(len(irreps_out))}
    outputs = [np.zeros(x.shape[:-1] + (mo.dim,)) for mo in irreps_out]
    ofs = 0
    for (i, j) in instr:
        mi, mo = irreps_in[i], irreps_out[j]
        n = mi.mul * mo.mul
        w = flat_w[ofs : ofs + n].reshape(mi.mul, mo.mul)
        ofs += n
        xin = x[..., in_slices[i]].reshape(x.shape[:-1] + (mi.mul, mi.ir.dim))
        y = np.einsum("...ui,uv->...vi", xin, w) / np.sqrt(fan_in[j])
        outputs[j] = outputs[j] + y.reshape(y.shape[:-2] + (mo.dim,))
    return np.concatenate(outputs, axis=-1)


@pytest.mark.parametrize("irr_in,irr_out", [
    ("8x0e+4x1o+2x2e", "6x0e+4x1o+2x2e"),
    ("4x0e+4x0e+2x1o", "3x0e+5x1o+1x2e"),   # dup input irreps + unmatched out
    ("2x1o+2x1e", "2x1e+2x1o"),             # parity distinction
])
def test_o3_linear_weight_conversion(irr_in, irr_out):
    irreps_in, irreps_out = Irreps(irr_in), Irreps(irr_out)
    n_w = sum(irreps_in[i].mul * irreps_out[j].mul
              for i, j in e3nn_linear_instructions(irreps_in, irreps_out))
    rng = np.random.default_rng(0)
    flat_w = rng.standard_normal(n_w).astype(np.float32)
    x = rng.standard_normal((5, irreps_in.dim)).astype(np.float32)

    expected = e3nn_linear_forward(x, flat_w, irreps_in, irreps_out)

    ours = convert_o3_linear_weight(flat_w, irreps_in, irreps_out)
    lin = Linear(irreps_in, irreps_out)
    params = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert params["params"]["w"].shape == ours.shape
    got = lin.apply({"params": {"w": jnp.asarray(ours)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_fcn_conversion_and_assign():
    hs = [16, 32, 8]
    rng = np.random.default_rng(1)
    state = {
        "radial.layers.0.weight": rng.standard_normal((16, 32)).astype(np.float32),
        "radial.layers.1.weight": rng.standard_normal((32, 8)).astype(np.float32),
    }
    conv = convert_fcn_weights(state, "radial.")
    assert set(conv) == {"w0", "w1"}

    net = FullyConnectedNet(hs=hs)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_params, untouched = assign_params(
        params["params"], {"w0": conv["w0"], "w1": conv["w1"]})
    assert untouched == []
    got = net.apply({"params": new_params}, jnp.asarray(x))
    assert np.isfinite(np.asarray(got)).all()

    with pytest.raises(KeyError):
        assign_params(params["params"], {"nope": conv["w0"]})
    with pytest.raises(ValueError):
        assign_params(params["params"], {"w0": np.zeros((2, 2))})


def test_load_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "model.head.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3),
        "model.epoch_count": 7,  # non-tensor dropped
    }
    path = os.path.join(tmp_path, "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"lr": 1e-3}}, path)
    out = load_torch_checkpoint(path)
    assert list(out) == ["head.weight"]
    np.testing.assert_allclose(out["head.weight"], np.arange(6).reshape(2, 3))


def test_suggest_shape_matches():
    lin = Linear(Irreps("4x0e"), Irreps("4x0e"))
    params = lin.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state = {"lin.weight": np.zeros(16, np.float32), "other": np.zeros((3, 3))}
    sug = suggest_shape_matches(params["params"], state)
    assert sug["w"] == ["lin.weight"]
    flat = flatten_params(params["params"])
    assert list(flat) == ["w"]
