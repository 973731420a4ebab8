"""Reference-format Uni-HamGNN pickle import (VERDICT round-1 item 7).

Builds a pickle fixture with the reference's structure — a
``HamiltonianPredictor`` object whose ``non_soc_model`` is a live torch module
tree under legacy ``HamGNN_v_2_1.*`` module paths
(/root/reference/Uni-HamGNN/Uni-HamiltonianPredictor.py:80-137) — then deletes
those fake packages so the unpickler must survive unimportable classes, and
converts the pickle into a loadable package consumed end-to-end by the
uni_hamgnn predictor.
"""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.interfaces.uni_pickle import (
    extract_state_dicts,
    predictor_state_dicts,
    stub_unpickle,
)
from test_e3nn_compat import (
    FEAT,
    NUM_LAYERS,
    NUM_RADIAL,
    NUM_TYPES,
    RADIAL_MLP,
    SH,
    _build_reference_state,
)
from util_fixtures import add_random_hamiltonian_targets, make_crystal


def _torch_module_from_state(state):
    """Nested torch module tree holding a Parameter per flat state key."""
    root = torch.nn.Module()
    for key, value in state.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            if not hasattr(node, p) or not isinstance(getattr(node, p),
                                                      torch.nn.Module):
                setattr(node, p, torch.nn.Module())
            node = getattr(node, p)
        node.register_parameter(
            parts[-1].replace("weight", "weight"),
            torch.nn.Parameter(torch.as_tensor(np.asarray(value),
                                               dtype=torch.float32)))
    return root


def _make_reference_pickle(tmp_path, state):
    """Pickle a predictor under fake legacy module paths, then remove them."""
    legacy = types.ModuleType("HamGNN_v_2_1")
    legacy_models = types.ModuleType("HamGNN_v_2_1.models")

    class Model(torch.nn.Module):
        pass

    Model.__module__ = "HamGNN_v_2_1.models"
    Model.__qualname__ = "Model"
    legacy_models.Model = Model

    class HamiltonianPredictor:
        pass

    pred_mod = types.ModuleType("Uni_HamiltonianPredictor")
    HamiltonianPredictor.__module__ = "Uni_HamiltonianPredictor"
    HamiltonianPredictor.__qualname__ = "HamiltonianPredictor"
    pred_mod.HamiltonianPredictor = HamiltonianPredictor

    sys.modules["HamGNN_v_2_1"] = legacy
    sys.modules["HamGNN_v_2_1.models"] = legacy_models
    sys.modules["Uni_HamiltonianPredictor"] = pred_mod
    try:
        inner = _torch_module_from_state(state)
        model = Model()
        # Lightning Model attribute names (reference Model.py:63)
        model.representation = getattr(inner, "representation")
        model.output_module = getattr(inner, "output_module")
        pred = HamiltonianPredictor()
        pred.non_soc_model = model
        pred.soc_model = None
        pred.device = "cpu"
        path = tmp_path / "uni-hamgnn_fixture.pkl"
        with open(path, "wb") as f:
            pickle.dump(pred, f)
    finally:
        for name in ("HamGNN_v_2_1", "HamGNN_v_2_1.models",
                     "Uni_HamiltonianPredictor"):
            sys.modules.pop(name, None)
    return path


def test_stub_unpickle_and_state_extraction(tmp_path):
    rng = np.random.default_rng(0)
    # rename to the reference's raw prefixes ("representation."/"output_module.")
    state = _build_reference_state(rng)
    path = _make_reference_pickle(tmp_path, state)

    pred = stub_unpickle(str(path))
    assert type(pred).__name__.startswith("Stub_")
    states = predictor_state_dicts(pred)
    got = states["non_soc"]
    assert set(got) == set(state)
    for k in state:
        np.testing.assert_allclose(got[k], np.asarray(state[k], np.float32),
                                   rtol=1e-6)


@pytest.mark.slow


def test_convert_predictor_pickle_end_to_end(tmp_path):
    import jax

    from hamgnn_tpu.interfaces.uni_pickle import convert_predictor_pickle
    from hamgnn_tpu.tools.uni_hamgnn import HamiltonianPredictor
    from hamgnn_tpu.train.config import load_config

    rng = np.random.default_rng(1)
    state = _build_reference_state(rng)
    path = _make_reference_pickle(tmp_path, state)

    config = load_config(None, overrides={
        "representation_nets": {"HamGNN_pre": {
            "num_types": NUM_TYPES, "irreps_edge_sh": SH,
            "irreps_node_features": FEAT, "num_layers": NUM_LAYERS,
            "num_radial": NUM_RADIAL, "cutoff": 4.0,
            "radial_MLP": list(RADIAL_MLP),
        }},
        "output_nets": {"HamGNN_out": {
            "nao_max": 14, "ham_type": "openmx", "add_H0": False,
            "zero_point_shift": False,
        }},
    })

    c = make_crystal(rng, n_atoms=4, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], bucket_multiple=8)

    out_dir = tmp_path / "package"
    counts = convert_predictor_pickle(str(path), config, str(out_dir),
                                      example_graph=graph)
    assert counts["non_soc"] > 100

    pred = HamiltonianPredictor.load(str(out_dir))
    assert pred.compat
    preds = pred.predict_nonsoc(graph)
    assert np.isfinite(np.asarray(preds["hamiltonian_on"])).all()


def _build_soc_reference_state(rng):
    """Synthetic SOC-stage state: same representation tree + so3 ksi heads +
    the (unused under add_H_nonsoc) plain hamiltonian heads."""
    from hamgnn_tpu.e3.gate import make_gate
    from hamgnn_tpu.e3.irreps import Irreps
    from hamgnn_tpu.models.basis import get_basis_set, hamiltonian_irreps
    from test_e3nn_compat import _e3nn_linear_numel

    state = _build_reference_state(rng)  # includes the plain ham heads
    gate, gate_in = make_gate(Irreps(FEAT))
    gate_out = Irreps(gate.irreps_out)
    ksi = Irreps(f"{14 * 14}x0e")
    O = "output_module."
    for head in ("onsite_ksi", "offsite_ksi"):
        state[O + f"{head}_network.residual_block.linear1.weight"] = rng.normal(
            size=(_e3nn_linear_numel(Irreps(FEAT), gate_in),))
        state[O + f"{head}_network.residual_block.linear2.weight"] = rng.normal(
            size=(_e3nn_linear_numel(gate_out, Irreps(FEAT)),))
        state[O + f"{head}_network.linear_transform.weight"] = rng.normal(
            size=(_e3nn_linear_numel(Irreps(FEAT), ksi),))
    return state


@pytest.mark.slow
def test_two_stage_torch_save_zip_conversion(tmp_path):
    """Published-predictor realism: a torch.save (zip-container) pickle with
    BOTH stages converts into a package and runs two-stage inference."""
    import jax

    from hamgnn_tpu.interfaces.uni_pickle import convert_predictor_pickle
    from hamgnn_tpu.tools.uni_hamgnn import HamiltonianPredictor
    from hamgnn_tpu.train.config import load_config

    rng = np.random.default_rng(3)
    state_nonsoc = _build_reference_state(rng)
    state_soc = _build_soc_reference_state(rng)

    legacy = types.ModuleType("HamGNN_v_2_1")
    legacy_models = types.ModuleType("HamGNN_v_2_1.models")

    class Model(torch.nn.Module):
        pass

    Model.__module__ = "HamGNN_v_2_1.models"
    Model.__qualname__ = "Model"
    legacy_models.Model = Model

    class HP:
        pass

    pred_mod = types.ModuleType("Uni_HamiltonianPredictor")
    HP.__module__ = "Uni_HamiltonianPredictor"
    HP.__qualname__ = "HamiltonianPredictor"
    pred_mod.HamiltonianPredictor = HP

    sys.modules["HamGNN_v_2_1"] = legacy
    sys.modules["HamGNN_v_2_1.models"] = legacy_models
    sys.modules["Uni_HamiltonianPredictor"] = pred_mod
    try:
        def as_model(state):
            inner = _torch_module_from_state(state)
            m = Model()
            m.representation = inner.representation
            m.output_module = inner.output_module
            return m

        pred = HP()
        pred.non_soc_model = as_model(state_nonsoc)
        pred.soc_model = as_model(state_soc)
        pred.device = "cpu"
        path = tmp_path / "uni_two_stage.pkl"
        torch.save(pred, str(path))  # zipfile container + persistent storages
    finally:
        for name in ("HamGNN_v_2_1", "HamGNN_v_2_1.models",
                     "Uni_HamiltonianPredictor"):
            sys.modules.pop(name, None)

    overrides = {
        "representation_nets": {"HamGNN_pre": {
            "num_types": NUM_TYPES, "irreps_edge_sh": SH,
            "irreps_node_features": FEAT, "num_layers": NUM_LAYERS,
            "num_radial": NUM_RADIAL, "cutoff": 4.0,
            "radial_MLP": list(RADIAL_MLP),
        }},
        "output_nets": {"HamGNN_out": {
            "nao_max": 14, "ham_type": "openmx", "add_H0": False,
            "zero_point_shift": False,
        }},
    }
    config = load_config(None, overrides=overrides)
    soc_over = {k: dict(v) for k, v in overrides.items()}
    soc_over["output_nets"] = {"HamGNN_out": {
        "nao_max": 14, "ham_type": "openmx", "add_H0": False,
        "zero_point_shift": False, "soc_switch": True, "soc_basis": "so3",
    }}
    soc_config = load_config(None, overrides=soc_over)

    c = make_crystal(rng, n_atoms=4, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    n, e = c["z"].shape[0], c["edge_index"].shape[1]
    c["Lon"] = 0.1 * rng.normal(size=(n, 14 * 14, 3))
    c["Loff"] = 0.1 * rng.normal(size=(e, 14 * 14, 3))
    graph = pad_and_batch([c], bucket_multiple=8)

    out_dir = tmp_path / "package2"
    counts = convert_predictor_pickle(str(path), config, str(out_dir),
                                      example_graph=graph,
                                      soc_config=soc_config)
    assert counts["non_soc"] > 100 and counts["soc"] > 100

    pred2 = HamiltonianPredictor.load(str(out_dir))
    assert pred2.soc_enabled and pred2.compat
    nonsoc = pred2.predict_nonsoc(graph)
    h_on = nonsoc["hamiltonian_on"]
    h_off = nonsoc["hamiltonian_off"]
    soc_out = pred2.predict_soc(graph, h_on, h_off)
    for k, v in soc_out.items():
        if hasattr(v, "dtype"):
            assert np.isfinite(np.asarray(v)).all(), k
