"""Uni-HamGNN two-stage predictor: package save/load + two-stage inference."""

import numpy as np
import pytest
import yaml

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.tools.uni_hamgnn import HamiltonianPredictor, masked_mae

from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+4x2e+2x2o"
SH = "0e + 1o + 2e"


def _write_cfg(path, soc):
    cfg = {
        "setup": {"GNN_Net": "HamGNNpre"},
        "representation_nets": {"HamGNN_pre": {
            "irreps_node_features": FEAT, "irreps_edge_sh": SH,
            "num_layers": 1, "num_radial": 8, "cutoff": 4.0,
            "radial_MLP": [16, 16], "num_types": 20}},
        "output_nets": {"HamGNN_out": {
            "nao_max": 14, "ham_type": "openmx", "soc_switch": soc,
            "soc_basis": "so3",
            "add_H0": False, "zero_point_shift": False}},
    }
    path.write_text(yaml.safe_dump(cfg))


@pytest.mark.slow


def test_two_stage_predictor(tmp_path):
    import jax

    _write_cfg(tmp_path / "nonsoc.yaml", soc=False)
    _write_cfg(tmp_path / "soc.yaml", soc=True)
    pred = HamiltonianPredictor(str(tmp_path / "nonsoc.yaml"),
                                str(tmp_path / "soc.yaml"), soc_switch=True)

    rng = np.random.default_rng(0)
    c = make_crystal(rng, n_atoms=3, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], bucket_multiple=8)

    from hamgnn_tpu.train.trainer import init_params_on_cpu

    pred.params_nonsoc = init_params_on_cpu(pred.model_nonsoc, graph, 0)
    # SOC graph with doubled targets for init
    big = (2 * 14) ** 2
    c2 = dict(c)
    n, e = len(c["z"]), c["edge_index"].shape[1]
    for k, rows in (("Hon", n), ("iHon", n), ("Hon0", n), ("iHon0", n)):
        c2[k] = np.zeros((rows, big))
    for k, rows in (("Hoff", e), ("iHoff", e), ("Hoff0", e), ("iHoff0", e)):
        c2[k] = np.zeros((rows, big))
    c2["Lon"] = 0.1 * rng.normal(size=(n, 196, 3))
    c2["Loff"] = 0.1 * rng.normal(size=(e, 196, 3))
    graph_soc = pad_and_batch([c2], bucket_multiple=8)
    big2 = (2 * 14) ** 2
    zeros_on = np.zeros((graph_soc.num_nodes, 196), np.float32)
    zeros_off = np.zeros((graph_soc.num_edges, 196), np.float32)
    pred.params_soc = init_params_on_cpu(
        pred.model_soc, graph_soc, 1,
        method=lambda m, g: m.output(g, m.representation(g),
                                     h_nonsoc=(zeros_on, zeros_off)))

    # two-stage inference
    p1 = pred.predict_nonsoc(graph)
    assert p1["hamiltonian_on"].shape == (graph.num_nodes, 196)
    p2 = pred.predict_soc(graph_soc, p1["hamiltonian_on"], p1["hamiltonian_off"])
    assert p2["hamiltonian_real_on"].shape == (graph.num_nodes, big)
    assert np.isfinite(np.asarray(p2["hamiltonian_real_on"])).all()

    # package round trip
    pred.save(str(tmp_path / "pkg"))
    loaded = HamiltonianPredictor.load(str(tmp_path / "pkg"))
    q1 = loaded.predict_nonsoc(graph)
    np.testing.assert_allclose(np.asarray(q1["hamiltonian_on"]),
                               np.asarray(p1["hamiltonian_on"]), atol=1e-6)

    mae = masked_mae(p1["hamiltonian_on"], graph.Hon, p1["mask_on"])
    assert np.isfinite(mae)
