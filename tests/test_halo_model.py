"""Full-model halo-partition equivalence (VERDICT round-1 item 5).

The entire train-step computation — embeddings, all layers, output head with
Hermitian symmetrization / H0 / masks / zero-point shift / sparsity, and the
weighted MAE loss — runs under shard_map on the 8-device CPU mesh and must
reproduce the single-device loss AND parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import Mesh

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.model import HamGNNModel, compute_losses
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.parallel.halo_model import (
    build_halo_inputs,
    make_halo_loss_fn,
    plan_for_graph,
    shard_halo_inputs,
)
from util_fixtures import add_random_hamiltonian_targets, make_crystal

IRREPS_FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+2x3o+2x3e+2x4e"
IRREPS_SH = "0e + 1o + 2e + 3o + 4e"
LOSSES = [{"metric": "mae", "prediction": "hamiltonian",
           "target": "hamiltonian", "loss_weight": 27.211}]


def _build(seed=0, n_crystals=2, use_corr=False):
    rng = np.random.default_rng(seed)
    crystals = []
    for _ in range(n_crystals):
        c = make_crystal(rng, n_atoms=6, species=(6, 14), cell_size=5.0,
                         cutoff=4.0)
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        crystals.append(c)
    graph = pad_and_batch(crystals, node_bucket=16, edge_bucket=256)

    rep = HamGNNConvE3(
        num_types=32, irreps_edge_sh=IRREPS_SH,
        irreps_node_features=IRREPS_FEAT, num_layers=2, num_radial=8,
        rbf_func="bessel", cutoff=4.0, radial_mlp=(16,),
        use_corr_prod=use_corr, correlation=2, num_hidden_features=4)
    out = HamGNNPlusPlusOut(
        irreps_in_node=IRREPS_FEAT, irreps_in_edge=IRREPS_FEAT,
        nao_max=14, ham_type="openmx", ham_only=True, symmetrize=True,
        add_H0=True, zero_point_shift=True)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(seed), graph)
    return model, params, graph


def _single_device_loss(model, params, graph):
    preds = model.apply(params, graph)
    return compute_losses(preds, graph, LOSSES)


@pytest.mark.parametrize("n_shards", [4, 8])
def test_halo_full_model_loss_matches_single_device(n_shards):
    model, params, graph = _build()
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))

    loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
    halo_loss, halo_logs = jax.jit(loss_fn)(params, inputs)
    ref_loss, ref_logs = _single_device_loss(model, params, graph)

    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(halo_logs["mae_hamiltonian"]),
        np.asarray(ref_logs["mae_hamiltonian"]), rtol=2e-5)


def test_halo_full_model_gradients_match_single_device():
    model, params, graph = _build(seed=3)
    n_shards = 8
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))

    loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
    halo_grads = jax.jit(jax.grad(lambda p: loss_fn(p, inputs)[0]))(params)
    ref_grads = jax.jit(jax.grad(
        lambda p: _single_device_loss(model, p, graph)[0]))(params)

    flat_h, _ = jax.tree_util.tree_flatten_with_path(halo_grads)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(ref_grads)
    assert len(flat_h) == len(flat_r)
    for (path_h, gh), (path_r, gr) in zip(flat_h, flat_r):
        assert path_h == path_r
        np.testing.assert_allclose(
            np.asarray(gh), np.asarray(gr), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path_h))


def test_dp_x_halo_train_step_matches_mean_of_losses():
    """2x4 mesh: data axis averages per-crystal halo losses; one optimizer
    step runs end to end with finite outputs."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hamgnn_tpu.parallel.halo_model import (
        make_halo_loss_fn, make_halo_train_step, stack_halo_inputs)
    from hamgnn_tpu.parallel.sharding import init_flat_opt_state

    model, params, _ = _build(seed=7, n_crystals=1)
    rng = np.random.default_rng(11)
    graphs = []
    for _ in range(2):
        c = make_crystal(rng, n_atoms=6, species=(6, 14), cell_size=5.0,
                         cutoff=4.0)
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        graphs.append(pad_and_batch([c], node_bucket=16, edge_bucket=256))

    n_graph = 4
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "graph"))
    inputs = stack_halo_inputs(graphs, n_graph)
    sh = NamedSharding(mesh, P("data", "graph"))
    inputs = {k: jax.device_put(jnp.asarray(v), sh) for k, v in inputs.items()}

    loss_fn = make_halo_loss_fn(model, mesh, LOSSES, data_axis="data")
    dp_loss, _ = jax.jit(loss_fn)(params, inputs)

    refs = [float(_single_device_loss(model, params, g)[0]) for g in graphs]
    np.testing.assert_allclose(float(dp_loss), np.mean(refs), rtol=2e-5)

    tx = optax.amsgrad(learning_rate=1.0)
    opt_state = init_flat_opt_state(tx, params)
    step = make_halo_train_step(model, tx, LOSSES, mesh, data_axis="data")
    params2, opt2, total, logs = step(params, opt_state, inputs,
                                      jnp.asarray(1e-3, jnp.float32))
    assert np.isfinite(float(total))
    l2 = jax.tree_util.tree_leaves(params2)
    assert all(np.isfinite(np.asarray(x)).all() for x in l2)


def test_halo_full_model_with_corr_product():
    model, params, graph = _build(seed=5, use_corr=True)
    n_shards = 4
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))
    loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
    halo_loss, _ = jax.jit(loss_fn)(params, inputs)
    ref_loss, _ = _single_device_loss(model, params, graph)
    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)


def test_halo_full_model_with_overlap_heads():
    """ham_only=False: overlap heads + overlap MAE under the halo partition
    match the single-device step (one off-site all_to_all carries both the
    hamiltonian and overlap boundary rows)."""
    losses = LOSSES + [{"metric": "mae", "prediction": "overlap",
                        "target": "overlap", "loss_weight": 1.0}]
    rng = np.random.default_rng(11)
    crystals = []
    for _ in range(2):
        c = make_crystal(rng, n_atoms=6, species=(6, 14), cell_size=5.0,
                         cutoff=4.0)
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        crystals.append(c)
    graph = pad_and_batch(crystals, node_bucket=16, edge_bucket=256)

    rep = HamGNNConvE3(
        num_types=32, irreps_edge_sh=IRREPS_SH,
        irreps_node_features=IRREPS_FEAT, num_layers=2, num_radial=8,
        rbf_func="bessel", cutoff=4.0, radial_mlp=(16,))
    out = HamGNNPlusPlusOut(
        irreps_in_node=IRREPS_FEAT, irreps_in_edge=IRREPS_FEAT,
        nao_max=14, ham_type="openmx", ham_only=False, symmetrize=True,
        add_H0=True, zero_point_shift=True)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(7), graph)

    n_shards = 8
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))

    loss_fn = make_halo_loss_fn(model, mesh, losses)
    halo_loss, halo_logs = jax.jit(loss_fn)(params, inputs)
    preds = model.apply(params, graph)
    ref_loss, ref_logs = compute_losses(preds, graph, losses)

    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(halo_logs["mae_overlap"]),
        np.asarray(ref_logs["mae_overlap"]), rtol=2e-5)

    halo_grads = jax.jit(jax.grad(lambda p: loss_fn(p, inputs)[0]))(params)
    ref_grads = jax.jit(jax.grad(lambda p: compute_losses(
        model.apply(p, graph), graph, losses)[0]))(params)
    flat_h = jax.tree_util.tree_leaves(halo_grads)
    flat_r = jax.tree_util.tree_leaves(ref_grads)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_halo_charge_doping_matches_single_device():
    """Charge-doped one-hot embedding under the halo partition (doping is
    per-node data carried per edge endpoint, so it stays shard-local)."""
    rng = np.random.default_rng(11)
    crystals = []
    for i in range(2):
        c = make_crystal(rng, n_atoms=6, species=(6, 14), cell_size=5.0,
                         cutoff=4.0)
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        c["doping_charge"] = np.asarray([0.5 - i], np.float32)
        crystals.append(c)
    graph = pad_and_batch(crystals, node_bucket=16, edge_bucket=256)

    rep = HamGNNConvE3(
        num_types=32, irreps_edge_sh=IRREPS_SH,
        irreps_node_features=IRREPS_FEAT, num_layers=2, num_radial=8,
        rbf_func="bessel", cutoff=4.0, radial_mlp=(16,),
        apply_charge_doping=True, num_charge_attr_feas=4)
    out = HamGNNPlusPlusOut(
        irreps_in_node=IRREPS_FEAT, irreps_in_edge=IRREPS_FEAT,
        nao_max=14, ham_type="openmx", ham_only=True, symmetrize=True,
        add_H0=True, zero_point_shift=True)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(11), graph)

    n_shards = 4
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))
    loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
    halo_loss, _ = jax.jit(loss_fn)(params, inputs)
    ref_loss, _ = _single_device_loss(model, params, graph)
    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)


def test_halo_trainer_product_path_epoch():
    """The config-driven HaloTrainer (the CLI's setup.parallel path) runs a
    train epoch + eval epoch on a dp x halo mesh, reduces the loss over a few
    epochs, and its eval loss matches the single-device Trainer's on the same
    parameters."""
    from hamgnn_tpu.data.dataset import GraphDataModule
    from hamgnn_tpu.parallel.halo_trainer import HaloDataAdapter, HaloTrainer
    from hamgnn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(5)
    crystals = []
    for _ in range(8):
        c = make_crystal(rng, n_atoms=5, species=(6, 14), cell_size=5.0,
                         cutoff=4.0)
        crystals.append(add_random_hamiltonian_targets(rng, c, nao_max=14))

    rep = HamGNNConvE3(
        num_types=32, irreps_edge_sh=IRREPS_SH,
        irreps_node_features=IRREPS_FEAT, num_layers=1, num_radial=8,
        rbf_func="bessel", cutoff=4.0, radial_mlp=(16,))
    out = HamGNNPlusPlusOut(
        irreps_in_node=IRREPS_FEAT, irreps_in_edge=IRREPS_FEAT,
        nao_max=14, ham_type="openmx", ham_only=True, symmetrize=True,
        add_H0=True, zero_point_shift=False)
    model = HamGNNModel(representation=rep, output=out)

    import tempfile

    tmp = tempfile.mkdtemp()
    dm = GraphDataModule(crystals, batch_size=1, train_ratio=0.5,
                         val_ratio=0.25, test_ratio=0.25)
    adapter = HaloDataAdapter(dm, n_data=2, n_graph=4)
    trainer = HaloTrainer(model, losses=LOSSES, metrics=LOSSES, lr=0.01,
                          n_data=2, n_graph=4, train_dir=tmp)
    trainer.init_params(adapter.example_graph())

    losses = [trainer.train_epoch(adapter.train_batches(
        np.random.default_rng(e))) for e in range(3)]
    last_val, _ = trainer.eval_epoch(adapter.val_batches())
    assert np.isfinite(losses).all() and np.isfinite(last_val)
    assert losses[-1] < losses[0]

    # halo eval == single-device eval with the trained params
    single = Trainer(model, losses=LOSSES, metrics=LOSSES, train_dir=tmp)
    single.params = jax.device_put(
        jax.tree.map(np.asarray, jax.device_get(trainer.params)),
        jax.devices()[0])
    sv_loss, _ = single.eval_epoch(dm.val_batches())
    np.testing.assert_allclose(last_val, float(sv_loss), rtol=2e-4)


def test_cli_halo_soc_dryrun(tmp_path):
    """Product CLI with soc_switch: true under setup.parallel.mode=halo on
    the CPU mesh — the dryrun_multichip-style proof that the SOC head trains
    under the edge partition (VERDICT r3 item 4)."""
    import json
    import os

    from hamgnn_tpu.cli import train_and_evaluate
    from hamgnn_tpu.data.dataset import save_graph_npz
    from hamgnn_tpu.train.config import load_config
    from util_fixtures import make_crystal, add_random_hamiltonian_targets

    rng = np.random.default_rng(3)
    crystals = []
    for _ in range(4):
        c = make_crystal(rng, n_atoms=3, species=(1, 6), cell_size=5.0,
                         cutoff=4.0)
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        n, e = len(c["z"]), c["edge_index"].shape[1]
        big = (2 * 14) ** 2
        # SOC-shaped targets: (rows, (2nao)^2) real + imag
        c["Hon"] = np.tile(c["Hon"].reshape(n, 14, 14), (1, 2, 2)).reshape(n, big)
        c["Hoff"] = np.tile(c["Hoff"].reshape(e, 14, 14), (1, 2, 2)).reshape(e, big)
        c["iHon"] = 0.01 * rng.normal(size=(n, big))
        c["iHoff"] = 0.01 * rng.normal(size=(e, big))
        crystals.append(c)
    data_dir = str(tmp_path)
    save_graph_npz(os.path.join(data_dir, "graph_data.npz"), crystals)

    cfg = load_config(None, overrides={
        "setup": {
            "stage": "fit",
            "parallel": {"mode": "halo", "n_data": 1, "n_graph": 2,
                         "edge_quantum": 64},
        },
        "dataset_params": {
            "graph_data_path": data_dir, "batch_size": 1,
            "train_ratio": 0.5, "val_ratio": 0.25, "test_ratio": 0.25,
        },
        "losses_metrics": {
            "losses": [
                {"metric": "mae", "prediction": "hamiltonian_real",
                 "target": "hamiltonian_real", "loss_weight": 27.211},
                {"metric": "mae", "prediction": "hamiltonian_imag",
                 "target": "hamiltonian_imag", "loss_weight": 27.211},
            ],
            "metrics": [
                {"metric": "mae", "prediction": "hamiltonian_real",
                 "target": "hamiltonian_real"},
            ],
        },
        "optim_params": {"min_epochs": 0, "max_epochs": 1, "stop_patience": 1},
        "profiler_params": {"train_dir": os.path.join(data_dir, "out")},
        "representation_nets": {"HamGNN_pre": {
            "irreps_node_features": "8x0e+4x0o+4x1o+2x1e+2x2e+1x2o",
            "irreps_edge_sh": "0e + 1o + 2e",
            "num_layers": 1, "num_radial": 8, "cutoff": 4.0,
            "radial_MLP": [16], "num_types": 20,
        }},
        "output_nets": {"HamGNN_out": {
            "nao_max": 14, "soc_switch": True, "soc_basis": "su2",
            "add_H0": False, "zero_point_shift": False,
        }},
    })
    train_and_evaluate(cfg)
    with open(os.path.join(data_dir, "out", "metrics.jsonl")) as f:
        rec = json.loads(f.readlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"]), rec


def test_cli_halo_band_dryrun(tmp_path):
    """Product CLI with calculate_band_energy: true under halo: band-energy
    secondary loss trains under the edge partition through the trainer
    (band-mode n_data=1 coercion, per-batch band graph + k_vecs plumbing)."""
    import json
    import os

    from hamgnn_tpu.cli import train_and_evaluate
    from hamgnn_tpu.data.dataset import save_graph_npz
    from hamgnn_tpu.train.config import load_config
    from util_fixtures import make_crystal, add_random_hamiltonian_targets

    rng = np.random.default_rng(5)
    crystals = []
    for _ in range(4):
        c = make_crystal(rng, n_atoms=3, species=(1, 6), cell_size=5.0,
                         cutoff=4.0)
        crystals.append(add_random_hamiltonian_targets(rng, c, nao_max=14))
    data_dir = str(tmp_path)
    save_graph_npz(os.path.join(data_dir, "graph_data.npz"), crystals)

    cfg = load_config(None, overrides={
        "setup": {
            "stage": "fit",
            "parallel": {"mode": "halo", "n_data": 2, "n_graph": 2,
                         "edge_quantum": 64},
        },
        "dataset_params": {
            "graph_data_path": data_dir, "batch_size": 1,
            "train_ratio": 0.5, "val_ratio": 0.25, "test_ratio": 0.25,
        },
        "losses_metrics": {
            "losses": [
                {"metric": "mae", "prediction": "hamiltonian",
                 "target": "hamiltonian", "loss_weight": 27.211},
                {"metric": "mae", "prediction": "band_energy",
                 "target": "band_energy", "loss_weight": 0.01},
            ],
            "metrics": [
                {"metric": "mae", "prediction": "hamiltonian",
                 "target": "hamiltonian"},
            ],
        },
        "optim_params": {"min_epochs": 0, "max_epochs": 1, "stop_patience": 1},
        "profiler_params": {"train_dir": os.path.join(data_dir, "out")},
        "representation_nets": {"HamGNN_pre": {
            "irreps_node_features": "8x0e+4x0o+4x1o+2x1e+2x2e+1x2o",
            "irreps_edge_sh": "0e + 1o + 2e",
            "num_layers": 1, "num_radial": 8, "cutoff": 4.0,
            "radial_MLP": [16], "num_types": 20,
        }},
        "output_nets": {"HamGNN_out": {
            "nao_max": 14, "add_H0": False, "zero_point_shift": False,
            "calculate_band_energy": True, "num_k": 2, "band_num_control": 2,
        }},
    })
    train_and_evaluate(cfg)
    with open(os.path.join(data_dir, "out", "metrics.jsonl")) as f:
        rec = json.loads(f.readlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"]), rec
