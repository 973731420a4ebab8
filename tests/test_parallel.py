"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

SURVEY.md 4(d): edge-partitioned forward must equal the single-device forward;
the DP x edge-partition train step must run and produce finite grads.
"""

import jax
import numpy as np
import pytest

from hamgnn_tpu.cli import build_model
from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.parallel.sharding import (
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_to_mesh,
    shard_stacked_graph,
    stack_graphs,
)
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu

from util_fixtures import add_random_hamiltonian_targets, make_crystal

LOSSES = [{"metric": "mae", "prediction": "hamiltonian",
           "target": "hamiltonian", "loss_weight": 1.0}]


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(None, overrides={
        "representation_nets": {"HamGNN_pre": {
            "irreps_node_features": "8x0e+8x0o+6x1o+4x1e+4x2e",
            "irreps_edge_sh": "0e + 1o + 2e",
            "num_layers": 1, "num_radial": 8, "cutoff": 4.0,
            "radial_MLP": [16, 16], "num_types": 20}},
        "output_nets": {"HamGNN_out": {"nao_max": 14, "zero_point_shift": False}},
    })
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    graphs = [
        pad_and_batch([add_random_hamiltonian_targets(
            rng, make_crystal(rng, n_atoms=3, species=(1, 6)))],
            node_bucket=8, edge_bucket=256)
        for _ in range(2)
    ]
    params = init_params_on_cpu(model, graphs[0], 0)
    return model, graphs, params


class TestSharding:
    def test_edge_partition_matches_single_device(self, setup):
        model, graphs, params = setup
        assert len(jax.devices()) >= 8

        # single-device reference
        ref = jax.jit(model.apply)(params, graphs[0])

        mesh = make_mesh(1, 8)
        stacked = stack_graphs(graphs[:1])
        sharded = shard_stacked_graph(mesh, stacked)

        out = jax.jit(jax.vmap(lambda g: model.apply(params, g)))(sharded)
        np.testing.assert_allclose(
            np.asarray(out["hamiltonian_on"])[0],
            np.asarray(ref["hamiltonian_on"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["hamiltonian_off"])[0],
            np.asarray(ref["hamiltonian_off"]), atol=2e-5)

    @pytest.mark.slow

    def test_dp_times_edge_partition_train_step(self, setup):
        import optax

        model, graphs, params = setup
        mesh = make_mesh(2, 4)
        stacked = shard_stacked_graph(mesh, stack_graphs(graphs))
        from hamgnn_tpu.parallel.sharding import init_flat_opt_state

        tx = optax.amsgrad(learning_rate=1.0)
        params = replicate_to_mesh(mesh, params)
        opt_state = init_flat_opt_state(tx, params)
        step = make_parallel_train_step(model, tx, LOSSES, mesh, stacked)
        import jax.numpy as jnp

        p2, o2, total, logs = step(params, opt_state, stacked,
                                   jnp.asarray(1e-3, jnp.float32))
        assert np.isfinite(float(total))
        # params actually moved
        delta = max(float(jnp.abs(a - b).max())
                    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
        assert delta > 0

    @pytest.mark.slow

    def test_dp_loss_equals_mean_of_per_graph_losses(self, setup):
        model, graphs, params = setup
        mesh = make_mesh(2, 4)
        stacked = shard_stacked_graph(mesh, stack_graphs(graphs))
        ev = make_parallel_eval_step(model, LOSSES, mesh, stacked)
        total, _ = ev(replicate_to_mesh(mesh, params), stacked)

        singles = []
        for g in graphs:
            preds = jax.jit(model.apply)(params, g)
            t, _ = compute_losses(preds, g, LOSSES)
            singles.append(float(t))
        np.testing.assert_allclose(float(total), np.mean(singles), atol=1e-5)


class TestHaloPartition:
    """Halo-exchange edge partition (parallel/halo.py): explicit shard_map
    all-to-all of boundary node rows must reproduce the single-device layer."""

    S = 4

    @pytest.fixture(scope="class")
    def case(self):
        import jax.numpy as jnp

        from hamgnn_tpu.nn.blocks import ConvBlockE3, PairInteractionBlock

        rng = np.random.default_rng(7)
        c = make_crystal(rng, n_atoms=24, species=(1, 6), cell_size=7.0,
                         cutoff=3.5)
        g = pad_and_batch([c], node_bucket=32, edge_bucket=320)
        irreps = "8x0e+4x0o+4x1o+2x1e+2x2e"
        sh = "0e + 1o + 2e"
        n_rad = 8
        N, E = g.num_nodes, g.num_edges
        d_feat = 8 + 4 + 12 + 6 + 10
        node_feats = jnp.asarray(rng.normal(size=(N, d_feat)), jnp.float32)
        edge_feats = jnp.asarray(rng.normal(size=(E, d_feat)), jnp.float32)
        edge_sh = jnp.asarray(rng.normal(size=(E, 9)), jnp.float32)
        edge_scalars = jnp.asarray(rng.normal(size=(E, n_rad)), jnp.float32)

        conv = ConvBlockE3(irreps_in=irreps, irreps_out=irreps,
                           irreps_edge_attrs=sh, num_edge_scalars=n_rad,
                           radial_mlp=(16, 16))
        pair = PairInteractionBlock(
            irreps_node_feats=irreps, irreps_edge_feats=irreps,
            irreps_edge_attrs=sh, num_edge_scalars=n_rad, radial_mlp=(16, 16))
        key = jax.random.PRNGKey(0)
        cparams = conv.init(key, node_feats, edge_feats, edge_sh, edge_scalars,
                            g.edge_index, g.edge_mask)
        pparams = pair.init(key, node_feats, edge_feats, edge_sh, edge_scalars,
                            g.edge_index)
        return (g, conv, pair, cparams, pparams, node_feats, edge_feats,
                edge_sh, edge_scalars)

    def _halo_setup(self, g, mesh, node_feats, edge_feats, edge_sh,
                    edge_scalars):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hamgnn_tpu.parallel.halo import (
            gather_edge_arrays, make_plan, shard_plan_arrays)

        plan = make_plan(np.asarray(g.edge_index), np.asarray(g.edge_mask),
                         g.num_nodes, self.S)
        parr = shard_plan_arrays(mesh, plan)
        ef, sh_a, sc = gather_edge_arrays(
            plan, edge_feats, edge_sh, edge_scalars)
        shard = NamedSharding(mesh, P("graph"))
        put = lambda x: jax.device_put(np.asarray(x), shard)
        return plan, parr, put(node_feats), put(ef), put(sh_a), put(sc)

    def test_halo_conv_matches_single_device(self, case):
        from jax.sharding import Mesh

        from hamgnn_tpu.parallel.halo import make_halo_conv_forward

        (g, conv, _pair, cparams, _pp, node_feats, edge_feats, edge_sh,
         edge_scalars) = case
        ref = jax.jit(conv.apply)(cparams, node_feats, edge_feats, edge_sh,
                                  edge_scalars, g.edge_index, g.edge_mask)

        mesh = Mesh(np.array(jax.devices()[: self.S]), ("graph",))
        plan, parr, nf, ef, sh_a, sc = self._halo_setup(
            g, mesh, node_feats, edge_feats, edge_sh, edge_scalars)
        fwd = make_halo_conv_forward(conv, mesh)
        out_nodes, _ = fwd(cparams, {}, nf, ef, sh_a, sc, parr["src_pos"],
                           parr["dst_local"], parr["edge_mask"],
                           parr["send_idx"])
        np.testing.assert_allclose(np.asarray(out_nodes), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_halo_conv_pair_matches_single_device(self, case):
        from jax.sharding import Mesh

        from hamgnn_tpu.parallel.halo import (
            make_halo_conv_forward, scatter_back_edges)

        (g, conv, pair, cparams, pparams, node_feats, edge_feats, edge_sh,
         edge_scalars) = case
        nodes_ref = jax.jit(conv.apply)(cparams, node_feats, edge_feats,
                                        edge_sh, edge_scalars, g.edge_index,
                                        g.edge_mask)
        edges_ref = jax.jit(pair.apply)(pparams, nodes_ref, edge_feats,
                                        edge_sh, edge_scalars, g.edge_index)

        mesh = Mesh(np.array(jax.devices()[: self.S]), ("graph",))
        plan, parr, nf, ef, sh_a, sc = self._halo_setup(
            g, mesh, node_feats, edge_feats, edge_sh, edge_scalars)
        fwd = make_halo_conv_forward(conv, mesh, pair_module=pair)
        out_nodes, out_edges = fwd(cparams, pparams, nf, ef, sh_a, sc,
                                   parr["src_pos"], parr["dst_local"],
                                   parr["edge_mask"], parr["send_idx"])
        np.testing.assert_allclose(np.asarray(out_nodes),
                                   np.asarray(nodes_ref), rtol=2e-5, atol=2e-5)
        back = scatter_back_edges(plan, np.asarray(out_edges), g.num_edges)
        mask = np.asarray(g.edge_mask)
        np.testing.assert_allclose(np.asarray(back)[mask],
                                   np.asarray(edges_ref)[mask],
                                   rtol=2e-5, atol=2e-5)

    def test_halo_conv_gradients_match(self, case):
        from jax.sharding import Mesh

        from hamgnn_tpu.parallel.halo import make_halo_conv_forward

        (g, conv, _pair, cparams, _pp, node_feats, edge_feats, edge_sh,
         edge_scalars) = case

        def loss_ref(p):
            out = conv.apply(p, node_feats, edge_feats, edge_sh, edge_scalars,
                             g.edge_index, g.edge_mask)
            return (out ** 2).sum()

        gref = jax.jit(jax.grad(loss_ref))(cparams)

        mesh = Mesh(np.array(jax.devices()[: self.S]), ("graph",))
        plan, parr, nf, ef, sh_a, sc = self._halo_setup(
            g, mesh, node_feats, edge_feats, edge_sh, edge_scalars)
        fwd = make_halo_conv_forward(conv, mesh)

        def loss_halo(p):
            out, _ = fwd(p, {}, nf, ef, sh_a, sc, parr["src_pos"],
                         parr["dst_local"], parr["edge_mask"],
                         parr["send_idx"])
            return (out ** 2).sum()

        ghalo = jax.jit(jax.grad(loss_halo))(cparams)
        for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(ghalo)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=5e-4)


class TestParallelTrainer:
    @pytest.mark.slow
    def test_training_reduces_loss(self):
        from hamgnn_tpu.parallel.trainer import ParallelTrainer

        cfg = load_config(None, overrides={
            "representation_nets": {"HamGNN_pre": {
                "irreps_node_features": "8x0e+8x0o+6x1o+4x1e+4x2e",
                "irreps_edge_sh": "0e + 1o + 2e",
                "num_layers": 1, "num_radial": 8, "cutoff": 4.0,
                "radial_MLP": [16, 16], "num_types": 20}},
            "output_nets": {"HamGNN_out": {"nao_max": 14,
                                           "zero_point_shift": False}},
        })
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        crystals = []
        for _ in range(4):
            c = add_random_hamiltonian_targets(
                rng, make_crystal(rng, n_atoms=3, species=(1, 6)))
            c["Hon0"] = c["Hon"].copy()
            c["Hoff0"] = c["Hoff"].copy()
            crystals.append(c)

        trainer = ParallelTrainer(
            model, losses=LOSSES, metrics=[], lr=0.02,
            n_data=2, n_graph=4, node_quantum=8, edge_quantum=128,
            train_dir="/tmp/ptr")
        example = pad_and_batch([crystals[0]], node_bucket=8, edge_bucket=128)
        trainer.init_params(example)
        first = trainer.eval_epoch_crystals(crystals)
        for _ in range(15):
            trainer.train_epoch_crystals(crystals, np.random.default_rng(1))
        last = trainer.eval_epoch_crystals(crystals)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < 0.7 * first, (first, last)


_TWO_PROC_SCRIPT = r"""
import json, os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
import jax
# force CPU exactly like conftest (env JAX_PLATFORMS is overridden by the
# sandbox's axon site hook) + cross-process CPU collectives impl
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from hamgnn_tpu.parallel.multihost import (
    allgather_metrics, is_primary, maybe_initialize_distributed,
    process_count)
ok = maybe_initialize_distributed(coordinator=f"localhost:{port}",
                                  num_processes=2, process_id=pid)
g = allgather_metrics({"v": np.float32(pid + 1.5),
                       "a": np.full((2,), pid, np.float32)})
json.dump({"ok": bool(ok), "count": process_count(),
           "primary": bool(is_primary()),
           "v": np.asarray(g["v"]).tolist(),
           "a": np.asarray(g["a"]).tolist()}, open(out, "w"))
"""


def test_multihost_two_process_cpu(tmp_path):
    """Real 2-process jax.distributed bring-up on the CPU backend: both
    processes see process_count()==2, only rank 0 is primary, and
    allgather_metrics returns both ranks' values on each process
    (reference semantics: Model.py:113-126 all_gather_object)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_TWO_PROC_SCRIPT)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port),
             str(tmp_path / f"out{i}.json")],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        outs.append(stdout.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    import json

    r0 = json.load(open(tmp_path / "out0.json"))
    r1 = json.load(open(tmp_path / "out1.json"))
    for r in (r0, r1):
        assert r["ok"] and r["count"] == 2
        assert r["v"] == [1.5, 2.5]
        assert r["a"] == [[0.0, 0.0], [1.0, 1.0]]
    assert r0["primary"] and not r1["primary"]


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host layer (multi-process needs
    real multi-host hardware; sharding equivalence is covered above)."""
    import numpy as np

    from hamgnn_tpu.parallel.multihost import (
        allgather_metrics, is_primary, maybe_initialize_distributed,
        process_count)

    assert maybe_initialize_distributed() is False  # no env configured
    assert is_primary()
    assert process_count() == 1
    out = allgather_metrics({"loss": np.float32(1.5),
                             "mae": np.ones((3,), np.float32)})
    assert out["loss"].shape == (1,)
    assert out["mae"].shape == (1, 3)


_TWO_PROC_HALO_SCRIPT = """
import json, os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
repo_root = sys.argv[4]
sys.path.insert(0, repo_root)
sys.path.insert(0, os.path.join(repo_root, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from hamgnn_tpu.parallel.multihost import maybe_initialize_distributed
ok = maybe_initialize_distributed(coordinator=f"localhost:{port}",
                                  num_processes=2, process_id=pid)
assert ok and jax.device_count() == 4, (ok, jax.device_count())

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from util_fixtures import add_random_hamiltonian_targets, make_crystal
from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.model import HamGNNModel, compute_losses
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.parallel.halo_model import (
    build_halo_inputs, make_halo_loss_fn, plan_for_graph)

FEAT = "8x0e+4x1o+2x2e"
SH = "0e + 1o + 2e"
rng = np.random.default_rng(0)
c = make_crystal(rng, n_atoms=6, species=(6, 14), cell_size=5.0, cutoff=4.0)
c = add_random_hamiltonian_targets(rng, c, nao_max=14)
graph = pad_and_batch([c], node_bucket=8, edge_bucket=128)
rep = HamGNNConvE3(num_types=32, irreps_edge_sh=SH,
                   irreps_node_features=FEAT, num_layers=1, num_radial=8,
                   rbf_func="bessel", cutoff=4.0, radial_mlp=(8,))
outm = HamGNNPlusPlusOut(irreps_in_node=FEAT, irreps_in_edge=FEAT,
                         nao_max=14, ham_type="openmx", ham_only=True,
                         symmetrize=True, add_H0=True, zero_point_shift=True)
model = HamGNNModel(representation=rep, output=outm)
params = model.init(jax.random.PRNGKey(0), graph)

n_shards = 4
devices = np.array(jax.devices())       # 4 global devices over 2 processes
mesh = Mesh(devices, ("graph",))
plan = plan_for_graph(graph, n_shards)
inputs = build_halo_inputs(graph, plan)
sh = NamedSharding(mesh, P("graph"))
inputs = {k: jax.device_put(np.asarray(v), sh) for k, v in inputs.items()}
params_g = jax.device_put(params, NamedSharding(mesh, P()))

LOSSES = [{"metric": "mae", "prediction": "hamiltonian",
           "target": "hamiltonian", "loss_weight": 27.211}]
loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
halo_loss, logs = jax.jit(loss_fn)(params_g, inputs)
halo_loss = float(np.asarray(jax.device_get(halo_loss)))

# single-process reference on the local default device
ref_loss, _ = compute_losses(model.apply(params, graph), graph, LOSSES)
ref_loss = float(ref_loss)
json.dump({"halo": halo_loss, "ref": ref_loss}, open(out, "w"))
"""


@pytest.mark.slow
def test_halo_train_step_across_two_processes(tmp_path):
    """The halo shard_map loss crosses a REAL process boundary: 2 processes x
    2 local CPU devices form the 4-way 'graph' mesh (gloo collectives); the
    all_to_all halo exchanges span processes and the loss equals the
    single-device loss on both ranks."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "halo_worker.py"
    script.write_text(_TWO_PROC_HALO_SCRIPT)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port),
             str(tmp_path / f"halo{i}.json"), repo_root],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1500)
        outs.append(stdout.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    for i in range(2):
        r = json.load(open(tmp_path / f"halo{i}.json"))
        np.testing.assert_allclose(r["halo"], r["ref"], rtol=2e-5)
