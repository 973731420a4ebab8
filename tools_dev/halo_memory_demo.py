"""Large-crystal halo memory-scaling demo (BASELINE config #4 / SURVEY §5).

Compiles the FULL-model halo loss for a 1,024-atom single crystal on the
8-device virtual CPU mesh and compares XLA's per-device temp (activation)
memory against the single-device compile of the same loss: the edge
partition should cut per-shard activation memory by ~1/N (up to the halo
surface terms).

Run: python tools_dev/halo_memory_demo.py  (CPU, ~5-10 min of XLA compiles)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from util_fixtures import add_random_hamiltonian_targets, make_crystal

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

FEAT = "16x0e+8x0o+8x1o+4x1e+4x2e+2x2o"
SH = "0e + 1o + 2e"
LOSSES = [{"metric": "mae", "prediction": "hamiltonian",
           "target": "hamiltonian", "loss_weight": 27.211}]


def main(n_atoms=1024):
    rng = np.random.default_rng(0)
    c = make_crystal(rng, n_atoms=n_atoms, species=(6, 14), cell_size=29.0,
                     cutoff=6.0)
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], node_bucket=n_atoms,
                          edge_bucket=(c["edge_index"].shape[1] + 511)
                          // 512 * 512)
    print(f"{n_atoms} atoms, {c['edge_index'].shape[1]} edges")

    rep = HamGNNConvE3(num_types=32, irreps_edge_sh=SH,
                       irreps_node_features=FEAT, num_layers=2, num_radial=16,
                       rbf_func="bessel", cutoff=6.0, radial_mlp=(32,))
    out = HamGNNPlusPlusOut(irreps_in_node=FEAT, irreps_in_edge=FEAT,
                            nao_max=14, ham_type="openmx", ham_only=True,
                            symmetrize=True, add_H0=True,
                            zero_point_shift=True)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(0), graph)

    def single_loss(p, g):
        total, _ = compute_losses(model.apply(p, g), g, LOSSES)
        return total

    single = jax.jit(single_loss).lower(params, graph).compile()
    m1 = single.memory_analysis()
    t1 = m1.temp_size_in_bytes
    print(f"single-device temp memory: {t1 / 1e6:.1f} MB")

    n_shards = 8
    mesh = Mesh(np.array(jax.devices()), ("graph",))
    plan = plan_for_graph(graph, n_shards)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))
    loss_fn = make_halo_loss_fn(model, mesh, LOSSES)
    halo = jax.jit(loss_fn).lower(params, inputs).compile()
    m8 = halo.memory_analysis()
    t8_total = m8.temp_size_in_bytes
    # NOTE: XLA may also schedule the two programs differently (fusion/
    # rematerialization choices), so this is an upper-level comparison of
    # what each program actually allocates, not a pure 1/N law; the halo
    # program's per-edge tensors are nonetheless sharded 8 ways.
    print(f"halo temp memory, all 8 shards: {t8_total / 1e6:.1f} MB "
          f"(~{t8_total / n_shards / 1e6:.1f} MB/shard; single-device "
          f"ratio {t8_total / n_shards / t1:.3f}, 1/N = {1 / n_shards:.3f})")
    t8 = t8_total / n_shards
    # loss parity while we're here
    l1 = float(jax.jit(single_loss)(params, graph))
    l8 = float(np.asarray(jax.jit(loss_fn)(params, inputs)[0]))
    print(f"loss single={l1:.6f} halo={l8:.6f}")
    assert abs(l1 - l8) / abs(l1) < 2e-4
    assert t8 / t1 < 0.5, "per-shard activation memory must drop with N"
    print("halo memory scaling demo OK")


if __name__ == "__main__":
    main()
