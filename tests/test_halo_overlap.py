"""Comm/compute overlap acceptance (SURVEY §5 north star; VERDICT r4 item 3).

Structural check on the traced program: under the halo partition, the
per-layer source-row ``all_to_all`` must feed ONLY the small boundary-edge
contraction — never a tensor-product ``dot_general`` over the full local edge
bucket.  That is the data-dependence property that lets XLA's latency-hiding
scheduler run the interior contraction while the exchange is in flight
(wall-clock win needs real multi-chip hardware; the dependence structure is
verifiable anywhere).
"""

import jax
import numpy as np
from jax.sharding import Mesh

from hamgnn_tpu.models.model import HamGNNModel
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.parallel.halo_model import (
    build_halo_inputs,
    make_halo_loss_fn,
    plan_for_graph,
    shard_halo_inputs,
)
from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "4x0e+2x0o+2x1o+1x1e+1x2e"
SH = "0e + 1o + 2e"
N_SHARDS = 2


def _collect_eqns(jaxpr, out):
    out.extend(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):          # ClosedJaxpr
                _collect_eqns(v.jaxpr, out)
            elif hasattr(v, "eqns"):         # Jaxpr
                _collect_eqns(v, out)
            elif isinstance(v, (list, tuple)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        _collect_eqns(w.jaxpr, out)
                    elif hasattr(w, "eqns"):
                        _collect_eqns(w, out)


def test_all_to_all_feeds_only_boundary_contractions():
    rng = np.random.default_rng(0)
    c = make_crystal(rng, n_atoms=4, species=(6, 14), cell_size=5.0,
                     cutoff=4.0)
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    from hamgnn_tpu.data.graph import pad_and_batch

    graph = pad_and_batch([c], node_bucket=8, edge_bucket=128)
    plan = plan_for_graph(graph, N_SHARDS)
    e_loc = plan.edge_id.shape[1]
    e_b = plan.boundary_bucket
    assert e_b < e_loc, "fixture must have a nontrivial interior/boundary split"

    mesh = Mesh(np.array(jax.devices()[:N_SHARDS]), ("graph",))
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))
    rep = HamGNNConvE3(num_types=20, irreps_edge_sh=SH,
                       irreps_node_features=FEAT, num_layers=2, num_radial=6,
                       rbf_func="bessel", cutoff=4.0, radial_mlp=(8,))
    out = HamGNNPlusPlusOut(irreps_in_node=FEAT, irreps_in_edge=FEAT,
                            nao_max=14, ham_type="openmx", ham_only=True,
                            zero_point_shift=False)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(0), graph)
    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 1.0}]
    loss_fn = make_halo_loss_fn(model, mesh, losses)

    jaxpr = jax.make_jaxpr(lambda p: loss_fn(p, inputs))(params)
    eqns = []
    _collect_eqns(jaxpr.jaxpr, eqns)

    a2a_eqns = [e for e in eqns if "all_to_all" in str(e.primitive)]
    assert a2a_eqns, "halo forward must contain all_to_all exchanges"

    # transitive consumers of every node-feature all_to_all output: the first
    # dot_general reached on any path must operate on boundary-bucket rows
    # (leading dim E_b or S*H table gathers), never on the full E_loc bucket.
    #
    # NOTE: the inverse-edge all_to_all (Hermitian symmetrization) feeds adds
    # only; it has no dot consumers and passes trivially.
    def var_key(v):
        return id(v)

    consumers = {}
    for e in eqns:
        for v in e.invars:
            if hasattr(v, "aval"):
                consumers.setdefault(var_key(v), []).append(e)

    bad = []
    for a2a in a2a_eqns:
        frontier = [var_key(v) for v in a2a.outvars]
        seen_eqn = set()
        while frontier:
            vk = frontier.pop()
            for e in consumers.get(vk, []):
                if id(e) in seen_eqn:
                    continue
                seen_eqn.add(id(e))
                if str(e.primitive) == "dot_general":
                    shapes = (tuple(e.invars[0].aval.shape)
                              + tuple(e.invars[1].aval.shape))
                    if e_loc in shapes:
                        bad.append((tuple(e.invars[0].aval.shape),
                                    tuple(e.invars[1].aval.shape)))
                    continue  # stop at the first contraction on this path
                for v in e.outvars:
                    frontier.append(var_key(v))
    assert not bad, (
        f"all_to_all output reaches a full-edge-bucket (E_loc={e_loc}) "
        f"contraction: {bad[:4]} — the exchange is back on the critical "
        f"path of the interior compute")
