"""Fast halo equivalence tests that run in the DEFAULT suite (no --runslow).

A deliberately tiny config (1 layer, minimal irreps, 2 shards) keeps compile
under a minute on the CPU backend while still exercising the full unified
forward_view path: embeddings, conv/pair layers with halo gathers, the output
head with the inverse-edge all_to_all, psum reductions, and the loss — plus
the SOC head and the band-energy loss under the partition (the feature matrix
the hand-duplicated halo forward could not support; VERDICT r3 items 4/8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.model import HamGNNModel, compute_losses
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.soc import HamGNNSOCOut
from hamgnn_tpu.parallel.halo_model import (
    build_halo_inputs,
    edge_unperm_for_plan,
    make_halo_loss_fn,
    plan_for_graph,
    shard_halo_inputs,
)
from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "4x0e+2x0o+2x1o+1x1e+1x2e"
SH = "0e + 1o + 2e"
N_SHARDS = 2


def _tiny_rep():
    return HamGNNConvE3(
        num_types=20, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=1, num_radial=6, rbf_func="bessel", cutoff=4.0,
        radial_mlp=(8,))


def _tiny_graph(rng, soc=False):
    c = make_crystal(rng, n_atoms=4, species=(6, 14), cell_size=5.0,
                     cutoff=4.0)
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    if soc:
        n, e = len(c["z"]), c["edge_index"].shape[1]
        big = (2 * 14) ** 2
        c["iHon"] = 0.01 * rng.normal(size=(n, big))
        c["iHoff"] = 0.01 * rng.normal(size=(e, big))
        # SOC targets: (rows, (2nao)^2) real parts
        c["Hon"] = np.tile(c["Hon"].reshape(n, 14, 14), (1, 2, 2)).reshape(n, big)
        c["Hoff"] = np.tile(c["Hoff"].reshape(e, 14, 14), (1, 2, 2)).reshape(e, big)
    return pad_and_batch([c], node_bucket=8, edge_bucket=128)


def _mesh():
    return Mesh(np.array(jax.devices()[:N_SHARDS]), ("graph",))


def _halo_inputs(mesh, graph):
    plan = plan_for_graph(graph, N_SHARDS)
    return shard_halo_inputs(mesh, build_halo_inputs(graph, plan)), plan


def test_fast_halo_loss_and_grads_match():
    """Default-suite halo forward+grad equivalence (VERDICT r3 item 8)."""
    rng = np.random.default_rng(0)
    graph = _tiny_graph(rng)
    rep = _tiny_rep()
    out = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", ham_only=True, symmetrize=True, add_H0=True,
        zero_point_shift=True)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(0), graph)
    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    mesh = _mesh()
    inputs, _ = _halo_inputs(mesh, graph)
    loss_fn = make_halo_loss_fn(model, mesh, losses)

    halo_loss = jax.jit(lambda p: loss_fn(p, inputs)[0])
    ref_loss = jax.jit(lambda p: compute_losses(
        model.apply(p, graph), graph, losses)[0])
    np.testing.assert_allclose(np.asarray(halo_loss(params)),
                               np.asarray(ref_loss(params)), rtol=2e-5)

    gh = jax.jit(jax.grad(lambda p: halo_loss(p)))(params)
    gr = jax.jit(jax.grad(lambda p: ref_loss(p)))(params)
    flat_h = jax.tree_util.tree_leaves(gh)
    flat_r = jax.tree_util.tree_leaves(gr)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_halo_soc_head_matches_single_device():
    """SOC (su2) head under the edge partition == single-device
    (VERDICT r3 item 4: the halo feature matrix now covers SOC)."""
    rng = np.random.default_rng(1)
    graph = _tiny_graph(rng, soc=True)
    rep = _tiny_rep()
    out = HamGNNSOCOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", soc_basis="su2", add_H0=False, symmetrize=True,
        zero_point_shift=False)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(1), graph)
    losses = [
        {"metric": "mae", "prediction": "hamiltonian_real",
         "target": "hamiltonian_real", "loss_weight": 27.211},
        {"metric": "mae", "prediction": "hamiltonian_imag",
         "target": "hamiltonian_imag", "loss_weight": 27.211},
    ]

    mesh = _mesh()
    inputs, _ = _halo_inputs(mesh, graph)
    loss_fn = make_halo_loss_fn(model, mesh, losses)
    halo_loss, halo_logs = jax.jit(loss_fn)(params, inputs)
    ref_preds = model.apply(params, graph)
    ref_loss, ref_logs = compute_losses(ref_preds, graph, losses)
    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)
    for k in ref_logs:
        np.testing.assert_allclose(np.asarray(halo_logs[k]),
                                   np.asarray(ref_logs[k]), rtol=2e-5)


def test_halo_band_energy_loss_matches_single_device():
    """Band-energy secondary loss under the partition: predicted block rows
    are all_gathered to the global order and solved whole-crystal; loss must
    equal the single-device band loss (VERDICT r3 item 4)."""
    from hamgnn_tpu.physics.kpoints import random_k_cartesian

    rng = np.random.default_rng(2)
    graph = _tiny_graph(rng)
    rep = _tiny_rep()
    out = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", ham_only=True, symmetrize=True, add_H0=True,
        zero_point_shift=False, calculate_band_energy=True, num_k=2,
        band_num_control=2)
    model = HamGNNModel(representation=rep, output=out)
    k_vecs = jnp.asarray(np.asarray(
        random_k_cartesian(rng, 2, np.asarray(graph.cell[0])),
        np.float32)[None])
    params = model.init(jax.random.PRNGKey(2), graph, k_vecs=k_vecs)
    losses = [
        {"metric": "mae", "prediction": "hamiltonian",
         "target": "hamiltonian", "loss_weight": 27.211},
        {"metric": "mae", "prediction": "band_energy",
         "target": "band_energy", "loss_weight": 0.01},
    ]

    mesh = _mesh()
    plan = plan_for_graph(graph, N_SHARDS)
    inputs = shard_halo_inputs(mesh, build_halo_inputs(graph, plan))
    unperm = jnp.asarray(edge_unperm_for_plan(plan, graph.num_edges))

    loss_fn = make_halo_loss_fn(model, mesh, losses, with_band=True)
    halo_loss, halo_logs = jax.jit(loss_fn)(
        params, inputs, graph, k_vecs, unperm)
    ref_preds = model.apply(params, graph, k_vecs=k_vecs)
    ref_loss, ref_logs = compute_losses(ref_preds, graph, losses)
    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(halo_logs["mae_band_energy"]),
        np.asarray(ref_logs["mae_band_energy"]), rtol=5e-4, atol=1e-6)


def test_halo_transformer_matches_single_device():
    """HamGNNTransformer under the edge partition == single-device: the
    attention softmax segments over dst, which the dst-owned partition keeps
    shard-local (last of the halo feature-matrix restrictions lifted)."""
    from hamgnn_tpu.models.representation import HamGNNTransformer

    rng = np.random.default_rng(4)
    graph = _tiny_graph(rng)
    tfeat = "4x0e+2x0o+2x1o+2x1e+2x2e"
    rep = HamGNNTransformer(
        num_types=20, irreps_edge_sh=SH, irreps_node_features=tfeat,
        num_layers=1, num_radial=6, rbf_func="bessel", cutoff=4.0,
        radial_mlp=(8,), num_heads=2, num_hidden_features=4, correlation=2)
    out = HamGNNPlusPlusOut(
        irreps_in_node=tfeat, irreps_in_edge=tfeat, nao_max=14,
        ham_type="openmx", ham_only=True, symmetrize=True, add_H0=False,
        zero_point_shift=False)
    model = HamGNNModel(representation=rep, output=out)
    params = model.init(jax.random.PRNGKey(4), graph)
    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    mesh = _mesh()
    inputs, _ = _halo_inputs(mesh, graph)
    loss_fn = make_halo_loss_fn(model, mesh, losses)
    halo_loss, _ = jax.jit(loss_fn)(params, inputs)
    ref_loss, _ = compute_losses(model.apply(params, graph), graph, losses)
    np.testing.assert_allclose(np.asarray(halo_loss), np.asarray(ref_loss),
                               rtol=2e-5)
