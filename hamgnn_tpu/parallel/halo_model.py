"""Full-model training under the halo edge partition (SURVEY §5 north star).

The model forward is NOT re-implemented here.  The representation network and
every output head are written against :class:`hamgnn_tpu.models.view.GraphView`
(models/view.py); this module only

  * packs a padded Graph into per-shard halo inputs (host-side, numpy),
  * builds the shard-local ``GraphView`` whose hooks are the halo
    collectives (``halo_gather`` all_to_all for source rows, an inverse-edge
    all_to_all for Hermitian symmetrization, psum for global reductions,
    all_gather for whole-crystal band assembly), and
  * calls ``model.forward_view(view)`` — the same flax modules and parameter
    tree as the single-device step — inside one ``shard_map`` over the
    ``graph`` mesh axis.

Every head that speaks GraphView therefore works under the partition: the
plain Hamiltonian/overlap head, the SOC head (su2/so3), and the band-energy
secondary loss (whole-crystal solve on all_gathered block rows).  This
matches the reference's "every variant is parallel" DDP property
(/root/reference/hamgnn/main.py:300-323) on the model-parallel axis the
reference lacks entirely.

Communication per step (everything else is shard-local):
  * one node-feature ``all_to_all`` per layer for the conv gather and one for
    the pair-lift gather — O(halo · D) bytes, the partition's surface/volume;
  * one off-site-row ``all_to_all`` per Hermitian symmetrization (each
    boundary edge's inverse lives with the src owner);
  * scalar ``psum`` reductions for zero-point shift, sparsity and losses;
  * with band losses: one ``all_gather`` of the predicted block rows.

Parameters stay replicated; ``jax.grad`` through the ``shard_map`` inserts
the matching psums for the weight gradients, so the step is numerically the
single-device step (equivalence-tested in tests/test_halo_model.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph
from ..models.view import GraphView
from .halo import (GRAPH_AXIS, EdgePartitionPlan, halo_gather,
                   halo_recv_rows, make_plan)

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def build_halo_inputs(graph: Graph, plan: EdgePartitionPlan) -> Dict[str, np.ndarray]:
    """Host-side pack of a padded Graph into per-shard halo inputs.

    Node-side arrays keep their global (S*N_loc) leading axis (ownership
    blocks are contiguous, so P('graph') sharding IS the partition); per-edge
    arrays are reindexed to (S, E_loc, ...) via the plan's edge ids.
    """
    assert plan.inv_pos is not None, "plan must be built with inv_edge_idx"
    src, dst = np.asarray(graph.edge_index[0]), np.asarray(graph.edge_index[1])
    eid = plan.edge_id

    def per_edge(a):
        return np.asarray(a)[eid]

    def opt_node(a):
        return None if a is None else np.asarray(a)

    def opt_edge(a):
        return None if a is None else per_edge(a)

    doping = (None if graph.doping_charge is None
              else np.asarray(graph.doping_charge)[np.asarray(graph.batch)])
    out = {
        # node side, sharded on leading axis
        "z": np.asarray(graph.z),
        "node_mask": np.asarray(graph.node_mask),
        "Hon": opt_node(graph.Hon),
        "Son": opt_node(graph.Son),
        "Hon0": opt_node(graph.Hon0),
        "iHon": opt_node(graph.iHon),
        "iHon0": opt_node(graph.iHon0),
        "Lon": opt_node(graph.Lon),
        "spin_vec": opt_node(graph.spin_vec),
        "spin_length": opt_node(graph.spin_length),
        "doping_node": doping,
        # edge side, (S, E_loc, ...)
        "edge_vec": per_edge(np.asarray(graph.edge_vectors())),
        "z_src": np.asarray(graph.z)[src][eid],
        "z_dst": np.asarray(graph.z)[dst][eid],
        "doping_src": None if doping is None else doping[src][eid],
        "doping_dst": None if doping is None else doping[dst][eid],
        "Hoff": opt_edge(graph.Hoff),
        "Soff": opt_edge(graph.Soff),
        "Hoff0": opt_edge(graph.Hoff0),
        "iHoff": opt_edge(graph.iHoff),
        "iHoff0": opt_edge(graph.iHoff0),
        "Loff": opt_edge(graph.Loff),
        # plan arrays
        "src_pos": plan.src_pos,
        "dst_local": plan.dst_local,
        "edge_mask_sh": plan.edge_mask,
        "send_idx": plan.send_idx,
        "inv_pos": plan.inv_pos,
        "edge_send_idx": plan.edge_send_idx,
        "boundary_pos": plan.boundary_pos,
        "boundary_mask": plan.boundary_mask,
    }
    return {k: v for k, v in out.items() if v is not None}


def edge_unperm_for_plan(plan: EdgePartitionPlan, n_edges_global: int) -> np.ndarray:
    """(E_glob,) map: global edge row -> flattened (s*E_loc + r) position in
    the all_gathered per-shard edge tables (band assembly under the
    partition).  Padded global edges point at a masked local row."""
    e_loc = plan.edge_id.shape[1]
    unperm = np.zeros(n_edges_global, np.int64)
    # default: first masked position (values are masked out downstream)
    masked = np.nonzero(~plan.edge_mask.reshape(-1))[0]
    if masked.size:
        unperm[:] = masked[0]
    for s in range(plan.n_shards):
        rows = np.nonzero(plan.edge_mask[s])[0]
        unperm[plan.edge_id[s, rows]] = s * e_loc + rows
    return unperm


def edge_halo_gather(local_rows: jnp.ndarray, edge_send_idx: jnp.ndarray) -> jnp.ndarray:
    """[local edge rows ‖ received inverse-edge rows] table (one all_to_all)."""
    send = local_rows[edge_send_idx]                 # (S, HE, D)
    recv = jax.lax.all_to_all(send, GRAPH_AXIS, split_axis=0, concat_axis=0)
    return jnp.concatenate(
        [local_rows, recv.reshape(-1, local_rows.shape[-1])], axis=0)


def _psum(x):
    return jax.lax.psum(x, GRAPH_AXIS)


_NODE_TARGETS = ("Hon", "Son", "Hon0", "iHon", "iHon0", "Lon",
                 "spin_vec", "spin_length")
_EDGE_TARGETS = ("Hoff", "Soff", "Hoff0", "iHoff", "iHoff0", "Loff")


def halo_view(inp: Dict[str, jnp.ndarray],
              band_graph: Optional[Graph] = None,
              edge_unperm: Optional[jnp.ndarray] = None) -> GraphView:
    """Shard-local GraphView over packed halo inputs (inside shard_map)."""

    def sq(name):
        # (S, ...) arrays arrive shard-local as (1, ...): drop the axis
        return inp[name][0]

    src_pos = sq("src_pos")
    dst_local = sq("dst_local")
    send_idx = sq("send_idx")
    inv_pos = sq("inv_pos")
    edge_send_idx = sq("edge_send_idx")

    def gather_src(rows):
        return halo_gather(rows, send_idx)[src_pos]

    def gather_dst(rows):
        return rows[dst_local]

    # --- comm/compute overlap hooks (SURVEY §5 north star) ---------------
    # interior edges read owned rows only; the all_to_all result is consumed
    # ONLY by the small boundary pass, so XLA's latency-hiding scheduler can
    # run the interior contraction while the exchange is in flight.
    n_loc = inp["z"].shape[0]
    boundary_pos = sq("boundary_pos") if "boundary_pos" in inp else None
    boundary_mask = sq("boundary_mask") if "boundary_mask" in inp else None
    interior_mask = None
    src_halo_pos = None
    if boundary_pos is not None:
        is_interior = src_pos < n_loc
        interior_mask = sq("edge_mask_sh") & is_interior
        src_pos_int = jnp.where(is_interior, src_pos, 0)
        src_halo_pos = jnp.maximum(src_pos[boundary_pos] - n_loc, 0)

        def gather_src_interior(rows):
            return rows[src_pos_int]

        def halo_rows(rows):
            return halo_recv_rows(rows, send_idx)
    else:                                             # pragma: no cover
        gather_src_interior = None
        halo_rows = None

    def inv_exchange(rows):
        return edge_halo_gather(rows, edge_send_idx)[inv_pos]

    def gather_nodes_global(rows):
        return jax.lax.all_gather(rows, GRAPH_AXIS, axis=0, tiled=True)

    def gather_edges_global(rows):
        g = jax.lax.all_gather(rows, GRAPH_AXIS, axis=0, tiled=True)
        return g[edge_unperm]

    kw: Dict[str, Any] = {}
    for name in _NODE_TARGETS:
        if name in inp:
            kw[name] = inp[name]
    for name in _EDGE_TARGETS:
        if name in inp:
            kw[name] = sq(name)
    return GraphView(
        z=inp["z"],
        node_mask=inp["node_mask"],
        num_nodes=inp["z"].shape[0],
        edge_vec=sq("edge_vec"),
        edge_mask=sq("edge_mask_sh"),
        z_src=sq("z_src"),
        z_dst=sq("z_dst"),
        dst_index=dst_local,
        gather_src=gather_src,
        gather_dst=gather_dst,
        inv_exchange=inv_exchange,
        gather_src_interior=gather_src_interior,
        halo_rows=halo_rows,
        interior_mask=interior_mask,
        boundary_pos=boundary_pos,
        boundary_mask=boundary_mask,
        src_halo_pos=src_halo_pos,
        psum=_psum,
        gather_nodes_global=gather_nodes_global,
        gather_edges_global=(gather_edges_global if edge_unperm is not None
                             else (lambda rows: rows)),
        doping_own=inp.get("doping_node"),
        doping_src=None if "doping_src" not in inp else sq("doping_src"),
        doping_dst=None if "doping_dst" not in inp else sq("doping_dst"),
        graph=band_graph,
        **kw,
    )


def make_halo_loss_fn(model, mesh: Mesh,
                      losses: Optional[Sequence[Dict[str, Any]]] = None,
                      data_axis: Optional[str] = None,
                      with_band: bool = False):
    """``loss_fn(params, inputs[, band_graph, k_vecs]) -> (loss, logs)`` for
    the full model under the halo partition.

    ``model`` is a :class:`hamgnn_tpu.models.model.HamGNNModel` whose
    representation/output expose ``forward_view`` — the SAME modules and
    parameter tree as the single-device step, with the halo collectives
    injected through the view.  ``with_band=True`` adds two replicated
    arguments: the padded Graph (whole-crystal structure for the k-space
    solve) and host-generated k_vecs; requires ``data_axis=None`` (the
    big-crystal regime trains one crystal per step, reference README.md:469).
    """
    from ..models.model import compute_losses

    losses = losses or [{"metric": "mae", "prediction": "hamiltonian",
                         "target": "hamiltonian", "loss_weight": 27.211}]
    if with_band:
        assert data_axis is None, \
            "halo band losses support n_data=1 (one crystal per step)"

    def local_loss(params, inp, band_graph, k_vecs, edge_unperm):
        if data_axis is not None:
            inp = {k: v[0] for k, v in inp.items()}
        view = halo_view(inp, band_graph=band_graph, edge_unperm=edge_unperm)
        preds = model.apply(params, view, k_vecs=k_vecs,
                            method="forward_view")
        total, logs = compute_losses(preds, view, losses, psum=view.psum)
        if data_axis is not None:
            total = jax.lax.pmean(total, data_axis)
            logs = jax.tree.map(lambda x: jax.lax.pmean(x, data_axis), logs)
        return total, logs

    def loss_fn(params, inputs, band_graph=None, k_vecs=None,
                edge_unperm=None):
        lead = (data_axis,) if data_axis is not None else ()
        specs = {k: P(*lead, GRAPH_AXIS) for k in inputs}
        fn = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), specs, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(params, inputs, band_graph, k_vecs, edge_unperm)

    return loss_fn


def halo_bucket_sizes(graphs: Sequence[Graph], n_shards: int,
                      edge_quantum: int = 64) -> Tuple[int, int, int, int]:
    """Dataset-wide (edge_loc, halo, edge_halo, boundary) bucket sizes: the
    max of the natural plan sizes, so every stacked batch shares ONE jit
    shape."""
    nat = [plan_for_graph(g, n_shards, edge_quantum) for g in graphs]
    return (max(p.edge_id.shape[1] for p in nat),
            max(p.halo_bucket for p in nat),
            max(p.edge_halo_bucket for p in nat),
            max(p.boundary_bucket for p in nat))


def stack_halo_inputs(graphs: Sequence[Graph], n_shards: int,
                      edge_quantum: int = 64,
                      force_sizes: Optional[Tuple[int, int, int]] = None,
                      ) -> Dict[str, np.ndarray]:
    """Pack several same-bucket padded graphs for a DP x halo mesh.

    Two passes: natural plans fix the max local-edge/halo bucket sizes (or
    ``force_sizes`` pins them dataset-wide), then plans are rebuilt with the
    forced common sizes (table positions depend on the bucket sizes, so plain
    padding would corrupt them) and every input is stacked along a leading
    data axis.
    """
    if force_sizes is not None:
        e_loc, halo, ehalo, e_b = force_sizes
    else:
        e_loc, halo, ehalo, e_b = halo_bucket_sizes(graphs, n_shards,
                                                    edge_quantum)
    packed = []
    for g in graphs:
        plan = make_plan(
            np.asarray(g.edge_index), np.asarray(g.edge_mask), g.num_nodes,
            n_shards, edge_quantum=edge_quantum,
            inv_edge_idx=np.asarray(g.inv_edge_idx),
            force_edge_loc=e_loc, force_halo=halo, force_edge_halo=ehalo,
            force_boundary=e_b)
        packed.append(build_halo_inputs(g, plan))
    keys = set(packed[0])
    for p in packed[1:]:
        keys &= set(p)
    return {k: np.stack([p[k] for p in packed]) for k in keys}


def make_halo_train_step(model, tx, losses, mesh: Mesh,
                         data_axis: Optional[str] = "data",
                         with_band: bool = False):
    """jitted DP x halo train step: flat-vector optimizer like the
    single-chip Trainer; XLA inserts the gradient psums from the shard_map."""
    import functools

    from jax.flatten_util import ravel_pytree

    loss_fn = make_halo_loss_fn(model, mesh, losses, data_axis=data_axis,
                                with_band=with_band)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, inputs, lr, band_graph=None, k_vecs=None,
             edge_unperm=None):
        (total, logs), grads = jax.value_and_grad(
            lambda p: loss_fn(p, inputs, band_graph, k_vecs, edge_unperm),
            has_aux=True)(params)
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(params)
        updates, opt_state2 = tx.update(gflat, opt_state, pflat)
        params2 = unravel(pflat + updates * lr)
        return params2, opt_state2, total, logs

    return step


def shard_halo_inputs(mesh: Mesh, inputs: Dict[str, np.ndarray],
                      data_axis: Optional[str] = None):
    """device_put the packed inputs with their halo shardings."""
    lead = (data_axis,) if data_axis is not None else ()
    sh = NamedSharding(mesh, P(*lead, GRAPH_AXIS))
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in inputs.items()}


def plan_for_graph(graph: Graph, n_shards: int,
                   edge_quantum: int = 64) -> EdgePartitionPlan:
    """Halo plan (with inverse-edge exchange) for a padded graph."""
    return make_plan(
        np.asarray(graph.edge_index), np.asarray(graph.edge_mask),
        graph.num_nodes, n_shards, edge_quantum=edge_quantum,
        inv_edge_idx=np.asarray(graph.inv_edge_idx))
