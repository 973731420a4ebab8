"""GraphView — shard-local view of a padded Graph with injected communication.

The representation network and the output heads are written against this view
instead of raw :class:`hamgnn_tpu.data.graph.Graph` indexing, so the SAME flax
modules (same parameter trees, same math) run

  * single-device / data-parallel: trivial hooks (``rows[src]``,
    ``rows[inv_edge]``, identity psum) built by :meth:`GraphView.dense`;
  * under the halo edge partition: all_to_all-backed hooks built shard-local
    inside ``shard_map`` by :func:`hamgnn_tpu.parallel.halo_model.halo_view`.

This is the reference's "every model variant is parallel" property
(/root/reference/hamgnn/main.py:300-323) carried to the model-parallel axis
the reference lacks: with the view injected, adding a head feature
automatically works under the partition — no hand-duplicated forward.

Hook contract (shapes: N = owned nodes, E = local edges):
  * ``gather_src(rows)``: (N, D) per-owned-node rows -> (E, D) rows of each
    edge's source endpoint (halo: one all_to_all + table gather);
  * ``gather_dst(rows)``: (N, D) -> (E, D) destination rows (halo: edges live
    with their destination owner, so this is a local gather);
  * ``inv_exchange(rows)``: (E, D) per-edge rows -> (E, D) rows of each
    edge's INVERSE edge (halo: boundary inverse edges ride one all_to_all);
  * ``psum(x)``: global sum over the partition (identity when unpartitioned).
  * ``dst_index``: (E,) local destination row per edge — segment-sum target.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..data.graph import Graph


def _identity(x):
    return x


@dataclasses.dataclass
class GraphView:
    # --- per-owned-node ------------------------------------------------
    z: Any
    node_mask: Any
    num_nodes: int
    # --- per-local-edge ------------------------------------------------
    edge_vec: Any
    edge_mask: Any
    z_src: Any
    z_dst: Any
    dst_index: Any
    # --- communication hooks ------------------------------------------
    gather_src: Callable[[jnp.ndarray], jnp.ndarray]
    gather_dst: Callable[[jnp.ndarray], jnp.ndarray]
    inv_exchange: Callable[[jnp.ndarray], jnp.ndarray]
    psum: Callable[[jnp.ndarray], jnp.ndarray] = _identity
    # --- comm/compute overlap (halo only; None on the dense view) --------
    # interior edges gather source rows from OWNED features only, so the
    # per-layer all_to_all is consumed solely by the small boundary pass and
    # overlaps with the interior contraction (SURVEY §5 north star).
    gather_src_interior: Optional[Callable] = None   # rows -> (E, D), owned only
    halo_rows: Optional[Callable] = None             # rows -> (S*H, D) collective
    interior_mask: Optional[Any] = None              # (E,) bool
    boundary_pos: Optional[Any] = None               # (E_b,) local edge rows
    boundary_mask: Optional[Any] = None              # (E_b,) bool
    src_halo_pos: Optional[Any] = None               # (E_b,) into halo rows
    # whole-crystal reassembly for band solves etc.: map shard-local per-node
    # / per-edge rows to the GLOBAL padded row order (replicated on every
    # shard).  Identity on the dense view; all_gather(+unpermute) under halo.
    gather_nodes_global: Callable[[jnp.ndarray], jnp.ndarray] = _identity
    gather_edges_global: Callable[[jnp.ndarray], jnp.ndarray] = _identity
    # --- optional doping (charge-doped one-hot embedding) ---------------
    doping_own: Optional[Any] = None
    doping_src: Optional[Any] = None
    doping_dst: Optional[Any] = None
    # --- targets / references in the view's row order -------------------
    Hon: Optional[Any] = None
    Hoff: Optional[Any] = None
    Son: Optional[Any] = None
    Soff: Optional[Any] = None
    Hon0: Optional[Any] = None
    Hoff0: Optional[Any] = None
    iHon: Optional[Any] = None
    iHoff: Optional[Any] = None
    iHon0: Optional[Any] = None
    iHoff0: Optional[Any] = None
    Lon: Optional[Any] = None
    Loff: Optional[Any] = None
    spin_vec: Optional[Any] = None
    spin_length: Optional[Any] = None
    # the global padded Graph when available (single-device path); band
    # assembly and other whole-crystal operations need it.  Under the halo
    # partition this is None — heads must gate global ops on it.
    graph: Optional[Graph] = None

    @classmethod
    def dense(cls, graph: Graph) -> "GraphView":
        """Trivial single-device view: gathers are plain indexing."""
        src, dst = graph.edge_index[0], graph.edge_index[1]
        inv_edge = graph.inv_edge_idx
        doping = None
        if graph.doping_charge is not None:
            doping = graph.doping_charge[graph.batch]
        return cls(
            z=graph.z,
            node_mask=graph.node_mask,
            num_nodes=graph.num_nodes,
            edge_vec=graph.edge_vectors(),
            edge_mask=graph.edge_mask,
            z_src=graph.z[src],
            z_dst=graph.z[dst],
            dst_index=dst,
            gather_src=lambda rows: rows[src],
            gather_dst=lambda rows: rows[dst],
            inv_exchange=(lambda rows: rows[inv_edge])
            if inv_edge is not None else _identity,
            psum=_identity,
            doping_own=doping,
            doping_src=None if doping is None else doping[src],
            doping_dst=None if doping is None else doping[dst],
            Hon=graph.Hon, Hoff=graph.Hoff,
            Son=graph.Son, Soff=graph.Soff,
            Hon0=graph.Hon0, Hoff0=graph.Hoff0,
            iHon=graph.iHon, iHoff=graph.iHoff,
            iHon0=graph.iHon0, iHoff0=graph.iHoff0,
            Lon=graph.Lon, Loff=graph.Loff,
            spin_vec=graph.spin_vec, spin_length=graph.spin_length,
            graph=graph,
        )


def as_view(graph_or_view) -> GraphView:
    if isinstance(graph_or_view, GraphView):
        return graph_or_view
    return GraphView.dense(graph_or_view)
