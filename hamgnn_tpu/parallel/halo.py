"""Halo-exchange edge partition: explicit shard_map graph parallelism.

The reference has no model-parallel axis at all — it scales big crystals with
batch_size=1 + gradient checkpointing (/root/reference/README.md:469,
hamgnn/models/hamgnn_conv.py:236-246).  SURVEY.md §5 names the missing piece:
partition the edge set across devices and exchange only the *boundary* node
features each layer — the graph analog of ring/Ulysses sequence parallelism.

:mod:`hamgnn_tpu.parallel.sharding` already gives a GSPMD edge partition where
node features stay replicated and XLA AllReduces the full (N, D) node array
after every segment-sum.  This module is the bandwidth-optimal variant:

  * **node ownership** — nodes are split into contiguous blocks of N/S per
    shard; every edge lives on the shard that owns its destination, so the
    message segment-sum is entirely local (no collective at all).
  * **halo exchange** — the only communication is one ``all_to_all`` per
    gather of remote *source* rows: shard ``s`` receives exactly the rows it
    references, in a pack-time order (``EdgePartitionPlan``), instead of the
    full node array.  Comm volume per layer drops from O(N·D·S) bytes on the
    wire to O(halo·D), which for local (cutoff-radius) crystal graphs is the
    surface/volume ratio of the partition.
  * all shapes are static: request lists are padded to a common bucket ``H``
    so XLA compiles one fixed all-to-all per layer over the ICI ring.

Everything is pure-functional: the plan is numpy built once at pack time; the
device code is a ``shard_map`` over the ``graph`` mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..e3.irreps import Irreps

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

GRAPH_AXIS = "graph"


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


@dataclasses.dataclass(frozen=True)
class EdgePartitionPlan:
    """Pack-time (numpy) partition of a padded graph over S shards.

    Shapes: S = n_shards, N_loc = nodes per shard, E_loc = padded local edge
    count, H = halo bucket (max rows any shard requests from any peer).

    ``src_pos`` indexes the per-shard *node table* ``concat([owned rows
    (N_loc), halo rows (S*H)])``: position ``N_loc + p*H + r`` is row r of the
    request list this shard sent to peer p.  ``send_idx[s, p]`` are the
    s-owned local row ids that peer p requested (what s must send to p).
    """

    n_shards: int
    n_nodes_local: int
    halo_bucket: int
    edge_id: np.ndarray      # (S, E_loc) int32 — global edge ids (pad: any masked id)
    src_pos: np.ndarray      # (S, E_loc) int32 — into the local node table
    dst_local: np.ndarray    # (S, E_loc) int32 — local (owned) dst row
    edge_mask: np.ndarray    # (S, E_loc) bool
    send_idx: np.ndarray     # (S, S, H) int32 — owned-local rows to send to each peer
    # inverse-edge exchange (full-model halo: Hermitian symmetrization pairs
    # each off-site block with its inverse edge's block, which lives on the
    # shard owning src).  Built when make_plan is given inv_edge_idx.
    edge_halo_bucket: int = 0
    inv_pos: Optional[np.ndarray] = None        # (S, E_loc) int32 into edge table
    edge_send_idx: Optional[np.ndarray] = None  # (S, S, HE) int32 local edge rows
    # comm/compute overlap (SURVEY §5): per-shard compact list of the local
    # edge rows whose SOURCE is remote (boundary edges).  The layer computes
    # interior messages from owned rows while the all_to_all is in flight and
    # adds the boundary contributions on arrival.
    boundary_bucket: int = 0
    boundary_pos: Optional[np.ndarray] = None   # (S, E_b) int32 local edge rows
    boundary_mask: Optional[np.ndarray] = None  # (S, E_b) bool

    @property
    def table_size(self) -> int:
        return self.n_nodes_local + self.n_shards * self.halo_bucket


def make_plan(edge_index: np.ndarray, edge_mask: np.ndarray, n_nodes: int,
              n_shards: int, edge_quantum: int = 64,
              inv_edge_idx: Optional[np.ndarray] = None,
              force_edge_loc: Optional[int] = None,
              force_halo: Optional[int] = None,
              force_edge_halo: Optional[int] = None,
              force_boundary: Optional[int] = None) -> EdgePartitionPlan:
    """Partition edges by destination owner and build the halo exchange plan.

    ``force_*`` pin the padded local-edge / halo / edge-halo bucket sizes so
    plans for different graphs can be stacked along a data axis (all table
    positions are bucket-size dependent)."""
    edge_index = np.asarray(edge_index)
    edge_mask = np.asarray(edge_mask).astype(bool)
    assert n_nodes % n_shards == 0, (n_nodes, n_shards)
    n_loc = n_nodes // n_shards
    src, dst = edge_index[0], edge_index[1]
    owner = dst // n_loc

    per_shard_edges = []
    for s in range(n_shards):
        ids = np.nonzero(edge_mask & (owner == s))[0]
        per_shard_edges.append(ids)
    e_loc = _round_up(max((len(i) for i in per_shard_edges), default=1),
                      edge_quantum)
    if force_edge_loc is not None:
        assert force_edge_loc >= e_loc, (force_edge_loc, e_loc)
        e_loc = force_edge_loc

    # request lists: for each shard s and peer p != s, unique src rows owned
    # by p that s's edges reference (sorted for determinism)
    requests = [[np.zeros(0, np.int64)] * n_shards for _ in range(n_shards)]
    for s in range(n_shards):
        es = per_shard_edges[s]
        s_src = src[es]
        s_owner = s_src // n_loc
        for p in range(n_shards):
            if p == s:
                continue
            requests[s][p] = np.unique(s_src[s_owner == p])
    halo = max((len(requests[s][p]) for s in range(n_shards)
                for p in range(n_shards)), default=0)
    halo = _round_up(max(halo, 1), 8)
    if force_halo is not None:
        assert force_halo >= halo, (force_halo, halo)
        halo = force_halo

    edge_id = np.zeros((n_shards, e_loc), np.int32)
    src_pos = np.zeros((n_shards, e_loc), np.int32)
    dst_local = np.zeros((n_shards, e_loc), np.int32)
    mask_out = np.zeros((n_shards, e_loc), bool)
    send_idx = np.zeros((n_shards, n_shards, halo), np.int32)

    for s in range(n_shards):
        es = per_shard_edges[s]
        ne = len(es)
        edge_id[s, :ne] = es
        dst_local[s, :ne] = dst[es] - s * n_loc
        mask_out[s, :ne] = True
        # map each src to its local-table position
        pos_of = {}
        for p in range(n_shards):
            req = requests[s][p]
            for r, g in enumerate(req):
                pos_of[int(g)] = n_loc + p * halo + r
        s_src = src[es]
        s_owner = s_src // n_loc
        pos = np.empty(ne, np.int32)
        for k in range(ne):
            g = int(s_src[k])
            pos[k] = g - s * n_loc if s_owner[k] == s else pos_of[g]
        src_pos[s, :ne] = pos
    for s in range(n_shards):        # sender s
        for p in range(n_shards):    # receiver p
            req = requests[p][s]     # rows p wants from s
            send_idx[s, p, : len(req)] = req - s * n_loc

    edge_halo = 0
    inv_pos = None
    edge_send_idx = None
    if inv_edge_idx is not None:
        inv_edge_idx = np.asarray(inv_edge_idx)
        # local row of each global edge on its owner shard
        local_row = np.zeros(edge_index.shape[1], np.int64)
        owner_of_edge = np.zeros(edge_index.shape[1], np.int64)
        for s in range(n_shards):
            es = per_shard_edges[s]
            local_row[es] = np.arange(len(es))
            owner_of_edge[es] = s
        # per-shard requests of remote inverse-edge rows (by sender peer)
        ereq = [[np.zeros(0, np.int64)] * n_shards for _ in range(n_shards)]
        for s in range(n_shards):
            es = per_shard_edges[s]
            iv = inv_edge_idx[es]
            iv_owner = owner_of_edge[iv]
            for p in range(n_shards):
                if p == s:
                    continue
                ereq[s][p] = np.unique(iv[iv_owner == p])
        edge_halo = _round_up(max((len(ereq[s][p]) for s in range(n_shards)
                                   for p in range(n_shards)), default=1), 8)
        if force_edge_halo is not None:
            assert force_edge_halo >= edge_halo, (force_edge_halo, edge_halo)
            edge_halo = force_edge_halo
        inv_pos = np.zeros((n_shards, e_loc), np.int32)
        edge_send_idx = np.zeros((n_shards, n_shards, edge_halo), np.int32)
        for s in range(n_shards):
            es = per_shard_edges[s]
            pos_of = {}
            for p in range(n_shards):
                for r, g in enumerate(ereq[s][p]):
                    pos_of[int(g)] = e_loc + p * edge_halo + r
            iv = inv_edge_idx[es]
            iv_owner = owner_of_edge[iv]
            for k in range(len(es)):
                g = int(iv[k])
                inv_pos[s, k] = (local_row[g] if iv_owner[k] == s
                                 else pos_of[g])
        for s in range(n_shards):
            for p in range(n_shards):
                req = ereq[p][s]
                edge_send_idx[s, p, : len(req)] = local_row[req]

    # boundary edge lists for comm/compute overlap: local rows whose source
    # position points into the halo table (src owned by a peer)
    b_counts = [int(np.sum(mask_out[s] & (src_pos[s] >= n_loc)))
                for s in range(n_shards)]
    e_b = _round_up(max(max(b_counts), 1), 8)
    if force_boundary is not None:
        assert force_boundary >= e_b, (force_boundary, e_b)
        e_b = force_boundary
    boundary_pos = np.zeros((n_shards, e_b), np.int32)
    boundary_mask = np.zeros((n_shards, e_b), bool)
    for s in range(n_shards):
        rows = np.nonzero(mask_out[s] & (src_pos[s] >= n_loc))[0]
        boundary_pos[s, : len(rows)] = rows
        boundary_mask[s, : len(rows)] = True

    return EdgePartitionPlan(
        n_shards=n_shards, n_nodes_local=n_loc, halo_bucket=halo,
        edge_id=edge_id, src_pos=src_pos, dst_local=dst_local,
        edge_mask=mask_out, send_idx=send_idx,
        edge_halo_bucket=edge_halo, inv_pos=inv_pos,
        edge_send_idx=edge_send_idx,
        boundary_bucket=e_b, boundary_pos=boundary_pos,
        boundary_mask=boundary_mask,
    )


def shard_plan_arrays(mesh: Mesh, plan: EdgePartitionPlan):
    """device_put the plan's per-shard arrays along the graph axis."""
    sh = NamedSharding(mesh, P(GRAPH_AXIS))
    return {
        "edge_id": jax.device_put(jnp.asarray(plan.edge_id), sh),
        "src_pos": jax.device_put(jnp.asarray(plan.src_pos), sh),
        "dst_local": jax.device_put(jnp.asarray(plan.dst_local), sh),
        "edge_mask": jax.device_put(jnp.asarray(plan.edge_mask), sh),
        "send_idx": jax.device_put(jnp.asarray(plan.send_idx), sh),
    }


def halo_recv_rows(local_feats: jnp.ndarray, send_idx: jnp.ndarray) -> jnp.ndarray:
    """Inside shard_map: the halo rows only — one all_to_all carrying exactly
    the rows each peer requested.  (S*H, D); kept separate from the owned rows
    so interior compute need not data-depend on the collective."""
    send = local_feats[send_idx]                     # (S, H, D)
    recv = jax.lax.all_to_all(send, GRAPH_AXIS, split_axis=0, concat_axis=0)
    return recv.reshape(-1, local_feats.shape[-1])   # (S*H, D)


def halo_gather(local_feats: jnp.ndarray, send_idx: jnp.ndarray) -> jnp.ndarray:
    """Inside shard_map: build the local node table [owned ‖ halo rows].

    local_feats: (N_loc, D) owned rows; send_idx: (S, H) rows to send to each
    peer.  One all_to_all over the graph axis carries only requested rows.
    """
    return jnp.concatenate(
        [local_feats, halo_recv_rows(local_feats, send_idx)], axis=0)


def make_halo_conv_forward(conv_module, mesh: Mesh, pair_module=None):
    """shard_map forward of one GNN layer under the halo edge partition.

    ``conv_module`` must be a :class:`~hamgnn_tpu.nn.blocks.ConvBlockE3`-like
    module exposing ``gathered_call(node_feats_own, src_feats, dst_feats,
    edge_feats, edge_sh, edge_scalars, dst_local, edge_mask)``; see
    ``ConvBlockE3.gathered_call``.  ``pair_module`` (PairInteractionBlock)
    likewise via its ``gathered_call``.

    Returns ``f(params, pair_params, node_feats_sharded, per-shard edge
    arrays, plan arrays) -> (new_node_feats, new_edge_feats)`` where
    node_feats is sharded P('graph') on its leading (S*N_loc) axis and edge
    arrays carry a leading S axis sharded P('graph').
    """

    def local_fn(params, pair_params, node_loc, edge_feats, edge_sh,
                 edge_scalars, src_pos, dst_local, edge_mask, send_idx):
        # squeeze the per-shard leading axis added by shard_map
        (edge_feats, edge_sh, edge_scalars, src_pos, dst_local, edge_mask,
         send_idx) = jax.tree.map(
            lambda x: x[0],
            (edge_feats, edge_sh, edge_scalars, src_pos, dst_local, edge_mask,
             send_idx))
        table = halo_gather(node_loc, send_idx)
        new_nodes = conv_module.apply(
            params, node_loc, table[src_pos], node_loc[dst_local], edge_feats,
            edge_sh, edge_scalars, dst_local, edge_mask,
            method=conv_module.gathered_call)
        new_edges = edge_feats
        if pair_module is not None:
            # PairInteraction lifts node feats with two linears, then gathers:
            # apply the linears on owned rows, halo-exchange the lifted src.
            up_src, up_dst = pair_module.apply(
                pair_params, new_nodes, method=pair_module.lift)
            src_table = halo_gather(up_src, send_idx)
            new_edges = pair_module.apply(
                pair_params, src_table[src_pos], up_dst[dst_local], edge_feats,
                edge_sh, edge_scalars, method=pair_module.gathered_call)
        return new_nodes, new_edges[None]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS)),
        out_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def gather_edge_arrays(plan: EdgePartitionPlan, *edge_arrays):
    """Host-side: reindex global (E, ...) per-edge arrays to (S, E_loc, ...).

    Padded local slots point at global edge 0; their contributions are killed
    by ``plan.edge_mask`` inside the layer, so no zeroing is needed here.
    """
    return tuple(np.asarray(a)[plan.edge_id] for a in edge_arrays)


def scatter_back_nodes(plan: EdgePartitionPlan, node_feats_sharded: jnp.ndarray,
                       n_nodes: int) -> jnp.ndarray:
    """Sharded (S*N_loc, D) owned-major node features are already in global
    node order (ownership blocks are contiguous) — just reshape/return."""
    assert node_feats_sharded.shape[0] == n_nodes
    return node_feats_sharded


def scatter_back_edges(plan: EdgePartitionPlan, edge_feats_sharded,
                       n_edges: int) -> jnp.ndarray:
    """(S, E_loc, D) per-shard edge features -> global (E, D) edge order."""
    flat_id = plan.edge_id.reshape(-1)
    flat_mask = plan.edge_mask.reshape(-1)
    ef = np.asarray(edge_feats_sharded).reshape(-1, edge_feats_sharded.shape[-1])
    out = np.zeros((n_edges, ef.shape[-1]), ef.dtype)
    out[flat_id[flat_mask]] = ef[flat_mask]
    return jnp.asarray(out)
