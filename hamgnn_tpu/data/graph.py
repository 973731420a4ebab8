"""Static-shape crystal-graph pytree for XLA.

The reference streams variable-size PyG ``Data`` objects
(/root/reference/DFT_interfaces/openmx/graph_data_gen.py:357-374 fields).  On
TPU everything under ``jit`` needs static shapes, so a batch of crystals is
flattened into one padded graph: nodes/edges padded to bucket sizes with masks,
inverse-edge indices made batch-global at pack time, and per-crystal data
(cell, counts) stacked along a batch axis.

Conventions (same as reference):
  * ``edge_index[0] = src (j, sender)``, ``edge_index[1] = dst (i, receiver)``;
    edge vector = ``pos[dst] + nbr_shift - pos[src]``.
  * ``Hon/Hoff/...`` are (N, nao^2) / (E, nao^2) dense per-block rows.
  * padded nodes have ``z = 0``; padded edges point src=dst=0 with mask 0.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Graph:
    # structure
    z: jnp.ndarray            # (N,) int32 atomic numbers (0 = pad)
    pos: jnp.ndarray          # (N, 3) float
    node_mask: jnp.ndarray    # (N,) bool
    batch: jnp.ndarray        # (N,) int32 crystal id per node
    edge_index: jnp.ndarray   # (2, E) int32
    edge_mask: jnp.ndarray    # (E,) bool
    nbr_shift: jnp.ndarray    # (E, 3) float, Cartesian PBC shift of dst
    cell_shift: jnp.ndarray   # (E, 3) int32
    inv_edge_idx: jnp.ndarray # (E,) int32, batch-global inverse edge ids
    cell: jnp.ndarray         # (B, 3, 3) float
    node_counts: jnp.ndarray  # (B,) int32
    edge_counts: jnp.ndarray  # (B,) int32
    # optional per-crystal scalars
    doping_charge: Optional[jnp.ndarray] = None  # (B,)
    # magnetic / spin-constrained inputs (optional)
    spin_vec: Optional[jnp.ndarray] = None       # (N, 3)
    spin_length: Optional[jnp.ndarray] = None    # (N,)
    # segment id per edge over unique (dst, cell_shift) pairs (pack-time)
    edge_group_tar: Optional[jnp.ndarray] = None  # (E,)
    # targets (optional, present in training data)
    Hon: Optional[jnp.ndarray] = None    # (N, nao^2) or (N, S, nao^2) spin stacks
    Hoff: Optional[jnp.ndarray] = None   # (E, nao^2)
    Hon0: Optional[jnp.ndarray] = None
    Hoff0: Optional[jnp.ndarray] = None
    iHon: Optional[jnp.ndarray] = None
    iHoff: Optional[jnp.ndarray] = None
    iHon0: Optional[jnp.ndarray] = None
    iHoff0: Optional[jnp.ndarray] = None
    Son: Optional[jnp.ndarray] = None
    Soff: Optional[jnp.ndarray] = None
    Lon: Optional[jnp.ndarray] = None
    Loff: Optional[jnp.ndarray] = None
    dSon: Optional[jnp.ndarray] = None   # (N, nao^2, 3) overlap derivatives
    dSoff: Optional[jnp.ndarray] = None  # (E, nao^2, 3)

    @property
    def num_nodes(self) -> int:
        return self.z.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    @property
    def num_graphs(self) -> int:
        return self.cell.shape[0]

    def edge_vectors(self):
        src, dst = self.edge_index[0], self.edge_index[1]
        return (self.pos[dst] + self.nbr_shift) - self.pos[src]


_TARGET_FIELDS = (
    "Hon", "Hoff", "Hon0", "Hoff0", "iHon", "iHoff", "iHon0", "iHoff0",
    "Son", "Soff", "Lon", "Loff", "dSon", "dSoff",
)
_NODE_FIELDS = {"Hon", "Hon0", "iHon", "iHon0", "Son", "Lon", "dSon"}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_and_batch(
    crystals: Sequence[Dict[str, np.ndarray]],
    node_bucket: Optional[int] = None,
    edge_bucket: Optional[int] = None,
    bucket_multiple: int = 32,
    dtype=np.float32,
) -> Graph:
    """Pack a list of per-crystal dicts into one padded :class:`Graph`.

    Each dict carries numpy arrays with the reference field names
    (z, pos, edge_index, inv_edge_idx, nbr_shift, cell_shift, cell, Hon, ...).
    """
    n_tot = sum(int(c["z"].shape[0]) for c in crystals)
    e_tot = sum(int(c["edge_index"].shape[1]) for c in crystals)
    N = node_bucket or _round_up(max(n_tot, 1), bucket_multiple)
    E = edge_bucket or _round_up(max(e_tot, 1), bucket_multiple)
    if N < n_tot or E < e_tot:
        raise ValueError(f"bucket too small: need ({n_tot},{e_tot}), got ({N},{E})")
    B = len(crystals)

    z = np.zeros(N, np.int32)
    pos = np.zeros((N, 3), dtype)
    node_mask = np.zeros(N, bool)
    batch = np.zeros(N, np.int32)
    edge_index = np.zeros((2, E), np.int32)
    edge_mask = np.zeros(E, bool)
    nbr_shift = np.zeros((E, 3), dtype)
    cell_shift = np.zeros((E, 3), np.int32)
    inv_edge = np.zeros(E, np.int32)
    cell = np.zeros((B, 3, 3), dtype)
    node_counts = np.zeros(B, np.int32)
    edge_counts = np.zeros(B, np.int32)
    doping = np.zeros(B, dtype)

    targets: Dict[str, List[np.ndarray]] = {
        k: [] for k in _TARGET_FIELDS if all(k in c for c in crystals)
    }
    has_spin = all("spin_vec" in c for c in crystals)
    spin_vec = np.zeros((N, 3), dtype) if has_spin else None
    spin_length = np.zeros(N, dtype) if has_spin else None

    n_ofs = e_ofs = 0
    for b, c in enumerate(crystals):
        n = int(c["z"].shape[0])
        e = int(c["edge_index"].shape[1])
        z[n_ofs : n_ofs + n] = c["z"]
        pos[n_ofs : n_ofs + n] = c["pos"]
        node_mask[n_ofs : n_ofs + n] = True
        batch[n_ofs : n_ofs + n] = b
        edge_index[:, e_ofs : e_ofs + e] = np.asarray(c["edge_index"]) + n_ofs
        edge_mask[e_ofs : e_ofs + e] = True
        nbr_shift[e_ofs : e_ofs + e] = c["nbr_shift"]
        if "cell_shift" in c:
            cell_shift[e_ofs : e_ofs + e] = c["cell_shift"]
        inv_edge[e_ofs : e_ofs + e] = np.asarray(c["inv_edge_idx"]) + e_ofs
        cc = np.asarray(c["cell"], dtype)
        cell[b] = cc.reshape(3, 3) if cc.size == 9 else cc[0]
        node_counts[b] = n
        edge_counts[b] = e
        if "doping_charge" in c:
            doping[b] = np.asarray(c["doping_charge"]).reshape(-1)[0]
        if has_spin:
            sv = np.asarray(c["spin_vec"], dtype)
            spin_vec[n_ofs : n_ofs + n] = sv
            if "spin_length" in c:
                spin_length[n_ofs : n_ofs + n] = np.asarray(c["spin_length"], dtype)
            else:
                spin_length[n_ofs : n_ofs + n] = np.linalg.norm(sv, axis=-1)
        for k in targets:
            targets[k].append(np.asarray(c[k], dtype))
        n_ofs += n
        e_ofs += e

    # segment id per edge over unique (dst, cell_shift): used by the
    # spin-constrained Heisenberg terms (static-shape replacement of the
    # reference's ragged edge_matcher_tar lookups)
    group_key = {}
    edge_group = np.zeros(E, np.int32)
    for e2 in range(E):
        key = (int(edge_index[1, e2]), tuple(int(v) for v in cell_shift[e2]))
        edge_group[e2] = group_key.setdefault(key, len(group_key))

    packed_targets = {}
    for k, rows in targets.items():
        tail_shape = rows[0].shape[1:]
        total = N if k in _NODE_FIELDS else E
        arr = np.zeros((total, *tail_shape), dtype)
        arr[: sum(r.shape[0] for r in rows)] = np.concatenate(rows, axis=0)
        packed_targets[k] = jnp.asarray(arr)

    return Graph(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        node_mask=jnp.asarray(node_mask),
        batch=jnp.asarray(batch),
        edge_index=jnp.asarray(edge_index),
        edge_mask=jnp.asarray(edge_mask),
        nbr_shift=jnp.asarray(nbr_shift),
        cell_shift=jnp.asarray(cell_shift),
        inv_edge_idx=jnp.asarray(inv_edge),
        cell=jnp.asarray(cell),
        node_counts=jnp.asarray(node_counts),
        edge_counts=jnp.asarray(edge_counts),
        doping_charge=jnp.asarray(doping),
        spin_vec=jnp.asarray(spin_vec) if has_spin else None,
        spin_length=jnp.asarray(spin_length) if has_spin else None,
        edge_group_tar=jnp.asarray(edge_group),
        **packed_targets,
    )
