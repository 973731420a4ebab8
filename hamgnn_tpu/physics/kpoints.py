"""k-path generation for band-structure calculations (host-side numpy).

Equivalent of the reference's pythTB-style ``kpoints_generator.k_path``
(/root/reference/hamgnn/physics/kpoints.py:9-215): given high-symmetry nodes in
reduced coordinates and a total point count, distribute points along segments
proportionally to their Cartesian reciprocal-space length.

Returns reduced k-vectors plus the Cartesian transform (reciprocal lattice),
matching how the output net converts k to Cartesian before the phase factors
(hamgnn_output.py:3846-3851: ``k_vec.dot(lat_per_inv)``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def reciprocal_lattice(lat: np.ndarray) -> np.ndarray:
    """Rows are reciprocal vectors WITHOUT the 2*pi factor: inv(lat).T."""
    return np.linalg.inv(lat).T


def k_path(nodes: Sequence[Sequence[float]], nk: int, lat: np.ndarray
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Interpolate a k-path through ``nodes`` (reduced coords).

    Returns (k_vec (nk,3) reduced, k_dist (nk,), k_node (n_nodes,), lat_per_inv).
    """
    nodes = np.asarray(nodes, dtype=float)
    n_nodes = nodes.shape[0]
    lat_per_inv = reciprocal_lattice(np.asarray(lat, dtype=float))
    # metric for distances in reduced coordinates
    k_metric = lat_per_inv @ lat_per_inv.T

    k_node = np.zeros(n_nodes)
    for n in range(1, n_nodes):
        dk = nodes[n] - nodes[n - 1]
        k_node[n] = k_node[n - 1] + float(np.sqrt(dk @ k_metric @ dk))

    node_index = [0]
    for n in range(1, n_nodes - 1):
        frac = k_node[n] / max(k_node[-1], 1e-30)
        node_index.append(int(round(frac * (nk - 1))))
    node_index.append(nk - 1)

    k_dist = np.zeros(nk)
    k_vec = np.zeros((nk, 3))
    k_vec[0] = nodes[0]
    for n in range(1, n_nodes):
        n_i, n_f = node_index[n - 1], node_index[n]
        kd_i, kd_f = k_node[n - 1], k_node[n]
        k_i, k_f = nodes[n - 1], nodes[n]
        for j in range(n_i, n_f + 1):
            frac = (j - n_i) / max(n_f - n_i, 1)
            k_dist[j] = kd_i + frac * (kd_f - kd_i)
            k_vec[j] = k_i + frac * (k_f - k_i)
    return k_vec, k_dist, k_node, lat_per_inv


def k_path_cartesian(nodes, nk: int, lat: np.ndarray) -> np.ndarray:
    """Convenience: reduced path -> Cartesian k (units 1/length, no 2*pi)."""
    k_vec, _, _, lat_per_inv = k_path(nodes, nk, lat)
    return k_vec @ lat_per_inv


def random_k_cartesian(rng, nk: int, lat: np.ndarray) -> np.ndarray:
    """Reference fallback: uniform reduced k in (-1, 1), to Cartesian."""
    k_vec = 2.0 * rng.random((nk, 3)) - 1.0
    return k_vec @ reciprocal_lattice(np.asarray(lat, dtype=float))


def k_vecs_for_graph(graph, num_k: int, k_path_spec=None, rng=None) -> np.ndarray:
    """Per-crystal Cartesian k-point batches (B, num_k, 3) for band training.

    Mirrors the reference's in-forward k generation (hamgnn_output.py:3801-3854):
    a user k-path list is interpolated per crystal; otherwise uniform random
    reduced k in (-1, 1).  Host-side data prep (cells are host arrays).
    """
    rng = rng or np.random.default_rng(0)
    cells = np.asarray(graph.cell)
    out = []
    for b in range(cells.shape[0]):
        lat = cells[b]
        if isinstance(k_path_spec, (list, tuple)) and len(k_path_spec) >= 2:
            out.append(k_path_cartesian(k_path_spec, num_k, lat))
        else:
            out.append(random_k_cartesian(rng, num_k, lat))
    return np.stack(out).astype(np.float32)
