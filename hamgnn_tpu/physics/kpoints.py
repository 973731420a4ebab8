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
        if isinstance(k_path_spec, str) and k_path_spec.lower() == "auto":
            nodes, _ = auto_k_path(lat)
            out.append(k_path_cartesian(nodes, num_k, lat))
        elif isinstance(k_path_spec, (list, tuple)) and len(k_path_spec) >= 2:
            out.append(k_path_cartesian(k_path_spec, num_k, lat))
        else:
            out.append(random_k_cartesian(rng, num_k, lat))
    return np.stack(out).astype(np.float32)


# ---------------------------------------------------------------------------
# Automatic high-symmetry paths (reference: pymatgen KPathSeek called from
# hamgnn_output.py:3672-3726 for band_num_control/k_path 'auto').  No
# spglib/pymatgen in this environment, so the lattice is classified from the
# primitive-cell metric (lengths + angles, tolerance-based) and mapped to the
# standard Setyawan-Curtarolo path for that Bravais type.  For the simple
# lattices (cubic P/F/I, tetragonal, orthorhombic, hexagonal) these coincide
# with the seekpath/KPathSeek choices used by the reference.
# ---------------------------------------------------------------------------

_SC_POINTS = {
    "CUB": {"G": (0, 0, 0), "X": (0, 0.5, 0), "M": (0.5, 0.5, 0),
            "R": (0.5, 0.5, 0.5)},
    "FCC": {"G": (0, 0, 0), "X": (0.5, 0, 0.5), "W": (0.5, 0.25, 0.75),
            "K": (0.375, 0.375, 0.75), "L": (0.5, 0.5, 0.5),
            "U": (0.625, 0.25, 0.625)},
    "BCC": {"G": (0, 0, 0), "H": (0.5, -0.5, 0.5), "P": (0.25, 0.25, 0.25),
            "N": (0, 0, 0.5)},
    "TET": {"G": (0, 0, 0), "X": (0, 0.5, 0), "M": (0.5, 0.5, 0),
            "Z": (0, 0, 0.5), "R": (0, 0.5, 0.5), "A": (0.5, 0.5, 0.5)},
    "ORC": {"G": (0, 0, 0), "X": (0.5, 0, 0), "S": (0.5, 0.5, 0),
            "Y": (0, 0.5, 0), "Z": (0, 0, 0.5), "U": (0.5, 0, 0.5),
            "R": (0.5, 0.5, 0.5), "T": (0, 0.5, 0.5)},
    "HEX": {"G": (0, 0, 0), "M": (0.5, 0, 0), "K": (1 / 3, 1 / 3, 0),
            "A": (0, 0, 0.5), "L": (0.5, 0, 0.5), "H": (1 / 3, 1 / 3, 0.5)},
    "RHL": {"G": (0, 0, 0), "L": (0.5, 0, 0), "F": (0.5, 0.5, 0),
            "Z": (0.5, 0.5, 0.5)},
    "GEN": {"G": (0, 0, 0), "X": (0.5, 0, 0), "Y": (0, 0.5, 0),
            "Z": (0, 0, 0.5), "R": (0.5, 0.5, 0.5)},
}

_SC_PATHS = {
    "CUB": ["G", "X", "M", "G", "R", "X"],
    "FCC": ["G", "X", "W", "K", "G", "L", "U", "W", "L", "K"],
    "BCC": ["G", "H", "N", "G", "P", "H"],
    "TET": ["G", "X", "M", "G", "Z", "R", "A", "Z"],
    "ORC": ["G", "X", "S", "Y", "G", "Z", "U", "R", "T", "Z"],
    "HEX": ["G", "M", "K", "G", "A", "L", "H", "A"],
    "RHL": ["G", "L", "F", "G", "Z"],
    "GEN": ["G", "X", "G", "Y", "G", "Z", "R", "G"],
}


def classify_bravais(cell: np.ndarray, tol: float = 1e-3) -> str:
    """Classify a *primitive* cell by its metric (lengths a,b,c and cosines).

    Recognized: CUB (simple cubic), FCC/BCC primitive vectors, TET, ORC, HEX,
    RHL; anything else falls back to GEN (monoclinic/triclinic generic path).
    """
    cell = np.asarray(cell, float).reshape(3, 3)
    lengths = np.linalg.norm(cell, axis=1)
    a, b, c = lengths
    cosa = float(cell[1] @ cell[2] / (b * c))   # alpha between b, c
    cosb = float(cell[0] @ cell[2] / (a * c))
    cosg = float(cell[0] @ cell[1] / (a * b))
    cos = np.array([cosa, cosb, cosg])

    def eq(x, y):
        return abs(x - y) < tol * max(abs(x), abs(y), 1.0)

    all_len_eq = eq(a, b) and eq(b, c)
    right = np.abs(cos) < tol
    if all_len_eq:
        if right.all():
            return "CUB"
        if np.all(np.abs(cos - 0.5) < tol):
            return "FCC"
        if np.all(np.abs(cos + 1 / 3) < tol):
            return "BCC"
        if eq(cos[0], cos[1]) and eq(cos[1], cos[2]):
            return "RHL"
    # hexagonal: two equal axes with 120 (or 60) between them, third normal
    for k in range(3):                  # k = index of the unique (c) axis
        i, j = [x for x in range(3) if x != k]
        if (eq(lengths[i], lengths[j]) and abs(cos[i]) < tol
                and abs(cos[j]) < tol
                and (abs(cos[k] + 0.5) < tol or abs(cos[k] - 0.5) < tol)):
            return "HEX"
    if right.all():
        if eq(a, b) or eq(b, c) or eq(a, c):
            return "TET"
        return "ORC"
    return "GEN"


def auto_k_path(cell: np.ndarray, tol: float = 1e-3
                ) -> Tuple[List[List[float]], List[str]]:
    """(nodes, labels) of the automatic high-symmetry path for ``cell``."""
    kind = classify_bravais(cell, tol)
    pts = _SC_POINTS[kind]
    path = _SC_PATHS[kind]
    nodes = [list(pts[p]) for p in path]
    labels = ["$\\Gamma$" if p == "G" else p for p in path]
    return nodes, labels
