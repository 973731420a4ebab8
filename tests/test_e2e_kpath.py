"""Auto high-symmetry k-path (VERDICT item 6): KPathSeek equivalent.

Cubic + hexagonal (+ fcc/bcc) cells must map to the standard
Setyawan-Curtarolo paths; training-time k generation must consume 'auto'.
"""

import numpy as np

from hamgnn_tpu.physics.kpoints import (
    auto_k_path,
    classify_bravais,
    k_path_cartesian,
    k_vecs_for_graph,
)


def test_cubic_path_is_setyawan_curtarolo():
    cell = 4.0 * np.eye(3)
    assert classify_bravais(cell) == "CUB"
    nodes, labels = auto_k_path(cell)
    assert labels == ["$\\Gamma$", "X", "M", "$\\Gamma$", "R", "X"]
    np.testing.assert_allclose(nodes[1], [0, 0.5, 0])
    np.testing.assert_allclose(nodes[4], [0.5, 0.5, 0.5])


def test_hexagonal_path_is_setyawan_curtarolo():
    a, c = 2.46, 6.7
    cell = np.array([[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0], [0, 0, c]])
    assert classify_bravais(cell) == "HEX"
    nodes, labels = auto_k_path(cell)
    assert labels == ["$\\Gamma$", "M", "K", "$\\Gamma$", "A", "L", "H", "A"]
    np.testing.assert_allclose(nodes[2], [1 / 3, 1 / 3, 0])


def test_fcc_bcc_primitive_cells_classified():
    a = 5.43
    fcc = 0.5 * a * np.array([[0.0, 1, 1], [1, 0, 1], [1, 1, 0]])
    bcc = 0.5 * a * np.array([[-1.0, 1, 1], [1, -1, 1], [1, 1, -1]])
    assert classify_bravais(fcc) == "FCC"
    assert classify_bravais(bcc) == "BCC"
    nodes, labels = auto_k_path(fcc)
    assert labels[:5] == ["$\\Gamma$", "X", "W", "K", "$\\Gamma$"]


def test_k_vecs_for_graph_auto_mode():
    class G:
        cell = np.stack([4.0 * np.eye(3), 4.0 * np.eye(3)])

    ks = k_vecs_for_graph(G(), num_k=12, k_path_spec="auto")
    assert ks.shape == (2, 12, 3)
    # deterministic (not the random fallback): both crystals identical
    np.testing.assert_allclose(ks[0], ks[1])
    # first point is Gamma
    np.testing.assert_allclose(ks[0, 0], 0.0)
