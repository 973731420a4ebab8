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


def _bct(a, c):
    return np.array([[-a / 2, a / 2, c / 2], [a / 2, -a / 2, c / 2],
                     [a / 2, a / 2, -c / 2]])


def _orcf(a, b, c):
    return np.array([[0, b / 2, c / 2], [a / 2, 0, c / 2], [a / 2, b / 2, 0]])


def _orci(a, b, c):
    return np.array([[-a / 2, b / 2, c / 2], [a / 2, -b / 2, c / 2],
                     [a / 2, b / 2, -c / 2]])


def _orcc(a, b, c):
    return np.array([[a / 2, -b / 2, 0], [a / 2, b / 2, 0], [0, 0, c]])


def _rhl(a, alpha_deg):
    g = np.cos(np.radians(alpha_deg))
    M = np.full((3, 3), g)
    np.fill_diagonal(M, 1.0)
    return np.linalg.cholesky(M) * a


def _mcl(a, b, c, alpha_deg):
    ca, sa = np.cos(np.radians(alpha_deg)), np.sin(np.radians(alpha_deg))
    return np.array([[a, 0, 0], [0, b, 0], [0, c * ca, c * sa]])


def test_full_bravais_classification():
    """Setyawan-Curtarolo classification over every covered lattice family
    (VERDICT: no silent GEN fallback on standard lattices; reference behavior
    via pymatgen KPathSeek, hamgnn_output.py:3672-3726)."""
    cases = {
        "CUB": np.eye(3) * 3.0,
        "TET": np.diag([3.0, 3.0, 5.0]),
        "ORC": np.diag([3.0, 4.0, 5.0]),
        "BCT1": _bct(4.0, 3.0),
        "BCT2": _bct(3.0, 5.0),
        "ORCF1": _orcf(3.0, 4.0, 5.0),
        "ORCF2": _orcf(4.0, 5.0, 6.0),
        "ORCI": _orci(3.0, 4.0, 5.0),
        "ORCC": _orcc(3.0, 4.0, 5.0),
        "RHL1": _rhl(3.0, 70.0),
        "RHL2": _rhl(3.0, 110.0),
        "MCL": _mcl(3.0, 4.0, 5.0, 80.0),
        "TRI": np.array([[3, 0, 0], [0.4, 4, 0], [0.7, 0.9, 5.0]]),
    }
    for kind, cell in cases.items():
        assert classify_bravais(cell) == kind, kind
        nodes, labels = auto_k_path(cell)
        assert len(nodes) == len(labels) >= 4
        assert np.isfinite(np.asarray(nodes)).all(), kind


def test_classification_is_permutation_invariant():
    """Row-permuted cells classify identically and the emitted path is
    congruent (same node distances from Gamma and segment lengths): the
    k-point components are co-permuted with the basis, so the physical path
    is the same up to a point-group operation of the lattice."""
    for cell in [np.diag([3.0, 3.0, 5.0]), _mcl(3.0, 4.0, 5.0, 80.0),
                 _orcc(3.0, 4.0, 5.0), _bct(3.0, 5.0)]:
        base_kind = classify_bravais(cell)
        nodes, _ = auto_k_path(cell)
        cart = np.asarray(nodes) @ np.linalg.inv(cell).T
        norms = np.linalg.norm(cart, axis=1)
        segs = np.linalg.norm(np.diff(cart, axis=0), axis=1)
        for perm in ([1, 2, 0], [2, 0, 1], [1, 0, 2]):
            pcell = cell[perm]
            assert classify_bravais(pcell) == base_kind, (base_kind, perm)
            pnodes, _ = auto_k_path(pcell)
            pcart = np.asarray(pnodes) @ np.linalg.inv(pcell).T
            np.testing.assert_allclose(
                np.linalg.norm(pcart, axis=1), norms, atol=1e-8,
                err_msg=f"{base_kind} {perm}")
            np.testing.assert_allclose(
                np.linalg.norm(np.diff(pcart, axis=0), axis=1), segs,
                atol=1e-8, err_msg=f"{base_kind} {perm}")


def test_mcl_negative_cosine_canonicalized():
    cell = _mcl(3.0, 4.0, 5.0, 100.0)  # alpha > 90: must flip to S-C alpha<90
    assert classify_bravais(cell) == "MCL"
    nodes, _ = auto_k_path(cell)
    assert np.isfinite(np.asarray(nodes)).all()


def test_gen_fallback_warns():
    """MCLC-like primitive (two equal lengths, base-centered monoclinic) falls
    back to GEN with an explicit warning, never silently."""
    import warnings

    a, b, c, al = 3.0, 4.0, 5.0, 80.0
    ca, sa = np.cos(np.radians(al)), np.sin(np.radians(al))
    # C-centered monoclinic primitive: (a/2, b/2, 0), (-a/2, b/2, 0), c-axis
    cell = np.array([[a / 2, b / 2, 0], [-a / 2, b / 2, 0],
                     [0, c * ca, c * sa]])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto_k_path(cell)
    assert any("generic path" in str(x.message) for x in w)


def test_band_window_avoids_pad_states():
    """The band window must never slide into the _PAD_ENERGY pad states: a
    small crystal whose half-filling index sits near the top of its physical
    spectrum gets a window clipped inside the valid-orbital count."""
    import jax.numpy as jnp

    from hamgnn_tpu.data.graph import pad_and_batch
    from hamgnn_tpu.models.basis import get_basis_set
    from hamgnn_tpu.physics.band import _PAD_ENERGY, band_energies_batched

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from util_fixtures import add_random_hamiltonian_targets, make_crystal

    rng = np.random.default_rng(4)
    c = make_crystal(rng, n_atoms=2, species=(1,))   # H: 5 of 14 orbitals valid
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], bucket_multiple=8)
    basis = get_basis_set("openmx", 14)
    k = jnp.zeros((1, 2, 3), jnp.float32)
    # window wider than the physical spectrum margin: 2 atoms x 5 valid
    # orbitals = 10 physical states; request 2w = 12 > 10 -> clip to start 0
    band, wfn, gap = band_energies_batched(
        graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k, basis,
        num_bands=4)
    band = np.asarray(band)
    # physical states only: nothing near the pad energy except when the
    # window is inevitably wider than the spectrum (2w=8 <= 10 here: none)
    assert np.abs(band).max() < _PAD_ENERGY / 2
