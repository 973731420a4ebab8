"""Spin-constrained Heisenberg terms: vectorization vs loop-reference, head smoke.

The brute-force reference below re-implements the torch loop semantics
(hamgnn_output.py:3219-3601) in plain numpy; the vectorized segment-sum version
must match it exactly on small crystals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.spin import HamGNNMagneticOut, heisenberg_terms

from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+4x2e+2x2o"
SH = "0e + 1o + 2e"


def loop_reference(c, J_on, J_off, w_on, w_off, spin, magnetic, soc, collinear, nao):
    """Direct transcription of the reference's loop semantics (numpy)."""
    SIG = np.zeros((3, 2, 2), complex)
    SIG[0] = [[0, 1], [1, 0]]
    SIG[1] = [[0, -1j], [1j, 0]]
    SIG[2] = [[1, 0], [0, -1]]
    src, dst = c["edge_index"]
    E = src.shape[0]
    N = len(c["z"])
    shifts = c["cell_shift"]
    dtypec = float if collinear else complex
    H_on = np.zeros((N, 2, nao, 2, nao), dtypec)
    H_off = np.zeros((E, 2, nao, 2, nao), dtypec)

    # edge lookups
    edges_src = {a: [e for e in range(E) if src[e] == a] for a in range(N)}
    edges_tar_shift = {}
    for e in range(E):
        edges_tar_shift.setdefault((dst[e], tuple(shifts[e])), []).append(e)

    def C_on(J, s):  # full sigma.s or both orders for rank2
        if collinear:
            return np.einsum("ij,op->oipj", J, np.real(SIG[2]) * s[2])
        if soc:
            return (np.einsum("ijkl,kop,l->oipj", J, SIG, s)
                    + np.einsum("ijkl,lop,k->oipj", J, SIG, s))
        return np.einsum("ij,kop,k->oipj", J, SIG, s)

    def C_dir(J, s, order):
        if collinear:
            return np.einsum("ij,op->oipj", J, np.real(SIG[2]) * s[2])
        if soc:
            sub = "ijkl,kop,l->oipj" if order == "kl" else "ijkl,lop,k->oipj"
            return np.einsum(sub, J, SIG, s)
        return np.einsum("ij,kop,k->oipj", J, SIG, s)

    # onsite magnetic term
    for a in range(N):
        if magnetic[a]:
            H_on[a] += C_on(J_on[a], spin[a]) * w_on[a][None, :, None, :]

    # J_on distributed over incident edges
    for a in range(N):
        if magnetic[a]:
            zs = edges_tar_shift.get((a, (0, 0, 0)), [])
            for e in list(edges_src[a]) + zs:
                H_off[e] += C_on(J_on[a], spin[a]) * w_off[e][None, :, None, :]

    # edge loop
    for e in range(E):
        s_, t_ = src[e], dst[e]
        if magnetic[t_]:
            H_on[s_] += C_dir(J_off[e], spin[t_], "kl") * w_on[s_][None, :, None, :]
            for e2 in edges_src[s_]:
                H_off[e2] += C_dir(J_off[e], spin[t_], "kl") * w_off[e2][None, :, None, :]
        if magnetic[s_]:
            for e2 in edges_tar_shift[(t_, tuple(shifts[e]))]:
                H_off[e2] += C_dir(J_off[e], spin[s_], "lk") * w_off[e2][None, :, None, :]
            if tuple(shifts[e]) == (0, 0, 0):
                H_on[t_] += C_dir(J_off[e], spin[s_], "lk") * w_on[t_][None, :, None, :]
    return H_on, H_off


@pytest.mark.parametrize("soc,collinear", [(True, False), (False, False), (False, True)])
def test_heisenberg_matches_loop_reference(soc, collinear):
    rng = np.random.default_rng(0)
    nao = 5
    c = make_crystal(rng, n_atoms=3, species=(6, 14), cutoff=3.5)
    graph = pad_and_batch([c], bucket_multiple=8)
    N, E = graph.num_nodes, graph.num_edges
    n_real, e_real = len(c["z"]), c["edge_index"].shape[1]

    if soc:
        J = rng.normal(size=(N, nao, nao, 3, 3)).astype(np.float32)
        J_off = rng.normal(size=(E, nao, nao, 3, 3)).astype(np.float32)
    else:
        J = rng.normal(size=(N, nao, nao)).astype(np.float32)
        J_off = rng.normal(size=(E, nao, nao)).astype(np.float32)
    w_on = rng.normal(size=(N, nao, nao)).astype(np.float32)
    w_off = rng.normal(size=(E, nao, nao)).astype(np.float32)
    spin = rng.normal(size=(N, 3)).astype(np.float32)
    magnetic = np.zeros(N, np.float32)
    magnetic[:n_real] = (rng.random(n_real) > 0.3).astype(np.float32)

    h_on, h_off = jax.jit(
        lambda: heisenberg_terms(graph, J, J_off, w_on, w_off, spin, magnetic,
                                 soc=soc, collinear=collinear))()
    h_on = np.asarray(h_on)[:n_real]
    h_off = np.asarray(h_off)[:e_real]

    ref_on, ref_off = loop_reference(
        c, J[:n_real], J_off[:e_real], w_on[:n_real], w_off[:e_real],
        spin[:n_real], magnetic[:n_real], soc, collinear, nao)
    np.testing.assert_allclose(h_on, ref_on, atol=2e-4)
    np.testing.assert_allclose(h_off, ref_off, atol=2e-4)


class TestMagneticHead:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(5)
        c = make_crystal(rng, n_atoms=3, species=(6, 14))
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        n, e = len(c["z"]), c["edge_index"].shape[1]
        c["spin_vec"] = rng.normal(size=(n, 3))
        c["spin_length"] = np.linalg.norm(c["spin_vec"], axis=-1)
        big = (2 * 14) ** 2
        c["iHon"] = np.zeros((n, big))
        c["iHoff"] = np.zeros((e, big))
        graph = pad_and_batch([c], bucket_multiple=8)
        rep = HamGNNConvE3(num_types=20, irreps_edge_sh=SH,
                           irreps_node_features=FEAT, num_layers=1,
                           num_radial=8, cutoff=4.0, radial_mlp=(16, 16))
        p = rep.init(jax.random.PRNGKey(0), graph)
        feats = rep.apply(p, graph)
        return graph, feats

    @pytest.mark.parametrize("soc,collinear", [(True, False), (False, False),
                                               (False, True)])
    def test_forward(self, setup, soc, collinear):
        graph, feats = setup
        head = HamGNNMagneticOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", soc_switch=soc, collinear_spin=collinear,
            add_H0=False)
        params = head.init(jax.random.PRNGKey(1), graph, feats)
        res = head.apply(params, graph, feats)
        if collinear:
            assert res["hamiltonian_on"].shape[1:] == (2, 196)
            assert np.isfinite(np.asarray(res["hamiltonian_on"])).all()
        else:
            big = (2 * 14) ** 2
            assert res["hamiltonian_real_on"].shape[1] == big
            assert np.isfinite(np.asarray(res["hamiltonian_real_on"])).all()
            assert np.isfinite(np.asarray(res["hamiltonian_imag_on"])).all()

    @pytest.mark.parametrize("soc,collinear", [(True, False), (False, False),
                                               (False, True)])
    def test_unit_weights_carry_orbital_mask(self, setup, soc, collinear):
        """With use_learned_weight=False the Heisenberg term must be zero on
        invalid-orbital entries: the reference's weights are always passed
        through apply_orbital_masks_to_hamiltonians (:3248) before the
        Heisenberg contractions.  Unmasked unit weights put aggregated-J
        weight on entries the (masked) targets zero out — an irreducible
        training floor (found as an ~8e-4 Ha plateau in the collinear
        proof)."""
        graph, feats = setup
        head = HamGNNMagneticOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", soc_switch=soc, collinear_spin=collinear,
            use_learned_weight=False, add_H0=False, symmetrize=False)
        params = head.init(jax.random.PRNGKey(2), graph, feats)
        res = head.apply(params, graph, feats)
        if collinear:
            h = np.asarray(res["hamiltonian_on"])
            m = np.asarray(res["mask_on"])
            assert np.abs(h * (1 - m)).max() == 0.0
            h2 = np.asarray(res["hamiltonian_off"])
            m2 = np.asarray(res["mask_off"])
            assert np.abs(h2 * (1 - m2)).max() == 0.0
        else:
            for key, mkey in (("hamiltonian_real_on", "mask_on"),
                              ("hamiltonian_imag_on", "mask_on"),
                              ("hamiltonian_real_off", "mask_off"),
                              ("hamiltonian_imag_off", "mask_off")):
                h = np.asarray(res[key])
                m = np.asarray(res[mkey])
                assert np.abs(h * (1 - m)).max() == 0.0, key


class TestCollinearBand:
    def test_collinear_band_branch(self):
        """Per-spin-channel band solve (reference hamgnn_output.py:3727-3767):
        up/down channels against the spin-independent reference overlap,
        stacked on the crystal axis; H_sym from the last channel."""
        rng = np.random.default_rng(7)
        c = make_crystal(rng, n_atoms=3, species=(6, 14))
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        n, e = len(c["z"]), c["edge_index"].shape[1]
        # collinear targets: (rows, 2, nao^2) spin channel stacks
        c["Hon"] = np.stack([c["Hon"], c["Hon"] * 1.01], axis=1)
        c["Hoff"] = np.stack([c["Hoff"], c["Hoff"] * 1.01], axis=1)
        c["spin_vec"] = rng.normal(size=(n, 3))
        c["spin_length"] = np.linalg.norm(c["spin_vec"], axis=-1)
        graph = pad_and_batch([c], bucket_multiple=8)
        rep = HamGNNConvE3(num_types=20, irreps_edge_sh=SH,
                           irreps_node_features=FEAT, num_layers=1,
                           num_radial=8, cutoff=4.0, radial_mlp=(16, 16))
        p = rep.init(jax.random.PRNGKey(0), graph)
        feats = rep.apply(p, graph)

        from hamgnn_tpu.physics.kpoints import random_k_cartesian
        nk, w = 2, 2
        k_vecs = jnp.asarray(np.asarray(
            random_k_cartesian(rng, nk, np.asarray(c["cell"][0])),
            np.float32)[None])

        head = HamGNNMagneticOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", soc_switch=False, collinear_spin=True,
            add_H0=False, calculate_band_energy=True, num_k=nk,
            band_num_control=w)
        params = head.init(jax.random.PRNGKey(1), graph, feats, k_vecs=k_vecs)
        res = head.apply(params, graph, feats, k_vecs=k_vecs)

        assert res["band_energy_up"].shape == (1, nk, 2 * w)
        assert res["band_energy_down"].shape == (1, nk, 2 * w)
        assert res["band_energy"].shape == (2, nk, 2 * w)
        assert res["band_energy_ref"].shape == (2, nk, 2 * w)
        assert res["band_gap"].shape == (2,)
        assert "H_sym" in res
        for k in ("band_energy", "band_energy_ref", "band_gap"):
            assert np.isfinite(np.asarray(res[k])).all()

        # reference targets match a direct per-channel solve
        from hamgnn_tpu.physics.band import band_energies_batched
        from hamgnn_tpu.models.basis import get_basis_set
        basis = get_basis_set("openmx", 14)
        up_r = band_energies_batched(
            graph, graph.Hon[:, 0, :], graph.Hoff[:, 0, :], graph.Son,
            graph.Soff, k_vecs, basis, num_bands=w)
        np.testing.assert_allclose(np.asarray(res["band_energy_ref"][0]),
                                   np.asarray(up_r[0][0]), atol=1e-5)

        # the secondary band loss path works end to end
        from hamgnn_tpu.models.model import compute_losses
        losses = [{"metric": "mae", "prediction": "band_energy",
                   "target": "band_energy", "loss_weight": 0.01}]
        total, logs = compute_losses(res, graph, losses)
        assert np.isfinite(float(total))


def test_npz_roundtrip_preserves_spin_fields(tmp_path):
    """Regression: spin_vec/spin_length must survive graph_data.npz save/load
    (they were silently dropped by the dataset field filter, which zeroed the
    magnetic mask and killed the Heisenberg pathway at training time)."""
    from hamgnn_tpu.data.dataset import load_graph_npz, save_graph_npz

    rng = np.random.default_rng(3)
    c = make_crystal(rng, n_atoms=3, species=(6, 14))
    c["spin_vec"] = rng.normal(size=(3, 3))
    c["spin_length"] = np.linalg.norm(c["spin_vec"], axis=-1)
    path = str(tmp_path / "graph_data.npz")
    save_graph_npz(path, [c])
    back = load_graph_npz(path)[0]
    np.testing.assert_allclose(back["spin_vec"], c["spin_vec"])
    np.testing.assert_allclose(back["spin_length"], c["spin_length"])
