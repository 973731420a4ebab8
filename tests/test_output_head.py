"""Output head tests: merge-matrix algebra, Hermiticity, masks, equivariance,
and band-structure parity against a straightforward numpy reference solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.wigner import irreps_D, wigner_D
from hamgnn_tpu.models.basis import get_basis_set, hamiltonian_irreps
from hamgnn_tpu.models.output import (
    HamGNNPlusPlusOut,
    _decompose_matrix,
    _merge_reorder_matrix,
)
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.physics.band import band_energies_batched
from hamgnn_tpu.physics.kpoints import random_k_cartesian

from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+4x2e+2x2o+1x3o+1x3e+1x4e"
SH = "0e + 1o + 2e + 3o + 4e"


def rand_rot(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def dft_order_D(basis, R):
    """Representation matrix of R on DFT-ordered orbitals: P D_internal P^T."""
    blocks = []
    for _, ir in basis.orbital_irreps:
        blocks.append(wigner_D(ir.l, R))
    n = basis.nao_max
    D = np.zeros((n, n))
    ofs = 0
    for b in blocks:
        d = b.shape[0]
        D[ofs : ofs + d, ofs : ofs + d] = b
        ofs += d
    if basis.index_change is not None:
        D = D[basis.index_change[:, None], basis.index_change[None, :]]
    if basis.minus_index is not None:
        s = np.ones(n)
        s[basis.minus_index] = -1
        D = D * s[:, None] * s[None, :]
    return D


class TestMergeMatrix:
    @pytest.mark.parametrize("ham_type,nao", [("openmx", 14), ("openmx", 26),
                                              ("siesta", 13), ("abacus", 27)])
    def test_orthogonal(self, ham_type, nao):
        M = _merge_reorder_matrix(ham_type, nao)
        assert M.shape == (nao * nao, nao * nao)
        np.testing.assert_allclose(M @ M.T, np.eye(nao * nao), atol=1e-10)

    def test_roundtrip(self):
        M = _merge_reorder_matrix("openmx", 14)
        Minv = _decompose_matrix("openmx", 14)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, 14 * 14))
        np.testing.assert_allclose((x @ Minv) @ M, x, atol=1e-10)

    def test_merge_equivariance(self):
        """components rotated by ham-irreps D -> block conjugated by orbital D."""
        basis = get_basis_set("openmx", 14)
        irr = hamiltonian_irreps(basis)
        M = _merge_reorder_matrix("openmx", 14)
        rng = np.random.default_rng(1)
        R = rand_rot(rng)
        Dh = irreps_D(irr, R)
        Do = dft_order_D(basis, R)
        x = rng.normal(size=(3, irr.dim))
        blk = (x @ M).reshape(3, 14, 14)
        blk_rot = ((x @ Dh.T) @ M).reshape(3, 14, 14)
        want = np.einsum("pi,bij,qj->bpq", Do, blk, Do)
        np.testing.assert_allclose(blk_rot, want, atol=1e-8)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    crystals = [
        add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=2, species=(1, 6))),
        add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3, species=(6, 14))),
    ]
    graph = pad_and_batch(crystals, bucket_multiple=8)
    rep = HamGNNConvE3(
        num_types=20, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=1, num_radial=8, cutoff=4.0, radial_mlp=(16, 16))
    out = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14, ham_type="openmx",
        add_H0=True, zero_point_shift=False)
    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, graph)
    feats = rep.apply(p_rep, graph)
    p_out = out.init(key, graph, feats)
    res = out.apply(p_out, graph, feats)
    return graph, rep, out, p_rep, p_out, feats, res


class TestOutputHead:
    def test_shapes_and_finite(self, setup):
        graph, *_, res = setup[0], *setup[1:]
        res = setup[6]
        graph = setup[0]
        assert res["hamiltonian_on"].shape == (graph.num_nodes, 196)
        assert res["hamiltonian_off"].shape == (graph.num_edges, 196)
        assert np.isfinite(np.asarray(res["hamiltonian_on"])).all()
        assert float(res["sparsity_ratio"]) > 1.0

    def test_hermiticity(self, setup):
        graph, res = setup[0], setup[6]
        h_on = np.asarray(res["hamiltonian_on"]).reshape(-1, 14, 14)
        np.testing.assert_allclose(h_on, h_on.transpose(0, 2, 1), atol=1e-5)
        h_off = np.asarray(res["hamiltonian_off"]).reshape(-1, 14, 14)
        inv = np.asarray(graph.inv_edge_idx)
        mask = np.asarray(graph.edge_mask)
        np.testing.assert_allclose(
            h_off[mask], h_off[inv][mask].transpose(0, 2, 1), atol=1e-5)

    def test_orbital_mask(self, setup):
        graph, res = setup[0], setup[6]
        basis = get_basis_set("openmx", 14)
        table = basis.orbital_mask_table
        h_on = np.asarray(res["hamiltonian_on"]).reshape(-1, 14, 14)
        z = np.asarray(graph.z)
        for i in range(h_on.shape[0]):
            valid = table[z[i]] > 0
            assert np.abs(h_on[i][~valid][:, :]).max() < 1e-6
            assert np.abs(h_on[i][:, ~valid]).max() < 1e-6

    def test_full_pipeline_equivariance(self, setup):
        graph, rep, out, p_rep, p_out, feats, res = setup
        rng = np.random.default_rng(3)
        R = rand_rot(rng)
        Rf = R.astype(np.float32)
        rot_graph = graph.replace(
            pos=graph.pos @ Rf.T, nbr_shift=graph.nbr_shift @ Rf.T,
            cell=graph.cell @ Rf.T)
        feats_rot = rep.apply(p_rep, rot_graph)
        res_rot = out.apply(p_out, rot_graph, feats_rot)

        basis = get_basis_set("openmx", 14)
        Do = dft_order_D(basis, R)
        h = np.asarray(res["hamiltonian_on"]).reshape(-1, 14, 14)
        h_rot = np.asarray(res_rot["hamiltonian_on"]).reshape(-1, 14, 14)
        want = np.einsum("pi,bij,qj->bpq", Do, h, Do)
        np.testing.assert_allclose(h_rot, want, atol=5e-4)


class TestBandStructure:
    def test_matches_numpy_reference(self):
        """Padded batched TPU solver == per-crystal compact scipy solve."""
        rng = np.random.default_rng(11)
        c = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3, species=(6, 14)))
        # make overlap strongly PD: S_off small
        graph = pad_and_batch([c], bucket_multiple=8)
        basis = get_basis_set("openmx", 14)
        nk = 4
        k_cart = random_k_cartesian(rng, nk, np.asarray(c["cell"][0]))
        k_vecs = np.asarray(k_cart, np.float32)[None]

        num_bands = 3
        band, wfn, gap = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff,
            k_vecs, basis, num_bands=num_bands, max_atoms=3)
        band = np.asarray(band)

        # numpy reference (compact, follows the torch implementation)
        z = c["z"]
        nao = 14
        n = len(z)
        table = basis.orbital_mask_table
        valid = np.concatenate([table[zz] > 0 for zz in z])
        Hon = c["Hon"].reshape(n, nao, nao)
        Hoff = c["Hoff"].reshape(-1, nao, nao)
        Son = c["Son"].reshape(n, nao, nao)
        Soff = c["Soff"].reshape(-1, nao, nao)
        src, dst = c["edge_index"]
        evs = []
        import scipy.linalg

        for k in range(nk):
            HK = np.zeros((n, n, nao, nao), complex)
            SK = np.zeros((n, n, nao, nao), complex)
            for i in range(n):
                HK[i, i] += Hon[i]
                SK[i, i] += Son[i]
            for e in range(src.shape[0]):
                ph = np.exp(2j * np.pi * np.dot(k_cart[k], c["nbr_shift"][e]))
                HK[src[e], dst[e]] += ph * Hoff[e]
                SK[src[e], dst[e]] += ph * Soff[e]
            HKf = HK.transpose(0, 2, 1, 3).reshape(n * nao, n * nao)[valid][:, valid]
            SKf = SK.transpose(0, 2, 1, 3).reshape(n * nao, n * nao)[valid][:, valid]
            ev = scipy.linalg.eigh(HKf, SKf, eigvals_only=True)
            evs.append(ev)
        evs = np.stack(evs)  # (nk, norb)

        half = int(np.ceil(sum(basis.num_valence[int(zz)] for zz in z) / 2))
        start = max(0, half - num_bands)
        want = evs[:, start : start + 2 * num_bands]
        np.testing.assert_allclose(band[0], want, atol=2e-3, rtol=1e-4)


class TestParity:
    def test_full_pipeline_inversion(self, setup):
        """Under spatial inversion, blocks conjugate by the parity-signed
        orbital representation: D = diag((-1)^l per orbital)."""
        graph, rep, out, p_rep, p_out, feats, res = setup
        inv_graph = graph.replace(pos=-graph.pos, nbr_shift=-graph.nbr_shift,
                                  cell=-graph.cell)
        feats_inv = rep.apply(p_rep, inv_graph)
        res_inv = out.apply(p_out, inv_graph, feats_inv)

        basis = get_basis_set("openmx", 14)
        signs = []
        for _, ir in basis.orbital_irreps:
            signs += [(-1.0) ** ir.l] * ir.dim
        signs = np.asarray(signs)
        if basis.index_change is not None:
            signs = signs[basis.index_change]
        P = signs[:, None] * signs[None, :]

        h = np.asarray(res["hamiltonian_on"]).reshape(-1, 14, 14)
        h_inv = np.asarray(res_inv["hamiltonian_on"]).reshape(-1, 14, 14)
        np.testing.assert_allclose(h_inv, h * P[None], atol=5e-4)


class TestReciprocalExport:
    def test_hk_sk_export(self):
        rng = np.random.default_rng(21)
        c = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3,
                                                             species=(6, 14)))
        # overlap derivatives
        n, e = len(c["z"]), c["edge_index"].shape[1]
        c["dSon"] = 0.01 * rng.normal(size=(n, 196, 3))
        c["dSoff"] = 0.01 * rng.normal(size=(e, 196, 3))
        graph = pad_and_batch([c], bucket_multiple=8)
        basis = get_basis_set("openmx", 14)
        k_vecs = np.asarray(random_k_cartesian(rng, 3, np.asarray(c["cell"][0])),
                            np.float32)[None]
        out = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k_vecs, basis,
            num_bands=2, max_atoms=3, export_reciprocal=True)
        band, wfn, gap, HK, SK, dSK = out
        norb = 3 * 14
        assert HK.shape == (1, 3, norb, norb)
        assert SK.shape == (1, 3, norb, norb)
        assert dSK.shape == (1, 3, norb, norb, 3)
        # HK Hermitian (after masking + padding)
        hk = np.asarray(HK)[0, 0]
        np.testing.assert_allclose(hk, hk.conj().T, atol=1e-5)


class TestDictBandControl:
    """Per-species dict band_num_control: lowest-N bands + per-crystal mask
    (reference hamgnn_output.py:1736-1742, 1939-1942)."""

    def test_bottom_bands_and_mask(self):
        from hamgnn_tpu.physics.band import band_counts_per_crystal

        rng = np.random.default_rng(31)
        c1 = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3,
                                                              species=(6, 14)))
        c2 = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=2,
                                                              species=(6, 6)))
        graph = pad_and_batch([c1, c2], bucket_multiple=8)
        basis = get_basis_set("openmx", 14)
        nk = 2
        k_vecs = np.stack([
            np.asarray(random_k_cartesian(rng, nk, np.asarray(c["cell"][0])),
                       np.float32)
            for c in (c1, c2)])

        species_counts = ((6, 2), (14, 4))
        counts = np.asarray(band_counts_per_crystal(graph, species_counts))
        expect = [sum({6: 2, 14: 4}[int(z)] for z in c["z"]) for c in (c1, c2)]
        np.testing.assert_array_equal(counts, expect)

        max_bands = 12
        band, wfn, gap, band_mask = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k_vecs, basis,
            num_bands=max_bands, max_atoms=3,
            band_counts=jnp.asarray(counts))
        assert band.shape == (2, nk, max_bands)
        assert band_mask.shape == (2, 1, max_bands)
        np.testing.assert_array_equal(
            np.asarray(band_mask[:, 0]).sum(1), np.minimum(expect, max_bands))
        # bands ascending from the bottom of the spectrum
        b = np.asarray(band)
        assert (np.diff(b, axis=-1) >= -1e-5).all()

        # bottom bands agree with a compact scipy solve for crystal 0
        import scipy.linalg

        z, nao, n = c1["z"], 14, len(c1["z"])
        table = basis.orbital_mask_table
        valid = np.concatenate([table[zz] > 0 for zz in z])
        Hon = c1["Hon"].reshape(n, nao, nao)
        Hoff = c1["Hoff"].reshape(-1, nao, nao)
        Son = c1["Son"].reshape(n, nao, nao)
        Soff = c1["Soff"].reshape(-1, nao, nao)
        src, dst = c1["edge_index"]
        k = k_vecs[0, 0]
        HK = np.zeros((n, n, nao, nao), complex)
        SK = np.zeros((n, n, nao, nao), complex)
        for i in range(n):
            HK[i, i] += Hon[i]
            SK[i, i] += Son[i]
        for e in range(src.shape[0]):
            ph = np.exp(2j * np.pi * np.dot(k, c1["nbr_shift"][e]))
            HK[src[e], dst[e]] += ph * Hoff[e]
            SK[src[e], dst[e]] += ph * Soff[e]
        HKf = HK.transpose(0, 2, 1, 3).reshape(n * nao, n * nao)[valid][:, valid]
        SKf = SK.transpose(0, 2, 1, 3).reshape(n * nao, n * nao)[valid][:, valid]
        ev = scipy.linalg.eigh(HKf, SKf, eigvals_only=True)
        np.testing.assert_allclose(b[0, 0], ev[:max_bands], atol=2e-3, rtol=1e-4)

    def test_cli_band_control_kwargs(self):
        from hamgnn_tpu.cli import _band_control_kwargs
        import pytest as _pytest

        class D(dict):
            def get(self, k, d=None):
                return dict.get(self, k, d)

        assert _band_control_kwargs(D(band_num_control=6)) == {"band_num_control": 6}
        kw = _band_control_kwargs(D(band_num_control={"6": 2, "14": 4}))
        assert kw == {"band_num_control": 32,
                      "band_species_counts": ((6, 2), (14, 4))}
        # float: warn-and-disable like the reference (hamgnn_output.py:826-830)
        with _pytest.warns(UserWarning):
            kw = _band_control_kwargs(D(band_num_control=0.5))
        assert kw == {"band_num_control": 32}


class TestHSymAndPredictedOverlap:
    def test_h_sym_export(self):
        """H_sym = L^-1 H(k) L^-H (reference symmetrized_hamiltonians,
        hamgnn_output.py:1609-1613): eigenvalues of H_sym equal the bands."""
        rng = np.random.default_rng(31)
        c = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3,
                                                             species=(6, 14)))
        graph = pad_and_batch([c], bucket_multiple=8)
        basis = get_basis_set("openmx", 14)
        k_vecs = np.asarray(random_k_cartesian(rng, 2, np.asarray(c["cell"][0])),
                            np.float32)[None]
        band, wfn, gap, H_sym = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k_vecs, basis,
            num_bands=2, max_atoms=3, export_H_sym=True)
        norb = 3 * 14
        assert H_sym.shape == (1, 2, norb, norb)
        hs = np.asarray(H_sym)[0, 0]
        np.testing.assert_allclose(hs, hs.conj().T, atol=1e-5)
        evs = np.linalg.eigvalsh(hs)
        # the band window is a slice of H_sym's spectrum
        b = np.asarray(band)[0, 0]
        idx = np.searchsorted(evs, b[0] - 1e-4)
        np.testing.assert_allclose(evs[idx : idx + len(b)], b, atol=1e-3)

    def test_predicted_overlap_sk_export(self):
        """ham_only=False export: SK comes from the predicted overlap while
        bands still solve against the reference overlap
        (calculate_band_energies_with_overlap, :1604-1643)."""
        rng = np.random.default_rng(32)
        c = add_random_hamiltonian_targets(rng, make_crystal(rng, n_atoms=3,
                                                             species=(6, 14)))
        graph = pad_and_batch([c], bucket_multiple=8)
        basis = get_basis_set("openmx", 14)
        k_vecs = np.asarray(random_k_cartesian(rng, 2, np.asarray(c["cell"][0])),
                            np.float32)[None]
        # a visibly different "predicted" overlap
        s_on_pred = graph.Son * 1.5
        s_off_pred = graph.Soff * 1.5
        out = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k_vecs, basis,
            num_bands=2, max_atoms=3, export_reciprocal=True,
            sk_export_on=s_on_pred, sk_export_off=s_off_pred)
        band_p, _, _, HK_p, SK_p, *_r = out
        out_ref = band_energies_batched(
            graph, graph.Hon, graph.Hoff, graph.Son, graph.Soff, k_vecs, basis,
            num_bands=2, max_atoms=3, export_reciprocal=True)
        band_r, _, _, HK_r, SK_r, *_r2 = out_ref
        # bands unchanged (solve uses reference S), SK export scaled
        np.testing.assert_allclose(np.asarray(band_p), np.asarray(band_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(HK_p), np.asarray(HK_r), atol=1e-6)
        sk_p = np.asarray(SK_p)[0, 0]
        sk_r = np.asarray(SK_r)[0, 0]
        # off-diagonal (valid) entries scale by exactly 1.5
        mask = np.abs(sk_r) > 1e-8
        np.fill_diagonal(mask, False)
        np.testing.assert_allclose(sk_p[mask], 1.5 * sk_r[mask], rtol=1e-5)

    def test_head_exports_h_sym(self, setup):
        """The plain head exports H_sym on the band path like the reference
        result dict (:3993)."""
        graph, rep, out, p_rep, p_out, feats, res = setup
        import dataclasses

        rng = np.random.default_rng(33)
        head = HamGNNPlusPlusOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", add_H0=False, zero_point_shift=False,
            calculate_band_energy=True, num_k=2, band_num_control=2)
        k_vecs = np.asarray(
            random_k_cartesian(rng, 2, np.asarray(graph.cell[0])),
            np.float32)[None]
        p = head.init(jax.random.PRNGKey(3), graph, feats, k_vecs=jnp.asarray(k_vecs))
        res2 = head.apply(p, graph, feats, k_vecs=jnp.asarray(k_vecs))
        assert "H_sym" in res2
        assert np.isfinite(np.asarray(res2["H_sym"])).all()
        assert "band_energy" in res2

    def test_generic_result_keys_under_losses(self, setup):
        """wavefunction / H_sym (any result-dict key) can sit under a loss
        spec, as in the reference's generic loss loop (Model.py:128-179);
        target-less specs apply the metric to the prediction alone
        (Model.py:161-162)."""
        from hamgnn_tpu.models.model import compute_losses

        graph, rep, out, p_rep, p_out, feats, res = setup
        rng = np.random.default_rng(34)
        head = HamGNNPlusPlusOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", add_H0=False, zero_point_shift=False,
            calculate_band_energy=True, num_k=2, band_num_control=2)
        k_vecs = np.asarray(
            random_k_cartesian(rng, 2, np.asarray(graph.cell[0])),
            np.float32)[None]
        p = head.init(jax.random.PRNGKey(4), graph, feats,
                      k_vecs=jnp.asarray(k_vecs))
        preds = head.apply(p, graph, feats, k_vecs=jnp.asarray(k_vecs))
        assert "wavefunction_ref" in preds and "H_sym_ref" in preds
        specs = [
            {"metric": "mae", "prediction": "H_sym", "target": "H_sym",
             "loss_weight": 1.0},
            {"metric": "mae", "prediction": "wavefunction",
             "target": "wavefunction", "loss_weight": 1.0},
            {"metric": "sum_zero", "prediction": "hamiltonian_off",
             "loss_weight": 0.1},  # target-less regularizer
        ]
        total, logs = compute_losses(preds, graph, specs)
        assert np.isfinite(float(total))
        assert np.isfinite(float(logs["mae_h_sym"]))
        assert np.isfinite(float(logs["mae_wavefunction"]))
        # an unknown key still fails fast with a clear message
        with pytest.raises(KeyError, match="no_such_key"):
            compute_losses(preds, graph, [
                {"metric": "mae", "prediction": "no_such_key",
                 "target": "no_such_key", "loss_weight": 1.0}])


class TestElementValidation:
    def test_unknown_element_raises_with_name(self):
        """Reference parity (hamgnn_output.py:2874-2914): a structure with an
        element missing from basis_def must fail fast, naming the element,
        instead of silently training on zero-masked blocks."""
        import pytest as _pytest

        from hamgnn_tpu.models.basis import (get_basis_set,
                                             validate_elements_in_basis_def)

        basis = get_basis_set("openmx", 14)
        validate_elements_in_basis_def([6, 14], basis)  # covered: no raise
        with _pytest.raises(ValueError, match=r"Au \(Z=79\)"):
            validate_elements_in_basis_def([6, 79], basis)

    def test_cli_dataset_validation(self, tmp_path):
        """prepare_dataset hard-errors on an uncovered element."""
        import numpy as np
        import pytest as _pytest

        from hamgnn_tpu.cli import prepare_dataset
        from hamgnn_tpu.data.dataset import save_graph_npz
        from hamgnn_tpu.train.config import load_config

        from util_fixtures import add_random_hamiltonian_targets, make_crystal

        rng = np.random.default_rng(0)
        c = make_crystal(rng, n_atoms=3, species=(79,))
        c = add_random_hamiltonian_targets(rng, c, nao_max=14)
        save_graph_npz(str(tmp_path / "graph_data.npz"), [c])
        cfg = load_config(overrides={
            "dataset_params": {"graph_data_path": str(tmp_path)},
            "output_nets": {"HamGNN_out": {"ham_type": "openmx",
                                           "nao_max": 14}},
        })
        with _pytest.raises(ValueError, match="Z=79"):
            prepare_dataset(cfg)
