"""SOC spinor band path in training (VERDICT round-1 item 3/4).

The 2*nao complex generalized eigensolve (physics.band.band_energies_soc_batched)
must (a) match an independent dense numpy/scipy spinor solve on genuine
Hermitian SOC targets, and (b) flow gradients through the SOC head's band
energies — the reference's SOC secondary-training branch
(/root/reference/hamgnn/models/hamgnn_output.py:1998-2287).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.basis import get_basis_set
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.soc import HamGNNSOCOut
from hamgnn_tpu.physics.band import band_energies_soc_batched
from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+2x3o+2x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"
NAO = 14


def _soc_crystal(rng, n_atoms=3):
    c = make_crystal(rng, n_atoms=n_atoms, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=NAO)
    n = c["z"].shape[0]
    e = c["edge_index"].shape[1]
    inv = c["inv_edge_idx"]
    basis = get_basis_set("openmx", NAO)
    table = basis.orbital_mask_table
    z = c["z"]
    src, dst = c["edge_index"]

    def tile2(m):  # (n, nao, nao) orbital-pair mask -> (n, 2nao, 2nao)
        m2 = np.concatenate([m, m], axis=1)
        return np.concatenate([m2, m2], axis=2)

    on_mask = tile2(table[z][:, :, None] * table[z][:, None, :])
    off_mask = tile2(table[z[src]][:, :, None] * table[z[dst]][:, None, :])

    # genuine Hermitian spinor targets: Hon = Hon^H, Hoff[inv] = Hoff^H
    B_on = (rng.normal(size=(n, 2 * NAO, 2 * NAO))
            + 1j * rng.normal(size=(n, 2 * NAO, 2 * NAO)))
    Hc_on = 0.5 * (B_on + B_on.conj().transpose(0, 2, 1)) * on_mask
    B_off = 0.1 * (rng.normal(size=(e, 2 * NAO, 2 * NAO))
                   + 1j * rng.normal(size=(e, 2 * NAO, 2 * NAO)))
    Hc_off = 0.5 * (B_off + B_off[inv].conj().transpose(0, 2, 1)) * off_mask

    big = (2 * NAO) ** 2
    c["Hon"] = Hc_on.real.reshape(n, big)
    c["iHon"] = Hc_on.imag.reshape(n, big)
    c["Hoff"] = Hc_off.real.reshape(e, big)
    c["iHoff"] = Hc_off.imag.reshape(e, big)
    c["Hon0"] = np.zeros((n, big))
    c["Hoff0"] = np.zeros((e, big))
    c["iHon0"] = np.zeros((n, big))
    c["iHoff0"] = np.zeros((e, big))
    return c


def _dense_spinor_bands(c, k_cart, basis):
    """Independent reference: dense spinor H(k)/S(k) + scipy eigh."""
    z = np.asarray(c["z"], int)
    n = len(z)
    table = basis.orbital_mask_table
    valid1 = np.concatenate([table[zi] > 0 for zi in z])       # (n*nao,)
    nao = basis.nao_max

    Hc_on = (c["Hon"] + 1j * c["iHon"]).reshape(n, 2 * nao, 2 * nao)
    Hc_off = (c["Hoff"] + 1j * c["iHoff"]).reshape(-1, 2 * nao, 2 * nao)
    S_on = c["Son"].reshape(n, nao, nao)
    S_off = c["Soff"].reshape(-1, nao, nao)
    src, dst = c["edge_index"]
    out = []
    for k in k_cart:
        # spin-sector layout matching the framework: per atom, the 2*nao
        # orbitals are [up(nao) || down(nao)]
        H = np.zeros((n, n, 2 * nao, 2 * nao), complex)
        S = np.zeros((n, n, 2 * nao, 2 * nao), complex)
        for a in range(n):
            H[a, a] += Hc_on[a]
            S[a, a, :nao, :nao] += S_on[a]
            S[a, a, nao:, nao:] += S_on[a]
        for eidx in range(src.shape[0]):
            ph = np.exp(2j * np.pi * np.dot(k, c["nbr_shift"][eidx]))
            H[src[eidx], dst[eidx]] += ph * Hc_off[eidx]
            S[src[eidx], dst[eidx], :nao, :nao] += ph * S_off[eidx]
            S[src[eidx], dst[eidx], nao:, nao:] += ph * S_off[eidx]
        Hd = H.transpose(0, 2, 1, 3).reshape(n * 2 * nao, n * 2 * nao)
        Sd = S.transpose(0, 2, 1, 3).reshape(n * 2 * nao, n * 2 * nao)
        valid2 = np.concatenate([np.concatenate([table[zi] > 0] * 2) for zi in z])
        Hd = Hd[valid2][:, valid2]
        Sd = Sd[valid2][:, valid2]
        ev = scipy.linalg.eigh(0.5 * (Hd + Hd.conj().T),
                               0.5 * (Sd + Sd.conj().T), eigvals_only=True)
        out.append(ev)
    return np.asarray(out)


def test_spinor_bands_match_dense_scipy():
    rng = np.random.default_rng(2)
    c = _soc_crystal(rng)
    graph = pad_and_batch([c], bucket_multiple=8)
    basis = get_basis_set("openmx", NAO)
    k = np.array([[0.0, 0, 0], [0.1, 0.05, -0.2]])
    band, wfn, gap = band_energies_soc_batched(
        graph, graph.Hon, graph.iHon, graph.Hoff, graph.iHoff,
        graph.Son, graph.Soff, jnp.asarray(k[None]), basis, num_bands=6)
    ref = _dense_spinor_bands(c, k, basis)
    # framework window: [occ-6, occ+6) around the spinor filling index
    occ = int(round(sum(basis.num_valence_table[int(zz)] for zz in c["z"])))
    want = ref[:, occ - 6 : occ + 6]
    np.testing.assert_allclose(np.asarray(band)[0], want, atol=5e-4)


@pytest.mark.slow


def test_soc_head_band_loss_gradients_flow():
    rng = np.random.default_rng(3)
    c = _soc_crystal(rng)
    graph = pad_and_batch([c], bucket_multiple=8)
    rep = HamGNNConvE3(num_types=20, irreps_edge_sh=SH,
                       irreps_node_features=FEAT, num_layers=1, num_radial=8,
                       cutoff=4.0, radial_mlp=(16,))
    head = HamGNNSOCOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=NAO,
        ham_type="openmx", soc_basis="su2", add_H0=True, symmetrize=True,
        calculate_band_energy=True, band_num_control=4)
    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, graph)
    feats = rep.apply(p_rep, graph)
    k_vecs = jnp.asarray(0.3 * np.random.default_rng(0).normal(size=(1, 3, 3)),
                         jnp.float32)
    p_head = head.init(key, graph, feats, k_vecs=k_vecs)

    def loss(p):
        out = head.apply(p, graph, feats, k_vecs=k_vecs)
        assert "band_energy" in out and "band_energy_ref" in out
        return jnp.mean(jnp.abs(out["band_energy"] - out["band_energy_ref"]))

    val, grads = jax.value_and_grad(loss)(p_head)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0
