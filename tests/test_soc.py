"""SOC head tests: su2 codec algebra, spinor equivariance, Hermiticity, so3 path."""

import jax
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.wigner import irreps_D, wigner_D
from hamgnn_tpu.models.basis import get_basis_set
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.soc import HamGNNSOCOut, su2_base_irreps, su2_codec_matrix

from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+4x2e+2x2o+1x3o+1x3e+1x4e"
SH = "0e + 1o + 2e + 3o + 4e"


def rand_rot(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def spin_half_U(R):
    """SU(2) element covering Cartesian rotation R (sign-ambiguous, fine for
    conjugation tests): axis-angle -> exp(-i theta/2 n.sigma)."""
    theta = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    if theta < 1e-12:
        return np.eye(2, dtype=complex)
    n = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    n = n / max(np.linalg.norm(n), 1e-30)
    sx = np.array([[0, 1], [1, 0]], complex)
    sy = np.array([[0, -1j], [1j, 0]], complex)
    sz = np.array([[1, 0], [0, -1]], complex)
    ns = n[0] * sx + n[1] * sy + n[2] * sz
    return np.cos(theta / 2) * np.eye(2) - 1j * np.sin(theta / 2) * ns


def dft_order_D(basis, R):
    blocks = [wigner_D(ir.l, R) for _, ir in basis.orbital_irreps]
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


class TestSU2Codec:
    def test_shapes_and_rank(self):
        basis = get_basis_set("openmx", 14)
        base = su2_base_irreps(basis)
        M = su2_codec_matrix("openmx", 14)
        assert M.shape == (base.dim, 4 * 14 * 14)
        assert np.linalg.matrix_rank(M.astype(np.complex128)) == base.dim

    def test_spinor_equivariance(self):
        """Rotating the irreps input must conjugate the spin blocks:
        H'(D x) = (U_half (x) D_orb) H (U_half (x) D_orb)^dagger."""
        basis = get_basis_set("openmx", 14)
        base = su2_base_irreps(basis)
        M = su2_codec_matrix("openmx", 14).astype(np.complex128)
        nao = 14
        rng = np.random.default_rng(0)
        x = rng.normal(size=base.dim) + 1j * rng.normal(size=base.dim)

        def to_block(v):
            blk = (v @ M).reshape(2, 2, nao, nao)
            return blk.transpose(0, 2, 1, 3).reshape(2 * nao, 2 * nao)

        R = rand_rot(rng)
        Dx = irreps_D(base, R)
        U = spin_half_U(R)
        Do = dft_order_D(basis, R)
        big = np.kron(U, Do)

        H = to_block(x)
        H_rot = to_block(Dx @ x)
        want = big @ H @ big.conj().T
        np.testing.assert_allclose(H_rot, want, atol=2e-5)


@pytest.fixture(scope="module")
def soc_setup():
    rng = np.random.default_rng(5)
    c = make_crystal(rng, n_atoms=3, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    # SOC-shaped targets: (2 nao)^2 rows
    n = c["z"].shape[0]
    e = c["edge_index"].shape[1]
    big = (2 * 14) ** 2
    c["Hon"] = np.zeros((n, big))
    c["Hoff"] = np.zeros((e, big))
    c["iHon"] = np.zeros((n, big))
    c["iHoff"] = np.zeros((e, big))
    c["Hon0"] = np.zeros((n, big))
    c["Hoff0"] = np.zeros((e, big))
    c["iHon0"] = np.zeros((n, big))
    c["iHoff0"] = np.zeros((e, big))
    c["Lon"] = 0.1 * rng.normal(size=(n, 14 * 14, 3))
    c["Loff"] = 0.1 * rng.normal(size=(e, 14 * 14, 3))
    graph = pad_and_batch([c], bucket_multiple=8)
    rep = HamGNNConvE3(
        num_types=20, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=1, num_radial=8, cutoff=4.0, radial_mlp=(16, 16))
    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, graph)
    feats = rep.apply(p_rep, graph)
    return graph, feats


class TestSOCHeads:
    @pytest.mark.parametrize("soc_basis", ["su2", "so3"])
    def test_forward_and_hermiticity(self, soc_setup, soc_basis):
        graph, feats = soc_setup
        head = HamGNNSOCOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", soc_basis=soc_basis, add_H0=True,
            zero_point_shift=False)
        params = head.init(jax.random.PRNGKey(1), graph, feats)
        res = head.apply(params, graph, feats)

        big = 2 * 14
        hr = np.asarray(res["hamiltonian_real_on"]).reshape(-1, big, big)
        hi = np.asarray(res["hamiltonian_imag_on"]).reshape(-1, big, big)
        assert np.isfinite(hr).all() and np.isfinite(hi).all()
        if soc_basis == "su2":
            # full Hermiticity: H = H^dagger -> re symmetric, im antisymmetric
            np.testing.assert_allclose(hr, hr.transpose(0, 2, 1), atol=1e-5)
            np.testing.assert_allclose(hi, -hi.transpose(0, 2, 1), atol=1e-5)
            hr_off = np.asarray(res["hamiltonian_real_off"]).reshape(-1, big, big)
            hi_off = np.asarray(res["hamiltonian_imag_off"]).reshape(-1, big, big)
            inv = np.asarray(graph.inv_edge_idx)
            mask = np.asarray(graph.edge_mask)
            np.testing.assert_allclose(
                hr_off[mask], hr_off[inv][mask].transpose(0, 2, 1), atol=1e-5)
            np.testing.assert_allclose(
                hi_off[mask], -hi_off[inv][mask].transpose(0, 2, 1), atol=1e-5)
        else:
            # so3: the spatial (spin-diagonal, real) blocks are symmetric; the
            # ksi*L spin-coupling blocks carry the L-matrix convention and are
            # antisymmetrized, matching hamgnn_output.py:3079-3140.
            np.testing.assert_allclose(
                hr[:, :14, :14], hr[:, :14, :14].transpose(0, 2, 1), atol=1e-5)
            np.testing.assert_allclose(
                hr[:, 14:, 14:], hr[:, 14:, 14:].transpose(0, 2, 1), atol=1e-5)
            np.testing.assert_allclose(hi[:, :14, :14], -hi[:, 14:, 14:], atol=1e-5)

    def test_orbital_masks(self, soc_setup):
        graph, feats = soc_setup
        head = HamGNNSOCOut(
            irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
            ham_type="openmx", soc_basis="su2", add_H0=False,
            zero_point_shift=False)
        params = head.init(jax.random.PRNGKey(2), graph, feats)
        res = head.apply(params, graph, feats)
        basis = get_basis_set("openmx", 14)
        table = basis.orbital_mask_table
        z = np.asarray(graph.z)
        hr = np.asarray(res["hamiltonian_real_on"]).reshape(-1, 2, 14, 2, 14)
        for i in range(hr.shape[0]):
            invalid = table[z[i]] == 0
            assert np.abs(hr[i][:, invalid]).max() < 1e-6
            assert np.abs(hr[i][:, :, :, invalid]).max() < 1e-6
