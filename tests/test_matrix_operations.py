"""Legacy matrix_operations parity (reference physics/matrix_operations.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.wigner import irreps_D, wigner_D
from hamgnn_tpu.models.basis import get_basis_set, hamiltonian_irreps
from hamgnn_tpu.models.output import _merge_reorder_matrix
from hamgnn_tpu.physics.matrix_operations import (
    OverlapExpand,
    TensorExpansion,
    TensorMerge,
)


@pytest.mark.parametrize("ham_type,nao", [("openmx", 14), ("abacus", 13), ("siesta", 13)])
def test_expansion_inverts_merge_up_to_scale(ham_type, nao):
    """merge (sqrt(2L+1)-scaled, unsorted) then expand (raw w3j, sorted) must
    recover the components up to the per-L scale and the sort permutation."""
    basis = get_basis_set(ham_type, nao)
    ham_irreps = hamiltonian_irreps(basis)
    rng = np.random.default_rng(0)
    comps = rng.standard_normal((5, ham_irreps.dim)).astype(np.float32)

    M = _merge_reorder_matrix(ham_type, nao)          # (D, nao^2), orthogonal
    blocks = comps @ M                                 # DFT-ordered blocks

    exp = TensorExpansion(ham_type, nao)
    out = np.asarray(exp(jnp.asarray(blocks)))

    # build expected: scale each unsorted chunk by 1/sqrt(2L+1), then sort
    chunk_ls = []
    for _, li in basis.orbital_irreps:
        for _, lj in basis.orbital_irreps:
            for L in range(abs(li.l - lj.l), li.l + lj.l + 1):
                chunk_ls.append((L, (-1) ** (li.l + lj.l)))
    combined = Irreps([(1, (L, p)) for L, p in chunk_ls])
    _, p, _ = combined.sort()
    order = sorted(range(len(chunk_ls)), key=lambda i: p[i])
    slices = combined.slices()
    expected = np.concatenate(
        [comps[:, slices[i]] / np.sqrt(2 * chunk_ls[i][0] + 1) for i in order],
        axis=1,
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)
    assert exp.irreps_out.dim == ham_irreps.dim


def _rand_rot(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _dft_order_D(basis, R):
    """Representation of R on DFT-ordered orbitals (cf. test_output_head)."""
    n = basis.nao_max
    D = np.zeros((n, n))
    ofs = 0
    for _, ir in basis.orbital_irreps:
        b = wigner_D(ir.l, R)
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


def test_expansion_equivariance():
    """D_out(g) . expand(B) == expand(R(g) B R(g)^T) for DFT-ordered blocks."""
    ham_type, nao = "openmx", 14
    basis = get_basis_set(ham_type, nao)
    exp = TensorExpansion(ham_type, nao)

    rng = np.random.default_rng(1)
    R = _rand_rot(rng)
    R_dft = _dft_order_D(basis, R)

    B = rng.standard_normal((3, nao, nao)).astype(np.float32)
    rotated = np.einsum("ij,bjk,lk->bil", R_dft, B, R_dft)

    out = np.asarray(exp(jnp.asarray(B.reshape(3, -1))))
    out_rot = np.asarray(exp(jnp.asarray(rotated.reshape(3, -1))))
    D_out = irreps_D(exp.irreps_out, R)
    np.testing.assert_allclose(out @ D_out.T, out_rot, atol=2e-5)


def test_overlap_expand_dict():
    ham_type, nao = "openmx", 14
    oe = OverlapExpand(ham_type, nao)
    rng = np.random.default_rng(2)
    data = {
        "Son": jnp.asarray(rng.standard_normal((4, nao * nao)), jnp.float32),
        "Soff": jnp.asarray(rng.standard_normal((7, nao * nao)), jnp.float32),
    }
    out = oe(data)
    assert out["Son_expand"].shape == (4, oe.irreps_overlap.dim)
    assert out["Soff_expand"].shape == (7, oe.irreps_overlap.dim)


def test_tensor_merge_shapes_and_equivariance():
    irreps_in = Irreps("8x0e+4x1o+2x2e")
    out1 = Irreps("1x0e+1x1o")
    out2 = Irreps("1x0e+1x1o")
    tm = TensorMerge(irreps_in="8x0e+4x1o+2x2e", irreps_out_1=str(out1),
                     irreps_out_2=str(out2))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, irreps_in.dim)), jnp.float32)
    params = tm.init(jax.random.PRNGKey(0), x)
    y = tm.apply(params, x)
    assert y.shape == (6, out1.dim * out2.dim)

    R = _rand_rot(rng)
    D_in = irreps_D(irreps_in, R)
    D1 = irreps_D(out1, R)
    D2 = irreps_D(out2, R)
    y_rot_in = tm.apply(params, x @ jnp.asarray(D_in.T, jnp.float32))
    y_mat = np.asarray(y).reshape(6, out1.dim, out2.dim)
    expected = np.einsum("ij,bjk,lk->bil", D1, y_mat, D2).reshape(6, -1)
    np.testing.assert_allclose(np.asarray(y_rot_in), expected, atol=1e-4)


def test_tensor_merge_internal_weights():
    tm = TensorMerge(irreps_in="4x0e+2x1o", irreps_out_1="1x0e+1x1o",
                     irreps_out_2="1x0e+1x1o", internal_weights=True)
    x = jnp.ones((2, 10), jnp.float32)
    params = tm.init(jax.random.PRNGKey(1), x)
    y = tm.apply(params, x)
    assert y.shape == (2, 16)
    assert np.isfinite(np.asarray(y)).all()
