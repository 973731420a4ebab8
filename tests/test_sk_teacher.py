"""SK synthetic-teacher physics checks.

The teacher (tools/sk_dataset.py) must produce exactly O(3)-equivariant
Hamiltonian/overlap blocks — otherwise the accuracy north star (<1 meV MAE,
VERDICT r1 #1) is unreachable by construction: an equivariant model cannot
fit a non-equivariant target component (observed as a hard ~7.6e-4 Ha MAE
floor when parity-violating paths were present).
"""

import numpy as np
import pytest

from hamgnn_tpu.e3.wigner import wigner_D
from hamgnn_tpu.tools.sk_dataset import SKTeacher


@pytest.fixture(scope="module")
def teacher():
    return SKTeacher(seed=3)


def _block_D(teacher, R):
    """Rotation matrix over the DFT-ordered nao_max orbital slots.

    Internal (merge-matrix real-SH convention) block-diagonal wigner_D,
    conjugated into the DFT ordering with the basis ``index_change``
    permutation and ``minus_index`` sign flips (models/basis.py)."""
    from scipy.linalg import block_diag

    basis = teacher.basis
    D_int = block_diag(*[wigner_D(ir.l, R)
                         for _, ir in basis.orbital_irreps])
    nao = teacher.nao
    P = np.zeros((nao, nao))
    perm = (basis.index_change if basis.index_change is not None
            else np.arange(nao))
    # reorder semantics: DFT slot p draws from internal slot index_change[p]
    # (models/output.py:62-64), i.e. P[p, index_change[p]] = 1
    for p, i in enumerate(perm):
        P[p, int(i)] = 1.0
    if basis.minus_index is not None:
        s = np.ones(nao)
        s[np.asarray(basis.minus_index, int)] = -1.0
        P = np.diag(s) @ P
    return P @ D_int @ P.T


def test_gaunt_selection_rule(teacher):
    """Only l1+l2+L even paths carry amplitude (two-center selection rule)."""
    for prm in (teacher.h0, teacher.dh, teacher.s):
        for p, (_i, _j, l1, l2, L, _o) in enumerate(teacher.paths):
            if (l1 + l2 + L) % 2 == 1:
                assert prm.A[p] == 0.0
                assert prm.kappa[p] == 0.0


def test_offsite_rotation_equivariance(teacher):
    """H_off(R n) = D H_off(n) D^T for a random rotation R."""
    rng = np.random.default_rng(0)
    # random rotation via QR with det +1
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    vec = rng.normal(size=(6, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    r = np.full(6, 4.2)
    zi = np.array([14, 14, 6, 6, 14, 6])
    zj = np.array([14, 6, 6, 14, 14, 6])

    H1 = teacher.offsite(teacher.dh, vec, r, zi, zj)
    H2 = teacher.offsite(teacher.dh, vec @ q.T, r, zi, zj)

    # internal-component irreps D must match the merge-matrix convention;
    # verify via the nao-block transform built from per-slot wigner_D
    D = _block_D(teacher, q)
    want = np.einsum("ab,ebc,dc->ead", D, H1, D)
    np.testing.assert_allclose(H2, want, atol=3e-6)


def test_offsite_inversion_parity(teacher):
    """H_off(-n) = P H_off(n) P with P = diag((-1)^l per orbital)."""
    rng = np.random.default_rng(1)
    vec = rng.normal(size=(4, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    r = np.full(4, 4.0)
    zi = np.array([14, 6, 14, 6])
    zj = np.array([14, 6, 6, 14])
    H1 = teacher.offsite(teacher.dh, vec, r, zi, zj)
    H2 = teacher.offsite(teacher.dh, -vec, r, zi, zj)
    par = np.concatenate([
        np.full(ir.dim, (-1.0) ** ir.l)
        for _, ir in teacher.basis.orbital_irreps])
    want = par[None, :, None] * H1 * par[None, None, :]
    np.testing.assert_allclose(H2, want, atol=1e-12)


def test_onsite_rotation_equivariance(teacher):
    """Crystal-field on-site terms rotate as D H D^T too."""
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    n_at = 2
    z = np.array([14, 6])
    src = np.array([0, 0, 1, 1, 1])
    zj = np.array([6, 14, 14, 6, 14])
    vec = rng.normal(size=(5, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    r = np.full(5, 3.8)
    H1 = teacher.onsite(teacher.dh, z, src, vec, r, zj)
    H2 = teacher.onsite(teacher.dh, z, src, vec @ q.T, r, zj)
    D = _block_D(teacher, q)
    want = np.einsum("ab,ebc,dc->ead", D, H1, D)
    np.testing.assert_allclose(H2, want, atol=3e-6)
