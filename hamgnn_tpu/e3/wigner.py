"""Clebsch-Gordan / Wigner machinery in the real spherical-harmonic basis.

Exact (rational-arithmetic) computation of su(2) Clebsch-Gordan coefficients via
the Racah formula, transformed to the real SH basis with the standard
real<->complex change of basis carrying a ``(-i)^l`` phase so that the resulting
3j tensors are purely real.  This reproduces the (public, textbook) construction
e3nn uses, so the real-basis conventions match the reference's reorder tables
(/root/reference/hamgnn/models/hamgnn_output.py:368-811) and CG block assembly
(:851-891).

Everything here is precomputed host-side with numpy and cached; JAX code only
consumes the resulting constant arrays.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from math import factorial, isqrt

import numpy as np

__all__ = ["su2_clebsch_gordan", "wigner_3j", "wigner_D_l1", "wigner_D", "irreps_D"]


def _f(n: int) -> int:
    return factorial(n)


@functools.lru_cache(maxsize=None)
def _su2_cg_coeff(j1: Fraction, j2: Fraction, j3: Fraction,
                  m1: Fraction, m2: Fraction, m3: Fraction) -> float:
    """<j1 m1 j2 m2 | j3 m3> by the canonical Racah formula (exact until final sqrt)."""
    if m3 != m1 + m2:
        return 0.0

    def fr(x: Fraction) -> int:
        assert x.denominator == 1, x
        return _f(int(x))

    norm = (
        Fraction(int(2 * j3 + 1))
        * Fraction(fr(j3 + j1 - j2) * fr(j3 - j1 + j2) * fr(j1 + j2 - j3), fr(j1 + j2 + j3 + 1))
        * Fraction(fr(j3 + m3) * fr(j3 - m3) * fr(j1 - m1) * fr(j1 + m1) * fr(j2 - m2) * fr(j2 + m2))
    )
    kmin = int(max(0, j2 - j3 - m1, j1 - j3 + m2))
    kmax = int(min(j1 + j2 - j3, j1 - m1, j2 + m2))
    s = Fraction(0)
    for k in range(kmin, kmax + 1):
        s += Fraction(
            (-1) ** k,
            _f(k) * fr(j1 + j2 - j3 - k) * fr(j1 - m1 - k) * fr(j2 + m2 - k)
            * fr(j3 - j2 + m1 + k) * fr(j3 - j1 - m2 + k),
        )
    if s == 0:
        return 0.0
    sign = 1.0 if s > 0 else -1.0
    return sign * float(norm * s * s) ** 0.5


@functools.lru_cache(maxsize=None)
def su2_clebsch_gordan(j1: int, j2: int, j3: int) -> np.ndarray:
    """CG tensor C[m1+j1, m2+j2, m3+j3] = <j1 m1 j2 m2 | j3 m3> (float64).

    Integer (orbital) angular momenta only on this path; half-integer spins are
    handled by :func:`su2_clebsch_gordan_half` for the spinor/SOC codec.
    """
    J1, J2, J3 = Fraction(j1), Fraction(j2), Fraction(j3)
    out = np.zeros((2 * j1 + 1, 2 * j2 + 1, 2 * j3 + 1))
    if not (abs(j1 - j2) <= j3 <= j1 + j2):
        return out
    for i1, m1 in enumerate(range(-j1, j1 + 1)):
        for i2, m2 in enumerate(range(-j2, j2 + 1)):
            m3 = m1 + m2
            if -j3 <= m3 <= j3:
                out[i1, i2, m3 + j3] = _su2_cg_coeff(J1, J2, J3, Fraction(m1), Fraction(m2), Fraction(m3))
    return out


@functools.lru_cache(maxsize=None)
def _su2_cg_half(j1_x2: int, j2_x2: int, j3_x2: int) -> np.ndarray:
    """CG tensor for possibly half-integer j (arguments are 2*j)."""
    J1, J2, J3 = Fraction(j1_x2, 2), Fraction(j2_x2, 2), Fraction(j3_x2, 2)
    n1, n2, n3 = j1_x2 + 1, j2_x2 + 1, j3_x2 + 1
    out = np.zeros((n1, n2, n3))
    if not (abs(J1 - J2) <= J3 <= J1 + J2):
        return out
    for i1 in range(n1):
        m1 = -J1 + i1
        for i2 in range(n2):
            m2 = -J2 + i2
            m3 = m1 + m2
            if -J3 <= m3 <= J3:
                i3 = int(m3 + J3)
                out[i1, i2, i3] = _su2_cg_coeff(J1, J2, J3, m1, m2, m3)
    return out


def su2_clebsch_gordan_half(j1: float, j2: float, j3: float) -> np.ndarray:
    return _su2_cg_half(int(round(2 * j1)), int(round(2 * j2)), int(round(2 * j3)))


@functools.lru_cache(maxsize=None)
def change_basis_real_to_complex(l: int) -> np.ndarray:
    """Matrix Q with |l m>_complex-expansion of the real basis: Y_real = Q^dag Y_complex.

    Includes the (-i)^l phase that renders the real-basis 3j tensors real.
    Standard construction (same as e3nn's).
    """
    q = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for m in range(-l, 0):
        q[l + m, l + abs(m)] = inv_sqrt2
        q[l + m, l - abs(m)] = -1j * inv_sqrt2
    q[l, l] = 1.0
    for m in range(1, l + 1):
        q[l + m, l + abs(m)] = (-1) ** m * inv_sqrt2
        q[l + m, l - abs(m)] = 1j * (-1) ** m * inv_sqrt2
    return (-1j) ** l * q  # global phase makes the real-basis 3j real


@functools.lru_cache(maxsize=None)
def wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis Wigner-3j tensor C[i,j,k], normalized so sum(C**2) = 1.

    Satisfies the invariance  D1(R) x D2(R) x D3(R) . C = C  for the real
    Wigner-D matrices of :func:`wigner_D`, and symmetry under cyclic index
    permutation.  Same normalization/convention as e3nn's ``o3.wigner_3j``,
    which the reference relies on for both message passing and Hamiltonian
    block (de)composition.
    """
    C = su2_clebsch_gordan(l1, l2, l3).astype(np.complex128)
    Q1 = change_basis_real_to_complex(l1)
    Q2 = change_basis_real_to_complex(l2)
    Q3 = change_basis_real_to_complex(l3)
    # real-basis tensor: contract the complex (first) index of each Q, with a
    # conjugate on the output slot; the (-i)^l phases in Q make the result real.
    C = np.einsum("ai,bj,ck,abc->ijk", Q1, Q2, np.conj(Q3), C)
    assert np.abs(C.imag).max() < 1e-10, (l1, l2, l3, np.abs(C.imag).max())
    C = C.real
    n = np.linalg.norm(C.ravel())
    if n > 0:
        C = C / n
    return np.ascontiguousarray(C)


def _perm_yzx() -> np.ndarray:
    """Permutation matrix mapping Cartesian (x,y,z) to SH order (y,z,x)."""
    P = np.zeros((3, 3))
    P[0, 1] = 1.0  # m=-1 <- y
    P[1, 2] = 1.0  # m=0  <- z
    P[2, 0] = 1.0  # m=+1 <- x
    return P


def wigner_D_l1(R: np.ndarray) -> np.ndarray:
    """l=1 real Wigner-D from a 3x3 Cartesian rotation matrix."""
    P = _perm_yzx()
    return P @ R @ P.T


@functools.lru_cache(maxsize=None)
def _d_recursion_scale(l: int) -> float:
    return 2.0 * l + 1.0


def wigner_D(l: int, R: np.ndarray) -> np.ndarray:
    """Real Wigner-D matrix for angular momentum l from a Cartesian rotation R.

    Built by CG recursion: D_l = (2l+1) W^T (D_{l-1} (x) D_1) W with
    W = wigner_3j(l-1, 1, l); exact because W^T W = I/(2l+1).
    """
    if l == 0:
        return np.ones((1, 1))
    D1 = wigner_D_l1(np.asarray(R, dtype=np.float64))
    if l == 1:
        return D1
    D_prev = wigner_D(l - 1, R)
    W = wigner_3j(l - 1, 1, l).reshape((2 * l - 1) * 3, 2 * l + 1)
    big = np.kron(D_prev, D1)
    return _d_recursion_scale(l) * (W.T @ big @ W)


def irreps_D(irreps, R: np.ndarray, inversion: bool = False) -> np.ndarray:
    """Block-diagonal representation matrix of (R, optional inversion) on a
    feature vector laid out per :mod:`hamgnn_tpu.e3.irreps` (mul-major chunks).
    Test/utility helper (host-side numpy)."""
    from .irreps import Irreps

    irreps = Irreps(irreps)
    blocks = []
    for mul, ir in irreps:
        D = wigner_D(ir.l, R)
        if inversion:
            D = D * float(ir.p)
        for _ in range(mul):
            blocks.append(D)
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    ofs = 0
    for b in blocks:
        d = b.shape[0]
        out[ofs : ofs + d, ofs : ofs + d] = b
        ofs += d
    return out
