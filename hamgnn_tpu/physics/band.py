"""Batched k-space Hamiltonian assembly and generalized eigensolve (TPU).

Redesign of the reference's per-crystal Python loops
(/root/reference/hamgnn/models/hamgnn_output.py:1675-1997): here H(k)/S(k) for
the whole batch are assembled with two scatter-adds over nodes/edges (static
shapes), and the generalized eigenproblem is solved with identity padding
instead of the reference's dynamic ``masked_select`` compaction (:1899-1910) —
invalid/padded orbitals get S=1, H=LARGE on the diagonal, pushing them to the
top of the spectrum where they never intersect the physical band window.

Phase convention (reference :1779-1790): exp(+2*pi*i k . nbr_shift) with both
k and nbr_shift Cartesian; off-site block (src, dst) at row src, col dst.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from ..models.basis import BasisSetInfo

# Pad-orbital diagonal energy: must sit far above any physical band, but the
# f32 eigh's absolute error scales as ~1e-7 * |max entry|, so keep it as small
# as safely possible (1e3 -> ~1e-4 eV band error; 1e6 would cost ~0.1 eV).
_PAD_ENERGY = 1.0e3


def assemble_k_matrices(
    graph: Graph,
    h_on: jnp.ndarray,        # (N, nao^2)
    h_off: jnp.ndarray,       # (E, nao^2)
    k_vecs: jnp.ndarray,      # (B, nk, 3) Cartesian
    nao: int,
    max_atoms: int,
) -> jnp.ndarray:
    """Returns (B, nk, max_atoms*nao, max_atoms*nao) complex H(k)."""
    B = graph.num_graphs
    nk = k_vecs.shape[1]
    M = max_atoms
    if jnp.iscomplexobj(h_on):
        dtype_c = h_on.dtype
    else:
        dtype_c = jnp.complex64 if h_on.dtype == jnp.float32 else jnp.complex128

    node_offset = jnp.cumsum(graph.node_counts) - graph.node_counts
    local = (jnp.arange(graph.num_nodes, dtype=jnp.int32) - node_offset[graph.batch])
    local = jnp.clip(local, 0, M - 1)

    src, dst = graph.edge_index[0], graph.edge_index[1]
    b_e = graph.batch[src]
    src_l = jnp.clip(src - node_offset[b_e], 0, M - 1)
    dst_l = jnp.clip(dst - node_offset[b_e], 0, M - 1)

    hk = jnp.zeros((B, M, M, nao, nao), dtype_c)
    on_blocks = (h_on * graph.node_mask[:, None]).reshape(-1, nao, nao).astype(dtype_c)
    hk = hk.at[graph.batch, local, local].add(on_blocks)
    hk = jnp.broadcast_to(hk[:, None], (B, nk, M, M, nao, nao))

    # phases: (E, nk) — exp(+2*pi*i k . nbr_shift), Cartesian dot product
    k_per_edge = k_vecs[b_e]                                   # (E, nk, 3)
    dot = jnp.sum(graph.nbr_shift[:, None, :] * k_per_edge, axis=-1)
    phase = jnp.exp((2j * jnp.pi) * dot.astype(dtype_c))
    off_blocks = (h_off * graph.edge_mask[:, None]).reshape(-1, nao, nao).astype(dtype_c)
    contrib = phase[:, :, None, None] * off_blocks[:, None]
    hk = hk.at[b_e, :, src_l, dst_l].add(contrib)

    # (B, nk, M, M, nao, nao) -> (B, nk, M*nao, M*nao): swap atom/orbital dims
    hk = jnp.swapaxes(hk, 3, 4).reshape(B, nk, M * nao, M * nao)
    return hk


def band_counts_per_crystal(graph: Graph, species_counts, num_species: int = 99
                            ) -> jnp.ndarray:
    """Per-crystal band counts from a per-species dict (reference's dict-valued
    ``band_num_control``, hamgnn_output.py:1736-1741): sum the per-atom counts
    over each crystal.

    ``species_counts``: iterable of (atomic_number, count) pairs.
    """
    table = np.zeros(num_species, np.int32)
    for z, cnt in species_counts:
        table[int(z)] = int(cnt)
    per_node = jnp.asarray(table)[graph.z] * graph.node_mask.astype(jnp.int32)
    return jax.ops.segment_sum(per_node, graph.batch,
                               num_segments=graph.num_graphs)


def band_energies_batched(
    graph: Graph,
    h_on: jnp.ndarray,
    h_off: jnp.ndarray,
    s_on: jnp.ndarray,
    s_off: jnp.ndarray,
    k_vecs: jnp.ndarray,
    basis: BasisSetInfo,
    num_bands: int = 8,
    max_atoms: Optional[int] = None,
    export_reciprocal: bool = False,
    band_counts: Optional[jnp.ndarray] = None,
    sk_export_on: Optional[jnp.ndarray] = None,
    sk_export_off: Optional[jnp.ndarray] = None,
    export_H_sym: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Generalized bands around half filling.

    Returns (band_energy (B, nk, 2*num_bands), wavefunction
    (B, nk, 2*num_bands, M*nao), band_gap (B,)); with ``export_reciprocal``
    also (HK, SK[, dSK]) — the reference's export_reciprocal_values surface
    (hamgnn_output.py:1760-1989).

    With ``band_counts`` (B,) set — the per-species dict mode of the
    reference's ``band_num_control`` (:1939-1942) — the *lowest* bands are
    taken instead of a window around half filling: a static block of
    ``num_bands`` bottom bands is returned plus a ``band_mask``
    (B, 1, num_bands) flagging the first ``band_counts[b]`` of them, the
    static-shape equivalent of the reference's per-crystal truncation.
    Returns (band_energy (B, nk, num_bands), wavefunction, band_gap,
    band_mask[, HK, SK, dSK]).

    ``sk_export_on/off``: when set (the reference's
    ``calculate_band_energies_with_overlap``, hamgnn_output.py:1368-1673,
    used with ``ham_only=False``), the *exported* SK is assembled from
    these (predicted) overlap rows while the eigensolve still factorizes
    the reference overlap — exactly the reference's debugging contract
    (solve with reference_overlap_k Cholesky :1604-1618, export
    predicted_overlap_k :1640-1643).

    ``export_H_sym``: append the Cholesky-transformed Hamiltonian
    A = L^-1 H(k) L^-H (the reference's ``symmetrized_hamiltonians``
    export, :1609-1613, :1647) as (B, nk, M*nao, M*nao).
    """
    nao = basis.nao_max
    M = int(max_atoms) if max_atoms is not None else int(graph.num_nodes)
    B = graph.num_graphs
    dtype = h_on.dtype

    HK = assemble_k_matrices(graph, h_on, h_off, k_vecs, nao, M)
    SK = assemble_k_matrices(graph, s_on, s_off, k_vecs, nao, M)

    # validity mask per (crystal, local atom, orbital)
    mask_table = jnp.asarray(basis.orbital_mask_table, dtype)
    node_orb = mask_table[graph.z] * graph.node_mask[:, None]      # (N, nao)
    node_offset = jnp.cumsum(graph.node_counts) - graph.node_counts
    local = jnp.clip(
        jnp.arange(graph.num_nodes, dtype=jnp.int32) - node_offset[graph.batch], 0, M - 1)
    orb_valid = jnp.zeros((B, M, nao), dtype)
    orb_valid = orb_valid.at[graph.batch, local].max(node_orb)
    orb_valid = orb_valid.reshape(B, M * nao)                      # (B, Mnao)

    pair_valid = orb_valid[:, :, None] * orb_valid[:, None, :]
    HK = HK * pair_valid[:, None]
    SK = SK * pair_valid[:, None]
    diag_pad = (1.0 - orb_valid)[:, None, :]                        # (B, 1, Mnao)
    idx = jnp.arange(M * nao)
    SK = SK.at[:, :, idx, idx].add(diag_pad.astype(SK.dtype))
    HK = HK.at[:, :, idx, idx].add((_PAD_ENERGY * diag_pad).astype(HK.dtype))

    # Cholesky-reduced generalized eigh: L L^H = S;  A = L^-1 H L^-H
    L = jnp.linalg.cholesky(SK)
    Hh = jax.scipy.linalg.solve_triangular(L, HK, lower=True)
    A = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(Hh, -1, -2).conj(), lower=True
        ), -1, -2
    ).conj()
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2).conj())
    eigvals, eigvecs = jnp.linalg.eigh(A)  # ascending

    # transform eigenvectors back: psi = L^-H v
    psi = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2).conj(), eigvecs, lower=False)

    # half-filled index per crystal
    valence_table = jnp.asarray(basis.num_valence_table, dtype)
    val_per_node = valence_table[graph.z] * graph.node_mask
    crystal_valence = jax.ops.segment_sum(val_per_node, graph.batch, num_segments=B)
    half = jnp.ceil(crystal_valence / 2.0).astype(jnp.int32)       # (B,)

    gap = (
        jnp.min(jnp.take_along_axis(eigvals, half[:, None, None], axis=2), axis=1)
        - jnp.max(jnp.take_along_axis(eigvals, half[:, None, None] - 1, axis=2), axis=1)
    )[:, 0]

    if band_counts is not None:
        # dict mode: lowest `num_bands` bands, masked to per-crystal counts
        w = min(int(num_bands), M * nao)
        band = eigvals[:, :, :w]
        wfn = jnp.swapaxes(psi[:, :, :, :w], -1, -2)       # (B, nk, w, Mnao)
        band_mask = (jnp.arange(w)[None, :] < band_counts[:, None])
        band_mask = band_mask.astype(band.dtype)[:, None, :]  # (B, 1, w)
    else:
        # static band window [half - w, half + w), kept inside the PHYSICAL
        # spectrum: the upper clip uses the per-crystal valid-orbital count so
        # the window can never slide into the _PAD_ENERGY pad states (heavy
        # element / small crystal safety; VERDICT r4 item 10)
        w = int(num_bands)
        n_valid = jnp.sum(orb_valid, axis=1).astype(jnp.int32)      # (B,)
        start = jnp.clip(half - w, 0,
                         jnp.clip(n_valid - 2 * w, 0, M * nao - 2 * w))

        def take_window(e_b, v_b, s_b):
            e_w = jax.lax.dynamic_slice_in_dim(e_b, s_b, 2 * w, axis=1)
            v_w = jax.lax.dynamic_slice_in_dim(v_b, s_b, 2 * w, axis=2)
            return e_w, v_w

        band, wfn = jax.vmap(take_window)(eigvals, psi, start)
        wfn = jnp.swapaxes(wfn, -1, -2)  # (B, nk, 2w, Mnao)
        band_mask = None
    extras = []
    if band_mask is not None:
        extras.append(band_mask)
    if export_reciprocal:
        if sk_export_on is not None and sk_export_off is not None:
            SK_exp = assemble_k_matrices(
                graph, sk_export_on, sk_export_off, k_vecs, nao, M)
            SK_exp = SK_exp * pair_valid[:, None]
            SK_exp = SK_exp.at[:, :, idx, idx].add(diag_pad.astype(SK_exp.dtype))
        else:
            SK_exp = SK
        extras.extend([HK, SK_exp])
        if graph.dSon is not None and graph.dSoff is not None:
            dsk = [assemble_k_matrices(
                graph, graph.dSon[..., k_ax], graph.dSoff[..., k_ax],
                k_vecs, nao, M) for k_ax in range(3)]
            extras.append(jnp.stack(dsk, axis=-1))
    if export_H_sym:
        extras.append(A)
    if extras:
        return (band, wfn, gap, *extras)
    return band, wfn, gap


def _generalized_eigh(HK: jnp.ndarray, SK: jnp.ndarray):
    """Cholesky-reduced generalized eigensolve; returns (eigvals, psi)."""
    L = jnp.linalg.cholesky(SK)
    Hh = jax.scipy.linalg.solve_triangular(L, HK, lower=True)
    A = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(Hh, -1, -2).conj(), lower=True
        ), -1, -2
    ).conj()
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2).conj())
    eigvals, eigvecs = jnp.linalg.eigh(A)
    psi = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2).conj(), eigvecs, lower=False)
    return eigvals, psi


def band_energies_soc_batched(
    graph: Graph,
    h_on_real: jnp.ndarray,    # (N, (2 nao)^2)
    h_on_imag: jnp.ndarray,
    h_off_real: jnp.ndarray,   # (E, (2 nao)^2)
    h_off_imag: jnp.ndarray,
    s_on: jnp.ndarray,         # (N, nao^2) real overlap (spin-independent)
    s_off: jnp.ndarray,
    k_vecs: jnp.ndarray,       # (B, nk, 3) Cartesian
    basis: BasisSetInfo,
    num_bands: int = 8,
    max_atoms: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spinor (2 nao) complex generalized band solve for SOC training.

    The training-path counterpart of the reference's SOC band branch
    (/root/reference/hamgnn/models/hamgnn_output.py:1998-2287): per-atom
    (2 nao, 2 nao) complex blocks (real ‖ imag rows, the SOC head layout)
    assemble into H(k); S(k) is the spatial overlap on each spin diagonal.
    Spinor states are singly occupied, so the filling index equals the
    valence electron count (not half of it).

    Returns (band_energy (B, nk, 2*num_bands), wavefunction, band_gap (B,)).
    """
    nao = basis.nao_max
    nao2 = 2 * nao
    M = int(max_atoms) if max_atoms is not None else int(graph.num_nodes)
    B = graph.num_graphs

    h_on = (h_on_real + 1j * h_on_imag).astype(jnp.complex64)
    h_off = (h_off_real + 1j * h_off_imag).astype(jnp.complex64)

    def expand_s(rows):
        sb = rows.reshape(-1, nao, nao)
        n = sb.shape[0]
        out = jnp.zeros((n, nao2, nao2), rows.dtype)
        out = out.at[:, :nao, :nao].set(sb)
        out = out.at[:, nao:, nao:].set(sb)
        return out.reshape(n, nao2 * nao2)

    HK = assemble_k_matrices(graph, h_on, h_off, k_vecs, nao2, M)
    SK = assemble_k_matrices(graph, expand_s(s_on), expand_s(s_off),
                             k_vecs, nao2, M)

    dtype = h_on_real.dtype
    mask_table = jnp.asarray(basis.orbital_mask_table, dtype)
    node_orb = mask_table[graph.z] * graph.node_mask[:, None]
    node_orb2 = jnp.concatenate([node_orb, node_orb], axis=1)     # (N, 2nao)
    node_offset = jnp.cumsum(graph.node_counts) - graph.node_counts
    local = jnp.clip(
        jnp.arange(graph.num_nodes, dtype=jnp.int32)
        - node_offset[graph.batch], 0, M - 1)
    orb_valid = jnp.zeros((B, M, nao2), dtype)
    orb_valid = orb_valid.at[graph.batch, local].max(node_orb2)
    orb_valid = orb_valid.reshape(B, M * nao2)

    pair_valid = orb_valid[:, :, None] * orb_valid[:, None, :]
    HK = HK * pair_valid[:, None]
    SK = SK * pair_valid[:, None]
    diag_pad = (1.0 - orb_valid)[:, None, :]
    idx = jnp.arange(M * nao2)
    SK = SK.at[:, :, idx, idx].add(diag_pad.astype(SK.dtype))
    HK = HK.at[:, :, idx, idx].add((_PAD_ENERGY * diag_pad).astype(HK.dtype))

    eigvals, psi = _generalized_eigh(HK, SK)

    valence_table = jnp.asarray(basis.num_valence_table, dtype)
    val_per_node = valence_table[graph.z] * graph.node_mask
    crystal_valence = jax.ops.segment_sum(val_per_node, graph.batch,
                                          num_segments=B)
    # spinor: every state singly occupied
    occ = jnp.round(crystal_valence).astype(jnp.int32)

    gap = (
        jnp.min(jnp.take_along_axis(eigvals, occ[:, None, None], axis=2), axis=1)
        - jnp.max(jnp.take_along_axis(eigvals, occ[:, None, None] - 1, axis=2), axis=1)
    )[:, 0]

    w = int(num_bands)
    # clip the window inside the physical spectrum (see the non-SOC variant)
    n_valid = jnp.sum(orb_valid, axis=1).astype(jnp.int32)
    start = jnp.clip(occ - w, 0,
                     jnp.clip(n_valid - 2 * w, 0, M * nao2 - 2 * w))

    def take_window(e_b, v_b, s_b):
        e_w = jax.lax.dynamic_slice_in_dim(e_b, s_b, 2 * w, axis=1)
        v_w = jax.lax.dynamic_slice_in_dim(v_b, s_b, 2 * w, axis=2)
        return e_w, v_w

    band, wfn = jax.vmap(take_window)(eigvals, psi, start)
    wfn = jnp.swapaxes(wfn, -1, -2)
    return band, wfn, gap
