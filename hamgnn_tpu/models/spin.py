"""Spin-constrained (magnetic) Hamiltonian terms, vectorized for TPU.

The reference computes Heisenberg-like S.J.S corrections with per-edge Python
loops over ragged edge-lookup structures
(/root/reference/hamgnn/models/hamgnn_output.py:3219-3601,
build_edge_lookup_structures :2513-2586).  Those loops factorize exactly into
segment-sums:

  * contributions keyed by an edge's source atom become
    ``A[a] = segsum_e(src=a) P[e]`` followed by a gather at ``src[e']``;
  * contributions keyed by (target atom, cell shift) use a host-precomputed
    ``edge_group_tar`` id (one per unique (dst, shift) pair) — same math, one
    segment-sum + gather, no ragged indexing on device.

J-coupling block assembly (construct_j_coupling_matrix, :962-1040 /
merge_rank2/rank0 :893-961) is folded into constant matrices like the main
merge path.

Covered branches: SOC (rank-2 J, complex), non-collinear without SOC (rank-0 J,
complex sigma.S), collinear (sigma_z, two real spin channels).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..data.graph import Graph
from ..e3.irreps import Irreps
from ..e3.wigner import wigner_3j
from .basis import BasisSetInfo, get_basis_set

SIGMA = np.zeros((3, 2, 2), dtype=np.complex128)
SIGMA[0] = [[0, 1], [1, 0]]
SIGMA[1] = [[0, -1j], [1j, 0]]
SIGMA[2] = [[1, 0], [0, -1]]


def j_irreps(basis: BasisSetInfo, soc: bool) -> Irreps:
    """J head output irreps (reference :296-322): per orbital pair, L=0,1,2
    (all even parity) when SOC else a single 0e."""
    n_blocks = len(basis.orbital_irreps) ** 2
    if soc:
        return Irreps("+".join(["1x0e+1x1e+1x2e"] * n_blocks))
    return Irreps(f"{n_blocks}x0e")


@functools.lru_cache(maxsize=None)
def _rank2_merge_matrix(ham_type: str, nao_max: int) -> np.ndarray:
    """(D_J, nao, nao, 3, 3) map: J irreps components -> per-orbital-pair 3x3
    Cartesian blocks expanded over orbital extents (merge_rank2 + expansion +
    the [2,0,1] yzx->xyz permutation, reference :893-928, :975-995)."""
    basis = get_basis_set(ham_type, nao_max)
    nao = basis.nao_max
    perm = np.array([2, 0, 1])
    D = 9 * len(basis.orbital_irreps) ** 2
    M = np.zeros((D, nao, nao, 3, 3))
    d = 0
    row0 = 0
    for _, li in basis.orbital_irreps:
        col0 = 0
        for _, lj in basis.orbital_irreps:
            blk = np.zeros((9, 3, 3))
            comp = 0
            for L in range(3):
                cg = np.sqrt(2 * L + 1) * wigner_3j(1, 1, L)  # (3,3,2L+1)
                for m in range(2 * L + 1):
                    blk[comp + m] = cg[:, :, m]
                comp += 2 * L + 1
            blk = blk[:, perm[:, None], perm[None, :]]
            M[d : d + 9, row0 : row0 + li.dim, col0 : col0 + lj.dim] = \
                blk[:, None, None, :, :]
            d += 9
            col0 += lj.dim
        row0 += li.dim
    # reorder to DFT orbital ordering
    if basis.index_change is not None:
        M = M[:, basis.index_change[:, None], basis.index_change[None, :]]
    if basis.minus_index is not None:
        s = np.ones(nao)
        s[basis.minus_index] = -1.0
        M = M * s[None, :, None, None, None] * s[None, None, :, None, None]
    return np.ascontiguousarray(M)


@functools.lru_cache(maxsize=None)
def _rank0_merge_matrix(ham_type: str, nao_max: int) -> np.ndarray:
    """(n_blocks, nao, nao): scalar J per orbital pair expanded over extents."""
    basis = get_basis_set(ham_type, nao_max)
    nao = basis.nao_max
    nb = len(basis.orbital_irreps) ** 2
    M = np.zeros((nb, nao, nao))
    b = 0
    row0 = 0
    for _, li in basis.orbital_irreps:
        col0 = 0
        for _, lj in basis.orbital_irreps:
            M[b, row0 : row0 + li.dim, col0 : col0 + lj.dim] = 1.0
            b += 1
            col0 += lj.dim
        row0 += li.dim
    if basis.index_change is not None:
        M = M[:, basis.index_change[:, None], basis.index_change[None, :]]
    # rank-0 expansion has no sign structure (values are broadcast scalars)
    return np.ascontiguousarray(M)


def heisenberg_terms(
    graph: Graph,
    J_on, J_off,          # SOC: (N, nao, nao, 3, 3) / else (N, nao, nao)
    w_on, w_off,          # (N, nao, nao), (E, nao, nao)
    spin_vec,             # (N, 3)
    magnetic,             # (N,) float mask
    soc: bool,
    collinear: bool,
):
    """H_heisen (N, 2, nao, 2, nao) and (E, 2, nao, 2, nao); complex unless
    collinear (real)."""
    J_on, J_off = jnp.asarray(J_on), jnp.asarray(J_off)
    w_on, w_off = jnp.asarray(w_on), jnp.asarray(w_off)
    spin_vec, magnetic = jnp.asarray(spin_vec), jnp.asarray(magnetic)
    src, dst = graph.edge_index[0], graph.edge_index[1]
    num_nodes = graph.num_nodes
    num_groups = graph.num_edges
    e_mask = graph.edge_mask.astype(w_off.dtype)
    zero_shift = jnp.all(graph.cell_shift == 0, axis=1).astype(w_off.dtype) * e_mask
    group_tar = graph.edge_group_tar

    if collinear:
        # sigma_z factorization: every term carries s_z(atom) * sigma_z, so
        # the (2, nao, 2, nao) structure is diag(+U, -U) with a single real
        # (rows, nao, nao) accumulation U.  Computing U with 3-D segment sums
        # and expanding the spin structure once at the end keeps the TPU
        # compile graph free of 5-D scatter/outer-product chains (the
        # direct einsum('eij,eop->eoipj') form compiled pathologically
        # slowly in the TPU backend).
        spin_ax = spin_vec[:, 2]
        U_own = J_on * (magnetic * spin_ax)[:, None, None]    # (N, nao, nao)
        U_src = J_off * (magnetic[dst] * spin_ax[dst] * e_mask)[:, None, None]
        U_tar = J_off * (magnetic[src] * spin_ax[src] * e_mask)[:, None, None]
        A = jax.ops.segment_sum(U_src, src, num_segments=num_nodes)
        A0 = jax.ops.segment_sum(U_tar * zero_shift[:, None, None], dst,
                                 num_segments=num_nodes)
        B = jax.ops.segment_sum(U_tar, group_tar, num_segments=num_groups)

        U_on = (U_own + A + A0) * w_on                        # (N, nao, nao)
        U_off = (U_own[src] + U_own[dst] * zero_shift[:, None, None]
                 + A[src] + B[group_tar]) * w_off             # (E, nao, nao)

        def expand(U):
            out = jnp.zeros(U.shape[:1] + (2, U.shape[1], 2, U.shape[2]),
                            U.dtype)
            out = out.at[:, 0, :, 0, :].set(U)
            return out.at[:, 1, :, 1, :].set(-U)

        return expand(U_on), expand(U_off)

    sig = jnp.asarray(SIGMA.astype(np.complex64))  # (3,2,2)
    spin_c = spin_vec.astype(jnp.complex64)
    mag_c = magnetic.astype(jnp.complex64)
    e_mask_c = e_mask.astype(jnp.complex64)
    zero_c = zero_shift.astype(jnp.complex64)

    if soc:
        Jc_on = J_on.astype(jnp.complex64)
        Jc_off = J_off.astype(jnp.complex64)

        def pair_term(J, s, order):
            # order 'kl': sigma on axis k, spin on axis l; 'lk': swapped
            if order == "kl":
                return jnp.einsum("nijkl,kop,nl->noipj", J, sig, s)
            return jnp.einsum("nijkl,lop,nk->noipj", J, sig, s)

        # onsite: both symmetrized terms
        t_on = (pair_term(Jc_on, spin_c, "kl") + pair_term(Jc_on, spin_c, "lk"))
        t_on = t_on * mag_c[:, None, None, None, None]

        # per-edge J_off terms with endpoint spins
        P_src = pair_term(Jc_off, spin_c[dst], "kl") * (mag_c[dst] * e_mask_c)[:, None, None, None, None]
        P_tar = pair_term(Jc_off, spin_c[src], "lk") * (mag_c[src] * e_mask_c)[:, None, None, None, None]
    else:
        Jc_on = J_on.astype(jnp.complex64)
        Jc_off = J_off.astype(jnp.complex64)
        sdotS = jnp.einsum("kop,nk->nop", sig, spin_c)  # (N,2,2)

        def outer_c(J, sp):
            return jnp.einsum("nij,nop->noipj", J, sp)

        t_on = outer_c(Jc_on, sdotS) * mag_c[:, None, None, None, None]
        P_src = outer_c(Jc_off, sdotS[dst]) * (mag_c[dst] * e_mask_c)[:, None, None, None, None]
        P_tar = outer_c(Jc_off, sdotS[src]) * (mag_c[src] * e_mask_c)[:, None, None, None, None]

    A = jax.ops.segment_sum(P_src, src, num_segments=num_nodes)
    A0 = jax.ops.segment_sum(P_tar * zero_c[:, None, None, None, None], dst,
                             num_segments=num_nodes)
    B = jax.ops.segment_sum(P_tar, group_tar, num_segments=num_groups)

    w_on_c = w_on.astype(jnp.complex64)
    w_off_c = w_off.astype(jnp.complex64)
    h_on = (t_on + A + A0) * w_on_c[:, None, :, None, :]
    h_off = (t_on[src] + t_on[dst] * zero_c[:, None, None, None, None]
             + A[src] + B[group_tar]) * w_off_c[:, None, :, None, :]
    return h_on, h_off


class HamGNNMagneticOut(fnn.Module):
    """Spin-constrained output head (reference forward :3183-3616).

    Branches:
      * ``collinear_spin``: two real spin channels (N, 2, nao^2) with sigma_z
        Heisenberg corrections;
      * non-collinear (optionally with so3 SOC): (2 nao)^2 real/imag parts with
        full sigma.S Heisenberg corrections.
    """

    irreps_in_node: str
    irreps_in_edge: str
    nao_max: int = 14
    ham_type: str = "openmx"
    soc_switch: bool = False
    collinear_spin: bool = False
    use_learned_weight: bool = True
    min_magnetic_moment: float = 0.5
    add_H0: bool = True
    symmetrize: bool = True
    nonlinearity_type: str = "gate"
    # collinear spin-polarized band branch (reference hamgnn_output.py
    # :3727-3767): per-spin-channel generalized bands from the up/down
    # Hamiltonian stacks against the (spin-independent) reference overlap
    calculate_band_energy: bool = False
    num_k: int = 5
    band_num_control: int = 8
    k_path: Optional[object] = None
    export_reciprocal_values: bool = False

    @fnn.compact
    def __call__(self, graph: Graph, representation, k_vecs=None):
        from .output import HamLayer, _merge_reorder_matrix, hamiltonian_irreps

        basis = get_basis_set(self.ham_type, self.nao_max)
        nao = basis.nao_max
        node_attr = representation["node_attr"]
        edge_attr = representation["edge_attr"]
        dtype = node_attr.dtype
        src, dst = graph.edge_index[0], graph.edge_index[1]
        inv_edge = graph.inv_edge_idx
        ham_irreps = hamiltonian_irreps(basis)
        M = jnp.asarray(_merge_reorder_matrix(self.ham_type, self.nao_max), dtype)

        mask_table = jnp.asarray(basis.orbital_mask_table, dtype)
        node_orb = mask_table[graph.z]
        on_pair = (node_orb[:, :, None] * node_orb[:, None, :]) \
            * graph.node_mask[:, None, None].astype(dtype)
        off_pair = (node_orb[src][:, :, None] * node_orb[dst][:, None, :]) \
            * graph.edge_mask[:, None, None].astype(dtype)

        def sym_on(m, sign=1.0):
            return 0.5 * (m + sign * jnp.swapaxes(m, -1, -2))

        def sym_off(m, sign=1.0):
            return 0.5 * (m + sign * jnp.swapaxes(m[inv_edge], -1, -2))

        def merged_head(feats, irreps_in, name, off=False):
            comps = HamLayer(irreps_in=Irreps(irreps_in), irreps_out=ham_irreps,
                             nonlinearity_type=self.nonlinearity_type, name=name)(feats)
            m = (comps @ M).reshape(-1, nao, nao)
            m = (sym_off(m) if off else sym_on(m)) if self.symmetrize else m
            return m * (off_pair if off else on_pair)

        # spatial Hamiltonian
        h_on = merged_head(node_attr, self.irreps_in_node, "onsite_hamiltonian")
        h_off = merged_head(edge_attr, self.irreps_in_edge, "offsite_hamiltonian", off=True)

        # learned weights
        if self.use_learned_weight:
            w_on = merged_head(node_attr, self.irreps_in_node, "onsite_weight")
            w_off = merged_head(edge_attr, self.irreps_in_edge, "offsite_weight", off=True)
        else:
            # unit weights still carry the orbital mask: the reference's
            # weights are always passed through
            # apply_orbital_masks_to_hamiltonians (:3248) before entering the
            # Heisenberg contractions, so invalid-orbital entries of the
            # magnetic term are zero — without this the aggregated J sums
            # put weight on entries the (masked) targets zero out, an
            # irreducible fitting floor
            w_on = on_pair
            w_off = off_pair

        # J couplings
        J_ir = j_irreps(basis, self.soc_switch)
        J_on_c = HamLayer(irreps_in=Irreps(self.irreps_in_node), irreps_out=J_ir,
                          nonlinearity_type=self.nonlinearity_type,
                          name="onsite_J")(node_attr)
        J_off_c = HamLayer(irreps_in=Irreps(self.irreps_in_edge), irreps_out=J_ir,
                           nonlinearity_type=self.nonlinearity_type,
                           name="offsite_J")(edge_attr)
        if self.soc_switch:
            MJ = jnp.asarray(
                _rank2_merge_matrix(self.ham_type, self.nao_max), dtype
            ).reshape(-1, nao * nao * 9)
            J_on = (J_on_c @ MJ).reshape(-1, nao, nao, 3, 3)
            J_off = (J_off_c @ MJ).reshape(-1, nao, nao, 3, 3)
        else:
            M0 = jnp.asarray(
                _rank0_merge_matrix(self.ham_type, self.nao_max), dtype
            ).reshape(-1, nao * nao)
            J_on = (J_on_c @ M0).reshape(-1, nao, nao)
            J_off = (J_off_c @ M0).reshape(-1, nao, nao)

        spin_vec = graph.spin_vec if graph.spin_vec is not None else \
            jnp.zeros((graph.num_nodes, 3), dtype)
        spin_len = graph.spin_length if graph.spin_length is not None else \
            jnp.zeros(graph.num_nodes, dtype)
        magnetic = (spin_len > self.min_magnetic_moment).astype(dtype)

        hh_on, hh_off = heisenberg_terms(
            graph, J_on, J_off, w_on, w_off, spin_vec, magnetic,
            soc=self.soc_switch, collinear=self.collinear_spin)

        result = {}
        n_orb = jnp.asarray(basis.num_orbital_table, jnp.float32)
        eff = jnp.sum((n_orb[graph.z] * graph.node_mask) ** 2) + jnp.sum(
            n_orb[graph.z[src]] * n_orb[graph.z[dst]] * graph.edge_mask)
        total = (jnp.sum(graph.node_mask) + jnp.sum(graph.edge_mask)) * float(nao * nao)
        result["sparsity_ratio"] = total / jnp.maximum(eff, 1.0)

        if self.collinear_spin:
            up_on = h_on + hh_on[:, 0, :, 0, :]
            dn_on = h_on + hh_on[:, 1, :, 1, :]
            up_off = h_off + hh_off[:, 0, :, 0, :]
            dn_off = h_off + hh_off[:, 1, :, 1, :]
            col_on = jnp.stack([up_on, dn_on], axis=1).reshape(-1, 2, nao * nao)
            col_off = jnp.stack([up_off, dn_off], axis=1).reshape(-1, 2, nao * nao)
            if self.add_H0 and graph.Hon0 is not None:
                col_on = col_on + graph.Hon0
                col_off = col_off + graph.Hoff0
            result["hamiltonian_on"] = col_on
            result["hamiltonian_off"] = col_off
            result["mask_on"] = jnp.broadcast_to(
                on_pair.reshape(-1, 1, nao * nao), col_on.shape)
            result["mask_off"] = jnp.broadcast_to(
                off_pair.reshape(-1, 1, nao * nao), col_off.shape)

            if self.calculate_band_energy and k_vecs is not None:
                # per-spin-channel band solve (reference :3727-3767): each
                # channel against the spin-independent reference overlap;
                # up/down stacked on the crystal axis like torch.cat(dim=0)
                from ..physics.band import band_energies_batched

                def solve(h_on_s, h_off_s, want_sym):
                    return band_energies_batched(
                        graph, h_on_s, h_off_s, graph.Son, graph.Soff,
                        k_vecs, basis, num_bands=self.band_num_control,
                        export_H_sym=want_sym)

                want_sym = not self.export_reciprocal_values
                up = solve(col_on[:, 0, :], col_off[:, 0, :], want_sym)
                dn = solve(col_on[:, 1, :], col_off[:, 1, :], want_sym)
                result["band_energy_up"], result["band_gap_up"] = up[0], up[2]
                result["band_energy_down"], result["band_gap_down"] = dn[0], dn[2]
                result["band_energy"] = jnp.concatenate([up[0], dn[0]], axis=0)
                result["wavefunction"] = jnp.concatenate([up[1], dn[1]], axis=0)
                result["band_gap"] = jnp.concatenate([up[2], dn[2]], axis=0)
                if want_sym:
                    # reference keeps the last channel's H_sym (:3747-3749)
                    result["H_sym"] = dn[3]

                # reference targets (no_grad, :3757-3763)
                t_on = jax.lax.stop_gradient(graph.Hon)
                t_off = jax.lax.stop_gradient(graph.Hoff)
                up_r = solve(t_on[:, 0, :], t_off[:, 0, :], False)
                dn_r = solve(t_on[:, 1, :], t_off[:, 1, :], False)
                result["band_energy_ref"] = jnp.concatenate(
                    [up_r[0], dn_r[0]], axis=0)
                result["band_gap_ref"] = jnp.concatenate(
                    [up_r[2], dn_r[2]], axis=0)
            return result

        # non-collinear: doubled spin structure, complex Heisenberg
        big = 2 * nao
        base_on = jnp.zeros((h_on.shape[0], big, big), dtype)
        base_on = base_on.at[:, :nao, :nao].set(h_on)
        base_on = base_on.at[:, nao:, nao:].set(h_on)
        base_off = jnp.zeros((h_off.shape[0], big, big), dtype)
        base_off = base_off.at[:, :nao, :nao].set(h_off)
        base_off = base_off.at[:, nao:, nao:].set(h_off)

        hh_on_m = hh_on.reshape(-1, big, big)
        hh_off_m = hh_off.reshape(-1, big, big)
        h_on_r = base_on + hh_on_m.real
        h_on_i = hh_on_m.imag
        h_off_r = base_off + hh_off_m.real
        h_off_i = hh_off_m.imag

        if self.symmetrize:
            h_on_r = sym_on(h_on_r, 1.0)
            h_off_r = sym_off(h_off_r, 1.0)
            h_on_i = sym_on(h_on_i, -1.0)
            h_off_i = sym_off(h_off_i, -1.0)

        if self.add_H0 and graph.Hon0 is not None:
            h_on_r = h_on_r + graph.Hon0.reshape(-1, big, big)
            h_off_r = h_off_r + graph.Hoff0.reshape(-1, big, big)
            if graph.iHon0 is not None:
                h_on_i = h_on_i + graph.iHon0.reshape(-1, big, big)
                h_off_i = h_off_i + graph.iHoff0.reshape(-1, big, big)

        def tile_mask(pair):
            m = jnp.concatenate([pair, pair], axis=1)
            return jnp.concatenate([m, m], axis=2)

        result["hamiltonian_real_on"] = h_on_r.reshape(-1, big * big)
        result["hamiltonian_real_off"] = h_off_r.reshape(-1, big * big)
        result["hamiltonian_imag_on"] = h_on_i.reshape(-1, big * big)
        result["hamiltonian_imag_off"] = h_off_i.reshape(-1, big * big)
        result["mask_on"] = tile_mask(on_pair).reshape(-1, big * big)
        result["mask_off"] = tile_mask(off_pair).reshape(-1, big * big)
        return result
