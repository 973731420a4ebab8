"""Spin-orbit-coupling output heads (su2 spinor codec and so3 ksi path).

TPU-native redesign of the reference's SOC machinery:
  * ``E3TensorDecomposition`` (/root/reference/hamgnn/nn/tensor_decomposition.py:421-664)
    couples each (l1,l2) orbital-pair channel with spin-0 and spin-1 parts and
    maps irreps components to complex 2x2-spin nao blocks through Wigner-3j
    contractions and the ``oyzx2spin`` transform (:560-564).  All of that is a
    fixed complex-linear map, so here it is precomputed host-side into a single
    (D, 4*nao^2) complex matrix — the runtime codec is one complex matmul
    (four real MXU matmuls), with the DFT ``reorder`` permutation folded in.
  * The so3 path (hamgnn_output.py:3026-3146): scalar ksi couplings times the
    angular-momentum matrices Lon/Loff fill the 2x2 spin structure of H_soc.
  * SOC forward (hamgnn_output.py:3021-3181): Hermitian symmetrization over
    the doubled (2 nao) dimension with inverse edges, per-spin-block orbital
    masks, H0 addition, zero-point shift on the spin-diagonal blocks.

Design divergence (documented): the reference allocates its su2 head with
``2 * required_irreps_out`` where ``required_irreps_out`` is already re/im
doubled (hamgnn_output.py:188-198), leaving half of the head output unused by
``get_H`` (tensor_decomposition.py:575-592 slices only the base dims).  Here
the head emits exactly the used components: base irreps doubled once (re||im).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..data.graph import Graph
from ..e3.irreps import Irrep, Irreps
from ..e3.wigner import wigner_3j
from .basis import BasisSetInfo, get_basis_set, hamiltonian_irreps
from .output import HamLayer, _merge_reorder_matrix

_SQRT2 = 1.4142135623730951

# (scalar, y, z, x)-coupled spin channel -> (uu, ud, du, dd), reference
# tensor_decomposition.py:560-564.
_OYZX2SPIN = np.array(
    [[1, 0, 1, 0],
     [0, -1j, 0, 1],
     [0, 1j, 0, 1],
     [1, 0, -1, 0]], dtype=np.complex128) / _SQRT2


def su2_base_irreps(basis: BasisSetInfo) -> Irreps:
    """Irreps layout of the (un-doubled) su2 head output: per (l1,l2) pair,
    the spin-0 parts for every L then the spin-1-coupled parts per L
    (reference irreps_from_l1l2, tensor_decomposition.py:39-86)."""
    out = Irreps()
    for _, li in basis.orbital_irreps:
        for _, lj in basis.orbital_irreps:
            p = (-1) ** (li.l + lj.l)
            Ls = list(range(abs(li.l - lj.l), li.l + lj.l + 1))
            out = out + Irreps([(1, (L, p)) for L in Ls])
            for L in Ls:
                out = out + Irreps([(1, (Lp, p)) for Lp in range(abs(L - 1), L + 2)])
    return out


@functools.lru_cache(maxsize=None)
def su2_codec_matrix(ham_type: str, nao_max: int) -> np.ndarray:
    """(D_base, 4*nao^2) complex64 matrix: complex irreps vector -> flattened
    (uu,ud,du,dd) nao x nao spin blocks in DFT orbital order."""
    basis = get_basis_set(ham_type, nao_max)
    nao = basis.nao_max
    M = np.zeros((su2_base_irreps(basis).dim, 4, nao, nao), dtype=np.complex128)

    d = 0
    row_start = 0
    for _, li in basis.orbital_irreps:
        ni = li.dim
        col_start = 0
        for _, lj in basis.orbital_irreps:
            nj = lj.dim
            Ls = list(range(abs(li.l - lj.l), li.l + lj.l + 1))
            # local basis: x = [scalars per L | spin1 parts per L]
            dim_scalar = sum(2 * L + 1 for L in Ls)
            dims_sp = [sum(2 * Lp + 1 for Lp in range(abs(L - 1), L + 2)) for L in Ls]
            dim_pair = dim_scalar + sum(dims_sp)

            # wms: (ni, nj, dim_scalar) CG for L -> (m1, m2)
            wm = np.concatenate([wigner_3j(li.l, lj.l, L) for L in Ls], axis=-1)

            for col in range(dim_pair):
                x = np.zeros(dim_pair)
                x[col] = 1.0
                # build B[(sum 2L+1), 4] in (scalar, y,z,x) channels
                B = np.zeros((dim_scalar, 4), dtype=np.complex128)
                B[:, 0] = x[:dim_scalar]
                ofs_sp = dim_scalar
                ofs_m = 0
                for L, dsp in zip(Ls, dims_sp):
                    xL = x[ofs_sp : ofs_sp + dsp]
                    wm_sp = np.concatenate(
                        [wigner_3j(L, 1, Lp) for Lp in range(abs(L - 1), L + 2)],
                        axis=-1)  # (2L+1, 3, dsp)
                    B[ofs_m : ofs_m + 2 * L + 1, 1:4] = np.einsum("jkl,l->jk", wm_sp, xL)
                    ofs_sp += dsp
                    ofs_m += 2 * L + 1
                # blocks[s, m1, m2] = sum_{m,n} B[m, n] wm[m1, m2, m] oyzx2spin[s, n]
                blk = np.einsum("mn,klm,jn->jkl", B, wm, _OYZX2SPIN)
                M[d + col, :, row_start : row_start + ni, col_start : col_start + nj] = blk
            d += dim_pair
            col_start += nj
        row_start += ni

    # fold in DFT reorder (same signed permutation as the non-SOC head)
    if basis.index_change is not None:
        M = M[:, :, basis.index_change[:, None], basis.index_change[None, :]]
    if basis.minus_index is not None:
        s = np.ones(nao)
        s[basis.minus_index] = -1.0
        M = M * s[None, None, :, None] * s[None, None, None, :]
    return np.ascontiguousarray(M.reshape(M.shape[0], 4 * nao * nao).astype(np.complex64))


class HamGNNSOCOut(fnn.Module):
    """SOC output head producing real/imag (2 nao)^2 Hamiltonians.

    Result keys: hamiltonian_real_on/off, hamiltonian_imag_on/off plus masks
    and sparsity_ratio; the loss layer concatenates real||imag rows like the
    reference (hamgnn_output.py:3616-3626).
    """

    irreps_in_node: str
    irreps_in_edge: str
    nao_max: int = 14
    ham_type: str = "openmx"
    soc_basis: str = "su2"
    add_H0: bool = True
    add_H_nonsoc: bool = False
    symmetrize: bool = True
    zero_point_shift: bool = False
    nonlinearity_type: str = "gate"
    # SOC secondary training: spinor 2*nao complex generalized band solve
    # (reference hamgnn_output.py:1998-2287); k_vecs supplied by the trainer
    calculate_band_energy: bool = False
    num_k: int = 5
    band_num_control: int = 8
    k_path: Optional[object] = None

    def __call__(self, graph: Graph, representation: Dict[str, jnp.ndarray],
                 k_vecs=None, h_nonsoc=None) -> Dict[str, jnp.ndarray]:
        from .view import as_view

        return self.forward_view(as_view(graph), representation,
                                 k_vecs=k_vecs, h_nonsoc=h_nonsoc)

    @fnn.compact
    def forward_view(self, view, representation: Dict[str, jnp.ndarray],
                     k_vecs=None, h_nonsoc=None) -> Dict[str, jnp.ndarray]:
        """Shared SOC head forward over a GraphView (see models/view.py):
        the halo edge partition injects all_to_all hooks; single-device uses
        the dense view.  Spinor band energies need the whole-crystal Graph
        (``view.graph``)."""
        basis = get_basis_set(self.ham_type, self.nao_max)
        nao = basis.nao_max
        node_attr = representation["node_attr"]
        edge_attr = representation["edge_attr"]
        dtype = node_attr.dtype

        mask_table = jnp.asarray(basis.orbital_mask_table, dtype)
        node_orb = mask_table[view.z]
        on_pair = node_orb[:, :, None] * node_orb[:, None, :]
        off_pair = (mask_table[view.z_src][:, :, None]
                    * mask_table[view.z_dst][:, None, :])
        on_pair = on_pair * view.node_mask[:, None, None].astype(dtype)
        off_pair = off_pair * view.edge_mask[:, None, None].astype(dtype)

        def herm2(h, inv=False, sign=1.0):
            """(anti-)Hermitian symmetrization of (n, 2nao, 2nao) complex."""
            if not self.symmetrize:
                return h
            n, d1, d2 = h.shape
            hm = (view.inv_exchange(h.reshape(n, d1 * d2)).reshape(n, d1, d2)
                  if inv else h)
            ht = jnp.swapaxes(hm, -1, -2).conj()
            return 0.5 * (h + sign * ht)

        if self.soc_basis == "su2":
            base = su2_base_irreps(basis)
            head_irreps = base + base  # re || im
            D = base.dim
            M = jnp.asarray(su2_codec_matrix(self.ham_type, self.nao_max))

            def spin_blocks(feats, irreps_in, name):
                out = HamLayer(irreps_in=Irreps(irreps_in), irreps_out=head_irreps,
                               nonlinearity_type=self.nonlinearity_type,
                               name=name)(feats)
                z = out[:, :D] + 1j * out[:, D:]
                flat = z @ M                       # (n, 4*nao^2) complex
                blk = flat.reshape(-1, 2, 2, nao, nao)
                blk = jnp.swapaxes(blk, 2, 3)      # (n, 2, nao, 2, nao)
                return blk.reshape(-1, 2 * nao, 2 * nao)

            h_on = spin_blocks(node_attr, self.irreps_in_node, "onsite_hamiltonian")
            h_off = spin_blocks(edge_attr, self.irreps_in_edge, "offsite_hamiltonian")
            h_on = herm2(h_on)
            h_off = herm2(h_off, inv=True)

            # per-spin-block orbital masks: tile the nao mask into 2x2 blocks
            def tile_mask(pair):
                m = jnp.concatenate([pair, pair], axis=1)
                return jnp.concatenate([m, m], axis=2)

            m_on = tile_mask(on_pair)
            m_off = tile_mask(off_pair)
            h_on = h_on * m_on
            h_off = h_off * m_off

            h_on_r, h_on_i = h_on.real, h_on.imag
            h_off_r, h_off_i = h_off.real, h_off.imag

        elif self.soc_basis == "so3":
            # spin-independent Hamiltonian via the standard merge path
            ham_irreps = hamiltonian_irreps(basis)
            Mr = jnp.asarray(_merge_reorder_matrix(self.ham_type, self.nao_max), dtype)

            if self.add_H_nonsoc:
                # Uni-HamGNN path (reference :3028-3049): the spatial part comes
                # from an upstream non-SOC model prediction; H0's spin-diagonal
                # blocks are zeroed so only its spin-coupling part is added.
                assert h_nonsoc is not None, "add_H_nonsoc requires h_nonsoc=(on, off)"
                hs_on = h_nonsoc[0].reshape(-1, nao, nao) * on_pair
                hs_off = h_nonsoc[1].reshape(-1, nao, nao) * off_pair
            else:
                def spatial(feats, irreps_in, name):
                    comps = HamLayer(irreps_in=Irreps(irreps_in), irreps_out=ham_irreps,
                                     nonlinearity_type=self.nonlinearity_type,
                                     name=name)(feats)
                    return comps @ Mr

                h_spatial_on = spatial(node_attr, self.irreps_in_node, "onsite_hamiltonian")
                hs_on = h_spatial_on.reshape(-1, nao, nao)
                hs_on = 0.5 * (hs_on + jnp.swapaxes(hs_on, -1, -2)) if self.symmetrize else hs_on
                h_spatial_off = spatial(edge_attr, self.irreps_in_edge, "offsite_hamiltonian")
                hs_off = h_spatial_off.reshape(-1, nao, nao)
                if self.symmetrize:
                    n_e = hs_off.shape[0]
                    hs_inv = view.inv_exchange(
                        hs_off.reshape(n_e, nao * nao)).reshape(n_e, nao, nao)
                    hs_off = 0.5 * (hs_off + jnp.swapaxes(hs_inv, -1, -2))
                hs_on = hs_on * on_pair
                hs_off = hs_off * off_pair

            # ksi scalar couplings, orbital-block averaged
            def ksi_head(feats, irreps_in, name):
                out = HamLayer(irreps_in=Irreps(irreps_in),
                               irreps_out=Irreps(f"{nao * nao}x0e"),
                               nonlinearity_type=self.nonlinearity_type,
                               name=name)(feats)
                return _symmetrize_orbital_coefficients(out, basis)

            ksi_on = ksi_head(node_attr, self.irreps_in_node, "onsite_ksi")
            ksi_off = ksi_head(edge_attr, self.irreps_in_edge, "offsite_ksi")

            Lon = view.Lon.reshape(-1, nao * nao, 3)
            Loff = view.Loff.reshape(-1, nao * nao, 3)

            def sym_on(x, sign=1.0):
                m = x.reshape(-1, nao, nao)
                return 0.5 * (m + sign * jnp.swapaxes(m, -1, -2))

            def sym_off(x, sign=1.0):
                m = x.reshape(-1, nao, nao)
                minv = view.inv_exchange(m.reshape(-1, nao * nao)).reshape(
                    -1, nao, nao)
                return 0.5 * (m + sign * jnp.swapaxes(minv, -1, -2))

            def assemble(h_sp, ksi, L, sym):
                # real part: diag blocks = H_spatial; off-diag = sym-(anti)H of ksi*L_y
                ky = sym(ksi * L[:, :, 1], -1.0)
                kz = sym(ksi * L[:, :, 2], -1.0)
                kx = sym(ksi * L[:, :, 0], -1.0)
                n = h_sp.shape[0]
                hr = jnp.zeros((n, 2 * nao, 2 * nao), dtype)
                hr = hr.at[:, :nao, :nao].set(h_sp)
                hr = hr.at[:, nao:, nao:].set(h_sp)
                hr = hr.at[:, :nao, nao:].set(ky)
                hr = hr.at[:, nao:, :nao].set(ky)
                hi = jnp.zeros((n, 2 * nao, 2 * nao), dtype)
                hi = hi.at[:, :nao, :nao].set(kz)
                hi = hi.at[:, nao:, nao:].set(-kz)
                hi = hi.at[:, :nao, nao:].set(kx)
                hi = hi.at[:, nao:, :nao].set(-kx)
                return hr, hi

            h_on_r, h_on_i = assemble(hs_on, ksi_on, Lon, sym_on)
            h_off_r, h_off_i = assemble(hs_off, ksi_off, Loff, sym_off)

            def tile_mask(pair):
                m = jnp.concatenate([pair, pair], axis=1)
                return jnp.concatenate([m, m], axis=2)

            m_on = tile_mask(on_pair)
            m_off = tile_mask(off_pair)
        else:
            raise NotImplementedError(self.soc_basis)

        n2 = (2 * nao) ** 2
        h_on_r = h_on_r.reshape(-1, n2)
        h_on_i = h_on_i.reshape(-1, n2)
        h_off_r = h_off_r.reshape(-1, n2)
        h_off_i = h_off_i.reshape(-1, n2)

        if self.add_H0 and view.Hon0 is not None:
            hon0, hoff0 = view.Hon0, view.Hoff0
            if self.add_H_nonsoc:
                # zero the spin-diagonal blocks of H0 (reference :3038-3049):
                # the non-SOC prediction already carries the spatial H0
                def zero_diag(h):
                    hb = h.reshape(-1, 2, nao, 2, nao)
                    hb = hb.at[:, 0, :, 0, :].set(0.0)
                    hb = hb.at[:, 1, :, 1, :].set(0.0)
                    return hb.reshape(-1, (2 * nao) ** 2)

                hon0 = zero_diag(hon0)
                hoff0 = zero_diag(hoff0)
            h_on_r = h_on_r + hon0
            h_off_r = h_off_r + hoff0
            if view.iHon0 is not None:
                h_on_i = h_on_i + view.iHon0
                h_off_i = h_off_i + view.iHoff0

        result = {
            "hamiltonian_real_on": h_on_r,
            "hamiltonian_real_off": h_off_r,
            "hamiltonian_imag_on": h_on_i,
            "hamiltonian_imag_off": h_off_i,
            "mask_on": m_on.reshape(-1, n2) * view.node_mask[:, None].astype(dtype),
            "mask_off": m_off.reshape(-1, n2) * view.edge_mask[:, None].astype(dtype),
        }

        # zero-point shift on spin-diagonal real blocks (reference :3988-4015)
        if self.zero_point_shift and view.Son is not None and view.Hon is not None:
            thresh = 1e-6
            s_on, s_off = view.Son, view.Soff  # (n, nao^2)
            w_on = (s_on > thresh).astype(dtype) * view.node_mask[:, None]
            w_off = (s_off > thresh).astype(dtype) * view.edge_mask[:, None]

            def diag_blocks(h):
                hb = h.reshape(-1, 2, nao, 2, nao)
                return hb[:, 0, :, 0, :].reshape(-1, nao * nao), \
                    hb[:, 1, :, 1, :].reshape(-1, nao * nao)

            uu_on, dd_on = diag_blocks(h_on_r)
            uu_off, dd_off = diag_blocks(h_off_r)
            tuu_on, tdd_on = diag_blocks(view.Hon)
            tuu_off, tdd_off = diag_blocks(view.Hoff)
            num = view.psum(
                jnp.sum(w_on * ((uu_on + dd_on) - (tuu_on + tdd_on)))
                + jnp.sum(w_off * ((uu_off + dd_off) - (tuu_off + tdd_off))))
            den = 2.0 * view.psum(jnp.sum(w_on * s_on)
                                  + jnp.sum(w_off * s_off))
            shift = num / jnp.maximum(den, 1e-12)

            def apply_shift(h, s, w):
                hb = h.reshape(-1, 2, nao, 2, nao)
                corr = (shift * s * w).reshape(-1, nao, nao)
                hb = hb.at[:, 0, :, 0, :].add(-corr)
                hb = hb.at[:, 1, :, 1, :].add(-corr)
                return hb.reshape(-1, n2)

            result["hamiltonian_real_on"] = apply_shift(h_on_r, s_on, w_on)
            result["hamiltonian_real_off"] = apply_shift(h_off_r, s_off, w_off)

        # sparsity (per-spin-block elements scale equally; ratio is unchanged)
        n_orb = jnp.asarray(basis.num_orbital_table, jnp.float32)
        n_i = n_orb[view.z] * view.node_mask
        eff = view.psum(jnp.sum(n_i * n_i) + jnp.sum(
            n_orb[view.z_src] * n_orb[view.z_dst] * view.edge_mask))
        total = view.psum(jnp.sum(view.node_mask)
                          + jnp.sum(view.edge_mask)) * float(nao * nao)
        result["sparsity_ratio"] = total / jnp.maximum(eff, 1.0)

        # --- spinor band energies (SOC secondary training) ----------------
        graph = view.graph
        if self.calculate_band_energy and k_vecs is not None \
                and graph is not None and graph.Son is not None:
            from ..physics.band import band_energies_soc_batched

            band, wfn, gap = band_energies_soc_batched(
                graph,
                view.gather_nodes_global(result["hamiltonian_real_on"]),
                view.gather_nodes_global(result["hamiltonian_imag_on"]),
                view.gather_edges_global(result["hamiltonian_real_off"]),
                view.gather_edges_global(result["hamiltonian_imag_off"]),
                graph.Son, graph.Soff, k_vecs, basis,
                num_bands=self.band_num_control)
            result["band_energy"] = band
            result["wavefunction"] = wfn
            result["band_gap"] = gap
            if graph.Hon is not None and graph.iHon is not None:
                sg = jax.lax.stop_gradient
                ref_band, _, ref_gap = band_energies_soc_batched(
                    graph, sg(graph.Hon), sg(graph.iHon), sg(graph.Hoff),
                    sg(graph.iHoff), graph.Son, graph.Soff, k_vecs, basis,
                    num_bands=self.band_num_control)
                result["band_energy_ref"] = ref_band
                result["band_gap_ref"] = ref_gap
                if self.zero_point_shift:
                    result["band_energy"] = band - jnp.mean(band - ref_band)
        return result


def _symmetrize_orbital_coefficients(coeffs, basis: BasisSetInfo):
    """Average ksi coefficients within angular-momentum orbital blocks
    (reference hamgnn_output.py:2371-2440): rows then columns."""
    nao = basis.nao_max
    m = coeffs.reshape(-1, nao, nao)
    blocks = _orbital_blocks(basis)
    for s, e in blocks:
        mean = jnp.mean(m[:, s:e, :], axis=1, keepdims=True)
        m = m.at[:, s:e, :].set(jnp.broadcast_to(mean, (m.shape[0], e - s, nao)))
    for s, e in blocks:
        mean = jnp.mean(m[:, :, s:e], axis=2, keepdims=True)
        m = m.at[:, :, s:e].set(jnp.broadcast_to(mean, (m.shape[0], nao, e - s)))
    return m.reshape(-1, nao * nao)


def _orbital_blocks(basis: BasisSetInfo) -> List[Tuple[int, int]]:
    """(start, end) ranges of the non-trivial (l>0) orbital blocks in DFT order.

    Derived from the basis irreps (generalizes the reference's hard-coded
    nao-specific ranges, hamgnn_output.py:2403-2419)."""
    out = []
    ofs = 0
    for _, ir in basis.orbital_irreps:
        if ir.l > 0:
            out.append((ofs, ofs + ir.dim))
        ofs += ir.dim
    return out
