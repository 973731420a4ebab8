"""HamGNN++ output head: irreps features -> nao x nao Hamiltonian blocks.

TPU-native redesign of the reference's ``HamGNNPlusPlusOut``
(/root/reference/hamgnn/models/hamgnn_output.py:60-4021).  Key structural
change: the reference loops over orbital pairs contracting each irreps
component with sqrt(2L+1) * wigner_3j at runtime (:851-891) and then permutes
rows/cols (``reorder_matrix``, :1056-1096).  Both are *fixed linear maps*, so
here they are precomputed host-side into one (irreps_dim, nao^2) matrix and the
whole block assembly becomes a single MXU matmul per atom/edge.  Symmetrization
(:1231-1366), orbital masking (:2288-2365), H0 addition (:3603-3612),
zero-point shift (:3886-3985) and the sparsity ratio (:2784-2872) follow as
masked vector ops on the padded graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..data.graph import Graph
from ..e3.irreps import Irreps
from ..e3.linear import Linear
from ..e3.wigner import wigner_3j
from ..nn.blocks import ResidualBlock
from .basis import BasisSetInfo, get_basis_set, hamiltonian_irreps


@functools.lru_cache(maxsize=None)
def _merge_reorder_matrix(ham_type: str, nao_max: int) -> np.ndarray:
    """(irreps_dim, nao^2) matrix: irreps components -> DFT-ordered nao block.

    Fuses merge_tensor_components (sqrt(2L+1) * w3j contraction) with
    reorder_matrix (index_change permutation + minus_index sign flips).
    """
    basis = get_basis_set(ham_type, nao_max)
    nao = basis.nao_max
    irreps = hamiltonian_irreps(basis)
    D = irreps.dim
    M = np.zeros((D, nao, nao))

    comp = 0
    row_start = 0
    for _, li in basis.orbital_irreps:
        di = li.dim
        col_start = 0
        for _, lj in basis.orbital_irreps:
            dj = lj.dim
            for L in range(abs(li.l - lj.l), li.l + lj.l + 1):
                cg = np.sqrt(2 * L + 1) * wigner_3j(li.l, lj.l, L)  # (di, dj, 2L+1)
                for m in range(2 * L + 1):
                    M[comp + m, row_start : row_start + di, col_start : col_start + dj] += cg[:, :, m]
                comp += 2 * L + 1
            col_start += dj
        row_start += di
    assert comp == D

    # fold in reorder: new[p, q] = old[index_change[p], index_change[q]]
    if basis.index_change is not None:
        M = M[:, basis.index_change[:, None], basis.index_change[None, :]]
    if basis.minus_index is not None:
        sign = np.ones(nao)
        sign[basis.minus_index] = -1.0
        M = M * sign[None, :, None] * sign[None, None, :]
    return np.ascontiguousarray(M.reshape(D, nao * nao))


@functools.lru_cache(maxsize=None)
def _decompose_matrix(ham_type: str, nao_max: int) -> np.ndarray:
    """(nao^2, irreps_dim) inverse map: DFT block -> irreps components.

    The sqrt(2L+1)-scaled w3j rows are orthonormal (3j orthogonality) and the
    reorder step is a signed permutation, so the merge matrix is orthogonal and
    the inverse is simply its transpose.
    """
    return np.ascontiguousarray(_merge_reorder_matrix(ham_type, nao_max).T)


class HamLayer(fnn.Module):
    """ResidualBlock + equivariant Linear head (reference :38-58,832-849)."""

    irreps_in: Irreps
    irreps_out: Irreps
    nonlinearity_type: str = "gate"

    @fnn.compact
    def __call__(self, x):
        x = ResidualBlock(
            irreps_in=Irreps(self.irreps_in),
            irreps_hidden=Irreps(self.irreps_in),
            resnet=True,
            nonlinearity_type=self.nonlinearity_type,
            name="residual",
        )(x)
        return Linear(Irreps(self.irreps_in), Irreps(self.irreps_out), name="head")(x)


class HamGNNPlusPlusOut(fnn.Module):
    """Non-magnetic / non-SOC output head (SOC & spin variants in
    :mod:`hamgnn_tpu.models.soc` / ``spin``).

    Returns a dict with per-atom ``hamiltonian_on`` (N, nao^2), per-edge
    ``hamiltonian_off`` (E, nao^2), optional overlaps, masks, and the sparsity
    ratio.  Use :func:`concatenate_by_crystal` for the reference's interleaved
    export layout.
    """

    irreps_in_node: str
    irreps_in_edge: str
    nao_max: int = 14
    ham_type: str = "openmx"
    ham_only: bool = True
    symmetrize: bool = True
    add_H0: bool = True
    zero_point_shift: bool = True
    nonlinearity_type: str = "gate"
    calculate_band_energy: bool = False
    num_k: int = 5
    # None -> random k (reference fallback), 'auto' -> Setyawan-Curtarolo
    # high-symmetry path from the lattice (KPathSeek equivalent,
    # hamgnn_output.py:3672-3726), tuple of reduced nodes -> user path
    k_path: Optional[Any] = None
    band_num_control: int = 8
    # dict-valued band_num_control (reference hamgnn_output.py:1736-1742,
    # 1939-1942): per-species counts as a hashable ((z, count), ...) tuple.
    # When set, the lowest `band_num_control` bands are exported with a
    # per-crystal validity mask instead of a window around half filling.
    band_species_counts: Optional[Tuple[Tuple[int, int], ...]] = None
    export_mask: bool = True
    export_reciprocal_values: bool = False

    def _basis(self) -> BasisSetInfo:
        return get_basis_set(self.ham_type, self.nao_max)

    def __call__(self, graph: Graph, representation: Dict[str, jnp.ndarray],
                 k_vecs: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        from .view import as_view

        return self.forward_view(as_view(graph), representation, k_vecs=k_vecs)

    @fnn.compact
    def forward_view(self, view, representation: Dict[str, jnp.ndarray],
                     k_vecs: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Shared head forward over a GraphView: single-device (dense view)
        and halo edge partition (all_to_all inverse-edge exchange + psum
        reductions) run the same code; band energies need the whole-crystal
        Graph and are computed when ``view.graph`` is set."""
        basis = self._basis()
        nao = basis.nao_max
        ham_irreps = hamiltonian_irreps(basis)
        node_attr = representation["node_attr"]
        edge_attr = representation["edge_attr"]
        dtype = node_attr.dtype

        M_np = _merge_reorder_matrix(self.ham_type, self.nao_max)
        M = jnp.asarray(M_np, dtype)
        # transpose-fused merge matrix: M_T columns are M's with the (i,j)
        # block indices swapped, so the Hermitian mates come straight out of
        # the head matmul — no (n, nao, nao) transpose ops on device (those
        # compile to layout-pathological fusions, ~5 ms/step at 512 atoms)
        tperm = (np.arange(nao * nao).reshape(nao, nao).T).reshape(-1)
        M_T = jnp.asarray(M_np[:, tperm], dtype)
        mask_table = jnp.asarray(basis.orbital_mask_table, dtype)

        def blocks_from(head_name, feats, irreps_in):
            comps = HamLayer(
                irreps_in=Irreps(irreps_in),
                irreps_out=ham_irreps,
                nonlinearity_type=self.nonlinearity_type,
                name=head_name,
            )(feats)
            if not self.symmetrize:
                return comps @ M, None
            # merge + reorder (+ transposed variant) as two matmuls
            return comps @ M, comps @ M_T

        def hermitize_on(pair):
            h, hT = pair
            return 0.5 * (h + hT)

        def hermitize_off(pair):
            h, hT = pair
            return 0.5 * (h + view.inv_exchange(hT))

        node_orb = mask_table[view.z]                      # (N, nao)
        on_mask = (node_orb[:, :, None] * node_orb[:, None, :]).reshape(-1, nao * nao)
        off_mask = (mask_table[view.z_src][:, :, None]
                    * mask_table[view.z_dst][:, None, :]).reshape(-1, nao * nao)
        on_mask = on_mask * view.node_mask[:, None].astype(dtype)
        off_mask = off_mask * view.edge_mask[:, None].astype(dtype)

        result: Dict[str, jnp.ndarray] = {}

        # --- overlap heads (ham_only=False) ------------------------------
        if not self.ham_only:
            s_on = blocks_from("onsite_overlap", node_attr, self.irreps_in_node)
            s_on = hermitize_on(s_on) if self.symmetrize else s_on[0]
            s_off = blocks_from("offsite_overlap", edge_attr, self.irreps_in_edge)
            s_off = hermitize_off(s_off) if self.symmetrize else s_off[0]
            s_on = s_on * on_mask
            s_off = s_off * off_mask
            result["overlap_on"] = s_on
            result["overlap_off"] = s_off

        # --- Hamiltonian heads -------------------------------------------
        h_on = blocks_from("onsite_hamiltonian", node_attr, self.irreps_in_node)
        h_on = hermitize_on(h_on) if self.symmetrize else h_on[0]
        if self.add_H0 and view.Hon0 is not None:
            h_on = h_on + view.Hon0

        h_off = blocks_from("offsite_hamiltonian", edge_attr, self.irreps_in_edge)
        h_off = hermitize_off(h_off) if self.symmetrize else h_off[0]
        if self.add_H0 and view.Hoff0 is not None:
            h_off = h_off + view.Hoff0

        h_on = h_on * on_mask
        h_off = h_off * off_mask

        # --- zero-point shift (reference :3958-3985) ---------------------
        if self.zero_point_shift and view.Son is not None and view.Hon is not None:
            thresh = 1e-6
            s_on_ref, s_off_ref = view.Son, view.Soff
            w_on = (s_on_ref > thresh).astype(dtype) * on_mask
            w_off = (s_off_ref > thresh).astype(dtype) * off_mask
            num = view.psum(jnp.sum(w_on * (h_on - view.Hon))
                            + jnp.sum(w_off * (h_off - view.Hoff)))
            den = view.psum(jnp.sum(w_on * s_on_ref)
                            + jnp.sum(w_off * s_off_ref))
            shift = num / jnp.maximum(den, 1e-12)
            h_on = h_on - shift * s_on_ref * on_mask
            h_off = h_off - shift * s_off_ref * off_mask

        result["hamiltonian_on"] = h_on
        result["hamiltonian_off"] = h_off
        if self.export_mask:
            result["mask_on"] = on_mask
            result["mask_off"] = off_mask

        # --- sparsity ratio (reference :2784-2872) -----------------------
        n_orb = jnp.asarray(basis.num_orbital_table, jnp.float32)
        n_i = n_orb[view.z] * view.node_mask
        eff = view.psum(jnp.sum(n_i * n_i) + jnp.sum(
            n_orb[view.z_src] * n_orb[view.z_dst] * view.edge_mask))
        total = view.psum(jnp.sum(view.node_mask)
                          + jnp.sum(view.edge_mask)) * float(nao * nao)
        result["sparsity_ratio"] = total / jnp.maximum(eff, 1.0)

        # --- band energies -----------------------------------------------
        graph = view.graph
        if self.calculate_band_energy and k_vecs is not None \
                and graph is not None:
            from ..physics.band import band_counts_per_crystal, band_energies_batched

            band_counts = None
            if self.band_species_counts is not None:
                band_counts = band_counts_per_crystal(graph, self.band_species_counts)

            # whole-crystal row order for the k-space assembly: identity on
            # the dense view; all_gather + unpermute under the halo partition
            h_on_g = view.gather_nodes_global(h_on)
            h_off_g = view.gather_edges_global(h_off)
            # ham_only=False + export_reciprocal: SK export comes from the
            # PREDICTED overlap while the solve factorizes the reference S —
            # the reference's calculate_band_energies_with_overlap contract
            # (hamgnn_output.py:1368-1673, dispatch :3858-3868)
            sk_pred = {}
            if self.export_reciprocal_values and not self.ham_only:
                sk_pred = {
                    "sk_export_on": view.gather_nodes_global(result["overlap_on"]),
                    "sk_export_off": view.gather_edges_global(result["overlap_off"]),
                }
            # H_sym (Cholesky-transformed H) is exported on the non-reciprocal
            # band path, as in the reference (:3871, :3993)
            want_H_sym = not self.export_reciprocal_values
            out = band_energies_batched(
                graph, h_on_g, h_off_g, graph.Son, graph.Soff, k_vecs, basis,
                num_bands=self.band_num_control,
                export_reciprocal=self.export_reciprocal_values,
                band_counts=band_counts, export_H_sym=want_H_sym, **sk_pred)
            band, wfn, gap, *extras = out
            if band_counts is not None:
                result["band_mask"] = extras.pop(0)
            if self.export_reciprocal_values:
                result["HK"] = extras.pop(0)
                result["SK"] = extras.pop(0)
                if len(extras) > (1 if want_H_sym else 0):
                    result["dSK"] = extras.pop(0)
            if want_H_sym:
                result["H_sym"] = extras.pop(0)
            result["band_energy"] = band
            result["wavefunction"] = wfn
            result["band_gap"] = gap
            ref_out = band_energies_batched(
                graph, jax.lax.stop_gradient(graph.Hon), jax.lax.stop_gradient(graph.Hoff),
                graph.Son, graph.Soff, k_vecs, basis,
                num_bands=self.band_num_control, band_counts=band_counts,
                export_H_sym=want_H_sym)
            ref_band, ref_gap = ref_out[0], ref_out[2]
            result["band_energy_ref"] = ref_band
            result["band_gap_ref"] = ref_gap
            # reference-H counterparts so wavefunction / H_sym can sit under a
            # loss spec like any other result-dict key (reference
            # Model.py:128-179 iterates arbitrary keys)
            result["wavefunction_ref"] = ref_out[1]
            if want_H_sym:
                result["H_sym_ref"] = ref_out[3 + (1 if band_counts is not None else 0)]
            if self.zero_point_shift:
                result["band_energy"] = band - jnp.mean(band - ref_band)

        return result


def concatenate_by_crystal(graph: Graph, on_rows: np.ndarray, off_rows: np.ndarray):
    """Host-side export helper replicating the reference's interleaved layout
    (onsite rows then offsite rows per crystal; hamgnn_output.py:1187-1229)."""
    on_rows = np.asarray(on_rows)
    off_rows = np.asarray(off_rows)
    node_counts = np.asarray(graph.node_counts)
    edge_counts = np.asarray(graph.edge_counts)
    out = []
    n_ofs = e_ofs = 0
    for b in range(len(node_counts)):
        n, e = int(node_counts[b]), int(edge_counts[b])
        out.append(on_rows[n_ofs : n_ofs + n])
        out.append(off_rows[e_ofs : e_ofs + e])
        n_ofs += n
        e_ofs += e
    return np.concatenate(out, axis=0)
