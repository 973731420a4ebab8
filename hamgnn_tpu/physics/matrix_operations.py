"""Legacy matrix <-> irreps transforms (reference parity module).

JAX equivalents of /root/reference/hamgnn/physics/matrix_operations.py
(TensorExpansion :35-215, OverlapExpand :217-239, TensorMerge :241-335).
The reference marks these off the v2.1 main path (nothing imports them),
but they are part of its public API surface, so they are reproduced here.

TPU-native redesign: the reference's per-(li, lj, L) ``einsum('nij,kij->nk')``
loops are fixed linear maps, so ``TensorExpansion`` is precomputed host-side
into one (nao^2, irreps_dim) matrix — the decomposition becomes a single MXU
matmul.  ``TensorMerge``'s data-dependent weighted expansion keeps the
reference's instruction semantics but evaluates each instruction as one
batched einsum chain.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..e3.irreps import Irrep, Irreps
from ..e3.linear import Linear
from ..e3.wigner import wigner_3j
from ..models.basis import get_basis_set


@functools.lru_cache(maxsize=None)
def _expansion_spec(ham_type: str, nao_max: int):
    """(matrix (nao^2, D_sorted), sorted Irreps) for block -> irreps projection.

    Matches the reference TensorExpansion.forward (:182-215): input blocks in
    DFT order are first reordered back to e3nn order (``_change_index_inv``,
    :167-179), each (li, lj, L) sub-block is contracted with the *raw* e3nn
    wigner_3j (no sqrt(2L+1) scaling; Clebsch_Gordan_coefficients.py:22-26),
    and outputs are concatenated in ``Irreps.sort()`` order (:55-57).
    """
    basis = get_basis_set(ham_type, nao_max)
    nao = basis.nao_max

    chunks = []          # (Irrep, (nao, nao, 2L+1) projector) per output chunk
    row_start = 0
    for _, li in basis.orbital_irreps:
        di = li.dim
        col_start = 0
        for _, lj in basis.orbital_irreps:
            dj = lj.dim
            for L in range(abs(li.l - lj.l), li.l + lj.l + 1):
                cg = wigner_3j(li.l, lj.l, L)            # (di, dj, 2L+1)
                proj = np.zeros((nao, nao, 2 * L + 1))
                proj[row_start : row_start + di, col_start : col_start + dj] = cg
                chunks.append((Irrep(L, (-1) ** (li.l + lj.l)), proj))
            col_start += dj
        row_start += di

    combined = Irreps([(1, ir) for ir, _ in chunks])
    sorted_irreps, p, _inv = combined.sort()
    # sort() gives p[old] = new; emit chunks in ascending new position
    order = sorted(range(len(chunks)), key=lambda i: p[i])

    # Fold the input-side ``_change_index_inv`` (sign flips at DFT positions,
    # then inverse permutation back to e3nn order; reference :167-179) into the
    # projector: T[i, j, m] = sign[i] sign[j] cg[index_change[i], index_change[j], m].
    sign = np.ones(nao)
    if basis.minus_index is not None:
        sign[np.asarray(basis.minus_index)] = -1.0
    perm = (np.asarray(basis.index_change)
            if basis.index_change is not None else np.arange(nao))

    cols = []
    for i in order:
        proj = chunks[i][1]
        proj = proj[perm[:, None], perm[None, :]]
        proj = proj * sign[:, None, None] * sign[None, :, None]
        cols.append(proj.reshape(nao * nao, -1))
    M = np.ascontiguousarray(np.concatenate(cols, axis=1))
    return M, sorted_irreps.simplify()


class TensorExpansion:
    """Project DFT-ordered (.., nao, nao) blocks onto irreps components.

    Reference: matrix_operations.py:35-215.  ``irreps_out`` is the sorted,
    simplified combined irreps; ``__call__`` is one matmul.
    """

    def __init__(self, ham_type: str, nao_max: int):
        self.ham_type = ham_type
        self.nao_max = nao_max
        M, self.irreps_out = _expansion_spec(ham_type, nao_max)
        self._M = M

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nao = self.nao_max
        flat = x.reshape(-1, nao * nao)
        return flat @ jnp.asarray(self._M, flat.dtype)


class OverlapExpand:
    """Attach ``Son_expand`` / ``Soff_expand`` irreps features to a graph dict.

    Reference: matrix_operations.py:217-239.
    """

    def __init__(self, ham_type: str, nao_max: int):
        self.tensor_expansion = TensorExpansion(ham_type, nao_max)
        self.irreps_overlap = self.tensor_expansion.irreps_out

    def __call__(self, data: dict) -> dict:
        data = dict(data)
        data["Son_expand"] = self.tensor_expansion(data["Son"])
        data["Soff_expand"] = self.tensor_expansion(data["Soff"])
        return data


class TensorMerge(fnn.Module):
    """Expand irreps features into (out1.dim x out2.dim) blocks with
    data-dependent path weights (reference matrix_operations.py:241-335).

    With ``internal_weights=False`` (the reference default) an equivariant
    Linear generates per-sample scalar weights + biases; each instruction
    (i, j, k) with ``ir_in in ir_out1 * ir_out2`` contributes
    ``einsum('ijk,buvk->buivj', w3j(l1, l2, l_in), w[b] @ x[b]) / mul_in``.
    """

    irreps_in: str
    irreps_out_1: str
    irreps_out_2: str
    internal_weights: bool = False

    @staticmethod
    def expansion_path(irreps_in: Irreps, out1: Irreps, out2: Irreps):
        ins = []
        for i, (mul_in, ir_in) in enumerate(irreps_in):
            for j, (mul1, ir1) in enumerate(out1):
                for k, (mul2, ir2) in enumerate(out2):
                    if ir_in in ir1 * ir2:
                        ins.append((i, j, k, (mul_in, mul1, mul2)))
        return ins

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps_in = Irreps(self.irreps_in)
        out1 = Irreps(self.irreps_out_1)
        out2 = Irreps(self.irreps_out_2)
        instructions = self.expansion_path(irreps_in, out1, out2)
        num_path = sum(int(np.prod(sh)) for *_ijk, sh in instructions)
        num_bias = sum(int(np.prod(sh[1:])) for i, _j, _k, sh in instructions if i == 0)
        B = x.shape[0]

        if self.internal_weights:
            w_all = self.param(
                "weights", fnn.initializers.uniform(1.0), (num_path + num_bias,))
            weights = jnp.broadcast_to(w_all[None, :num_path], (B, num_path))
            biases = jnp.broadcast_to(w_all[None, num_path:], (B, num_bias))
        else:
            wb = Linear(
                irreps_in, Irreps(f"{num_path + num_bias}x0e"), name="linear_weight_bias"
            )(x)
            weights, biases = wb[:, :num_path], wb[:, num_path:]

        slices = irreps_in.slices()
        x_chunks = [
            x[:, sl].reshape(B, mi.mul, mi.ir.dim) for sl, mi in zip(slices, irreps_in)
        ]

        outputs = {}
        w_ofs = b_ofs = 0
        for (i, j, k, (mul_in, mul1, mul2)) in instructions:
            ir_in, ir1, ir2 = irreps_in[i].ir, out1[j].ir, out2[k].ir
            w3j = jnp.asarray(wigner_3j(ir1.l, ir2.l, ir_in.l), x.dtype)
            n_w = mul_in * mul1 * mul2
            w = weights[:, w_ofs : w_ofs + n_w].reshape(B, mul_in, mul1, mul2)
            w_ofs += n_w
            mixed = jnp.einsum("bwuv,bwk->buvk", w, x_chunks[i])
            if i == 0 and not self.internal_weights:
                n_b = mul1 * mul2
                bias = biases[:, b_ofs : b_ofs + n_b].reshape(B, mul1, mul2)
                b_ofs += n_b
                mixed = mixed + bias[..., None]
            res = jnp.einsum("ijk,buvk->buivj", w3j, mixed) / mul_in
            res = res.reshape(B, mul1 * ir1.dim, mul2 * ir2.dim)
            outputs[(j, k)] = outputs.get((j, k), 0.0) + res

        rows = []
        for j, m1 in enumerate(out1):
            blocks = []
            for k, m2 in enumerate(out2):
                blk = outputs.get((j, k))
                if blk is None:
                    blk = jnp.zeros((B, m1.dim, m2.dim), x.dtype)
                blocks.append(blk)
            rows.append(jnp.concatenate(blocks, axis=-1))
        return jnp.concatenate(rows, axis=-2).reshape(B, -1)
