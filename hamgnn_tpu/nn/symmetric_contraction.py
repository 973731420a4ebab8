"""MACE-style symmetric contraction (many-body product basis) in JAX.

Reimplements the vendored MACE pieces the reference uses in CorrProductBlock
(/root/reference/hamgnn/nn/interaction_blocks.py:168-260):
  * generalized real CG "U matrices" (toolbox/mace/tools/cg.py:17-131) built
    host-side with numpy from :func:`hamgnn_tpu.e3.wigner.wigner_3j`;
  * the per-output-irrep contraction chain of
    toolbox/mace/modules/symmetric_contraction.py:24-233, expressed as plain
    jnp.einsum (XLA optimizes the contraction order; the tensors are small
    constants, the batch dimension is where the FLOPs go).

Feature layout: x is (batch, channels, n_ell) where n_ell = sum over coupling
irreps of (2l+1) — the ``reshape_irreps`` layout (all chunks share the same
channel count).  y is the one-hot element embedding (batch, num_elements).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..e3.irreps import Irrep, Irreps
from ..e3.wigner import wigner_3j


def _wigner_nj(irreps_list: List[Irreps]) -> List[Tuple[Irrep, np.ndarray]]:
    """All coupling paths of n copies of ``irreps`` -> (ir_out, basis tensor).

    Basis tensor shape: (ir_out.dim, dim, dim, ..., dim) with n trailing input
    dims.  'component' normalization: each CG gets a sqrt(ir_out.dim) factor.
    """
    if len(irreps_list) == 1:
        (irreps,) = irreps_list
        ret = []
        e = np.eye(irreps.dim)
        i = 0
        for mul, ir in irreps:
            for _ in range(mul):
                ret.append((ir, e[i : i + ir.dim]))
                i += ir.dim
        return ret

    *left_list, irreps_right = irreps_list
    ret = []
    for ir_left, C_left in _wigner_nj(left_list):
        i = 0
        for mul, ir in irreps_right:
            for ir_out in ir_left * ir:
                C = wigner_3j(ir_out.l, ir_left.l, ir.l) * np.sqrt(ir_out.dim)
                Cc = np.einsum(
                    "jk,ijl->ikl", C_left.reshape(C_left.shape[0], -1), C
                ).reshape(ir_out.dim, *(irr.dim for irr in left_list), ir.dim)
                for u in range(mul):
                    E = np.zeros(
                        (ir_out.dim, *(irr.dim for irr in left_list), irreps_right.dim)
                    )
                    E[..., i + u * ir.dim : i + (u + 1) * ir.dim] = Cc
                    ret.append((ir_out, E))
            i += mul * ir.dim
    return sorted(ret, key=lambda t: t[0])


@functools.lru_cache(maxsize=None)
def u_matrix_real(irreps_in: str, ir_out: str, correlation: int) -> np.ndarray:
    """Stack of invariant coupling tensors: shape
    ([2l_out+1 if l_out>0], n_ell, ..., n_ell, num_paths)."""
    irreps_in_ = Irreps(irreps_in)
    ir_out_ = Irrep.parse(ir_out)
    wigners = _wigner_nj([irreps_in_] * correlation)
    stack = [E for (ir, E) in wigners if ir == ir_out_]
    if not stack:
        n_ell = irreps_in_.dim
        shape = ([2 * ir_out_.l + 1] if ir_out_.l > 0 else []) + [n_ell] * correlation + [0]
        return np.zeros(shape)
    U = np.stack(stack, axis=-1)
    if ir_out_.l == 0:
        U = U[0]  # squeeze the trivial output dim like MACE's .squeeze()
    return U


class Contraction(fnn.Module):
    """Contraction chain for one output irrep."""

    coupling_irreps: str          # e.g. "1x0e+1x1o+..." (mul-1 per chunk)
    ir_out: str
    correlation: int
    num_features: int             # channel count
    num_elements: int

    @fnn.compact
    def __call__(self, x, y):
        ir_out = Irrep.parse(self.ir_out)
        lmax_flag = min(ir_out.l, 1)   # 1 if output has an m index
        dtype = x.dtype

        u_tensors = {
            nu: jnp.asarray(
                u_matrix_real(self.coupling_irreps, self.ir_out, nu), dtype
            )
            for nu in range(1, self.correlation + 1)
        }

        def w_param(name, nu):
            num_params = u_tensors[nu].shape[-1]
            init = fnn.initializers.normal(stddev=1.0)
            w = self.param(name, init, (self.num_elements, num_params, self.num_features))
            return w / max(num_params, 1)

        # main term (highest correlation)
        nu = self.correlation
        U = u_tensors[nu]
        w = w_param(f"w{nu}", nu)
        free = "".join(chr(ord("A") + j) for j in range(nu + lmax_flag - 1))
        # out[b,c,<free>] = U[<free>,i,k] w[e,k,c] x[b,c,i] y[b,e]
        out = jnp.einsum(f"{free}ik,ekc,bci,be->bc{free}", U, w, x, y)

        for nu in range(self.correlation - 1, 0, -1):
            U = u_tensors[nu]
            if U.shape[-1] == 0:
                # no paths at this order; still need to contract one feature copy
                c_tensor = out
            else:
                w = w_param(f"w{nu}", nu)
                free_w = "".join(chr(ord("A") + j) for j in range(nu + lmax_flag))
                c_tensor = jnp.einsum(f"{free_w}k,ekc,be->bc{free_w}", U, w, y) + out
            free_f = "".join(chr(ord("A") + j) for j in range(nu - 1 + lmax_flag))
            out = jnp.einsum(f"bc{free_f}i,bci->bc{free_f}", c_tensor, x)

        # out: (batch, channels[, 2l_out+1]) -> flatten
        return out.reshape(out.shape[0], -1)


class SymmetricContraction(fnn.Module):
    """Cat of per-output-irrep contractions; output layout (batch, channels*dim)
    per output chunk, concatenated — matching reshape_irreps-then-flatten."""

    coupling_irreps: str
    irreps_out: str
    correlation: int
    num_features: int
    num_elements: int

    @fnn.compact
    def __call__(self, x, y):
        outs = []
        for mul, ir in Irreps(self.irreps_out):
            outs.append(
                Contraction(
                    coupling_irreps=self.coupling_irreps,
                    ir_out=repr(ir),
                    correlation=self.correlation,
                    num_features=self.num_features,
                    num_elements=self.num_elements,
                    name=f"contraction_{ir}",
                )(x, y)
            )
        return jnp.concatenate(outs, axis=-1)
