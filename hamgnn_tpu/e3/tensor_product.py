"""Equivariant tensor products compiled to static einsum plans (JAX/XLA).

Replaces e3nn's runtime ``o3.TensorProduct`` instruction interpreter (used
throughout /root/reference/hamgnn/nn/) with an ahead-of-time compiled plan:
instructions are enumerated host-side, each (l1,l2,l3) path gets its constant
Wigner-3j tensor and path-normalization scalar, and execution is a short chain
of einsums XLA fuses and maps onto MXU/VPU.  Supported connection modes are the
ones the reference actually uses: ``uvw`` and ``uvu``.

Normalization matches e3nn's defaults (``normalization='component'``,
``path_normalization='element'``): per-instruction scale
``sqrt(ir_out.dim / sum_num_elements_into_same_output)`` with
sum-normalized w3j tensors and N(0,1) weight init.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .irreps import Irreps
from .wigner import wigner_3j


@dataclasses.dataclass(frozen=True)
class Instruction:
    i_in1: int
    i_in2: int
    i_out: int
    mode: str  # 'uvw' | 'uvu'
    has_weight: bool
    path_weight: float = 1.0  # filled by the plan with the normalization alpha

    @property
    def weight_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError


def _num_elements(irreps_in1: Irreps, irreps_in2: Irreps, ins: Instruction) -> int:
    if ins.mode == "uvw":
        return irreps_in1[ins.i_in1].mul * irreps_in2[ins.i_in2].mul
    if ins.mode == "uvu":
        return irreps_in2[ins.i_in2].mul
    raise NotImplementedError(ins.mode)


class TensorProductPlan:
    """Compiled execution plan for a weighted CG tensor product."""

    def __init__(
        self,
        irreps_in1,
        irreps_in2,
        irreps_out,
        instructions: Sequence[Tuple],
    ):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)

        ins_list: List[Instruction] = []
        for (i1, i2, io, mode, has_w) in instructions:
            mi1, mi2, mio = self.irreps_in1[i1], self.irreps_in2[i2], self.irreps_out[io]
            assert mio.ir in (mi1.ir * mi2.ir), (mi1.ir, mi2.ir, mio.ir)
            if mode == "uvu":
                assert mio.mul == mi1.mul
            ins_list.append(Instruction(i1, i2, io, mode, has_w))

        # e3nn 'element' path normalization
        norm_ins: List[Instruction] = []
        for ins in ins_list:
            fan = sum(
                _num_elements(self.irreps_in1, self.irreps_in2, other)
                for other in ins_list
                if other.i_out == ins.i_out
            )
            alpha = self.irreps_out[ins.i_out].ir.dim / max(fan, 1)
            norm_ins.append(dataclasses.replace(ins, path_weight=float(np.sqrt(alpha))))
        self.instructions: List[Instruction] = norm_ins

        self.slices_in1 = self.irreps_in1.slices()
        self.slices_in2 = self.irreps_in2.slices()
        self.slices_out = self.irreps_out.slices()

        self.weight_shapes: List[Optional[Tuple[int, ...]]] = []
        n = 0
        for ins in self.instructions:
            if not ins.has_weight:
                self.weight_shapes.append(None)
                continue
            mul1 = self.irreps_in1[ins.i_in1].mul
            mul2 = self.irreps_in2[ins.i_in2].mul
            mul3 = self.irreps_out[ins.i_out].mul
            shape = (mul1, mul2, mul3) if ins.mode == "uvw" else (mul1, mul2)
            self.weight_shapes.append(shape)
            n += int(np.prod(shape))
        self.weight_numel = n

    # -- execution -------------------------------------------------------

    def split_weights(self, weights):
        """Split a flat (..., weight_numel) weight tensor per instruction."""
        out = []
        ofs = 0
        for shape in self.weight_shapes:
            if shape is None:
                out.append(None)
                continue
            size = int(np.prod(shape))
            w = weights[..., ofs : ofs + size]
            out.append(w.reshape(w.shape[:-1] + shape))
            ofs += size
        return out

    def __call__(self, x1, x2, weights_list, shared_weights: bool = True):
        """Execute.  x1: (..., dim1), x2: (..., dim2); weights_list as from
        :meth:`split_weights` (entries broadcast against the batch when
        ``shared_weights=False``)."""
        dtype = x1.dtype
        batch_shape = jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1])
        chunks_out = [None] * len(self.irreps_out)

        for ins, w in zip(self.instructions, weights_list):
            mi1 = self.irreps_in1[ins.i_in1]
            mi2 = self.irreps_in2[ins.i_in2]
            mio = self.irreps_out[ins.i_out]
            x1c = x1[..., self.slices_in1[ins.i_in1]]
            x2c = x2[..., self.slices_in2[ins.i_in2]]
            x1c = x1c.reshape(x1c.shape[:-1] + (mi1.mul, mi1.ir.dim))
            x2c = x2c.reshape(x2c.shape[:-1] + (mi2.mul, mi2.ir.dim))
            cg = jnp.asarray(
                ins.path_weight * wigner_3j(mi1.ir.l, mi2.ir.l, mio.ir.l), dtype=dtype
            )

            if ins.mode == "uvw":
                tmp = jnp.einsum("...ui,...vj,ijk->...uvk", x1c, x2c, cg)
                if w is None:
                    out = jnp.sum(tmp, axis=(-3, -2))[..., None, :]
                elif shared_weights:
                    out = jnp.einsum("...uvk,uvw->...wk", tmp, w)
                else:
                    out = jnp.einsum("...uvk,...uvw->...wk", tmp, w)
            elif ins.mode == "uvu":
                # contract the v-sum into x2 first: sum_v w_uv (x1_u (x) x2_v)
                # == x1_u (x) (sum_v w_uv x2_v) — avoids the (..., u, v, k)
                # intermediate (O(E u v k) memory at full multiplicity)
                if w is None:
                    x2w = jnp.sum(x2c, axis=-2)[..., None, :]
                elif shared_weights:
                    x2w = jnp.einsum("...vj,uv->...uj", x2c, w)
                else:
                    x2w = jnp.einsum("...vj,...uv->...uj", x2c, w)
                out = jnp.einsum("...ui,...uj,ijk->...uk", x1c, x2w, cg)
            else:
                raise NotImplementedError(ins.mode)

            out = out.reshape(batch_shape + (mio.dim,))
            prev = chunks_out[ins.i_out]
            chunks_out[ins.i_out] = out if prev is None else prev + out

        full = []
        for i, mio in enumerate(self.irreps_out):
            c = chunks_out[i]
            if c is None:
                c = jnp.zeros(batch_shape + (mio.dim,), dtype=dtype)
            full.append(c)
        return jnp.concatenate(full, axis=-1)


def tp_out_irreps_with_instructions(
    irreps1: Irreps, irreps2: Irreps, target_irreps: Irreps, mode: str = "uvw",
    trainable: bool = True,
) -> Tuple[Irreps, List[Tuple]]:
    """Enumerate paths exactly as the reference's shared builder does
    (/root/reference/hamgnn/nn/message_passing.py:137-171): keep every
    (in1 x in2 -> out) path whose output irrep appears in ``target_irreps``,
    sort the resulting output irreps, and remap instruction outputs."""
    irreps1, irreps2, target_irreps = Irreps(irreps1), Irreps(irreps2), Irreps(target_irreps)
    out_list = []
    instructions = []
    for i, (mul_in, ir_in) in enumerate(irreps1):
        for j, (_, ir_edge) in enumerate(irreps2):
            for _, (mul_out, ir_out) in enumerate(target_irreps):
                if ir_out in ir_in * ir_edge:
                    k = len(out_list)
                    out_list.append((mul_out if mode == "uvw" else mul_in, ir_out))
                    instructions.append((i, j, k, mode, trainable))
    irreps_out = Irreps(out_list)
    irreps_out, permut, _ = irreps_out.sort()
    instructions = [(i1, i2, permut[io], m, t) for (i1, i2, io, m, t) in instructions]
    instructions = sorted(instructions, key=lambda x: x[2])
    return irreps_out, instructions


class TensorProduct(fnn.Module):
    """Flax module: weighted CG tensor product with internal shared weights."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    instructions: Tuple[Tuple, ...]

    def setup(self):
        self.plan = TensorProductPlan(
            self.irreps_in1, self.irreps_in2, self.irreps_out, self.instructions
        )
        ws = []
        for idx, shape in enumerate(self.plan.weight_shapes):
            if shape is not None:
                ws.append(self.param(f"w{idx}", fnn.initializers.normal(stddev=1.0), shape))
            else:
                ws.append(None)
        self.weights_list = ws

    def __call__(self, x1, x2):
        return self.plan(x1, x2, self.weights_list, shared_weights=True)


class FullyConnectedTensorProduct(fnn.Module):
    """All allowed uvw paths from (irreps_in1 x irreps_in2) into irreps_out."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps

    def setup(self):
        irreps1, irreps2, irreps_out = (
            Irreps(self.irreps_in1), Irreps(self.irreps_in2), Irreps(self.irreps_out))
        instructions = [
            (i, j, k, "uvw", True)
            for i, (_, ir1) in enumerate(irreps1)
            for j, (_, ir2) in enumerate(irreps2)
            for k, (_, ir3) in enumerate(irreps_out)
            if ir3 in ir1 * ir2
        ]
        self.tp = TensorProduct(irreps1, irreps2, irreps_out, tuple(instructions))

    def __call__(self, x1, x2):
        return self.tp(x1, x2)
