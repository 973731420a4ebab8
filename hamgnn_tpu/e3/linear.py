"""Equivariant linear layers (e3nn ``o3.Linear`` semantics) for JAX/flax.

An equivariant linear map mixes multiplicities within each irrep (l, p) and
never mixes different irreps.  Implementation groups all input chunks carrying
the same irrep, concatenates their multiplicities, and performs one matmul per
output chunk — large, static matmuls that XLA tiles onto the MXU.

Normalization matches e3nn defaults: weight init N(0,1) scaled at apply time by
``1/sqrt(fan_in)`` with fan_in = total input multiplicity feeding the output
chunk.  Output chunks with no matching input irrep are zero (no bias).
Reference usage: every ``o3.Linear(...)`` in /root/reference/hamgnn/nn/.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .irreps import Irreps


class Linear(fnn.Module):
    irreps_in: Irreps
    irreps_out: Irreps

    def setup(self):
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        self._in = irreps_in
        self._out = irreps_out
        self._in_slices = irreps_in.slices()

        # for each output chunk: matching input chunks and the offset of its
        # weight block inside ONE flat parameter (keeping the whole layer a
        # single optimizer leaf — hundreds of tiny leaves make Adam updates
        # kernel-launch-bound on a remote accelerator)
        plans = []
        total = 0
        for k, mio in enumerate(irreps_out):
            sources = [i for i, mi in enumerate(irreps_in) if mi.ir == mio.ir]
            fan_in = sum(irreps_in[i].mul for i in sources)
            plans.append((sources, fan_in, total))
            total += fan_in * mio.mul
        self._plans = plans
        self._w = (
            self.param("w", fnn.initializers.normal(stddev=1.0), (total,))
            if total > 0 else None
        )

    def __call__(self, x):
        irreps_in, irreps_out = self._in, self._out
        out_chunks = []
        for k, mio in enumerate(irreps_out):
            sources, fan_in, ofs = self._plans[k]
            if fan_in == 0:
                out_chunks.append(
                    jnp.zeros(x.shape[:-1] + (mio.dim,), dtype=x.dtype)
                )
                continue
            w = self._w[ofs : ofs + fan_in * mio.mul].reshape(fan_in, mio.mul)
            xs = []
            for i in sources:
                mi = irreps_in[i]
                c = x[..., self._in_slices[i]]
                xs.append(c.reshape(c.shape[:-1] + (mi.mul, mi.ir.dim)))
            xin = jnp.concatenate(xs, axis=-2) if len(xs) > 1 else xs[0]
            scale = 1.0 / np.sqrt(fan_in)
            y = jnp.einsum("...ui,uv->...vi", xin, (scale * w).astype(x.dtype))
            out_chunks.append(y.reshape(y.shape[:-2] + (mio.dim,)))
        return jnp.concatenate(out_chunks, axis=-1)

    def call_chunks(self, chunks):
        """Streaming variant: consume a list of ``(mul, ir, x)`` chunks.

        ``x`` has shape (..., mul, ir.dim).  The chunk sequence must carry the
        same channels in the same order as ``irreps_in`` (it may be an
        unsimplified refinement of it — channel order is what maps onto the
        flat weight rows).  Avoids materializing the concatenated input: each
        chunk is contracted with its weight-row slice and partial outputs are
        summed.  For wide mid-irreps inputs (the fused-TP hot path) this cuts
        peak HBM temp from O(batch x irreps_in.dim) to O(batch x max chunk).
        """
        chunks = [(int(mul), ir, x) for mul, ir, x in chunks]
        in_dim = sum(mi.mul * mi.ir.dim for mi in self._in)
        if sum(mul * ir.dim for mul, ir, _ in chunks) != in_dim:
            raise ValueError("chunk sequence does not match irreps_in")
        out_chunks = []
        batch_shape = chunks[0][2].shape[:-2] if chunks else ()
        for k, mio in enumerate(self._out):
            sources, fan_in, ofs = self._plans[k]
            if fan_in == 0:
                out_chunks.append(
                    jnp.zeros(batch_shape + (mio.dim,),
                              dtype=chunks[0][2].dtype if chunks else jnp.float32))
                continue
            w = self._w[ofs : ofs + fan_in * mio.mul].reshape(fan_in, mio.mul)
            scale = 1.0 / np.sqrt(fan_in)
            acc = None
            row = 0
            for mul, ir, x in chunks:
                if ir != mio.ir:
                    continue
                wi = (scale * w[row : row + mul]).astype(x.dtype)
                y = jnp.einsum("...ui,uv->...vi", x, wi)
                acc = y if acc is None else acc + y
                row += mul
            if row != fan_in:
                raise ValueError(
                    f"chunks provide {row} channels of {mio.ir}, expected {fan_in}")
            out_chunks.append(acc.reshape(acc.shape[:-2] + (mio.dim,)))
        return jnp.concatenate(out_chunks, axis=-1)

    def packed_tp_call(self, tp_irreps_in, tp_irreps_sh, x, sh, weight=None,
                       sh_needs_grad=True):
        """Fused TP -> (optional per-channel scale) -> this Linear, executed in
        the packed lane-dense layout (see e3/packed_tp.py).  Equivalent to
        ``self.call_chunks(SHTensorProductExpansion(tp_irreps_in, tp_irreps_sh,
        target).chunk_call(x, sh))`` with target == this layer's semantics.
        Pass ``sh_needs_grad=False`` when ``sh`` is data (edge spherical
        harmonics) so the TPU kernel skips its cotangent.
        """
        from .packed_tp import get_plan

        out = Irreps(self._out)
        plan = get_plan(repr(Irreps(tp_irreps_in)), repr(Irreps(tp_irreps_sh)),
                        repr(out), repr(out))
        if plan.linear_numel != (0 if self._w is None else self._w.size):
            raise ValueError("packed plan does not match this Linear's weights")
        return plan(x, sh, weight, self._w, sh_needs_grad=sh_needs_grad)


class ElementwiseChannelScale(fnn.Module):
    """Scale each irrep channel (multiplicity index) by an external scalar.

    TPU-native equivalent of the reference's ``LinearScaleWithWeights`` tensor
    product with ``1x0e`` ones (/root/reference/hamgnn/nn/tensor_products.py:25-47):
    a per-sample weight vector of length ``irreps.num_irreps`` scales each
    channel, followed by an equivariant Linear.  The degenerate TP is replaced
    by a broadcasted multiply (pure VPU, fuses with neighbors).
    """

    irreps_in: Irreps
    irreps_out: Irreps

    def setup(self):
        self.linear_out = Linear(Irreps(self.irreps_in), Irreps(self.irreps_out))

    @property
    def weight_numel(self) -> int:
        return Irreps(self.irreps_in).num_irreps

    def __call__(self, x, weight):
        """x: (..., irreps_in.dim); weight: (..., num_irreps)."""
        irreps_in = Irreps(self.irreps_in)
        # one precomputed gather expands per-channel weights over the (2l+1)
        # components (instead of a per-chunk slice loop)
        idx = []
        ch = 0
        for mi in irreps_in:
            for _ in range(mi.mul):
                idx.extend([ch] * mi.ir.dim)
                ch += 1
        idx = jnp.asarray(np.asarray(idx, np.int32))
        scaled = x * jnp.take(weight, idx, axis=-1)
        return self.linear_out(scaled)

    def call_chunks(self, chunks, weight):
        """Streaming variant over ``(mul, ir, x)`` chunks (x: (..., mul, dim)).

        Channel k of ``weight`` scales the k-th multiplicity across the chunk
        sequence (same order as ``__call__``'s expanded gather); the scaled
        chunks stream straight into the chunked equivariant Linear without
        concatenating the full mid-irreps vector.
        """
        ch = 0
        scaled = []
        for mul, ir, x in chunks:
            scaled.append((mul, ir, x * weight[..., ch : ch + mul, None]))
            ch += mul
        if ch != self.weight_numel:
            raise ValueError(f"chunks carry {ch} channels, expected {self.weight_numel}")
        return self.linear_out.call_chunks(scaled)

    def packed_tp_call(self, tp_irreps_in, tp_irreps_sh, x, sh, weight,
                       target_irreps=None, weight_packed=False,
                       sh_needs_grad=True):
        """Fused TP -> per-channel radial scale -> linear_out in the packed
        lane-dense layout (e3/packed_tp.py): same parameters and math as
        ``self.call_chunks(SHTensorProductExpansion(...).chunk_call(x, sh),
        weight)`` but ~10x fewer, lane-aligned XLA ops.  Pass
        ``weight_packed=True`` when the radial generator already emits packed
        channel order (``make_weight_generator(..., out_perm=...)``), and
        ``sh_needs_grad=False`` when ``sh`` is data (edge SH)."""
        plan = self.packed_plan(tp_irreps_in, tp_irreps_sh, target_irreps)
        lw = self.linear_out._w
        if plan.linear_numel != (0 if lw is None else lw.size):
            raise ValueError("packed plan does not match linear_out weights")
        return plan(x, sh, weight, lw, weight_packed=weight_packed,
                    sh_needs_grad=sh_needs_grad)

    def packed_plan(self, tp_irreps_in, tp_irreps_sh, target_irreps=None):
        from .packed_tp import get_plan

        target = Irreps(target_irreps if target_irreps is not None
                        else self.irreps_out)
        plan = get_plan(repr(Irreps(tp_irreps_in)), repr(Irreps(tp_irreps_sh)),
                        repr(target), repr(Irreps(self.irreps_out)))
        if plan.weight_numel != self.weight_numel:
            raise ValueError(
                f"packed plan has {plan.weight_numel} scale channels, "
                f"scaler expects {self.weight_numel}")
        return plan
