"""Equivariance tests for Linear / TensorProduct / Gate / channel scaling.

Modeled on the reference's vendored equivariance checker
(/root/reference/hamgnn/toolbox/nequip/utils/test.py): apply a random rotation
(and inversion) to inputs via block-diagonal Wigner-D and check the output
transforms with its own representation.
"""

import jax
import numpy as np
import pytest

from hamgnn_tpu.e3.gate import make_gate
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.linear import ElementwiseChannelScale, Linear
from hamgnn_tpu.e3.tensor_product import (
    FullyConnectedTensorProduct,
    TensorProduct,
    tp_out_irreps_with_instructions,
)
from hamgnn_tpu.e3.wigner import irreps_D


def rand_rot(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


IRR_IN1 = Irreps("8x0e+4x1o+2x2e+1x1e")
IRR_SH = Irreps("1x0e+1x1o+1x2e+1x3o")
IRR_OUT = Irreps("8x0e+4x1o+4x1e+2x2e+1x2o")


class TestLinear:
    def test_equivariance_and_shape(self):
        rng = np.random.default_rng(0)
        lin = Linear(irreps_in=IRR_IN1, irreps_out=IRR_OUT)
        x = rng.normal(size=(7, IRR_IN1.dim)).astype(np.float32)
        params = lin.init(jax.random.PRNGKey(0), x)
        y = np.asarray(lin.apply(params, x))
        assert y.shape == (7, IRR_OUT.dim)

        R = rand_rot(rng)
        for inv in (False, True):
            Din = irreps_D(IRR_IN1, R, inversion=inv).astype(np.float32)
            Dout = irreps_D(IRR_OUT, R, inversion=inv).astype(np.float32)
            y_rot = np.asarray(lin.apply(params, x @ Din.T))
            np.testing.assert_allclose(y_rot, y @ Dout.T, atol=2e-5)

    def test_variance_preserving(self):
        rng = np.random.default_rng(1)
        irr = Irreps("64x0e+32x1o")
        lin = Linear(irreps_in=irr, irreps_out=irr)
        x = rng.normal(size=(512, irr.dim)).astype(np.float32)
        params = lin.init(jax.random.PRNGKey(1), x)
        y = np.asarray(lin.apply(params, x))
        assert 0.5 < y.var() < 2.0


class TestTensorProduct:
    def _make(self, mode):
        irreps_mid, instructions = tp_out_irreps_with_instructions(
            IRR_IN1, IRR_SH, IRR_OUT, mode=mode
        )
        tp = TensorProduct(
            irreps_in1=IRR_IN1,
            irreps_in2=IRR_SH,
            irreps_out=irreps_mid,
            instructions=tuple(instructions),
        )
        return tp, irreps_mid

    @pytest.mark.parametrize("mode", ["uvw", "uvu"])
    def test_equivariance(self, mode):
        rng = np.random.default_rng(2)
        tp, irreps_mid = self._make(mode)
        x1 = rng.normal(size=(5, IRR_IN1.dim)).astype(np.float32)
        x2 = rng.normal(size=(5, IRR_SH.dim)).astype(np.float32)
        params = tp.init(jax.random.PRNGKey(2), x1, x2)
        y = np.asarray(tp.apply(params, x1, x2))
        assert y.shape == (5, irreps_mid.dim)

        R = rand_rot(rng)
        for inv in (False, True):
            D1 = irreps_D(IRR_IN1, R, inversion=inv).astype(np.float32)
            D2 = irreps_D(IRR_SH, R, inversion=inv).astype(np.float32)
            D3 = irreps_D(irreps_mid, R, inversion=inv).astype(np.float32)
            y_rot = np.asarray(tp.apply(params, x1 @ D1.T, x2 @ D2.T))
            np.testing.assert_allclose(y_rot, y @ D3.T, atol=1e-4)

    def test_fully_connected_variance(self):
        rng = np.random.default_rng(3)
        irr = Irreps("16x0e+16x1o")
        tp = FullyConnectedTensorProduct(
            irreps_in1=irr, irreps_in2=Irreps("1x0e+1x1o+1x2e"), irreps_out=irr
        )
        x1 = rng.normal(size=(256, irr.dim)).astype(np.float32)
        x2 = rng.normal(size=(256, 9)).astype(np.float32)
        params = tp.init(jax.random.PRNGKey(3), x1, x2)
        y = np.asarray(tp.apply(params, x1, x2))
        assert 0.3 < y.var() < 3.0


class TestGate:
    def test_equivariance(self):
        rng = np.random.default_rng(4)
        target = Irreps("8x0e+4x0o+4x1o+2x2e")
        gate, irreps_in = make_gate(target)
        x = rng.normal(size=(6, irreps_in.dim)).astype(np.float32)
        y = np.asarray(gate.apply({}, x))
        assert y.shape == (6, gate.irreps_out.dim)

        R = rand_rot(rng)
        Din = irreps_D(irreps_in, R).astype(np.float32)
        Dout = irreps_D(gate.irreps_out, R).astype(np.float32)
        y_rot = np.asarray(gate.apply({}, x @ Din.T))
        np.testing.assert_allclose(y_rot, y @ Dout.T, atol=1e-5)


class TestChannelScale:
    def test_matches_manual(self):
        rng = np.random.default_rng(5)
        irr = Irreps("4x0e+2x1o")
        mod = ElementwiseChannelScale(irreps_in=irr, irreps_out=irr)
        x = rng.normal(size=(3, irr.dim)).astype(np.float32)
        w = rng.normal(size=(3, irr.num_irreps)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(5), x, w)
        y = np.asarray(mod.apply(params, x, w))
        assert y.shape == x.shape

        # zero weights -> zero output
        y0 = np.asarray(mod.apply(params, x, np.zeros_like(w)))
        np.testing.assert_allclose(y0, 0.0, atol=1e-7)

    def test_equivariance(self):
        rng = np.random.default_rng(6)
        irr = Irreps("4x0e+2x1o+1x2e")
        mod = ElementwiseChannelScale(irreps_in=irr, irreps_out=irr)
        x = rng.normal(size=(3, irr.dim)).astype(np.float32)
        w = rng.normal(size=(3, irr.num_irreps)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(6), x, w)
        y = np.asarray(mod.apply(params, x, w))
        R = rand_rot(rng)
        D = irreps_D(irr, R).astype(np.float32)
        y_rot = np.asarray(mod.apply(params, x @ D.T, w))
        np.testing.assert_allclose(y_rot, y @ D.T, atol=1e-5)


class TestStreamingChunkPath:
    """The streaming (chunk_call / call_chunks) hot path must match the
    concatenated formulation bit-for-bit in parameters and numerically in
    outputs — it is what keeps peak HBM at O(E x out) instead of
    O(E x mid_irreps.dim) (~1 GB/layer at 512 atoms)."""

    def test_matches_concatenated(self):
        from flax import linen as fnn

        from hamgnn_tpu.e3.fused_tp import SHTensorProductExpansion

        irreps_in = Irreps("8x0e+4x1o+4x2e+2x3o")
        irreps_sh = Irreps("0e+1o+2e+3o")
        target = Irreps("8x0e+4x0o+4x1o+2x1e+2x2e+1x2o+1x3o")
        mid = SHTensorProductExpansion.mid_irreps(irreps_in, irreps_sh, target)

        class Old(fnn.Module):
            @fnn.compact
            def __call__(self, x, sh, w):
                up = SHTensorProductExpansion(
                    irreps_in, irreps_sh, target, name="tp")(x, sh)
                return ElementwiseChannelScale(
                    irreps_in=mid.simplify(), irreps_out=target, name="sc")(up, w)

        class New(fnn.Module):
            @fnn.compact
            def __call__(self, x, sh, w):
                up = SHTensorProductExpansion(
                    irreps_in, irreps_sh, target, name="tp").chunk_call(x, sh)
                return ElementwiseChannelScale(
                    irreps_in=mid.simplify(), irreps_out=target,
                    name="sc").call_chunks(up, w)

        rng = np.random.default_rng(7)
        x = rng.normal(size=(7, irreps_in.dim)).astype(np.float32)
        sh = rng.normal(size=(7, irreps_sh.dim)).astype(np.float32)
        w = rng.normal(size=(7, mid.simplify().num_irreps)).astype(np.float32)
        p_old = Old().init(jax.random.PRNGKey(0), x, sh, w)
        p_new = New().init(jax.random.PRNGKey(0), x, sh, w)
        assert jax.tree_util.tree_structure(p_old) == \
            jax.tree_util.tree_structure(p_new)
        y_old = np.asarray(Old().apply(p_old, x, sh, w))
        y_new = np.asarray(New().apply(p_old, x, sh, w))
        np.testing.assert_allclose(y_new, y_old, atol=1e-5)

    def test_linear_call_chunks_unsimplified_refinement(self):
        # call_chunks must accept an unsimplified chunk sequence whose
        # channel order matches the simplified constructor irreps
        rng = np.random.default_rng(8)
        irr_chunks = [(2, "1o"), (3, "1o"), (4, "0e")]
        irr = Irreps(irr_chunks).simplify()
        lin = Linear(irr, Irreps("3x1o+2x0e"))
        x = rng.normal(size=(5, irr.dim)).astype(np.float32)
        params = lin.init(jax.random.PRNGKey(1), x)
        y_ref = np.asarray(lin.apply(params, x))

        from hamgnn_tpu.e3.irreps import Irrep
        chunks = []
        ofs = 0
        for mul, ir_s in irr_chunks:
            ir = Irrep.parse(ir_s)
            c = x[:, ofs:ofs + mul * ir.dim].reshape(5, mul, ir.dim)
            chunks.append((mul, ir, c))
            ofs += mul * ir.dim
        y = np.asarray(lin.apply(params, chunks, method=lambda m, c: m.call_chunks(c)))
        np.testing.assert_allclose(y, y_ref, atol=1e-6)
