"""HamGNNTransformer / attention block tests."""

import jax
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.wigner import irreps_D
from hamgnn_tpu.models.representation import HamGNNTransformer
from hamgnn_tpu.nn.attention import edge_softmax

from util_fixtures import make_crystal

FEAT = "8x0e+8x0o+4x1o+4x1e+4x2e"  # muls divisible by num_heads
SH = "0e + 1o + 2e"


class TestEdgeSoftmax:
    def test_normalized_per_dst(self):
        rng = np.random.default_rng(0)
        E, N, H = 20, 5, 2
        logits = rng.normal(size=(E, H)).astype(np.float32)
        dst = rng.integers(0, N, E)
        mask = np.ones(E, bool)
        mask[15:] = False
        w = np.asarray(edge_softmax(logits, dst, N, mask))
        assert np.all(w[~mask] < 1e-8)
        for n in range(N):
            sel = (dst == n) & mask
            if sel.any():
                np.testing.assert_allclose(w[sel].sum(0), 1.0, atol=1e-5)


class TestTransformer:
    @pytest.fixture(scope="class")
    def graph(self):
        rng = np.random.default_rng(1)
        return pad_and_batch([make_crystal(rng, n_atoms=4)], bucket_multiple=8)

    @pytest.mark.slow

    def test_forward_and_equivariance(self, graph):
        model = HamGNNTransformer(
            num_types=20, irreps_edge_sh=SH, irreps_node_features=FEAT,
            num_layers=1, num_radial=8, cutoff=4.0, radial_mlp=(16, 16),
            num_heads=4, num_hidden_features=4, correlation=2)
        params = model.init(jax.random.PRNGKey(0), graph)
        out = model.apply(params, graph)
        assert np.isfinite(np.asarray(out["node_attr"])).all()

        rng = np.random.default_rng(2)
        a = rng.normal(size=(3, 3))
        R, _ = np.linalg.qr(a)
        if np.linalg.det(R) < 0:
            R[:, 0] = -R[:, 0]
        Rf = R.astype(np.float32)
        rot = graph.replace(pos=graph.pos @ Rf.T, nbr_shift=graph.nbr_shift @ Rf.T,
                            cell=graph.cell @ Rf.T)
        out_rot = model.apply(params, rot)
        D = irreps_D(Irreps(FEAT), R).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(out_rot["node_attr"]),
            np.asarray(out["node_attr"]) @ D.T, atol=5e-4)
