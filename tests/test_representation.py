"""HamGNNConvE3 representation network: smoke, equivariance, padding invariance."""

import jax
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.wigner import irreps_D
from hamgnn_tpu.models.representation import HamGNNConvE3

from util_fixtures import make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+2x2e+2x2o"
SH = "0e + 1o + 2e"


def small_model(**kw):
    defaults = dict(
        num_types=20,
        irreps_edge_sh=SH,
        irreps_node_features=FEAT,
        num_layers=2,
        num_radial=8,
        rbf_func="bessel",
        cutoff=4.0,
        radial_mlp=(16, 16),
    )
    defaults.update(kw)
    return HamGNNConvE3(**defaults)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    crystals = [make_crystal(rng, n_atoms=3), make_crystal(rng, n_atoms=4)]
    return pad_and_batch(crystals, bucket_multiple=8)


class TestRepresentation:
    def test_forward_shapes(self, graph):
        model = small_model()
        params = model.init(jax.random.PRNGKey(0), graph)
        out = model.apply(params, graph)
        feat = Irreps(FEAT)
        assert out["node_attr"].shape == (graph.num_nodes, feat.dim)
        assert out["edge_attr"].shape == (graph.num_edges, feat.dim)
        assert np.isfinite(np.asarray(out["node_attr"])).all()

    def test_rotation_equivariance(self, graph):
        model = small_model()
        params = model.init(jax.random.PRNGKey(0), graph)
        out = model.apply(params, graph)

        rng = np.random.default_rng(1)
        a = rng.normal(size=(3, 3))
        R, _ = np.linalg.qr(a)
        if np.linalg.det(R) < 0:
            R[:, 0] = -R[:, 0]

        rot_graph = graph.replace(
            pos=graph.pos @ R.T.astype(np.float32),
            nbr_shift=graph.nbr_shift @ R.T.astype(np.float32),
            cell=graph.cell @ R.T.astype(np.float32),
        )
        out_rot = model.apply(params, rot_graph)

        D = irreps_D(Irreps(FEAT), R).astype(np.float32)
        for key in ("node_attr", "edge_attr"):
            got = np.asarray(out_rot[key])
            want = np.asarray(out[key]) @ D.T
            np.testing.assert_allclose(got, want, atol=5e-4)

    @pytest.mark.slow

    def test_padding_invariance(self):
        """Extra padding must not change real-node outputs."""
        rng = np.random.default_rng(2)
        c = make_crystal(rng, n_atoms=3)
        g_small = pad_and_batch([c], bucket_multiple=8)
        g_big = pad_and_batch([c], node_bucket=24, edge_bucket=192)

        model = small_model()
        params = model.init(jax.random.PRNGKey(0), g_small)
        o1 = model.apply(params, g_small)
        o2 = model.apply(params, g_big)
        n = int(np.asarray(g_small.node_mask).sum())
        e = int(np.asarray(g_small.edge_mask).sum())
        np.testing.assert_allclose(
            np.asarray(o1["node_attr"])[:n], np.asarray(o2["node_attr"])[:n], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o1["edge_attr"])[:e], np.asarray(o2["edge_attr"])[:e], atol=1e-5
        )

    def test_corr_prod_variant(self, graph):
        model = small_model(use_corr_prod=True, correlation=2, num_hidden_features=4)
        params = model.init(jax.random.PRNGKey(3), graph)
        out = model.apply(params, graph)
        assert np.isfinite(np.asarray(out["node_attr"])).all()

    def test_lite_mode(self, graph):
        model = small_model(lite_mode=True)
        params = model.init(jax.random.PRNGKey(4), graph)
        out = model.apply(params, graph)
        assert np.isfinite(np.asarray(out["node_attr"])).all()
