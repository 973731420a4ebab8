"""Off-default flag matrix across all output-head families.

Sweeps {symmetrize, add_H0, zero_point_shift} over the plain, SOC (su2/so3),
and magnetic (collinear / non-collinear / SOC) heads for finite-forward and
shape correctness.  Regression guard for the so3 ``symmetrize=False`` NameError
(models/soc.py so3 branch) and parity with the reference flag handling at
hamgnn_output.py:3021-3181 — the reference applies symmetrization, H0 addition,
and the zero-point shift only under their respective flags.
"""

import itertools

import jax
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.soc import HamGNNSOCOut
from hamgnn_tpu.models.spin import HamGNNMagneticOut

from util_fixtures import add_random_hamiltonian_targets, make_crystal

FEAT = "8x0e+8x0o+6x1o+4x1e+4x2e+2x2o+1x3o+1x3e"
SH = "0e + 1o + 2e + 3o"
NAO = 14
BIG = (2 * NAO) ** 2
FLAGS = list(itertools.product([False, True], repeat=3))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    c = make_crystal(rng, n_atoms=3, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=NAO)
    n, e = len(c["z"]), c["edge_index"].shape[1]
    # SOC-shaped extras (H targets at (2 nao)^2 for the SOC zero-point shift;
    # the plain head reads the nao^2 targets which stay in *_nao2 keys below)
    plain = dict(c)
    c["Hon"] = np.zeros((n, BIG))
    c["Hoff"] = np.zeros((e, BIG))
    c["iHon"] = np.zeros((n, BIG))
    c["iHoff"] = np.zeros((e, BIG))
    c["Hon0"] = 0.01 * rng.normal(size=(n, BIG))
    c["Hoff0"] = 0.01 * rng.normal(size=(e, BIG))
    c["iHon0"] = 0.01 * rng.normal(size=(n, BIG))
    c["iHoff0"] = 0.01 * rng.normal(size=(e, BIG))
    c["Lon"] = 0.1 * rng.normal(size=(n, NAO * NAO, 3))
    c["Loff"] = 0.1 * rng.normal(size=(e, NAO * NAO, 3))
    c["spin_vec"] = rng.normal(size=(n, 3))
    c["spin_length"] = np.linalg.norm(c["spin_vec"], axis=-1)
    graph_soc = pad_and_batch([c], bucket_multiple=8)

    plain["spin_vec"] = c["spin_vec"]
    plain["spin_length"] = c["spin_length"]
    graph_plain = pad_and_batch([plain], bucket_multiple=8)

    # collinear-shaped targets/H0: (rows, 2, nao^2) spin-channel stacks
    col = dict(plain)
    col["Hon"] = np.repeat(plain["Hon"][:, None, :], 2, axis=1)
    col["Hoff"] = np.repeat(plain["Hoff"][:, None, :], 2, axis=1)
    col["Hon0"] = 0.01 * rng.normal(size=(n, 2, NAO * NAO))
    col["Hoff0"] = 0.01 * rng.normal(size=(e, 2, NAO * NAO))
    graph_col = pad_and_batch([col], bucket_multiple=8)

    rep = HamGNNConvE3(num_types=20, irreps_edge_sh=SH,
                       irreps_node_features=FEAT, num_layers=1,
                       num_radial=8, cutoff=4.0, radial_mlp=(16, 16))
    p = rep.init(jax.random.PRNGKey(0), graph_plain)
    feats_plain = rep.apply(p, graph_plain)
    feats_soc = rep.apply(p, graph_soc)
    feats_col = rep.apply(p, graph_col)
    return graph_plain, feats_plain, graph_soc, feats_soc, graph_col, feats_col


def _finite(res, keys):
    for k in keys:
        assert np.isfinite(np.asarray(res[k])).all(), k


@pytest.mark.parametrize("symmetrize,add_H0,zps", FLAGS)
def test_plain_head(setup, symmetrize, add_H0, zps):
    graph, feats = setup[0], setup[1]
    head = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=NAO,
        ham_type="openmx", symmetrize=symmetrize, add_H0=add_H0,
        zero_point_shift=zps)
    res = head.apply(head.init(jax.random.PRNGKey(1), graph, feats),
                     graph, feats)
    assert res["hamiltonian_on"].shape[1] == NAO * NAO
    assert res["hamiltonian_off"].shape[1] == NAO * NAO
    _finite(res, ["hamiltonian_on", "hamiltonian_off"])
    if symmetrize:
        h = np.asarray(res["hamiltonian_on"]).reshape(-1, NAO, NAO)
        np.testing.assert_allclose(h, h.transpose(0, 2, 1), atol=1e-5)


@pytest.mark.parametrize("soc_basis", ["su2", "so3"])
@pytest.mark.parametrize("symmetrize,add_H0,zps", FLAGS)
def test_soc_head(setup, soc_basis, symmetrize, add_H0, zps):
    graph, feats = setup[2], setup[3]
    head = HamGNNSOCOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=NAO,
        ham_type="openmx", soc_basis=soc_basis, symmetrize=symmetrize,
        add_H0=add_H0, zero_point_shift=zps)
    res = head.apply(head.init(jax.random.PRNGKey(1), graph, feats),
                     graph, feats)
    for k in ["hamiltonian_real_on", "hamiltonian_imag_on",
              "hamiltonian_real_off", "hamiltonian_imag_off"]:
        assert res[k].shape[1] == BIG
    _finite(res, ["hamiltonian_real_on", "hamiltonian_imag_on",
                  "hamiltonian_real_off", "hamiltonian_imag_off"])


@pytest.mark.parametrize("soc,collinear", [(False, True), (False, False),
                                           (True, False)])
@pytest.mark.parametrize("symmetrize,add_H0", list(
    itertools.product([False, True], repeat=2)))
def test_magnetic_head(setup, soc, collinear, symmetrize, add_H0):
    graph, feats = (setup[4], setup[5]) if collinear else (setup[2], setup[3])
    head = HamGNNMagneticOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=NAO,
        ham_type="openmx", soc_switch=soc, collinear_spin=collinear,
        symmetrize=symmetrize, add_H0=add_H0)
    res = head.apply(head.init(jax.random.PRNGKey(1), graph, feats),
                     graph, feats)
    if collinear:
        assert res["hamiltonian_on"].shape[1:] == (2, NAO * NAO)
        _finite(res, ["hamiltonian_on", "hamiltonian_off"])
    else:
        assert res["hamiltonian_real_on"].shape[1] == BIG
        _finite(res, ["hamiltonian_real_on", "hamiltonian_imag_on",
                      "hamiltonian_real_off", "hamiltonian_imag_off"])
