"""Golden parser-parity tests on genuine SCFOUT binaries.

The committed ``tests/fixtures/*.scfout`` files are real SCFOUT v3 binaries
(written by :mod:`hamgnn_tpu.interfaces.scfout_writer`); the paired
``*.HS.json.gz`` goldens were produced by the *reference's* compiled C reader
(/root/reference/DFT_interfaces/openmx/openmx_postprocess/read_openmx.c) run
on those exact bytes (see tools_dev/gen_scfout_fixtures.py).  This breaks the
write-then-read-our-own-format circularity flagged in round 1: our parser must
reproduce the reference implementation's output field by field.
"""

import gzip
import json
import os

import numpy as np
import pytest

from hamgnn_tpu.interfaces.openmx import inverse_edges, parse_scfout

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    scf = parse_scfout(os.path.join(FIXDIR, f"{name}.scfout"))
    with gzip.open(os.path.join(FIXDIR, f"{name}.HS.json.gz"), "rt") as f:
        ref = json.load(f)
    return scf, ref


@pytest.mark.parametrize("name", ["si2", "si2_soc"])
def test_geometry_and_edges_match_reference_reader(name):
    scf, ref = _load(name)
    np.testing.assert_array_equal(
        np.asarray(ref["edge_index"]), np.stack([scf.edge_src, scf.edge_dst]))
    np.testing.assert_allclose(
        np.asarray(ref["pos"]).reshape(-1, 3), scf.pos, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ref["cell_shift"]).reshape(-1, 3), scf.cell_shift)
    np.testing.assert_allclose(
        np.asarray(ref["nbr_shift"]).reshape(-1, 3), scf.nbr_shift, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ref["inv_edge_idx"]),
        inverse_edges(scf.edge_src, scf.edge_dst, scf.cell_shift))


@pytest.mark.parametrize("name", ["si2", "si2_soc"])
def test_matrix_blocks_match_reference_reader(name):
    scf, ref = _load(name)
    nspin = len(ref["Hon"])
    assert len(scf.Hon) == nspin
    for s in range(nspin):
        for a, row in enumerate(ref["Hon"][s]):
            np.testing.assert_allclose(
                np.asarray(row).reshape(scf.Hon[s][a].shape), scf.Hon[s][a],
                rtol=2e-6, atol=1e-9)
        for e, row in enumerate(ref["Hoff"][s]):
            np.testing.assert_allclose(
                np.asarray(row).reshape(scf.Hoff[s][e].shape), scf.Hoff[s][e],
                rtol=2e-6, atol=1e-9)
    for a, row in enumerate(ref["Son"]):
        np.testing.assert_allclose(
            np.asarray(row).reshape(scf.Son[a].shape), scf.Son[a], rtol=2e-6, atol=1e-9)
    for e, row in enumerate(ref["Soff"]):
        np.testing.assert_allclose(
            np.asarray(row).reshape(scf.Soff[e].shape), scf.Soff[e], rtol=2e-6, atol=1e-9)


def test_soc_angular_momentum_blocks_match():
    scf, ref = _load("si2_soc")
    assert scf.Lon is not None
    # the reference JSON writer prints OLP_L with %10.7f (7 decimals absolute)
    for a, row in enumerate(ref["Lon"]):
        np.testing.assert_allclose(
            np.asarray(row).reshape(scf.Lon[a].shape), scf.Lon[a], atol=6e-8)
    for e, row in enumerate(ref["Loff"]):
        np.testing.assert_allclose(
            np.asarray(row).reshape(scf.Loff[e].shape), scf.Loff[e], atol=6e-8)
