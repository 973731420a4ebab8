"""Magnetism workflow tests: spin utilities, input decks, graph packing."""

import numpy as np
import pytest

from hamgnn_tpu.tools.magnetism import (
    generate_spin_vectors,
    pack_collinear_graph,
    read_xsf_spin,
    spin_to_spherical,
    write_collinear_dat,
    write_noncollinear_dat,
    write_xsf,
)

from test_openmx_interface import write_synthetic_scfout


class TestSpinUtils:
    def test_spherical(self):
        s, th, ph = spin_to_spherical(np.array([0, 0, 2.0]))
        assert (s, th, ph) == (2.0, 0.0, 0.0)
        s, th, ph = spin_to_spherical(np.array([1.0, 0, 0]))
        np.testing.assert_allclose([s, th, ph], [1.0, 90.0, 0.0], atol=1e-6)
        assert spin_to_spherical(np.zeros(3)) == (0.0, 0.0, 0.0)

    def test_generate(self):
        fm = generate_spin_vectors(4, "fm", magnitude=2.0)
        np.testing.assert_allclose(fm, [[0, 0, 2.0]] * 4)
        afm = generate_spin_vectors(4, "afm")
        np.testing.assert_allclose(afm[::2, 2], 1.0)
        np.testing.assert_allclose(afm[1::2, 2], -1.0)
        rnd = generate_spin_vectors(5, "random", magnitude=3.0)
        np.testing.assert_allclose(np.linalg.norm(rnd, axis=1), 3.0, atol=1e-6)

    def test_xsf_roundtrip(self, tmp_path):
        cell = np.eye(3) * 5
        pos = np.array([[0.0, 0, 0], [2.5, 2.5, 2.5]])
        spins = np.array([[0, 0, 1.5], [0, 0, -1.5]])
        p = str(tmp_path / "t.xsf")
        write_xsf(cell, ["Fe", "Fe"], pos, spins, p)
        c2, syms, p2, s2 = read_xsf_spin(p)
        np.testing.assert_allclose(c2, cell)
        assert syms == ["Fe", "Fe"]
        np.testing.assert_allclose(p2, pos)
        np.testing.assert_allclose(s2, spins)


class TestDecks:
    def test_collinear_deck(self, tmp_path):
        p = str(tmp_path / "c.dat")
        write_collinear_dat(np.eye(3) * 5, ["Fe", "O"], np.zeros((2, 3)),
                            "# t\n", p,
                            species_overrides={"Fe": {"spin": [8.0, 6.0]}},
                            atom_overrides={2: [3.5, 2.5]})
        text = open(p).read()
        assert "8.00   6.00" in text
        assert "3.50   2.50" in text

    def test_noncollinear_deck(self, tmp_path):
        p = str(tmp_path / "nc.dat")
        write_noncollinear_dat(np.eye(3) * 5, ["Fe"], np.zeros((1, 3)),
                               [[1.0, 0.0, 0.0]], "# t\n", p)
        text = open(p).read()
        assert "90.00" in text  # theta of +x spin
        assert "1 on" in text


class TestPacking:
    def test_collinear_pack(self, tmp_path):
        from hamgnn_tpu.interfaces.openmx import parse_scfout

        rng = np.random.default_rng(0)
        path = str(tmp_path / "t.scfout")
        write_synthetic_scfout(path, rng, spinp=1, norb=5)
        scf = parse_scfout(path)
        spins = generate_spin_vectors(2, "afm")
        c = pack_collinear_graph(scf, [1, 1], 14, spin_vectors=spins)
        assert c["Hon"].shape == (2, 2, 196)
        assert c["spin_vec"].shape == (2, 3)
        # up channel is spin component 0
        from hamgnn_tpu.models.basis import get_basis_set

        idx = np.asarray(get_basis_set("openmx", 14).basis_def[1])
        dense = c["Hon"][0, 0].reshape(14, 14)
        np.testing.assert_allclose(dense[idx[:, None], idx[None, :]],
                                   scf.Hon[0][0])
