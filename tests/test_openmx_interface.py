"""OpenMX scfout parsing: synthetic golden files, Python vs C++ parser parity,
graph packing."""

import json
import os
import struct
import subprocess

import numpy as np
import pytest

from hamgnn_tpu.interfaces.openmx import (
    ScfoutData,
    inverse_edges,
    pack_crystal,
    parse_scfout,
)

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                      "scfout_reader")


def write_synthetic_scfout(path, rng, atomnum=2, spinp=0, norb=4, ext=True):
    """Emit a little-endian SCFOUT v3 file with random data (format per
    read_openmx.c) and return the expected parsed content."""
    out = {}
    f = open(path, "wb")

    def w_i(*vals):
        f.write(struct.pack(f"<{len(vals)}i", *vals))

    def w_d(arr):
        arr = np.asarray(arr, float).ravel()
        f.write(struct.pack(f"<{len(arr)}d", *arr))

    # periodic images: identity cell, shifts 0 and +x/-x
    shifts = [(0, 0, 0), (1, 0, 0), (-1, 0, 0)]
    tcpycell = len(shifts) - 1
    version = 3
    w_i(atomnum, spinp + 4 * version, 0, 0, 0, tcpycell)
    w_i(1)  # order_max
    cell = np.eye(3) * 8.0
    for s in shifts:
        w_d([0.0, *(np.asarray(s) @ cell)])
    for s in shifts:
        w_i(0, *s)
    num_orbs = [norb] * atomnum
    w_i(*num_orbs)
    # neighbors: each atom sees the other in shifts 0, and itself in +x/-x
    natn = []
    ncn = []
    for a in range(atomnum):
        other = (a + 1) % atomnum
        natn.append([a + 1, other + 1, a + 1, a + 1])
        ncn.append([0, 0, 1, 2])
    fnan = [len(x) - 1 for x in natn]
    w_i(*fnan)
    for a in range(atomnum):
        w_i(*natn[a])
    for a in range(atomnum):
        w_i(*ncn[a])
    for i in range(3):
        w_d([0.0, *cell[i]])
    rcell = np.linalg.inv(cell).T * 2 * np.pi
    for i in range(3):
        w_d([0.0, *rcell[i]])
    pos = rng.uniform(0, 8, (atomnum, 3))
    for a in range(atomnum):
        w_d([0.0, *pos[a]])

    def blocks(vec=1):
        per = []
        for a in range(atomnum):
            row = []
            for h in range(fnan[a] + 1):
                gh = natn[a][h] - 1
                shape = (num_orbs[a], num_orbs[gh]) + ((vec,) if vec > 1 else ())
                b = rng.normal(size=shape)
                w_d(b)
                row.append(b)
            per.append(row)
        return per

    out["Hks"] = [blocks() for _ in range(spinp + 1)]
    if spinp == 3:
        out["iHks"] = [blocks() for _ in range(3)]
    out["OLP"] = blocks()
    if ext:
        out["D_OLP"] = blocks(3)
        out["OLP_L"] = blocks(3)
    out["DM"] = [blocks() for _ in range(spinp + 1)]
    out["iDM"] = [blocks() for _ in range(2)]
    w_i(2)  # solver
    w_d([0.05, 300.0, 0, 0, 0, 0, 0, 0, 8.0, 0.0])
    f.close()
    out.update(pos=pos, cell=cell, natn=natn, ncn=ncn, shifts=shifts)
    return out


class TestPythonParser:
    @pytest.mark.parametrize("spinp", [0, 1, 3])
    def test_roundtrip(self, tmp_path, spinp):
        rng = np.random.default_rng(spinp)
        path = str(tmp_path / "test.scfout")
        ref = write_synthetic_scfout(path, rng, spinp=spinp)
        scf = parse_scfout(path)
        assert scf.atomnum == 2
        assert scf.spinp_switch == spinp
        np.testing.assert_allclose(scf.pos, ref["pos"])
        np.testing.assert_allclose(scf.cell, ref["cell"])
        # on-site H blocks
        for s in range(spinp + 1):
            for a in range(2):
                np.testing.assert_allclose(scf.Hon[s][a], ref["Hks"][s][a][0])
        # off-site blocks in edge order
        e = 0
        for a in range(2):
            for h in range(1, 4):
                np.testing.assert_allclose(scf.Hoff[0][e], ref["Hks"][0][a][h])
                np.testing.assert_allclose(scf.Soff[e], ref["OLP"][a][h])
                e += 1
        if spinp == 3:
            np.testing.assert_allclose(scf.iHon[0][0], ref["iHks"][0][0][0])
        np.testing.assert_allclose(scf.Lon[0], ref["OLP_L"][0][0])
        assert scf.valence_electrons == 8.0

    def test_inverse_edges(self, tmp_path):
        rng = np.random.default_rng(9)
        path = str(tmp_path / "t.scfout")
        write_synthetic_scfout(path, rng)
        scf = parse_scfout(path)
        inv = inverse_edges(scf.edge_src, scf.edge_dst, scf.cell_shift)
        for e in range(len(inv)):
            j = inv[e]
            assert scf.edge_src[j] == scf.edge_dst[e]
            assert (scf.cell_shift[j] == -scf.cell_shift[e]).all()


@pytest.mark.skipif(not os.path.exists(NATIVE), reason="native reader not built")
class TestNativeParser:
    @pytest.mark.parametrize("spinp", [0, 3])
    def test_matches_python(self, tmp_path, spinp):
        rng = np.random.default_rng(100 + spinp)
        path = str(tmp_path / "t.scfout")
        write_synthetic_scfout(path, rng, spinp=spinp)
        scf = parse_scfout(path)

        out_json = str(tmp_path / "HS.json")
        subprocess.run([NATIVE, path, out_json], check=True)
        with open(out_json) as f:
            hs = json.load(f)

        np.testing.assert_array_equal(hs["edge_index"],
                                      np.stack([scf.edge_src, scf.edge_dst]))
        np.testing.assert_allclose(hs["pos"], scf.pos, atol=1e-6)
        np.testing.assert_array_equal(hs["cell_shift"], scf.cell_shift)
        np.testing.assert_array_equal(
            hs["inv_edge_idx"],
            inverse_edges(scf.edge_src, scf.edge_dst, scf.cell_shift))
        for s in range(len(scf.Hon)):
            for a in range(scf.atomnum):
                np.testing.assert_allclose(hs["Hon"][s][a],
                                           scf.Hon[s][a].ravel(), atol=1e-9)
            for e in range(len(scf.Hoff[s])):
                np.testing.assert_allclose(hs["Hoff"][s][e],
                                           scf.Hoff[s][e].ravel(), atol=1e-9)
        for e in range(len(scf.Soff)):
            np.testing.assert_allclose(hs["Soff"][e], scf.Soff[e].ravel(), atol=1e-9)
        # Lon entries are (no*no, 3) lists
        np.testing.assert_allclose(
            np.asarray(hs["Lon"][0]), scf.Lon[0].reshape(-1, 3), atol=1e-6)


class TestPacking:
    def test_pack_non_soc(self, tmp_path):
        rng = np.random.default_rng(3)
        path = str(tmp_path / "t.scfout")
        write_synthetic_scfout(path, rng, norb=5)  # H basis: 5 orbitals
        scf = parse_scfout(path)
        c = pack_crystal(scf, z=[1, 1], nao_max=14)
        assert c["Hon"].shape == (2, 196)
        assert c["Hoff"].shape == (6, 196)
        # dense scatter puts values at H's basis_def positions [0,1,3,4,5]
        from hamgnn_tpu.models.basis import get_basis_set

        idx = np.asarray(get_basis_set("openmx", 14).basis_def[1])
        dense = c["Hon"][0].reshape(14, 14)
        np.testing.assert_allclose(dense[idx[:, None], idx[None, :]], scf.Hon[0][0])
        off_positions = np.ones((14, 14), bool)
        off_positions[idx[:, None], idx[None, :]] = False
        assert np.abs(dense[off_positions]).max() == 0.0

    def test_pack_soc(self, tmp_path):
        rng = np.random.default_rng(4)
        path = str(tmp_path / "t.scfout")
        write_synthetic_scfout(path, rng, spinp=3, norb=5)
        scf = parse_scfout(path)
        c = pack_crystal(scf, z=[1, 1], nao_max=14, soc=True)
        big = (2 * 14) ** 2
        assert c["Hon"].shape == (2, big)
        assert c["iHon"].shape == (2, big)
        assert c["Lon"].shape == (2, 196, 3)
        # block placement: uu quadrant holds spin-0 component
        from hamgnn_tpu.models.basis import get_basis_set

        idx = np.asarray(get_basis_set("openmx", 14).basis_def[1])
        hr = c["Hon"][0].reshape(28, 28)
        np.testing.assert_allclose(hr[:14, :14][idx[:, None], idx[None, :]],
                                   scf.Hon[0][0])
        np.testing.assert_allclose(hr[14:, 14:][idx[:, None], idx[None, :]],
                                   scf.Hon[1][0])


class TestCLIs:
    def test_graph_data_gen_end_to_end(self, tmp_path):
        import yaml as _yaml

        from hamgnn_tpu.data.dataset import load_graph_npz
        from hamgnn_tpu.tools.graph_data_gen import main as gen_main
        from hamgnn_tpu.tools.poscar2openmx import write_openmx_dat

        rng = np.random.default_rng(7)
        d = tmp_path / "struct_1"
        d.mkdir()
        write_synthetic_scfout(str(d / "openmx.scfout"), rng, norb=5)
        # matching H0 file
        rng0 = np.random.default_rng(7)
        write_synthetic_scfout(str(d / "overlap.scfout"), rng0, norb=5)
        cell = np.eye(3) * 8.0 * 0.5291772490000065
        write_openmx_dat(cell, ["H", "H"], np.zeros((2, 3)),
                         "System.Name test\n", str(d / "openmx.dat"))

        cfg = {
            "nao_max": 14,
            "graph_data_save_path": str(tmp_path / "out"),
            "max_SCF_skip": 200,
            "scfout_paths": str(tmp_path / "struct_*"),
            "dat_file_name": "openmx.dat",
            "std_file_name": None,
            "scfout_file_name": "openmx.scfout",
            "soc_switch": False,
        }
        cfg_path = tmp_path / "gen.yaml"
        cfg_path.write_text(_yaml.safe_dump(cfg))
        gen_main(["--config", str(cfg_path)])

        graphs = load_graph_npz(str(tmp_path / "out" / "graph_data.npz"))
        assert len(graphs) == 1
        g = graphs[0]
        assert g["Hon"].shape == (2, 196)
        assert g["Hon0"].shape == (2, 196)
        np.testing.assert_allclose(g["Hon"], g["Hon0"])  # same rng seed

    def test_poscar_roundtrip(self, tmp_path):
        from hamgnn_tpu.tools.graph_data_gen import read_openmx_dat
        from hamgnn_tpu.tools.poscar2openmx import read_poscar, write_openmx_dat

        poscar = tmp_path / "POSCAR"
        poscar.write_text(
            "Si2\n1.0\n"
            "  5.43 0.00 0.00\n  0.00 5.43 0.00\n  0.00 0.00 5.43\n"
            "Si\n2\nDirect\n"
            "  0.00 0.00 0.00\n  0.25 0.25 0.25\n")
        cell, syms, pos = read_poscar(str(poscar))
        assert syms == ["Si", "Si"]
        np.testing.assert_allclose(pos[1], [1.3575] * 3)

        dat = tmp_path / "t.dat"
        write_openmx_dat(cell, syms, pos, "# header\n", str(dat))
        z, latt, coords = read_openmx_dat(str(dat))
        np.testing.assert_array_equal(z, [14, 14])
        np.testing.assert_allclose(latt * 0.5291772490000065, cell, atol=1e-5)
        np.testing.assert_allclose(coords * 0.5291772490000065, pos, atol=1e-5)
