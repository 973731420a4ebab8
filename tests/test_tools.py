"""Tools tests: neighbor list, band_cal CLI end-to-end, parallel band solver."""

import os

import numpy as np
import pytest
import yaml

from hamgnn_tpu.data.dataset import save_graph_npz
from hamgnn_tpu.data.neighborlist import (
    build_crystal_graph,
    inverse_edge_index,
    neighbor_list_pbc,
    radii_for_z,
)
from hamgnn_tpu.models.basis import get_basis_set
from hamgnn_tpu.tools.band_cal import band_structure_for_crystal, main as band_cal_main
from hamgnn_tpu.tools.band_cal_parallel import solve_bands_batched

from util_fixtures import add_random_hamiltonian_targets, make_crystal


class TestNeighborList:
    def test_matches_bruteforce(self):
        """Scalar-cutoff list == the fixture's +-1-image brute force."""
        rng = np.random.default_rng(0)
        c = make_crystal(rng, n_atoms=5, cell_size=7.0, cutoff=3.5)
        ei, cs, ns = neighbor_list_pbc(c["pos"], c["cell"][0], 3.5)
        ref = {(int(a), int(b), tuple(map(int, s)))
               for a, b, s in zip(*c["edge_index"], c["cell_shift"])}
        got = {(int(a), int(b), tuple(map(int, s)))
               for a, b, s in zip(ei[0], ei[1], cs)}
        assert got == ref

    def test_inverse_edges(self):
        rng = np.random.default_rng(1)
        c = make_crystal(rng, n_atoms=4)
        ei, cs, _ = neighbor_list_pbc(c["pos"], c["cell"][0], 4.0)
        inv = inverse_edge_index(ei, cs)
        for e in range(ei.shape[1]):
            j = inv[e]
            assert ei[0, j] == ei[1, e] and ei[1, j] == ei[0, e]
            assert (cs[j] == -cs[e]).all()

    def test_per_species_radii(self):
        r = radii_for_z([1, 6, 14], "openmx")
        np.testing.assert_allclose(r, [6.0, 6.0, 7.0])
        r = radii_for_z([1, 6], "abacus", radius_scale=1.5)
        np.testing.assert_allclose(r, [9.0, 10.5])

    def test_build_crystal_graph(self):
        rng = np.random.default_rng(2)
        pos = rng.uniform(0, 8, (4, 3))
        cell = np.eye(3) * 8.0
        g = build_crystal_graph([6, 6, 14, 14], pos, cell, "openmx",
                                radius_scale=0.4)
        assert g["edge_index"].shape[1] == g["inv_edge_idx"].shape[0]
        assert g["edge_index"].shape[1] > 0


@pytest.fixture(scope="module")
def band_fixture():
    rng = np.random.default_rng(3)
    c = make_crystal(rng, n_atoms=3, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    return c


class TestBandCal:
    def test_band_structure_sane(self, band_fixture):
        c = band_fixture
        basis = get_basis_set("openmx", 14)
        h_rows = np.concatenate([c["Hon"], c["Hoff"]])
        res = band_structure_for_crystal(
            c, h_rows, 14, basis, nk=12,
            k_path_nodes=[[0, 0, 0], [0.5, 0, 0], [0.5, 0.5, 0]])
        assert res["bands"].shape[0] == 12
        assert np.isfinite(res["bands"]).all()
        assert res["gap"] >= 0.0
        # bands sorted ascending
        assert (np.diff(res["bands"], axis=1) >= -1e-6).all()

    def test_cli_end_to_end(self, band_fixture, tmp_path):
        c = band_fixture
        npz = str(tmp_path / "graph_data.npz")
        save_graph_npz(npz, [c])
        cfg = {
            "nao_max": 14, "graph_data_path": npz, "hamiltonian_path": None,
            "nk": 10, "save_dir": str(tmp_path / "out"),
            "strcture_name": "test", "soc_switch": False,
            "auto_mode": False,
            "k_path": [[0, 0, 0], [0.5, 0, 0]], "label": ["G", "X"],
        }
        cfg_path = str(tmp_path / "band_cal.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        band_cal_main(["--config", cfg_path])
        assert os.path.exists(tmp_path / "out" / "test_0_bands.npz")
        assert os.path.exists(tmp_path / "out" / "test_0_bands.png")
        assert os.path.exists(tmp_path / "out" / "test_0.cif")
        assert os.path.exists(tmp_path / "out" / "test_0_bands.dat")

    def test_cli_collinear_spin(self, band_fixture, tmp_path):
        """Collinear-spin band mode (reference band_cal.py:284-431): per-spin
        H(k) from the 2-channel stacks against the spin-independent overlap,
        band_spin{i}_* outputs; the channels differ by the spin splitting."""
        c = dict(band_fixture)
        rng = np.random.default_rng(9)
        split = 0.05 * np.abs(rng.normal(size=c["Hon"].shape))
        c["Hon"] = np.stack([c["Hon"] + split, c["Hon"] - split], axis=1)
        c["Hoff"] = np.stack([c["Hoff"], c["Hoff"]], axis=1)
        npz = str(tmp_path / "graph_data.npz")
        save_graph_npz(npz, [c])
        cfg = {
            "nao_max": 14, "graph_data_path": npz, "hamiltonian_path": None,
            "nk": 8, "save_dir": str(tmp_path / "out"),
            "strcture_name": "test", "soc_switch": False,
            "spin_colinear": True, "auto_mode": False,
            "k_path": [[0, 0, 0], [0.5, 0, 0]], "label": ["G", "X"],
        }
        cfg_path = str(tmp_path / "band_cal.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        band_cal_main(["--config", cfg_path])
        res = []
        for ispin in range(2):
            stem = tmp_path / "out" / f"band_spin{ispin}_0"
            assert os.path.exists(f"{stem}.npz")
            assert os.path.exists(f"{stem}.png")
            assert os.path.exists(f"{stem}.dat")
            res.append(np.load(f"{stem}.npz"))
        assert np.isfinite(res[0]["bands"]).all()
        # up/down channels must differ by the injected splitting
        assert np.abs(res[0]["bands"] - res[1]["bands"]).max() > 1e-3

    def test_parallel_solver_matches_scipy(self, band_fixture):
        import scipy.linalg

        rng = np.random.default_rng(4)
        n, nk = 12, 6
        HK = rng.normal(size=(nk, n, n)) + 1j * rng.normal(size=(nk, n, n))
        HK = 0.5 * (HK + np.conj(np.transpose(HK, (0, 2, 1))))
        S0 = 0.1 * (rng.normal(size=(nk, n, n)) + 1j * rng.normal(size=(nk, n, n)))
        SK = np.eye(n) + 0.5 * (S0 + np.conj(np.transpose(S0, (0, 2, 1))))
        got = solve_bands_batched(HK, SK, k_batch=4)
        want = np.stack([scipy.linalg.eigh(HK[k], SK[k], eigvals_only=True)
                         for k in range(nk)])
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestWfnExport:
    def test_cube_writer(self, tmp_path, band_fixture):
        from hamgnn_tpu.models.basis import get_basis_set
        from hamgnn_tpu.tools.wfn_export import density_on_grid, write_cube

        c = band_fixture
        basis = get_basis_set("openmx", 14)
        n_orb = sum(len(basis.basis_def[int(zz)]) for zz in c["z"])
        coeffs = np.random.default_rng(0).normal(size=n_orb) \
            + 1j * np.random.default_rng(1).normal(size=n_orb)
        rho = density_on_grid(c, coeffs, basis, 14, grid_shape=(8, 8, 8))
        assert rho.shape == (8, 8, 8)
        assert np.isfinite(rho).all() and (rho >= 0).all()
        p = str(tmp_path / "b.cube")
        write_cube(p, np.asarray(c["cell"]).reshape(3, 3),
                   np.asarray(c["pos"]), np.asarray(c["z"], int), rho)
        head = open(p).read().splitlines()
        assert int(head[2].split()[0]) == len(c["z"])

    def _write_pao(self, path, lmax=1, mul=2, mesh=24):
        """Synthetic .pao in the exact format wfn2cube's own test writes
        (wfn2cube.c:1325-1352)."""
        with open(path, "w") as f:
            f.write(f"PAO.Lmax  {lmax}\nPAO.Mul   {mul}\n")
            f.write(f"grid.num.output  {mesh}\n")
            for L in range(lmax + 1):
                f.write(f"<pseudo.atomic.orbitals.L={L}\n")
                for i in range(mesh):
                    rv = 0.25 * (i + 1)
                    vals = "  ".join(
                        f"{np.exp(-rv / (1.0 + 0.5 * m + L)):.10f}"
                        for m in range(mul))
                    f.write(f"{rv * 1.8897:.6f}  {rv:.6f}  {vals}\n")
                f.write(f"pseudo.atomic.orbitals.L={L}>\n")

    def test_pao_parse_and_phif(self, tmp_path):
        from hamgnn_tpu.interfaces.pao import parse_pao, phi_f

        p = str(tmp_path / "Si7.0.pao")
        self._write_pao(p, lmax=2, mul=2, mesh=32)
        pao = parse_pao(p)
        assert pao.lmax == 2 and pao.mul == 2 and pao.rv.shape == (32,)
        # interpolation reproduces grid values exactly at the nodes...
        r_nodes = pao.rv[3:-3]
        got = phi_f(r_nodes, pao.rwf[1][0], pao.rv)
        np.testing.assert_allclose(got, pao.rwf[1][0][3:-3], atol=1e-12)
        # ...tracks the smooth exp between nodes, vanishes past the cutoff
        r_mid = 0.5 * (pao.rv[5] + pao.rv[6])
        val = phi_f(np.array([r_mid]), pao.rwf[0][0], pao.rv)[0]
        assert abs(val - np.exp(-r_mid)) < 1e-4
        assert phi_f(np.array([pao.rv[-1] + 1.0]), pao.rwf[0][0], pao.rv)[0] == 0.0
        # near-origin extrapolation is the PhiF.c parabola a*R^2 + b:
        # exactly quadratic in R below rv[0]
        rs = np.array([0.02, 0.05, 0.11])
        vs = phi_f(rs, pao.rwf[0][0], pao.rv)
        A = np.stack([rs**2, np.ones(3)], axis=1)
        coef, *_ = np.linalg.lstsq(A, vs, rcond=None)
        np.testing.assert_allclose(A @ coef, vs, atol=1e-12)
        assert np.isfinite(vs).all()

    def test_angular_f_orthonormal(self):
        """OpenMX real harmonics are orthonormal on the sphere (l<=3)."""
        from hamgnn_tpu.interfaces.pao import angular_f

        rng = np.random.default_rng(0)
        n = 200_000
        theta = np.arccos(rng.uniform(-1, 1, n))
        phi = rng.uniform(-np.pi, np.pi, n)
        funcs = [(l, m) for l in range(4) for m in range(2 * l + 1)]
        vals = np.stack([angular_f(l, m, theta, phi) for l, m in funcs])
        gram = 4 * np.pi * vals @ vals.T / n
        np.testing.assert_allclose(gram, np.eye(len(funcs)), atol=0.05)

    def test_density_exact_pao_path(self, tmp_path, band_fixture):
        from hamgnn_tpu.interfaces.pao import find_pao_file, parse_pao
        from hamgnn_tpu.models.basis import get_basis_set
        from hamgnn_tpu.tools.wfn_export import density_on_grid

        os.makedirs(tmp_path / "PAO", exist_ok=True)
        for nm in ("Si7.0", "C6.0"):
            self._write_pao(str(tmp_path / "PAO" / f"{nm}.pao"),
                            lmax=2, mul=3, mesh=32)
        assert find_pao_file(str(tmp_path), "Si7.0-s3p2d1") is not None
        c = band_fixture
        basis = get_basis_set("openmx", 14)
        pao_by_z = {int(z): parse_pao(str(tmp_path / "PAO" / "Si7.0.pao"))
                    for z in set(int(v) for v in c["z"])}
        n_orb = sum(len(basis.basis_def[int(zz)]) for zz in c["z"])
        coeffs = np.random.default_rng(0).normal(size=n_orb)
        rho = density_on_grid(c, coeffs, basis, 14, grid_shape=(6, 6, 6),
                              pao_by_z=pao_by_z)
        assert np.isfinite(rho).all() and (rho >= 0).all()
        # exact path differs from the GTO approximation
        rho_gto = density_on_grid(c, coeffs, basis, 14, grid_shape=(6, 6, 6))
        assert not np.allclose(rho, rho_gto)


class TestVisualization:
    def test_scatter(self, tmp_path):
        from hamgnn_tpu.utils.visualization import scatter_plot

        rng = np.random.default_rng(0)
        t = rng.normal(size=1000)
        mae = scatter_plot(t + 0.01 * rng.normal(size=1000), t,
                           str(tmp_path / "s.png"))
        assert 0.005 < mae < 0.02
        assert (tmp_path / "s.png").exists()


class TestTriplets:
    """utils/triplets.py vs a brute-force O(E^2) reference enumeration."""

    def test_matches_bruteforce(self):
        import numpy as np

        from hamgnn_tpu.utils.triplets import triplets

        rng = np.random.default_rng(5)
        from util_fixtures import make_crystal
        c = make_crystal(rng, n_atoms=6, species=(1, 6), cell_size=5.0,
                         cutoff=3.0)
        ei = np.asarray(c["edge_index"])
        cs = np.asarray(c["cell_shift"])
        col_, row_, ti, tj, tk, tkj, tji = triplets(ei, 6, cs)

        expect = set()
        E = ei.shape[1]
        for ji in range(E):
            j, i = ei[0, ji], ei[1, ji]
            for kj in range(E):
                if ei[1, kj] != j:
                    continue
                k = ei[0, kj]
                rel = cs[kj] + cs[ji]
                if k == i and not rel.any():
                    continue  # edge paired with its own inverse
                expect.add((int(i), int(j), int(k), int(kj), int(ji)))
        got = set(zip(ti.tolist(), tj.tolist(), tk.tolist(),
                      tkj.tolist(), tji.tolist()))
        assert got == expect and len(got) > 0
