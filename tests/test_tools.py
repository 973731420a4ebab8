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
