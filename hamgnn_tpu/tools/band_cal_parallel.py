"""band_cal_parallel: accelerator-batched band solver for large systems.

Replaces the reference's MPI wheel (`mpirun band_cal_parallel`,
/root/reference/tools/band_cal_parallel/) with the TPU-native equivalent: the
k-point loop becomes one jit-compiled batched Hermitian eigensolve
(vmapped Cholesky-reduced eigh), optionally sharded over a device mesh with
``jax.sharding`` so k-points ride all available chips.

Same YAML config as band_cal; extra key: ``k_batch`` (k-points per solve).
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np
import yaml

from ..models.basis import get_basis_set
from .band_cal import HARTREE2EV, _auto_k_path, assemble_k_matrices_numpy


@functools.lru_cache(maxsize=8)
def _batched_geig(norb: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def solve(HK, SK):
        L = jnp.linalg.cholesky(SK)
        Hh = jax.scipy.linalg.solve_triangular(L, HK, lower=True)
        A = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(
                L, jnp.swapaxes(Hh, -1, -2).conj(), lower=True), -1, -2).conj()
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2).conj())
        return jnp.linalg.eigh(A)[0]

    return solve


def solve_bands_batched(HK: np.ndarray, SK: np.ndarray, k_batch: int = 32,
                        mesh=None) -> np.ndarray:
    """Generalized eigenvalues for (nk, n, n) Hermitian pairs, batched on the
    accelerator.  With a mesh, shards the k batch across devices."""
    import jax

    nk, n, _ = HK.shape
    solve = _batched_geig(n)
    out = []
    for s in range(0, nk, k_batch):
        hk = HK[s : s + k_batch].astype(np.complex64)
        sk = SK[s : s + k_batch].astype(np.complex64)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            pad = (-len(hk)) % mesh.devices.size
            if pad:
                hk = np.concatenate([hk, np.tile(hk[-1:], (pad, 1, 1))])
                sk = np.concatenate([sk, np.tile(sk[-1:], (pad, 1, 1))])
            sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            hk = jax.device_put(hk, sh)
            sk = jax.device_put(sk, sh)
            ev = np.asarray(solve(hk, sk))
            if pad:
                ev = ev[:-pad]
        else:
            ev = np.asarray(solve(hk, sk))
        out.append(ev)
    return np.concatenate(out)


def main(argv=None):
    from ..data.dataset import load_graph_npz
    from ..physics.kpoints import k_path as make_k_path

    parser = argparse.ArgumentParser(description="parallel band calculation")
    parser.add_argument("--config", default="band_cal_parallel.yaml", type=str)
    args = parser.parse_args(argv)
    with open(args.config, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    nao = cfg["nao_max"]
    basis = get_basis_set(cfg.get("Ham_type", "openmx").lower(), nao)
    save_dir = cfg["save_dir"]
    os.makedirs(save_dir, exist_ok=True)
    nk = cfg["nk"]
    k_batch = cfg.get("k_batch", 32)

    graphs = load_graph_npz(cfg["graph_data_path"])
    ham_path = cfg.get("hamiltonian_path")
    H_flat = np.load(ham_path) if ham_path else None

    ofs = 0
    for idx, c in enumerate(graphs):
        z = np.asarray(c["z"], int)
        n = len(z)
        e = np.asarray(c["edge_index"]).shape[1]
        h_rows = (H_flat[ofs : ofs + n + e] if H_flat is not None
                  else np.concatenate([c["Hon"], c["Hoff"]]))
        ofs += n + e
        s_rows = np.concatenate([np.asarray(c["Son"]), np.asarray(c["Soff"])])

        cell = np.asarray(c["cell"]).reshape(3, 3)
        nodes = cfg.get("k_path") or _auto_k_path(cell)[0]
        k_frac, k_dist, k_node, lat_inv = make_k_path(nodes, nk, cell)
        k_cart = k_frac @ lat_inv

        table = basis.orbital_mask_table
        valid = np.concatenate([table[zi] > 0 for zi in z])
        HK = assemble_k_matrices_numpy(
            h_rows, n, np.asarray(c["edge_index"], int),
            np.asarray(c["nbr_shift"], float), k_cart, nao, valid)
        SK = assemble_k_matrices_numpy(
            s_rows, n, np.asarray(c["edge_index"], int),
            np.asarray(c["nbr_shift"], float), k_cart, nao, valid)
        bands = solve_bands_batched(HK, SK, k_batch=k_batch) * HARTREE2EV
        np.savez(os.path.join(save_dir, f"bands_{idx}.npz"),
                 k_dist=k_dist, k_node=k_node, bands=bands)
        print(f"[{idx}] solved {bands.shape} bands")


if __name__ == "__main__":
    main()
