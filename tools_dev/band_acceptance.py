"""Band-structure reproduction acceptance test (reference README.md:368-402).

Steps:
  1. predict Hamiltonians for the pristine band-test structures with the
     trained checkpoint (examples/sk/config_band_test.yaml, stage=test)
  2. band_cal on the prediction and on the teacher Hamiltonians
  3. compare eigenvalues in a window around the Fermi level

Usage (after training examples/sk/config.yaml to convergence):

    python tools_dev/band_acceptance.py [--skip-predict] [--window 5.0]

SIESTA / ABACUS variants (after examples/sk_siesta / sk_abacus training):

    python tools_dev/band_acceptance.py --ham-type siesta --nao 19 \
        --config examples/sk_siesta/config_band_test.yaml \
        --graph datasets/sk_siesta_band_graph/graph_data.npz \
        --out train_out/sk_siesta_band_pred

Prints one JSON line with max/mean band deviations (meV) and writes
band plots under the output dir.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-predict", action="store_true")
    ap.add_argument("--window", type=float, default=5.0,
                    help="eV window around E_F for the comparison")
    ap.add_argument("--nk", type=int, default=60)
    ap.add_argument("--ham-type", default="openmx")
    ap.add_argument("--nao", type=int, default=14)
    ap.add_argument("--config", default="examples/sk/config_band_test.yaml")
    ap.add_argument("--graph", default="datasets/sk_band_graph/graph_data.npz")
    ap.add_argument("--out", default="train_out/sk_band_pred")
    args = ap.parse_args()

    if not args.skip_predict:
        r = subprocess.run(
            [sys.executable, "-m", "hamgnn_tpu.cli", "--config",
             args.config], check=False)
        if r.returncode != 0:
            sys.exit("prediction pass failed")

    from hamgnn_tpu.data.dataset import load_graph_npz
    from hamgnn_tpu.models.basis import get_basis_set
    from hamgnn_tpu.physics.kpoints import auto_k_path
    from hamgnn_tpu.tools.band_cal import (band_structure_for_crystal,
                                           plot_bands)

    nao = args.nao
    basis = get_basis_set(args.ham_type, nao)
    graphs = load_graph_npz(args.graph)
    H_flat = np.load(os.path.join(args.out, "prediction_hamiltonian.npy"))

    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)
    max_dev = mean_devs = 0.0
    devs = []
    ofs = 0
    for idx, c in enumerate(graphs):
        n = len(c["z"])
        e = np.asarray(c["edge_index"]).shape[1]
        h_pred = H_flat[ofs : ofs + n + e]
        ofs += n + e
        h_ref = np.concatenate([np.asarray(c["Hon"]), np.asarray(c["Hoff"])])

        nodes, labs = auto_k_path(np.asarray(c["cell"], float).reshape(3, 3))
        rp = band_structure_for_crystal(c, h_pred, nao, basis, args.nk, nodes)
        rr = band_structure_for_crystal(c, h_ref, nao, basis, args.nk, nodes)

        win = np.abs(rr["bands"] - rr["fermi"]) < args.window
        dev = np.abs(rp["bands"] - rr["bands"])[win]
        devs.append(dev)
        plot_bands(rp, labs, os.path.join(out_dir, f"pred_{idx}_bands.png"))
        plot_bands(rr, labs, os.path.join(out_dir, f"ref_{idx}_bands.png"))
        print(f"[{idx}] n={n} max|dE|={dev.max()*1e3:.3f} meV "
              f"mean={dev.mean()*1e3:.3f} meV gap_ref={rr['gap']:.3f} "
              f"gap_pred={rp['gap']:.3f} eV", flush=True)

    dev = np.concatenate([d.ravel() for d in devs])
    result = {
        "n_structures": len(graphs),
        "window_eV": args.window,
        "band_dev_max_meV": float(dev.max() * 1e3),
        "band_dev_mean_meV": float(dev.mean() * 1e3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
