"""SOC band-structure acceptance (reference band_cal SOC mode, 2*nao
spinor assembly): predict spinor Hamiltonians for the pristine SOC band
structures with the trained checkpoint, solve bands via the SOC path of
tools/band_cal, and compare to the teacher bands around E_F.

Usage: python tools_dev/soc_band_acceptance.py [--skip-predict]
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
    ap.add_argument("--window", type=float, default=5.0)
    ap.add_argument("--nk", type=int, default=48)
    args = ap.parse_args()

    if not args.skip_predict:
        env = {**os.environ, "HAMGNN_TP_ENGINE": "xla"}
        r = subprocess.run(
            [sys.executable, "-m", "hamgnn_tpu.cli", "--config",
             "examples/sk_soc/config_band_test.yaml"], check=False, env=env)
        if r.returncode != 0:
            sys.exit("prediction pass failed")

    from hamgnn_tpu.data.dataset import load_graph_npz
    from hamgnn_tpu.models.basis import get_basis_set
    from hamgnn_tpu.physics.kpoints import auto_k_path
    from hamgnn_tpu.tools.band_cal import (band_structure_for_crystal,
                                           plot_bands)

    nao = 14
    basis = get_basis_set("openmx", nao)
    graphs = load_graph_npz("datasets/sk_soc_band_graph/graph_data.npz")
    out_dir = "train_out/sk_soc_band_pred"
    Hr = np.load(os.path.join(out_dir, "prediction_hamiltonian_real.npy"))
    Hi = np.load(os.path.join(out_dir, "prediction_hamiltonian_imag.npy"))

    devs = []
    ofs = 0
    for idx, c in enumerate(graphs):
        n = len(c["z"])
        e = np.asarray(c["edge_index"]).shape[1]
        hr = Hr[ofs : ofs + n + e]
        hi = Hi[ofs : ofs + n + e]
        ofs += n + e
        hr_t = np.concatenate([np.asarray(c["Hon"]), np.asarray(c["Hoff"])])
        hi_t = np.concatenate([np.asarray(c["iHon"]), np.asarray(c["iHoff"])])

        nodes, labs = auto_k_path(np.asarray(c["cell"], float).reshape(3, 3))
        rp = band_structure_for_crystal(c, hr, nao, basis, args.nk, nodes,
                                        soc=True, ih_rows=hi)
        rr = band_structure_for_crystal(c, hr_t, nao, basis, args.nk, nodes,
                                        soc=True, ih_rows=hi_t)
        win = np.abs(rr["bands"] - rr["fermi"]) < args.window
        dev = np.abs(rp["bands"] - rr["bands"])[win]
        devs.append(dev)
        plot_bands(rp, labs, os.path.join(out_dir, f"pred_soc_{idx}_bands.png"))
        plot_bands(rr, labs, os.path.join(out_dir, f"ref_soc_{idx}_bands.png"))
        print(f"[{idx}] n={n} max|dE|={dev.max()*1e3:.3f} meV "
              f"mean={dev.mean()*1e3:.3f} meV gap_ref={rr['gap']:.4f} "
              f"gap_pred={rp['gap']:.4f} eV", flush=True)

    dev = np.concatenate([d.ravel() for d in devs])
    print(json.dumps({
        "n_structures": len(graphs), "window_eV": args.window,
        "soc_band_dev_max_meV": float(dev.max() * 1e3),
        "soc_band_dev_mean_meV": float(dev.mean() * 1e3),
    }))


if __name__ == "__main__":
    main()
