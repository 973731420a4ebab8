"""Diagnostic: can the model drive MAE -> ~0 on a handful of SK structures?

Separates expressivity limits (plateau even when memorizing) from
optimization/data limits (memorizes fine, full-set training just needs a
better schedule).  Usage:

    python tools_dev/overfit_probe.py [--n 8] [--steps 2000] [--config ...]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="examples/sk/config.yaml")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--log-every", type=int, default=100)
    args = ap.parse_args()

    from hamgnn_tpu.cli import build_model
    from hamgnn_tpu.data.dataset import load_graph_npz
    from hamgnn_tpu.train.config import load_config
    from hamgnn_tpu.train.trainer import Trainer
    import os

    cfg = load_config(args.config)
    path = cfg.dataset_params.graph_data_path
    if os.path.isdir(path):
        path = os.path.join(path, "graph_data.npz")
    graphs = load_graph_npz(path)
    model = build_model(cfg)

    from hamgnn_tpu.data.dataset import GraphDataModule

    dm = GraphDataModule(graphs[: args.n], batch_size=args.n,
                         train_ratio=1.0, val_ratio=0.0, test_ratio=0.0)
    dm.train_idx = list(range(args.n))
    tr = Trainer(model, cfg.losses_metrics.losses, cfg.losses_metrics.metrics,
                 lr=args.lr, train_dir="/tmp/overfit_probe")
    batch = next(dm.train_batches(np.random.default_rng(0)))
    tr.init_params(batch)
    step = tr._get_train_step(batch)
    import jax.numpy as jnp

    lr = args.lr
    t0 = time.time()
    for it in range(args.steps):
        # simple staircase decay so the probe is not schedule-limited
        if it in (args.steps // 2, 3 * args.steps // 4, 7 * args.steps // 8):
            lr *= 0.2
        tr.params, tr.opt_state, loss, logs = step(
            tr.params, tr.opt_state, batch, jnp.asarray(lr, jnp.float32))
        if it % args.log_every == 0 or it == args.steps - 1:
            mets = {}
            _, _, mets, _ = tr._get_eval_step(batch)(tr.params, batch)
            mets = {k: float(v) for k, v in mets.items()}
            print(f"step {it:5d} lr {lr:.2e} loss {float(loss):.3e} "
                  f"{mets} [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
