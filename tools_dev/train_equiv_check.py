"""Dev-only: N train steps with the Pallas engine vs the XLA engine from the
same init — loss trajectories must track to float-reassociation tolerance.
Run on the real chip (both engines' kernels are compile-cached)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import functools

import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from bench import build_bench_case

from hamgnn_tpu.cli import build_model
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu


def run(engine, n_steps=10, n_atoms=256):
    os.environ["HAMGNN_TP_ENGINE"] = engine
    cfg = load_config(None, overrides={
        "representation_nets": {"HamGNN_pre": {
            "irreps_node_features": "64x0e+32x0o+24x1o+12x1e+12x2e+6x2o+4x3o+4x3e+2x4e",
            "irreps_edge_sh": "0e + 1o + 2e + 3o + 4e",
            "num_layers": 3, "num_radial": 64, "cutoff": 7.0,
            "radial_MLP": [64, 64], "num_types": 96,
        }},
        "output_nets": {"HamGNN_out": {"nao_max": 19, "zero_point_shift": False}},
    })
    model = build_model(cfg)
    graph, _ = build_bench_case(n_atoms=n_atoms)
    params = init_params_on_cpu(model, graph, 0)
    params = jax.device_put(params, jax.devices()[0])
    graph = jax.device_put(graph, jax.devices()[0])
    tx = optax.amsgrad(learning_rate=1.0)
    flat0, _ = ravel_pytree(params)
    opt_state = jax.device_put(tx.init(flat0), jax.devices()[0])
    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, g, lr):
        def loss_fn(p):
            preds = model.apply(p, g)
            total, _ = compute_losses(preds, g, losses)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(params)
        updates, opt_state2 = tx.update(gflat, opt_state, pflat)
        return unravel(pflat + updates * lr), opt_state2, total

    lr = jnp.asarray(1e-3, jnp.float32)
    traj = []
    for _ in range(n_steps):
        params, opt_state, total = step(params, opt_state, graph, lr)
        traj.append(float(total))
    return np.asarray(traj)


def main():
    tp = run("pallas")
    tx_ = run("xla")
    print("pallas:", np.array2string(tp, precision=6))
    print("xla   :", np.array2string(tx_, precision=6))
    rel = np.abs(tp - tx_) / np.maximum(np.abs(tx_), 1e-9)
    print("max rel diff:", rel.max())
    assert rel.max() < 5e-3, "engines diverged"
    print("OK: trajectories track")


if __name__ == "__main__":
    main()
