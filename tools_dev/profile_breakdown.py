"""Dev-only: time slices of the bench train step on the real TPU chip.

Breaks the 256-atom bench case into: representation fwd, output-head fwd,
full fwd, fwd+bwd, full train step — so we know where a Pallas kernel would
actually pay off.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import optax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import build_bench_case

from hamgnn_tpu.cli import build_model
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
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
    graph, n_edges = build_bench_case()
    params = init_params_on_cpu(model, graph, 0)
    params = jax.device_put(params, jax.devices()[0])
    graph = jax.device_put(graph, jax.devices()[0])

    repr_model = model.representation

    @jax.jit
    def fwd_repr(p, g):
        return repr_model.apply(
            {"params": p["params"]["representation"]}, g)

    @jax.jit
    def fwd_full(p, g):
        return model.apply(p, g)

    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    @jax.jit
    def fwd_loss(p, g):
        preds = model.apply(p, g)
        total, _ = compute_losses(preds, g, losses)
        return total

    @jax.jit
    def fwd_bwd(p, g):
        def loss_fn(pp):
            preds = model.apply(pp, g)
            total, _ = compute_losses(preds, g, losses)
            return total
        return jax.value_and_grad(loss_fn)(p)

    from jax.flatten_util import ravel_pytree

    tx = optax.amsgrad(learning_rate=1.0)
    flat0, _ = ravel_pytree(params)
    opt_state = jax.device_put(tx.init(flat0), jax.devices()[0])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, s, g, lr):
        def loss_fn(pp):
            preds = model.apply(pp, g)
            total, _ = compute_losses(preds, g, losses)
            return total
        total, grads = jax.value_and_grad(loss_fn)(p)
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(p)
        updates, s2 = tx.update(gflat, s, pflat)
        return unravel(pflat + updates * lr), s2, total

    print(f"n_edges={n_edges} padded_edges={graph.edge_index.shape[1]} "
          f"nodes={graph.pos.shape[0]} backend={jax.devices()[0].platform}")
    t_repr = timeit(fwd_repr, params, graph)
    print(f"repr fwd        : {t_repr:8.3f} ms")
    t_full = timeit(fwd_full, params, graph)
    print(f"full fwd        : {t_full:8.3f} ms  (output head ~{t_full - t_repr:.3f})")
    t_loss = timeit(fwd_loss, params, graph)
    print(f"fwd+loss        : {t_loss:8.3f} ms")
    t_bwd = timeit(fwd_bwd, params, graph)
    print(f"fwd+bwd         : {t_bwd:8.3f} ms")
    lr = jnp.asarray(1e-3, jnp.float32)

    def step_t(g):
        nonlocal params, opt_state
        params, opt_state, total = step(params, opt_state, g, lr)
        return total

    t_step = timeit(step_t, graph)
    print(f"train step      : {t_step:8.3f} ms  "
          f"({n_edges / t_step * 1e3 / 1e6:.2f}M edges/s)")


if __name__ == "__main__":
    main()
