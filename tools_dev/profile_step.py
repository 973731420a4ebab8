"""Phase-level timing of the bench train step on the real chip.

Times (a) representation forward, (b) full forward, (c) loss+grad, (d) full
train step, and prints XLA cost analysis (flops / bytes) for each, so we know
whether the hot path is MXU-, HBM-, or scatter-bound before writing kernels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import functools

import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from bench import build_bench_case
from hamgnn_tpu.cli import build_model
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu


def timed(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def cost(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return c.get("flops", 0.0), c.get("bytes accessed", 0.0)
    except Exception as e:  # noqa: BLE001
        return float("nan"), float("nan")


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

    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    repr_fwd = jax.jit(lambda p, g: model.apply(
        p, g, method=lambda m, gg: m.representation(gg)))
    full_fwd = jax.jit(lambda p, g: model.apply(p, g)["hamiltonian_off"])

    def loss_fn(p, g):
        preds = model.apply(p, g)
        total, _ = compute_losses(preds, g, losses)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    tx = optax.amsgrad(learning_rate=1.0)
    flat0, _ = ravel_pytree(params)
    opt_state = jax.device_put(tx.init(flat0), jax.devices()[0])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, s, g, lr):
        total, grads = jax.value_and_grad(loss_fn)(p, g)
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(p)
        updates, s2 = tx.update(gflat, s, pflat)
        return unravel(pflat + updates * lr), s2, total

    t_repr = timed(repr_fwd, params, graph)
    t_fwd = timed(full_fwd, params, graph)
    t_grad = timed(grad_fn, params, graph)

    f1, b1 = cost(lambda p, g: model.apply(
        p, g, method=lambda m, gg: m.representation(gg)), params, graph)
    f2, b2 = cost(lambda p, g: model.apply(p, g)["hamiltonian_off"], params, graph)
    f3, b3 = cost(jax.value_and_grad(loss_fn), params, graph)

    lr = jnp.asarray(1e-3, jnp.float32)
    # step donates; time manually
    p, s = params, opt_state
    for _ in range(3):
        p, s, tot = step(p, s, graph, lr)
    jax.block_until_ready(tot)
    n = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, tot = step(p, s, graph, lr)
        jax.block_until_ready(tot)
        best = min(best, (time.perf_counter() - t0) / n)
    t_step = best

    print(f"edges={n_edges}")
    print(f"repr fwd : {t_repr*1e3:8.3f} ms   flops={f1/1e9:8.2f}G bytes={b1/1e9:8.3f}G  -> {f1/t_repr/1e12:6.2f} TF/s {b1/t_repr/1e9:7.1f} GB/s")
    print(f"full fwd : {t_fwd*1e3:8.3f} ms   flops={f2/1e9:8.2f}G bytes={b2/1e9:8.3f}G  -> {f2/t_fwd/1e12:6.2f} TF/s {b2/t_fwd/1e9:7.1f} GB/s")
    print(f"grad     : {t_grad*1e3:8.3f} ms   flops={f3/1e9:8.2f}G bytes={b3/1e9:8.3f}G  -> {f3/t_grad/1e12:6.2f} TF/s {b3/t_grad/1e9:7.1f} GB/s")
    print(f"step     : {t_step*1e3:8.3f} ms   -> {n_edges/t_step/1e6:7.3f} M edges/s")


if __name__ == "__main__":
    main()
