"""Dev-only: honest (trace-based) device-time breakdown of the bench case.

Phases: representation fwd / full fwd / fwd+bwd / full train step, plus the
compiled step's XLA cost analysis (flops, bytes) for a speed-of-light bound.
"""

import functools
import os
import sys

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
from device_time import device_time_ms, op_stats

from hamgnn_tpu.cli import build_model
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu


def main(n_atoms=512):
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
    graph, n_edges = build_bench_case(n_atoms=n_atoms)
    params = init_params_on_cpu(model, graph, 0)
    params = jax.device_put(params, jax.devices()[0])
    graph = jax.device_put(graph, jax.devices()[0])
    repr_model = model.representation

    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

    @jax.jit
    def fwd_repr(p, g):
        return repr_model.apply({"params": p["params"]["representation"]}, g)

    @jax.jit
    def fwd_full(p, g):
        return model.apply(p, g)

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
    opt_state0 = jax.device_put(tx.init(flat0), jax.devices()[0])

    @jax.jit
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

    lr = jnp.asarray(1e-3, jnp.float32)
    print(f"n_edges={n_edges} padded={graph.edge_index.shape[1]} "
          f"nodes={graph.pos.shape[0]} backend={jax.devices()[0].platform}")

    lowered = step.lower(params, opt_state0, graph, lr)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", float("nan"))
        ba = ca.get("bytes accessed", float("nan"))
        print(f"step cost analysis: {fl/1e9:.1f} GFLOP, {ba/1e9:.2f} GB accessed")
        print(f"  speed-of-light: {fl/197e12*1e3:.2f} ms (bf16 MXU) / "
              f"{fl/98e12*1e3:.2f} ms (fp32) / {ba/8.2e11*1e3:.2f} ms (HBM bw)")
    except Exception as e:  # noqa: BLE001
        print("cost analysis unavailable:", e)

    t = device_time_ms(fwd_repr, (params, graph), n=5, verbose=True)
    print(f"repr fwd   : {t:8.2f} ms")
    t = device_time_ms(fwd_full, (params, graph), n=5, verbose=True)
    print(f"full fwd   : {t:8.2f} ms")
    t = device_time_ms(fwd_bwd, (params, graph), n=5, verbose=True)
    print(f"fwd+bwd    : {t:8.2f} ms")
    t = device_time_ms(lambda: step(params, opt_state0, graph, lr), (), n=5,
                       verbose=True)
    print(f"train step : {t:8.2f} ms  ({n_edges / t * 1e3 / 1e3:.1f}k edges/s)")

    if os.environ.get("OPSTATS"):
        total, rows = op_stats(lambda: step(params, opt_state0, graph, lr),
                               (), n=2, top=40)
        print(f"\nper-op total {total:.1f} ms/step")
        for t_ms, c, name in rows:
            print(f"  {t_ms:8.3f} ms  {c:6.0f}x  {name[:95]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
