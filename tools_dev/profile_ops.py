"""Dev-only: per-op time breakdown of the bench train step via xprof.

Captures a jax.profiler trace of the jitted train step on the real chip and
prints the top ops by self-time (framework_op_stats via
tensorboard_plugin_profile).
"""

import functools
import glob
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

from hamgnn_tpu.cli import build_model
from hamgnn_tpu.models.model import compute_losses
from hamgnn_tpu.train.config import load_config
from hamgnn_tpu.train.trainer import init_params_on_cpu


def main():
    from jax.flatten_util import ravel_pytree

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
    tx = optax.amsgrad(learning_rate=1.0)
    flat0, _ = ravel_pytree(params)
    opt_state = jax.device_put(tx.init(flat0), jax.devices()[0])
    losses = [{"metric": "mae", "prediction": "hamiltonian",
               "target": "hamiltonian", "loss_weight": 27.211}]

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

    lr = jnp.asarray(1e-3, jnp.float32)
    for _ in range(3):
        params, opt_state, total = step(params, opt_state, graph, lr)
    jax.block_until_ready(total)

    trace_dir = "/tmp/hamgnn_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(20):
            params, opt_state, total = step(params, opt_state, graph, lr)
        jax.block_until_ready(total)

    xplane = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplane)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
    # data is CSV text for this tool
    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(data.decode()
                                           if isinstance(data, bytes) else data)))
    if not rows:
        print("no rows; keys available?")
        return
    keyf = [k for k in rows[0] if "self" in k.lower() and "time" in k.lower()]
    print("columns:", list(rows[0].keys()))
    tcol = keyf[0] if keyf else None
    if tcol:
        rows.sort(key=lambda r: -float(r[tcol] or 0))
        for r in rows[:25]:
            print(f"{float(r[tcol]):12.1f}  {r.get('Type','?'):24s} "
                  f"{r.get('Operation', r.get('Op name','?'))[:80]}")


if __name__ == "__main__":
    main()
