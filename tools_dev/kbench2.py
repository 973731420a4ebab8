"""Dev-only: tile-size sweep for the TP pipeline kernels (per-op-overhead probe).

kbench showed the edge pipeline (half the arithmetic of node) running SLOWER
forward — the kernels are op-latency-bound, so larger tiles (fewer grid steps,
same op count per step amortized over more rows) may win.  Sweeps tile_fwd /
tile_bwd via the env overrides by re-execing itself.

Usage: python tools_dev/kbench2.py            # run the sweep
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

CASES = [
    # (label, plan, tile_fwd, tile_bwd, extra_env)
    ("node base",      "node", 0, 0, {}),
    ("node storemid",  "node", 0, 0, {"HAMGNN_TP_STOREMID": "1"}),
    ("node dxmerged",  "node", 0, 0, {"HAMGNN_TP_DX": "merged"}),
    ("node both",      "node", 0, 0, {"HAMGNN_TP_STOREMID": "1",
                                      "HAMGNN_TP_DX": "merged"}),
    ("edge base",      "edge", 0, 0, {}),
    ("edge storemid",  "edge", 0, 0, {"HAMGNN_TP_STOREMID": "1"}),
    ("edge dxmerged",  "edge", 0, 0, {"HAMGNN_TP_DX": "merged"}),
    ("edge both",      "edge", 0, 0, {"HAMGNN_TP_STOREMID": "1",
                                      "HAMGNN_TP_DX": "merged"}),
]


def run_one(plan: str, tf: int, tb: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hamgnn_tpu.utils.profiling import (device_time_ms,
                                            enable_persistent_compile_cache)

    # tile overrides only apply via env vars read at hamgnn_tpu.e3.pallas_tp
    # IMPORT time (module-level TILE_FWD/TILE_BWD); an in-process call with
    # different tf/tb would silently benchmark stale tiles while printing
    # the requested values (ADVICE r3) — the subprocess re-exec path sets
    # the env before import, so assert the env actually matches.
    import os as _os
    env_ok = (int(_os.environ.get("HAMGNN_TP_TILE_FWD", 0)) == tf
              and int(_os.environ.get("HAMGNN_TP_TILE_BWD", 0)) == tb)
    assert env_ok, (
        "run_one must execute in a subprocess with HAMGNN_TP_TILE_FWD/BWD "
        f"set to ({tf}, {tb}) before import (see main)")

    enable_persistent_compile_cache()
    from hamgnn_tpu.e3.irreps import Irreps
    from hamgnn_tpu.e3.packed_tp import get_plan
    from hamgnn_tpu.e3.pallas_tp import pallas_apply

    FEAT = "64x0e+32x0o+24x1o+12x1e+12x2e+6x2o+4x3o+4x3e+2x4e"
    SH = "0e + 1o + 2e + 3o + 4e"
    feat = Irreps(FEAT)
    irreps_in = (repr(Irreps([(2 * m, ir) for m, ir in feat]))
                 if plan == "node" else FEAT)
    p = get_plan(irreps_in, SH, repr(feat), repr(feat))
    E = 19968
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, Irreps(irreps_in).dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, 25)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, p.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(p.linear_numel,)), jnp.float32)

    @jax.jit
    def fwd(x, sh, w, fw):
        return pallas_apply(p, x, sh, w, fw, sh_needs_grad=False)

    @jax.jit
    def fwdbwd(x, sh, w, fw):
        def loss(x, w, fw):
            return jnp.sum(pallas_apply(p, x, sh, w, fw,
                                        sh_needs_grad=False) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, fw)

    t_f = device_time_ms(fwd, (x, sh, w, fw), n=8, warmup=2)
    t_fb = device_time_ms(fwdbwd, (x, sh, w, fw), n=8, warmup=2)
    tag = " ".join(f"{k}={os.environ[k]}"
                   for k in ("HAMGNN_TP_STOREMID", "HAMGNN_TP_DX")
                   if k in os.environ)
    print(f"RESULT {plan} tf={tf} tb={tb} {tag}: fwd {t_f:7.3f} ms  "
          f"fwd+bwd {t_fb:7.3f} ms", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    for (label, plan, tf, tb, extra) in CASES:
        env = dict(os.environ,
                   HAMGNN_TP_TILE_FWD=str(tf), HAMGNN_TP_TILE_BWD=str(tb))
        for k in ("HAMGNN_TP_STOREMID", "HAMGNN_TP_DX"):
            env.pop(k, None)
        env.update(extra)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "one", plan, str(tf), str(tb)], env=env, check=False)


if __name__ == "__main__":
    main()
