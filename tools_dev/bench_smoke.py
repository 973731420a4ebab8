"""AOT compile smoke for the headline bench step — run before kernel commits.

Builds the EXACT bench train step (bench.build_step: 512-atom crystal,
nao_max 19, lmax-4 irreps, Pallas TP engine on TPU) and AOT-compiles it
without executing.  Any kernel change that would break the benchmark —
e.g. a scoped-VMEM OOM from a schedule whose working set outgrows the
120 MB limit (the round-3 BENCH_r03.json failure) — fails HERE, in
seconds of compile time, instead of in the driver's end-of-round bench.

Usage:  python tools_dev/bench_smoke.py     (exit 0 = compiles clean)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bench import build_step

    step, params, opt_state, graph, lr, n_edges = build_step()
    t0 = time.time()
    compiled = step.lower(params, opt_state, graph, lr).compile()
    dt = time.time() - t0
    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = getattr(ma, "temp_size_in_bytes", None)
    except Exception:  # noqa: BLE001
        pass
    print(f"bench step AOT compile OK on {jax.devices()[0].platform} "
          f"({dt:.1f}s, {n_edges} edges"
          + (f", temp {mem/1e6:.0f} MB" if mem else "") + ")")


if __name__ == "__main__":
    main()
