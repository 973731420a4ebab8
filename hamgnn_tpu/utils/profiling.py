"""Profiling / tracing utilities (SURVEY §5: the reference has none beyond a
TensorBoard logger; here: xprof-compatible traces + phase timers + a
trace-derived device timer).

``device_time_ms`` exists because wall-clock timing is unreliable on remote
accelerator transports (repeat executions of an identical program can be
deduped/cached end-to-end, making a 460 ms step "measure" 0.5 ms); the xplane
trace records per-execution device durations of the compiled module, which is
the ground truth.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import shutil
import tempfile
import time
from typing import Dict, Optional


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point XLA's persistent compilation cache at a repo-local directory.

    First full-model compiles are 20-40 s on TPU (minutes on the 2-core CPU
    host); every trainer/CLI/bench process shares this cache so repeated
    runs skip them.  Safe to call multiple times.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "HAMGNN_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    # opt-out (HAMGNN_COMPILE_CACHE=0) and don't override a cache dir the
    # user/application already configured (ADVICE r2: avoid leaking global
    # JAX config mutations into unrelated code)
    if cache_dir in ("0", "", "off", "none"):
        return ""
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture a JAX profiler trace viewable in XProf/TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock phase timer with jsonl export."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1000.0 * v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def _xplane_module_times_ms(trace_dir: str) -> Dict[str, list]:
    """{module_name: [per-execution duration ms]} from an xplane trace's
    'XLA Modules' line (TPU device planes)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())
    out: Dict[str, list] = {}
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                out.setdefault(meta[ev.metadata_id].name, []).append(
                    ev.duration_ps / 1e9)
    return out


def device_time_ms(fn, args=(), n: int = 5, warmup: int = 2,
                   match: Optional[str] = None) -> float:
    """Median per-execution *device* time (ms) of fn's jitted module.

    On TPU backends, runs fn under a jax.profiler trace and reads the
    compiled module's execution durations from the xplane (immune to
    transport-level dedup of repeated executions).  On CPU (tests), falls
    back to blocking wall-clock.
    """
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    if jax.devices()[0].platform != "tpu":
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    trace_dir = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        times = _xplane_module_times_ms(trace_dir)
        if match is not None:
            times = {k: v for k, v in times.items() if match in k}
        if not times:
            raise RuntimeError("no module timings found in trace")
    except Exception:
        # trace capture/parse unavailable on this backend: blocking wall-clock
        # (may over-report throughput on deduping transports)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    _, durs = max(times.items(), key=lambda kv: sum(kv[1]))
    durs = sorted(durs)
    return durs[len(durs) // 2]
