"""Trace-based device timing: the ONLY reliable clock through the axon tunnel.

Wall-clock over the tunnel dedupes/reorders repeated executions (a 460 ms
train step "measures" 0.5 ms), so every performance number must come from the
xplane trace: we run the function under jax.profiler.trace and read the
per-execution durations of the jitted module from the 'XLA Modules' line.

Usage:
    from tools_dev.device_time import device_time_ms
    ms = device_time_ms(step_fn, args=(params, opt, graph), n=5)
"""

import glob
import os
import shutil
import tempfile

import jax


def _module_times_ms(trace_dir):
    """Parse xplane: {module_name: [durations_ms, ...]} from XLA Modules."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())
    out = {}
    for plane in sp.planes:
        if "TPU" not in plane.name and "device" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                out.setdefault(name, []).append(ev.duration_ps / 1e9)
    return out


def device_time_ms(fn, args=(), n=5, warmup=2, match=None, verbose=False):
    """Median device execution time (ms) of fn's jitted module over n runs.

    fn must keep returning fresh outputs (donation-safe callers should wrap
    state threading themselves).  ``match``: substring to select the module if
    several run under the trace (default: the one with the largest total time).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        times = _module_times_ms(trace_dir)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    if not times:
        raise RuntimeError("no module timings found in trace")
    if match is not None:
        times = {k: v for k, v in times.items() if match in k}
    name, durs = max(times.items(), key=lambda kv: sum(kv[1]))
    durs = sorted(durs)
    med = durs[len(durs) // 2]
    if verbose:
        print(f"  [{name}: {len(durs)} execs, min {durs[0]:.3f} "
              f"med {med:.3f} max {durs[-1]:.3f} ms]")
    return med


def op_stats(fn, args=(), n=3, top=30):
    """Aggregate per-op device self-times of fn under a trace; returns
    (total_ms_per_run, [(time_ms_per_run, count_per_run, name), ...])."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = tempfile.mkdtemp(prefix="devops_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
        sp = xplane_pb2.XSpace()
        with open(paths[0], "rb") as f:
            sp.ParseFromString(f.read())
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    agg, cnt = {}, {}
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                agg[name] = agg.get(name, 0) + ev.duration_ps
                cnt[name] = cnt.get(name, 0) + 1
    rows = sorted(((t / 1e9 / n, cnt[k] / n, k) for k, t in agg.items()),
                  reverse=True)
    total = sum(r[0] for r in rows)
    return total, rows[:top]
