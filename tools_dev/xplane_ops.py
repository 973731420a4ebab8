"""Dev-only: aggregate per-op device times from a captured xplane trace.

Parses the TPU device plane's op-level lines directly with xplane_pb2
(no tensorboard_plugin_profile needed) and prints the top ops by total
time, plus a category rollup.

Usage: python tools_dev/xplane_ops.py [trace_dir] [n_steps]
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hamgnn_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no *.xplane.pb files under {trace_dir} — capture a trace "
                 "first (e.g. tools_dev/trace_step.py)")
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            print(f"   line: {line.name}  events={len(line.events)}")
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta[ev.metadata_id].name
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
            print(f"-- {line.name}: {len(tot)} distinct ops, "
                  f"total {sum(tot.values()):.1f} ms over trace "
                  f"({sum(tot.values())/n_steps:.2f} ms/step)")
            cat = collections.Counter()
            for name, ms in tot.items():
                base = name.split(".")[0].split("_")[0]
                cat[base] += ms
            print("   category rollup (ms/step):")
            for k, v in cat.most_common(18):
                print(f"     {v/n_steps:8.3f}  {k}")
            print("   top ops (ms/step, count/step):")
            for name, ms in tot.most_common(40):
                print(f"     {ms/n_steps:8.3f}  x{cnt[name]/n_steps:5.1f}  {name[:100]}")


if __name__ == "__main__":
    main()
