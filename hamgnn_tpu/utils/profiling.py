"""Profiling / tracing utilities (SURVEY §5: the reference has none beyond a
TensorBoard logger; here: xprof-compatible traces + phase timers)."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


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
