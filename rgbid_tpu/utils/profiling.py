"""Lightweight per-stage wall-clock profiling.

Rebuild of the reference's per-stage ms printouts (SURVEY.md §5
"Tracing / profiling"). IMPORTANT sandbox caveat: on the axon TPU
platform `block_until_ready()` does not actually synchronize — callers
who want device-inclusive timings must time through a host readback
(np.asarray of a small output). StageTimer just measures host wall time
between enter/exit; use it around code that ends in a readback.

For deep traces, `trace(path)` wraps jax.profiler when available.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class StageTimer:
    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        import numpy as np

        out = {}
        for k, v in self.times.items():
            a = np.asarray(v)
            out[k] = {
                "n": len(v),
                "mean_ms": float(a.mean() * 1e3),
                "median_ms": float(np.median(a) * 1e3),
                "max_ms": float(a.max() * 1e3),
            }
        return out

    def report(self) -> str:
        rows = [
            f"{k:24s} n={s['n']:4d} med={s['median_ms']:8.2f} ms  max={s['max_ms']:8.2f} ms"
            for k, s in sorted(self.summary().items())
        ]
        return "\n".join(rows)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (no-op if the platform can't trace)."""
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
