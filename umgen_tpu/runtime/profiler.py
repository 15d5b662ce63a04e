"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY §5.1 — a tqdm bar is the whole
observability story).  This module provides:

* ``trace(dir)`` — context manager around ``jax.profiler`` (view in
  TensorBoard / xprof)
* ``FrameTimer`` — per-frame wall-clock stats with p50/p90 summaries,
  used by the harness and bench
* ``annotate`` — TraceAnnotation passthrough for custom named regions
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    import jax
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class FrameTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        yield
        self.samples.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": int(a.size),
                "mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p90_s": float(np.percentile(a, 90)),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name}: n={s['n']} p50={s['p50_s']*1e3:.1f}ms "
                         f"p90={s['p90_s']*1e3:.1f}ms "
                         f"total={s['total_s']:.2f}s")
        return "\n".join(lines)
