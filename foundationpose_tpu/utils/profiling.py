"""Tracing/profiling helpers (SURVEY.md §5.1 — the reference has none).

* `stage_timer`: lightweight named wall-clock stages with a report.
* `trace`: context manager around jax.profiler for TensorBoard traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger(__name__)

_STAGES: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def stage_timer(name: str, sync: bool = True):
    """Accumulate wall time of a named pipeline stage. With sync=True the
    device queue is drained so timings reflect real execution."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                (jax.device_put(0.0) + 0).block_until_ready()
            except Exception:
                pass
        _STAGES[name].append(time.perf_counter() - t0)


def timing_report(reset: bool = False) -> dict[str, dict[str, float]]:
    out = {}
    for name, ts in _STAGES.items():
        out[name] = {
            "count": len(ts),
            "total_s": sum(ts),
            "mean_ms": 1000.0 * sum(ts) / max(len(ts), 1),
        }
    if reset:
        _STAGES.clear()
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace; open the result with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
