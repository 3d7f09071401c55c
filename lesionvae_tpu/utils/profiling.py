"""Tracing/profiling hooks (SURVEY.md §5.1: the reference has none; timing is
first-class here because the headline metric is full-cohort wall-clock).

- ``stage(name)``: context manager recording wall-clock per pipeline stage
  into a process-global report (and the log).
- ``trace(dir)``: optional ``jax.profiler`` trace wrapper for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple

from .logging import get_logger

log = get_logger("prof")

_STAGES: List[Tuple[str, float]] = []


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STAGES.append((name, dt))
        log.info("[stage] %s: %.2fs", name, dt)


def report() -> Dict[str, float]:
    """Aggregate wall-clock per stage name."""
    out: Dict[str, float] = {}
    for name, dt in _STAGES:
        out[name] = out.get(name, 0.0) + dt
    return out


def reset() -> None:
    _STAGES.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lesionvae_trace"):
    """jax.profiler trace around a region (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)
