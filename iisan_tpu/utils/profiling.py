"""Profiling and timing instrumentation.

The reference has only coarse wall-clock epoch timers
(/root/reference/Code_Cached/data_utils/utils.py:113-129, SURVEY.md
section 5 "Tracing/profiling - none").  The TPU rebuild exposes:

  * ``report_time_train`` / ``report_time_eval`` - the reference's timing
    lines, kept for log parity;
  * ``StepTimer`` - per-step wall/device timing with percentile summary;
  * ``trace`` - a jax.profiler context writing a TensorBoard-loadable
    trace (the idiomatic XLA profiling path);
  * ``annotate`` - jax.profiler.TraceAnnotation for labeling regions;
  * ``log_memory`` - live HBM stats from the PJRT backend.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import List, Optional

import jax
import numpy as np

from .logging import get_time

log = logging.getLogger("iisan_tpu")


def report_time_train(batch_index: int, epoch: int, loss: float,
                      set_start: float, run_start: float) -> float:
    """(utils.py:113-122) - per-epoch-set timing lines."""
    log.info("epoch: %d end, train_loss: %.5f", epoch, loss)
    now = time.time()
    h, m, s = get_time(set_start, now)
    log.info("##### (time) this epoch set: %d hours %d minutes %d seconds #####",
             h, m, s)
    h, m, s = get_time(run_start, now)
    log.info("##### (time) start until now: %d hours %d minutes %d seconds #####",
             h, m, s)
    return now


def report_time_eval(start: float) -> None:
    """(utils.py:125-129)"""
    h, m, s = get_time(start, time.time())
    log.info("##### (time) eval(valid and test): %d hours %d minutes %d "
             "seconds #####", h, m, s)


class StepTimer:
    """Per-step timing with p50/p95/max summary."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"n": len(a), "p50_ms": float(np.median(a) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "max_ms": float(a.max() * 1e3),
                "total_s": float(a.sum())}


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Label a host region so it shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def log_memory(tag: str = "") -> Optional[dict]:
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if not stats:
        return None
    mb = {k: round(v / 2**20, 1) for k, v in stats.items()
          if isinstance(v, (int, float)) and "bytes" in k}
    log.info("memory%s: %s", f" ({tag})" if tag else "", mb)
    return mb
