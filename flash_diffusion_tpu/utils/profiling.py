"""Tracing / profiling hooks (jax.profiler + step timing).

The reference's only instrumentation is a rank-0 average batch time
(reference: src/flash/trainer/trainer.py:58-74). TPU superset (SURVEY.md
§5): XLA profiler traces on demand, named trace annotations around the hot
phases, and a windowed step timer usable as a fit() callback.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region visible in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """fit() callback: windowed average step time + steps/sec
    (supersedes the reference's every-10-batches wall-clock log)."""

    def __init__(self, window: int = 10, name: str = "train"):
        self.window = window
        self.name = name
        self._t0: Optional[float] = None
        self._count = 0

    def __call__(self, pipeline, state, aux, step: int) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._count = 0
            return
        self._count += 1
        if self._count >= self.window:
            jax.block_until_ready(state.step)
            dt = (time.perf_counter() - self._t0) / self._count
            logger.info(
                "%s step %d: %.3fs/step (%.2f steps/s)", self.name, step, dt, 1.0 / dt
            )
            self._t0 = time.perf_counter()
            self._count = 0


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = None
    return stats
