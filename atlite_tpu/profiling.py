"""Tracing / profiling hooks.

The reference has no profiling beyond dask progress bars (SURVEY §5.1).
This module provides:

- ``stage_timer``: wall-clock context manager logging per-stage timings
  and grid-cell-hours/s throughput,
- ``device_trace``: context manager around ``jax.profiler`` emitting an
  XPlane trace directory viewable in TensorBoard/XProf,
- ``Throughput``: tiny accumulator for the north-star metric.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


class Throughput:
    """Accumulate (cell_hours, seconds) and report grid-cell-hours/s."""

    def __init__(self):
        self.cell_hours = 0
        self.seconds = 0.0

    def add(self, cell_hours, seconds):
        self.cell_hours += cell_hours
        self.seconds += seconds

    @property
    def rate(self):
        return self.cell_hours / self.seconds if self.seconds else 0.0

    def __repr__(self):
        return f"<Throughput {self.rate:,.0f} cell-hours/s>"


@contextlib.contextmanager
def stage_timer(name, cell_hours=None, accumulator: Throughput | None = None):
    """Log the wall time (and optional throughput) of a pipeline stage."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if cell_hours is not None:
            logger.info("%s: %.3fs (%.3g cell-hours/s)", name, dt,
                        cell_hours / dt if dt else float("inf"))
            if accumulator is not None:
                accumulator.add(cell_hours, dt)
        else:
            logger.info("%s: %.3fs", name, dt)


@contextlib.contextmanager
def device_trace(logdir="/tmp/atlite_tpu_trace"):
    """Capture a device trace with jax.profiler (view with xprof/TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", logdir)
