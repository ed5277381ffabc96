"""Profiling / tracing hooks.

The reference has no profiler integration — only manual timers with explicit
cuda synchronize (os2d/engine/evaluate.py:304-342; SURVEY.md §5.1). Here the
standard JAX tooling is wired in:

- `trace(logdir)` context manager around any region -> xprof/TensorBoard trace
- `annotate(name)` -> named TraceAnnotation visible in the trace timeline
- env-var activation for the stock entry points: set OS2D_PROFILE_DIR to
  capture a trace from bench.py / main.py without code changes.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace_from_env(default_region: str = "os2d"):
    """Capture a trace iff OS2D_PROFILE_DIR is set."""
    logdir = os.environ.get("OS2D_PROFILE_DIR", "")
    if not logdir:
        yield
        return
    with trace(logdir):
        yield


class StageTimer:
    """Simple named stage timers (device-synchronizing on read)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.time()
        yield
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        self.totals[name] = self.totals.get(name, 0.0) + (time.time() - t0)
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }
