"""Tracing & profiling hooks.

The reference's only observability is an optional indicatif progress bar
(lib.rs:29-30,71-75) plus debug symbols in the bench profile.  The
TPU-native equivalents: JAX profiler traces (XLA op-level timelines for
TensorBoard/Perfetto) and lightweight phase timers, usable around builds
and query batches.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a JAX profiler trace (view with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Nested wall-clock phase timing with a flat report."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
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

    def report(self) -> dict:
        return {name: {"total_s": round(t, 4),
                       "calls": self.counts[name],
                       "mean_ms": round(1e3 * t / self.counts[name], 3)}
                for name, t in sorted(self.totals.items(),
                                      key=lambda kv: -kv[1])}


def annotate(name: str):
    """Decorator adding a named XLA trace annotation to a function."""
    import jax

    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return inner

    return wrap
