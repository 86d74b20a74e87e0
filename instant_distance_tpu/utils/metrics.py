"""Observability: recall harness, QPS timers, structured build stats.

The reference has no metrics module (tests print seeds/recall ad hoc,
tests/all.rs:18,44,51); here recall/QPS measurement is a first-class
utility used by the test and bench harnesses.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Optional

import numpy as np


def recall_at_k(found_ids, true_ids, k: Optional[int] = None) -> float:
    """Mean |found ∩ true| / k over the query batch (ids < 0 ignored)."""
    found = np.asarray(found_ids)
    true = np.asarray(true_ids)
    k = k or true.shape[1]
    hits = []
    for f, t in zip(found, true):
        fs = set(int(x) for x in f[:k] if x >= 0)
        ts = set(int(x) for x in t[:k] if x >= 0)
        hits.append(len(fs & ts) / max(1, len(ts)))
    return float(np.mean(hits))


@dataclasses.dataclass
class Timing:
    wall_s: float
    per_call_s: float
    calls: int


def force_ready(out) -> None:
    """Block until the device work backing ``out`` has really finished.

    ``jax.block_until_ready`` is NOT a completion barrier through the
    axon remote-TPU relay (it returns once dispatch is acknowledged, so
    timings "complete" in microseconds while the chip is still busy).
    A device->host read of one element IS: it can only return after the
    producing computation finished.  Transfers one scalar per array
    leaf, so it is cheap for any output size.
    """
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim") and (leaf.ndim == 0
                                      or 0 not in leaf.shape):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            sync: Optional[Callable] = force_ready) -> Timing:
    """Steady-state timing; ``sync`` (default :func:`force_ready`)
    drains async device work after warmup and after the timed loop —
    dispatch overlaps execution across the loop, so ``per_call_s`` is
    sustained pipeline throughput, not single-call latency."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if sync is not None and warmup:
        sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    if sync is not None:
        sync(out)
    wall = time.perf_counter() - t0
    return Timing(wall_s=wall, per_call_s=wall / iters, calls=iters)


class BuildStats:
    """Progress callback that records per-phase wall time and insert
    throughput (the indicatif-progress-bar analogue, lib.rs:29-30)."""

    def __init__(self, log_every: int = 0):
        self.t0 = time.perf_counter()
        self.phases: dict[str, float] = {}
        self._last = self.t0
        self.total = 0
        self.log_every = log_every
        self._next_log = log_every

    def __call__(self, done: int, total: int, phase: str):
        now = time.perf_counter()
        self.phases[phase] = self.phases.get(phase, 0.0) + (now - self._last)
        self._last = now
        self.total = total
        if self.log_every and done >= self._next_log:
            rate = done / (now - self.t0)
            print(f"[build] {phase}: {done}/{total} "
                  f"({rate:,.0f} pts/s)", flush=True)
            self._next_log = done + self.log_every

    @property
    def wall_s(self) -> float:
        return time.perf_counter() - self.t0

    def summary(self) -> dict:
        return {"wall_s": round(self.wall_s, 3),
                "phases": {k: round(v, 3) for k, v in self.phases.items()}}


def emit(metric: str, value: float, unit: str,
         vs_baseline: Optional[float] = None, **extra) -> str:
    """One structured JSON metric line (the bench driver contract)."""
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    rec.update(extra)
    line = json.dumps(rec)
    print(line, flush=True)
    return line
