"""Cliff diagnosis on REAL mid-build state (VERDICT r1, next #1).

tools/diag_cliff.py times sub-ops on a synthetic random-graph state; this
tool measures the thing itself: it builds the SAME clustered workload the
bench uses up to ~55% fill, snapshots the wave state via the build
checkpoint, then re-runs instrumented waves (debug_iters=True) that
report BOTH per-wave device time and the zero-layer beam's iteration
count.  That partitions the 1M->2M per-wave blowup between "each
iteration got slower" and "convergence takes more iterations".

Run ON the TPU (no other TPU job concurrent):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 \
        python tools/diag_cliff_real.py [N ...]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_distance_tpu.config import Config
from instant_distance_tpu.ops import construct as C
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready

D = 96
WAVE = 4096


class _Stop(RuntimeError):
    pass


def make_ckpt(n: int, path: str, frac: float = 0.55) -> None:
    """Build the bench-shaped workload to ~frac fill, leaving the wave
    checkpoint on disk (the build is interrupted via the progress hook)."""
    pts = synthetic_clustered(n, D, n_clusters=max(100, n // 100), seed=3)
    cfg = Config(seed=3, wave_size=WAVE)

    def progress(done, total, phase):
        if done >= frac * total:
            raise _Stop()

    t0 = time.time()
    try:
        C.build_graph(pts, cfg, progress=progress, checkpoint=path,
                      checkpoint_every=4)
    except _Stop:
        pass
    print(f"[diag] N={n:,}: built to ~{frac:.0%} in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)


def instrument(n: int, path: str, n_waves: int = 8):
    """Load the checkpoint and run instrumented waves from its position."""
    pts = synthetic_clustered(n, D, n_clusters=max(100, n // 100), seed=3)
    cfg = Config(seed=3, wave_size=WAVE)
    m, m0 = cfg.m, cfg.m0

    # same shuffle-sort remap as build_graph (construct.py:564-570)
    rng = np.random.default_rng(cfg.seed)
    keys = rng.integers(0, n, size=n)
    order = np.lexsort((np.arange(n), keys))
    pts = pts[order]

    sizes = C.layer_sizes(n, cfg.ml, m)
    top = len(sizes) - 1
    ranges = [(top - i, max(c - s, 1), c) for i, (s, c) in enumerate(sizes)]

    with np.load(path, allow_pickle=False) as z:
        adj = jnp.asarray(z["adj"])
        adjd = jnp.asarray(z["adjd"])
        stacked = jnp.asarray(z["stacked"])
        offsets = z["offsets"].copy()
        li, s_done = int(z["li"]), int(z["s"])

    layer, start, end = ranges[li]
    assert layer == 0, f"checkpoint stopped above the zero layer (li={li})"
    heur = (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned)
    pend_cap, rev_rounds = C._rev_params(cfg, m0)
    dev_points = jnp.asarray(pts)

    step = functools.partial(
        C._wave_step, metric_name="sqeuclidean", efc=cfg.ef_construction,
        m=m, m0=m0, heuristic=heur, rev_chunk=2048, pend_cap=pend_cap,
        rev_rounds=rev_rounds, max_iter_factor=cfg.max_iter_factor,
        expand=getattr(cfg, "construct_expand", 1), debug_iters=True)

    # resume the schedule right after the checkpointed wave
    sched = [(s, e) for s, e in C._wave_schedule(start, end, cfg.wave_size)
             if s > s_done]

    def dispatch(s, e):
        nonlocal adj, adjd
        w = e - s
        wb = C._bucket(w, cfg.wave_size)
        wave = np.full(wb, -1, np.int32)
        wave[:w] = np.arange(s, e, dtype=np.int32)
        adj, adjd, dd, iters, rounds = step(
            adj, adjd, jnp.asarray(wave), dev_points, stacked,
            jnp.asarray(offsets), jnp.int32(li), jnp.int32(m0))
        return iters, rounds

    # warm/compile
    t0 = time.time()
    it0, rd0 = dispatch(*sched[0])
    force_ready(it0)
    print(f"[diag] N={n:,} warm/compile wave: {time.time()-t0:.1f}s "
          f"iters={int(it0)} rounds={int(rd0)}",
          file=sys.stderr, flush=True)
    # pipelined stream (build-like): dispatch all, one sync at the end
    stats = []
    t0 = time.time()
    for s, e in sched[1:1 + n_waves]:
        stats.append(dispatch(s, e))
    force_ready(stats[-1][0])
    dt = time.time() - t0
    per = dt / n_waves
    its = [int(i) for i, _ in stats]
    rds = [int(r) for _, r in stats]
    print(f"N={n:>9,}  wave={per*1e3:8.1f} ms (pipelined x{n_waves})  "
          f"iters={its}  rounds={rds}", flush=True)
    return per, its, rds


def main():
    ns = [int(a) for a in sys.argv[1:]] or [500_000, 1_000_000, 2_000_000]
    for n in ns:
        path = f"/tmp/diag_ckpt_{n}.npz"
        if not os.path.exists(path):
            make_ckpt(n, path)
        instrument(n, path)


if __name__ == "__main__":
    main()
