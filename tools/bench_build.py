"""Honest end-to-end build timing (scan-mode vs beam-mode waves).

``jax.block_until_ready`` is NOT a completion barrier through the axon
relay (CLAUDE.md) — round 1's "31 s warm 1M build" was a dispatch-ack
artifact.  This tool syncs with a real device->host readback of the
final adjacency row before stopping the clock.

Run ON the TPU:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 \
        python -u tools/bench_build.py [mode] [N ...] > /tmp/bench_build.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import recall_at_k

D = int(os.environ.get("BENCH_BUILD_D", 128))
#: bf16 distance cache halves a 10M build's largest side array.
CACHE_DTYPE = os.environ.get("BENCH_BUILD_CACHE_DTYPE", "float32")
CKPT = os.environ.get("BENCH_BUILD_CKPT")  # path -> checkpoint/resume
#: At 10M a checkpoint round-trips ~5 GB through the dev tunnel's slow
#: relay — space them out (or effectively disable) for timing runs.
CKPT_EVERY = int(os.environ.get("BENCH_BUILD_CKPT_EVERY", 256))
#: Sampled prefix scan (Config.construct_sample_cols): caps per-wave
#: scan cost at O(sample) instead of O(N) — the round-5 O(N^2) fix.
SAMPLE = os.environ.get("BENCH_BUILD_SAMPLE")
SAMPLE_HOPS = int(os.environ.get("BENCH_BUILD_SAMPLE_HOPS", 16))
#: The axon tunnel can silently drop a response under sustained load
#: (two observed r5 wedges: a checkpoint readback and a plain wave
#: dispatch; client+relay idle forever, connection ESTAB).  With a
#: watchdog the process exits 42 on staleness so an outer loop can
#: resume from the checkpoint.  0 disables.
WATCHDOG_S = int(os.environ.get("BENCH_BUILD_WATCHDOG_S", 0))


class _Watchdog:
    """Exit 42 if no wave-progress heartbeat for WATCHDOG_S seconds.

    Armed lazily by the first heartbeat (compile + operand prep before
    the first wave legitimately take ~15 min); disarm() before the
    post-build phases (ground truth streams without heartbeats)."""

    def __init__(self, stale_s: int, inner):
        import threading
        self.stale_s = stale_s
        self.inner = inner
        self.last = None
        self._stop = False
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def __call__(self, done, total, phase):
        self.last = time.time()
        if self.inner is not None:
            self.inner(done, total, phase)

    def disarm(self):
        self._stop = True

    def _watch(self):
        while not self._stop:
            time.sleep(30)
            if self.last is not None and not self._stop \
                    and time.time() - self.last > self.stale_s:
                print(f"[watchdog] no wave progress for >{self.stale_s}s "
                      "- tunnel wedge; exiting 42 for resume", flush=True)
                os._exit(42)


def run(n: int, mode: str):
    cache = os.environ.get("BENCH_BUILD_DATA_CACHE")
    if cache and os.path.exists(cache):
        data = np.load(cache, mmap_mode="r")
        assert data.shape == (n + 2048, D), data.shape
        print(f"[data] loaded {cache}", flush=True)
    else:
        data = synthetic_clustered(n + 2048, D,
                                   n_clusters=max(100, n // 100), seed=3)
        if cache:
            np.save(cache, data)
            print(f"[data] cached -> {cache}", flush=True)
    pts, queries = data[:n], data[n:]
    cfg = Config(seed=3, wave_size=4096, construct_mode=mode,
                 dist_cache_dtype=CACHE_DTYPE,
                 construct_sample_cols=int(SAMPLE) if SAMPLE else None,
                 construct_sample_hops=SAMPLE_HOPS)
    print(f"[build] N={n:,} D={D} mode={mode} ...", flush=True)
    t0 = time.time()
    from instant_distance_tpu.utils.metrics import BuildStats
    prog = BuildStats(log_every=max(100_000, n // 20))
    if WATCHDOG_S:
        prog = _Watchdog(WATCHDOG_S, prog)
    index, ids = Hnsw.build(pts, cfg, progress=prog,
                            checkpoint=CKPT, checkpoint_every=CKPT_EVERY)
    if WATCHDOG_S:
        prog.disarm()
    np.asarray(index.zero[n - 1])       # honest barrier: device readback
    dt = time.time() - t0
    print(f"N={n:>9,} mode={mode:5s} build={dt:8.1f}s "
          f"({n / dt:,.0f} pts/s)", flush=True)

    # recall check (the build is only as good as the graph it makes)
    # hand BruteForce the DEVICE array: jnp.asarray is a no-op on it,
    # so ground truth shares the index's point buffer instead of
    # duplicating 3.84 GB of HBM at 10M
    gt = np.asarray(BruteForce(index.points)
                    .search_batch(queries, 10)[1])
    try:
        if os.environ.get("BENCH_BUILD_HOST_RECALL"):
            raise RuntimeError("host recall forced")  # skip doomed compile
        _, p = index.search_batch(queries, k=10, ef=50)
        p = np.asarray(p)
    except Exception as exc:
        # 10M fallback: the on-device exact-graph search program pays
        # XLA layout-uncompression copies of the [N, 2M] adjacency and
        # [N, D] points (4.77 + 4.77 + 2.38 GiB at 10M x 96) and OOMs
        # a 15.75 GiB chip at compile.  The native host engine runs the
        # same beam search (same ef) over the same graph with zero HBM
        # pressure; readback is chunked and heartbeat-ticked so the
        # wedge watchdog stays armed.
        print(f"[recall] device search failed ({type(exc).__name__}); "
              "falling back to the host engine", flush=True)
        from instant_distance_tpu.native import NativeHnsw
        from instant_distance_tpu.ops.construct import _np_chunked

        # fresh watchdog for the multi-GB readbacks (the build one is
        # disarmed by now); per-chunk ticks every ~20 s
        wd = _Watchdog(WATCHDOG_S, None) if WATCHDOG_S else None
        if wd is not None:
            wd.last = time.time()   # armed from the first chunk

        def pull(x):
            out = _np_chunked(x)
            if wd is not None:
                wd(0, n, "readback")
            return out
        eng = NativeHnsw.from_arrays(
            pull(index.points), pull(index.zero),
            [pull(l) for l in index.layers], cfg.metric, cfg.m)
        if wd is not None:
            wd.disarm()
        _, p = eng.search_batch(np.asarray(queries), ef=50, k=10,
                                n_threads=0)
    rec = recall_at_k(p, gt, 10)
    print(f"N={n:>9,} mode={mode:5s} recall@10(ef=50)={rec:.4f}",
          flush=True)
    return dt, rec


def main():
    args = sys.argv[1:]
    mode = args[0] if args and not args[0].isdigit() else "scan"
    ns = [int(a) for a in args if a.isdigit()] or [1_000_000]
    print("devices:", jax.devices(), flush=True)
    for n in ns:
        run(n, mode)


if __name__ == "__main__":
    main()
