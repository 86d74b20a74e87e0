"""Sweep fused-scan kernel configs on the real TPU vs the XLA scan.

Run (serialize with any other TPU job; never concurrently with pytest):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/tune_scan_kernel.py

Prints QPS + recall@10 for the XLA streamed scan and each fused
(mode, qb, cb, lsub[, topt]) config at SIFT1M shape.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from instant_distance_tpu.models.brute import BruteForce  # noqa: E402
from instant_distance_tpu.models.scan import ScanIndex  # noqa: E402
from instant_distance_tpu.utils.datasets import synthetic_clustered  # noqa: E402
from instant_distance_tpu.utils.metrics import recall_at_k, time_fn  # noqa: E402


def main():
    n = int(os.environ.get("TUNE_N", 1_000_000))
    dim = int(os.environ.get("TUNE_D", 128))
    b = int(os.environ.get("TUNE_B", 8192))
    k, ef = 10, 16
    print(f"[tune] n={n} d={dim} B={b} k={k} ef={ef}", file=sys.stderr)

    pts = synthetic_clustered(n + 1024, dim, n_clusters=10_000, seed=3)
    data, queries = pts[:n], pts[n:n + b] if b <= 1024 else None
    rng = np.random.default_rng(5)
    queries = data[rng.integers(0, n, b)] + \
        0.001 * rng.standard_normal((b, dim)).astype(np.float32)

    t0 = time.time()
    idx = ScanIndex(data)
    jax.block_until_ready(idx.norms)
    print(f"[tune] quantize {time.time() - t0:.1f}s", file=sys.stderr)

    gt_q = queries[:256]
    gt_d, gt_i = BruteForce(data).search_batch(gt_q, k)
    gt_i = np.asarray(gt_i)

    def measure(name, fn):
        try:
            t = time_fn(fn, queries, warmup=2, iters=5,
                        sync=jax.block_until_ready)
            qps = b / t.per_call_s
            d, i = fn(gt_q)
            rec = recall_at_k(np.asarray(i), gt_i, k)
            print(f"{name:42s} {qps:10,.0f} qps  recall@{k}={rec:.4f}")
        except Exception as exc:
            print(f"{name:42s} FAILED: {type(exc).__name__}: {exc}")
        sys.stdout.flush()

    measure("xla approx_topk chunk=128k",
            lambda q: idx.search_batch(q, k=k, ef=ef, approx_topk=True))

    for mode, qb, cb, lsub in [
        ("bucket", 256, 4096, 16),
        ("bucket", 256, 4096, 32),
        ("bucket", 256, 8192, 32),
        ("bucket", 128, 8192, 32),
        ("bucket", 256, 8192, 64),
        ("bucket", 512, 4096, 32),
    ]:
        measure(f"fused {mode} qb={qb} cb={cb} lsub={lsub}",
                lambda q, m=mode, a=qb, c=cb, s=lsub: idx.search_batch(
                    q, k=k, ef=ef, fused=m, qb=a, cb=c, lsub=s))

    for qb, cb, lsub, topt in [(256, 4096, 16, 8), (256, 8192, 32, 8)]:
        measure(f"fused topt qb={qb} cb={cb} lsub={lsub} T={topt}",
                lambda q, a=qb, c=cb, s=lsub, t=topt: idx.search_batch(
                    q, k=k, ef=ef, fused="topt", qb=a, cb=c, lsub=s,
                    topt=t))


if __name__ == "__main__":
    main()
