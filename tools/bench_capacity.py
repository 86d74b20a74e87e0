"""Single-chip capacity benchmark: DEEP10M-shaped quantized scan.

10M x 96-d on ONE v5e chip: the graph build at this scale takes hours,
but the ScanIndex needs only a quantize pass, and the fused bucket
kernel scales the 1M recipe with a wider stride group (lsub=128,
cb=16384 — same lsub/cb collision ratio as the 1M config, so the same
recall; output width N/lsub stays HBM-friendly).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_capacity.py
Env: CAP_N (default 10_000_000), CAP_D (96), CAP_B (8192).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from instant_distance_tpu.models.brute import BruteForce  # noqa: E402
from instant_distance_tpu.models.scan import ScanIndex  # noqa: E402
from instant_distance_tpu.utils.datasets import synthetic_clustered  # noqa: E402
from instant_distance_tpu.utils.metrics import (force_ready,  # noqa: E402
                                                recall_at_k, time_fn)


def main():
    n = int(os.environ.get("CAP_N", 10_000_000))
    dim = int(os.environ.get("CAP_D", 96))
    b = int(os.environ.get("CAP_B", 8192))
    k = 10
    print(f"[cap] n={n} d={dim} B={b}", file=sys.stderr, flush=True)

    t0 = time.time()
    pts = synthetic_clustered(n, dim, n_clusters=20_000, seed=11)
    print(f"[cap] datagen {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    t0 = time.time()
    idx = ScanIndex(pts)
    force_ready(idx.norms)
    quant_s = time.time() - t0
    print(f"[cap] quantize {quant_s:.0f}s "
          f"({idx.nbytes() / 1e9:.1f} GB serving arrays)",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(13)
    sel = rng.integers(0, n, b)
    q_np = pts[sel] + 0.001 * rng.standard_normal(
        (b, dim)).astype(np.float32)
    q = jnp.asarray(q_np)
    force_ready(q)

    n_gt = 512
    t0 = time.time()
    gt_d, gt_i = BruteForce(idx.points).search_batch(q_np[:n_gt], k)
    gt_i = np.asarray(gt_i)
    print(f"[cap] ground truth {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    fkw = dict(fused="bucket", qb=128, cb=16384, lsub=128)
    for name, fn in [
        ("fused ef=16", lambda qq: idx.search_batch(
            qq, k=k, ef=16, **fkw)),
        ("fused ef=32", lambda qq: idx.search_batch(
            qq, k=k, ef=32, **fkw)),
        ("xla ef=16", lambda qq: idx.search_batch(
            qq, k=k, ef=16, approx_topk=True)),
    ]:
        try:
            t = time_fn(fn, q, warmup=2, iters=8)
            d, i = fn(q[:n_gt])
            rec = recall_at_k(np.asarray(i), gt_i, k)
            print(f"[cap] {name:14s} {b / t.per_call_s:10,.0f} qps  "
                  f"recall@{k}={rec:.4f}", flush=True)
        except Exception as exc:
            print(f"[cap] {name:14s} FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
