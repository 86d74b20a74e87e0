"""Tune the packed graph-serving path on real TPU (VERDICT r1 next #2).

Builds (or resumes from a cached dump) the bench-shaped 1M x 128 index,
packs it, then sweeps (entry_seeds, expand, ef) measuring honest QPS +
recall@10 + beam iteration counts.  Target: >= 34k QPS @ >= 0.95
recall@10 on the graph's own algorithm (10x the 1-core host baseline).

Run ON the TPU (no other TPU/CPU-heavy job concurrent):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 python tools/tune_packed.py
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
from instant_distance_tpu.models.packed import PackedHnsw
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready, recall_at_k, \
    time_fn

N = int(os.environ.get("TUNE_N", 1_000_000))
DIM = 128
BATCH = int(os.environ.get("TUNE_BATCH", 8192))
K = 10
PACK_DUMP = f"/tmp/tune_packed_{N}.npz"


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    data = synthetic_clustered(N + 16384, DIM,
                               n_clusters=max(100, N // 100), seed=3)
    pts, queries = data[:N], data[N:]
    cfg = Config(seed=3, ef_search=50, m=32, wave_size=4096)

    if os.path.exists(PACK_DUMP):
        t0 = time.time()
        packed = PackedHnsw.load(PACK_DUMP)
        print(f"[tune] loaded pack in {time.time()-t0:.0f}s",
              file=sys.stderr)
    else:
        t0 = time.time()
        index, ids = Hnsw.build(pts, cfg)
        jax.block_until_ready(index.zero)
        print(f"[tune] build {time.time()-t0:.0f}s", file=sys.stderr)
        t0 = time.time()
        packed = PackedHnsw.from_index(index, pack_links=32)
        jax.block_until_ready(packed.zero_pack[1])
        print(f"[tune] pack {time.time()-t0:.0f}s", file=sys.stderr)
        packed.dump(PACK_DUMP)
        del index

    n_queries = 2048
    bf = BruteForce(np.asarray(packed.points))
    gt_i = np.asarray(bf.search_batch(queries[:n_queries], K)[1])
    del bf

    qbatch = jnp.asarray(queries[:BATCH])
    force_ready(qbatch)
    qrec = jnp.asarray(queries[:n_queries])
    force_ready(qrec)

    grid = [
        # (entry_seeds, expand, ef, max_iter_factor)
        (0,     4, 50, 8),    # round-1 baseline operating point
        # descent-entry recall ladder (VERDICT r2 item 4: the descent
        # path must reach >= 0.965 at >= 20k qps on its own)
        (0,     4, 64, 8),
        (0,     8, 50, 8),
        (0,     4, 80, 8),
        (8192,  4, 50, 8),
        (8192,  4, 16, 8),
        (8192,  2, 16, 8),
        (8192,  4, 32, 8),
        (16384, 4, 16, 8),
        (8192,  8, 16, 8),
        (8192,  4, 16, 2),
    ]
    results = []
    for seeds, expand, ef, mif in grid:
        packed.config.search_expand = expand
        packed.config.max_iter_factor = mif
        try:
            fn = lambda q: packed.search_batch(q, k=K, ef=ef,
                                               entry_seeds=seeds)
            t = time_fn(fn, qbatch, warmup=2, iters=10)
            qps = BATCH / t.per_call_s
            pd, pp = packed.search_batch(qrec, k=K, ef=ef,
                                         entry_seeds=seeds)
            rec = recall_at_k(np.asarray(pp), gt_i, K)
            results.append((qps, rec, seeds, expand, ef, mif))
            print(f"seeds={seeds:6d} expand={expand} ef={ef:3d} "
                  f"mif={mif} -> {qps:9,.0f} qps  recall={rec:.4f}",
                  flush=True)
        except Exception as exc:
            print(f"seeds={seeds} expand={expand} ef={ef} mif={mif} "
                  f"FAILED: {exc}", flush=True)
    ok = [r for r in results if r[1] >= 0.95]
    if ok:
        best = max(ok)
        print(f"BEST: {best[0]:,.0f} qps @ {best[1]:.4f} "
              f"(seeds={best[2]}, expand={best[3]}, ef={best[4]}, "
              f"mif={best[5]})", flush=True)


if __name__ == "__main__":
    main()
