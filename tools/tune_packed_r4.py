"""Round-4 packed graph-serving sweep (VERDICT r3 next #1).

Target: packed-graph seeded serving >= 2x r3's 91k QPS *as a same-round
ratio vs the XLA scan* (the drift-robust signal on this relay), at
recall@10 >= 0.99.  The unexplored corner from the r3 sweep is
seeds-up/walk-lean: the MXU seed scan is nearly free (bf16 [B, S] x
[S, D] matmul — 0.35 ms at S=65536, B=8192), while every walk step pays
row-gather issue cost, so trading a bigger seed scan for a shorter
walk should dominate.  Also probes the fused Pallas walk kernel
(ops/walk_kernel.py) at the best XLA operating points.

Every round times the XLA streamed scan FIRST, so each config's ratio
is computed against a denominator measured seconds away from it.

Run ON the TPU (no other TPU/CPU-heavy job concurrent):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 \
        python -u tools/tune_packed_r4.py
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
from instant_distance_tpu.models.scan import ScanIndex
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready, recall_at_k

N = int(os.environ.get("TUNE_N", 1_000_000))
DIM = 128
BATCH = int(os.environ.get("TUNE_BATCH", 8192))
K = 10
NQ = 2048
PACK_DUMP = f"/tmp/tune_packed_{N}.npz"


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    data = synthetic_clustered(N + 16384, DIM,
                               n_clusters=max(100, N // 100), seed=3)
    pts, queries = data[:N], data[N:]

    if os.path.exists(PACK_DUMP):
        t0 = time.time()
        packed = PackedHnsw.load(PACK_DUMP)
        print(f"[tune] loaded pack in {time.time()-t0:.0f}s",
              file=sys.stderr)
    else:
        cfg = Config(seed=3, ef_search=50, m=32, wave_size=4096)
        t0 = time.time()
        index, ids = Hnsw.build(pts, cfg)
        jax.block_until_ready(index.zero)
        print(f"[tune] build {time.time()-t0:.0f}s", file=sys.stderr)
        packed = PackedHnsw.from_index(index, pack_links=32)
        jax.block_until_ready(packed.zero_pack[1])
        packed.dump(PACK_DUMP)
        del index

    scan = ScanIndex(np.asarray(packed.points))
    np.asarray(scan.norms[0])

    bf = BruteForce(np.asarray(packed.points))
    gt_i = np.asarray(bf.search_batch(queries[:NQ], K)[1])
    del bf

    qbatch = jnp.asarray(queries[:BATCH])
    qrec = jnp.asarray(queries[:NQ])
    force_ready(qbatch)
    force_ready(qrec)

    # (engine, seeds, expand, ef, mif, bq)
    grid = [
        ("xla", 8192,  2, 16, 8, 0),    # r3 best = this sweep's anchor
        ("xla", 16384, 2, 16, 4, 0),
        ("xla", 32768, 2, 12, 4, 0),
        ("xla", 32768, 2, 16, 4, 0),
        ("xla", 32768, 1, 12, 4, 0),
        ("xla", 65536, 1, 12, 4, 0),
        ("xla", 65536, 2, 12, 4, 0),
        ("xla", 65536, 2, 16, 2, 0),
        ("xla", 32768, 2, 16, 1, 0),    # near-floor probe: seed+rerank
        ("krn", 8192,  2, 16, 8, 128),
        ("krn", 32768, 2, 12, 4, 128),
        ("krn", 32768, 2, 12, 4, 256),
    ]

    def scan_fn(q):
        return scan.search_batch(q, k=K, ef=16, approx_topk=True)

    def make_fn(eng, seeds, expand, ef, mif, bq):
        packed.config.search_expand = expand
        packed.config.max_iter_factor = mif
        if eng == "xla":
            return lambda q: packed.search_batch(
                q, k=K, ef=ef, entry_seeds=seeds)
        return lambda q: packed.search_batch_kernel(
            q, k=K, ef=ef, entry_seeds=seeds, expand=expand, bq=bq)

    # recall + compile warmup first (one at a time; compile is remote)
    recs = {}
    for row in grid:
        eng, seeds, expand, ef, mif, bq = row
        try:
            fn = make_fn(*row)
            pd, pp = fn(qrec)
            rec = recall_at_k(np.asarray(pp), gt_i, K)
            fn(qbatch)  # warm the batch shape too
            recs[row] = rec
            print(f"[warm] {eng} seeds={seeds:6d} e={expand} ef={ef:2d} "
                  f"mif={mif} bq={bq:3d}: recall@10={rec:.4f}",
                  flush=True)
        except Exception as exc:
            print(f"[warm] {row} FAILED: {exc}", flush=True)
    scan_fn(qbatch)  # warm

    live = [r for r in recs]
    times = {r: 0.0 for r in live}
    scan_t = 0.0
    R, IT = 3, 6
    for rnd in range(R):
        t0 = time.time()
        for _ in range(IT):
            out = scan_fn(qbatch)
        force_ready(out)
        scan_t += time.time() - t0
        for row in live:
            fn = make_fn(*row)
            t0 = time.time()
            for _ in range(IT):
                out = fn(qbatch)
            force_ready(out)
            times[row] += time.time() - t0
    scan_qps = BATCH * R * IT / scan_t
    print(f"\nscan denominator: {scan_qps:,.0f} qps")
    print(f"{'engine':6s} {'seeds':>6s} e {'ef':>3s} mif {'bq':>3s} "
          f"{'qps':>9s} {'ratio':>6s} {'recall':>7s}")
    best = None
    for row in live:
        eng, seeds, expand, ef, mif, bq = row
        qps = BATCH * R * IT / times[row]
        ratio = qps / scan_qps
        print(f"{eng:6s} {seeds:6d} {expand} {ef:3d} {mif:3d} {bq:3d} "
              f"{qps:9,.0f} {ratio:6.2f} {recs[row]:7.4f}", flush=True)
        if recs[row] >= 0.99 and (best is None or qps > best[0]):
            best = (qps, ratio, row)
    if best:
        print(f"\nBEST >=0.99: {best[0]:,.0f} qps ratio {best[1]:.2f}x "
              f"{best[2]}")


if __name__ == "__main__":
    main()
