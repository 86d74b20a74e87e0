"""Round-4 fused-scan epilogue sweep (VERDICT r3 next #4).

The r3 roofline attribution (docs/performance.md) put the packed-key
kernel at ~9 ms/batch with the XLA selection epilogue costing roughly
as much again (approx_min_k reads the full [B, N/lsub] key array back
from HBM).  ``sel_kgroup`` moves the grouped min INTO the kernel
(ops/scan_kernel.py:_emit_group_min): selection runs on a g-fold
smaller array and only winner groups' key columns are gathered back.

Target: fused-vs-XLA-scan ratio >= 6.5x (r3: 5.26x), measured
interleaved (the scan denominator is re-timed every round).

Hardware constraint: og tiles need cb/(lsub*g) % 128 == 0, so the r3
winner (cb=8192, lsub=64 -> ct=128) cannot kgroup at all — the sweep
explores the (bigger-cb | smaller-lsub) shapes that can.  cb=32768
only fits VMEM with the slab body (the grid body materializes the
full [qb, cb] i32 dot tile: 128 MB).

Run ON the TPU (no other TPU/CPU-heavy job concurrent):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 3600 \
        python -u tools/tune_kgroup.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready, recall_at_k

N = int(os.environ.get("TUNE_N", 1_000_000))
DIM = 128
BATCH = int(os.environ.get("TUNE_BATCH", 8192))
K = 10
NQ = 2048

# name -> search_batch kwargs (all bucket_pack, ef=32 rerank)
VARIANTS = {
    # r4 default (anchor; ct=128 -> no kgroup possible at this shape)
    "anchor":      dict(qb=1024, cb=8192, lsub=64, inner=2),
    "anchor-sg8":  dict(qb=1024, cb=8192, lsub=64, inner=2, sel_group=8),
    # kgroup shapes (ct/g = 128 lanes each)
    "l32-g2":      dict(qb=1024, cb=8192, lsub=32, inner=2, sel_kgroup=2),
    "cb16-g2":     dict(qb=1024, cb=16384, lsub=64, inner=1,
                        sel_kgroup=2),
    "cb16-g2-sl":  dict(qb=1024, cb=16384, lsub=64, inner=1,
                        sel_kgroup=2, slab=True),
    "cb16l32-g4":  dict(qb=1024, cb=16384, lsub=32, inner=1,
                        sel_kgroup=4),
    "cb32l32-g8":  dict(qb=1024, cb=32768, lsub=32, inner=1,
                        sel_kgroup=8, slab=True),
    "cb32l64-g4":  dict(qb=1024, cb=32768, lsub=64, inner=1,
                        sel_kgroup=4, slab=True),
}


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    data = synthetic_clustered(N + 16384, DIM,
                               n_clusters=max(100, N // 100), seed=3)
    pts, queries = data[:N], data[N:]

    scan = ScanIndex(pts)
    np.asarray(scan.norms[0])
    gt_i = np.asarray(BruteForce(pts).search_batch(queries[:NQ], K)[1])

    qbatch = jnp.asarray(queries[:BATCH])
    qrec = jnp.asarray(queries[:NQ])
    force_ready(qbatch)
    force_ready(qrec)

    def scan_fn(q):
        return scan.search_batch(q, k=K, ef=16, approx_topk=True)

    def make_fn(kw):
        return lambda q: scan.search_batch(q, k=K, ef=32,
                                           fused="bucket_pack", **kw)

    recs = {}
    for name, kw in VARIANTS.items():
        try:
            fn = make_fn(kw)
            _, pp = fn(qrec)
            recs[name] = recall_at_k(np.asarray(pp), gt_i, K)
            force_ready(fn(qbatch)[0])  # warm the batch shape too
            print(f"[warm] {name:12s}: recall@10={recs[name]:.4f}",
                  flush=True)
        except Exception as exc:
            print(f"[warm] {name} FAILED: {exc}", flush=True)
    force_ready(scan_fn(qbatch)[0])

    live = list(recs)
    times = {n_: 0.0 for n_ in live}
    scan_t = 0.0
    R, IT = 3, 12
    for rnd in range(R):
        t0 = time.time()
        for _ in range(IT):
            out = scan_fn(qbatch)
        force_ready(out[0])
        scan_t += time.time() - t0
        for name in live:
            fn = make_fn(VARIANTS[name])
            t0 = time.time()
            for _ in range(IT):
                out = fn(qbatch)
            force_ready(out[0])
            times[name] += time.time() - t0
    scan_qps = BATCH * R * IT / scan_t
    print(f"\nscan denominator: {scan_qps:,.0f} qps")
    print(f"{'variant':12s} {'qps':>9s} {'ratio':>6s} {'recall':>7s}")
    best = None
    for name in live:
        qps = BATCH * R * IT / times[name]
        ratio = qps / scan_qps
        print(f"{name:12s} {qps:9,.0f} {ratio:6.2f} {recs[name]:7.4f}",
              flush=True)
        if recs[name] >= 0.99 and (best is None or qps > best[0]):
            best = (qps, ratio, name)
    if best:
        print(f"\nBEST >=0.99: {best[0]:,.0f} qps ratio {best[1]:.2f}x "
              f"{best[2]} {VARIANTS[best[2]]}")


if __name__ == "__main__":
    main()
