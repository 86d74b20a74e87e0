"""Recall-recovery sweep for the fused-scan serving paths (VERDICT r3 #3).

The r3 headline (scan_fused_pack, ef=16, approx_min_k default
recall_target=0.95) served 0.9857 recall@10 — the plain XLA scan proves
0.998 is reachable on the same quantized scores.  This sweeps the two
candidate-selection levers (rerank depth ``ef`` and approx_min_k's
``recall_target``) plus the grouped-min pre-reduction, interleaving every
variant with the r3 default config so the drift-robust signal is the
per-round RATIO (CLAUDE.md: the chip/relay drifts 2-3x over minutes).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH \
       python -u tools/tune_pack_recall.py [N] [BATCH]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
D, K = 128, 10
N_BLOCKS, BLK = 3, 1024

import jax
import jax.numpy as jnp

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready, recall_at_k

print("devices:", jax.devices())
data = synthetic_clustered(N + BATCH, D, n_clusters=max(100, N // 100),
                           seed=3)
pts, queries = data[:N], data[N:]
nq = N_BLOCKS * BLK

scan = ScanIndex(pts)
np.asarray(scan.norms[0])

bf = BruteForce(np.asarray(scan.points))
_, gt_i = bf.search_batch(queries[:nq], K)
gt_i = np.asarray(gt_i)
del bf

sq = jnp.asarray(queries[:BATCH])
force_ready(sq)


def recall_blocks(pids):
    pids = np.asarray(pids)
    recs = [recall_at_k(pids[j * BLK:(j + 1) * BLK],
                        gt_i[j * BLK:(j + 1) * BLK], K)
            for j in range(N_BLOCKS)]
    return float(np.mean(recs)), float(np.min(recs))


BASE = dict(fused="bucket_pack", qb=1024, cb=8192, lsub=64, inner=2)
VARIANTS = [
    ("r3-default      ef=16 t=.95", dict(BASE, ef=16)),
    ("target99        ef=16 t=.99", dict(BASE, ef=16, sel_target=0.99)),
    ("ef32            ef=32 t=.95", dict(BASE, ef=32)),
    ("ef32-target99   ef=32 t=.99", dict(BASE, ef=32, sel_target=0.99)),
    ("ef48-target99   ef=48 t=.99", dict(BASE, ef=48, sel_target=0.99)),
    ("ef32-t99-g4     ef=32 t=.99",
     dict(BASE, ef=32, sel_target=0.99, sel_group=4)),
    ("int-ef32-t99    ef=32 t=.99",
     dict(fused="bucket_int", qb=1024, cb=4096, lsub=32, ef=32,
          sel_target=0.99)),
]

# recall + compile warmup first
meas = []
for name, kw in VARIANTS:
    _, p = scan.search_batch(queries[:nq], k=K, **kw)
    rec, rmin = recall_blocks(p)
    meas.append([name, kw, rec, rmin, 0.0])
    print(f"{name}: recall@10={rec:.4f} (min {rmin:.4f})")

# interleaved timing rounds (ratio vs r3-default is the stable signal)
R, IT = 4, 6
for v in meas:
    scan.search_batch(sq, k=K, **v[1])  # warm
for _ in range(R):
    for v in meas:
        t0 = time.time()
        for _ in range(IT):
            out = scan.search_batch(sq, k=K, **v[1])
        force_ready(out[0])
        v[4] += time.time() - t0

base_qps = BATCH * R * IT / meas[0][4]
print(f"\n{'variant':<30} {'qps':>10} {'ratio':>6} {'rec':>7} {'min':>7}")
for name, kw, rec, rmin, t in meas:
    qps = BATCH * R * IT / t
    print(f"{name:<30} {qps:>10,.0f} {qps / base_qps:>6.3f} "
          f"{rec:>7.4f} {rmin:>7.4f}")
