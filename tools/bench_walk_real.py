"""Real-graph walk-kernel vs XLA packed-beam comparison.

Builds an index with the default scan-mode builder, packs it, and times
the two packed serving engines interleaved (per-round ratio is the
drift-robust signal on this relay).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH \
       python -u tools/bench_walk_real.py [N] [EF] [EXPAND] [BQ]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
EF = int(sys.argv[2]) if len(sys.argv) > 2 else 16
EXPAND = int(sys.argv[3]) if len(sys.argv) > 3 else 2
BQ = int(sys.argv[4]) if len(sys.argv) > 4 else 128
D, K_AT, B, SEEDS = 128, 10, 1024, 8192

import jax
import jax.numpy as jnp

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.models.packed import PackedHnsw
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready, recall_at_k

print("devices:", jax.devices())
data = synthetic_clustered(N + 8192, D, n_clusters=max(100, N // 100),
                           seed=3)
pts, queries = data[:N], data[N:]
cfg = Config(seed=3, ef_search=50, m=32, wave_size=4096,
             construct_mode="auto")
PACK_DUMP = f"/tmp/tune_packed_{N}.npz"  # shared with tune_packed_r4
if os.path.exists(PACK_DUMP):
    t0 = time.time()
    packed = PackedHnsw.load(PACK_DUMP)
    print(f"pack loaded: {time.time()-t0:.1f}s")
else:
    t0 = time.time()
    index, ids = Hnsw.build(pts, cfg)
    np.asarray(index.zero[N - 1, 0])
    print(f"build: {time.time()-t0:.1f}s")
    t0 = time.time()
    packed = PackedHnsw.from_index(index, pack_links=32)
    np.asarray(packed.zero_pack[1][0, 0, 0])
    print(f"pack: {time.time()-t0:.1f}s")
    packed.dump(PACK_DUMP)
    del index

bf = BruteForce(np.asarray(packed.points))
gt_d, gt_i = bf.search_batch(queries[:3072], K_AT)
gt_i = np.asarray(gt_i)
del bf

qbatch = jnp.asarray(queries[:B])
force_ready(qbatch)

kw = dict(k=K_AT, ef=EF, entry_seeds=SEEDS, expand=EXPAND)


def run_xla(q):
    return packed.search_batch(q, **kw)


def run_kernel(q):
    return packed.search_batch_kernel(q, bq=BQ, **kw)


# recall first (also warms compiles)
d, p = run_xla(queries[:3072])
rec_x = recall_at_k(np.asarray(p), gt_i, K_AT)
d, p = run_kernel(queries[:3072])
rec_k = recall_at_k(np.asarray(p), gt_i, K_AT)
print(f"recall@10 xla={rec_x:.4f} kernel={rec_k:.4f}")

# interleaved rounds
run_xla(qbatch)
run_kernel(qbatch)
tx = tk = 0.0
R, IT = 4, 8
for r in range(R):
    t0 = time.time()
    for _ in range(IT):
        out = run_xla(qbatch)
    force_ready(out)
    tx += time.time() - t0
    t0 = time.time()
    for _ in range(IT):
        out = run_kernel(qbatch)
    force_ready(out)
    tk += time.time() - t0
qx, qk = B * R * IT / tx, B * R * IT / tk
print(f"xla   : {qx:,.0f} qps")
print(f"kernel: {qk:,.0f} qps  (ratio {qk/qx:.2f}x)")
