"""extend_candidates trail-dedup deviation measurement (VERDICT r3 #8).

The reference dedups Alg.-4 hop candidates against the whole search
trail (its Visited set, lib.rs:650-652); the batched wave form dedups
against the candidate set + hops only (ops/select.py:102-107) because
the full trail is never materialized on device (beam-membership dedup
replaced Visited).  The native C++ engine implements the exact
reference semantics including the trail dedup (native/src/engine.cpp:
200-215), so the deviation can be measured as a DELTA comparison on the
same data:

    delta_native = recall(native, extend=T) - recall(native, extend=F)
    delta_wave   = recall(wave,   extend=T) - recall(wave,   extend=F)

If |delta_wave - delta_native| is within the seed-noise band, the
batched approximation does not change the knob's effect.  All graphs
are served through the same device exact-beam path so recall
differences are attributable to graph quality alone.

Run (TPU for wave builds + serving; native builds run the host C++):
  PYTHONPATH=/root/repo:$PYTHONPATH \
  timeout 5400 python -u tools/exp_extend_dedup.py [N] [D]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NQ, K, EF = 1024, 10, 50

import jax

from instant_distance_tpu.config import Config, Heuristic
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import recall_at_k

print("devices:", jax.devices())
data = synthetic_clustered(N + NQ, D, n_clusters=max(100, N // 100),
                           seed=3)
pts, queries = data[:N], data[N:]
bf = BruteForce(pts)
_, gt_raw = bf.search_batch(queries, K)
gt_raw = np.asarray(gt_raw)   # input-order ids
del bf


def measure(backend, extend, seed=3, mode="auto"):
    cfg = Config(seed=seed, ef_search=EF, m=32, wave_size=2048,
                 construct_mode=mode,
                 heuristic=Heuristic(extend_candidates=extend,
                                     keep_pruned=True))
    t0 = time.time()
    index, ids = Hnsw.build(pts, cfg, backend=backend)
    bt = time.time() - t0
    gt = np.asarray(ids)[gt_raw]      # map ground truth into pid order
    _, got = index.search_batch(queries, k=K, ef=EF)
    rec = recall_at_k(np.asarray(got), gt, K)
    tag = f"{backend}/{mode} extend={int(extend)} seed={seed}"
    print(f"{tag:<38} recall@{K}={rec:.4f}  (build {bt:.0f}s)")
    return rec


# seed-noise band: same config, two seeds, native extend=F
r_nat_f3 = measure("native", False, seed=3)
r_nat_f4 = measure("native", False, seed=4)
noise = abs(r_nat_f3 - r_nat_f4)
r_nat_t = measure("native", True, seed=3)

r_wav_f = measure("wave", False, seed=3)
r_wav_t = measure("wave", True, seed=3)

d_nat = r_nat_t - r_nat_f3
d_wav = r_wav_t - r_wav_f
print(f"\nnative delta (reference trail-dedup): {d_nat:+.4f}")
print(f"wave   delta (candidate-set dedup)  : {d_wav:+.4f}")
print(f"seed-noise band                     : {noise:.4f}")
verdict = "WITHIN" if abs(d_wav - d_nat) <= max(noise, 0.002) else "EXCEEDS"
print(f"EXTEND_DEDUP_DEVIATION {abs(d_wav - d_nat):.4f} {verdict} noise")
