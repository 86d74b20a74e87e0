"""Construction-quality experiment: which candidate pipeline builds the
best graph, and at what cost? (VERDICT r2 item 1.)

Round-2 data point: the all-EXACT scan candidate pool built a WORSE
graph than the beam pool (1M: 0.972 vs 0.978 exact-graph recall@10) —
more candidate exactness cannot close the gap.  Hypothesis: the beam's
imperfection leaks search-path points into the pool and Alg. 4's
bridging rule keeps some as long-range edges; exact nearest-only pools
starve that rule.  ops/construct._hop_repair injects graph-local
diversity to compensate.  This tool measures the matrix on hardware.

Run ON the TPU (serialized; CPU must stay quiet):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 \
        python -u tools/exp_quality.py [N] > /tmp/exp_quality.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from instant_distance_tpu.config import Config  # noqa: E402
from instant_distance_tpu.models.brute import BruteForce  # noqa: E402
from instant_distance_tpu.models.hnsw import Hnsw  # noqa: E402
from instant_distance_tpu.utils.datasets import synthetic_clustered  # noqa: E402
from instant_distance_tpu.utils.metrics import recall_at_k  # noqa: E402

D = 128


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    nq = 2048
    data = synthetic_clustered(n + nq, D, n_clusters=max(100, n // 100),
                               seed=3)
    pts, queries = data[:n], data[n:]
    print(f"devices: {jax.devices()}  n={n}", flush=True)

    variants = [
        # (name, config kwargs)
        # round-3 FINAL default: pool=3*efc=300, hop=0, always fused
        # (measured 0.9990 @ ef=50 / 1.0000 @ ef=100, 285 s warm, 1M)
        ("newdefault", dict()),
        # the measured pool-depth curve (2026-08-19, 1M seed 3):
        #   hybrid pool200 400.7s 0.9951 | fused pool200 223.9s 0.9946
        #   fused pool300 285.4s 0.9990
        ("newdefault-pool200-hybrid", dict(construct_pool=200,
                                           construct_exact_prefix=131072)),
        ("fusedpack-pool200", dict(construct_pool=200)),
        ("fusedpack-pool300", dict(construct_pool=300)),
        # ---- round-2 matrix (pool pinned to 100 = old default, for
        # ---- reproducibility now that the default pool is 3*efc) ----
        ("hybrid+hop8", dict(construct_hop_repair=8,
                             construct_pool=100,
                             construct_exact_prefix=131072)),
        ("hybrid+hop0", dict(construct_pool=100,
                             construct_exact_prefix=131072)),
        ("fusedpack-only+hop8", dict(construct_exact_prefix=0,
                                     construct_hop_repair=8,
                                     construct_pool=100)),
        ("fusedpack-only+hop0", dict(construct_exact_prefix=0,
                                     construct_pool=100)),
        # deeper candidate pools: the scan's marginal cost of efc is ~0
        # (the kernel scans all N either way) — a lever the reference's
        # beam cannot afford (its search cost scales with efc)
        ("fusedpack-efc150", dict(construct_exact_prefix=0,
                                  construct_hop_repair=8,
                                  construct_pool=150)),
        ("fusedpack-efc200-hop0", dict(construct_exact_prefix=0,
                                       construct_pool=200)),
        # smaller waves approximate sequential insertion order better
        ("fusedpack-wave2048", dict(construct_exact_prefix=0,
                                    construct_pool=100,
                                    wave_size=2048)),
        ("scan-exact+hop8", dict(construct_mode="scan",
                                 construct_hop_repair=8,
                                 construct_pool=100)),
        ("scan-exact+hop0", dict(construct_mode="scan",
                                 construct_pool=100)),
        ("hybrid+hop16", dict(construct_hop_repair=16,
                              construct_pool=100,
                              construct_exact_prefix=131072)),
        ("beam (reference bar)", dict(construct_mode="beam")),
    ]
    sel = os.environ.get("EXPQ_ONLY")
    if sel:
        keep = sel.split(",")
        variants = [v for v in variants
                    if any(s in v[0] for s in keep)]

    # ground truth once, in ORIGINAL point order; translated to each
    # build's pid space via its returned id remap
    gt_orig = np.asarray(BruteForce(pts).search_batch(queries, 10)[1])

    for name, kw in variants:
        base = dict(seed=3, wave_size=4096)
        base.update(kw)
        cfg = Config(**base)
        t0 = time.time()
        try:
            index, ids = Hnsw.build(pts, cfg)
            np.asarray(index.zero[n - 1])   # honest barrier
        except Exception as exc:
            print(f"{name:28s} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            continue
        dt = time.time() - t0
        want = ids[gt_orig]                 # original idx -> pid
        _, p = index.search_batch(queries, k=10, ef=50)
        rec = recall_at_k(np.asarray(p), want, 10)
        _, p2 = index.search_batch(queries, k=10, ef=100)
        rec100 = recall_at_k(np.asarray(p2), want, 10)
        print(f"{name:28s} build={dt:7.1f}s  recall@10(ef=50)={rec:.4f}"
              f"  (ef=100)={rec100:.4f}", flush=True)
        del index


if __name__ == "__main__":
    main()
