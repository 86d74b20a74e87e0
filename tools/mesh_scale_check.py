"""Non-toy mesh proof (VERDICT r3 #5): 8-device CPU mesh, 200k x 64.

Prior mesh coverage topped out at ~1.2k points (tests/test_sharded.py)
and 512 in the driver dry run — too small to exercise shard-boundary
effects (padding sentinels, gid remaps, per-shard graph quality).  This
runs the real thing on the virtual 8-device CPU mesh:

1. ``ShardedHnsw.build`` at N>=200k, D=64 (shard_map'd construction
   waves on all 8 devices), then a sharded batched query with the
   cross-shard all_gather top-k merge — recall@10 floor vs brute force.
2. ``ShardedScanIndex`` equivalence: the point-sharded int8 MXU scan
   with exact rerank must agree with a single-device ``ScanIndex`` on
   the same points (same quantization, same rerank => same ids), and
   both carry a recall floor vs brute force.
3. ``ShardedPackedHnsw`` (packed per-shard graphs) recall floor.

Run on the 1-core build VM (CPU-only; never concurrent with a TPU job):
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 7200 python -u tools/mesh_scale_check.py [N] [D]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NQ, K = 1024, 10

import jax

assert len(jax.devices()) >= 8, jax.devices()

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex
from instant_distance_tpu.parallel.mesh import default_mesh
from instant_distance_tpu.parallel.scan import ShardedScanIndex
from instant_distance_tpu.parallel.sharded import (ShardedHnsw,
                                                   ShardedPackedHnsw)
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import recall_at_k

print("devices:", len(jax.devices()), jax.devices()[0].platform)
mesh = default_mesh(8)
data = synthetic_clustered(N + NQ, D, n_clusters=max(100, N // 100),
                           seed=3)
pts, queries = data[:N], data[N:]

bf = BruteForce(pts)
_, gt_i = bf.search_batch(queries, K)
gt_i = np.asarray(gt_i)
del bf

t0 = time.time()


def _prog(done, total, phase):
    el = time.time() - t0
    print(f"[mesh] {phase}: {done}/{total} ({el:.0f}s, "
          f"proj {el * total / max(done, 1):.0f}s)", flush=True)


idx = ShardedHnsw.build(pts, Config(seed=3, ef_search=50, m=32,
                                    wave_size=2048,
                                    construct_mode="auto"),
                        mesh=mesh, progress=_prog)
print(f"sharded build: {time.time() - t0:.1f}s "
      f"({idx.n_shards} shards x {N // 8} pts)")

t0 = time.time()
d, g = idx.search_batch(queries, k=K)
rec = recall_at_k(np.asarray(g), gt_i, K)
print(f"sharded graph recall@{K} = {rec:.4f}  "
      f"({time.time() - t0:.1f}s for {NQ} queries)")
assert rec >= 0.95, f"sharded graph recall {rec} < 0.95"

# packed per-shard graphs
t0 = time.time()
spk = ShardedPackedHnsw.from_sharded(idx, pack_links=32)
dp, gp = spk.search_batch(queries, k=K)
rec_p = recall_at_k(np.asarray(gp), gt_i, K)
print(f"sharded packed recall@{K} = {rec_p:.4f}  "
      f"({time.time() - t0:.1f}s incl. pack)")
assert rec_p >= 0.90, f"sharded packed recall {rec_p} < 0.90"

# scan equivalence: sharded int8 scan + all_gather merge must agree
# with the single-device ScanIndex (identical per-point quantization,
# identical exact rerank => identical ids up to distance ties)
t0 = time.time()
sidx = ShardedScanIndex(pts, mesh=mesh)
sd, sg = sidx.search_batch(queries, k=K)
single = ScanIndex(pts)
ud, ug = single.search_batch(queries, k=K, ef=50)
sd, sg = np.asarray(sd), np.asarray(sg)
ud, ug = np.asarray(ud), np.asarray(ug)
rec_s = recall_at_k(sg, gt_i, K)
rec_u = recall_at_k(ug, gt_i, K)
# id-set agreement per query (ties can swap order across the merge)
agree = np.mean([len(set(sg[i]) & set(ug[i])) / K for i in range(NQ)])
print(f"sharded scan recall@{K} = {rec_s:.4f}, single-device scan = "
      f"{rec_u:.4f}, id-set agreement = {agree:.4f}  "
      f"({time.time() - t0:.1f}s)")
assert rec_s >= 0.95, f"sharded scan recall {rec_s} < 0.95"
assert agree >= 0.99, f"sharded/single scan disagree: {agree}"

print("MESH_SCALE_CHECK_OK", dict(n=N, d=D, graph=round(rec, 4),
                                  packed=round(rec_p, 4),
                                  scan=round(rec_s, 4),
                                  agree=round(agree, 4)))
