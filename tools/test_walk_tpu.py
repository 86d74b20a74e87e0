"""On-TPU smoke + agreement + microbench for the fused walk kernel.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/test_walk_tpu.py [N]
Builds a random valid graph (no HNSW build), compares walk_search vs
beam_search_packed on the real chip, then times both.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from instant_distance_tpu.ops import packed as pk
from instant_distance_tpu.ops.walk_kernel import pack_walk_meta, walk_search
from instant_distance_tpu.utils.metrics import force_ready

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, K, EF, B = 128, 64, 16, 1024
EXPAND = 2
MAX_IT = 8 * EF + 16

print("devices:", jax.devices())
rng = np.random.default_rng(42)
pts = rng.standard_normal((N, D)).astype(np.float32)
# random valid adjacency: unique ids per row (sampled w/o replacement via
# random sort keys), -1 terminated
adj = np.argsort(rng.random((N, 4 * K)), axis=1)[:, :K].astype(np.int32)
adj = np.sort(rng.integers(0, N, size=(N, K), dtype=np.int32), axis=1)
# dedupe within rows: mark repeats -1 (keep first)
dup = np.zeros_like(adj, bool)
dup[:, 1:] = adj[:, 1:] == adj[:, :-1]
adj[dup] = -1
adj.sort(axis=1)
adj = adj[:, ::-1].copy()  # valid prefix order: -1s at end
# repair: put -1s last
key = np.where(adj < 0, np.iinfo(np.int32).max, adj)
order = np.argsort(key, axis=1, kind="stable")
adj = np.take_along_axis(adj, order, axis=1)

codes, scales = pk.quantize_points(jnp.asarray(pts))
_, pcodes, pscales = pk.pack_layer(jnp.asarray(adj), codes, scales)
ids = jnp.asarray(adj)
meta_np, kp = pack_walk_meta(adj, np.asarray(pscales))
meta = jnp.asarray(meta_np)

queries = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
seeds = jnp.asarray(pts[:8192], jnp.bfloat16)
sd, sp = pk.seed_entry(queries, seeds, EF)
bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, :EF].set(sd)
bp0 = jnp.full((B, EF), -1, jnp.int32).at[:, :EF].set(sp)
force_ready((bd0, bp0))

from instant_distance_tpu.ops.walk_kernel import pack_walk_fused

frow = jnp.asarray(pack_walk_fused(adj, np.asarray(pscales),
                                   np.asarray(pcodes)))
dummy = jnp.zeros((1, 128), jnp.int32)

VARIANTS = {
    "split/count":   dict(ops=(pcodes, meta), kp=kp, fused_rows=False,
                          merge="count"),
    "split/extract": dict(ops=(pcodes, meta), kp=kp, fused_rows=False,
                          merge="extract"),
    "fused/count":   dict(ops=(frow, dummy), kp=64, fused_rows=True,
                          merge="count"),
    "fused/extract": dict(ops=(frow, dummy), kp=64, fused_rows=True,
                          merge="extract"),
}


def run_variant(name, bq=128):
    v = VARIANTS[name]
    c, m = v["ops"]
    return walk_search(queries, bd0, bp0, c, m, kp=v["kp"],
                       expand=EXPAND, ef=EF, max_iters=MAX_IT, bq=bq,
                       fused_rows=v["fused_rows"], merge=v["merge"],
                       k=K)


t0 = time.time()
xd, xp = pk.beam_search_packed(queries, ids, pcodes, pscales, bd0, bp0,
                               jnp.zeros((B, EF), bool),
                               max_iters=MAX_IT, expand=EXPAND)
force_ready((xd, xp))
print(f"xla compile+run:    {time.time()-t0:.1f}s")

for name in VARIANTS:
    t0 = time.time()
    try:
        kd, kpid = run_variant(name)
        force_ready((kd, kpid))
    except Exception as e:  # one variant's compile OOM must not kill the matrix
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        continue
    pm = np.mean(np.asarray(xp) == np.asarray(kpid))
    top1 = np.mean(np.asarray(xp)[:, 0] == np.asarray(kpid)[:, 0])
    print(f"{name:14s} compile+run {time.time()-t0:5.1f}s  "
          f"beam pid agreement: {pm:.4f}  top1: {top1:.4f}")


def timeit(f, reps=8):
    f()  # warm
    t0 = time.time()
    for _ in range(reps):
        r = f()
    force_ready(r[0])
    return (time.time() - t0) / reps


# baseline FIRST: the ratio's denominator must land even if a late
# kernel variant fails to compile
tx = timeit(lambda: pk.beam_search_packed(
    queries, ids, pcodes, pscales, bd0, bp0,
    jnp.zeros((B, EF), bool), max_iters=MAX_IT, expand=EXPAND))
print(f"xla packed beam: {tx*1e3:.2f} ms/batch = {B/tx:,.0f} qps")
for name in VARIANTS:
    for bq in (128, 256):
        try:
            tk = timeit(lambda: run_variant(name, bq=bq))
        except Exception as e:
            print(f"{name:14s} bq={bq}: FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        print(f"{name:14s} bq={bq}: {tk*1e3:6.2f} ms/batch = "
              f"{B/tk:,.0f} qps")
