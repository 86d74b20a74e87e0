"""Diagnose the 2M build-scaling cliff: per-wave cost vs table size N.

Times the full jitted wave step and isolated N-dependent sub-ops
(row gather from [N, m0], donated row scatter into [N+1, m0], point
gather, beam search) at a fixed wave size, for a ladder of N.  The op
whose time jumps super-linearly between 1M and 2M is the cliff.

Run ON the TPU (no other TPU job concurrent):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 3600 python tools/diag_cliff.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, "/root/repo")
from instant_distance_tpu.ops.construct import wave_step_core, _pack_factor
from instant_distance_tpu.ops.beam import beam_search_layer
from instant_distance_tpu.ops.distance import resolve
from instant_distance_tpu.utils.metrics import time_fn

D = 96
M, M0 = 32, 64
EFC = 100
W = 4096

_wave_step = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "efc", "m", "m0", "heuristic",
                     "rev_chunk", "pend_cap", "max_iter_factor", "expand"),
    donate_argnames=("adj", "adjd"))(wave_step_core)


@functools.partial(jax.jit, donate_argnames=("adj",))
def scatter_rows(adj, rows, vals):
    return adj.at[rows].set(vals)


@jax.jit
def gather_rows(adj, rows):
    return adj[rows].sum(dtype=jnp.int32)


@jax.jit
def gather_points(points, idx):
    return points[idx].sum()


def make_state(n, rng):
    """A plausible mid-build state: first n//2 rows populated."""
    filled = n // 2
    adj = np.full((n + 1, M0), -1, np.int32)
    adj[:filled] = rng.integers(0, filled, size=(filled, M0), dtype=np.int32)
    adjd = np.full((n + 1, M0), np.inf, np.float32)
    adjd[:filled] = rng.random((filled, M0), dtype=np.float32)
    points = rng.standard_normal((n, D)).astype(np.float32)
    return jnp.asarray(adj), jnp.asarray(adjd), jnp.asarray(points), filled


def bench_n(n, rng):
    adj, adjd, points, filled = make_state(n, rng)
    metric = resolve("sqeuclidean")
    out = {}

    wave = jnp.asarray(
        rng.choice(np.arange(filled, n, dtype=np.int32), W, replace=False))

    # --- isolated: row gather from adjacency (random rows) ---
    rows = jnp.asarray(rng.integers(0, filled, size=W * 8, dtype=np.int32))
    t = time_fn(gather_rows, adj, rows, warmup=2, iters=20)
    out["gather_adj_ns_per_row"] = t.per_call_s / (W * 8) * 1e9

    # --- isolated: point gather (random rows) ---
    t = time_fn(gather_points, points, rows, warmup=2, iters=20)
    out["gather_pts_ns_per_row"] = t.per_call_s / (W * 8) * 1e9

    # --- isolated: donated row scatter ---
    vals = jnp.asarray(
        rng.integers(0, filled, size=(W, M0), dtype=np.int32))
    srows = jnp.asarray(rng.choice(np.arange(n, dtype=np.int32), W,
                                   replace=False))
    # donation consumes adj; re-make a copy buffer to scatter into
    buf = jnp.array(adj)

    def run_scatter(b):
        return scatter_rows(b, srows, vals)

    # time manually (donation: each call consumes its input)
    bufs = [jnp.array(adj) for _ in range(12)]
    run_scatter(bufs[0])
    run_scatter(bufs[1])
    np.asarray(bufs[1] if False else 0)  # noop
    t0 = time.perf_counter()
    outs = None
    for b in bufs[2:]:
        outs = scatter_rows(b, srows, vals)
    np.asarray(outs[0, 0])
    out["scatter_adj_ms"] = (time.perf_counter() - t0) / 10 * 1e3
    del bufs, buf

    # --- isolated: beam search over the half-filled graph ---
    q = points[wave]
    d0 = metric.gathered(q, points[jnp.zeros((W, 1), jnp.int32)])[:, 0]
    beam_d = jnp.full((W, EFC), jnp.inf, jnp.float32).at[:, 0].set(d0)
    beam_p = jnp.full((W, EFC), -1, jnp.int32).at[:, 0].set(0)
    beam_e = jnp.zeros((W, EFC), bool)

    @functools.partial(jax.jit, static_argnames=("max_iters",))
    def beam(q, adj, points, beam_d, beam_p, beam_e, max_iters):
        return beam_search_layer(q, adj, points, metric, beam_d, beam_p,
                                 beam_e, links=jnp.int32(M0),
                                 max_iters=max_iters, expand=1)

    t = time_fn(beam, q, adj, points, beam_d, beam_p, beam_e, 216,
                warmup=1, iters=5)
    out["beam_ms"] = t.per_call_s * 1e3

    # --- full wave step (timed over donated copies) ---
    pack = _pack_factor(M)
    stacked = jnp.full((4096 // pack, M * pack), -1, jnp.int32)
    offsets = jnp.zeros(16, jnp.int32)

    def one_wave(a, ad):
        a, ad, _ = _wave_step(a, ad, wave, points, stacked, offsets,
                              jnp.int32(0), jnp.int32(M0),
                              metric_name="sqeuclidean", efc=EFC, m=M, m0=M0,
                              heuristic=(False, True), rev_chunk=2048,
                              pend_cap=min(M0, 64), max_iter_factor=8,
                              expand=1)
        return a, ad

    a, ad = jnp.array(adj), jnp.array(adjd)
    a, ad = one_wave(a, ad)  # compile + warm
    a, ad = one_wave(a, ad)
    np.asarray(a[0, 0])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        a, ad = one_wave(a, ad)
    np.asarray(a[0, 0])
    out["wave_ms"] = (time.perf_counter() - t0) / iters * 1e3
    return out


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), file=sys.stderr)
    for n in (500_000, 1_000_000, 1_500_000, 2_000_000, 3_000_000):
        r = bench_n(n, rng)
        print(f"N={n:>9,d}  wave={r['wave_ms']:8.1f} ms  "
              f"beam={r['beam_ms']:8.1f} ms  "
              f"scat={r['scatter_adj_ms']:7.2f} ms  "
              f"gadj={r['gather_adj_ns_per_row']:6.1f} ns/row  "
              f"gpts={r['gather_pts_ns_per_row']:6.1f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
