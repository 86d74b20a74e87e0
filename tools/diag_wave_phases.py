"""Per-phase timing of one construction wave on a real mid-build state.

Phases timed separately (each its own jit, honest force_ready sync):
  search_scan   — int8 prefix scan + exact rerank (scan-mode search)
  peers         — intra-wave pairwise + approx top-k merge
  select        — forward Alg. 4 selection
  commit        — reverse-edge grouping + chunked re-selection commit

Uses the diag checkpoint left by tools/diag_cliff_real.py (same state
the full-wave numbers came from), so phase times add up to the wave.

Run ON the TPU:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 3600 \
        python -u tools/diag_wave_phases.py [N] > /tmp/phases.log 2>&1
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_distance_tpu.config import Config
from instant_distance_tpu.ops import construct as C
from instant_distance_tpu.ops import select as sel_ops
from instant_distance_tpu.ops.distance import resolve
from instant_distance_tpu.utils.datasets import synthetic_clustered
from instant_distance_tpu.utils.metrics import force_ready

D = 96
WAVE = 4096


def timed(label, fn, *args, iters=3):
    out = fn(*args)
    force_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:12s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f"/tmp/diag_ckpt_{n}.npz"
    pts = synthetic_clustered(n, D, n_clusters=max(100, n // 100), seed=3)
    cfg = Config(seed=3, wave_size=WAVE)
    m, m0, efc = cfg.m, cfg.m0, cfg.ef_construction
    rng = np.random.default_rng(cfg.seed)
    keys = rng.integers(0, n, size=n)
    order = np.lexsort((np.arange(n), keys))
    pts = pts[order]

    with np.load(path, allow_pickle=False) as z:
        adj = jnp.asarray(z["adj"])
        adjd = jnp.asarray(z["adjd"])
        s_done = int(z["s"])

    dev_points = jnp.asarray(pts)
    metric = resolve("sqeuclidean")
    codes, cscales, cnorms = C._quantize_for_scan(dev_points)
    s = s_done + WAVE
    wave = jnp.asarray(np.arange(s, s + WAVE, dtype=np.int32))
    q = dev_points[wave]
    print(f"N={n:,} filled~{s:,}", flush=True)

    # --- phase: scan search + exact rerank -----------------------------
    # NOTE: big arrays must be jit ARGUMENTS — closure constants embed
    # into the HLO and blow the remote-compile request size (HTTP 413)
    @jax.jit
    def search_scan(q, wave, codes, cscales, cnorms, dev_points):
        from instant_distance_tpu.models.scan import scan_candidates
        filled = wave[0]
        prefix = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] < filled
        cand_ad, cand_p = scan_candidates(
            q, codes, cscales, cnorms, prefix, metric_name="sqeuclidean",
            ef=efc, chunk=min(1 << 17, n), approx_topk=True)
        cand_d = metric.gathered(q, dev_points[jnp.clip(cand_p, 0)])
        cand_d = jnp.where(cand_p >= 0, cand_d, jnp.inf)
        return jax.lax.sort((cand_d, cand_p), dimension=1, num_keys=2)

    cand_d, cand_p = timed("search_scan", search_scan, q, wave,
                           codes, cscales, cnorms, dev_points)

    # --- phase: intra-wave peers (pairwise + approx top-k + merge) -----
    @jax.jit
    def peers(q, wave, cand_d, cand_p):
        w = q.shape[0]
        pw = metric.pairwise(q, q)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        bad = (iota_r == iota_c)
        pw = jnp.where(bad, jnp.inf, pw)
        pd_, pidx = jax.lax.approx_min_k(pw, min(m0, w))
        pp = jnp.where(jnp.isfinite(pd_), wave[jnp.clip(pidx, 0)], -1)
        cd = jnp.concatenate([cand_d, pd_], axis=1)
        cp = jnp.concatenate([cand_p, pp], axis=1)
        cd, cp = jax.lax.sort((cd, cp), dimension=1, num_keys=2)
        return cd[:, :efc], cp[:, :efc]

    cand_d, cand_p = timed("peers", peers, q, wave, cand_d, cand_p)

    # --- phase: forward selection --------------------------------------
    @jax.jit
    def select(q, cand_d, cand_p, dev_points):
        cand_pts = dev_points[jnp.clip(cand_p, 0)]
        return sel_ops.select_heuristic(q, cand_d, cand_p, cand_pts,
                                        metric, m0, keep_pruned=True)

    sel_d, sel_p = timed("select", select, q, cand_d, cand_p, dev_points)

    # --- phase: reverse commit (grouping + chunked re-selection) -------
    step = functools.partial(
        C._wave_step, metric_name="sqeuclidean", efc=efc, m=m, m0=m0,
        heuristic=(False, True), rev_chunk=8192, pend_cap=min(m0, 64),
        rev_rounds=0, max_iter_factor=cfg.max_iter_factor,
        expand=getattr(cfg, "construct_expand", 1), search_mode="scan")

    stacked = jnp.full((4096 // C._pack_factor(m),
                        m * C._pack_factor(m)), -1, jnp.int32)
    offsets = jnp.zeros(16, jnp.int32)

    def full_wave(a, ad):
        return step(a, ad, wave, dev_points, stacked, offsets,
                    jnp.int32(0), jnp.int32(m0), codes, cscales, cnorms)

    a, ad = jnp.array(adj), jnp.array(adjd)
    out = full_wave(a, ad)
    force_ready(out[2])
    bufs = [(jnp.array(adj), jnp.array(adjd)) for _ in range(4)]
    t0 = time.time()
    for a, ad in bufs:
        out = full_wave(a, ad)
    force_ready(out[2])
    dt = (time.time() - t0) / len(bufs)
    print(f"{'full_wave':12s} {dt*1e3:9.2f} ms "
          f"(commit ~= full - search - peers - select)", flush=True)


if __name__ == "__main__":
    main()
