"""Sweep fused-scan kernel configs on the real TPU vs the XLA scan.

Run (serialize with any other TPU job; never concurrently with pytest):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/tune_scan_kernel.py

Prints QPS + recall@10 for the XLA streamed scan and each fused
(mode, qb, cb, lsub[, topt]) config at SIFT1M shape.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from instant_distance_tpu.models.brute import BruteForce  # noqa: E402
from instant_distance_tpu.models.scan import ScanIndex  # noqa: E402
from instant_distance_tpu.utils.datasets import synthetic_clustered  # noqa: E402
from instant_distance_tpu.utils.metrics import recall_at_k, time_fn  # noqa: E402


def main():
    n = int(os.environ.get("TUNE_N", 1_000_000))
    dim = int(os.environ.get("TUNE_D", 128))
    b = int(os.environ.get("TUNE_B", 8192))
    k, ef = 10, 16
    print(f"[tune] n={n} d={dim} B={b} k={k} ef={ef}", file=sys.stderr)

    pts = synthetic_clustered(n + 1024, dim, n_clusters=10_000, seed=3)
    data, queries = pts[:n], pts[n:n + b] if b <= 1024 else None
    rng = np.random.default_rng(5)
    queries = data[rng.integers(0, n, b)] + \
        0.001 * rng.standard_normal((b, dim)).astype(np.float32)
    import jax.numpy as jnp
    from instant_distance_tpu.utils.metrics import force_ready
    queries = jnp.asarray(queries)   # stage on device: per-call H2D
    force_ready(queries)             # through the relay is ~150 ms

    t0 = time.time()
    idx = ScanIndex(data)
    jax.block_until_ready(idx.norms)
    print(f"[tune] quantize {time.time() - t0:.1f}s", file=sys.stderr)

    gt_q = queries[:256]
    gt_d, gt_i = BruteForce(data).search_batch(gt_q, k)
    gt_i = np.asarray(gt_i)

    # Interleaved rounds: the chip/relay throughput drifts by 2-3x over
    # minutes, so single-shot timings are useless — every config is
    # timed in each round and judged by its per-round RATIO to the XLA
    # baseline measured in the same round.
    sweep = os.environ.get("TUNE_SWEEP", "pack")
    if sweep == "breakdown":
        # Roofline attribution at the tuned config (VERDICT r2 item 2):
        # time probe kernels that truncate the epilogue at each stage.
        #   mm   = matmul + output write (MXU/HBM floor)
        #   min  = + 1-op min-chain
        #   full = + 2-op key compute (the production epilogue)
        # (full - min) = key cost, (min - mm) = min-chain cost,
        # mm vs the analytic MXU time = fixed/HBM overhead.
        import jax.numpy as jnp2
        from instant_distance_tpu.ops.scan_kernel import (
            fused_scan_probe, pack_w2)
        qb_, cb_, ls_ = 1024, 8192, 64
        arrs = idx._fused_int_arrays(cb_)
        codes_t, norms_r, sg = arrs
        qs = jnp2.maximum(jnp2.max(jnp2.abs(queries)), 1e-30) / 127.0
        qc = jnp2.clip(jnp2.round(queries / qs), -127,
                       127).astype(jnp2.int8)
        denom = 2.0 * qs * sg
        d_ = qc.shape[1]
        w2 = pack_w2(norms_r, denom, None, lsub=ls_, cb=cb_, d=d_)
        force_ready(w2)
        flops = 2.0 * qc.shape[0] * codes_t.shape[1] * d_
        for probe in ("mm", "min", "full"):
            t = time_fn(lambda q, p=probe: fused_scan_probe(
                            qc, w2, codes_t, lsub=ls_, qb=qb_, cb=cb_,
                            probe=p), queries, warmup=2, iters=8)
            mfu = flops / t.per_call_s / 394e12
            print(f"probe={probe:5s} {t.per_call_s * 1e3:8.2f} ms/batch"
                  f"  int8-MFU {mfu * 100:5.1f}%"
                  f"  qps-equiv {qc.shape[0] / t.per_call_s:10,.0f}",
                  flush=True)
        return
    if sweep == "post":
        # Stage attribution of the END-TO-END packed path (the kernel's
        # probe=full is 9.09 ms/batch but search_batch measures ~18 ms:
        # where does the other half go?).  Times, separately:
        #   kern = the Pallas kernel alone
        #   sel  = bitcast + approx_min_k + key gather + id decode
        #   rr   = exact rerank of ef ids (row gathers + f32 distances)
        import jax.numpy as jnp2
        from instant_distance_tpu.ops.distance import resolve
        from instant_distance_tpu.models.scan import rerank_exact
        from instant_distance_tpu.ops.scan_kernel import (
            PACK_THRESH, fused_scan_bucket_int_packed, pack_w2)
        qb_, cb_, ls_, ef_ = 1024, 8192, 64, 16
        codes_t, norms_r, sg = idx._fused_int_arrays(cb_)
        qs = jnp2.maximum(jnp2.max(jnp2.abs(queries)), 1e-30) / 127.0
        qc = jnp2.clip(jnp2.round(queries / qs), -127,
                       127).astype(jnp2.int8)
        w2 = pack_w2(norms_r, 2.0 * qs * sg, None, lsub=ls_, cb=cb_,
                     d=qc.shape[1])
        kern = lambda q: fused_scan_bucket_int_packed(
            qc, w2, codes_t, lsub=ls_, qb=qb_, cb=cb_)
        od = kern(None)
        force_ready(od)
        ct_ = cb_ // ls_

        @jax.jit
        def sel(od_):
            _, nidx = jax.lax.approx_min_k(
                jax.lax.bitcast_convert_type(od_, jnp2.float32), ef_)
            keys = jnp2.take_along_axis(od_, nidx, axis=1)
            bi = (nidx // ct_) * cb_ + (keys & (ls_ - 1)) * ct_ \
                + nidx % ct_
            return jnp2.where(keys < PACK_THRESH, bi, -1)

        @jax.jit
        def selcvt(od_):  # the retired f32-convert selection, for delta
            _, nidx = jax.lax.approx_min_k(od_.astype(jnp2.float32),
                                           ef_)
            keys = jnp2.take_along_axis(od_, nidx, axis=1)
            bi = (nidx // ct_) * cb_ + (keys & (ls_ - 1)) * ct_ \
                + nidx % ct_
            return jnp2.where(keys < PACK_THRESH, bi, -1)

        @jax.jit
        def selgrp(od_):  # grouped-min pre-reduction (sel_group=8)
            g = 8
            bq = od_.shape[0]
            og = od_.reshape(bq, od_.shape[1] // g, g)
            gmin = og.min(axis=2)
            _, gidx = jax.lax.approx_min_k(
                jax.lax.bitcast_convert_type(gmin, jnp2.float32), ef_)
            cand = jnp2.take_along_axis(og, gidx[:, :, None], axis=1)
            j = jnp2.argmin(cand, axis=2).astype(jnp2.int32)
            keys = jnp2.min(cand, axis=2)
            nidx = gidx * g + j
            bi_ = (nidx // ct_) * cb_ + (keys & (ls_ - 1)) * ct_ \
                + nidx % ct_
            return jnp2.where(keys < PACK_THRESH, bi_, -1)

        bi = sel(od)
        force_ready(bi)
        metric = resolve("sqeuclidean")
        # points must be an ARGUMENT: a closed-over 1M x 128 f32 array
        # becomes a 512 MB HLO constant and blows the remote-compile
        # request (HTTP 413) through the axon tunnel.
        rr_j = jax.jit(lambda q, pts, bi_: rerank_exact(q, pts, bi_,
                                                        metric, 10))
        rr = lambda q, bi_: rr_j(q, idx.points, bi_)
        force_ready(rr(queries, bi)[0])
        stages = [("kern", lambda q: kern(None)),
                  ("sel_bitcast", lambda q: sel(od)),
                  ("sel_f32cvt", lambda q: selcvt(od)),
                  ("sel_group8", lambda q: selgrp(od)),
                  ("rerank", lambda q: rr(q, bi)),
                  ("end2end", lambda q: idx.search_batch(
                      q, k=10, ef=ef_, fused="bucket_pack", lsub=ls_,
                      qb=qb_, cb=cb_)),
                  ("e2e_group8", lambda q: idx.search_batch(
                      q, k=10, ef=ef_, fused="bucket_pack", lsub=ls_,
                      qb=qb_, cb=cb_, sel_group=8))]
        # recall checks: grouped selection loses a candidate only when
        # two true top-ef columns share a group — quantify it
        from instant_distance_tpu.models.brute import BruteForce
        gt = np.asarray(BruteForce(np.asarray(idx.points)[:131072])
                        .search_batch(np.asarray(queries)[:512], 10)[1])
        sub = ScanIndex(np.asarray(idx.points)[:131072])
        for sg_ in (0, 8, 16):
            _, pi = sub.search_batch(queries[:512], k=10, ef=ef_,
                                     fused="bucket_pack", lsub=ls_,
                                     qb=256, cb=cb_, sel_group=sg_)
            rec = float(np.mean([len(set(np.asarray(pi)[r])
                                     & set(gt[r])) / 10
                                 for r in range(512)]))
            print(f"sel_group={sg_:2d} recall@10(131k)={rec:.4f}",
                  flush=True)
        for r in range(int(os.environ.get("TUNE_ROUNDS", 3))):
            for name, fn in stages:
                t = time_fn(fn, queries, warmup=1, iters=8)
                print(f"round {r} {name:12s} {t.per_call_s * 1e3:8.2f}"
                      f" ms/batch", flush=True)
        return
    if sweep == "bucket":  # round-2 float-epilogue sweep (kept for repro)
        grid = [("bucket", qb, cb, lsub, inner, ef_)
                for qb, cb, lsub, inner, ef_ in [
                    (512, 4096, 32, 1, 16),
                    (512, 8192, 64, 1, 16),
                    (256, 8192, 64, 1, 16),
                    (512, 4096, 32, 2, 16),
                    (512, 4096, 32, 1, 32),
                    (512, 8192, 32, 1, 16),
                    (1024, 2048, 16, 1, 16),
                ]]
    elif sweep == "slab":
        # Slab-loop kernel body (per-slab matmuls, min in registers) vs
        # the materialize-then-chain body, same packed-key contract.
        grid = [(mode, qb, cb, lsub, inner, 16)
                for mode in ("bucket_pack", "bucket_pack_slab")
                for qb, cb, lsub, inner in [
                    (1024, 8192, 64, 1),   # tuned non-slab config
                    (512, 8192, 64, 1),
                    (256, 8192, 64, 1),
                    (1024, 8192, 64, 2),
                    (512, 32768, 128, 1),
                    (256, 16384, 128, 1),
                ]]
    else:
        # Round-3 sweep: int epilogue (1 sub + argmin track) vs packed
        # keys (2-op key + min-chain, one output).  bucket_pack needs
        # D*lsub <= 16384 (D=128 -> lsub <= 128) and lsub a power of 2.
        grid = [(mode, qb, cb, lsub, inner, 16)
                for mode in ("bucket_int", "bucket_pack")
                for qb, cb, lsub, inner in [
                    (512, 4096, 32, 1),    # round-2 best for bucket_int
                    (512, 4096, 32, 2),
                    (512, 8192, 64, 1),
                    (512, 8192, 32, 1),
                    (1024, 4096, 32, 1),
                    (512, 16384, 64, 1),
                    (512, 8192, 64, 2),
                    (1024, 8192, 64, 1),
                ]] + [("bucket_pack", 2048, 8192, 64, 1, 16),
                      ("bucket_pack", 512, 32768, 128, 1, 16)]
    configs = [("xla", None)] + [
        (f"{m} qb={qb} cb={cb} ls={lsub} in={inner} ef={ef_}",
         (m, qb, cb, lsub, inner, ef_)) for m, qb, cb, lsub, inner, ef_
        in grid]

    def run_cfg(cfg, q):
        if cfg is None:
            return idx.search_batch(q, k=k, ef=ef, approx_topk=True)
        mode, qb, cb, lsub, inner, ef_ = cfg
        slab = mode.endswith("_slab")
        return idx.search_batch(q, k=k, ef=ef_,
                                fused=mode[:-5] if slab else mode,
                                qb=qb, cb=cb, lsub=lsub, inner=inner,
                                slab=slab)

    results = {name: [] for name, _ in configs}
    ok = {}
    for name, cfg in configs:  # compile + recall pass
        try:
            d, i = run_cfg(cfg, gt_q)
            ok[name] = recall_at_k(np.asarray(i), gt_i, k)
        except Exception as exc:
            print(f"{name:46s} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:120]}")
            ok[name] = None
        sys.stdout.flush()
    rounds = int(os.environ.get("TUNE_ROUNDS", 4))
    for r in range(rounds):
        for name, cfg in configs:
            if ok[name] is None:
                continue
            # iters >= 8: per_call includes the ~74 ms pipeline-fill
            # latency amortized over the loop; 3 iters understates
            # throughput ~40% (ranking is unaffected)
            t = time_fn(lambda q: run_cfg(cfg, q), queries, warmup=1,
                        iters=8)
            results[name].append(b / t.per_call_s)
    base = results["xla"]
    for name, cfg in configs:
        if ok[name] is None:
            continue
        qps = results[name]
        ratios = [q / bq for q, bq in zip(qps, base)]
        print(f"{name:46s} med {np.median(qps):10,.0f} qps  "
              f"ratio-vs-xla {np.median(ratios):5.2f}  "
              f"recall@{k}={ok[name]:.4f}  "
              f"rounds={[f'{x/1e3:.1f}k' for x in qps]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
