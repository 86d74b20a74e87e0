"""ScanIndex: int8 MXU-scan + exact-rerank serving (no graph).

The TPU-native answer to the row-issue bound (docs/performance.md): HNSW
traversal on TPU costs ~11 ns per scattered row *regardless of row
bytes*, so at SIFT1M shapes the graph walk caps out in the tens of
thousands of QPS.  The MXU, by contrast, multiplies int8 at ~400 TOPS —
scoring EVERY point against a query batch costs ~0.25 GOP per query at
1M x 128, i.e. the *exhaustive* quantized scan is faster than walking
the graph.  This model drops the graph entirely for the serving path:

  1. points are int8-quantized per point (symmetric max-abs, the same
     codes as ops/packed.py) once at build;
  2. a query batch is int8-quantized per query (asymmetric error is
     repaired by the rerank);
  3. scores = one [B, N] int8 x int8 MXU matmul, streamed in chunks with
     a running per-chunk top-ef merge (so the [B, N] score matrix never
     materializes);
  4. the top-ef candidates get exact f32 distances (one ef-row gather
     per query) and the final top-k is exact.

This is the ScaNN/MIPS recipe mapped onto the MXU; the reference has no
equivalent (its only exact scan is the ad-hoc ground-truth loop in
tests/all.rs:63-70).  Unlike the graph indices, the filter/tombstone
semantics here are *exhaustively exact*: every eligible point is scored.

Use it when N x D fits the FLOP budget (<=~10M x 1k-d per chip);
ShardedHnsw/PackedHnsw remain the choice for cheap single queries or
very large N.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.distance import resolve
from ..ops.packed import quantize_points


def _quantize_queries(queries):
    """Per-query symmetric int8 (same scheme as quantize_points)."""
    amax = jnp.max(jnp.abs(queries), axis=-1)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(queries / scale[:, None]), -127, 127)
    return codes.astype(jnp.int8), scale.astype(jnp.float32)


def scan_candidates(queries, codes, scales, norms, eligible, *,
                    metric_name: str, ef: int, chunk: int,
                    approx_topk: bool = False, tile: int = 0,
                    approx_recall: float = 0.95):
    """The streamed quantized scan: [B, D] queries vs [N] codes ->
    (approx dists [B, ef], ids [B, ef]) sorted by (dist, id), -1 padded.
    Shared by ScanIndex and the sharded/replicated serving wrappers
    (traceable: call under jit / shard_map).

    ``approx_topk`` uses the TPU-accelerated ``lax.approx_min_k`` for the
    per-chunk candidate selection (the exact rerank repairs ordering,
    so end recall loss is tiny while large-chunk selection gets much
    cheaper).  ``approx_recall`` is the per-chunk recall target; chunk
    losses compound over n/chunk chunks, so callers that feed graph
    construction (where candidate quality becomes edge quality with no
    serving-time rerank to save it) should raise it — the 2M-point
    scan-mode build measured recall 0.949 vs 1M's 0.972 at the 0.95
    default, the per-chunk loss compounding across 16 chunks.

    ``tile`` > 1 inserts a within-tile min+argmin reduction between the
    matmul and the top-k: each ``tile``-wide slice of the score row
    contributes only its best candidate, so selection runs over a
    ``tile``x smaller array (one cheap VPU reduce that XLA fuses into
    the matmul consumer, instead of top-k over the full score matrix).
    Recall cost: only when two of the true top-k land in the same tile
    (P ~ k^2 * tile / 2N — negligible for tile <= 16 at N >= 1e5)."""
    b = queries.shape[0]
    n = codes.shape[0]
    chunk = min(chunk, n)
    if tile > 1:
        if chunk < 4 * tile or chunk // tile < ef:
            tile = 0    # tiny chunk, or tiling would narrow below ef
        else:
            chunk = (chunk // tile) * tile
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    scales_p = jnp.pad(scales, (0, pad))
    norms_p = jnp.pad(norms, (0, pad))
    eligible_p = None if eligible is None else jnp.pad(eligible, (0, pad))
    ef = min(ef, n)

    qc, qs = _quantize_queries(queries)
    is_dot = metric_name in ("dot", "cosine")
    if metric_name == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=1))
        qs = qs / jnp.maximum(qn, 1e-30)

    def body(carry, i):
        best_d, best_i = carry
        cblock = jax.lax.dynamic_slice_in_dim(codes_p, i * chunk, chunk)
        sblock = jax.lax.dynamic_slice_in_dim(scales_p, i * chunk, chunk)
        nblock = jax.lax.dynamic_slice_in_dim(norms_p, i * chunk, chunk)
        # the hot op: int8 x int8 -> int32 on the MXU
        dot = jax.lax.dot_general(
            qc, cblock, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)               # [B, C]
        prod = (qs[:, None] * sblock[None, :]) * dot.astype(jnp.float32)
        if metric_name == "cosine":  # also normalize by the point norm
            d = -prod * jax.lax.rsqrt(
                jnp.maximum(nblock, 1e-30))[None, :]
        elif is_dot:
            d = -prod
        else:  # squared L2 up to the per-query constant |q|^2
            d = nblock[None, :] - 2.0 * prod
        ids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        ok = ids < n
        if eligible_p is not None:
            el = jax.lax.dynamic_slice_in_dim(eligible_p, i * chunk, chunk)
            ok = ok & el[None, :]
        d = jnp.where(ok, d, jnp.inf)
        sel_ids = ids
        if tile > 1:
            ct = d.shape[1] // tile
            d3 = d.reshape(b, ct, tile)
            am = jnp.argmin(d3, axis=2)
            d = jnp.min(d3, axis=2)                          # [B, C/L]
            sel_ids = jnp.take_along_axis(
                ids.reshape(b, ct, tile), am[..., None], axis=2)[..., 0]
        if approx_topk:
            md, nidx = jax.lax.approx_min_k(d, ef,
                                            recall_target=approx_recall)
            nd = -md
        else:
            nd, nidx = jax.lax.top_k(-d, ef)
        ni = jnp.take_along_axis(sel_ids, nidx, axis=1)
        ni = jnp.where(jnp.isfinite(nd), ni, -1)
        cat_d = jnp.concatenate([best_d, -nd], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.where(ni >= 0, ni, np.iinfo(np.int32).max)],
            axis=1)
        sd, si = jax.lax.sort((cat_d, cat_i), dimension=1, num_keys=2)
        return (sd[:, :ef], si[:, :ef]), None

    init = (jnp.full((b, ef), jnp.inf, jnp.float32),
            jnp.full((b, ef), np.iinfo(np.int32).max, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    bi = jnp.where(jnp.isfinite(bd), bi, -1)
    return bd, bi


def rerank_exact(queries, points, bi, metric, k: int):
    """Exact top-k over candidate ids: one ef-row gather per query.

    ``points`` may be 128-lane zero-padded (the compact-argument
    tiled-copy fix, docs/performance.md round 4) — the gathered rows
    are sliced back to the queries' D, so distances are computed on
    the caller's exact compact vectors either way."""
    rows = points[jnp.clip(bi, 0)][..., :queries.shape[1]]
    exact = metric.gathered(queries, rows)
    exact = jnp.where(bi >= 0, exact, jnp.inf)
    sd, si = jax.lax.sort((exact, bi), dimension=1, num_keys=2)
    return sd[:, :k], si[:, :k]


@functools.partial(
    jax.jit,
    static_argnames=("metric_name", "ef", "k", "chunk", "rerank",
                     "approx_topk", "tile"))
def _scan_search_jit(queries, codes, scales, norms, points, eligible, *,
                     metric_name, ef, k, chunk, rerank,
                     approx_topk=False, tile=0):
    bd, bi = scan_candidates(queries, codes, scales, norms, eligible,
                             metric_name=metric_name, ef=ef, chunk=chunk,
                             approx_topk=approx_topk, tile=tile)
    if not rerank:
        bd, bi = bd[:, :k], bi[:, :k]
        # restore the per-query constants the streamed scan drops, so
        # rerank=False values are (quantized) approximations in the
        # named metric's units, not an ordering-only surrogate
        if metric_name == "sqeuclidean":
            qn2 = jnp.sum(queries * queries, axis=1, keepdims=True)
            bd = jnp.where(jnp.isfinite(bd), bd + qn2, bd)
        elif metric_name == "cosine":
            bd = jnp.where(jnp.isfinite(bd), bd + 1.0, bd)
        return bd, bi
    # exact rerank: ef true f32 distances per query (HIGHEST precision)
    return rerank_exact(queries, points, bi, resolve(metric_name), k)


@functools.partial(
    jax.jit,
    static_argnames=("ef", "k", "lsub", "qb", "cb", "inner", "rerank",
                     "sel_target", "interpret", "metric_name"))
def _fused_int_search_jit(queries, codes_t, norms_r, sg, points,
                          eligible, *, metric_name, ef, k, lsub, qb, cb,
                          inner, rerank, sel_target=0.95, interpret=False):
    """Shared-scale int-epilogue fused scan (ops/scan_kernel.py:
    fused_scan_bucket_int): queries quantized with ONE batch scale so
    the kernel's per-element epilogue is a single int32 subtract."""
    from ..ops.scan_kernel import fused_scan_bucket_int

    big = np.int32(np.iinfo(np.int32).max // 2)
    qs = jnp.maximum(jnp.max(jnp.abs(queries)), 1e-30) / 127.0
    qc = jnp.clip(jnp.round(queries / qs), -127, 127).astype(jnp.int8)
    denom = 2.0 * qs * sg
    w = jnp.where(jnp.isfinite(norms_r),
                  jnp.round(norms_r / denom), big).astype(jnp.int32)
    if eligible is not None:
        npad = norms_r.shape[1] - eligible.shape[0]
        el = jnp.pad(eligible, (0, npad))
        w = jnp.where(el[None, :], w, big)
    od, oi = fused_scan_bucket_int(qc, w, codes_t, lsub=lsub, qb=qb,
                                   cb=cb, inner=inner,
                                   interpret=interpret)
    # int ranks < 2^24 convert exactly; approx_min_k needs floats
    md, nidx = jax.lax.approx_min_k(od.astype(jnp.float32),
                                    min(ef, od.shape[1]),
                                    recall_target=sel_target)
    bi = jnp.take_along_axis(oi, nidx, axis=1)
    bi = jnp.where(md < big // 2, bi, -1)
    if not rerank:
        # rank = (|p|^2 - 2 q.p) / denom  ->  approx sq-L2 in metric
        # units needs + |q|^2 (cf. _scan_search_jit's rerank=False)
        qn2 = jnp.sum(queries * queries, axis=1, keepdims=True)
        bd = jnp.where(bi >= 0, md * denom + qn2, jnp.inf)
        bd, bi = jax.lax.sort((bd, bi), dimension=1, num_keys=2)
        return bd[:, :k], bi[:, :k]
    return rerank_exact(queries, points, bi, resolve(metric_name), k)


@functools.partial(
    jax.jit,
    static_argnames=("ef", "k", "lsub", "qb", "cb", "inner", "rerank",
                     "slab", "sel_group", "sel_kgroup", "sel_target",
                     "interpret", "metric_name"))
def _fused_int_packed_search_jit(queries, codes_t, norms_r, sg, points,
                                 eligible, *, metric_name, ef, k, lsub,
                                 qb, cb, inner, rerank, slab=False,
                                 sel_group=0, sel_kgroup=0,
                                 sel_target=0.95, interpret=False):
    """Packed-key int-epilogue fused scan (ops/scan_kernel.py:
    fused_scan_bucket_int_packed): the slab index rides the rank's low
    bits, so the kernel's epilogue is a 2-op key + 1 min per element
    and it emits ONE output array — ids are reconstructed here from
    the key bits and the output position.  ``slab`` selects the
    slab-loop kernel body (per-slab matmuls, min held in registers)."""
    from ..ops.scan_kernel import (PACK_OFFSET, PACK_THRESH,
                                   fused_scan_bucket_int_packed, pack_w2)

    d = queries.shape[1]
    qs = jnp.maximum(jnp.max(jnp.abs(queries)), 1e-30) / 127.0
    qc = jnp.clip(jnp.round(queries / qs), -127, 127).astype(jnp.int8)
    denom = 2.0 * qs * sg
    el = None
    if eligible is not None:
        npad = norms_r.shape[1] - eligible.shape[0]
        el = jnp.pad(eligible, (0, npad))[None, :]
    w2 = pack_w2(norms_r, denom, el, lsub=lsub, cb=cb, d=d)
    og = None
    if sel_kgroup > 1:
        od, og = fused_scan_bucket_int_packed(
            qc, w2, codes_t, lsub=lsub, qb=qb, cb=cb, inner=inner,
            slab=slab, groups=sel_kgroup, interpret=interpret)
    else:
        od = fused_scan_bucket_int_packed(
            qc, w2, codes_t, lsub=lsub, qb=qb, cb=cb, inner=inner,
            slab=slab, interpret=interpret)
    efk = min(ef, od.shape[1])
    ct = cb // lsub
    # keys are non-negative by the pack_w2 bias, so their f32 BITCAST is
    # order-preserving: approx_min_k runs on the reinterpreted array and
    # no f32-converted copy of [B, N/lsub] is ever materialized.  The
    # exact int keys are re-gathered by position before decoding ids.
    if og is not None and og.shape[1] >= efk:
        # In-kernel grouped-min selection: approx_min_k runs on the
        # kernel's second-level output (sel_kgroup-fold smaller), and
        # only winner groups' od columns are gathered back — the full
        # [B, N/lsub] key array is written once and never re-read.
        # og group gi covers od columns icj*ct + t*ctg + gl (see
        # fused_scan_bucket_int_packed); candidate-merge semantics match
        # sel_group (top-ef distinct groups, rerank absorbs the loss).
        ctg = ct // sel_kgroup
        b = od.shape[0]
        _, gidx = jax.lax.approx_min_k(
            jax.lax.bitcast_convert_type(og, jnp.float32), efk,
            recall_target=sel_target)                       # [B, efk]
        base = (gidx // ctg) * ct + (gidx % ctg)            # od columns
        memb = (base[:, :, None]
                + (jnp.arange(sel_kgroup, dtype=gidx.dtype)
                   * ctg)[None, None, :])                   # [B,efk,G]
        cand = jnp.take_along_axis(
            od, memb.reshape(b, efk * sel_kgroup),
            axis=1).reshape(b, efk, sel_kgroup)
        j = jnp.argmin(cand, axis=2).astype(jnp.int32)
        keys = jnp.min(cand, axis=2)
        nidx = base + j * ctg
    elif sel_group > 1 and od.shape[1] % sel_group == 0 \
            and od.shape[1] // sel_group >= efk:
        # Grouped-min pre-reduction: approx_min_k on [B, N/lsub] runs
        # far below HBM bandwidth (measured ~6.6 ms of a 17 ms batch at
        # 1M x 128), while an integer min over sel_group-wide column
        # groups is a bandwidth-bound pass that shrinks its input
        # sel_group-fold.  Select the top-ef GROUPS, then re-gather each
        # winner group's keys to recover the winning column exactly.
        # Semantics: top-ef distinct-group columns — a candidate is
        # lost only when two true top-ef columns share a group (random
        # ~ef*g/ncols chance per candidate); the exact rerank absorbs it.
        b = od.shape[0]
        og = od.reshape(b, od.shape[1] // sel_group, sel_group)
        gmin = og.min(axis=2)
        _, gidx = jax.lax.approx_min_k(
            jax.lax.bitcast_convert_type(gmin, jnp.float32), efk,
            recall_target=sel_target)
        cand = jnp.take_along_axis(og, gidx[:, :, None], axis=1)
        j = jnp.argmin(cand, axis=2).astype(jnp.int32)
        keys = jnp.min(cand, axis=2)
        nidx = gidx * sel_group + j
    else:
        _, nidx = jax.lax.approx_min_k(
            jax.lax.bitcast_convert_type(od, jnp.float32), efk,
            recall_target=sel_target)
        keys = jnp.take_along_axis(od, nidx, axis=1)
    blk = nidx // ct
    lane = nidx % ct
    bi = blk * cb + (keys & (lsub - 1)) * ct + lane
    bi = jnp.where(keys < PACK_THRESH, bi, -1)
    if not rerank:
        shift = lsub.bit_length() - 1
        rank = (jnp.right_shift(keys, shift)
                - PACK_OFFSET // lsub - 127 * 127 * d).astype(jnp.float32)
        qn2 = jnp.sum(queries * queries, axis=1, keepdims=True)
        bd = jnp.where(bi >= 0, rank * denom + qn2, jnp.inf)
        bd, bi = jax.lax.sort((bd, bi), dimension=1, num_keys=2)
        return bd[:, :k], bi[:, :k]
    return rerank_exact(queries, points, bi, resolve(metric_name), k)


@functools.partial(
    jax.jit,
    static_argnames=("metric_name", "ef", "k", "lsub", "topt", "qb",
                     "cb", "inner", "rerank", "sel_target", "interpret",
                     "mode"))
def _fused_search_jit(queries, codes_t, scales_r, norms_r, points,
                      eligible, *, metric_name, ef, k, lsub, topt, qb,
                      cb, inner, rerank, sel_target=0.95, interpret=False,
                      mode="topt"):
    from ..ops.scan_kernel import fused_scan_bucket, fused_scan_topt

    is_dot = metric_name in ("dot", "cosine")
    qc, qs = _quantize_queries(queries)
    if metric_name == "cosine":
        # fold 1/|q| into the query scale (1/|p| lives in scales_r,
        # see _fused_arrays): prod approximates cos(q, p)
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=1))
        qs = qs / jnp.maximum(qn, 1e-30)
    if eligible is not None:
        npad = norms_r.shape[1] - eligible.shape[0]
        el = jnp.pad(eligible, (0, npad))
        norms_r = jnp.where(el[None, :], norms_r, jnp.inf)
    if mode == "bucket":
        od, oi = fused_scan_bucket(qc, qs[:, None], codes_t, scales_r,
                                   norms_r, lsub=lsub, qb=qb, cb=cb,
                                   inner=inner, is_dot=is_dot,
                                   interpret=interpret)
    else:
        od, oi = fused_scan_topt(qc, qs[:, None], codes_t, scales_r,
                                 norms_r, lsub=lsub, topt=topt, qb=qb,
                                 cb=cb, is_dot=is_dot,
                                 interpret=interpret)
    md, nidx = jax.lax.approx_min_k(od, min(ef, od.shape[1]),
                                    recall_target=sel_target)
    bi = jnp.take_along_axis(oi, nidx, axis=1)
    bi = jnp.where(jnp.isfinite(md), bi, -1)
    if not rerank:
        bd, bi = jax.lax.sort((md, bi), dimension=1, num_keys=2)
        bd, bi = bd[:, :k], bi[:, :k]
        # restore per-query constants so rerank=False values are in the
        # named metric's units (see _scan_search_jit): sq-L2 drops
        # |q|^2, cosine is -cos vs the metric's 1-cos, dot is exact
        if metric_name == "cosine":
            bd = jnp.where(jnp.isfinite(bd), bd + 1.0, bd)
        elif not is_dot:
            qn2 = jnp.sum(queries * queries, axis=1, keepdims=True)
            bd = jnp.where(jnp.isfinite(bd), bd + qn2, bd)
        return bd, bi
    return rerank_exact(queries, points, bi, resolve(metric_name), k)


class ScanIndex:
    """Quantized exhaustive-scan index (int8 MXU scoring + exact rerank).

    Ids are the original input order — there is no graph, hence no pid
    remap.  Supports values, tombstones and exact result filters.
    """

    def __init__(self, points, metric: str = "sqeuclidean",
                 chunk: int = 1 << 17,
                 values: Optional[Sequence[Any]] = None,
                 store_dtype: str = "float32"):
        if not isinstance(metric, str):
            raise ValueError(
                "ScanIndex needs a matmul-form metric name "
                "(sqeuclidean/euclidean/dot/cosine); use BruteForce for "
                "custom callables")
        # points are only read by the exact rerank (ef rows per query);
        # store_dtype="bfloat16" halves the dominant serving array at
        # the cost of bf16 resolution on the reranked distances
        # (ops/distance.py upcasts to f32 at the metric boundary).
        self.points = jnp.asarray(points, jnp.float32).astype(
            jnp.dtype(store_dtype))
        self._lanes_cache = None
        self.metric_name = metric
        n = self.points.shape[0]
        self.chunk = int(min(chunk, max(1, n)))
        self.codes, self.scales = quantize_points(self.points)
        deq = self.codes.astype(jnp.float32) * self.scales[:, None]
        self.norms = jnp.sum(deq * deq, axis=1)     # |p_hat|^2  [N]
        self.values = None if values is None else list(values)
        self._alive = None
        self._fused = None  # lazy transposed layout for the Pallas path
        self.config = Config(metric=metric)  # for API uniformity

    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              values=None, **kw) -> "ScanIndex":
        metric = config.metric if config is not None else "sqeuclidean"
        return cls(points, metric=metric, values=values, **kw)

    @classmethod
    def from_index(cls, index, **kw) -> "ScanIndex":
        """Build a scan-serving index from an existing Hnsw/HnswMap/
        PackedHnsw: same points (PID order — returned ids are pids, like
        the graph's), values and tombstones carried over.  Lets a
        deployment switch a built graph index to exhaustive-scan serving
        without touching the original vectors."""
        metric = index.config.metric
        if not isinstance(metric, str):
            raise ValueError("from_index needs a named matmul metric")
        obj = cls(index.points, metric=metric,
                  values=getattr(index, "values", None), **kw)
        alive = getattr(index, "_alive", None)
        if alive is not None:
            obj._alive = jnp.asarray(alive, bool)
        return obj

    def __len__(self) -> int:
        return int(self.points.shape[0])

    def nbytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize
                   for a in (self.points, self.codes, self.scales,
                             self.norms))

    # -- streaming ingestion ---------------------------------------------
    def add(self, new_points, values=None) -> np.ndarray:
        """Append points (exact streaming: the scan scores every row, so
        an append IS the index update — no graph surgery, no recall
        decay).  New rows are quantized with their own per-point scales
        and concatenated; the fused kernel layouts (transposed/padded)
        are invalidated and rebuilt lazily on the next fused search.
        Returns the new ids (input order, following the existing rows).
        """
        new_pts = jnp.asarray(new_points, jnp.float32)
        if new_pts.ndim == 1:
            new_pts = new_pts[None]
        if self.values is not None:
            if values is None or len(values) != len(new_pts):
                raise ValueError(
                    "values must match the number of new points")
        elif values is not None:
            raise ValueError("this index carries no values")
        n_old = len(self)
        codes, scales = quantize_points(new_pts)
        deq = codes.astype(jnp.float32) * scales[:, None]
        self.points = jnp.concatenate(
            [self.points, new_pts.astype(self.points.dtype)])
        self.codes = jnp.concatenate([self.codes, codes])
        self.scales = jnp.concatenate([self.scales, scales])
        self.norms = jnp.concatenate(
            [self.norms, jnp.sum(deq * deq, axis=1)])
        if self._alive is not None:
            self._alive = jnp.concatenate(
                [self._alive, jnp.ones(len(new_pts), bool)])
        if self.values is not None:
            self.values.extend(values)
        self._fused = None
        self._fused_int = None
        self.chunk = int(min(max(self.chunk, 1), len(self)))
        return np.arange(n_old, n_old + len(new_pts), dtype=np.int32)

    # -- tombstones / filters (exact here: excluded points are never
    #    scored into the candidate set) ------------------------------------
    def delete(self, ids) -> None:
        if self._alive is None:
            self._alive = jnp.ones(len(self), bool)
        idx = np.atleast_1d(np.asarray(ids, np.int64))
        if idx.size and (idx.min() < 0 or idx.max() >= len(self)):
            raise IndexError("id out of range")
        self._alive = self._alive.at[idx].set(False)

    def _eligible(self, filter_mask):
        eligible = self._alive
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, bool)
            if fm.shape != (len(self),):
                raise ValueError(
                    f"filter_mask must be [N]={len(self)}, got {fm.shape}")
            eligible = fm if eligible is None else (eligible & fm)
        return eligible

    def _points_lanes(self):
        """Rerank gather table, 128-lane zero-padded when D needs it: a
        compact [N, D%128!=0] argument makes every gathering program
        materialize a full (8,128)-tiled copy of the table (docs/
        performance.md round 4) — per BATCH here.  rerank_exact slices
        the gathered rows back to the queries' D, so results are
        identical.  Reuses ``self.points`` when already aligned."""
        d = self.points.shape[1]
        if d % 128 == 0:
            return self.points
        if (self._lanes_cache is None
                or self._lanes_cache.shape[0] != self.points.shape[0]):
            self._lanes_cache = jnp.pad(
                self.points, ((0, 0), (0, (-d) % 128)))
        return self._lanes_cache

    # -- fused Pallas path ---------------------------------------------------
    _FUSED_QB, _FUSED_CB = 256, 4096

    def _fused_arrays(self, cb: int, variant: str = "l2"):
        """Kernel-layout operand cache.  ``variant``:
        * "l2":     norms = |p_hat|^2 (+inf padding) — the kernel's
                    dist = |p|^2 - 2 q.p form.
        * "dot":    norms = 0 eligibility bias (+inf padding) — the
                    kernel's is_dot form dist = bias - q.p.
        * "cosine": like "dot", plus 1/|p_hat| folded into scales so
                    the matmul epilogue yields -cos directly.
        """
        if self._fused is None or self._fused[0] != (cb, variant):
            n = len(self)
            npad = (-n) % cb
            codes_t = jnp.pad(self.codes, ((0, npad), (0, 0))).T
            scales = self.scales
            if variant == "cosine":
                scales = scales * jax.lax.rsqrt(
                    jnp.maximum(self.norms, 1e-30))
            scales_r = jnp.pad(scales, (0, npad))[None, :]
            if variant == "l2":
                norms_r = jnp.pad(self.norms, (0, npad),
                                  constant_values=np.inf)[None, :]
            else:
                norms_r = jnp.pad(jnp.zeros(n, jnp.float32), (0, npad),
                                  constant_values=np.inf)[None, :]
            self._fused = ((cb, variant), jnp.asarray(codes_t), scales_r,
                           norms_r)
        return self._fused[1:]

    def _fused_int_arrays(self, cb: int):
        """Shared-scale layout for the int-epilogue kernel: ONE global
        point scale (vs per-point in ``codes``) so ranking needs no
        per-element scale multiply.  Resolution loss for small-norm
        points is repaired by the exact rerank.  Cached per padded
        length (dict): tuning tools interleave variants with different
        cb*inner, and a single-slot cache would rebuild the [D, N]
        transpose inside their timed regions."""
        cached = getattr(self, "_fused_int", None)
        if not isinstance(cached, dict):
            cached = {}
            self._fused_int = cached
        if cb not in cached:
            pts = jnp.asarray(self.points, jnp.float32)
            sg = jnp.maximum(jnp.max(jnp.abs(pts)), 1e-30) / 127.0
            codes_g = jnp.clip(jnp.round(pts / sg), -127,
                               127).astype(jnp.int8)
            deq = codes_g.astype(jnp.float32) * sg
            norms_g = jnp.sum(deq * deq, axis=1)
            n = len(self)
            npad = (-n) % cb
            codes_t = jnp.pad(codes_g, ((0, npad), (0, 0))).T
            norms_r = jnp.pad(norms_g, (0, npad),
                              constant_values=np.inf)[None, :]
            cached[cb] = (codes_t, norms_r, sg)
        return cached[cb]

    def search_batch(self, queries, k: int = 10, ef: Optional[int] = None,
                     rerank: bool = True, filter_mask=None,
                     approx_topk: bool = False, tile: int = 0,
                     fused=False, topt: int = 8, lsub: int = 16,
                     qb: int = 0, cb: int = 0, inner: int = 1,
                     slab: bool = False, sel_group: int = 0,
                     sel_kgroup: int = 0, sel_target: float = 0.95):
        """[B, D] -> (dists [B, k], ids [B, k]); ids = input order.

        ``ef`` is the rerank depth (how many scan candidates get exact
        distances); recall@k saturates around ef = 3-4x k.

        ``fused=True``/``"topt"``/``"bucket"``/``"bucket_int"`` routes
        through the Pallas fused-scan kernel (ops/scan_kernel.py): the
        MXU matmul and candidate selection run in one kernel, so the
        score matrix never reaches HBM — the fastest path for every
        named metric (sqeuclidean/euclidean/dot/cosine) on TPU.
        ``"bucket"`` emits all stride-group minima and does the top-ef
        in XLA (cheapest f32 kernel); ``"bucket_int"`` additionally
        collapses the epilogue to one int32 subtract via shared
        point/query scales (fastest; rerank repairs the shared-scale
        resolution loss; L2-only — dot/cosine fall back to "bucket").
        ``topt``/``lsub`` are the per-block candidate count and
        stride-group width, ``qb``/``cb`` override the kernel's
        query/point block sizes.  ``slab=True`` (bucket_pack only)
        selects the slab-loop kernel body — per-slab matmuls with the
        running min held in registers instead of materializing the
        full dot tile to VMEM (see ops/scan_kernel.py).
        ``sel_group=g`` (bucket_pack only) pre-reduces the kernel's key
        array with a bandwidth-bound g-wide column min before the
        approx_min_k selection (which otherwise dominates the
        non-kernel time); candidates become the top-ef distinct-group
        columns — a ~ef*g/(N/lsub) fraction of candidates can merge,
        which the exact rerank absorbs.
        ``sel_kgroup=g`` (bucket_pack only) moves that grouped min INTO
        the kernel (the keys are still in registers there): the kernel
        emits a second g-fold-smaller min array, approx_min_k selects
        over it, and only winner groups' key columns are gathered back
        — the full key array is written once and never re-read.  Same
        distinct-group candidate semantics as ``sel_group``; supersedes
        it when both are set.
        ``sel_target`` is ``approx_min_k``'s per-candidate recall
        target for the fused paths (XLA's default 0.95 drops ~5% of
        true candidates pre-rerank — the dominant recall loss in the
        fused variants; 0.99+ costs a lower selection reduction ratio).
        """
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or max(4 * k, 32)
        ef = int(min(ef, len(self)))
        k = int(min(k, ef))
        metric_name = self.metric_name
        cb = cb or self._FUSED_CB
        if fused and len(self) >= cb * inner:
            mode = fused if isinstance(fused, str) else "bucket"
            is_l2 = metric_name in ("sqeuclidean", "euclidean")
            if mode in ("bucket_int", "bucket_pack") and not is_l2:
                mode = "bucket"  # the shared-scale rank trick is L2-only
            if mode.startswith("bucket") and lsub == 16 \
                    and cb == self._FUSED_CB:
                lsub = 32  # measured best: 128-lane output tiles
            if (mode == "bucket_pack"
                    and queries.shape[1] * lsub > 16384):
                mode = "bucket_int"  # packed keys would overflow
            qb = qb or (512 if queries.shape[0] >= 512
                        else self._FUSED_QB)
            b = queries.shape[0]
            pad = (-b) % qb
            q = (jnp.concatenate(
                 [queries, jnp.broadcast_to(queries[:1],
                                            (pad, queries.shape[1]))])
                 if pad else queries)
            interp = jax.default_backend() == "cpu"
            if mode == "bucket_pack":
                codes_t, norms_r, sg = self._fused_int_arrays(cb * inner)
                d, i = _fused_int_packed_search_jit(
                    q, codes_t, norms_r, sg, self._points_lanes(),
                    self._eligible(filter_mask),
                    metric_name="sqeuclidean", ef=ef, k=k, lsub=lsub,
                    qb=qb, cb=cb, inner=inner, rerank=rerank,
                    slab=slab, sel_group=sel_group,
                    sel_kgroup=sel_kgroup, sel_target=sel_target,
                    interpret=interp)
            elif mode == "bucket_int":
                codes_t, norms_r, sg = self._fused_int_arrays(cb * inner)
                d, i = _fused_int_search_jit(
                    q, codes_t, norms_r, sg, self._points_lanes(),
                    self._eligible(filter_mask),
                    metric_name="sqeuclidean", ef=ef, k=k, lsub=lsub,
                    qb=qb, cb=cb, inner=inner, rerank=rerank,
                    sel_target=sel_target, interpret=interp)
            else:
                fm = "sqeuclidean" if is_l2 else metric_name
                codes_t, scales_r, norms_r = self._fused_arrays(
                    cb * inner, variant="l2" if is_l2 else fm)
                d, i = _fused_search_jit(
                    q, codes_t, scales_r, norms_r, self._points_lanes(),
                    self._eligible(filter_mask),
                    metric_name=fm, ef=ef, k=k, lsub=lsub,
                    topt=topt, qb=qb, cb=cb, inner=inner, rerank=rerank,
                    sel_target=sel_target, mode=mode, interpret=interp)
            if pad:
                d, i = d[:b], i[:b]
        else:
            d, i = _scan_search_jit(
                queries, self.codes, self.scales, self.norms,
                self._points_lanes(),
                self._eligible(filter_mask),
                metric_name=("sqeuclidean" if metric_name == "euclidean"
                             else metric_name),
                ef=ef, k=k, chunk=self.chunk, rerank=rerank,
                approx_topk=approx_topk, tile=tile)
        if metric_name == "euclidean":
            d = jnp.sqrt(jnp.maximum(d, 0.0))
        return d, i

    def search_batch_values(self, queries, k: int = 10,
                            ef: Optional[int] = None, filter_mask=None):
        if self.values is None:
            raise ValueError("this index carries no values")
        d, i = self.search_batch(queries, k, ef, filter_mask=filter_mask)
        idx = np.asarray(i)
        vals = [[self.values[j] if j >= 0 else None for j in row]
                for row in idx]
        return d, i, vals

    # -- persistence ---------------------------------------------------------
    def dump(self, fname: str) -> None:
        """Save the serving arrays (codes/scales/norms + f32 points for
        the exact rerank) as one npz."""
        import json

        arrays = dict(
            magic=np.array("instant-distance-tpu/scan/v1"),
            metric=np.array(self.metric_name),
            chunk=np.array(self.chunk, np.int64),
            points=np.asarray(self.points.astype(jnp.float32)),
            store_dtype=np.array(str(self.points.dtype)),
            codes=np.asarray(self.codes),
            scales=np.asarray(self.scales),
            norms=np.asarray(self.norms),
        )
        if self.values is not None:
            arrays["values"] = np.array(json.dumps(list(self.values)))
        if self._alive is not None:
            arrays["alive"] = np.asarray(self._alive, bool)
        with open(fname, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, fname: str) -> "ScanIndex":
        import json

        with np.load(fname, allow_pickle=False) as z:
            if str(z["magic"]) != "instant-distance-tpu/scan/v1":
                raise ValueError(f"{fname}: not a ScanIndex dump")
            obj = cls.__new__(cls)
            obj.metric_name = str(z["metric"])
            obj.chunk = int(z["chunk"])
            obj.points = jnp.asarray(z["points"])
            if "store_dtype" in z.files:
                obj.points = obj.points.astype(
                    jnp.dtype(str(z["store_dtype"])))
            obj.codes = jnp.asarray(z["codes"])
            obj.scales = jnp.asarray(z["scales"])
            obj.norms = jnp.asarray(z["norms"])
            obj.values = (json.loads(str(z["values"]))
                          if "values" in z.files else None)
            obj._alive = (jnp.asarray(z["alive"])
                          if "alive" in z.files else None)
            obj._fused = None
            obj._lanes_cache = None
            obj.config = Config(metric=obj.metric_name)
            return obj
