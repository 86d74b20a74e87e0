"""Exact (brute-force) nearest-neighbor search.

The reference computes ground truth with an ad-hoc exact scan in its
randomized recall tests (instant-distance/tests/all.rs:63-70).  On TPU the
exact scan *is* a first-class model: one big MXU distance matmul + top-k,
chunked over the point axis so arbitrarily large sets stream through HBM.
Used for ground truth in our test/bench harness and as an exact fallback
index for small N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import resolve


@functools.partial(jax.jit, static_argnames=("k", "metric_name", "chunk"))
def _search_jit(queries, points, *, k, metric_name, chunk):
    metric = resolve(metric_name)
    n = points.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def body(carry, i):
        best_d, best_i = carry
        block = jax.lax.dynamic_slice_in_dim(pts, i * chunk, chunk, axis=0)
        d = metric.pairwise(queries, block)  # [B, chunk]
        ids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(ids < n, d, jnp.inf)
        # per-chunk top-k (cheap) then a tiny 2k-wide 2-key merge sort by
        # (distance, id) — the reference's Candidate ordering
        # (types.rs:229-234)
        nd, nidx = jax.lax.top_k(-d, k)
        ni = jnp.take_along_axis(ids, nidx, axis=1)
        cat_d = jnp.concatenate([best_d, -nd], axis=1)
        cat_i = jnp.concatenate([best_i, ni], axis=1)
        sd, si = jax.lax.sort((cat_d, cat_i), dimension=1, num_keys=2)
        return (sd[:, :k], si[:, :k]), None

    b = queries.shape[0]
    init = (jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), np.iinfo(np.int32).max, jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i


class BruteForce:
    """Exact k-NN index over a fixed point set."""

    def __init__(self, points, metric="sqeuclidean", chunk: int = 16384):
        self.points = jnp.asarray(points, jnp.float32)
        self.metric = resolve(metric)
        self.chunk = int(min(chunk, max(1, self.points.shape[0])))

    #: Tables larger than this many bytes stream through bounded outer
    #: slices (one compiled program over the whole table pads + stages
    #: tiled copies of it — RESOURCE_EXHAUSTED at [10M, 96] next to a
    #: freshly built index's ~9 GB of resident arrays).
    OUTER_BYTES = 1 << 30

    def _metric_arg(self):
        return (self.metric.name
                if self.metric.name in ("sqeuclidean", "euclidean",
                                        "dot", "cosine")
                else self.metric.fn)

    def search_batch(self, queries, k: int):
        """Exact top-k for a [B, D] query batch -> (dists [B,k], ids [B,k])."""
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n, d = self.points.shape
        k = int(min(k, n))
        if n * d * 4 <= self.OUTER_BYTES:
            return _search_jit(queries, self.points, k=k,
                               metric_name=self._metric_arg(),
                               chunk=self.chunk)
        # streaming path: per-slice exact top-k with a host-side
        # (dist, id) lexicographic merge.  Each slice dispatch is
        # sequenced by its [B, k] readback, so peak extra HBM is one
        # table slice + its program temps (~2 GB) regardless of N.
        outer = max(self.chunk, (self.OUTER_BYTES // (d * 4) //
                                 self.chunk) * self.chunk)
        parts_d, parts_i = [], []
        for cs in range(0, n, outer):
            ce = min(cs + outer, n)
            sd, si = _search_jit(queries, self.points[cs:ce], k=k,
                                 metric_name=self._metric_arg(),
                                 chunk=min(self.chunk, ce - cs))
            sd, si = np.asarray(sd), np.asarray(si)
            parts_d.append(sd)
            parts_i.append(np.where(si >= 0, si + cs, -1))
        cd = np.concatenate(parts_d, axis=1)
        ci = np.concatenate(parts_i, axis=1)
        order = np.lexsort((ci, cd), axis=1)[:, :k]
        return (jnp.asarray(np.take_along_axis(cd, order, axis=1)),
                jnp.asarray(np.take_along_axis(ci, order, axis=1)))
