"""Latency-routed serving: small batches on the host, big ones on TPU.

The reference's native habitat is ONE query at a time — ``Hnsw::search``
is a synchronous, single-threaded call with ~1-2 ms latency on a host
core (instant-distance/src/lib.rs:352-383).  The TPU paths in this
framework are throughput engines: a batched device step amortizes over
hundreds-to-thousands of queries, but a batch of one still pays the full
dispatch + device round-trip (tens of ms through a relay; ~100 us on a
real TPU host — still slower than a warm host beam search for B=1).

``HybridIndex`` closes that gap by routing per call:

* ``B < threshold``  -> the native C++ host engine (``native/cpu.py``),
  searching the SAME graph (lifted once via ``NativeHnsw.from_arrays``),
  one sequential beam per query — reference-equivalent latency.
* ``B >= threshold`` -> the TPU batched path (the wrapped index's
  ``search_batch``; pass a ``ScanIndex``/``PackedHnsw`` for the fastest
  large-batch engines).

The two paths search the same vectors with the same metric, so results
agree up to HNSW's usual approximation (both walk graphs; the host walks
the identical graph when the wrapped index is an ``Hnsw``).

Operating envelope (see docs/guide.md "Single-query and small-batch
latency"): host p50 ~1.7 ms/query at SIFT1M (measured, bench.py);
TPU fused scan ~15-25 ms per 8k batch.  The breakeven batch is
``tpu_batch_seconds / host_query_seconds`` — ``calibrate()`` measures
both on live traffic shapes and sets ``threshold`` accordingly.

Tombstones and ``filter_mask`` are TPU-path features; calls carrying a
filter always route to the device path regardless of batch size.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class HybridIndex:
    """Route small batches to the host engine, large ones to the TPU.

    Args:
      index: a built ``Hnsw``/``HnswMap`` (the graph both paths serve).
      tpu_index: optional faster large-batch engine (``ScanIndex``,
        ``PackedHnsw``, ...); defaults to ``index`` itself.
      threshold: route batches strictly smaller than this to the host.
        Default 128 (conservative for a real TPU host; ``calibrate()``
        measures the true breakeven on this machine).
      ef: default search width for both paths (index config's ef_search
        if None).
      host_threads: OpenMP threads for host batches (1 = the reference's
        sequential model; 0 = all cores).
      host_engine: a prebuilt ``NativeHnsw`` over the same graph; skips
        the one-time device->host lift (useful when the caller already
        holds one, e.g. bench.py's baseline engine).
    """

    def __init__(self, index, tpu_index=None, *, threshold: int = 128,
                 ef: Optional[int] = None, host_threads: int = 1,
                 host_engine=None):
        from ..native import NativeHnsw, available

        self.index = index
        self.tpu_index = tpu_index if tpu_index is not None else index
        self.threshold = int(threshold)
        self.ef = int(ef or index.config.ef_search)
        self.host_threads = int(host_threads)
        self._host = host_engine
        if self._host is None and available():
            metric = index.config.metric
            if isinstance(metric, str):
                # one-time host lift of the device graph (N*(D+2M)*4 B)
                self._host = NativeHnsw.from_arrays(
                    np.asarray(index.points, np.float32),
                    np.asarray(index.zero),
                    [np.asarray(l) for l in index.layers],
                    metric, index.config.m)
        # Snapshot size at lift time: later Hnsw.add/extend mutates the
        # device graph but not the lifted host copy — _host_stale()
        # routes such calls to the device instead of silently serving a
        # graph missing the new points.
        self._host_n = len(index) if self._host is not None else 0

    @property
    def host_available(self) -> bool:
        return self._host is not None

    def _has_tombstones(self) -> bool:
        return getattr(self.index, "_alive", None) is not None

    def _host_stale(self) -> bool:
        """True when the index grew/shrank after the one-time host lift
        (Hnsw.add/extend): the host copy would miss the new points."""
        try:
            return len(self.index) != self._host_n
        except TypeError:
            return False

    def search_batch(self, queries, k: int = 10,
                     ef: Optional[int] = None, filter_mask=None):
        """[B, D] -> (dists [B, k], ids [B, k]), routed by B.

        Returns numpy arrays from the host path and device arrays from
        the TPU path; both are row-per-query (dist, id) sorted ascending.
        """
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        ef_ = int(ef or self.ef)
        use_host = (self._host is not None
                    and q.shape[0] < self.threshold
                    and filter_mask is None
                    and not self._has_tombstones()
                    and not self._host_stale())
        if use_host:
            d, i = self._host.search_batch(q, ef=max(ef_, k), k=k,
                                           n_threads=self.host_threads)
            return d, i
        kw = {}
        if filter_mask is not None:
            kw["filter_mask"] = filter_mask
        return self.tpu_index.search_batch(q, k=k, ef=ef_, **kw)

    def search(self, point, search) -> "iter":
        """Single-query parity API (fills a ``Search``, returns its
        iterator) — B=1, so this is the host path when available."""
        d, i = self.search_batch(np.asarray(point, np.float32)[None],
                                 k=self.ef)
        map_ = self.index if hasattr(self.index, "values") else None
        search._arm(np.asarray(d[0]), np.asarray(i[0]),
                    index=None if map_ is not None else self.index,
                    map_=map_)
        return iter(search)

    def calibrate(self, sample_queries, k: int = 10,
                  ef: Optional[int] = None, iters: int = 8) -> int:
        """Measure both paths and set ``threshold`` to the breakeven
        batch size (host per-query seconds vs TPU per-batch seconds on
        ``sample_queries``-shaped traffic).  Returns the new threshold.
        """
        if self._host is None:
            self.threshold = 0
            return 0
        q = np.asarray(sample_queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        ef_ = int(ef or self.ef)
        # host: sequential per-query median
        lat = []
        for i in range(min(len(q), 16)):
            t0 = time.perf_counter()
            self._host.search_batch(q[i:i + 1], ef=max(ef_, k), k=k,
                                    n_threads=1)
            lat.append(time.perf_counter() - t0)
        host_s = float(np.median(lat))
        # tpu: small batches are dispatch-bound, large ones
        # throughput-bound — a single full-batch measurement would
        # overestimate the breakeven and route mid-size batches to the
        # slower host path.  Model t(B) = intercept + slope*B from two
        # batch sizes; host wins while host_s*B < intercept + slope*B.
        from ..utils.metrics import time_fn

        def tpu_s(batch):
            return time_fn(lambda x: self.tpu_index.search_batch(
                               x, k=k, ef=ef_), batch,
                           warmup=2, iters=iters).per_call_s

        b_small = min(32, len(q))
        t_small = tpu_s(q[:b_small])
        if len(q) > b_small:
            t_full = tpu_s(q)
            slope = max(0.0, (t_full - t_small) / (len(q) - b_small))
        else:
            slope = 0.0
        intercept = max(0.0, t_small - slope * b_small)
        if host_s <= slope:       # host beats TPU marginal cost: always host
            self.threshold = 1 << 20
        else:
            self.threshold = max(1, int(np.ceil(
                intercept / (host_s - slope))))
        return self.threshold
