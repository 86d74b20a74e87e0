"""StreamingHnsw: chunked ingestion over a compiled serving form.

The graph indices serve fastest from their compiled forms (PackedHnsw's
inline-quantized rows, ScanIndex's transposed int8 layout), but those
forms are immutable snapshots — recompiling them per add() would make
streaming ingestion O(N) per chunk.  The reference has no mutation API
at all (its index is frozen at build, SURVEY.md §5 / lib.rs: no
add/delete anywhere), so this is a beyond-parity capability designed
TPU-first:

  - ``add()`` inserts the chunk into the owned graph (zero-layer wave
    insertion, ops/construct.py:extend_graph) so graph quality keeps
    up, and tracks the rows newer than the serving snapshot as a
    PENDING SLAB;
  - ``search_batch()`` = compiled-form search over the snapshot merged
    with one exact MXU scan over the pending slab (slab shapes are
    padded to power-of-two buckets so streaming doesn't accumulate
    compiled programs);
  - ``compact()`` recompiles the serving form from the full graph and
    empties the slab; add() triggers it automatically once the slab
    outgrows ``repack_every`` rows.

Because the slab is scanned exactly, results over pending points are
exact — a just-added point is immediately and reliably findable
(read-your-writes), which no pure-graph streaming insert guarantees.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.distance import resolve
from .hnsw import Hnsw, HnswMap
from .packed import PackedHnsw
from .scan import ScanIndex


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _slab_search_jit(queries, slab, eligible, *, metric_name, k):
    """Exact top-k over the (padded) pending slab.

    ``eligible`` is False for padded rows and tombstoned/filtered
    points, so padding never leaks into results.  One [B, P] distance
    evaluation — the slab is small by construction (< repack_every).
    """
    metric = resolve(metric_name)
    d = metric.pairwise(queries, slab)                     # [B, P]
    d = jnp.where(eligible[None, :], d, jnp.inf)
    k = min(k, slab.shape[0])
    nd, ni = jax.lax.top_k(-d, k)
    ni = jnp.where(jnp.isfinite(nd), ni, -1)
    return -nd, ni


class StreamingHnsw:
    """A graph index plus compiled serving form with chunked add().

    ``serving`` picks the compiled form: "packed" (PackedHnsw — graph
    walk, cheap single queries) or "scan" (ScanIndex — exhaustive MXU
    scan, highest throughput).  All searches route pids/values of the
    owned graph, so ids are stable across compactions.
    """

    def __init__(self, graph, serving: str = "packed",
                 repack_every: int = 0, **serve_kw):
        if serving not in ("packed", "scan"):
            raise ValueError("serving must be 'packed' or 'scan'")
        self.graph = graph
        self.serving_mode = serving
        self.serve_kw = serve_kw
        self.repack_every = int(repack_every)
        self._compile()

    # -- construction ----------------------------------------------------
    @classmethod
    def build(cls, points, values=None, config: Optional[Config] = None,
              serving: str = "packed", repack_every: int = 0,
              **build_kw) -> "StreamingHnsw":
        if values is None:
            graph, _ = Hnsw.build(points, config, **build_kw)
        else:
            graph = HnswMap.build(points, values, config, **build_kw)
        return cls(graph, serving=serving, repack_every=repack_every)

    # -- sizes -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.graph)

    @property
    def n_pending(self) -> int:
        return len(self.graph) - self._snap_n

    @property
    def values(self):
        return getattr(self.graph, "values", None)

    def _auto_repack(self) -> int:
        if self.repack_every > 0:
            return self.repack_every
        # default: recompile once the slab reaches 1/8 of the snapshot
        # (slab scan cost stays a small fraction of the serving cost)
        return max(1024, self._snap_n // 8)

    # -- ingestion -----------------------------------------------------------
    def add(self, new_points, values=None) -> np.ndarray:
        """Insert a chunk: graph wave insertion + pending-slab tracking.
        Compacts automatically once the slab exceeds the re-pack
        threshold.  Returns the new PointIds."""
        if values is not None:
            pids = self.graph.add(new_points, values=values)
        else:
            pids = self.graph.add(new_points)
        if self.n_pending >= self._auto_repack():
            self.compact()
        return pids

    def delete(self, pids) -> None:
        self.graph.delete(pids)  # single source of truth: graph._alive

    def compact(self) -> None:
        """Recompile the serving form from the full graph; empties the
        pending slab.  O(N) — amortized across repack_every adds."""
        self._compile()

    def _compile(self) -> None:
        if self.serving_mode == "packed":
            self.serve = PackedHnsw.from_index(self.graph,
                                               **self.serve_kw)
        else:
            self.serve = ScanIndex.from_index(self.graph,
                                              **self.serve_kw)
        self._snap_n = len(self.graph)

    # -- search ----------------------------------------------------------
    def _slab_arrays(self, eligible):
        """Pending rows padded to a power-of-two bucket (bounds the
        number of distinct compiled slab programs at log2(repack))."""
        n, sn = len(self.graph), self._snap_n
        pend = jnp.asarray(self.graph.points[sn:n], jnp.float32)
        el = (jnp.ones(n - sn, bool) if eligible is None
              else jnp.asarray(eligible[sn:n], bool))
        bucket = 1 << max(5, int(np.ceil(np.log2(max(n - sn, 1)))))
        pad = bucket - (n - sn)
        if pad:
            pend = jnp.pad(pend, ((0, pad), (0, 0)))
            el = jnp.pad(el, (0, pad))  # False: padding is ineligible
        return pend, el

    def _graph_eligible(self, filter_mask):
        alive = self.graph._alive
        if filter_mask is None:
            return None if alive is None else np.asarray(alive)
        fm = np.asarray(filter_mask, bool)
        if fm.shape != (len(self.graph),):
            raise ValueError(
                f"filter_mask must be [N]={len(self.graph)}, "
                f"got {fm.shape}")
        return fm if alive is None else (fm & np.asarray(alive))

    def search_batch(self, queries, k: int = 10,
                     ef: Optional[int] = None, filter_mask=None, **kw):
        """[B, D] -> (dists [B, k], pids [B, k]): compiled-form search
        over the snapshot merged with an exact scan of the pending
        slab.  Extra kwargs pass through to the serving form (e.g.
        ``fused=`` for scan, ``entry_seeds=`` for packed)."""
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        eligible = self._graph_eligible(filter_mask)
        snap_mask = None if eligible is None else eligible[:self._snap_n]
        sd, si = self.serve.search_batch(
            queries, k=k, ef=ef, filter_mask=snap_mask, **kw)
        if self.n_pending == 0:
            return sd, si
        slab, el = self._slab_arrays(eligible)
        pd, pi = _slab_search_jit(
            queries, slab, el, metric_name=self.graph.config.metric, k=k)
        pi = jnp.where(pi >= 0, pi + self._snap_n, np.iinfo(np.int32).max)
        cd = jnp.concatenate([sd, pd], axis=1)
        ci = jnp.concatenate(
            [jnp.where(si >= 0, si, np.iinfo(np.int32).max), pi], axis=1)
        md, mi = jax.lax.sort((cd, ci), dimension=1, num_keys=2)
        mi = jnp.where(jnp.isfinite(md), mi, -1)
        return md[:, :k], mi[:, :k]

    # -- persistence -------------------------------------------------------
    def dump(self, fname: str) -> None:
        """Persist the owned graph (native npz).  The serving form is a
        compiled artifact — it recompiles from the graph on load."""
        self.graph.dump(fname)

    @classmethod
    def load(cls, fname: str, serving: str = "packed",
             repack_every: int = 0, **serve_kw) -> "StreamingHnsw":
        from ..utils import serialize

        graph = serialize.load(fname)
        return cls(graph, serving=serving, repack_every=repack_every,
                   **serve_kw)

    def search_batch_values(self, queries, k: int = 10,
                            ef: Optional[int] = None, filter_mask=None,
                            **kw):
        vals = self.values
        if vals is None:
            raise ValueError("this index carries no values")
        d, p = self.search_batch(queries, k, ef,
                                 filter_mask=filter_mask, **kw)
        pn = np.asarray(p)
        out = [[vals[pid] if pid >= 0 else None for pid in row]
               for row in pn]
        return d, p, out
