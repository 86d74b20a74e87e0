"""Public index API: ``Hnsw``, ``HnswMap``, ``Search``, ``Neighbor``.

Mirrors the reference's API surface — the Rust crate root types
(instant-distance/src/lib.rs: Builder, Hnsw, HnswMap, Search, Item,
MapItem, PointId) and the Python binding classes (instant-distance-py
src/lib.rs: Hnsw, HnswMap, Search, Config, Heuristic, Neighbor) — with
TPU-native extensions: ``search_batch`` for thousands of concurrent
queries per device step, pluggable metrics, and device-resident dense
graph storage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.beam import hnsw_search
from ..ops.construct import BuiltGraph, build_graph
from ..ops.distance import resolve


@functools.partial(jax.jit,
                   static_argnames=("metric_name", "ef", "m", "zero_links",
                                    "max_iter_factor", "expand",
                                    "entry_seeds"))
def _search_jit(queries, zero, upper, points, eligible, *, metric_name, ef,
                m, zero_links, max_iter_factor, expand, entry_seeds=0):
    return hnsw_search(queries, zero, upper, points, resolve(metric_name),
                       ef=ef, m=m, zero_links=zero_links,
                       max_iter_factor=max_iter_factor, expand=expand,
                       eligible=eligible, entry_seeds=entry_seeds)


@dataclasses.dataclass
class Neighbor:
    """One search result (reference py src/lib.rs:327-357).

    ``value`` is None for plain ``Hnsw`` results, matching the binding's
    ``Neighbor { value: py.None() }`` behavior.  ``point`` resolves the
    point vector itself lazily (reference ``Item.point`` /
    ``MapItem.point``, instant-distance/src/lib.rs:399-413) — lazy so
    iterating results doesn't pay a device->host readback per hit.
    """

    distance: float
    pid: int
    value: Any = None
    #: Index backing the lazy ``point`` lookup (not part of repr/eq).
    _index: Any = dataclasses.field(default=None, repr=False,
                                    compare=False)

    @property
    def point(self) -> Optional[np.ndarray]:
        """The result's point vector (``index[pid]``), or None when the
        result was built without a backing index."""
        if self._index is None:
            return None
        return self._index[self.pid]

    def __repr__(self) -> str:
        if self.value is None:
            return (f"instant_distance.Item(distance={self.distance}, "
                    f"pid={self.pid})")
        return (f"instant_distance.Neighbor(distance={self.distance}, "
                f"pid={self.pid}, value={self.value!r})")


# Item/MapItem aliases for Rust-API users (lib.rs:175-191, 399-413).
Item = Neighbor
MapItem = Neighbor


class Search:
    """Search buffer and result set (reference py src/lib.rs:159-209).

    Holds the results of the most recent ``search`` call; iterate it to
    get ``Neighbor``s.  In the reference this owns reusable scratch
    buffers; on TPU the scratch is device memory managed by XLA, so this
    object only carries results — but the reuse-API shape is preserved.
    """

    def __init__(self) -> None:
        self._dists: Optional[np.ndarray] = None
        self._pids: Optional[np.ndarray] = None
        self._index: Optional["Hnsw"] = None
        self._map: Optional["HnswMap"] = None
        self._cur = 0

    def _arm(self, dists, pids, index=None, map_=None):
        self._dists, self._pids = dists, pids
        self._index, self._map = index, map_
        self._cur = 0

    def __iter__(self) -> "Search":
        self._cur = 0
        return self

    def __next__(self) -> Neighbor:
        while True:
            if self._pids is None or self._cur >= len(self._pids):
                raise StopIteration
            pid = int(self._pids[self._cur])
            dist = float(self._dists[self._cur])
            self._cur += 1
            if pid >= 0:
                break
        value = self._map.values[pid] if self._map is not None else None
        return Neighbor(dist, pid, value,
                        self._map if self._map is not None else self._index)

    def __len__(self) -> int:
        if self._pids is None:
            return 0
        return int((self._pids >= 0).sum())


def _check_points(arr, what: str, dim: Optional[int] = None):
    """API-boundary shape validation (reference FloatArray::try_from,
    py src/lib.rs:363-376 rejects wrong-dimension points with a clear
    error instead of a deep XLA broadcast failure)."""
    if arr.ndim != 2:
        raise ValueError(
            f"{what} must be a [N, D] 2-D array, got shape {tuple(arr.shape)}")
    if dim is not None and arr.shape[0] and arr.shape[1] != dim:
        raise ValueError(
            f"{what} dim {arr.shape[1]} != index dim {dim}")
    return arr


class Hnsw:
    """Immutable HNSW index (reference lib.rs:193-397).

    Dense TPU-native storage: ``points`` [N, D] float32, ``zero`` [N, M*2]
    int32 adjacency, ``layers`` list of [end_l, M] upper-layer snapshots
    (layers[l-1] = level l, exactly the reference's layout for
    serialization parity).
    """

    def __init__(self, points, zero, layers, config: Config, alive=None):
        # Storage dtype is configurable (Config.dtype: "float32" or
        # "bfloat16" — halves HBM for the point table); every distance
        # is still evaluated in f32 (ops/distance.py upcasts at the
        # metric boundary).
        self.points = jnp.asarray(points, jnp.dtype(config.dtype))
        self.zero = jnp.asarray(zero, jnp.int32)
        self.layers = [jnp.asarray(l, jnp.int32) for l in layers]
        self.config = config
        self.metric = resolve(config.metric)
        #: Tombstone mask, bool [N]; None = nothing deleted.  Deleted
        #: points keep routing traffic through their edges (standard
        #: tombstone semantics) but never appear in results.
        self._alive = None if alive is None else jnp.asarray(alive, bool)
        #: Neighbor-distance cache [N+1, m0] kept only while incremental
        #: adds are in use (reverse-edge re-selection needs it).
        self._adjd = None
        #: Reverse-edge additions lost to per-wave pend_cap overflow
        #: during build (0 = the batched commit was lossless; see
        #: Config.pend_cap and ops/construct._group_reverse_edges).
        self.reverse_drops = 0

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, points, config: Optional[Config] = None, *,
              progress=None, backend: str = "wave",
              checkpoint: Optional[str] = None,
              checkpoint_every: int = 64
              ) -> tuple["Hnsw", np.ndarray]:
        """Build the index; returns (index, ids) where ids maps the
        original point order to PointIds (reference lib.rs:83-85 and the
        binding's Hnsw.build, py src/lib.rs:110-119).

        ``backend``: "wave" = TPU batched insertion waves (default);
        "native" = the multithreaded C++ host engine (useful when no
        accelerator is attached; same construction recipe).
        """
        config = config or Config()
        # shape-only check: np.shape works on arrays and nested lists
        # without materializing a dtype-converted copy of the dataset
        shape = np.shape(points)
        if len(shape) != 2:
            raise ValueError(
                f"points must be a [N, D] 2-D array, got shape {shape}")
        if backend == "native":
            from ..native import NativeHnsw

            eng = NativeHnsw.build(points, config)
            pts, ids, zero, layers = eng.to_arrays(config.m)
            return cls(pts, zero, layers, config), ids
        g: BuiltGraph = build_graph(points, config, progress=progress,
                                    checkpoint=checkpoint,
                                    checkpoint_every=checkpoint_every)
        index = cls(g.points, g.zero, g.layers, config)
        index.reverse_drops = g.reverse_drops
        return index, g.ids

    # -- incremental updates (beyond the reference: its index is immutable
    #    after build, SURVEY.md §5 "no add/delete API anywhere") -----------
    def add(self, new_points, *, progress=None) -> np.ndarray:
        """Append points to a built index (zero-layer wave insertion).

        New points are inserted at layer 0 with the same search/select/
        commit recipe as construction waves; the upper-layer skeleton is
        frozen (it only routes, so quality degrades slowly — rebuild when
        the index has grown by ~2x or more).  Returns the new PointIds.
        """
        from ..ops.construct import extend_graph

        new_pts = np.asarray(new_points, np.float32)
        if new_pts.ndim == 1:
            new_pts = new_pts[None]
        _check_points(new_pts, "new points", self.points.shape[1])
        n_old = len(self)
        pts, zero, adjd = extend_graph(
            self.points, self.zero, self.layers, new_pts, self.config,
            adjd=self._adjd, progress=progress)
        self.points = pts.astype(jnp.dtype(self.config.dtype))
        self.zero, self._adjd = zero, adjd
        if self._alive is not None:
            self._alive = jnp.concatenate(
                [self._alive, jnp.ones(len(new_pts), bool)])
        return np.arange(n_old, n_old + len(new_pts), dtype=np.int32)

    def delete(self, pids) -> None:
        """Tombstone points: excluded from all future results, but their
        edges keep routing traffic (delete-by-mask, no graph surgery)."""
        if self._alive is None:
            self._alive = jnp.ones(len(self), bool)
        idx = np.atleast_1d(np.asarray(pids, np.int64))
        if idx.size and (idx.min() < 0 or idx.max() >= len(self)):
            raise IndexError("pid out of range")
        self._alive = self._alive.at[idx].set(False)

    def is_deleted(self, pid: int) -> bool:
        return self._alive is not None and not bool(self._alive[pid])

    @property
    def n_deleted(self) -> int:
        if self._alive is None:
            return 0
        return int((~np.asarray(self._alive)).sum())

    # -- queries -----------------------------------------------------------
    def _eligible(self, filter_mask):
        """Combine the tombstone mask and a per-call filter into the
        result-eligibility array (None if unrestricted)."""
        eligible = self._alive
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, bool)
            if fm.shape != (len(self),):
                raise ValueError(
                    f"filter_mask must be [N]={len(self)}, got {fm.shape}")
            eligible = fm if eligible is None else (eligible & fm)
        return eligible

    def _run_search(self, queries, ef, eligible=None):
        cfg = self.config
        return _search_jit(
            queries, self.zero, tuple(reversed(self.layers)), self.points,
            eligible,
            metric_name=(cfg.metric if isinstance(cfg.metric, str)
                         else cfg.metric),
            ef=ef, m=cfg.m, zero_links=cfg.m0,
            max_iter_factor=cfg.max_iter_factor,
            expand=getattr(cfg, "search_expand", 1),
            entry_seeds=min(getattr(cfg, "entry_seeds", 0), len(self)))

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, filter_mask=None):
        """TPU-native batched query: [B, D] -> (dists [B, k], pids [B, k]).

        The reference searches one query at a time (lib.rs:352-383); on
        TPU, B queries traverse the graph together as one wavefront.

        ``filter_mask`` (bool [N], pid order): only mask-true points may
        appear in results; traversal still routes through the rest
        (filtered ANN).  Combined with the tombstone mask if any.
        """
        queries = jnp.asarray(queries, jnp.float32)
        single = queries.ndim == 1
        if single:
            queries = queries[None]
        _check_points(queries, "queries", self.points.shape[1])
        ef = ef or self.config.ef_search
        k = k or ef
        if k > ef:
            raise ValueError(f"k={k} > ef={ef}")
        d, p = self._run_search(queries, ef, self._eligible(filter_mask))
        return d[:, :k], p[:, :k]

    def search(self, point, search: Search) -> Iterator[Neighbor]:
        """Single-query API parity (py src/lib.rs:146-156): fills and
        arms the ``Search``; returns an iterator over it."""
        if len(self.points) == 0:
            search._arm(np.zeros(0, np.float32), np.zeros(0, np.int32),
                        index=self)
            return iter(search)
        d, p = self.search_batch(jnp.asarray(point, jnp.float32))
        search._arm(np.asarray(d[0]), np.asarray(p[0]), index=self)
        return iter(search)

    # -- introspection (lib.rs:386-396, types.rs:269-275) ------------------
    def __len__(self) -> int:
        return int(self.points.shape[0])

    def __getitem__(self, pid: int):
        return np.asarray(self.points[pid])

    def iter(self):
        pts = np.asarray(self.points)
        return ((i, pts[i]) for i in range(len(pts)))

    def get(self, i: int, search: Search) -> Optional[Neighbor]:
        if search._pids is None or i >= len(search._pids):
            return None
        pid = int(search._pids[i])
        if pid < 0:
            return None
        return Neighbor(float(search._dists[i]), pid, None, self)

    # -- persistence -------------------------------------------------------
    def dump(self, fname: str, format: str = "native") -> None:
        from ..utils import serialize

        serialize.dump(self, fname, format=format)

    @classmethod
    def load(cls, fname: str, format: str = "auto", **kw) -> "Hnsw":
        """Load a dumped index.  Extra kwargs go to the format loader —
        for headerless bincode with a non-reference shape pass
        ``dims=``/``m=`` (utils/serialize.load_bincode)."""
        from ..utils import serialize

        obj = serialize.load(fname, format=format, **kw)
        if not isinstance(obj, Hnsw) or isinstance(obj, HnswMap):
            raise ValueError(f"{fname} does not contain a plain Hnsw")
        return obj


class HnswMap(Hnsw):
    """Hnsw with values attached to points (reference lib.rs:130-191).

    ``values`` are reordered into PointId order at build time
    (lib.rs:141-152), so ``values[pid]`` is the value for point ``pid``.
    """

    def __init__(self, points, zero, layers, config, values: Sequence):
        super().__init__(points, zero, layers, config)
        self.values = list(values)

    @classmethod
    def build(cls, points, values, config: Optional[Config] = None, *,
              progress=None, backend: str = "wave",
              checkpoint: Optional[str] = None) -> "HnswMap":
        if len(points) != len(values):
            raise ValueError("points and values must have the same length")
        config = config or Config()
        hnsw, ids = Hnsw.build(points, config, progress=progress,
                               backend=backend, checkpoint=checkpoint)
        # reorder values into PointId order (lib.rs:141-152): ids[src]=pid
        reordered = [None] * len(values)
        for src, pid in enumerate(ids):
            reordered[pid] = values[src]
        return cls(hnsw.points, hnsw.zero, hnsw.layers, config, reordered)

    def add(self, new_points, values=None, *, progress=None) -> np.ndarray:
        """Append (point, value) pairs; returns the new PointIds."""
        new_pts = np.asarray(new_points, np.float32)
        if new_pts.ndim == 1:
            new_pts = new_pts[None]
        if values is None or len(values) != len(new_pts):
            raise ValueError("values must match the number of new points")
        pids = super().add(new_pts, progress=progress)
        self.values.extend(values)  # new pids are appended in order
        return pids

    def search(self, point, search: Search) -> Iterator[Neighbor]:
        if len(self.points) == 0:
            search._arm(np.zeros(0, np.float32), np.zeros(0, np.int32),
                        map_=self)
            return iter(search)
        d, p = self.search_batch(jnp.asarray(point, jnp.float32))
        search._arm(np.asarray(d[0]), np.asarray(p[0]), map_=self)
        return iter(search)

    def search_batch_values(self, queries, k: Optional[int] = None):
        """Batched query returning (dists, pids, values-nested-list)."""
        d, p = self.search_batch(queries, k)
        pn = np.asarray(p)
        vals = [[self.values[pid] if pid >= 0 else None for pid in row]
                for row in pn]
        return d, p, vals

    def get(self, i: int, search: Search) -> Optional[Neighbor]:
        item = super().get(i, search)
        if item is not None:
            item.value = self.values[item.pid]
        return item

    @classmethod
    def load(cls, fname: str, format: str = "auto", **kw) -> "HnswMap":
        """Load a dumped map (see :meth:`Hnsw.load` for kwargs)."""
        from ..utils import serialize

        obj = serialize.load(fname, format=format, **kw)
        if not isinstance(obj, HnswMap):
            raise ValueError(f"{fname} does not contain an HnswMap")
        return obj
