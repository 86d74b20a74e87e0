"""Query-data-parallel serving: replicated index, batch-sharded queries.

The complement of ``ShardedHnsw``: when a whole index fits in one chip's
HBM (SIFT1M at M=32 is ~1.3 GB), the highest-throughput serving mode
replicates the graph on every device and shards the *query batch* over
the mesh — no cross-device traffic at all (each device answers its slice
of the batch), giving linear QPS scaling.  This is parallelism the
reference can only get by running N processes; here it is one jit with
sharding annotations and XLA does the rest.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.hnsw import Hnsw
from .mesh import SHARD_AXIS, default_mesh


class ReplicatedHnsw:
    """A single-graph index served data-parallel over a mesh."""

    def __init__(self, index: Hnsw, mesh: Optional[Mesh] = None):
        self.mesh = mesh or default_mesh()
        self.config: Config = index.config
        repl = NamedSharding(self.mesh, P())
        self.points = jax.device_put(index.points, repl)
        self.zero = jax.device_put(index.zero, repl)
        self.layers = [jax.device_put(l, repl) for l in index.layers]
        #: values[pid] (when built from an HnswMap) and tombstones are
        #: snapshotted at construction time.
        self.values = list(index.values) if hasattr(index, "values") \
            else None
        self._alive = (None if index._alive is None
                       else jax.device_put(index._alive, repl))
        self._fns = {}

    def __len__(self) -> int:
        return int(self.points.shape[0])

    def _eligible(self, filter_mask):
        eligible = self._alive
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, bool)
            if fm.shape != (len(self),):
                raise ValueError(
                    f"filter_mask must be [N]={len(self)}, got {fm.shape}")
            eligible = fm if eligible is None else (eligible & fm)
        return eligible

    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              mesh: Optional[Mesh] = None, **kw) -> "ReplicatedHnsw":
        index, _ = Hnsw.build(points, config, **kw)
        return cls(index, mesh)

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, filter_mask=None):
        """Batched query with the batch axis sharded over the mesh.

        The batch must be divisible by the mesh size (pad with any
        vector and drop results otherwise).  ``filter_mask`` (bool [N],
        pid order) restricts results without affecting traversal.
        """
        from ..ops.beam import hnsw_search
        from ..ops.distance import resolve

        cfg = self.config
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n_dev = self.mesh.devices.size
        b = queries.shape[0]
        pad = (-b) % n_dev
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.broadcast_to(queries[:1],
                                           (pad, queries.shape[1]))])
        ef = ef or cfg.ef_search
        k = k or ef
        eligible = self._eligible(filter_mask)
        key = (ef, len(self.layers), eligible is not None)
        if key not in self._fns:
            metric = resolve(cfg.metric)
            qsh = NamedSharding(self.mesh, P(SHARD_AXIS, None))
            filtered = eligible is not None

            def local(q, fm, zero, points, *layers):
                return hnsw_search(
                    q, zero, layers, points, metric, ef=ef, m=cfg.m,
                    zero_links=cfg.m0,
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "search_expand", 1),
                    eligible=fm if filtered else None)

            n_graph_args = 2 + len(self.layers)
            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=((P(SHARD_AXIS, None), P())
                          + (P(),) * n_graph_args),
                out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
                check_vma=False))
            self._fns[key] = (fn, qsh)
        fn, qsh = self._fns[key]
        queries = jax.device_put(queries, qsh)
        fm = (jnp.ones(1, bool) if eligible is None else eligible)
        d, p = fn(queries, fm, self.zero, self.points, *self.layers)
        if pad:  # slicing across the shard axis needs host-side gather
            import numpy as np

            return np.asarray(d)[:b, :k], np.asarray(p)[:b, :k]
        return d[:, :k], p[:, :k]

    def search_batch_values(self, queries, k: Optional[int] = None,
                            ef: Optional[int] = None, filter_mask=None):
        """Batched query returning (dists, pids, values-nested-list)."""
        import numpy as np

        if self.values is None:
            raise ValueError("this index carries no values")
        d, p = self.search_batch(queries, k, ef, filter_mask=filter_mask)
        pn = np.asarray(p)
        vals = [[self.values[pid] if pid >= 0 else None for pid in row]
                for row in pn]
        return d, p, vals


class ReplicatedPackedHnsw:
    """Query-DP serving over a packed (inline-int8) index: the highest
    single-pod throughput mode — packed traversal per device, batch
    sharded, zero cross-device traffic."""

    def __init__(self, packed, mesh: Optional[Mesh] = None):
        from ..models.packed import PackedHnsw  # noqa: F401

        self.mesh = mesh or default_mesh()
        self.config = packed.config
        repl = NamedSharding(self.mesh, P())
        put = lambda t: tuple(jax.device_put(a, repl) for a in t)
        self.points = jax.device_put(packed.points, repl)
        self.zero_pack = put(packed.zero_pack)
        self.upper_packs = tuple(put(u) for u in packed.upper_packs)
        self.values = (None if getattr(packed, "values", None) is None
                       else list(packed.values))
        self._alive = (None if getattr(packed, "_alive", None) is None
                       else jax.device_put(packed._alive, repl))
        self._fns = {}

    __len__ = ReplicatedHnsw.__len__
    _eligible = ReplicatedHnsw._eligible
    search_batch_values = ReplicatedHnsw.search_batch_values

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, filter_mask=None):
        from ..ops.packed import packed_search
        from ..ops.distance import resolve

        cfg = self.config
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n_dev = self.mesh.devices.size
        b = queries.shape[0]
        pad = (-b) % n_dev
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.broadcast_to(queries[:1],
                                           (pad, queries.shape[1]))])
        ef = ef or cfg.ef_search
        k = k or min(10, ef)
        eligible = self._eligible(filter_mask)
        key = (ef, k, eligible is not None)
        if key not in self._fns:
            metric = resolve(cfg.metric)
            n_upper = len(self.upper_packs)
            filtered = eligible is not None

            def local(q, fm, points, *packs):
                zero_pack = tuple(packs[:3])
                uppers = tuple(tuple(packs[3 + 3 * i:6 + 3 * i])
                               for i in range(n_upper))
                return packed_search(
                    q, zero_pack, uppers, points, metric, ef=ef,
                    k=min(k, ef),
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "search_expand", 4),
                    eligible=fm if filtered else None)

            n_args = 1 + 3 + 3 * n_upper
            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=((P(SHARD_AXIS, None), P()) + (P(),) * n_args),
                out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
                check_vma=False))
            self._fns[key] = fn
        fn = self._fns[key]
        qsh = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        queries = jax.device_put(queries, qsh)
        flat = (*self.zero_pack,
                *(a for pack in self.upper_packs for a in pack))
        fm = (jnp.ones(1, bool) if eligible is None else eligible)
        d, p = fn(queries, fm, self.points, *flat)
        if pad:
            import numpy as np

            return np.asarray(d)[:b], np.asarray(p)[:b]
        return d, p
