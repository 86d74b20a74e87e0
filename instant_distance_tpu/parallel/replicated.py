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
        self._fns = {}

    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              mesh: Optional[Mesh] = None, **kw) -> "ReplicatedHnsw":
        index, _ = Hnsw.build(points, config, **kw)
        return cls(index, mesh)

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None):
        """Batched query with the batch axis sharded over the mesh.

        The batch must be divisible by the mesh size (pad with any
        vector and drop results otherwise).
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
        key = (ef, len(self.layers))
        if key not in self._fns:
            metric = resolve(cfg.metric)
            qsh = NamedSharding(self.mesh, P(SHARD_AXIS, None))

            def local(q, zero, points, *layers):
                return hnsw_search(
                    q, zero, layers, points, metric, ef=ef, m=cfg.m,
                    zero_links=cfg.m0,
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "search_expand", 1))

            n_graph_args = 2 + len(self.layers)
            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(SHARD_AXIS, None),) + (P(),) * n_graph_args,
                out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
                check_vma=False))
            self._fns[key] = (fn, qsh)
        fn, qsh = self._fns[key]
        queries = jax.device_put(queries, qsh)
        d, p = fn(queries, self.zero, self.points, *self.layers)
        if pad:  # slicing across the shard axis needs host-side gather
            import numpy as np

            return np.asarray(d)[:b, :k], np.asarray(p)[:b, :k]
        return d[:, :k], p[:, :k]
