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
        key = (ef, len(self.layers), eligible is not None,
               getattr(cfg, "entry_seeds", 0))
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
                    eligible=fm if filtered else None,
                    entry_seeds=min(getattr(cfg, "entry_seeds", 0),
                                    points.shape[0]))

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


class ReplicatedScanIndex:
    """Query-DP serving over the quantized exhaustive scan: codes are
    replicated on every device, the query batch is sharded — linear QPS
    scaling of the single-chip scan (fused-kernel or XLA streamed) with
    zero cross-device result traffic (each device fully answers its own
    queries).  Complements ShardedScanIndex, which shards *points* for
    indices larger than one chip's HBM."""

    def __init__(self, scan, mesh: Optional[Mesh] = None):
        from ..models.scan import ScanIndex  # noqa: F401

        self.mesh = mesh or default_mesh()
        self.config = scan.config
        self.metric_name = scan.metric_name
        self.chunk = scan.chunk
        repl = NamedSharding(self.mesh, P())
        self.points = jax.device_put(scan.points, repl)
        self.codes = jax.device_put(scan.codes, repl)
        self.scales = jax.device_put(scan.scales, repl)
        self.norms = jax.device_put(scan.norms, repl)
        self.values = (None if scan.values is None else list(scan.values))
        self._alive = (None if scan._alive is None
                       else jax.device_put(scan._alive, repl))
        self._fused = None
        self._fns = {}

    def __len__(self) -> int:
        return int(self.points.shape[0])

    _eligible = ReplicatedHnsw._eligible
    search_batch_values = ReplicatedHnsw.search_batch_values

    def _fused_arrays(self, cb: int, variant: str = "l2"):
        """Replicated kernel layout; ``variant`` mirrors
        ScanIndex._fused_arrays ("l2" | "dot" | "cosine" — the latter
        two zero the norms into the is_dot eligibility bias, cosine
        also folds 1/|p_hat| into the scales)."""
        if self._fused is None or self._fused[0] != (cb, variant):
            n = len(self)
            npad = (-n) % cb
            repl = NamedSharding(self.mesh, P())
            ct = jax.device_put(
                jnp.pad(self.codes, ((0, npad), (0, 0))).T, repl)
            scales = self.scales
            if variant == "cosine":
                scales = scales * jax.lax.rsqrt(
                    jnp.maximum(self.norms, 1e-30))
            sr = jax.device_put(
                jnp.pad(scales, (0, npad))[None, :], repl)
            import numpy as np
            base = (self.norms if variant == "l2"
                    else jnp.zeros_like(self.norms))
            nr = jax.device_put(
                jnp.pad(base, (0, npad),
                        constant_values=np.inf)[None, :], repl)
            self._fused = ((cb, variant), ct, sr, nr)
        return self._fused[1:]

    def search_batch(self, queries, k: int = 10, ef: Optional[int] = None,
                     filter_mask=None, fused=False, qb: int = 0,
                     cb: int = 4096, lsub: int = 32,
                     approx_topk: bool = True):
        """[B, D] -> (dists [B, k], ids [B, k]); B sharded over devices."""
        from ..models.scan import (_quantize_queries, rerank_exact,
                                   scan_candidates)
        from ..ops.distance import resolve

        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n = len(self)
        ef = int(min(ef or max(4 * k, 32), n))
        k = int(min(k, ef))
        metric_name = ("sqeuclidean" if self.metric_name == "euclidean"
                       else self.metric_name)
        fused = (bool(fused) and n >= cb
                 and metric_name in ("sqeuclidean", "dot", "cosine"))
        n_dev = self.mesh.devices.size
        b0 = queries.shape[0]
        per_dev = qb if (fused and qb) else (512 if fused else 1)
        unit = n_dev * max(per_dev, 1)
        pad = (-b0) % unit
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.broadcast_to(queries[:1],
                                           (pad, queries.shape[1]))])
        if fused and not qb:
            qb = min(512, queries.shape[0] // n_dev)
        eligible = self._eligible(filter_mask)
        key = (ef, k, eligible is not None, fused, qb, cb, lsub,
               approx_topk)
        if key not in self._fns:
            metric = resolve(metric_name)
            filtered = eligible is not None
            chunk = self.chunk
            interp = jax.default_backend() == "cpu"

            def local(q, fm, codes, scales, norms, points):
                bd, bi = scan_candidates(
                    q, codes, scales, norms,
                    fm if filtered else None,
                    metric_name=metric_name, ef=ef, chunk=chunk,
                    approx_topk=approx_topk)
                sd, si = rerank_exact(q, points, bi, metric, ef)
                return sd[:, :k], si[:, :k]

            def local_fused(q, fm, ct, sr, nr, points):
                from ..ops.scan_kernel import fused_scan_bucket

                nr_m = nr
                if filtered:
                    npad_ = nr.shape[1] - fm.shape[0]
                    import numpy as np
                    nr_m = jnp.where(
                        jnp.pad(fm, (0, npad_))[None, :], nr, np.inf)
                qc, qs = _quantize_queries(q)
                if metric_name == "cosine":
                    qn = jnp.sqrt(jnp.sum(q * q, axis=1))
                    qs = qs / jnp.maximum(qn, 1e-30)
                od, oi = fused_scan_bucket(
                    qc, qs[:, None], ct, sr, nr_m, lsub=lsub, qb=qb,
                    cb=cb, is_dot=metric_name in ("dot", "cosine"),
                    interpret=interp)
                md, nidx = jax.lax.approx_min_k(od, min(ef, od.shape[1]))
                bi = jnp.take_along_axis(oi, nidx, axis=1)
                bi = jnp.where(jnp.isfinite(md), bi, -1)
                bi = jnp.where(bi < len(points), bi, -1)
                sd, si = rerank_exact(q, points, bi, metric,
                                      min(ef, bi.shape[1]))
                return sd[:, :k], si[:, :k]

            self._fns[key] = jax.jit(jax.shard_map(
                local_fused if fused else local, mesh=self.mesh,
                in_specs=(P(SHARD_AXIS, None), P(), P(), P(), P(), P()),
                out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
                check_vma=False))
        qsh = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        queries = jax.device_put(queries, qsh)
        fm = (jnp.ones(1, bool) if eligible is None else eligible)
        if fused:
            ct, sr, nr = self._fused_arrays(
                cb, "l2" if metric_name == "sqeuclidean" else metric_name)
            d, i = self._fns[key](queries, fm, ct, sr, nr, self.points)
        else:
            d, i = self._fns[key](queries, fm, self.codes, self.scales,
                                  self.norms, self.points)
        if pad:
            import numpy as np
            d, i = np.asarray(d)[:b0], np.asarray(i)[:b0]
        if self.metric_name == "euclidean":
            d = jnp.sqrt(jnp.maximum(jnp.asarray(d), 0.0))
        return d, i
