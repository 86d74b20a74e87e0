"""Mesh-sharded quantized scan: linear multi-chip scaling for ScanIndex.

The exhaustive int8 scan (models/scan.py) is embarrassingly point-
parallel: shard the codes over the mesh, every device scores its 1/S of
the points against the replicated query batch (one int8 MXU matmul
stream each), candidates merge with an ``all_gather`` + 2-key sorted
top-k over ICI, and the exact rerank runs shard-locally before the
merge so only [B, ef] tuples ever cross devices.  Work per device is
exactly 1/S of the single-chip scan — no redundancy, no load imbalance
(compare ShardedHnsw, which must walk every shard's graph).

This is the DEEP10M-and-beyond serving configuration when exhaustive
accuracy is wanted; the reference has no multi-device anything
(SURVEY.md §5: its only backend is an intra-process thread pool).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.scan import (_quantize_queries, rerank_exact,
                           scan_candidates)
from ..ops.distance import resolve
from ..ops.packed import quantize_points
from .mesh import SHARD_AXIS, default_mesh


class ShardedScanIndex:
    """Point-sharded int8-scan index over a device mesh.

    Ids are the original input order (points are partitioned into
    contiguous shards, so global id = shard * n_s + local id, minus
    padding at the tail of the last shard).
    """

    def __init__(self, points, metric: str = "sqeuclidean",
                 mesh: Optional[Mesh] = None, chunk: int = 1 << 17,
                 values: Optional[Sequence[Any]] = None):
        if not isinstance(metric, str):
            raise ValueError("ShardedScanIndex needs a matmul-form "
                             "metric name")
        self.mesh = mesh or default_mesh()
        self.metric_name = metric
        s = self.mesh.devices.size
        pts = np.asarray(points, np.float32)
        n, dim = pts.shape
        self.n = n
        n_s = max(1, -(-n // s))
        self.n_s = n_s
        self.chunk = int(min(chunk, n_s))
        pad = s * n_s - n
        pts_flat = np.concatenate(
            [pts, np.zeros((pad, dim), np.float32)])
        shard = NamedSharding(self.mesh, P(SHARD_AXIS))
        self.points = jax.device_put(
            jnp.asarray(pts_flat.reshape(s, n_s, dim)), shard)
        quant = jax.jit(jax.shard_map(
            jax.vmap(quantize_points), mesh=self.mesh,
            in_specs=P(SHARD_AXIS), out_specs=(P(SHARD_AXIS),) * 2,
            check_vma=False))
        self.codes, self.scales = quant(self.points)

        def _norms(c, s_):
            deq = c[0].astype(jnp.float32) * s_[0][:, None]
            return jnp.sum(deq * deq, axis=1)[None]

        self.norms = jax.jit(jax.shard_map(
            _norms, mesh=self.mesh, in_specs=(P(SHARD_AXIS),) * 2,
            out_specs=P(SHARD_AXIS), check_vma=False))(
                self.codes, self.scales)
        self.values = None if values is None else list(values)
        self._alive = None
        self.config = Config(metric=metric)
        self._fns = {}

    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              mesh: Optional[Mesh] = None, values=None,
              **kw) -> "ShardedScanIndex":
        metric = config.metric if config is not None else "sqeuclidean"
        return cls(points, metric=metric, mesh=mesh, values=values, **kw)

    def __len__(self) -> int:
        return self.n

    def delete(self, ids) -> None:
        if self._alive is None:
            self._alive = np.ones(self.n, bool)
        idx = np.atleast_1d(np.asarray(ids, np.int64))
        if idx.size and (idx.min() < 0 or idx.max() >= self.n):
            raise IndexError("id out of range")
        self._alive[idx] = False

    def _eligible(self, filter_mask):
        eligible = self._alive
        if filter_mask is not None:
            fm = np.asarray(filter_mask, bool)
            if fm.shape != (self.n,):
                raise ValueError(
                    f"filter_mask must be [N]={self.n}, got {fm.shape}")
            eligible = fm if eligible is None else (eligible & fm)
        if eligible is None:
            return None
        pad = self.points.shape[0] * self.n_s - self.n
        full = np.concatenate([eligible, np.zeros(pad, bool)])
        return jnp.asarray(full.reshape(-1, self.n_s))

    # -- fused-kernel shard layout (built lazily) ---------------------------
    def _fused_shard_arrays(self, cb: int, variant: str = "l2"):
        """Per-shard transposed codes + row-form scales/norms padded to a
        multiple of ``cb`` (the Pallas kernel's point-block size).
        ``variant`` mirrors ScanIndex._fused_arrays: "l2" keeps
        |p_hat|^2 in norms; "dot"/"cosine" zero them (the kernel's
        is_dot eligibility-bias form), cosine also folding 1/|p_hat|
        into the scales."""
        cached = getattr(self, "_fused_arrs", None)
        if cached is not None and cached[0] == (cb, variant):
            return cached[1:]
        n_s = self.n_s
        n_sp = -(-n_s // cb) * cb

        def prep(c, s_, no):
            ct = jnp.pad(c[0], ((0, n_sp - n_s), (0, 0))).T[None]
            scales = s_[0]
            if variant == "cosine":
                scales = scales * jax.lax.rsqrt(
                    jnp.maximum(no[0], 1e-30))
            sr = jnp.pad(scales, (0, n_sp - n_s))[None, None]
            base = (no[0] if variant == "l2"
                    else jnp.zeros_like(no[0]))
            nr = jnp.pad(base, (0, n_sp - n_s),
                         constant_values=np.inf)[None, None]
            return ct, sr, nr
        ct, sr, nr = jax.jit(jax.shard_map(
            prep, mesh=self.mesh, in_specs=(P(SHARD_AXIS),) * 3,
            out_specs=(P(SHARD_AXIS),) * 3, check_vma=False))(
                self.codes, self.scales, self.norms)
        self._fused_arrs = ((cb, variant), ct, sr, nr)
        return ct, sr, nr

    def search_batch(self, queries, k: int = 10, ef: Optional[int] = None,
                     filter_mask=None, fused: bool = False,
                     qb: int = 0, cb: int = 4096, lsub: int = 32):
        """[B, D] -> (exact dists [B, k], original ids [B, k]).

        ``fused=True`` runs each shard's scan through the Pallas bucket
        kernel (models/scan.py ``fused="bucket"`` — the 1M-scale serving
        headline) instead of the XLA streamed scan; any named metric
        (sqeuclidean/euclidean/dot/cosine); shard sizes >= ``cb``
        (on TPU also ``cb/lsub`` >= 128 lanes).
        """
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or max(4 * k, 32)
        ef = int(min(ef, self.n_s))
        k = int(min(k, ef))
        eligible = self._eligible(filter_mask)
        metric_name = ("sqeuclidean" if self.metric_name == "euclidean"
                       else self.metric_name)
        fused = bool(fused) and metric_name in ("sqeuclidean", "dot",
                                                "cosine")
        b0 = queries.shape[0]
        if fused:
            cb = int(min(cb, -(-self.n_s // lsub) * lsub))
            qb = qb or (512 if b0 >= 512 else 256)
            qpad = (-b0) % qb
            if qpad:
                queries = jnp.concatenate(
                    [queries, jnp.broadcast_to(
                        queries[:1], (qpad, queries.shape[1]))])
        key = (ef, k, eligible is not None, fused, qb, cb, lsub,
               queries.shape[0])
        if key not in self._fns:
            metric = resolve(metric_name)
            filtered = eligible is not None
            n, n_s, chunk = self.n, self.n_s, self.chunk
            interp = jax.default_backend() == "cpu"

            def merge(q, sd, si, base):
                gi = jnp.where(si >= 0, base + si, -1)
                sd = jnp.where(gi >= 0, sd, jnp.inf)
                ad = jax.lax.all_gather(sd, SHARD_AXIS)   # [S, B, ef]
                ag = jax.lax.all_gather(gi, SHARD_AXIS)
                b = q.shape[0]
                cd = ad.transpose(1, 0, 2).reshape(b, -1)
                cg = ag.transpose(1, 0, 2).reshape(b, -1)
                fd, fg = jax.lax.sort((cd, cg), dimension=1, num_keys=2)
                return fd[:, :k], fg[:, :k]

            def local(q, el, codes, scales, norms, points):
                el0 = el[0] if filtered else None
                # mask the last shard's padding rows
                shard_id = jax.lax.axis_index(SHARD_AXIS)
                base = shard_id.astype(jnp.int32) * n_s
                local_ids = base + jax.lax.broadcasted_iota(
                    jnp.int32, (n_s,), 0)
                in_range = local_ids < n
                el0 = in_range if el0 is None else (el0 & in_range)
                bd, bi = scan_candidates(
                    q, codes[0], scales[0], norms[0], el0,
                    metric_name=metric_name, ef=ef, chunk=chunk)
                sd, si = rerank_exact(q, points[0], bi, metric, ef)
                return merge(q, sd, si, base)

            def local_fused(q, el, ct, sr, nr, points):
                from ..ops.scan_kernel import fused_scan_bucket

                shard_id = jax.lax.axis_index(SHARD_AXIS)
                base = shard_id.astype(jnp.int32) * n_s
                n_sp = ct.shape[2]
                local_ids = base + jax.lax.broadcasted_iota(
                    jnp.int32, (n_sp,), 0)
                elig = local_ids < jnp.minimum(n, base + n_s)
                if filtered:
                    elig = elig & jnp.pad(el[0], (0, n_sp - n_s))
                nr_m = jnp.where(elig[None, :], nr[0], jnp.inf)
                qc, qs = _quantize_queries(q)
                if metric_name == "cosine":
                    qn = jnp.sqrt(jnp.sum(q * q, axis=1))
                    qs = qs / jnp.maximum(qn, 1e-30)
                od, oi = fused_scan_bucket(
                    qc, qs[:, None], ct[0], sr[0], nr_m, lsub=lsub,
                    qb=qb, cb=cb,
                    is_dot=metric_name in ("dot", "cosine"),
                    interpret=interp)
                md, nidx = jax.lax.approx_min_k(
                    od, min(ef, od.shape[1]))
                bi = jnp.take_along_axis(oi, nidx, axis=1)
                bi = jnp.where(jnp.isfinite(md), bi, -1)
                bi = jnp.where(bi < n_s, bi, -1)  # padded tail rows
                sd, si = rerank_exact(q, points[0], bi, metric,
                                      min(ef, bi.shape[1]))
                return merge(q, sd, si, base)

            specs = ((P(None, None), P(SHARD_AXIS))
                     + (P(SHARD_AXIS),) * 4)
            self._fns[key] = jax.jit(jax.shard_map(
                local_fused if fused else local, mesh=self.mesh,
                in_specs=specs,
                out_specs=(P(None, None), P(None, None)),
                check_vma=False))
        el = (jnp.zeros((self.points.shape[0], 1), bool)
              if eligible is None else eligible)
        if fused:
            ct, sr, nr = self._fused_shard_arrays(
                cb, "l2" if metric_name == "sqeuclidean" else metric_name)
            d, i = self._fns[key](queries, el, ct, sr, nr, self.points)
            if b0 != queries.shape[0]:
                d, i = d[:b0], i[:b0]
        else:
            d, i = self._fns[key](queries, el, self.codes, self.scales,
                                  self.norms, self.points)
        if self.metric_name == "euclidean":
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

    # ------------------------------------------------------------------
    def dump(self, fname: str) -> None:
        """Persist the scan index (points + metric + values + tombstones)
        to one npz.  Quantization is recomputed on load — it is a cheap
        deterministic pass, so storing codes would only bloat the file."""
        import json as _json

        s, n_s, dim = self.points.shape
        pts = np.asarray(self.points, np.float32).reshape(
            s * n_s, dim)[:self.n]
        arrays = {
            "magic": np.array("instant-distance-tpu/sharded-scan-v1"),
            "metric": np.array(self.metric_name),
            "chunk": np.array(self.chunk, np.int64),
            "points": pts,
        }
        if self.values is not None:
            arrays["values"] = np.array(_json.dumps(list(self.values)))
        if self._alive is not None:
            arrays["alive"] = np.asarray(self._alive, bool)
        with open(fname, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, fname: str,
             mesh: Optional[Mesh] = None) -> "ShardedScanIndex":
        """Load a ``dump`` onto ``mesh`` (default: all devices — the
        scan shards by even partition, so any mesh size works)."""
        import json as _json

        with np.load(fname, allow_pickle=False) as z:
            if str(z["magic"]) != "instant-distance-tpu/sharded-scan-v1":
                raise ValueError(
                    f"{fname}: not a sharded scan index")
            values = (_json.loads(str(z["values"]))
                      if "values" in z.files else None)
            idx = cls(z["points"], metric=str(z["metric"]), mesh=mesh,
                      chunk=int(z["chunk"]), values=values)
            if "alive" in z.files:
                idx._alive = np.asarray(z["alive"], bool)
        return idx
