"""PackedHnsw: a serving-optimized compiled form of a built index.

``PackedHnsw.from_index(hnsw)`` inlines int8-quantized neighbor vectors
into every adjacency row (see ops/packed.py for the rationale and layout)
and serves batched queries with approximate traversal + exact rerank.
The logical graph is unchanged — this is a storage/execution transform,
the analogue of exporting a model to a serving format.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import packed as pk
from ..ops import walk_kernel as wk
from ..ops.distance import resolve
from .hnsw import Hnsw, HnswMap


@functools.partial(jax.jit, static_argnames=(
    "metric_name", "ef", "k", "max_iter_factor", "expand", "rerank",
    "n_upper"))
def _packed_search_jit(queries, points, zero_pack, upper_flat, eligible,
                       seed_vecs, *, metric_name, ef, k, max_iter_factor,
                       expand, rerank, n_upper):
    upper_packs = tuple(tuple(upper_flat[3 * i:3 * i + 3])
                        for i in range(n_upper))
    return pk.packed_search(
        queries, zero_pack, upper_packs, points, resolve(metric_name),
        ef=ef, k=k, max_iter_factor=max_iter_factor, expand=expand,
        rerank=rerank, eligible=eligible, seed_vecs=seed_vecs)


class PackedHnsw:
    """Inline-quantized serving index (immutable graph; tombstones and
    result filters supported, like the exact index)."""

    def __init__(self, points, zero_pack, upper_packs, config: Config,
                 values: Optional[Sequence[Any]] = None, alive=None):
        self.points = points
        self.zero_pack = zero_pack      # (ids [N,K], codes [N,K,D], s [N,K])
        self.upper_packs = upper_packs  # top first
        self.config = config
        #: values[pid] -> value, when packed from an HnswMap
        self.values = None if values is None else list(values)
        self._alive = None if alive is None else jnp.asarray(alive, bool)

    @classmethod
    def from_index(cls, index: Hnsw, pack_links: int = 0) -> "PackedHnsw":
        """Compile a built index into the packed serving form.

        ``pack_links`` truncates each zero row to its first N (selection
        -ordered) neighbors, trading recall for memory/throughput;
        0 keeps the full M*2 row (SIFT1M at full width is ~11 GB).
        Values (HnswMap) and tombstones carry over.
        """
        codes, scales = pk.quantize_points(index.points)
        zero_pack = pk.pack_layer(index.zero, codes, scales,
                                  links=pack_links)
        uppers = []
        for layer in reversed(index.layers):  # top first
            uppers.append(pk.pack_layer(layer, codes, scales))
        values = index.values if isinstance(index, HnswMap) else None
        return cls(index.points, zero_pack, tuple(uppers), index.config,
                   values=values, alive=index._alive)

    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              **kw) -> "PackedHnsw":
        index, _ = Hnsw.build(points, config, **kw)
        return cls.from_index(index)

    def __len__(self) -> int:
        return int(self.points.shape[0])

    def nbytes(self) -> int:
        total = 0
        for arrs in (self.zero_pack, *self.upper_packs):
            total += sum(a.size * a.dtype.itemsize for a in arrs)
        return total + self.points.size * self.points.dtype.itemsize

    # -- tombstones (same semantics as Hnsw.delete) -------------------------
    def delete(self, pids) -> None:
        if self._alive is None:
            self._alive = jnp.ones(len(self), bool)
        idx = np.atleast_1d(np.asarray(pids, np.int64))
        if idx.size and (idx.min() < 0 or idx.max() >= len(self)):
            raise IndexError("pid out of range")
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

    def _seeds(self, entry_seeds: Optional[int]):
        """[S, D] bf16 seed matrix for the MXU entry scan (None when the
        knob is 0/off).  pids are a seeded uniform shuffle of the input
        (ops/construct.py mirrors lib.rs:256-270), so the first S points
        are a uniform random sample — no extra sampling pass needed."""
        s = (getattr(self.config, "entry_seeds", 0)
             if entry_seeds is None else entry_seeds)
        if not s:
            return None
        s = min(int(s), len(self))
        cached = getattr(self, "_seed_cache", None)
        if cached is None or cached.shape[0] != s:
            cached = jnp.asarray(self.points[:s], jnp.bfloat16)
            self._seed_cache = cached
        return cached

    def _points_lanes(self):
        """Rerank/entry gather table, 128-lane zero-padded when D needs
        it: a compact [N, D%128!=0] argument makes every gathering
        program materialize a full (8,128)-tiled copy of the table
        (docs/performance.md round 4).  The gathered rows are sliced
        back to the queries' D inside the programs, so distances are
        identical.  Only for named metrics; reuses ``self.points``
        when already aligned."""
        d = self.points.shape[1]
        if d % 128 == 0 or not isinstance(self.config.metric, str):
            return self.points
        cached = getattr(self, "_lanes_cache", None)
        if cached is None:
            cached = jnp.pad(jnp.asarray(self.points),
                             ((0, 0), (0, (-d) % 128)))
            self._lanes_cache = cached
        return cached

    # -- fused walk-kernel engine -------------------------------------------
    def _walk_operands(self):
        """(codes [N, K, Dp] int8, meta [N, 2*Kp] i32, kp, d_pad) for the
        Pallas walk kernel (ops/walk_kernel.py), built once and cached.
        Codes are zero-padded to a 128-lane dim (a zero column adds 0 to
        every squared-L2 term, so distances are unchanged)."""
        cached = getattr(self, "_walk_cache", None)
        if cached is None:
            ids, codes, scales = self.zero_pack
            d = codes.shape[2]
            dp = ((d + 127) // 128) * 128
            if dp != d:
                codes = jnp.pad(codes, ((0, 0), (0, 0), (0, dp - d)))
            meta_np, kp = wk.pack_walk_meta(np.asarray(ids),
                                            np.asarray(scales))
            cached = (codes, jnp.asarray(meta_np), kp, dp)
            self._walk_cache = cached
        return cached

    def _walk_operands_fused(self):
        """(frow [N, K+4, Dp] int8, dummy meta, kp=64, d_pad) for the
        fused-row walk-kernel layout (ops/walk_kernel.pack_walk_fused):
        ONE DMA per expansion fetches codes AND metadata byte-planes."""
        cached = getattr(self, "_walk_cache_fused", None)
        if cached is None:
            ids, codes, scales = self.zero_pack
            codes = np.asarray(codes)
            d = codes.shape[2]
            dp = ((d + 127) // 128) * 128
            if dp != d:
                codes = np.pad(codes, ((0, 0), (0, 0), (0, dp - d)))
            frow = wk.pack_walk_fused(np.asarray(ids), np.asarray(scales),
                                      codes)
            dummy = jnp.zeros((1, 128), jnp.int32)
            cached = (jnp.asarray(frow), dummy, 64, dp)
            self._walk_cache_fused = cached
        return cached

    def search_batch_kernel(self, queries, k: Optional[int] = None,
                            ef: Optional[int] = None, rerank: bool = True,
                            entry_seeds: Optional[int] = None,
                            expand: Optional[int] = None,
                            bq: int = 128, fused_rows: bool = True,
                            merge: str = "extract"):
        """Batched query through the fused Pallas graph-walk kernel.

        Same traversal semantics as ``search_batch`` (the kernel is
        element-equivalent to the XLA beam — tests/test_walk_kernel.py);
        requires ``entry_seeds`` > 0 (the seeded MXU entry is the tuned
        serving mode) and supports ``expand`` in {1, 2}.  Result filters/
        tombstones are not routed here — use ``search_batch``.

        ``fused_rows`` fetches each expansion with ONE row DMA (metadata
        byte-planes inline, ops/walk_kernel.pack_walk_fused) — half the
        scalar-core issue cost of the split codes+meta layout;
        ``merge`` picks the beam-merge strategy (see walk_search).
        """
        cfg = self.config
        if self._alive is not None:
            raise ValueError("kernel engine does not support tombstones; "
                             "use search_batch")
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or cfg.ef_search
        k = k or min(10, ef)
        e_n = expand if expand is not None else min(
            2, getattr(cfg, "search_expand", 2))
        seeds = self._seeds(entry_seeds)
        if seeds is None:
            raise ValueError("kernel engine needs entry_seeds > 0")
        # Fused rows pack ids+scales into one 128-lane meta row, which
        # caps K at 64 (walk_kernel.pack_walk_fused); wider graphs fall
        # back to the split codes+meta layout instead of raising.
        if fused_rows and self.zero_pack[1].shape[1] > 64:
            fused_rows = False
        if fused_rows:
            codes, meta, kp, dp = self._walk_operands_fused()
        else:
            codes, meta, kp, dp = self._walk_operands()
        b0 = queries.shape[0]
        b = ((b0 + bq - 1) // bq) * bq
        qp = queries
        if dp != queries.shape[1]:
            qp = jnp.pad(qp, ((0, 0), (0, dp - queries.shape[1])))
        if b != b0:
            qp = jnp.pad(qp, ((0, b - b0), (0, 0)))
        n_init = min(ef, seeds.shape[0])
        sd, sp = pk.seed_entry(qp[:, :seeds.shape[1]], seeds, n_init)
        bd0 = jnp.full((b, ef), jnp.inf, jnp.float32)
        bd0 = jax.lax.dynamic_update_slice(bd0, sd, (0, 0))
        bp0 = jnp.full((b, ef), -1, jnp.int32)
        bp0 = jax.lax.dynamic_update_slice(bp0, sp, (0, 0))
        bd, bp = wk.walk_search(
            qp, bd0, bp0, codes, meta, kp=kp, expand=e_n, ef=ef,
            max_iters=cfg.max_iter_factor * ef + 16, bq=bq,
            interpret=jax.default_backend() == "cpu",
            fused_rows=fused_rows, merge=merge,
            k=self.zero_pack[1].shape[1])
        bd, bp = bd[:b0], bp[:b0]
        if not rerank:
            return bd[:, :k], bp[:, :k]
        metric = resolve(cfg.metric if isinstance(cfg.metric, str)
                         else cfg.metric)
        exact = metric.gathered(
            queries,
            self._points_lanes()[jnp.clip(bp, 0)][..., :queries.shape[1]])
        exact = jnp.where(bp >= 0, exact, jnp.inf)
        sd_, sp_ = jax.lax.sort((exact, bp), dimension=1, num_keys=2)
        return sd_[:, :k], sp_[:, :k]

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, rerank: bool = True,
                     filter_mask=None, entry_seeds: Optional[int] = None,
                     expand: Optional[int] = None):
        """Batched query.  ``entry_seeds``: override Config.entry_seeds
        (S>0 = one MXU scan over the first S points replaces the upper
        -layer descent; 0 = classic descent; None = config default).
        ``expand``: wavefront width override (Config.search_expand);
        the hardware-tuned seeded-entry operating point is ef=16,
        expand=2, seeds=8192 (82.9k QPS @ 0.9950 on 1M x 128 v5e —
        see docs/performance.md round 3)."""
        cfg = self.config
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or cfg.ef_search
        k = k or min(10, ef)
        upper_flat = tuple(a for pack in self.upper_packs for a in pack)
        return _packed_search_jit(
            queries, self._points_lanes(), tuple(self.zero_pack),
            upper_flat,
            self._eligible(filter_mask), self._seeds(entry_seeds),
            metric_name=(cfg.metric if isinstance(cfg.metric, str)
                         else cfg.metric),
            ef=ef, k=min(k, ef), max_iter_factor=cfg.max_iter_factor,
            expand=(expand if expand is not None
                    else getattr(cfg, "search_expand", 4)),
            rerank=rerank, n_upper=len(self.upper_packs))

    def search_batch_values(self, queries, k: Optional[int] = None,
                            ef: Optional[int] = None, filter_mask=None):
        """Batched query returning (dists, pids, values-nested-list)."""
        if self.values is None:
            raise ValueError("this index carries no values")
        d, p = self.search_batch(queries, k, ef, filter_mask=filter_mask)
        pn = np.asarray(p)
        vals = [[self.values[pid] if pid >= 0 else None for pid in row]
                for row in pn]
        return d, p, vals

    # -- persistence ---------------------------------------------------------
    def dump(self, fname: str) -> None:
        """Save the compiled serving form (packed layers + f32 points
        for the exact rerank) as one npz — so serving processes skip
        both the graph build and the packing pass."""
        import dataclasses
        import json

        cfgd = dataclasses.asdict(self.config)
        if not isinstance(cfgd.get("metric"), str):
            cfgd["metric"] = "custom"
        arrays = dict(
            magic=np.array("instant-distance-tpu/packed/v1"),
            config=np.array(json.dumps(cfgd)),
            n_upper=np.array(len(self.upper_packs), np.int64),
            points=np.asarray(self.points, np.float32),
        )
        for name, pack in (("zero", self.zero_pack),
                           *((f"u{i}", p)
                             for i, p in enumerate(self.upper_packs))):
            ids, codes, scales = pack
            arrays[f"{name}_ids"] = np.asarray(ids)
            arrays[f"{name}_codes"] = np.asarray(codes)
            arrays[f"{name}_scales"] = np.asarray(scales)
        if self.values is not None:
            arrays["values"] = np.array(json.dumps(list(self.values)))
        if self._alive is not None:
            arrays["alive"] = np.asarray(self._alive, bool)
        with open(fname, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, fname: str) -> "PackedHnsw":
        import json

        from ..utils.serialize import _config_from_json

        with np.load(fname, allow_pickle=False) as z:
            if str(z["magic"]) != "instant-distance-tpu/packed/v1":
                raise ValueError(f"{fname}: not a PackedHnsw dump")
            cfg = _config_from_json(str(z["config"]))

            def pack(name):
                return tuple(jnp.asarray(z[f"{name}_{part}"])
                             for part in ("ids", "codes", "scales"))

            uppers = tuple(pack(f"u{i}")
                           for i in range(int(z["n_upper"])))
            values = (json.loads(str(z["values"]))
                      if "values" in z.files else None)
            alive = z["alive"] if "alive" in z.files else None
            return cls(jnp.asarray(z["points"]), pack("zero"), uppers,
                       cfg, values=values, alive=alive)
