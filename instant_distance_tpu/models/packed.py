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
            queries, self.points, tuple(self.zero_pack), upper_flat,
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
