"""Mesh-sharded HNSW: one sub-index per device, cross-shard top-k merge.

The reference holds every point in one address space (``points: Vec<P>``,
lib.rs:196) and parallelizes only across threads.  The TPU-native design
shards the *point set*: each device of a ``jax.sharding.Mesh`` owns an
independent HNSW over its partition (so per-shard graphs never need
cross-device pointer chasing), queries are replicated, every shard runs
the batched wavefront search locally, and per-shard results merge with an
``all_gather`` + 2-key sorted top-k over ICI.  Because the union of
per-shard beams can only contain *more* true neighbors than one global
beam, sharded recall dominates single-index recall at equal ef.

Construction is also mesh-parallel: all shards insert their waves
simultaneously (shard_map over the wave step), which is the distributed
generalization of the reference's rayon insertion fan-out.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, layer_sizes
from ..ops.beam import hnsw_search
from ..ops.construct import wave_step_core, _wave_schedule, _bucket
from ..ops.distance import resolve
from .mesh import SHARD_AXIS, default_mesh

#: Sentinel coordinate for shard-padding points: far from any real data
#: but finite, so squared distances stay finite in float32.
_PAD_COORD = 1e15


class ShardedHnsw:
    """An HNSW index sharded over a device mesh.

    Arrays carry a leading shard axis placed on the mesh:
      points [S, n_s, D], zero [S, n_s, m0], layers[l] [S, end_l, m],
      gids [S, n_s] (global original index per local pid; -1 = padding).
    """

    def __init__(self, points, zero, layers, gids, config: Config,
                 mesh: Mesh, values=None):
        self.mesh = mesh
        shard = NamedSharding(mesh, P(SHARD_AXIS))
        self.points = jax.device_put(jnp.asarray(points, jnp.float32), shard)
        self.zero = jax.device_put(jnp.asarray(zero, jnp.int32), shard)
        self.layers = [jax.device_put(jnp.asarray(l, jnp.int32), shard)
                       for l in layers]
        self.gids = jax.device_put(jnp.asarray(gids, jnp.int32), shard)
        self.config = config
        #: values indexed by ORIGINAL global id (the id space search
        #: results use), not by local pid.
        self.values = None if values is None else list(values)
        #: Tombstone mask over global ids (host-side, [n_global] bool).
        self._alive = None
        self._search_fn = None
        #: Reverse-edge additions lost to per-wave pend_cap overflow
        #: during build (0 unless set by ``build``).
        self.reverse_drops = 0

    @property
    def n_shards(self) -> int:
        return int(self.points.shape[0])

    def __len__(self) -> int:
        return int((np.asarray(self.gids) >= 0).sum())

    def delete(self, global_ids) -> None:
        """Tombstone points by ORIGINAL global id (result-filtered,
        graph untouched)."""
        if self._alive is None:
            self._alive = np.ones(len(self), bool)
        idx = np.atleast_1d(np.asarray(global_ids, np.int64))
        if idx.size and (idx.min() < 0 or idx.max() >= len(self)):
            raise IndexError("global id out of range")
        self._alive[idx] = False

    def _eligible(self, filter_mask):
        eligible = self._alive
        if filter_mask is not None:
            fm = np.asarray(filter_mask, bool)
            if fm.shape != (len(self),):
                raise ValueError(
                    f"filter_mask must be [N]={len(self)}, got {fm.shape}")
            eligible = fm if eligible is None else (eligible & fm)
        return None if eligible is None else jnp.asarray(eligible)

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, points, config: Optional[Config] = None,
              mesh: Optional[Mesh] = None, progress=None,
              values=None, checkpoint: Optional[str] = None,
              checkpoint_every: int = 64) -> "ShardedHnsw":
        """Shard the point set over the mesh and build all shard graphs
        in parallel, one wave step for every shard per device step.

        ``values`` (optional): per-point payloads, indexed by original
        input order — exactly the id space ``search_batch`` returns.

        ``checkpoint``: optional path; the full mesh build state (all
        shards' adjacency + distance cache + snapshot buffer + schedule
        position) is saved there every ``checkpoint_every`` waves and
        resumed from on restart — same insurance as ``build_graph``'s
        single-chip checkpoint, for the biggest builds where it matters
        most.  Resume is bit-exact (the wave schedule is deterministic).
        """
        import dataclasses

        from ..config import resolve_seed

        config = config or Config()
        # pin the (possibly entropy-drawn) seed: the local shuffle, the
        # checkpoint key and the per-shard layer schedule must agree
        config = dataclasses.replace(config,
                                     seed=resolve_seed(config.seed))
        if values is not None and len(values) != len(points):
            raise ValueError("points and values must have the same length")
        mesh = mesh or default_mesh()
        s = mesh.devices.size
        pts = np.asarray(points, np.float32)
        n, dim = pts.shape
        n_s = max(1, -(-n // s))

        rng = np.random.default_rng(config.seed)
        perm = rng.permutation(n)
        pad = s * n_s - n
        gids_flat = np.concatenate(
            [perm, np.full(pad, -1, np.int64)]).astype(np.int32)
        pts_flat = np.concatenate(
            [pts[perm], np.full((pad, dim), _PAD_COORD, np.float32)])
        shard_pts = pts_flat.reshape(s, n_s, dim)
        shard_gids = gids_flat.reshape(s, n_s)

        # local shuffle per shard (the reference's layer assignment,
        # lib.rs:256-270) — same seed => same layer schedule on every
        # shard, so one wave program drives the whole mesh.
        lrng = np.random.default_rng(config.seed + 1)
        keys = lrng.integers(0, n_s, size=n_s)
        order = np.lexsort((np.arange(n_s), keys))
        shard_pts = shard_pts[:, order]
        shard_gids = shard_gids[:, order]

        zero, layers, reverse_drops = _build_sharded(
            shard_pts, config, mesh, progress=progress,
            checkpoint=checkpoint, checkpoint_every=checkpoint_every)
        idx = cls(shard_pts, zero, layers, shard_gids, config, mesh,
                  values=values)
        idx.reverse_drops = reverse_drops
        return idx

    # ------------------------------------------------------------------
    def _make_search(self, ef: int, n_layers: int, filtered: bool):
        cfg = self.config
        metric = resolve(cfg.metric)

        def local(q, fm, zero, pts, gids, *layers):
            # translate the global-id filter into local-pid eligibility
            el = None
            if filtered:
                el = (gids[0] >= 0) & fm[jnp.clip(gids[0], 0)]
            d, p = hnsw_search(
                q, zero[0], tuple(l[0] for l in layers), pts[0], metric,
                ef=ef, m=cfg.m, zero_links=cfg.m0,
                max_iter_factor=cfg.max_iter_factor,
                expand=getattr(cfg, "search_expand", 1), eligible=el,
                entry_seeds=min(getattr(cfg, "entry_seeds", 0),
                                pts.shape[1]))
            g = jnp.where(p >= 0, gids[0][jnp.clip(p, 0)], -1)
            d = jnp.where(g >= 0, d, jnp.inf)
            ad = jax.lax.all_gather(d, SHARD_AXIS)        # [S, B, ef]
            ag = jax.lax.all_gather(g, SHARD_AXIS)
            b = q.shape[0]
            cd = ad.transpose(1, 0, 2).reshape(b, -1)
            cg = ag.transpose(1, 0, 2).reshape(b, -1)
            sd, sg = jax.lax.sort((cd, cg), dimension=1, num_keys=2)
            return sd[:, :ef], sg[:, :ef]

        specs = ((P(None, None), P(None))
                 + (P(SHARD_AXIS),) * (3 + n_layers))
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=specs,
            out_specs=(P(None, None), P(None, None)), check_vma=False))

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, filter_mask=None):
        """Batched global query -> (dists [B, k], global ids [B, k]).

        Global ids index the *original* input order (the sharded build's
        analogue of the id remap returned by ``Builder::build_hnsw``).
        ``filter_mask`` (bool [n_global], original order) restricts
        results without affecting traversal.
        """
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or self.config.ef_search
        k = k or ef
        eligible = self._eligible(filter_mask)
        key = (ef, len(self.layers), eligible is not None,
               getattr(self.config, "entry_seeds", 0))
        if self._search_fn is None or self._search_fn[0] != key:
            self._search_fn = (
                key, self._make_search(ef, len(self.layers),
                                       eligible is not None))
        fm = (jnp.ones(1, bool) if eligible is None else eligible)
        d, g = self._search_fn[1](queries, fm, self.zero, self.points,
                                  self.gids, *self.layers)
        return d[:, :k], g[:, :k]

    def search_batch_values(self, queries, k: Optional[int] = None,
                            ef: Optional[int] = None, filter_mask=None):
        """Batched query returning (dists, global ids, values)."""
        if self.values is None:
            raise ValueError("this index carries no values")
        d, g = self.search_batch(queries, k, ef, filter_mask=filter_mask)
        gn = np.asarray(g)
        vals = [[self.values[gid] if gid >= 0 else None for gid in row]
                for row in gn]
        return d, g, vals

    def pack(self, pack_links: int = 32) -> "ShardedPackedHnsw":
        """Compile every shard into the inline-int8 serving form
        (see models/packed.py) — the DEEP10M-scale configuration:
        packed traversal per shard, exact rerank, cross-shard merge."""
        return ShardedPackedHnsw.from_sharded(self, pack_links=pack_links)

    # ------------------------------------------------------------------
    def dump(self, fname: str) -> None:
        """Persist all shards' graph arrays to one npz.  The sharded
        indices are the ones you least want to rebuild; the reference
        persists only single-address-space indices (py src/lib.rs:59-75).
        Serving forms (``pack()``) recompile from the loaded graph."""
        from ..utils import serialize

        serialize.dump_sharded(self, fname)

    @classmethod
    def load(cls, fname: str, mesh: Optional[Mesh] = None) -> "ShardedHnsw":
        """Load a ``dump`` onto ``mesh`` (default: the first S devices
        where S is the dump's shard count; a different-size mesh
        raises — re-sharding is a rebuild)."""
        from ..utils import serialize

        return serialize.load_sharded(fname, mesh=mesh)


class ShardedPackedHnsw:
    """Mesh-sharded packed serving index."""

    def __init__(self, points, gids, zero_pack, upper_packs,
                 config: Config, mesh: Mesh, values=None, alive=None):
        self.mesh = mesh
        self.points = points          # [S, n_s, D]
        self.gids = gids              # [S, n_s]
        self.zero_pack = zero_pack    # (ids, codes, scales), each [S, ...]
        self.upper_packs = upper_packs
        self.config = config
        self.values = None if values is None else list(values)
        self._alive = None if alive is None else np.asarray(alive, bool)
        self._fns = {}

    def __len__(self) -> int:
        return int((np.asarray(self.gids) >= 0).sum())

    delete = ShardedHnsw.delete
    _eligible = ShardedHnsw._eligible
    search_batch_values = ShardedHnsw.search_batch_values

    @classmethod
    def from_sharded(cls, idx: ShardedHnsw,
                     pack_links: int = 32) -> "ShardedPackedHnsw":
        from ..ops import packed as pk

        mesh = idx.mesh

        def pack_one_layer(adj, codes, scales):
            def local(a, c, s):   # per-device blocks, leading shard dim 1
                a0, c0, s0 = a[0], c[0], s[0]
                safe = jnp.clip(a0, 0)
                pc = c0[safe]
                ps = jnp.where(a0 >= 0, s0[safe], 0.0)
                return a, pc[None], ps[None]

            return jax.jit(jax.shard_map(
                local, mesh=mesh, in_specs=(P(SHARD_AXIS),) * 3,
                out_specs=(P(SHARD_AXIS),) * 3,
                check_vma=False))(adj, codes, scales)

        quant = jax.jit(jax.shard_map(
            jax.vmap(pk.quantize_points), mesh=mesh,
            in_specs=P(SHARD_AXIS), out_specs=(P(SHARD_AXIS),) * 2,
            check_vma=False))

        codes, scales = quant(idx.points)
        zadj = idx.zero
        if pack_links and pack_links < zadj.shape[2]:
            zadj = zadj[:, :, :pack_links]
        zero_pack = pack_one_layer(zadj, codes, scales)
        uppers = tuple(pack_one_layer(l, codes, scales)
                       for l in reversed(idx.layers))  # top first
        return cls(idx.points, idx.gids, zero_pack, uppers, idx.config,
                   mesh, values=idx.values, alive=idx._alive)

    def search_batch(self, queries, k: Optional[int] = None,
                     ef: Optional[int] = None, filter_mask=None):
        """Global packed query: per-shard approx traversal + exact
        rerank, then all_gather + 2-key-sort top-k merge over ICI.
        ``filter_mask`` (bool [n_global], original order) restricts
        results without affecting traversal."""
        from ..ops.packed import packed_search

        cfg = self.config
        metric = resolve(cfg.metric)
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None]
        ef = ef or cfg.ef_search
        k = k or min(10, ef)
        k = min(k, ef)
        eligible = self._eligible(filter_mask)
        key = (ef, k, eligible is not None)
        if key not in self._fns:
            n_upper = len(self.upper_packs)
            filtered = eligible is not None

            def local(q, fm, points, gids, *packs):
                zero_pack = tuple(x[0] for x in packs[:3])
                uppers = tuple(
                    tuple(x[0] for x in packs[3 + 3 * i:6 + 3 * i])
                    for i in range(n_upper))
                el = None
                if filtered:
                    el = (gids[0] >= 0) & fm[jnp.clip(gids[0], 0)]
                d, p = packed_search(
                    q, zero_pack, uppers, points[0], metric, ef=ef, k=ef,
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "search_expand", 4), eligible=el)
                g = jnp.where(p >= 0, gids[0][jnp.clip(p, 0)], -1)
                d = jnp.where(g >= 0, d, jnp.inf)
                ad = jax.lax.all_gather(d, SHARD_AXIS)
                ag = jax.lax.all_gather(g, SHARD_AXIS)
                b = q.shape[0]
                cd = ad.transpose(1, 0, 2).reshape(b, -1)
                cg = ag.transpose(1, 0, 2).reshape(b, -1)
                sd, sg = jax.lax.sort((cd, cg), dimension=1, num_keys=2)
                return sd[:, :k], sg[:, :k]

            n_args = 2 + 3 + 3 * n_upper
            specs = ((P(None, None), P(None))
                     + (P(SHARD_AXIS),) * n_args)
            self._fns[key] = jax.jit(jax.shard_map(
                local, mesh=self.mesh, in_specs=specs,
                out_specs=(P(None, None), P(None, None)),
                check_vma=False))
        flat = (*self.zero_pack,
                *(a for pack in self.upper_packs for a in pack))
        fm = (jnp.ones(1, bool) if eligible is None else eligible)
        d, g = self._fns[key](queries, fm, self.points, self.gids, *flat)
        return d, g


# ---------------------------------------------------------------------------
# mesh-parallel construction
# ---------------------------------------------------------------------------

def _build_sharded(shard_pts: np.ndarray, config: Config, mesh: Mesh,
                   progress=None, checkpoint: Optional[str] = None,
                   checkpoint_every: int = 64):
    """Run the wave construction loop with every shard advancing in
    lockstep: one shard_map'd wave step per wave, all devices busy.

    Returns ``(zero [S, n_s, m0], snapshots, reverse_drops)``."""
    cfg = config
    s, n_s, dim = shard_pts.shape
    m, m0 = cfg.m, cfg.m0
    sizes = layer_sizes(n_s, cfg.ml, m)
    top = len(sizes) - 1
    if top > 16:
        raise ValueError("more than 16 upper layers")
    ranges = [(top - i, max(c - sz, 1), c)
              for i, (sz, c) in enumerate(sizes)]
    from ..ops.construct import _pack_factor

    pack = _pack_factor(m)

    def _pal(x):  # pack-align (lane-packed stacked buffer)
        return ((x + pack - 1) // pack) * pack

    cap_rows = max(pack, sum(_pal(c) for (_, c) in sizes[:-1]))

    shard = NamedSharding(mesh, P(SHARD_AXIS))
    repl = NamedSharding(mesh, P())
    dev_pts = jax.device_put(jnp.asarray(shard_pts), shard)
    adj = jax.device_put(jnp.full((s, n_s + 1, m0), -1, jnp.int32), shard)
    adjd = jax.device_put(
        jnp.full((s, n_s + 1, m0), jnp.inf,
                 jnp.dtype(getattr(cfg, "dist_cache_dtype", "float32"))),
        shard)
    stacked = jax.device_put(
        jnp.full((s, cap_rows // pack, m * pack), -1, jnp.int32), shard)

    heur = (None if cfg.heuristic is None else
            (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned))

    from ..ops.construct import (_exact_prefix_of, _hop_of, _pool_of,
                                 _quantize_for_scan, _resolve_search_mode,
                                 _rev_params)

    pend_cap, rev_rounds = _rev_params(cfg, m0)
    search_mode = _resolve_search_mode(cfg, cfg.metric)
    qmetric = cfg.metric if isinstance(cfg.metric, str) else "sqeuclidean"

    def _quantize_sharded(dev, fused: bool):
        qfn = functools.partial(_quantize_for_scan, fused=fused,
                                metric_name=qmetric)
        return jax.jit(
            jax.shard_map(jax.vmap(qfn), mesh=mesh,
                          in_specs=P(SHARD_AXIS),
                          out_specs=(P(SHARD_AXIS),) * 3,
                          check_vma=False))(dev)

    if search_mode.startswith("scan"):
        codes, cscales, cnorms = _quantize_sharded(
            dev_pts, fused=search_mode == "scan_fused")
    else:  # beam mode ignores the scan operands; tiny sharded dummies
        codes = jax.device_put(jnp.zeros((s, 1, 1), jnp.int8), shard)
        cscales = jax.device_put(jnp.zeros((s, 1), jnp.float32), shard)
        cnorms = jax.device_put(jnp.zeros((s, 1), jnp.float32), shard)

    def _make_step(mode: str):
        core = functools.partial(
            wave_step_core, metric_name=cfg.metric,
            efc=_pool_of(cfg, mode), m=m, m0=m0,
            heuristic=heur, rev_chunk=8192, pend_cap=pend_cap,
            rev_rounds=rev_rounds,
            max_iter_factor=cfg.max_iter_factor,
            expand=getattr(cfg, "construct_expand", 1),
            search_mode=mode,
            pd_dtype=getattr(cfg, 'select_pd_dtype', 'bfloat16'),
            hop_repair=_hop_of(cfg))
        vc = jax.vmap(core, in_axes=(0, 0, None, 0, 0, None, None, None,
                                     0, 0, 0))
        return jax.jit(jax.shard_map(
            vc, mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(None),
                      P(SHARD_AXIS), P(SHARD_AXIS), P(None), P(), P(),
                      P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
            check_vma=False),
            donate_argnums=(0, 1))

    step = _make_step(search_mode)
    # early-wave exact-prefix hybrid (see ops/construct.py): each
    # shard's backbone waves get exact streamed-scan candidates
    exact_prefix = _exact_prefix_of(cfg)
    flat_step = flat_ops_s = None
    if search_mode == "scan_fused" and exact_prefix > 0:
        flat_ops_s = _quantize_sharded(
            dev_pts[:, :min(n_s, exact_prefix)], fused=False)
        flat_step = _make_step("scan")

    offsets = np.zeros(16, np.int32)
    write_off = 0
    snap_list = []
    drops = 0

    # ---- checkpoint/resume ------------------------------------------------
    ckpt_key = f"sharded-v5:{s}:{n_s}:{dim}:{cfg.seed}:" \
               f"{cfg.ef_construction}:{m}:{cfg.ml}:{heur}:" \
               f"{cfg.wave_size}:{pend_cap}:{rev_rounds}:" \
               f"{cfg.max_iter_factor}:" \
               f"{getattr(cfg, 'construct_expand', 1)}:{search_mode}:" \
               f"{getattr(cfg, 'select_pd_dtype', 'bfloat16')}:" \
               f"{exact_prefix}:{_hop_of(cfg)}:" \
               f"{_pool_of(cfg, search_mode)}"
    resume_li, resume_ws, waves_done = -1, -1, 0
    if checkpoint is not None:
        import os
        if os.path.exists(checkpoint):
            with np.load(checkpoint, allow_pickle=False) as z:
                if str(z["key"]) == ckpt_key:
                    shard = NamedSharding(mesh, P(SHARD_AXIS))
                    adj = jax.device_put(jnp.asarray(z["adj"]), shard)
                    adjd = jax.device_put(jnp.asarray(z["adjd"]), shard)
                    stacked = jax.device_put(
                        jnp.asarray(z["stacked"]), shard)
                    offsets = z["offsets"].copy()
                    write_off = int(z["write_off"])
                    drops = int(z["drops"])
                    resume_li, resume_ws = int(z["li"]), int(z["ws"])

    def save_ckpt(li, ws):
        import os
        tmp = checkpoint + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, key=np.array(ckpt_key), adj=np.asarray(adj),
                     adjd=np.asarray(adjd), stacked=np.asarray(stacked),
                     offsets=offsets, write_off=write_off,
                     drops=int(drops), li=li, ws=ws)
        os.replace(tmp, checkpoint)

    done = 0
    total = s * n_s
    for li, (layer, start, end) in enumerate(ranges):
        zero_links = m0 if layer == 0 else m
        for ws, we in _wave_schedule(start, end, cfg.wave_size):
            if (li, ws) <= (resume_li, resume_ws):
                done += (we - ws) * s
                continue  # already inserted in the checkpointed state
            w = we - ws
            wb = _bucket(w, cfg.wave_size)
            wave = np.full(wb, -1, np.int32)
            wave[:w] = np.arange(ws, we, dtype=np.int32)
            if flat_step is not None and ws < exact_prefix:
                st_fn, (wc, wsc, wno) = flat_step, flat_ops_s
            else:
                st_fn, (wc, wsc, wno) = step, (codes, cscales, cnorms)
            adj, adjd, dd = st_fn(adj, adjd,
                                  jax.device_put(jnp.asarray(wave), repl),
                                  dev_pts, stacked,
                                  jax.device_put(jnp.asarray(offsets),
                                                 repl),
                                  jnp.int32(li), jnp.int32(zero_links),
                                  wc, wsc, wno)
            drops = drops + jnp.sum(dd)
            done += w * s
            waves_done += 1
            if progress is not None:
                progress(done, total, f"layer {layer}")
            if checkpoint is not None and waves_done % checkpoint_every == 0:
                drops = int(drops)  # sync before snapshotting state
                save_ckpt(li, ws)
        if layer > 0:
            end_p = _pal(end)
            if li < resume_li:
                # layer completed before the checkpoint: its snapshot is
                # already in the restored stacked buffer — slice it out
                off_phys = int(offsets[li]) // pack

                def _slice_snap(st):  # per-device blocks [1, ...]
                    sp = jax.lax.dynamic_slice(
                        st, (0, off_phys, 0),
                        (1, end_p // pack, m * pack))
                    return sp.reshape(1, end_p, m)[:, :end]

                snap = jax.jit(jax.shard_map(
                    _slice_snap, mesh=mesh, in_specs=P(SHARD_AXIS),
                    out_specs=P(SHARD_AXIS), check_vma=False))(stacked)
                snap_list.append(snap)
                continue
            snap = adj[:, :end, :m]
            snap_list.append(snap)
            off_phys = write_off // pack

            def _pack_update(st, sn):  # per-device blocks [1, ...]
                sp = jnp.pad(sn, ((0, 0), (0, end_p - end), (0, 0)),
                             constant_values=-1)
                sp = sp.reshape(1, end_p // pack, m * pack)
                return jax.lax.dynamic_update_slice(
                    st, sp, (0, off_phys, 0))

            stacked = jax.jit(jax.shard_map(
                _pack_update, mesh=mesh,
                in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
                out_specs=P(SHARD_AXIS), check_vma=False))(stacked, snap)
            offsets[li] = write_off
            write_off += end_p

    if checkpoint is not None:
        import os
        if os.path.exists(checkpoint):
            os.remove(checkpoint)  # build complete
    snap_list.reverse()
    from ..ops.construct import _warn_reverse_drops

    reverse_drops = int(drops)
    _warn_reverse_drops(reverse_drops, pend_cap, rev_rounds)
    return adj[:, :n_s], snap_list, reverse_drops
