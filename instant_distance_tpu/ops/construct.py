"""Wave-based batched HNSW construction — the TPU replacement for
rayon-parallel insertion.

The reference builds the graph by inserting points one at a time from a
rayon thread pool, synchronizing on per-node RwLocks (lib.rs:304-328,
437-528).  On TPU the same layer-by-layer schedule runs as *insertion
waves*: a batch of W points searches the frozen pre-wave graph together
(batched beam search), selects neighbors together (batched Alg. 4), and
commits forward + reverse edges with deterministic segment-sorted scatters
instead of locks.  Wave sizes double from 1 up to ``config.wave_size`` so
early points always see a graph comparable to their insertion order —
the batched analogue of sequential insertion order, and the reason recall
matches the reference's sequential build (see tests/test_construction.py).

Reverse-edge commit (the lock-free replacement for lib.rs:481-517):
  1. flatten all (target, source, dist) forward edges of the wave;
  2. sort by (target, dist) and segment by target — unique targets get a
     dense pending-additions table via rank-in-segment scatter;
  3. for every affected target, re-run neighbor selection over
     {current row} ∪ {pending additions} (Alg. 4, as the reference's
     ``add_neighbor_heuristic`` does per edge, lib.rs:616-631) or a
     sorted merge-truncate for simple selection;
  4. one scatter writes all rewritten rows — targets are unique, so the
     commit is conflict-free and deterministic.

All shapes are static for the whole build: adjacency is preallocated
[N+1, M*2] (row N is a write sink for padded lanes), upper-layer
snapshots live in one preallocated stacked buffer indexed by dynamic
offsets, and wave sizes are bucketed to powers of two.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, layer_sizes, resolve_seed
from .beam import beam_search_layer
from .distance import Metric, resolve
from . import select as sel_ops

_I32MAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------------
# upper-layer greedy descent over the stacked snapshot buffer
# ---------------------------------------------------------------------------

def _pack_factor(m: int) -> int:
    """Logical rows per 128-lane physical row of the stacked buffer.

    TPU pads the minor dimension to 128 lanes, so an [R, 32] int32 array
    physically occupies [R, 128] (4x waste).  The stacked snapshot buffer
    therefore stores ``128 // m`` logical rows per physical row."""
    return 128 // m if m <= 128 and 128 % m == 0 else 1


def _greedy_stacked(queries, stacked, offsets, n_upper, points,
                    metric: Metric, m: int, cur_d, cur_p,
                    max_iters: int = 512):
    """ef=1 greedy descent through ``n_upper`` stacked snapshot layers.

    ``stacked`` holds the concatenation (top layer first) of completed
    layer snapshots in lane-packed form ([cap/_pack_factor, m*_pack]);
    ``offsets[i]`` is the LOGICAL row offset of the i-th layer from the
    top (a multiple of the pack factor).  ``n_upper`` is dynamic, so one
    compiled program serves every target layer of the build.
    """
    b = queries.shape[0]
    pack = _pack_factor(m)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def layer_body(i, st):
        cd, cp = st
        off = offsets[i]

        def cond(s):
            it, _, _, done = s
            return (it < max_iters) & ~jnp.all(done)

        def body(s):
            it, cd, cp, done = s
            idx = off + jnp.clip(cp, 0)
            if pack == 1:
                nb = stacked[idx][:, :m]
            else:
                phys = stacked[idx // pack]                 # [B, m*pack]
                cols = (idx % pack)[:, None] * m + col0
                nb = jnp.take_along_axis(phys, cols, axis=1)
            nvalid = (nb >= 0) & ~done[:, None]
            nd = metric.gathered(queries, points[jnp.clip(nb, 0)])
            nd = jnp.where(nvalid, nd, jnp.inf)
            md = jnp.min(nd, axis=1)
            mp = jnp.min(jnp.where(nd == md[:, None], nb, _I32MAX), axis=1)
            better = (md < cd) | ((md == cd) & (mp < cp))
            step = better & ~done
            return (it + 1, jnp.where(step, md, cd),
                    jnp.where(step, mp, cp), done | ~better)

        _, cd, cp, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cd, cp, jnp.zeros(b, bool)))
        return cd, cp

    return jax.lax.fori_loop(0, n_upper, layer_body, (cur_d, cur_p))


# ---------------------------------------------------------------------------
# reverse-edge grouping
# ---------------------------------------------------------------------------

def _group_reverse_edges(sel_d, sel_p, wave_pids, n: int):
    """Group the wave's forward edges by target pid.

    Returns (utgt [E], uid_s [E], rank [E], dist [E], src [E], valid [E])
    where E = W * m0: the edges sorted by (target, distance), ``uid_s``
    the dense segment id per edge (E for invalid), ``rank`` the
    0-based position of the edge within its target's segment (nearest
    first), and ``utgt[u]`` the target pid of segment u (-1 for empty
    slots).  The caller windows ``rank`` into pend_cap-wide rounds.

    Segment ids are assigned in DESCENDING segment-size order (ties by
    ascending target pid): round r's participants are exactly the
    segments with more than r*pend_cap additions, so under this
    numbering they occupy the dense uid prefix [0, n_part_r) and the
    commit's chunk loop can bound itself per round — tail rounds touch
    only the handful of hub targets that actually overflowed, instead
    of re-gathering every active target's row each round.
    """
    w, m0 = sel_p.shape
    e = w * m0
    tgt = sel_p.reshape(e)
    dist = sel_d.reshape(e)
    src = jnp.repeat(wave_pids, m0)
    valid = (tgt >= 0) & (src >= 0)

    key = jnp.where(valid, tgt, _I32MAX)
    key, dist, src = jax.lax.sort((key, dist, src), dimension=0, num_keys=2,
                                  is_stable=True)
    valid = key != _I32MAX
    first = jnp.concatenate(
        [valid[:1], (key[1:] != key[:-1]) & valid[1:]])
    uid = jnp.cumsum(first) - 1                                  # [E]
    pos = jnp.arange(e)
    seg_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, -1))
    rank = pos - seg_pos                                         # [E]

    uid_s = jnp.where(valid, uid, e).astype(jnp.int32)
    utgt = jnp.full(e + 1, -1, jnp.int32).at[
        jnp.where(first, uid_s, e)].set(key, mode="drop")[:e]

    # renumber segments by (size desc, target asc): empty slots sort
    # last (positive key beats every negated size)
    sizes = jnp.zeros(e + 1, jnp.int32).at[uid_s].add(1)[:e]     # per uid
    ord_key = jnp.where(utgt >= 0, -sizes, 1)
    _, _, perm = jax.lax.sort(
        (ord_key, utgt, jnp.arange(e, dtype=jnp.int32)),
        dimension=0, num_keys=2, is_stable=True)                 # new->old
    new_of_old = jnp.zeros(e, jnp.int32).at[perm].set(
        jnp.arange(e, dtype=jnp.int32))
    utgt = utgt[perm]
    uid_s = jnp.where(uid_s < e, new_of_old[jnp.clip(uid_s, 0, e - 1)],
                      e).astype(jnp.int32)
    return utgt, uid_s, rank, dist, src, valid


def _pend_window(utgt, uid_s, rank, dist, src, valid, pend_cap: int, r: int):
    """Materialize round ``r``'s pending arrays: each target's additions
    with rank in [r*cap, (r+1)*cap), nearest first.  Targets with no
    addition in the window get utgt -1 (their rows are not touched)."""
    e = utgt.shape[0]
    lo = r * pend_cap
    in_win = valid & (rank >= lo) & (rank < lo + pend_cap)
    slot = jnp.where(in_win, rank - lo, pend_cap)
    pend_p = jnp.full((e + 1, pend_cap + 1), -1, jnp.int32).at[
        uid_s, slot].set(src, mode="drop")[:e, :pend_cap]
    pend_d = jnp.full((e + 1, pend_cap + 1), jnp.inf, jnp.float32).at[
        uid_s, slot].set(dist, mode="drop")[:e, :pend_cap]
    part = jnp.zeros(e + 1, bool).at[uid_s].max(in_win)[:e]
    return jnp.where(part, utgt, -1), pend_d, pend_p


# ---------------------------------------------------------------------------
# lane-packed adjacency rows
# ---------------------------------------------------------------------------
# TPU tiled layouts pad an array's minor dim to 128 lanes, so an
# [N+1, 64] int32 adjacency physically occupies 2x its logical bytes —
# and at 10M points the commit program's staging copies of adjacency +
# distance cache alone blew a v5e's 15.75 GB HBM (round-4 OOM log).
# Scan-mode builds therefore store `adj`/`adjd` lane-packed:
# `pk = 128 // m0` logical rows per 128-lane physical row
# ([ceil((N+1)/pk), pk*m0]), making the stored form exactly the compute
# form (zero padding, zero relayout copies).  Logical row i lives at
# [i // pk, (i % pk) * m0 : (i % pk + 1) * m0]; a plain row-major
# reshape to [-1, m0] is the unpack.

def _pk_factor(m0: int) -> int:
    """Rows per 128-lane physical row (1 = unpacked)."""
    return 128 // m0 if 128 % m0 == 0 and m0 < 128 else 1


def _pk_row_get(a, rows, pk: int, m0: int):
    """Gather logical rows [R] -> [R, m0] from a (possibly packed) a."""
    if pk == 1:
        return a[rows]
    full = a[rows // pk]                                  # [R, pk*m0]
    cols = (rows % pk)[:, None] * m0 + jnp.arange(m0)[None, :]
    return jnp.take_along_axis(full, cols, axis=1)


def _pk_row_set(a, rows, vals, pk: int, m0: int):
    """Scatter [R, m0] rows into logical positions ``rows``.

    Packed form writes element-wise at (row // pk, col) — two logical
    rows sharing a physical row write disjoint columns, so intra-batch
    conflicts are impossible for distinct pids (duplicate sink-row
    writes carry don't-care values, as in the unpacked path)."""
    if pk == 1:
        return a.at[rows].set(vals)
    cols = (rows % pk)[:, None] * m0 + jnp.arange(m0)[None, :]
    return a.at[(rows // pk)[:, None], cols].set(vals)


# ---------------------------------------------------------------------------
# the jitted wave step
# ---------------------------------------------------------------------------

def _merge_dedup_rerank(cand_d, cand_p, nd, nb, efc: int):
    """Merge hop candidates (nd, nb) into the pool, dedup by pid, and
    re-rank by (dist, pid).  Dedup relies on equal pids carrying equal
    exact distances, so which copy survives is immaterial; a pid-sort
    puts duplicates adjacent."""
    w = cand_p.shape[0]
    cp = jnp.concatenate([cand_p, nb], axis=1)
    cd = jnp.concatenate([cand_d, nd], axis=1)
    cp, cd = jax.lax.sort((cp, cd), dimension=1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((w, 1), bool),
         (cp[:, 1:] == cp[:, :-1]) & (cp[:, 1:] >= 0)], axis=1)
    cd = jnp.where(dup, jnp.inf, cd)
    cp = jnp.where(dup, -1, cp)
    cd, cp = jax.lax.sort((cd, cp), dimension=1, num_keys=2)
    return cd[:, :efc], cp[:, :efc]


def _hop_repair(q, cand_d, cand_p, adj, points, metric, hops: int):
    """Merge the graph neighbors of the top-``hops`` candidates into the
    candidate list (exact distances, deduped, re-ranked).

    Two jobs, one op:
    * **collision repair** — a true neighbor the fused bucket kernel
      lost to a stride-group collision is, with high probability,
      adjacent in the graph to a candidate that WAS found (the graph is
      navigable by construction), so one hop recovers it;
    * **diversity injection** — exact top-efc candidate pools build
      measurably worse graphs than the reference's beam pools (r2: scan
      0.972 vs beam 0.978 exact-graph recall at 1M): the beam's
      imperfection leaks search-path points into the pool, and Alg. 4's
      bridging rule (lib.rs:674-679) keeps some as long-range edges.
      The hop neighborhood restores that graph-local diversity source.

    Cost per wave: one [W, hops*m0] row gather + exact distances + two
    2-key sorts (dedup by pid, then re-rank by distance).
    """
    w, efc = cand_p.shape
    hops = min(hops, efc)
    top_p = cand_p[:, :hops]
    nb = adj[jnp.clip(top_p, 0)]                          # [W, h, m0]
    nb = jnp.where((top_p >= 0)[:, :, None], nb, -1).reshape(w, -1)
    nd = metric.gathered(q, points[jnp.clip(nb, 0)])
    nd = jnp.where(nb >= 0, nd, jnp.inf)
    return _merge_dedup_rerank(cand_d, cand_p, nd, nb, efc)


def search_select_core(wave_pids, points, stacked, offsets, n_upper,
                       zero_links, codes=None, scales=None, norms=None,
                       adj=None, *,
                       metric_name, efc: int, m: int, m0: int,
                       heuristic, max_iter_factor: int, expand: int = 1,
                       search_mode: str = "beam",
                       pd_dtype: str = "bfloat16", hop_repair: int = 0,
                       return_pool: bool = False,
                       debug_iters: bool = False):
    """Wave search + forward selection (Alg. 1-4 up to lib.rs:465-473).

    Returns ``(sel_d, sel_p)`` (``+ search_iters`` when ``debug_iters``):
    each wave point's selected forward neighbors, masked to -1/inf for
    padded lanes.  ``adj`` is needed ONLY by the beam search mode, the
    hop-repair expansion, and ``extend_candidates`` — the default
    scan-mode configuration never touches it, which is what lets
    ``build_graph`` run search and commit as two separate XLA programs:
    the monolithic wave program's peak HBM plan holds staging copies of
    the [N+1, m0] adjacency arrays AND the scan operands simultaneously
    (21.2 GB at 10M x 96 — over a v5e's 15.75 GB), while neither half
    needs both.

    ``search_mode``:
      * ``"beam"`` — batched graph beam search of the pre-wave graph
        (the reference's Alg. 1 descent + Alg. 2 search, lib.rs:447-463).
        Row-gather bound: each iteration issues W*expand*m0 scattered
        point-row fetches at ~11 ns/row, x ~30-50 iterations per wave.
      * ``"scan"`` — MXU int8 prefix scan (requires ``codes``/``scales``/
        ``norms`` from ``ops.packed.quantize_points``): the wave's
        candidates are the TRUE top-efc of the already-inserted prefix,
        found by one quantized matmul over pids < wave start + an exact
        f32 rerank.  The reference searches the graph only because a CPU
        cannot afford the exhaustive scan (lib.rs:447: "Find the entry
        point..."); on TPU the scan is ~50x cheaper than walking, and
        strictly better candidates -> same-or-better graphs (Alg. 4
        selection sees the exact neighborhood).
    """
    metric = resolve(metric_name)
    w = wave_pids.shape[0]
    wvalid = wave_pids >= 0
    q = points[jnp.clip(wave_pids, 0)]                       # [W, D]
    if q.dtype != jnp.float32:
        q = q.astype(jnp.float32)

    search_iters = jnp.int32(0)
    if search_mode == "scan_fused" and _use_pack(metric_name, q.shape[1]):
        # --- packed-key int-epilogue Pallas scan over the prefix --------
        # (ops/scan_kernel.fused_scan_bucket_int_packed: ONE int32 output
        # at lsub=64 — 1/16 the candidate-array HBM traffic of a
        # per-point-scale f32 bucket scan at lsub=8; the shared-scale
        # rank noise is repaired by the exact rerank below, and the
        # wider stride groups' losses are absorbed by the deep default
        # candidate pool (3*efc, _pool_of) — the measured mechanism.
        # Hop expansion (construct_hop_repair, default 0) is an
        # optional extra-repair knob, not part of the default path.)
        from .scan_kernel import (PACK_THRESH,
                                  fused_scan_bucket_int_packed, pack_w2)

        filled = wave_pids[0]  # builders put the lowest pid in lane 0
        lsub, cbk = _FUSED_PACK_LSUB, _FUSED_PACK_CB
        ct = cbk // lsub
        sg = scales                                       # shared scale
        qs = jnp.maximum(jnp.max(jnp.abs(q)), 1e-30) / 127.0
        qc = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
        denom = 2.0 * qs * sg
        col = jax.lax.broadcasted_iota(jnp.int32, norms.shape, 1)
        qb = max(32, min(256, w))      # int8 sublane minimum is 32
        qpad = (-w) % qb
        if qpad:
            qc = jnp.concatenate(
                [qc, jnp.broadcast_to(qc[:1], (qpad, qc.shape[1]))])

        def _pack_chunk(cs: int, ce: int, qc_c):
            """Scan table columns [cs, ce) -> (keys [W, k_sel], global
            pids [W, k_sel]).  Packed keys share the global quantized
            scale so they are comparable ACROSS chunks — the multi-chunk
            merge below is a pure key merge, no re-scoring."""
            w2_c = pack_w2(norms[:, cs:ce], denom,
                           col[:, cs:ce] < filled, lsub=lsub, cb=cbk,
                           d=q.shape[1])
            od = fused_scan_bucket_int_packed(
                qc_c, w2_c, codes[:, cs:ce], lsub=lsub, qb=qb, cb=cbk,
                interpret=jax.default_backend() == "cpu")[:w]
            k_sel = min(efc, od.shape[1])
            # keys are non-negative (pack_w2 bias) so the f32 BITCAST is
            # order-preserving — no converted copy of the key array;
            # exact int keys re-gathered by position before decoding ids
            _, nidx = jax.lax.approx_min_k(
                jax.lax.bitcast_convert_type(od, jnp.float32), k_sel,
                recall_target=0.999)
            keys = jnp.take_along_axis(od, nidx, axis=1)
            blk = nidx // ct
            lane = nidx % ct
            pid = cs + blk * cbk + (keys & (lsub - 1)) * ct + lane
            return keys, jnp.where(keys < PACK_THRESH, pid, -1)

        npad_cols = norms.shape[1]
        # bound the [W, cols/lsub] stride-min temporaries: one whole
        # -table call allocates ~2.7 GB (+ selection copies) at 10M x
        # 4096-wave — that plus the ~9 GB persistent build plan OOMs a
        # 16 GB chip.  Above _PACK_CHUNK_COLS columns, scan in chunks
        # and merge the per-chunk top-efc by key (the keys are globally
        # comparable); below it the tuned single-call path is unchanged.
        chunk_cols = _PACK_CHUNK_COLS
        if npad_cols <= chunk_cols:
            keys, cand_p = _pack_chunk(0, npad_cols, qc)
            k_sel = keys.shape[1]
        else:
            # optimization_barrier chains chunk i+1's query operand to
            # chunk i's result: XLA must run the chunks SEQUENTIALLY, so
            # the allocator reuses one chunk's stride-min buffers
            # instead of scheduling all chunks to overlap (which puts
            # every chunk's temporaries live at once — measured +2 GB)
            parts, tok = [], qc
            for cs in range(0, npad_cols, chunk_cols):
                qc_c = jax.lax.optimization_barrier((qc, tok))[0]
                k_c, p_c = _pack_chunk(
                    cs, min(cs + chunk_cols, npad_cols), qc_c)
                parts.append((k_c, p_c))
                tok = k_c
            keys = jnp.concatenate([p[0] for p in parts], axis=1)
            pids = jnp.concatenate([p[1] for p in parts], axis=1)
            keys, cand_p = jax.lax.sort((keys, pids), dimension=1,
                                        num_keys=2)
            k_sel = min(efc, keys.shape[1])
            keys, cand_p = keys[:, :k_sel], cand_p[:, :k_sel]
        cand_p = jnp.where(keys < PACK_THRESH, cand_p, -1)
        if k_sel < efc:
            cand_p = jnp.pad(cand_p, ((0, 0), (0, efc - k_sel)),
                             constant_values=-1)
        # exact rerank (selection runs on true distances, like the
        # reference's Search results)
        cand_d = metric.gathered(q, points[jnp.clip(cand_p, 0)])
        cand_d = jnp.where(cand_p >= 0, cand_d, jnp.inf)
        cand_d, cand_p = jax.lax.sort((cand_d, cand_p), dimension=1,
                                      num_keys=2)
    elif search_mode == "scan_fused":
        # --- Pallas fused bucket scan over the inserted prefix ----------
        from ..models.scan import _quantize_queries
        from .scan_kernel import fused_scan_bucket

        is_dot = (isinstance(metric_name, str)
                  and metric_name in ("dot", "cosine"))
        filled = wave_pids[0]  # builders put the lowest pid in lane 0
        npad = norms.shape[1]
        prefix = jax.lax.broadcasted_iota(
            jnp.int32, (1, npad), 1) < filled
        # norms is |p_hat|^2 for L2 modes, the 0-bias for dot/cosine
        # (_quantize_for_scan); non-prefix points get +inf either way
        nm = jnp.where(prefix, norms, jnp.inf)
        qc, qs = _quantize_queries(q)
        if metric_name == "cosine":
            qn = jnp.sqrt(jnp.sum(q * q, axis=1))
            qs = qs / jnp.maximum(qn, 1e-30)
        qb = max(32, min(256, w))      # int8 sublane minimum is 32
        qpad = (-w) % qb
        if qpad:
            qc = jnp.concatenate(
                [qc, jnp.broadcast_to(qc[:1], (qpad, qc.shape[1]))])
            qs = jnp.concatenate([qs, jnp.broadcast_to(qs[:1], (qpad,))])
        od, oi = fused_scan_bucket(qc, qs[:, None], codes, scales, nm,
                                   lsub=_FUSED_LSUB, qb=qb, cb=_FUSED_CB,
                                   is_dot=is_dot,
                                   interpret=jax.default_backend() == "cpu")
        od, oi = od[:w], oi[:w]
        k_sel = min(efc, od.shape[1])
        # candidate quality feeds graph quality: merge at a much tighter
        # recall target than serving (which has the rerank safety net) —
        # the r2 build's 0.99 here cost exact-graph recall (VERDICT r2
        # item 1); stride-group losses are repaired by _hop_repair
        md, nidx = jax.lax.approx_min_k(od, k_sel, recall_target=0.999)
        cand_p = jnp.take_along_axis(oi, nidx, axis=1)
        cand_p = jnp.where(jnp.isfinite(md), cand_p, -1)
        if k_sel < efc:
            cand_p = jnp.pad(cand_p, ((0, 0), (0, efc - k_sel)),
                             constant_values=-1)
        # exact rerank (selection runs on true distances, like the
        # reference's Search results)
        cand_d = metric.gathered(q, points[jnp.clip(cand_p, 0)])
        cand_d = jnp.where(cand_p >= 0, cand_d, jnp.inf)
        cand_d, cand_p = jax.lax.sort((cand_d, cand_p), dimension=1,
                                      num_keys=2)
    elif search_mode == "scan":
        # --- MXU prefix scan: exact top-efc of pids < wave start --------
        from ..models.scan import scan_candidates

        filled = wave_pids[0]  # builders put the lowest pid in lane 0
        # codes may cover only the exact-prefix region (hybrid builds
        # hand early waves sliced flat operands; see build_graph)
        npts = codes.shape[0]
        prefix = jax.lax.broadcasted_iota(
            jnp.int32, (npts, 1), 0)[:, 0] < filled
        # per-chunk approx_min_k losses compound across n/chunk chunks
        # and there is no serving-time rerank to repair edge quality —
        # construction merges run essentially exact (0.9999)
        cand_ad, cand_p = scan_candidates(
            q, codes, scales, norms, prefix,
            metric_name=(metric_name if isinstance(metric_name, str)
                         else "sqeuclidean"),
            ef=efc, chunk=min(1 << 17, npts), approx_topk=True,
            approx_recall=0.9999)
        # exact rerank (selection runs on true distances, like the
        # reference's Search results)
        cand_d = metric.gathered(q, points[jnp.clip(cand_p, 0)])
        cand_d = jnp.where(cand_p >= 0, cand_d, jnp.inf)
        cand_d, cand_p = jax.lax.sort((cand_d, cand_p), dimension=1,
                                      num_keys=2)
    else:
        # --- graph beam search (Alg. 1 descent, lib.rs:447-463) ---------
        d0 = metric.gathered(
            q, points[jnp.zeros((w, 1), jnp.int32)])[:, 0]
        cur_d, cur_p = _greedy_stacked(q, stacked, offsets, n_upper,
                                       points, metric, m, d0,
                                       jnp.zeros(w, jnp.int32))
        beam_d = jnp.full((w, efc), jnp.inf, jnp.float32).at[:, 0].set(
            cur_d)
        beam_p = jnp.full((w, efc), -1, jnp.int32).at[:, 0].set(cur_p)
        beam_e = jnp.zeros((w, efc), bool)
        res = beam_search_layer(
            q, adj, points, metric, beam_d, beam_p, beam_e,
            links=zero_links, max_iters=max_iter_factor * efc + 16,
            expand=expand, return_iters=debug_iters)
        if debug_iters:
            cand_d, cand_p, search_iters = res
        else:
            cand_d, cand_p = res

    # --- hop expansion: collision repair + bridge-candidate diversity ---
    if search_mode.startswith("scan") and hop_repair > 0:
        cand_d, cand_p = _hop_repair(q, cand_d, cand_p, adj, points,
                                     metric, hop_repair)

    # --- intra-wave visibility ------------------------------------------
    # Sequential insertion lets point j find points i < j of the same
    # wave through the graph; batched waves search the frozen pre-wave
    # graph, so same-wave near neighbors (e.g. a tight cluster arriving
    # together) would be mutually invisible and whole clusters could end
    # up unreachable.  Restore the sequential-order property by computing
    # the wave's own pairwise distances (one MXU matmul) and merging each
    # point's nearest wave peers into its candidate list, where they
    # compete by distance under the same efc cap as search results.
    if w > 1:
        if metric.matmul_form:
            pw = metric.pairwise(q, q)                         # [W, W]
        else:
            pw = metric.gathered(q, jnp.broadcast_to(
                q[None], (w, w, q.shape[1])))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        bad = ((iota_r == iota_c) | (wave_pids < 0)[None, :]
               | (wave_pids < 0)[:, None])
        pw = jnp.where(bad, jnp.inf, pw)
        k_peers = min(m0, w)
        # top-k_peers, not a full [W, W] sort: the bitonic sort of a
        # 4096-wide row is ~100x the work of approx_min_k and was a
        # dominant fixed cost of every wave.  Ties break by column
        # index == ascending pid (wave pids are sorted), matching the
        # Candidate order the full sort used.  recall_target 0.999:
        # the default 0.95 silently lost ~5% of each point's nearest
        # wave peers — a graph-quality leak in BOTH build modes.
        peer_d, pidx = jax.lax.approx_min_k(pw, k_peers,
                                            recall_target=0.999)
        peer_p = jnp.where(jnp.isfinite(peer_d),
                           wave_pids[jnp.clip(pidx, 0)], -1)
        cd = jnp.concatenate([cand_d, peer_d], axis=1)
        cp = jnp.concatenate([cand_p, peer_p], axis=1)
        cand_d, cand_p = jax.lax.sort((cd, cp), dimension=1, num_keys=2)
        cand_d, cand_p = cand_d[:, :efc], cand_p[:, :efc]

    # --- pool handoff (sampled builds): selection moves into the commit
    # program, after its graph-hop repair widens the pool with
    # neighbors the capped sample scan could not see (repair needs the
    # adjacency, which only the commit program holds — the split
    # search/commit memory plan survives; see repair_commit_core) ------
    if return_pool:
        cand_p = jnp.where(wvalid[:, None], cand_p, -1)
        cand_d = jnp.where(cand_p >= 0, cand_d, jnp.inf)
        if debug_iters:
            return cand_d, cand_p, search_iters
        return cand_d, cand_p

    # --- forward selection (lib.rs:465-473) -----------------------------
    if heuristic is None:
        sel_d, sel_p = sel_ops.select_simple(cand_d, cand_p, m0)
    else:
        extend, keep_pruned = heuristic
        if extend:
            cand_d, cand_p = sel_ops.extend_candidates(
                q, cand_d, cand_p, adj, points, metric,
                links=zero_links, cap=efc + m0)
        cand_pts = points[jnp.clip(cand_p, 0)]
        sel_d, sel_p = sel_ops.select_heuristic(
            q, cand_d, cand_p, cand_pts, metric, m0,
            keep_pruned=keep_pruned, pd_dtype=jnp.dtype(pd_dtype))
    sel_p = jnp.where(wvalid[:, None], sel_p, -1)
    sel_d = jnp.where(sel_p >= 0, sel_d, jnp.inf)
    if debug_iters:
        return sel_d, sel_p, search_iters
    return sel_d, sel_p


def commit_core(adj, adjd, wave_pids, points, sel_d, sel_p, *,
                metric_name, m0: int, heuristic, rev_chunk: int,
                pend_cap: int, rev_rounds: int = 4,
                pd_dtype: str = "bfloat16", pk: int = 1,
                n_points: int = -1, debug_iters: bool = False):
    """Commit one wave's selected edges: forward rows + grouped reverse
    re-selection (lib.rs:481-517).

    ``adj``/``adjd`` are [N+1, m0] (row N is the padded-lane write sink)
    and should be DONATED by the jit wrapper — the update is in place.
    With ``pk > 1`` they are lane-packed instead —
    [ceil((N+1)/pk), pk*m0] with pk logical rows per 128-lane physical
    row (see the ``_pk_*`` helpers above; ``n_points`` supplies N, which
    the packed shape no longer determines) — so a 64-wide adjacency at
    10M points doesn't pay TPU's 2x minor-dim padding on storage or on
    the program's staging copies.
    Returns ``(adj, adjd, n_dropped)`` (``+ rounds_run`` when
    ``debug_iters``); ``n_dropped`` counts reverse-edge additions lost
    to the ``pend_cap`` overflow (see ``_group_reverse_edges``) —
    builders accumulate it and warn.
    """
    metric = resolve(metric_name)
    n = n_points if n_points >= 0 else adj.shape[0] - 1
    w = wave_pids.shape[0]
    wvalid = wave_pids >= 0

    # --- commit forward rows (node.set(i, pid), lib.rs:516) -------------
    rows = jnp.where(wvalid, wave_pids, n)
    adj = _pk_row_set(adj, rows, sel_p, pk, m0)
    adjd = _pk_row_set(adjd, rows, sel_d.astype(adjd.dtype), pk, m0)

    # --- group + commit reverse edges (lib.rs:481-515) ------------------
    # Grouping sorts the W*m0 edges by (target, distance); each target's
    # pending additions are then committed in rounds of ``pend_cap``
    # nearest-first, with the target's row RE-SELECTED between rounds —
    # mirroring the reference's sequential per-edge re-selection, in
    # nearest-first batches.  Rounds run under a lax.while_loop that
    # stops as soon as no addition remains, so extra rounds cost nothing
    # unless some target actually overflowed pend_cap.  ``rev_rounds``
    # 0/None = auto: cap at ceil(W / pend_cap) rounds — a target can
    # receive at most one addition per wave point (forward rows are
    # duplicate-free), so this bound makes the commit LOSSLESS by
    # construction.  An explicit rev_rounds is a hard cap; additions
    # beyond rev_rounds*pend_cap are then dropped, and counted.
    utgt, uid_s, rank, gdist, gsrc, gvalid = _group_reverse_edges(
        sel_d, sel_p, wave_pids, n)
    u = utgt.shape[0]
    max_rounds = rev_rounds if rev_rounds else -(-w // pend_cap)
    n_dropped = jnp.sum(
        gvalid & (rank >= max_rounds * pend_cap)).astype(jnp.int32)

    def rev_chunk_fn(adj, adjd, args):
        ut, pd_, pp_ = args                                # [RC], [RC, A]
        ut_c = jnp.clip(ut, 0)
        row_p = _pk_row_get(adj, ut_c, pk, m0)
        row_d = jnp.where(row_p >= 0,
                          _pk_row_get(adjd, ut_c, pk, m0)
                          .astype(jnp.float32), jnp.inf)
        comb_p = jnp.concatenate([row_p, pp_], axis=1)
        comb_d = jnp.concatenate(
            [row_d, jnp.where(pp_ >= 0, pd_, jnp.inf)], axis=1)
        comb_p = jnp.where(jnp.isfinite(comb_d), comb_p, -1)
        # Candidate list sorted by (dist, pid).  Unlike the reference's
        # per-edge re-selection (capped at efc, lib.rs:439-441) the full
        # row+pending union goes to selection: truncating by distance
        # here would drop exactly the far "bridge" candidates the Alg. 4
        # rule exists to keep, orphaning tight clusters.
        cd, cp = jax.lax.sort((comb_d, comb_p), dimension=1, num_keys=2)
        # dedup (a wave point may both select and be selected by a peer):
        # equal pids sort adjacent — invalidate repeats
        dup = jnp.concatenate(
            [jnp.zeros((cp.shape[0], 1), bool),
             (cp[:, 1:] == cp[:, :-1]) & (cp[:, 1:] >= 0)], axis=1)
        cd = jnp.where(dup, jnp.inf, cd)
        cp = jnp.where(dup, -1, cp)
        cd, cp = jax.lax.sort((cd, cp), dimension=1, num_keys=2)
        if heuristic is None:
            return sel_ops.select_simple(cd, cp, m0)
        tq = points[ut_c]
        cpts = points[jnp.clip(cp, 0)]
        return sel_ops.select_heuristic(
            tq, cd, cp, cpts, metric, m0, keep_pruned=heuristic[1],
            pd_dtype=jnp.dtype(pd_dtype))

    # participating segments occupy a dense-uid prefix (grouping numbers
    # them by size desc), so each round's chunk loop is bounded by that
    # round's own participant count — the E = W*m0 slot table is mostly
    # padding (unique targets << slots), and round 0's bound is the
    # active-target count while tail rounds shrink to the few hub
    # targets that actually overflowed pend_cap
    rc = min(rev_chunk, u)
    n_chunks = (u + rc - 1) // rc
    pad = n_chunks * rc - u

    def commit_round(adj, adjd, r):
        ut_r, pend_d, pend_p = _pend_window(
            utgt, uid_s, rank, gdist, gsrc, gvalid, pend_cap, r)
        ut_p = jnp.pad(ut_r, (0, pad), constant_values=-1)
        pd_p = jnp.pad(pend_d, ((0, pad), (0, 0)),
                       constant_values=np.inf)
        pp_p = jnp.pad(pend_p, ((0, pad), (0, 0)), constant_values=-1)
        n_part = jnp.max(jnp.where(
            gvalid & (rank >= r * pend_cap), uid_s + 1, 0))
        nch = (n_part + rc - 1) // rc  # traced per-round chunk bound

        # chunks write disjoint target rows and each chunk reads only
        # its own targets' rows, so chunk-sequential commit is exactly
        # the old all-at-once scatter
        def chunk_cond(st):
            ci, _, _ = st
            return ci < nch

        def chunk_body(st):
            ci, adj, adjd = st
            off = ci * rc
            ut = jax.lax.dynamic_slice(ut_p, (off,), (rc,))
            pd_ = jax.lax.dynamic_slice(pd_p, (off, 0), (rc, pend_cap))
            pp_ = jax.lax.dynamic_slice(pp_p, (off, 0), (rc, pend_cap))
            new_d, new_p = rev_chunk_fn(adj, adjd, (ut, pd_, pp_))
            trows = jnp.where(ut >= 0, ut, n)
            adj = _pk_row_set(adj, trows, new_p, pk, m0)
            adjd = _pk_row_set(adjd, trows, new_d.astype(adjd.dtype),
                               pk, m0)
            return ci + 1, adj, adjd

        _, adj, adjd = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), adj, adjd))
        return adj, adjd

    def round_cond(state):
        r, _, _ = state
        return (r < max_rounds) & jnp.any(gvalid & (rank >= r * pend_cap))

    def round_body(state):
        r, adj, adjd = state
        adj, adjd = commit_round(adj, adjd, r)
        return r + 1, adj, adjd

    rounds_run, adj, adjd = jax.lax.while_loop(
        round_cond, round_body, (jnp.int32(0), adj, adjd))
    if debug_iters:
        return adj, adjd, n_dropped, rounds_run
    return adj, adjd, n_dropped


def repair_commit_core(adj, adjd, wave_pids, points, cand_d, cand_p, *,
                       metric_name, m0: int, heuristic, rev_chunk: int,
                       pend_cap: int, rev_rounds: int = 4,
                       pd_dtype: str = "bfloat16", pk: int = 1,
                       n_points: int = -1, hops: int = 16):
    """Graph-hop pool repair + Alg. 3/4 selection + commit — one program
    (sampled scan builds, Config.construct_sample_cols).

    The capped sample scan can miss true neighbors outside the sampled
    prefix; with high probability those are adjacent in the PRE-WAVE
    graph to candidates that WERE found (sample points' rows accumulate
    reverse edges from every later insert, lib.rs:481-515), so one hop
    over the adjacency recovers them before selection.  The hop needs
    ``adj`` — running it here instead of in the wave search keeps the
    search program adjacency-free, preserving the split search/commit
    memory plan that the 10M build needs (see build_graph).

    ``cand_d``/``cand_p`` are the search program's candidate pool
    (``return_pool=True``), exact-reranked and wave-peer-merged.
    """
    metric = resolve(metric_name)
    w, efc = cand_p.shape
    wvalid = wave_pids >= 0
    q = points[jnp.clip(wave_pids, 0)]
    if q.dtype != jnp.float32:
        q = q.astype(jnp.float32)
    h = min(hops, efc)
    if h > 0:
        top_p = cand_p[:, :h]
        nb = _pk_row_get(adj, jnp.clip(top_p, 0).reshape(-1), pk,
                         m0).reshape(w, h, m0)
        nb = jnp.where((top_p >= 0)[:, :, None], nb, -1).reshape(w, -1)
        # hop distances in sequential column chunks: one [W, h*m0, D]
        # f32 gather is a ~2 GB HLO temp at 10M shapes (4096 x 1024 x
        # 128) on a chip already holding the ~9.6 GB build plan.  The
        # optimization_barrier chains chunk i+1's query operand to
        # chunk i's result so XLA cannot overlap the chunks' gather
        # temporaries (same trick as the packed-scan chunk loop).
        parts, tok = [], q
        ch = 256
        for cs in range(0, nb.shape[1], ch):
            q_c = jax.lax.optimization_barrier((q, tok))[0]
            sub = nb[:, cs:cs + ch]
            sd = metric.gathered(q_c, points[jnp.clip(sub, 0)])
            sd = jnp.where(sub >= 0, sd.astype(jnp.float32), jnp.inf)
            parts.append(sd)
            tok = sd
        nd = jnp.concatenate(parts, axis=1)
        cand_d, cand_p = _merge_dedup_rerank(cand_d, cand_p, nd, nb, efc)
    # forward selection (lib.rs:465-473); extend_candidates never runs
    # here (split builds require it off — build_graph's split_waves)
    if heuristic is None:
        sel_d, sel_p = sel_ops.select_simple(cand_d, cand_p, m0)
    else:
        cand_pts = points[jnp.clip(cand_p, 0)]
        sel_d, sel_p = sel_ops.select_heuristic(
            q, cand_d, cand_p, cand_pts, metric, m0,
            keep_pruned=heuristic[1], pd_dtype=jnp.dtype(pd_dtype))
    sel_p = jnp.where(wvalid[:, None], sel_p, -1)
    sel_d = jnp.where(sel_p >= 0, sel_d, jnp.inf)
    return commit_core(adj, adjd, wave_pids, points, sel_d, sel_p,
                       metric_name=metric_name, m0=m0,
                       heuristic=heuristic, rev_chunk=rev_chunk,
                       pend_cap=pend_cap, rev_rounds=rev_rounds,
                       pd_dtype=pd_dtype, pk=pk, n_points=n_points)


def wave_step_core(adj, adjd, wave_pids, points, stacked, offsets, n_upper,
                   zero_links, codes=None, scales=None, norms=None, *,
                   metric_name, efc: int, m: int, m0: int,
                   heuristic, rev_chunk: int, pend_cap: int,
                   max_iter_factor: int, expand: int = 1,
                   rev_rounds: int = 4, search_mode: str = "beam",
                   pd_dtype: str = "bfloat16", hop_repair: int = 0,
                   debug_iters: bool = False):
    """Insert one wave of points: search, select, commit edges — the
    monolithic composition of :func:`search_select_core` +
    :func:`commit_core` (one XLA program; see those for semantics).
    Beam-mode builds use this (the search itself reads ``adj``); scan
    -mode builds at default settings run the two halves as separate
    programs instead (``build_graph``) to halve the peak HBM plan.

    Returns ``(adj, adjd, n_dropped)``; ``debug_iters`` appends the wave
    search's beam iteration count and the reverse-commit rounds executed
    (diagnostics only).
    """
    res = search_select_core(
        wave_pids, points, stacked, offsets, n_upper, zero_links,
        codes, scales, norms, adj,
        metric_name=metric_name, efc=efc, m=m, m0=m0,
        heuristic=heuristic, max_iter_factor=max_iter_factor,
        expand=expand, search_mode=search_mode, pd_dtype=pd_dtype,
        hop_repair=hop_repair, debug_iters=debug_iters)
    if debug_iters:
        sel_d, sel_p, search_iters = res
    else:
        sel_d, sel_p = res
    cres = commit_core(adj, adjd, wave_pids, points, sel_d, sel_p,
                       metric_name=metric_name, m0=m0,
                       heuristic=heuristic, rev_chunk=rev_chunk,
                       pend_cap=pend_cap, rev_rounds=rev_rounds,
                       pd_dtype=pd_dtype, debug_iters=debug_iters)
    if debug_iters:
        adj, adjd, n_dropped, rounds_run = cres
        return adj, adjd, n_dropped, search_iters, rounds_run
    return cres


_wave_step = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "efc", "m", "m0", "heuristic",
                     "rev_chunk", "pend_cap", "max_iter_factor", "expand",
                     "rev_rounds", "search_mode", "pd_dtype", "hop_repair",
                     "debug_iters"),
    donate_argnames=("adj", "adjd"))(wave_step_core)

#: Split wave programs (scan modes at default settings): the search
#: half never reads the adjacency, the commit half never reads the scan
#: operands — two programs whose individual HBM plans stay well under
#: the monolith's (which OOM'd a v5e at 10M x 96).
_search_step = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "efc", "m", "m0", "heuristic",
                     "max_iter_factor", "expand", "search_mode",
                     "pd_dtype", "hop_repair", "return_pool",
                     "debug_iters"))(
    search_select_core)
_repair_commit_step = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "m0", "heuristic", "rev_chunk",
                     "pend_cap", "rev_rounds", "pd_dtype", "pk",
                     "n_points", "hops"),
    donate_argnames=("adj", "adjd"))(repair_commit_core)
_commit_step = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "m0", "heuristic", "rev_chunk",
                     "pend_cap", "rev_rounds", "pd_dtype", "pk",
                     "n_points", "debug_iters"),
    donate_argnames=("adj", "adjd"))(commit_core)


def _resolve_search_mode(cfg, metric_name) -> str:
    """Config.construct_mode -> concrete wave-search mode.

    "auto" picks the MXU prefix scan whenever the metric is a named
    matmul form; on a real TPU with an L2-form metric the scan runs as
    the fused Pallas bucket kernel ("scan_fused" — the XLA streamed
    scan's [W, chunk] score matrix costs ~10x the kernel in HBM
    traffic).  Custom callables fall back to the graph beam search,
    which only needs ``Metric.gathered``."""
    mode = getattr(cfg, "construct_mode", "auto") or "auto"
    if mode not in ("auto", "beam", "scan", "scan_fused"):
        raise ValueError(
            f"construct_mode must be one of auto/beam/scan/scan_fused, "
            f"got {mode!r}")
    if mode == "auto":
        if not isinstance(metric_name, str):
            return "beam"
        mode = "scan"
    if (mode == "scan" and jax.default_backend() != "cpu"
            and metric_name in ("sqeuclidean", "euclidean", "dot",
                                "cosine")):
        return "scan_fused"
    return mode


_FUSED_CB = 4096   # fused construction scan (f32 variant): point block
#: Stride-group width of the f32 fused construction scan.  A true
#: candidate is lost when a nearer point shares its group: expected
#: losses among the top-efc are ~efc^2*lsub/(2*prefix) — ~1.2 of 100 at
#: the hybrid switchover prefix (131072), falling as the prefix grows,
#: and the one-hop candidate expansion (``_hop_repair``) recovers them.
#: cb/lsub must stay a 128-lane multiple: 4096/32 = 128.
_FUSED_LSUB = 32
#: Packed-key int-epilogue construction scan (L2 metrics, D*lsub <=
#: 16384): one int32 output at lsub=64 — 1/16 the candidate-array HBM
#: traffic of the r2 lsub=8 configuration at equal-or-better quality
#: (shared-scale rank noise and group collisions are both repaired by
#: the exact rerank + hop expansion).  cb/lsub = 8192/64 = 128 lanes.
_FUSED_PACK_CB = 8192
_FUSED_PACK_LSUB = 64
#: Column-chunk width of the packed-key construction scan: tables wider
#: than this are scanned in chunks with a cross-chunk key merge, which
#: bounds the [wave, cols/lsub] stride-min temporaries (a whole-table
#: call at 10M allocates ~2.7 GB + selection copies).  Tests shrink it
#: to exercise the merge at CPU scale.
_PACK_CHUNK_COLS = 1 << 22


def _use_pack(metric_name, d: int) -> bool:
    """Whether the fused construction scan runs the packed-key int
    kernel (L2-only rank trick; packed keys need D*lsub <= 16384)."""
    return (isinstance(metric_name, str)
            and metric_name in ("sqeuclidean", "euclidean")
            and d * _FUSED_PACK_LSUB <= 16384)
#: Waves whose inserted prefix is below this use the exact streamed scan
#: (see Config.construct_exact_prefix).
_SCAN_EXACT_PREFIX = 1 << 17


def _quantize_for_scan(points, fused: bool = False,
                       metric_name: str = "sqeuclidean"):
    """Scan-mode wave-search operands (per-point symmetric int8, the
    same scheme the serving scan uses).

    flat  (fused=False): (codes [N, D] int8, scales [N], norms [N]) for
        the XLA streamed ``scan_candidates`` (which applies metric
        forms itself — flat norms are always |p_hat|^2).
    fused (fused=True):  (codes_t [D, Npad] int8, scales [1, Npad],
        norms [1, Npad] with +inf padding) for the Pallas bucket kernel
        — transposed and padded to the kernel's point-block multiple.
        For dot/cosine the kernel runs in is_dot form: norms become the
        0/+inf eligibility bias and cosine folds 1/|p_hat| into the
        scales (mirrors models/scan.py ScanIndex._fused_arrays).
    """
    from .packed import quantize_points

    codes, scales = quantize_points(points)
    deq = codes.astype(jnp.float32) * scales[:, None]
    norms = jnp.sum(deq * deq, axis=1)
    if not fused:
        return codes, scales, norms
    if _use_pack(metric_name, points.shape[1]):
        # shared-scale operands for the packed-key int kernel: ONE
        # global point scale (mirrors ScanIndex._fused_int_arrays)
        pts = jnp.asarray(points, jnp.float32)
        sg = jnp.maximum(jnp.max(jnp.abs(pts)), 1e-30) / 127.0
        codes_g = jnp.clip(jnp.round(pts / sg), -127,
                           127).astype(jnp.int8)
        deq_g = codes_g.astype(jnp.float32) * sg
        norms_g = jnp.sum(deq_g * deq_g, axis=1)
        npad = (-pts.shape[0]) % _FUSED_PACK_CB
        codes_t = jnp.pad(codes_g, ((0, npad), (0, 0))).T
        norms_r = jnp.pad(norms_g, (0, npad),
                          constant_values=np.inf)[None, :]
        return codes_t, sg, norms_r
    n = codes.shape[0]
    npad = (-n) % _FUSED_CB
    codes_t = jnp.pad(codes, ((0, npad), (0, 0))).T
    if metric_name == "cosine":
        scales = scales * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))
    scales_r = jnp.pad(scales, (0, npad))[None, :]
    base = (norms if metric_name in ("sqeuclidean", "euclidean")
            else jnp.zeros_like(norms))
    norms_r = jnp.pad(base, (0, npad), constant_values=np.inf)[None, :]
    return codes_t, scales_r, norms_r


# ---------------------------------------------------------------------------
# host-side build driver
# ---------------------------------------------------------------------------

def _cap_scan_ops(main_ops, sample_cols: int, search_mode: str,
                  metric_name, d: int):
    """Slice scan operands to the first ~``sample_cols`` pids (capped
    sample scan; see Config.construct_sample_cols).  Rounds the cap up
    to the kernel's point-block multiple; returns the capped triple
    with NO references to the full-size arrays (so their HBM frees)."""
    if search_mode == "scan_fused":
        mult = _FUSED_PACK_CB if _use_pack(metric_name, d) else _FUSED_CB
        cap = min(-(-int(sample_cols) // mult) * mult,
                  main_ops[0].shape[1])
        c0, c1, c2 = main_ops
        if jnp.ndim(c1) > 0:            # per-point scales [1, Npad]
            c1 = c1[:, :cap]
        return (c0[:, :cap], c1, c2[:, :cap])
    cap = min(-(-int(sample_cols) // 128) * 128, main_ops[0].shape[0])
    return (main_ops[0][:cap], main_ops[1][:cap], main_ops[2][:cap])


def _exact_prefix_of(cfg) -> int:
    """None -> 0 (always fused): the exact-prefix hybrid measured
    +0.0005 recall for +80% build time at 1M pool 200, and the deep
    default pool absorbs the fused kernel's stride-group losses (see
    Config.construct_exact_prefix).  _SCAN_EXACT_PREFIX is the
    recommended prefix when a caller re-enables the hybrid."""
    v = getattr(cfg, "construct_exact_prefix", None)
    return 0 if v is None else int(v)


def _hop_of(cfg) -> int:
    return int(getattr(cfg, "construct_hop_repair", 0))


def _pool_of(cfg, search_mode: str) -> int:
    """Effective candidate-pool size for wave searches.

    Beam mode uses ``ef_construction`` verbatim (reference parity,
    lib.rs:458-461).  Scan modes default to ``3 * ef_construction``:
    pool depth is nearly free for the scan (the kernel scores every
    inserted point regardless of efc) and Algorithm 4 selects
    measurably better edges from a deeper pool — on 1M clustered 128-d
    points, pool 200 lifted exact-graph recall@10(ef=50) from 0.973 to
    0.995 at +35% build time (tools/exp_quality.py, 2026-08-19).  This
    is a lever the reference's beam construction cannot afford: its
    wave-search cost scales with efc (lib.rs:447-463), the scan's does
    not.  The default pool of 3*efc=300 measured 0.9990 (1.0000 at
    ef=100) in 285 s on that workload — vs the beam recipe's 0.9773 at
    569 s.
    """
    if not search_mode.startswith("scan"):
        return cfg.ef_construction
    pool = getattr(cfg, "construct_pool", None)
    return int(pool) if pool else 3 * cfg.ef_construction


def _scan_operands(dev_points, search_mode: str, metric_name,
                   exact_prefix: int):
    """Wave-search operand triples ``(main_ops, flat_ops)``.

    ``main_ops`` feeds ``search_mode`` itself ((None,)*3 for beam);
    ``flat_ops`` is the sliced exact-prefix streamed-scan operands that
    hybrid scan_fused builds hand to waves whose inserted prefix is
    still below ``exact_prefix`` — candidate EXACTNESS while the graph
    backbone forms (the fused kernel's stride-group loss scales as
    efc^2*lsub/(2*prefix): ruinous at prefix=4k, negligible past 128k).
    """
    if not search_mode.startswith("scan"):
        return (None, None, None), None
    mn = metric_name if isinstance(metric_name, str) else "sqeuclidean"
    if search_mode == "scan":
        return _quantize_for_scan(dev_points, fused=False), None
    n = dev_points.shape[0]
    main = _quantize_for_scan(dev_points, fused=True, metric_name=mn)
    flat = None
    if exact_prefix > 0:
        flat = _quantize_for_scan(dev_points[:min(n, exact_prefix)],
                                  fused=False)
    return main, flat


#: jitted operand builder (one fused program; see the build_graph call
#: site for why eager execution of this is fatal at large N)
_scan_operands_jit = functools.partial(
    jax.jit, static_argnames=("search_mode", "metric_name",
                              "exact_prefix"))(_scan_operands)


def _wave_schedule(start: int, end: int, cap: int):
    """Doubling wave sizes: wave <= points already inserted (so batched
    insertion approximates sequential insertion order)."""
    s = start
    while s < end:
        w = min(max(s, 1), cap, end - s)
        yield s, s + w
        s += w


def _bucket(w: int, cap: int) -> int:
    """Pad wave sizes to powers of 16 (capped): at most four distinct
    compiled wave programs per build (1, 16, 256, 4096 at the default
    cap).  Remote compiles cost 30-60 s each through the dev tunnel, so
    program count dominates cold-build time; the padding waste (up to
    16x on the tiny early waves) is microseconds of device time.  Wave
    CONTENT is unchanged — padded lanes are -1 and write to the sink
    row — so the built graph is bit-identical to finer bucketing."""
    b = 1
    while b < w and b < cap:
        b *= 16
    return min(b, cap) if b >= w else cap


def _recompute_adjd(points, adj, metric_name, dtype, chunk: int = 16384):
    """Rebuild the neighbor-distance cache adjd[i, j] = d(p_i, adj[i, j])
    for an existing graph (needed when starting incremental adds on an
    index whose build-time cache was discarded).  Chunked so the
    [C, m0, D] gather intermediate stays small."""
    metric = resolve(metric_name)
    n, m0 = adj.shape

    @jax.jit
    def one(q, rows):
        d = metric.gathered(q, points[jnp.clip(rows, 0)])
        return jnp.where(rows >= 0, d, jnp.inf).astype(dtype)

    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pad = chunk - (e - s)
        q, rows = points[s:e], adj[s:e]
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
            rows = jnp.pad(rows, ((0, pad), (0, 0)), constant_values=-1)
        outs.append(one(q, rows)[:e - s])
    return jnp.concatenate(outs) if outs else jnp.zeros((0, m0), dtype)


def extend_graph(points, zero, layers, new_points, config: Config,
                 adjd=None, progress=None):
    """Insert ``new_points`` at layer 0 of an existing graph.

    The incremental-add backend (the reference's index is immutable,
    lib.rs has no add API — this is a beyond-parity capability).  New
    points run the standard wave recipe — batched search of the current
    graph, Alg. 3/4 selection, deterministic forward + reverse edge
    commit — against a frozen upper-layer skeleton.

    Returns ``(all_points [N+A, D], zero [N+A, m0], adjd [N+A+1, m0])``;
    callers should retain ``adjd`` to make subsequent adds cheap.
    """
    cfg = config
    metric_name = cfg.metric if isinstance(cfg.metric, str) else cfg.metric
    m, m0 = cfg.m, cfg.m0
    new_pts = jnp.asarray(new_points, jnp.float32)
    n_old = zero.shape[0]
    a = new_pts.shape[0]
    n_total = n_old + a
    if n_old == 0:
        raise ValueError("cannot add to an empty index; use build()")
    if n_total >= 2**31:
        raise ValueError("point count must fit in int32")

    all_pts = jnp.concatenate([jnp.asarray(points, jnp.float32), new_pts])
    adj = jnp.concatenate(
        [jnp.asarray(zero, jnp.int32),
         jnp.full((a + 1, m0), -1, jnp.int32)])            # [N+A+1, m0]

    cache_dtype = jnp.dtype(getattr(cfg, "dist_cache_dtype", "float32"))
    if adjd is not None and adjd.shape[0] >= n_old:
        old_d = adjd[:n_old]
    else:
        old_d = _recompute_adjd(all_pts, adj[:n_old], metric_name,
                                cache_dtype)
    adjd = jnp.concatenate(
        [old_d, jnp.full((a + 1, m0), jnp.inf, cache_dtype)])

    # rebuild the stacked upper-snapshot buffer from the stored layers
    # (reference layout: layers[l-1] = level l, so reversed = top first)
    uppers = [jnp.asarray(l, jnp.int32) for l in reversed(layers)]
    pack = _pack_factor(m)

    def _pal(x):
        return ((x + pack - 1) // pack) * pack

    cap_rows = max(pack, sum(_pal(l.shape[0]) for l in uppers))
    stacked = jnp.full((cap_rows // pack, m * pack), -1, jnp.int32)
    offsets = np.zeros(16, np.int32)
    if len(uppers) > 16:
        raise ValueError("more than 16 upper layers")
    write_off = 0
    for li, l in enumerate(uppers):
        end = l.shape[0]
        end_p = _pal(end)
        lp = jnp.pad(l[:, :m], ((0, end_p - end), (0, 0)),
                     constant_values=-1)
        stacked = jax.lax.dynamic_update_slice(
            stacked, lp.reshape(end_p // pack, m * pack),
            (write_off // pack, 0))
        offsets[li] = write_off
        write_off += end_p

    heur = (None if cfg.heuristic is None else
            (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned))
    n_upper = jnp.int32(len(uppers))
    pend_cap, rev_rounds = _rev_params(cfg, m0)
    search_mode = _resolve_search_mode(cfg, metric_name)
    exact_prefix = _exact_prefix_of(cfg)
    main_ops, flat_ops = _scan_operands_jit(
        all_pts, search_mode=search_mode, metric_name=metric_name,
        exact_prefix=exact_prefix)
    # capped sample scan for adds (same design as build_graph: pids
    # [0, cap) of the original build are a uniform sample — its
    # insertion order was a seeded shuffle; hop repair recovers the
    # rest through the graph)
    sample_cols = getattr(cfg, "construct_sample_cols", None)
    sample_hops = int(getattr(cfg, "construct_sample_hops", 16))
    sampling = (sample_cols is not None
                and search_mode.startswith("scan")
                and int(sample_cols) < n_total)
    if sampling and main_ops[0] is not None:
        main_ops = _cap_scan_ops(main_ops, int(sample_cols), search_mode,
                                 metric_name, all_pts.shape[1])
    drops = jnp.int32(0)
    done = 0
    for s, e in _wave_schedule(n_old, n_total, cfg.wave_size):
        w = e - s
        wb = _bucket(w, cfg.wave_size)
        wave = np.full(wb, -1, np.int32)
        wave[:w] = np.arange(s, e, dtype=np.int32)
        if (search_mode == "scan_fused" and flat_ops is not None
                and s < exact_prefix):
            mode_w, (wcodes, wscales, wnorms) = "scan", flat_ops
        else:
            mode_w, (wcodes, wscales, wnorms) = search_mode, main_ops
        adj, adjd, dd = _wave_step(
            adj, adjd, jnp.asarray(wave), all_pts, stacked,
            jnp.asarray(offsets), n_upper, jnp.int32(m0),
            wcodes, wscales, wnorms,
            metric_name=metric_name, efc=_pool_of(cfg, mode_w),
            m=m, m0=m0, heuristic=heur,
            rev_chunk=8192, pend_cap=pend_cap, rev_rounds=rev_rounds,
            max_iter_factor=cfg.max_iter_factor,
            expand=getattr(cfg, "construct_expand", 1),
            search_mode=mode_w,
            pd_dtype=getattr(cfg, "select_pd_dtype", "bfloat16"),
            hop_repair=(max(_hop_of(cfg), sample_hops)
                        if sampling and mode_w.startswith("scan")
                        else _hop_of(cfg)))
        drops = drops + dd
        done += w
        if progress is not None:
            progress(done, a, "add")
    _warn_reverse_drops(int(drops), pend_cap, rev_rounds)
    return all_pts, adj[:n_total], adjd


def _rev_params(cfg, m0: int):
    """Per-wave reverse-commit knobs: (pend_cap, rev_rounds).

    rev_rounds 0 = auto: the commit while_loop runs until every pending
    addition is consumed (capped at ceil(W/pend_cap) rounds, which is
    always enough) — lossless by construction.  An explicit rev_rounds
    caps total capacity at pend_cap*rev_rounds per target per wave;
    overflow beyond that is dropped, counted and warned about.

    Default pend_cap min(m0, 32): the commit's cost is dominated by the
    [RC, C, C] candidate-pairwise traffic with C = m0 + pend_cap, so a
    narrower round is cheaper per pass; lossless-ness is unaffected
    (the auto round loop just runs again for the rare hot target)."""
    pend_cap = getattr(cfg, "pend_cap", None) or min(m0, 32)
    rev_rounds = getattr(cfg, "rev_rounds", None) or 0
    return pend_cap, rev_rounds


def _warn_reverse_drops(n_dropped: int, pend_cap: int,
                        rev_rounds: int = 1) -> None:
    if n_dropped > 0:
        import warnings

        warnings.warn(
            f"{n_dropped} reverse-edge additions exceeded the per-wave "
            f"commit capacity pend_cap*rev_rounds="
            f"{pend_cap}*{rev_rounds} and were dropped (the farthest "
            "per target).  Recall is usually unaffected, but consider "
            "raising Config(rev_rounds=...) or lowering wave_size.",
            stacklevel=3)


class BuiltGraph:
    """Result of construction: the dense arrays an index is made of."""

    def __init__(self, points, zero, layers, ids, config,
                 reverse_drops: int = 0):
        self.points = points      # [N, D] device array, pid order
        self.zero = zero          # [N, m0] int32
        self.layers = layers      # list: layers[l-1] = level l, [end_l, m]
        self.ids = ids            # np [N]: original index -> pid
        self.config = config
        #: Reverse-edge additions lost to per-wave pend_cap overflow
        #: (0 = the batched commit was lossless for this build).
        self.reverse_drops = reverse_drops


@functools.partial(jax.jit, static_argnames=("rows",))
def _slice_rows(x, i, rows: int):
    return jax.lax.dynamic_slice_in_dim(x, i, rows, axis=0)


#: Upper-layer snapshot copy granularity (rows per chunk) at the
#: layer-transition; bounded so the gather temps stay ~100 MB at any
#: scale (tests shrink it to exercise the multi-chunk path).
_SNAP_CHUNK_ROWS = 1 << 18


def _np_chunked(x, max_bytes: int = 1 << 28):
    """Device -> host readback in bounded row chunks.

    ``np.asarray(big_device_array)`` makes the runtime linearize the
    tiled layout through a full-size device staging buffer — at 10M x 96
    the adjacency alone is ~2.6 GB and the first mid-build checkpoint
    OOM'd a near-full 16 GB chip exactly there.  Slicing with ONE
    dynamic-slice program (dynamic start -> no per-chunk recompiles
    through the remote-compile tunnel) keeps the transient device
    footprint to one chunk.
    """
    x = jnp.asarray(x)
    if x.ndim == 0 or x.nbytes <= max_bytes:
        return np.asarray(x)
    row_bytes = max(1, x.nbytes // x.shape[0])
    rows = max(1, min(x.shape[0], max_bytes // row_bytes))
    # x.dtype directly: probing via np.asarray(x[:1]) dispatches a device
    # slice, and the checkpoint runs exactly when HBM is at its fullest —
    # the 10M build's first mid-build checkpoint OOM'd on that probe.
    out = np.empty(x.shape, x.dtype)
    i = 0
    while i < x.shape[0]:
        j = min(i + rows, x.shape[0])
        # fixed-size slice (clamped start) -> one compiled program
        s = int(min(i, x.shape[0] - rows))
        out[s:s + rows] = np.asarray(_slice_rows(x, jnp.int32(s), rows))
        i = j
    return out


def build_graph(points, config: Config, progress=None,
                checkpoint: Optional[str] = None,
                checkpoint_every: int = 64) -> BuiltGraph:
    """Build the layered graph with batched insertion waves.

    Reproduces the reference's construction schedule (``Hnsw::new``,
    lib.rs:209-345): geometric layer sizing, seeded random shuffle into
    pid order, per-layer insertion ranges (point 0 is the fixed entry and
    never inserted), and post-layer truncated snapshots.

    ``checkpoint``: optional path; wave state (adjacency, distance cache,
    snapshots, schedule position) is saved there every
    ``checkpoint_every`` waves and resumed from on restart — the
    long-build insurance the reference lacks entirely (SURVEY.md §5:
    "a crash loses everything").
    """
    cfg = config
    metric_name = cfg.metric if isinstance(cfg.metric, str) else cfg.metric
    pts = np.asarray(points, np.float32)
    n = len(pts)
    m, m0 = cfg.m, cfg.m0

    if n == 0:
        empty = jnp.zeros((0, pts.shape[1] if pts.ndim == 2 else 0),
                          jnp.float32)
        return BuiltGraph(empty, jnp.full((0, m0), -1, jnp.int32), [],
                          np.zeros(0, np.int32), cfg)
    if n >= 2**31:
        raise ValueError("point count must fit in int32")

    heur = (None if cfg.heuristic is None else
            (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned))
    pend_cap, rev_rounds = _rev_params(cfg, m0)
    search_mode = _resolve_search_mode(cfg, metric_name)
    exact_prefix = _exact_prefix_of(cfg)

    # ---- checkpoint peek + seed resolution --------------------------------
    # The key excludes the seed: an entropy-seeded build (seed=None)
    # adopts the checkpoint's stored seed on resume, while an explicit
    # seed must match or the checkpoint is ignored.
    # split search/commit wave programs whenever the search half cannot
    # need the adjacency: scan-mode candidates, no hop repair, no
    # extend_candidates (all three are the defaults); those builds also
    # store the adjacency lane-packed (pk > 1, see _pk_* helpers)
    import os as _os
    # Split search/commit programs only when the monolithic wave
    # program's memory plan would not fit: the split costs ~15% build
    # time at 1M (two dispatches per wave + pk gather overhead;
    # measured interleaved r5: monolith 327.5 s vs split 378.1 s at
    # 1M x 128, same 0.9990 recall) but is REQUIRED at 10M x 96, where
    # the monolith's plan is 21.2 GB on a 15.75 GB chip (r4).  The
    # estimate anchors on that measurement (~17*m0 + 8*Dp bytes/point);
    # Config.construct_split forces either mode, and the
    # INSTANT_TPU_NO_SPLIT / INSTANT_TPU_NO_PK env knobs remain for
    # hardware attribution runs.
    can_split = (search_mode.startswith("scan") and _hop_of(cfg) == 0
                 and not (heur is not None and heur[0]))
    split_cfg = getattr(cfg, "construct_split", None)
    if _os.environ.get("INSTANT_TPU_NO_SPLIT"):
        split_cfg = False
    if split_cfg is None:
        dp_est = pts.shape[1] + ((-pts.shape[1]) % 128)
        split_cfg = n * (17 * m0 + 8 * dp_est) > 8_000_000_000
    split_waves = can_split and bool(split_cfg)
    pk = (_pk_factor(m0)
          if split_waves and not _os.environ.get("INSTANT_TPU_NO_PK")
          else 1)

    sample_cols = getattr(cfg, "construct_sample_cols", None)
    sample_hops = int(getattr(cfg, "construct_sample_hops", 16))
    sampling = (sample_cols is not None and search_mode.startswith("scan")
                and int(sample_cols) < n)

    # v8: dist_cache_dtype is part of the key — a resume under a
    # changed cache dtype must invalidate, not silently bit-view the
    # saved cache through the wrong dtype (advisor r4)
    ckpt_key = f"v8:{n}:{pts.shape[1]}:{cfg.ef_construction}:" \
               f"{m}:{cfg.ml}:{heur}:{cfg.wave_size}:{pend_cap}:" \
               f"{rev_rounds}:{cfg.max_iter_factor}:" \
               f"{getattr(cfg, 'construct_expand', 1)}:{search_mode}:" \
               f"{getattr(cfg, 'select_pd_dtype', 'bfloat16')}:" \
               f"{exact_prefix}:{_hop_of(cfg)}:" \
               f"{_pool_of(cfg, search_mode)}:{pk}:" \
               f"{getattr(cfg, 'dist_cache_dtype', 'float32')}"
    if sampling:
        # sampled builds make different graphs — never cross-resume
        # (suffix-only so pre-sampling checkpoints keep their keys)
        ckpt_key += f":sc{int(sample_cols)}:sh{sample_hops}"
    seed = cfg.seed
    ckpt_state = None
    if checkpoint is not None:
        import os
        if os.path.exists(checkpoint):
            with np.load(checkpoint, allow_pickle=False) as z:
                if (str(z["key"]) == ckpt_key and "seed" in z.files
                        and (seed is None or int(z["seed"]) == seed)):
                    seed = int(z["seed"])
                    adjd_np = z["adjd"]
                    # non-native dtypes (bfloat16) are stored bit-viewed as
                    # uint16 + a dtype tag: npy round-trips ml_dtypes as
                    # void |V2, which jnp.asarray rejects (10M resume
                    # crash).  Legacy untagged checkpoints load as |V2 and
                    # are viewed back via the config's cache dtype.
                    want = (str(z["adjd_dtype"]) if "adjd_dtype" in z.files
                            else str(getattr(cfg, "dist_cache_dtype",
                                             "float32")))
                    want = jnp.dtype(want)
                    if adjd_np.dtype != want:
                        adjd_np = adjd_np.view(want)
                    ckpt_state = dict(
                        adj=z["adj"], adjd=adjd_np,
                        stacked=z["stacked"], offsets=z["offsets"].copy(),
                        write_off=int(z["write_off"]),
                        li=int(z["li"]), s=int(z["s"]),
                        drops=int(z["drops"]) if "drops" in z.files else 0)
    seed = resolve_seed(seed)

    # random layer assignment via shuffle-sort (lib.rs:256-270)
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n, size=n)
    order = np.lexsort((np.arange(n), keys))
    ids = np.empty(n, np.int32)
    ids[order] = np.arange(n, dtype=np.int32)
    pts = pts[order]

    sizes = layer_sizes(n, cfg.ml, m)
    top = len(sizes) - 1
    ranges = [(top - i, max(c - s, 1), c) for i, (s, c) in enumerate(sizes)]

    # Pad D to a 128-lane multiple for the build's device copy: a
    # compact [N, 96]-like argument makes EVERY gathering wave program
    # materialize a full (8,128)-tiled temp copy of the table (4.8 GB
    # at 10M x 96 — the 10M build OOM'd on exactly this), while a
    # 128-lane array's row-major layout IS the tiled layout, so gathers
    # read the argument in place.  Zero columns add 0 to every named
    # metric's sums; beam mode (custom callables) is never padded.
    pad_d = (-pts.shape[1]) % 128 if search_mode.startswith("scan") else 0
    if pad_d:
        dev_points = jnp.asarray(np.pad(pts, ((0, 0), (0, pad_d))))
    else:
        dev_points = jnp.asarray(pts)
    # quantize BEFORE the adjacency arrays exist: its [N, D] f32
    # dequant temporaries (+6 GB at 10M) must not stack on top of them
    # the operand builder MUST run as one jitted program: eagerly, each
    # intermediate ([N, D] f32 dequants, per-point AND global-scale
    # codes) materializes as its own HBM buffer — an op-by-op chain
    # several times the table size that OOM'd the 10M build even though
    # the FUSED program needs only ~6 GB of temps
    main_ops, flat_ops = _scan_operands_jit(
        dev_points, search_mode=search_mode, metric_name=metric_name,
        exact_prefix=exact_prefix)
    if main_ops[0] is not None:
        from ..utils.metrics import force_ready
        force_ready(main_ops[0])  # real barrier: quantize temps freed
    if sampling and main_ops[0] is not None:
        # Cap the scan table at the first ~sample_cols columns (pids).
        # Insertion order is a seeded shuffle, so pids [0, cap) are a
        # uniform sample of the dataset — per-wave scan cost becomes
        # O(cap) at any N instead of O(N), and the capped operands are
        # the ONLY copy kept (less HBM, one program shape all build).
        # Misses outside the sample are repaired in the commit program
        # (repair_commit_core) or by in-search hop repair (monolith).
        main_ops = _cap_scan_ops(main_ops, int(sample_cols), search_mode,
                                 metric_name, dev_points.shape[1])
        force_ready(main_ops[0])        # full-size operands freed
    prow = (n + 1 + pk - 1) // pk  # physical adjacency rows (pk=1: n+1)
    adj = jnp.full((prow, pk * m0), -1, jnp.int32)
    adjd = jnp.full((prow, pk * m0), jnp.inf,
                    jnp.dtype(getattr(cfg, "dist_cache_dtype", "float32")))

    # stacked upper-snapshot buffer: filled top layer first as layers
    # complete; capacity is known exactly from the sizing schedule.
    # Lane-packed (_pack_factor logical rows per 128-lane physical row)
    # so [*, 32] snapshots don't pay 4x TPU minor-dim padding.
    pack = _pack_factor(m)

    def _pal(x):  # pack-align
        return ((x + pack - 1) // pack) * pack

    cap_rows = max(pack, sum(_pal(c) for (_, c) in sizes[:-1]))
    stacked = jnp.full((cap_rows // pack, m * pack), -1, jnp.int32)
    offsets = np.zeros(16, np.int32)  # fixed size: stable jit signature
    if top > 16:
        raise ValueError("more than 16 upper layers (n too large for ml)")
    write_off = 0

    # ---- checkpoint/resume ------------------------------------------------
    resume_li, resume_s, waves_done = -1, -1, 0
    drops = jnp.int32(0)
    if ckpt_state is not None:
        adj = jnp.asarray(ckpt_state["adj"])
        adjd = jnp.asarray(ckpt_state["adjd"])
        stacked = jnp.asarray(ckpt_state["stacked"])
        offsets = ckpt_state["offsets"]
        write_off = ckpt_state["write_off"]
        resume_li, resume_s = ckpt_state["li"], ckpt_state["s"]
        drops = jnp.int32(ckpt_state["drops"])

    def save_ckpt(li, s):
        import os
        tmp = checkpoint + ".tmp"
        adjd_np = _np_chunked(adjd)
        adjd_dtype = str(adjd_np.dtype)
        if adjd_np.dtype not in (np.float32, np.float16, np.float64):
            # bit-view bfloat16 (and friends) through uint16: the npy
            # format loses ml_dtypes descriptors (loads back as |V2).
            adjd_np = adjd_np.view(np.uint16)
        with open(tmp, "wb") as f:
            np.savez(f, key=np.array(ckpt_key), seed=np.uint64(seed),
                     adj=_np_chunked(adj),
                     adjd=adjd_np, adjd_dtype=np.array(adjd_dtype),
                     stacked=_np_chunked(stacked),
                     offsets=offsets, write_off=write_off, li=li, s=s,
                     drops=int(drops))
        os.replace(tmp, checkpoint)

    layers: list = []
    done = 0
    last_li, last_s = -1, -1   # final-checkpoint coordinates
    for li, (layer, start, end) in enumerate(ranges):
        n_upper = jnp.int32(li)  # layers completed so far == layers above
        zero_links = m0 if layer == 0 else m
        for s, e in _wave_schedule(start, end, cfg.wave_size):
            last_li, last_s = li, s
            if (li, s) <= (resume_li, resume_s):
                done += e - s
                continue  # already inserted in the checkpointed state
            w = e - s
            wb = _bucket(w, cfg.wave_size)
            wave = np.full(wb, -1, np.int32)
            wave[:w] = np.arange(s, e, dtype=np.int32)
            if (search_mode == "scan_fused" and flat_ops is not None
                    and s < exact_prefix):
                mode_w, (wcodes, wscales, wnorms) = "scan", flat_ops
            else:
                mode_w, (wcodes, wscales, wnorms) = search_mode, main_ops
            pd_dt = getattr(cfg, "select_pd_dtype", "bfloat16")
            if split_waves and mode_w.startswith("scan"):
                # scan-mode search never reads adj -> run search and
                # commit as separate programs so neither plan holds the
                # adjacency staging copies AND the scan operands at once
                # (the monolith OOMs a 16 GB chip at 10M x 96)
                sel_d, sel_p = _search_step(
                    jnp.asarray(wave), dev_points, None, None,
                    n_upper, jnp.int32(zero_links),
                    wcodes, wscales, wnorms, None,
                    metric_name=metric_name, efc=_pool_of(cfg, mode_w),
                    m=m, m0=m0, heuristic=heur,
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "construct_expand", 1),
                    search_mode=mode_w, pd_dtype=pd_dt, hop_repair=0,
                    return_pool=sampling)
                if sampling:
                    # sel_d/sel_p are the candidate POOL: hop-repair +
                    # selection run in the commit program (which holds
                    # the adjacency the repair needs)
                    adj, adjd, dd = _repair_commit_step(
                        adj, adjd, jnp.asarray(wave), dev_points,
                        sel_d, sel_p,
                        metric_name=metric_name, m0=m0, heuristic=heur,
                        rev_chunk=8192, pend_cap=pend_cap,
                        rev_rounds=rev_rounds, pd_dtype=pd_dt,
                        pk=pk, n_points=n, hops=sample_hops)
                else:
                    adj, adjd, dd = _commit_step(
                        adj, adjd, jnp.asarray(wave), dev_points,
                        sel_d, sel_p,
                        metric_name=metric_name, m0=m0, heuristic=heur,
                        rev_chunk=8192, pend_cap=pend_cap,
                        rev_rounds=rev_rounds, pd_dtype=pd_dt,
                        pk=pk, n_points=n)
            else:
                adj, adjd, dd = _wave_step(
                    adj, adjd, jnp.asarray(wave), dev_points, stacked,
                    jnp.asarray(offsets), n_upper, jnp.int32(zero_links),
                    wcodes, wscales, wnorms,
                    metric_name=metric_name, efc=_pool_of(cfg, mode_w),
                    m=m, m0=m0, heuristic=heur,
                    rev_chunk=8192, pend_cap=pend_cap,
                    rev_rounds=rev_rounds,
                    max_iter_factor=cfg.max_iter_factor,
                    expand=getattr(cfg, "construct_expand", 1),
                    search_mode=mode_w, pd_dtype=pd_dt,
                    hop_repair=(max(_hop_of(cfg), sample_hops)
                                if sampling and
                                mode_w.startswith("scan")
                                else _hop_of(cfg)))
            drops = drops + dd
            done += w
            waves_done += 1
            # Throttle the async dispatch queue with a scalar readback:
            # through the axon relay, dispatch returns at ack, so the
            # host races hundreds of waves ahead and the enqueued
            # programs' buffers pile up in HBM — at 10M x 96 the pileup
            # exhausted a 16 GB chip (the persistent plan is ~9 GB).
            # A [1] readback every few waves bounds the in-flight depth
            # at ~0.1 s per sync (<<1% of wave time at any scale).
            sync_every = int(getattr(cfg, "dispatch_sync_every", 16) or 0)
            if sync_every and waves_done % sync_every == 0:
                np.asarray(drops)
            if progress is not None:
                progress(done, n, f"layer {layer}")
            if checkpoint is not None and waves_done % checkpoint_every == 0:
                save_ckpt(li, s)
        if layer > 0:
            # completed-before-checkpoint layers: slice their snapshot out
            # of the restored stacked buffer; otherwise take it now
            if li < resume_li:
                snap = jax.lax.dynamic_slice(
                    stacked, (int(offsets[li]) // pack, 0),
                    (_pal(end) // pack, m * pack)).reshape(-1, m)[:end]
            else:
                end_p = _pal(end)
                if pk == 1:
                    snap = adj[:end, :m]
                    snap_p = jnp.pad(snap, ((0, end_p - end), (0, 0)),
                                     constant_values=-1)
                    stacked = jax.lax.dynamic_update_slice(
                        stacked, snap_p.reshape(end_p // pack, m * pack),
                        (write_off // pack, 0))
                else:
                    # Chunked snapshot: a one-shot gather of all `end`
                    # rows materializes [end, m0]+pad+copy temps (~2 GB
                    # at the 10M layer-1 transition) on a near-full
                    # chip — the 10M resume OOM'd exactly here.  Copy
                    # pack-aligned row chunks into the stacked buffer
                    # and slice the snapshot back out of it.
                    ch = max(pack, (_SNAP_CHUNK_ROWS // pack) * pack)
                    i = 0
                    while i < end:
                        j = min(i + ch, end)
                        rows = _pk_row_get(adj, jnp.arange(i, j), pk,
                                           m0)[:, :m]
                        cp = _pal(j - i)
                        if cp > j - i:
                            rows = jnp.pad(rows,
                                           ((0, cp - (j - i)), (0, 0)),
                                           constant_values=-1)
                        stacked = jax.lax.dynamic_update_slice(
                            stacked, rows.reshape(cp // pack, m * pack),
                            ((write_off + i) // pack, 0))
                        i = j
                    snap = jax.lax.dynamic_slice(
                        stacked, (write_off // pack, 0),
                        (end_p // pack, m * pack)).reshape(-1, m)[:end]
                offsets[li] = write_off
                write_off += end_p
            layers.append(snap)

    if checkpoint is not None:
        import os
        final_ckpt = os.environ.get("INSTANT_TPU_FINAL_CKPT", "")
        if final_ckpt == "keep":
            # Keep the newest MID-BUILD checkpoint for tail-crash
            # recovery without paying another multi-GB readback here:
            # every observed tunnel wedge this round coincided with a
            # checkpoint write, so the extra final save is itself the
            # riskiest operation in the run.  A tail wedge replays the
            # waves since the last mid-build write.
            pass
        elif final_ckpt:
            # Persist the completed wave state and KEEP it: the tail
            # (unpack, ground truth, recall probes) can still crash or
            # wedge (r5: a compile-time layout-copy OOM killed the
            # process AFTER a 112-minute 10M build whose checkpoint had
            # just been deleted as "complete").  A resume from this
            # final checkpoint skips every wave and replays only the
            # tail.  Skipped when resuming an already-final checkpoint
            # (waves_done == 0: nothing new to save).
            if waves_done > 0 or not os.path.exists(checkpoint):
                save_ckpt(last_li, last_s)
        elif os.path.exists(checkpoint):
            os.remove(checkpoint)  # build complete
    layers.reverse()  # store as reference does: layers[l-1] = level l
    reverse_drops = int(drops)  # one device readback, post-pipeline
    _warn_reverse_drops(reverse_drops, pend_cap, rev_rounds)
    # Free build-only device state BEFORE the final copies: the distance
    # cache + quantized scan operands total ~2.6 GB at 10M and the
    # adjacency slice + compact-point re-upload below peak another
    # ~6.4 GB — sequencing the frees first keeps the tail under ~12 GB
    # instead of ~15 on a 15.75 GB chip.
    adjd = None  # noqa: F841  (cell var: save_ckpt never runs again)
    main_ops = flat_ops = None  # noqa: F841
    stacked = None  # noqa: F841  (snapshots already sliced out)
    if pad_d:
        # free the PADDED point table before the adjacency unpack: the
        # unpack peaks at packed + unpacked adjacency (2.56 + 5.12 GB
        # at 10M, the [N, 64] result pays TPU 128-lane padding) and the
        # 5.12 GB padded table alongside OOM'd the r5 10M resume at the
        # 99.9% mark — every wave done, death on the very last slice.
        # The compact table re-uploads below, after the unpack settles.
        dev_points = None
    if pk > 1:
        # unpack to the BuiltGraph contract ([N, m0]); row-major reshape
        # is the exact inverse of the packed layout (see _pk_* helpers).
        # One donated jit program: eager reshape-then-slice dispatches
        # twice and holds source + reshape + slice buffers concurrently.
        adj = jax.jit(lambda a: a.reshape(-1, m0)[:n],
                      donate_argnums=0)(adj)
    else:
        adj = adj[:n]  # drop the sink row
    if pad_d:
        # hand back COMPACT points (the BuiltGraph/Hnsw contract): a
        # fresh host upload, not a device slice — slicing would both
        # hold the padded copy and re-trigger the tiled-copy staging
        dev_points = jnp.asarray(pts)
    return BuiltGraph(dev_points, adj, layers, ids, cfg,
                      reverse_drops=reverse_drops)
