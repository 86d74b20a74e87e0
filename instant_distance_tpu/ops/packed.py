"""Packed (inline-quantized) traversal — the serving-optimized hot path.

Microbenchmarks (docs/performance.md) show the classic HNSW traversal on
TPU is bound by the row-gather issue rate (~11 ns/row regardless of row
bytes): every expansion costs K scattered point-row fetches.  The packed
layout inverts that: each node's row carries its neighbors' *int8-quantized
vectors inline* —

    codes [N, K, D] int8,  scales [N, K] f32,  ids [N, K] int32

— so one expansion is ONE fat sequential row read + a VPU dequant-distance
over all K neighbors, instead of K scattered reads.  Traversal runs on
approximate distances; the final beam is reranked with exact f32 distances
(one gather of ef rows per query).  This is the TPU analogue of the
inline-PQ trick in GPU/SSD graph-ANN systems (CAGRA / DiskANN), with
per-point symmetric int8 instead of PQ because TPU has no fast per-byte
LUT gather but a very wide VPU.

Memory cost: K * D bytes per node (e.g. SIFT1M at K=64: ~8 GB), i.e. a
serving-time speed/space tradeoff on top of the exact index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distance import Metric

_I32MAX = jnp.iinfo(jnp.int32).max


def quantize_points(points):
    """Per-point symmetric int8: v ~= scale * code (max-abs scaling)."""
    points = jnp.asarray(points)
    if points.dtype != jnp.float32:   # bf16-stored indices quantize via f32
        points = points.astype(jnp.float32)
    amax = jnp.max(jnp.abs(points), axis=-1)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(points / scale[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale.astype(jnp.float32)


import functools


@functools.partial(jax.jit, donate_argnames=("out_c", "out_s"))
def _pack_chunk(out_c, out_s, rows, codes, scales, off):
    safe = jnp.clip(rows, 0)
    c = codes[safe]
    s = jnp.where(rows >= 0, scales[safe], 0.0)
    out_c = jax.lax.dynamic_update_slice(out_c, c, (off, 0, 0))
    out_s = jax.lax.dynamic_update_slice(out_s, s, (off, 0))
    return out_c, out_s


def pack_layer(adj, codes, scales, links: int = 0, chunk: int = 1 << 18):
    """Inline a layer's neighbor vectors: adj [R, K] -> (codes [R, K, D],
    scales [R, K]); invalid slots get zero vectors (masked at search).

    ``links`` > 0 packs only the first ``links`` neighbors per row —
    selection order puts the Alg.4-kept (diverse, nearest) neighbors
    first, so this is the same truncation the reference applies to upper
    layers (UpperNode::from_zero).  Halving links halves the packed
    bytes and traversal cost at a small recall cost.

    Packing streams fixed-size row chunks through ONE compiled program
    (donated in-place output), so peak transient HBM is one chunk and
    every layer of every index reuses the same executable.
    """
    if links and links < adj.shape[1]:
        adj = adj[:, :links]
    r, k = adj.shape
    d = codes.shape[1]
    # power-of-two chunk buckets: few compiled programs, bounded padding
    b = 1
    while b < r and b < chunk:
        b *= 2
    chunk = b
    n_chunks = (r + chunk - 1) // chunk
    pad = n_chunks * chunk - r
    adj_p = jnp.pad(adj, ((0, pad), (0, 0)), constant_values=-1)
    out_c = jnp.zeros((r + pad, k, d), jnp.int8)
    out_s = jnp.zeros((r + pad, k), jnp.float32)
    for i in range(n_chunks):
        rows = jax.lax.dynamic_slice_in_dim(adj_p, i * chunk, chunk)
        out_c, out_s = _pack_chunk(out_c, out_s, rows, codes, scales,
                                   jnp.int32(i * chunk))
    if pad:
        out_c, out_s = out_c[:r], out_s[:r]
    return adj, out_c, out_s


def _approx_dists(q, codes, scales):
    """[B, D] x ([B, C, D] int8, [B, C]) -> [B, C] squared L2 to the
    dequantized vectors (f32 on the VPU)."""
    deq = codes.astype(jnp.float32) * scales[..., None]
    diff = q[:, None, :] - deq
    return jnp.sum(diff * diff, axis=-1)


def greedy_descent_packed(queries, ids, codes, scales, cur_d, cur_p,
                          max_iters: int = 512):
    """ef=1 greedy descent over a packed layer (approx distances)."""
    b = queries.shape[0]

    def cond(state):
        it, _, _, done = state
        return (it < max_iters) & ~jnp.all(done)

    def body(state):
        it, cd, cp, done = state
        safe = jnp.clip(cp, 0)
        nb = ids[safe]                                      # [B, K]
        nd = _approx_dists(queries, codes[safe], scales[safe])
        nvalid = (nb >= 0) & ~done[:, None]
        nd = jnp.where(nvalid, nd, jnp.inf)
        md = jnp.min(nd, axis=1)
        mp = jnp.min(jnp.where(nd == md[:, None], nb, _I32MAX), axis=1)
        better = (md < cd) | ((md == cd) & (mp < cp))
        step = better & ~done
        return (it + 1, jnp.where(step, md, cd),
                jnp.where(step, mp, cp), done | ~better)

    _, cd, cp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur_d, cur_p, jnp.zeros(b, bool)))
    return cd, cp


def beam_search_packed(queries, ids, codes, scales,
                       beam_d, beam_p, beam_e, max_iters: int,
                       expand: int = 1, eligible=None,
                       return_iters: bool = False):
    """Packed-layer beam search: same wavefront semantics as
    ops.beam.beam_search_layer, with inline approx distances.

    ``eligible`` (bool [N], optional): result filter — traversal routes
    through ineligible nodes, a separate result beam keeps only eligible
    ones (see ops/beam.py for the semantics argument).
    """
    b, ef = beam_p.shape
    k = ids.shape[1]
    e_n = max(1, min(expand, ef))
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, ef), 1)
    rows_b = jnp.arange(b)[:, None]
    ek = e_n * k
    tril = jnp.tril(jnp.ones((ek, ek), bool), k=-1)
    filtered = eligible is not None

    def _mask_eligible(d, p):
        ok = (p >= 0) & eligible[jnp.clip(p, 0)]
        return jnp.where(ok, d, jnp.inf), jnp.where(ok, p, -1)

    if filtered:
        rd0, rp0 = _mask_eligible(beam_d, beam_p)
        rd0, rp0 = jax.lax.sort((rd0, rp0), dimension=1, num_keys=2)
    else:
        rd0, rp0 = beam_d, beam_p

    def expandable(bp, be):
        return (bp >= 0) & ~be

    def cond(state):
        it, _, bp, be, _, _ = state
        return (it < max_iters) & jnp.any(expandable(bp, be))

    def body(state):
        it, bd, bp, be, rd, rp = state
        exp = expandable(bp, be)
        rank = jnp.cumsum(exp, axis=1) - 1
        chosen = exp & (rank < e_n)
        sel = jnp.full((b, e_n), -1, jnp.int32).at[
            rows_b, jnp.where(chosen, rank, e_n)].set(slot, mode="drop")
        cur = jnp.where(sel >= 0,
                        jnp.take_along_axis(bp, jnp.clip(sel, 0), 1), -1)
        be = be | chosen
        safe = jnp.clip(cur, 0)                             # [B, E]
        nb = ids[safe]                                      # [B, E, K]
        nd = jax.vmap(_approx_dists, in_axes=(None, 1, 1), out_axes=1)(
            queries, codes[safe], scales[safe])             # [B, E, K]
        nvalid = (nb >= 0) & (cur >= 0)[:, :, None]
        nb = jnp.where(nvalid, nb, -1).reshape(b, ek)
        nd = jnp.where(nvalid, nd, jnp.inf).reshape(b, ek)
        dup = jnp.any(
            (nb[:, :, None] == bp[:, None, :]) & (bp >= 0)[:, None, :],
            axis=2)
        dup |= jnp.any((nb[:, :, None] == nb[:, None, :]) & tril, axis=2)
        nd = jnp.where(dup, jnp.inf, nd)
        nb = jnp.where(dup, -1, nb)
        if filtered:
            fd_, fp_ = _mask_eligible(nd, nb)
            dup_r = jnp.any(
                (fp_[:, :, None] == rp[:, None, :]) & (rp >= 0)[:, None, :],
                axis=2)
            fd_ = jnp.where(dup_r, jnp.inf, fd_)
            fp_ = jnp.where(dup_r, -1, fp_)
            rd, rp = jax.lax.sort(
                (jnp.concatenate([rd, fd_], axis=1),
                 jnp.concatenate([rp, fp_], axis=1)),
                dimension=1, num_keys=2)
            rd, rp = rd[:, :ef], rp[:, :ef]
        cd = jnp.concatenate([bd, nd], axis=1)
        cp = jnp.concatenate([bp, nb], axis=1)
        ce = jnp.concatenate(
            [be, jnp.zeros_like(nd, bool)], axis=1).astype(jnp.int32)
        fd, fp, fe = jax.lax.sort((cd, cp, ce), dimension=1, num_keys=2)
        return (it + 1, fd[:, :ef], fp[:, :ef], fe[:, :ef].astype(bool),
                rd, rp)

    it, bd, bp, _, rd, rp = jax.lax.while_loop(
        cond, body, (jnp.int32(0), beam_d, beam_p, beam_e, rd0, rp0))
    out = (rd, rp) if filtered else (bd, bp)
    return (*out, it) if return_iters else out


def seed_entry(queries, seed_vecs, n_init: int):
    """MXU seed scan: the TPU-native replacement for upper-layer descent.

    The reference's upper layers exist only to find a good zero-layer
    entry point (lib.rs:365-379: ef=1 greedy per layer).  That descent is
    latency-bound on TPU — each hop is one scattered row-gather dispatch
    for the whole batch.  Because this build's pids are a seeded random
    shuffle of the input (lib.rs:256-270 semantics), any pid prefix is a
    uniform random sample, and the upper layers ARE prefixes — so one
    batched matmul against the first S points finds a *better* entry than
    the descent (the nearest of S~thousands of samples, not a greedy
    walk's local minimum) in one MXU pass.

    ``seed_vecs``: [S, D] dequantized seed matrix (bf16; ranking-only).
    Returns (d [B, n_init], p [B, n_init]): the n_init nearest seeds by
    approximate squared-L2, sorted ascending, pids = row indices < S.
    """
    q = queries.astype(jnp.bfloat16)
    # rank by  -2 q.s + |s|^2  (|q|^2 is constant per query); f32 accum
    qs = jax.lax.dot_general(
        q, seed_vecs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, S]
    sn = jnp.sum(seed_vecs.astype(jnp.float32) ** 2, axis=1)  # [S]
    scores = sn[None, :] - 2.0 * qs
    nd, np_ = jax.lax.top_k(-scores, n_init)                 # [B, n_init]
    qn = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1)
    return -nd + qn[:, None], np_.astype(jnp.int32)


def packed_search(queries, zero_pack, upper_packs, points, metric: Metric,
                  ef: int, k: int, max_iter_factor: int = 8,
                  expand: int = 4, rerank: bool = True, eligible=None,
                  seed_vecs=None):
    """Full packed query: approx descent + approx beam + exact rerank.

    ``zero_pack``/``upper_packs``: (ids, codes, scales) tuples (uppers
    ordered top first).  ``points`` are the exact f32 vectors used only
    for the final rerank (ef rows per query).  ``eligible`` (bool [N],
    optional) filters results without affecting traversal.

    ``seed_vecs`` ([S, D] bf16, optional): when given, entry is one MXU
    scan over these seed vectors (``seed_entry``) instead of the
    layer-by-layer greedy descent — the beam starts at the ef nearest
    of S uniform samples, cutting both the descent dispatches and the
    zero-layer iterations to convergence.
    Returns (dists [B, k], pids [B, k]) with exact distances.
    """
    b = queries.shape[0]
    if seed_vecs is not None:
        n_init = min(ef, seed_vecs.shape[0])
        sd, sp = seed_entry(queries, seed_vecs, n_init)
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32)
        beam_d = jax.lax.dynamic_update_slice(beam_d, sd, (0, 0))
        beam_p = jnp.full((b, ef), -1, jnp.int32)
        beam_p = jax.lax.dynamic_update_slice(beam_p, sp, (0, 0))
    else:
        d0 = metric.gathered(
            queries, points[jnp.zeros((b, 1), jnp.int32)]
            [..., :queries.shape[1]])[:, 0]
        cur_d, cur_p = d0, jnp.zeros(b, jnp.int32)
        for (uids, ucodes, uscales) in upper_packs:
            cur_d, cur_p = greedy_descent_packed(
                queries, uids, ucodes, uscales, cur_d, cur_p)
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(cur_d)
        beam_p = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(cur_p)
    zids, zcodes, zscales = zero_pack
    beam_e = jnp.zeros((b, ef), bool)
    bd, bp = beam_search_packed(
        queries, zids, zcodes, zscales, beam_d, beam_p, beam_e,
        max_iters=max_iter_factor * ef + 16, expand=expand,
        eligible=eligible)
    if not rerank:
        return bd[:, :k], bp[:, :k]
    # exact rerank of the final beam (the only exact-point gather);
    # points may be 128-lane zero-padded (tiled-copy fix) -> slice the
    # gathered rows back to the queries' D
    exact = metric.gathered(
        queries, points[jnp.clip(bp, 0)][..., :queries.shape[1]])
    exact = jnp.where(bp >= 0, exact, jnp.inf)
    sd, sp = jax.lax.sort((exact, bp), dimension=1, num_keys=2)
    return sd[:, :k], sp[:, :k]
