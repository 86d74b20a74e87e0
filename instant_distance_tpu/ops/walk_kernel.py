"""Pallas fused graph-walk kernel: the whole packed beam search in VMEM.

The XLA packed traversal (ops/packed.py beam_search_packed) pays, per
wavefront step, (a) a 2-key ``lax.sort`` over [B, ef+E*K] beam+candidate
arrays, (b) HBM round-trips for every intermediate (the dequantized
[B, E, K, D] f32 neighbor block alone is 4x the gathered int8 bytes), and
(c) full-batch work until the SLOWEST query converges — a query that
finished at step 12 still gathers rows at step 40.  This kernel fuses the
entire zero-layer walk into one Pallas program per query block:

  * beam state (dist/pid/expanded) lives in VMEM scratch across steps —
    zero HBM traffic for search state;
  * neighbor rows are fetched with predicated async DMAs straight from
    the packed HBM arrays (one fat codes row + one meta row per
    expansion), issued together so the hardware queues overlap them, and
    *skipped entirely* for converged queries;
  * the sort-merge is replaced by a counting-rank merge (pairwise
    compares + one-hot extraction, all lane-local VPU work);
  * each block of BQ queries exits its while-loop as soon as ALL of its
    queries converge, instead of riding the global worst case.

Semantics are exactly ``beam_search_packed`` (same expanded-flag beam —
the Alg. 2 equivalence argument in ops/beam.py applies unchanged, same
top-``expand`` wavefront, same (distance, pid) tie-breaks, same beam
-membership dedup): the reference behavior is Search::search,
instant-distance/src/lib.rs:598-614.  Intra-wavefront duplicate nulling
assumes each adjacency row holds distinct pids — an invariant the
builder/validator enforce (utils/validate.py) — whereas the XLA path's
tril dedup would also mask in-row duplicates; everything else matches
element-for-element on valid graphs.

Layout contract (built by :func:`pack_walk_meta`):
  codes [N, K, D] int8   — inline neighbor codes (zero_pack codes);
  meta  [N, 2*Kp] int32  — lanes [0, K) neighbor ids, lanes [Kp, Kp+K)
                           neighbor scales bitcast to int32 (Kp = K
                           padded to a multiple of 64 so 2*Kp is a lane
                           multiple of 128).
D must be a multiple of 128 (pad points/codes with zero columns — a
zero column adds 0 to every squared-L2 term).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_walk_meta(ids, scales):
    """[N, K] int32 ids + [N, K] f32 scales -> [N, 2*Kp] int32 meta rows
    (one DMA-able row per node; see module docstring for the layout)."""
    ids = np.asarray(ids, np.int32)
    scales = np.asarray(scales, np.float32)
    n, k = ids.shape
    kp = ((k + 63) // 64) * 64
    if (2 * kp) % 128:
        kp += 64
    meta = np.full((n, 2 * kp), -1, np.int32)
    meta[:, :k] = ids
    meta[:, kp:kp + k] = scales.view(np.int32)
    return meta, kp


def pack_walk_fused(ids, scales, codes):
    """[N, K] i32 ids + [N, K] f32 scales + [N, K, D] int8 codes ->
    fused rows [N, K+4, D] int8: ONE DMA per expansion fetches codes
    AND metadata (the split layout's second meta DMA doubles the
    scalar-core issue cost, which is the kernel's per-step floor).

    Rows K..K+3, lanes [0, 128) are little-endian byte-planes (row r,
    lane j = byte r of int32 j) of a 128-int32 meta row: neighbor ids
    at int32 lanes [0, K), scale bits at lanes [64, 64+K).  The
    byte-plane layout makes the in-kernel reconstruction four full
    sublane-row slices + shift/or arithmetic — no cross-lane strides,
    no dtype-width bitcasts, hardware-layout-independent.
    Requires D % 128 == 0 and K <= 64.  Rows are padded to a multiple
    of 8 (Mosaic requires HBM row-slice sublane extents aligned to the
    (8, 128) tile — an unpadded K+4 = 36/68 block fails to compile);
    callers must pass the true ``k`` to :func:`walk_search` since it is
    no longer ``rows - 4``."""
    codes = np.asarray(codes, np.int8)
    n, k, d = codes.shape
    if d % 128 or k > 64:
        raise ValueError(f"fused rows need D%128==0, K<=64 (got {d},{k})")
    meta = np.full((n, 128), -1, np.int32)
    meta[:, :k] = np.asarray(ids, np.int32)
    meta[:, 64:64 + k] = np.asarray(scales, np.float32).view(np.int32)
    planes = meta.view(np.uint8).reshape(n, 128, 4).transpose(0, 2, 1)
    rpad = ((k + 4 + 7) // 8) * 8
    frow = np.zeros((n, rpad, d), np.int8)
    frow[:, :k, :] = codes
    frow[:, k:k + 4, :128] = planes.view(np.int8)
    return frow


def _unrolled_rank_lt(exp_i32):
    """Per-lane exclusive prefix sum over the ef axis (rank of each
    expandable beam slot), unrolled — Mosaic-safe replacement for
    cumsum."""
    bq, ef = exp_i32.shape
    run = jnp.zeros((bq, 1), jnp.int32)
    cols = []
    for j in range(ef):
        cols.append(run + exp_i32[:, j:j + 1] - 1)
        run = run + exp_i32[:, j:j + 1]
    return jnp.concatenate(cols, axis=1)                    # [BQ, ef]


def _walk_kernel(q_ref, bd0_ref, bp0_ref, codes_ref, meta_ref,
                 bd_out, bp_out,
                 crow, mrow, bev, pidv, pids, sems, psem, *,
                 k: int, kp: int, expand: int, ef: int, max_iters: int,
                 pid_via_smem: bool, fused_rows: bool, merge: str):
    bq = q_ref.shape[0]
    e_n = expand
    ek = e_n * k
    t_all = ef + ek
    q = q_ref[:].astype(jnp.float32)                        # [BQ, D]
    bd_out[:] = bd0_ref[:]
    bp_out[:] = bp0_ref[:]
    bev[:] = jnp.zeros((bq, ef), jnp.int32)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (bq, t_all), 1)

    def cond(carry):
        it, active = carry
        return (it < max_iters) & active

    def body(carry):
        it, _ = carry
        bd = bd_out[:]
        bp = bp_out[:]
        be = bev[:] > 0
        exp = (bp >= 0) & ~be
        rank = _unrolled_rank_lt(jnp.where(exp, 1, 0))     # [BQ, ef]
        chosen = exp & (rank < e_n)
        bev[:] = jnp.where(chosen, 1, bev[:])
        # chosen pids, one column per expansion slot (invalid = -1)
        pcols = []
        for e in range(e_n):
            sel = chosen & (rank == e)
            cur = jnp.sum(jnp.where(sel, bp, 0), axis=1, keepdims=True)
            has = jnp.sum(jnp.where(sel, 1, 0), axis=1,
                          keepdims=True) > 0
            pcols.append(jnp.where(has, cur, -1))
        pidv[:] = jnp.concatenate(pcols, axis=1)            # [BQ, E]
        if pid_via_smem:
            cp_pid = pltpu.make_async_copy(pidv, pids, psem)
            cp_pid.start()
            cp_pid.wait()
            pid_src = pids
        else:
            pid_src = pidv
        # issue ALL row DMAs (codes + meta per expansion), then wait —
        # the per-row copies overlap each other in the DMA queues;
        # converged/short queries (pid < 0) skip both ends.  The loops
        # run on the scalar core with dynamic scratch-slot indices (an
        # unrolled form compiles to a ~100x larger Mosaic program).
        def _dma_pair(j, start: bool):
            e = j // bq
            i = j - e * bq
            pid = pid_src[i, e]

            @pl.when(pid >= 0)
            def _():
                c = pltpu.make_async_copy(
                    codes_ref.at[pid], crow.at[e, i], sems.at[0])
                if fused_rows:
                    # metadata rides inside the codes row (byte planes,
                    # pack_walk_fused) — half the scalar issue cost
                    if start:
                        c.start()
                    else:
                        c.wait()
                    return
                m_ = pltpu.make_async_copy(
                    meta_ref.at[pid], mrow.at[e, i], sems.at[1])
                if start:
                    c.start()
                    m_.start()
                else:
                    c.wait()
                    m_.wait()

        def _issue(j, carry):
            _dma_pair(j, start=True)
            return carry

        def _drain(j, carry):
            _dma_pair(j, start=False)
            return carry

        jax.lax.fori_loop(0, e_n * bq, _issue, 0)
        jax.lax.fori_loop(0, e_n * bq, _drain, 0)
        # approx distances (same f32 dequant diff-square as the XLA path)
        pid_mat = pidv[:]                                   # [BQ, E]
        nds, nbs = [], []
        for e in range(e_n):
            if fused_rows:
                blk = crow[e][:]                            # [BQ, K+4, D]
                # byte-plane meta reconstruction (pack_walk_fused):
                # four full sublane-row slices + shift/or — exact i32,
                # independent of hardware vreg packing
                b0 = blk[:, k + 0, :128].astype(jnp.int32) & 255
                b1 = blk[:, k + 1, :128].astype(jnp.int32) & 255
                b2 = blk[:, k + 2, :128].astype(jnp.int32) & 255
                b3 = blk[:, k + 3, :128].astype(jnp.int32)
                meta32 = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
                ids_e = meta32[:, :k]                       # [BQ, K]
                s_e = pltpu.bitcast(meta32[:, 64:64 + k], jnp.float32)
                codes_blk = blk[:, :k, :].astype(jnp.float32)
            else:
                ids_e = mrow[e][:, :k]                      # [BQ, K]
                s_e = pltpu.bitcast(mrow[e][:, kp:kp + k], jnp.float32)
                codes_blk = crow[e][:].astype(jnp.float32)
            deq = codes_blk * s_e[:, :, None]
            diff = q[:, None, :] - deq                      # [BQ, K, D]
            nd_e = jnp.sum(diff * diff, axis=2)             # [BQ, K]
            valid = (ids_e >= 0) & (pid_mat[:, e:e + 1] >= 0)
            nds.append(jnp.where(valid, nd_e, jnp.inf))
            nbs.append(jnp.where(valid, ids_e, -1))
        # dedup vs the (pre-merge) beam ... (i32 accumulators: Mosaic
        # cannot concatenate/bitcast i1 vregs)
        dups = []
        for e in range(e_n):
            dup_e = jnp.zeros((bq, k), jnp.int32)
            for j in range(ef):
                bpj = bp[:, j:j + 1]
                dup_e = jnp.where((nbs[e] == bpj) & (bpj >= 0), 1, dup_e)
            dups.append(dup_e)
        # ... and across expansion groups (within-row ids are unique by
        # graph invariant; later groups defer to earlier ones, matching
        # the XLA path's tril nulling)
        for e_hi in range(1, e_n):
            for e_lo in range(e_hi):
                for j in range(k):
                    loj = nbs[e_lo][:, j:j + 1]
                    dups[e_hi] = jnp.where(
                        (nbs[e_hi] == loj) & (loj >= 0), 1, dups[e_hi])
        dup = jnp.concatenate(dups, axis=1) > 0             # [BQ, EK]
        nd = jnp.concatenate(nds, axis=1)
        nb = jnp.concatenate(nbs, axis=1)
        nd = jnp.where(dup, jnp.inf, nd)
        nb = jnp.where(dup, -1, nb)
        # merge to the new top-ef beam, strict total order by
        # (dist, pid, index) — identical order under both strategies
        all_d = jnp.concatenate([bd, nd], axis=1)           # [BQ, T]
        all_p = jnp.concatenate([bp, nb], axis=1)
        all_e = jnp.concatenate(
            [bev[:], jnp.zeros((bq, ek), jnp.int32)], axis=1)
        if merge == "extract":
            # min-extraction: ef rounds, each takes the strict minimum
            # of the untaken pool — O(ef*T) vs counting's O(T^2), and
            # dist/pid fall out of the min reductions for free (only
            # the expanded flag needs a masked-sum extraction)
            big = jnp.int32(2 ** 30)
            rem_d = all_d
            taken = jnp.zeros((bq, t_all), jnp.int32)
            ncols_d, ncols_p, ncols_e = [], [], []
            for r in range(ef):
                md = jnp.min(rem_d, axis=1, keepdims=True)
                # `taken` filter matters once md == +inf: masking a
                # taken slot's rem_d to +inf no longer removes it from
                # the tie set
                tie = (rem_d == md) & (taken == 0)
                pc = jnp.where(tie, all_p, big)
                mp = jnp.min(pc, axis=1, keepdims=True)
                tie2 = tie & (all_p == mp)
                ic = jnp.where(tie2, iota_t, big)
                mi = jnp.min(ic, axis=1, keepdims=True)
                sel = tie2 & (iota_t == mi)
                ncols_d.append(md)
                ncols_p.append(mp)
                ncols_e.append(jnp.sum(jnp.where(sel, all_e, 0), axis=1,
                                       keepdims=True))
                sel_i = jnp.where(sel, 1, 0)
                taken = taken + sel_i
                rem_d = jnp.where(sel, jnp.inf, rem_d)
        else:
            # counting rank: rank[l] = #{j : key_j < key_l}
            rankv = jnp.zeros((bq, t_all), jnp.int32)
            for j in range(t_all):
                dj = all_d[:, j:j + 1]
                pj = all_p[:, j:j + 1]
                less = (dj < all_d) | (
                    (dj == all_d) & ((pj < all_p)
                                     | ((pj == all_p) & (iota_t > j))))
                rankv = rankv + jnp.where(less, 1, 0)
            ncols_d, ncols_p, ncols_e = [], [], []
            for r in range(ef):
                sel = rankv == r
                ncols_d.append(jnp.sum(jnp.where(sel, all_d, 0.0), axis=1,
                                       keepdims=True))
                ncols_p.append(jnp.sum(jnp.where(sel, all_p, 0), axis=1,
                                       keepdims=True))
                ncols_e.append(jnp.sum(jnp.where(sel, all_e, 0), axis=1,
                                       keepdims=True))
        nbd = jnp.concatenate(ncols_d, axis=1)
        nbp = jnp.concatenate(ncols_p, axis=1)
        nbe = jnp.concatenate(ncols_e, axis=1)
        bd_out[:] = nbd
        bp_out[:] = nbp
        bev[:] = nbe
        active = jnp.sum(
            jnp.where((nbp >= 0) & (nbe == 0), 1, 0)) > 0
        return it + 1, active

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))


@functools.partial(
    jax.jit, static_argnames=("kp", "expand", "ef", "max_iters", "bq",
                              "pid_via_smem", "interpret", "fused_rows",
                              "merge", "k"))
def walk_search(queries, beam_d0, beam_p0, codes, meta, *, kp: int,
                expand: int = 2, ef: int = 16, max_iters: int = 144,
                bq: int = 128, pid_via_smem: bool = True,
                interpret: bool = False, fused_rows: bool = False,
                merge: str = "extract", k: Optional[int] = None):
    """Fused packed-graph beam search (approx distances, no rerank).

    Args:
      queries: [B, D] f32, B % bq == 0, D % 128 == 0.
      beam_d0/beam_p0: [B, ef] initial beam (seed-entry output placed in
        the leading slots, +inf/-1 elsewhere), sorted ascending.
      codes: [N, K, D] int8 inline neighbor codes (zero_pack), or with
        ``fused_rows=True`` the 8-row-aligned [N, Kpad, D] rows of
        :func:`pack_walk_fused` (metadata inline -> ONE DMA/expansion;
        pass the true ``k`` — it is no longer derivable from Kpad).
      meta:  [N, 2*kp] int32 rows from :func:`pack_walk_meta`
        (``fused_rows=False`` only; pass a [1, 128] dummy otherwise).
      merge: "extract" (min-extraction, O(ef*T)) or "count"
        (counting rank, O(T^2)) — identical beam order either way.
      k: true neighbor count; defaults to codes.shape[1] for the split
        layout and codes.shape[1] - 4 for legacy unpadded fused rows.
    Returns (bd [B, ef] f32 approx dists, bp [B, ef] i32), beam-sorted.
    """
    b, d = queries.shape
    n, kc, dc = codes.shape
    if k is None:
        k = kc - 4 if fused_rows else kc
    assert dc == d and b % bq == 0
    if not interpret and d % 128:
        raise ValueError(f"D = {d} must be a multiple of 128 lanes")
    if fused_rows and d % 128:
        raise ValueError("fused rows need D % 128 == 0")
    if expand not in (1, 2):
        raise ValueError("walk kernel supports expand in {1, 2}")
    grid = (b // bq,)
    kernel = functools.partial(
        _walk_kernel, k=k, kp=kp, expand=expand, ef=ef,
        max_iters=max_iters, pid_via_smem=pid_via_smem,
        fused_rows=fused_rows, merge=merge)
    bd, bp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bq, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ef), jnp.float32),
            jax.ShapeDtypeStruct((b, ef), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((expand, bq, kc, d), jnp.int8),      # crow
            pltpu.VMEM((1, 1, 128) if fused_rows
                       else (expand, bq, 2 * kp), jnp.int32),  # mrow
            pltpu.VMEM((bq, ef), jnp.int32),                # bev
            pltpu.VMEM((bq, expand), jnp.int32),            # pidv
            pltpu.SMEM((bq, expand), jnp.int32),            # pids
            pltpu.SemaphoreType.DMA((2,)),                  # sems
            pltpu.SemaphoreType.DMA(()),                    # psem
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # v5e VMEM is 128 MiB; the default 100 MiB scoped cap rejects
            # the bq=1024 fused variants (107.7 MiB stack) that do fit.
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(queries, beam_d0, beam_p0, codes, meta)
    return bd, bp
