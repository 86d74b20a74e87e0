"""Batched wavefront beam search — the TPU-native HNSW query engine.

This replaces the reference's per-query heap + sorted-vec search state
(``Search``: candidates BinaryHeap, sorted ``nearest``, ``Visited`` epoch
bitset — instant-distance/src/lib.rs:556-778, types.rs:13-59) with a single
fixed-shape *beam* per query: sorted arrays ``(dist f32[B, ef], pid i32[B,
ef], expanded bool[B, ef])``.

Equivalence argument (paper Alg. 2 == expanded-flag beam):
the reference loop pops the heap's nearest candidate and breaks when it is
further than the furthest of ``nearest``.  Every member of ``nearest`` was
pushed to the heap when inserted, so unexpanded ``nearest`` members are
always in the heap; any heap entry that fell out of ``nearest`` is further
than the (monotonically shrinking) furthest and therefore triggers the
break when popped.  Hence the loop expands exactly the nearest *unexpanded
beam member* each step and terminates when none remain — which is precisely
what this kernel does, one wavefront step for all B queries at once.
A node pruned from a full beam can never re-enter (the beam max only
decreases), so no visited bitset is needed: dedup against the current beam
suffices.  Ties are broken by (distance, pid) exactly like ``Candidate``'s
ordering (types.rs:229-234).

Per step per query: one adjacency-row gather, one [B, K, D] point gather,
one batched distance eval (VPU/MXU), one (ef+K)-wide sort-merge.  Traversal
irregularity is amortized over thousands of concurrent queries per TPU step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distance import Metric

_I32MAX = jnp.iinfo(jnp.int32).max


def greedy_descent(queries, adj, points, metric: Metric, cur_d, cur_p,
                   links: int, max_iters: int):
    """Batched ef=1 greedy search on one layer (upper-layer descent).

    Mirrors the reference's upper-layer phase (lib.rs:365-379 with ef=1):
    repeatedly move to the lexicographically smallest ``(distance, pid)``
    neighbor of the current node; stop at a local minimum.

    Args:
      queries: [B, D] query points.
      adj:     [N_layer, R] int32 adjacency rows, -1 padded.
      points:  [N, D] all points (pids index into this).
      cur_d, cur_p: [B] entry state (distance already evaluated).
    Returns:
      (cur_d, cur_p): [B] the per-query local minimum.
    """
    b = queries.shape[0]

    def cond(state):
        it, _, _, done = state
        return (it < max_iters) & ~jnp.all(done)

    def body(state):
        it, cd, cp, done = state
        nb = adj[jnp.clip(cp, 0)][:, :links]                  # [B, K]
        nvalid = (nb >= 0) & ~done[:, None]
        nd = metric.gathered(queries, points[jnp.clip(nb, 0)])  # [B, K]
        nd = jnp.where(nvalid, nd, jnp.inf)
        md = jnp.min(nd, axis=1)                               # [B]
        # tie-break equal distances by smallest pid (Candidate ordering)
        mp = jnp.min(jnp.where(nd == md[:, None], nb, _I32MAX), axis=1)
        better = (md < cd) | ((md == cd) & (mp < cp))
        step = better & ~done
        cd = jnp.where(step, md, cd)
        cp = jnp.where(step, mp, cp)
        done = done | ~better
        return it + 1, cd, cp, done

    _, cd, cp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur_d, cur_p, jnp.zeros(b, bool)))
    return cd, cp


def beam_search_layer(queries, adj, points, metric: Metric,
                      beam_d, beam_p, beam_e,
                      links: int, max_iters: int, expand: int = 1,
                      eligible=None, return_iters: bool = False):
    """One layer of batched best-first search with an ef-wide beam.

    The beam arrays must be sorted ascending by (dist, pid) with invalid
    slots as (inf, -1, False).  ``links`` caps the neighbors considered per
    row, matching the reference's ``NearestIter::take(links)``
    (lib.rs:606, types.rs:172-192); it may be a python int or a traced
    scalar (the cap is applied as a mask, so one compiled program serves
    both M and M*2 link counts during construction).

    ``expand`` is the wavefront width: how many of the nearest unexpanded
    beam entries are expanded per step.  expand=1 is the reference's
    strict best-first order; expand>1 trades a few extra distance
    evaluations for ~expand x fewer sequential steps (the throughput move
    for batched TPU serving — each step is a dispatch of gathers +
    one sort-merge, so fewer, fatter steps run closer to HBM speed of
    light).  The stopping rule is unchanged (no unexpanded beam entries),
    so results can only gain recall over expand=1, never lose it.

    ``eligible`` (optional, bool [N]): predicate filtering which nodes may
    appear in *results*.  Traversal is unaffected — the beam routes
    through ineligible nodes exactly as without the filter — but a
    separate result beam collects only eligible nodes (the filtered-ANN
    semantics of hnswlib/faiss ID selectors: filter the result set, not
    the graph walk).  For very selective filters raise ef: the walk still
    visits ~ef nodes total, of which only the eligible ones are returned.

    Returns the final sorted beam ``(beam_d, beam_p)`` (the result beam
    when ``eligible`` is given).
    """
    b, ef = beam_p.shape
    row_width = adj.shape[1]
    e_n = max(1, min(expand, ef))
    col = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, row_width), 2)                        # [1,1,K]
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, ef), 1)
    rows_b = jnp.arange(b)[:, None]
    filtered = eligible is not None

    def _mask_eligible(d, p):
        ok = (p >= 0) & eligible[jnp.clip(p, 0)]
        return jnp.where(ok, d, jnp.inf), jnp.where(ok, p, -1)

    if filtered:
        rd0, rp0 = _mask_eligible(beam_d, beam_p)
        rd0, rp0 = jax.lax.sort((rd0, rp0), dimension=1, num_keys=2)
    else:  # dummy carries keep one while_loop structure for both modes
        rd0, rp0 = beam_d, beam_p

    def expandable(bp, be):
        return (bp >= 0) & ~be

    def cond(state):
        it, _, bp, be, _, _ = state
        return (it < max_iters) & jnp.any(expandable(bp, be))

    def body(state):
        it, bd, bp, be, rd, rp = state
        exp = expandable(bp, be)                                # [B, ef]
        rank = jnp.cumsum(exp, axis=1) - 1                      # [B, ef]
        chosen = exp & (rank < e_n)
        # slots of the e_n nearest unexpanded entries (beam is sorted)
        sel = jnp.full((b, e_n), -1, jnp.int32).at[
            rows_b, jnp.where(chosen, rank, e_n)].set(slot, mode="drop")
        cur = jnp.where(sel >= 0,
                        jnp.take_along_axis(bp, jnp.clip(sel, 0), 1), -1)
        be = be | chosen
        nb = adj[jnp.clip(cur, 0)]                              # [B, E, K]
        nvalid = (nb >= 0) & (cur >= 0)[:, :, None] & (col < links)
        nb = jnp.where(nvalid, nb, -1).reshape(b, e_n * row_width)
        # dedup (VPU compares beat extra sort passes): drop candidates
        # already in the beam, and repeats within this wavefront's union
        dup = jnp.any((nb[:, :, None] == bp[:, None, :]) & (bp >= 0)[:, None, :],
                      axis=2)
        ek = e_n * row_width
        tril = jnp.tril(jnp.ones((ek, ek), bool), k=-1)
        dup |= jnp.any((nb[:, :, None] == nb[:, None, :]) & tril, axis=2)
        nb = jnp.where(dup, -1, nb)
        nd = metric.gathered(
            queries, points[jnp.clip(nb, 0)].reshape(b, ek, -1))
        nd = jnp.where(nb >= 0, nd, jnp.inf)
        if filtered:
            # a node pruned from the traversal beam can be re-proposed by
            # a later expansion (it only never re-enters the *beam*), so
            # the result beam needs its own dedup against current members
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
        # merge: one sort by (dist, pid) — the reference's Candidate
        # order (types.rs:229-234) — then truncate to ef
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


def hnsw_search(queries, zero_adj, upper_adjs, points, metric: Metric,
                ef: int, m: int, zero_links: int,
                max_iter_factor: int = 8, greedy_max_iters: int = 512,
                expand: int = 1, eligible=None, entry_seeds: int = 0):
    """Full batched HNSW query: entry -> greedy descent -> zero-layer beam.

    Mirrors ``Hnsw::search`` (lib.rs:352-383): the entry point is always pid
    0 (the highest-layer point); upper layers run ef=1 with M links; the
    zero layer runs the full beam with ``zero_links`` links (M*2 for
    queries; M when used for construction at an upper target layer,
    lib.rs:445).

    Args:
      upper_adjs: tuple of [N_l, M] adjacency arrays ordered TOP FIRST.
      eligible: optional bool [N] result filter (see beam_search_layer);
        greedy descent ignores it (upper layers only route).
      entry_seeds: S>0 replaces the descent with ONE MXU pairwise-distance
        scan over points[:S] (a uniform sample — pids are a seeded
        shuffle, and upper layers are pid prefixes), starting the beam
        at the ef nearest seeds.  The descent's job is only to find a
        good zero-layer entry (lib.rs:365-379); the seed scan finds a
        better one without the descent's sequential gather dispatches.
    Returns:
      (dists [B, ef], pids [B, ef]) sorted ascending; invalid slots (inf, -1).
    """
    b = queries.shape[0]
    if entry_seeds:
        sd = metric.pairwise(queries, points[:entry_seeds])     # [B, S]
        n_init = min(ef, entry_seeds)
        nd, np_ = jax.lax.top_k(-sd, n_init)
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32)
        beam_d = jax.lax.dynamic_update_slice(beam_d, -nd, (0, 0))
        beam_p = jnp.full((b, ef), -1, jnp.int32)
        beam_p = jax.lax.dynamic_update_slice(
            beam_p, np_.astype(jnp.int32), (0, 0))
    else:
        d0 = metric.gathered(
            queries, points[jnp.zeros((b, 1), jnp.int32)])[:, 0]
        cur_d, cur_p = d0, jnp.zeros(b, jnp.int32)
        for adj in upper_adjs:
            cur_d, cur_p = greedy_descent(
                queries, adj, points, metric, cur_d, cur_p,
                links=min(m, adj.shape[1]), max_iters=greedy_max_iters)
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(cur_d)
        beam_p = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(cur_p)
    beam_e = jnp.zeros((b, ef), bool)
    return beam_search_layer(
        queries, zero_adj, points, metric, beam_d, beam_p, beam_e,
        links=zero_links, max_iters=max_iter_factor * ef + 16,
        expand=expand, eligible=eligible)
