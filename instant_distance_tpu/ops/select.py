"""Batched neighbor selection — paper Algorithms 3 & 4, vectorized.

The reference selects neighbors one insert at a time with Vec scans
(``select_simple`` lib.rs:758-760, ``select_heuristic`` lib.rs:636-698).
Here selection runs for a whole construction wave at once: the pairwise
candidate-to-candidate distances that drive the bridging rule become one
batched MXU matmul ([W, C, D] x [W, C, D] -> [W, C, C]), and the greedy
keep/discard scan becomes a fori_loop over candidate rank with [W, C]
vector updates.

Semantics preserved from the reference:
* candidates are processed in ascending (distance, pid) order;
* a candidate is kept iff no already-kept result is closer to it than the
  query is (the bridging rule, lib.rs:674-679);
* scanning stops once M*2 results are kept (lib.rs:668-670) — later
  candidates are neither kept nor recorded as discarded;
* with ``keep_pruned``, discarded candidates backfill the result set to
  M*2, in scan order (lib.rs:687-695).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distance import Metric


def select_simple(cand_d, cand_p, m0: int):
    """Paper Alg. 3: the M*2 nearest candidates (lib.rs:465-468,758-760).

    ``cand_d``/``cand_p`` are [W, C] sorted ascending with (inf, -1) pads.
    """
    c = cand_p.shape[1]
    if c < m0:
        cand_d = jnp.pad(cand_d, ((0, 0), (0, m0 - c)),
                         constant_values=jnp.inf)
        cand_p = jnp.pad(cand_p, ((0, 0), (0, m0 - c)), constant_values=-1)
    return cand_d[:, :m0], cand_p[:, :m0]


def select_heuristic(q_pts, cand_d, cand_p, cand_pts, metric: Metric,
                     m0: int, keep_pruned: bool, pd_dtype=None):
    """Paper Alg. 4, batched over W queries.

    Args:
      q_pts:    [W, D] query (new point) coordinates.
      cand_d:   [W, C] candidate distances to query, sorted ascending.
      cand_p:   [W, C] candidate pids (-1 = invalid pad).
      cand_pts: [W, C, D] candidate coordinates (caller gathers, so it can
                chunk the gather for memory).
      pd_dtype: dtype of the candidate-pairwise matrix (bfloat16 halves
                the dominant HBM traffic of the reverse-edge commit; the
                bridging comparisons tolerate the resolution).
    Returns:
      (sel_d, sel_p): [W, m0] selected rows in kept-then-pruned order,
      padded with (inf, -1).  This order is what the reference writes into
      ZeroNode rows via ``rewrite``/``set`` (lib.rs:481-517).
    """
    w, c = cand_p.shape
    pd = metric.self_pairwise(cand_pts, out_dtype=pd_dtype)  # [W, C, C]
    valid = cand_p >= 0

    def body(j, state):
        kept, disc, count = state
        dj = cand_d[:, j]
        examined = count < m0
        blocked = jnp.any(kept & (pd[:, :, j] < dj[:, None]), axis=1)
        take = valid[:, j] & examined & ~blocked
        drop = valid[:, j] & examined & blocked
        kept = kept.at[:, j].set(take)
        disc = disc.at[:, j].set(drop)
        return kept, disc, count + take.astype(jnp.int32)

    kept = jnp.zeros((w, c), bool)
    disc = jnp.zeros((w, c), bool)
    count = jnp.zeros(w, jnp.int32)
    kept, disc, count = jax.lax.fori_loop(0, c, body, (kept, disc, count))

    kept_rank = jnp.cumsum(kept, axis=1) - 1
    if keep_pruned:
        disc_rank = count[:, None] + jnp.cumsum(disc, axis=1) - 1
        rank = jnp.where(kept, kept_rank, jnp.where(disc, disc_rank, m0))
    else:
        rank = jnp.where(kept, kept_rank, m0)
    rank = jnp.minimum(rank, m0).astype(jnp.int32)  # m0 -> dropped

    rows = jnp.arange(w)[:, None]
    sel_p = jnp.full((w, m0), -1, jnp.int32).at[rows, rank].set(
        cand_p, mode="drop")
    sel_d = jnp.full((w, m0), jnp.inf, jnp.float32).at[rows, rank].set(
        cand_d, mode="drop")
    return sel_d, sel_p


def extend_candidates(q_pts, cand_d, cand_p, adj, points, metric: Metric,
                      links, cap: int):
    """Candidate-set extension for Alg. 4's ``extend_candidates`` knob
    (lib.rs:648-664): add the neighbors of every candidate, dedup, sort by
    (distance, pid) and keep the ``cap`` nearest.

    Deviation from the reference: the reference dedups hop candidates
    against the *entire search trail* (its Visited set, lib.rs:650-652);
    the batched form dedups against the candidate set and the hops
    themselves.  The knob is off by default and documented as useful only
    for extremely clustered data.
    """
    w, c = cand_p.shape
    k = adj.shape[1]
    hops = adj[jnp.clip(cand_p, 0)].reshape(w, c * k)              # [W, C*K]
    colmask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2) < links
    hmask = ((cand_p >= 0)[:, :, None] & colmask).reshape(w, c * k)
    hops = jnp.where(hmask, hops, -1)
    hd = metric.gathered(q_pts, points[jnp.clip(hops, 0)])
    hd = jnp.where(hops >= 0, hd, jnp.inf)

    all_p = jnp.concatenate([cand_p, hops], axis=1)
    all_d = jnp.concatenate([cand_d, hd], axis=1)
    # dedup: sort by (pid, dist), invalidate repeats of the same pid
    key_p = jnp.where(all_p >= 0, all_p, jnp.iinfo(jnp.int32).max)
    sp, sd = jax.lax.sort((key_p, all_d), dimension=1, num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((w, 1), bool), sp[:, 1:] == sp[:, :-1]], axis=1)
    sd = jnp.where(dup | (sp == jnp.iinfo(jnp.int32).max), jnp.inf, sd)
    sp = jnp.where(jnp.isfinite(sd), sp, -1)
    # resort by (dist, pid) and truncate
    od, op = jax.lax.sort((sd, sp), dimension=1, num_keys=2)
    return od[:, :cap], op[:, :cap]
