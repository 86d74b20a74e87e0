"""extend_candidates semantics audit (VERDICT r1 missing #3 / next #10).

The reference's Alg. 4 extension dedups hop candidates against the whole
search trail (its Visited set, lib.rs:650-652): a point evaluated and
rejected during the ef_construction search is never re-added by the
extension.  The batched wave cannot afford a [W, N] visited bitset, so
ops/select.extend_candidates dedups only against the candidate set and
the hops themselves — a documented deviation whose only effect is that
some already-rejected points may re-enter the Alg. 4 scan (where the
bridging rule judges them again).

These tests take the VERDICT's offered alternative to trail-aware dedup:
demonstrate on heavily clustered data (the knob's target workload,
lib.rs:121-124) that the deviation does not cost recall — against both
the recall floor and a sequential reference implementation that DOES
dedup against the full trail (utils/refimpl.py passes the search's
visited set into selection).
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config, Heuristic
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw


def _clustered(rng, n, d, n_clusters, sigma):
    centers = rng.random((n_clusters, d), dtype=np.float32)
    pts = (centers[rng.integers(0, n_clusters, n)]
           + sigma * rng.standard_normal((n, d)).astype(np.float32))
    return pts.astype(np.float32)


def _recall(index, ids, pts, queries, k=10, ef=64):
    gt = np.asarray(BruteForce(pts).search_batch(queries, k)[1])
    _, p = index.search_batch(queries, k=k, ef=ef)
    got = np.asarray(p)
    return float(np.mean([
        len(set(got[i].tolist()) & set(ids[gt[i]].tolist())) / k
        for i in range(len(queries))]))


def test_knob_on_no_recall_loss_clustered():
    """Batched extend_candidates (candidate-set dedup) vs knob OFF on
    tightly clustered data: the knob must not lose recall."""
    rng = np.random.default_rng(101)
    pts = _clustered(rng, 2048, 8, 8, 0.01)
    queries = _clustered(rng, 64, 8, 8, 0.01)

    on = Config(seed=101, heuristic=Heuristic(extend_candidates=True))
    off = Config(seed=101, heuristic=Heuristic(extend_candidates=False))
    idx_on, ids_on = Hnsw.build(pts, on)
    idx_off, ids_off = Hnsw.build(pts, off)

    r_on = _recall(idx_on, ids_on, pts, queries)
    r_off = _recall(idx_off, ids_off, pts, queries)
    print(f"extend_candidates clustered recall: on={r_on} off={r_off}")
    assert r_on >= 0.90                  # reference simple-selection floor
    assert r_on >= r_off - 0.02          # the knob never hurts


def test_knob_on_matches_trail_dedup_refimpl():
    """Batched (candidate-dedup) build vs the sequential refimpl with
    FULL trail dedup, same clustered data: recall within 3 points."""
    from instant_distance_tpu.utils.refimpl import RefHnsw

    rng = np.random.default_rng(103)
    pts = _clustered(rng, 512, 6, 4, 0.01)
    queries = _clustered(rng, 32, 6, 4, 0.01)

    cfg = Config(seed=103, ef_construction=64,
                 heuristic=Heuristic(extend_candidates=True))
    idx, ids = Hnsw.build(pts, cfg)
    r_batched = _recall(idx, ids, pts, queries, ef=48)

    ref = RefHnsw(pts, cfg)
    gt = np.asarray(BruteForce(pts).search_batch(queries, 10)[1])
    hits = []
    for i, q in enumerate(queries):
        got = {p for _, p in ref.search(q, ef=48)[:10]}  # pid space
        want = set(ref.ids[gt[i]].tolist())              # original -> pid
        hits.append(len(got & want) / 10)
    r_ref = float(np.mean(hits))
    print(f"extend_candidates: batched={r_batched} refimpl-trail={r_ref}")
    assert r_batched >= r_ref - 0.03
