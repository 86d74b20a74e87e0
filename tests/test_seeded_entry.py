"""Seeded-entry serving (Config.entry_seeds): recall parity with the
classic descent.

The upper layers of HNSW exist only to locate a zero-layer entry point
(lib.rs:365-379); entry_seeds=S replaces that sequential greedy descent
with one MXU scan over the first S pids (a uniform random sample — pids
are a seeded shuffle, lib.rs:256-270) and starts the beam at the ef
nearest seeds.  The stopping rule is unchanged, and the beam starts at
least as close to the query as the descent's single entry, so recall
must not regress.
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.models.packed import PackedHnsw


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(41)
    pts = rng.random((4096, 16), dtype=np.float32)
    queries = rng.random((64, 16), dtype=np.float32)
    index, ids = Hnsw.build(pts, Config(seed=41, wave_size=1024))
    gt = np.asarray(BruteForce(pts).search_batch(queries, 10)[1])
    gt_pids = ids[gt]
    return index, queries, gt_pids


def _recall(p, gt_pids):
    got = np.asarray(p)
    return float(np.mean([
        len(set(got[i].tolist()) & set(gt_pids[i].tolist())) / 10
        for i in range(len(got))]))


def test_exact_seeded_matches_descent_recall(built):
    index, queries, gt_pids = built
    _, p0 = index.search_batch(queries, k=10, ef=64)
    r0 = _recall(p0, gt_pids)
    index.config.entry_seeds = 512
    try:
        _, p1 = index.search_batch(queries, k=10, ef=64)
    finally:
        index.config.entry_seeds = 0
    r1 = _recall(p1, gt_pids)
    assert r0 >= 0.9 and r1 >= 0.9
    assert r1 >= r0 - 0.02, f"seeded {r1} vs descent {r0}"


def test_packed_seeded_matches_descent_recall(built):
    index, queries, gt_pids = built
    pk = PackedHnsw.from_index(index)
    _, p0 = pk.search_batch(queries, k=10, ef=64, entry_seeds=0)
    _, p1 = pk.search_batch(queries, k=10, ef=64, entry_seeds=512)
    r0, r1 = _recall(p0, gt_pids), _recall(p1, gt_pids)
    assert r0 >= 0.85 and r1 >= 0.85
    assert r1 >= r0 - 0.03, f"seeded {r1} vs descent {r0}"


def test_seeds_larger_than_index_clamped(built):
    index, queries, gt_pids = built
    index.config.entry_seeds = 10 ** 9  # > N: clamps to N = exact scan
    try:
        _, p = index.search_batch(queries, k=10, ef=64)
    finally:
        index.config.entry_seeds = 0
    assert _recall(p, gt_pids) >= 0.99  # beam init IS the exact top-ef
