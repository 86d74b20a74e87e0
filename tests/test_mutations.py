"""Filtered search, tombstone deletion, and incremental add.

Beyond-parity capabilities (the reference's index is immutable and
unfiltered; SURVEY.md §5 "no add/delete API anywhere in lib.rs").
Semantics under test:
  - filter/tombstone: traversal routes through excluded nodes, results
    never contain them (hnswlib/faiss ID-selector semantics);
  - add: zero-layer wave insertion against the frozen upper skeleton.
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw, HnswMap
from instant_distance_tpu.models.packed import PackedHnsw


def _recall(got, want):
    k = want.shape[1]
    return np.mean([
        len(set(got[i].tolist()) & set(want[i].tolist())) / k
        for i in range(len(got))])


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(101)
    pts = rng.random((1500, 8), dtype=np.float32)
    cfg = Config(seed=101, ef_search=64)
    index, ids = Hnsw.build(pts, cfg)
    queries = rng.random((16, 8), dtype=np.float32)
    return index, pts, ids, queries


def test_filtered_search_excludes_and_recalls(built):
    index, pts, ids, queries = built
    rng = np.random.default_rng(7)
    mask = rng.random(len(index)) < 0.5        # pid order

    d, p = index.search_batch(queries, k=10, filter_mask=mask)
    p = np.asarray(p)
    assert p.min() >= 0
    assert mask[p].all(), "filtered-out pid appeared in results"

    # ground truth over the eligible subset only (map back via ids:
    # ids[orig] = pid, so eligible original rows are mask[ids])
    sub = np.where(mask[ids])[0]
    gt_d, gt_sub = BruteForce(pts[sub]).search_batch(queries, 10)
    gt_pids = ids[sub[np.asarray(gt_sub)]]
    rec = _recall(p, gt_pids)
    print(f"filtered recall@10 = {rec}")
    assert rec >= 0.9

    # exact distances preserved
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0], rtol=1e-5)


def test_filter_very_selective(built):
    index, pts, ids, queries = built
    mask = np.zeros(len(index), bool)
    keep = np.arange(0, len(index), 100)       # ~1% eligible
    mask[keep] = True
    d, p = index.search_batch(queries, k=5, ef=128, filter_mask=mask)
    p = np.asarray(p)
    valid = p >= 0
    assert valid[:, 0].all(), "selective filter returned nothing"
    assert mask[np.clip(p, 0, None)][valid].all()


def test_delete_tombstones(built):
    index, pts, ids, queries = built
    d0, p0 = index.search_batch(queries, k=2)
    p0 = np.asarray(p0)
    top = np.unique(p0[:, 0])
    index.delete(top)
    try:
        assert index.n_deleted == len(top)
        d1, p1 = index.search_batch(queries, k=1)
        p1 = np.asarray(p1)
        assert not np.isin(p1[:, 0], top).any()
        # former rank-2 hits are now rank-1 wherever rank-2 wasn't
        # itself deleted
        ok = ~np.isin(p0[:, 1], top)
        np.testing.assert_array_equal(p1[ok, 0], p0[ok, 1])
    finally:
        index._alive = None  # restore for other tests on the fixture


def test_delete_persists_roundtrip(tmp_path, built):
    index, pts, ids, queries = built
    index.delete([3, 5])
    try:
        f = str(tmp_path / "tomb.idx")
        index.dump(f)
        back = Hnsw.load(f)
        assert back.n_deleted == 2
        assert back.is_deleted(3) and back.is_deleted(5)
        assert not back.is_deleted(4)
    finally:
        index._alive = None


def test_incremental_add_recall():
    rng = np.random.default_rng(11)
    pts = rng.random((1600, 8), dtype=np.float32)
    cfg = Config(seed=11, ef_search=64)
    index, ids = Hnsw.build(pts[:800], cfg)
    new_pids = index.add(pts[800:])
    assert len(index) == 1600
    np.testing.assert_array_equal(new_pids, np.arange(800, 1600))

    queries = rng.random((16, 8), dtype=np.float32)
    d, p = index.search_batch(queries, k=10)
    full_ids = np.concatenate([ids, new_pids])
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    gt_pids = full_ids[np.asarray(gt_i)]
    rec = _recall(np.asarray(p), gt_pids)
    print(f"post-add recall@10 = {rec}")
    assert rec >= 0.9
    # the incrementally added points themselves are findable
    d2, p2 = index.search_batch(pts[800:816], k=1)
    assert (np.asarray(p2)[:, 0] == np.arange(800, 816)).mean() >= 0.9


def test_add_multiple_rounds_and_delete():
    rng = np.random.default_rng(13)
    pts = rng.random((900, 8), dtype=np.float32)
    cfg = Config(seed=13, ef_search=48, wave_size=128)
    index, ids = Hnsw.build(pts[:300], cfg)
    index.add(pts[300:600])
    index.delete([0, 1])
    index.add(pts[600:])           # add after delete keeps mask aligned
    assert len(index) == 900
    assert index._alive.shape == (900,)
    assert index.n_deleted == 2
    d, p = index.search_batch(pts[600:608], k=1, ef=32)
    assert (np.asarray(p)[:, 0] == np.arange(600, 608)).mean() >= 0.9


def test_hnswmap_add_values():
    rng = np.random.default_rng(17)
    pts = rng.random((400, 8), dtype=np.float32)
    cfg = Config(seed=17, ef_search=32)
    index = HnswMap.build(pts[:200], [f"w{i}" for i in range(200)], cfg)
    index.add(pts[200:], [f"w{i}" for i in range(200, 400)])
    assert len(index.values) == 400
    # self-query returns the point's own value
    d, p, vals = index.search_batch_values(pts[250:254], k=1)
    assert vals[0][0] == f"w{250}"
    with pytest.raises(ValueError):
        index.add(pts[:4], ["too", "few"])


def test_packed_values_filter_delete():
    rng = np.random.default_rng(19)
    pts = rng.random((600, 8), dtype=np.float32)
    cfg = Config(seed=19, ef_search=48)
    hmap = HnswMap.build(pts, [f"v{i}" for i in range(600)], cfg)
    packed = PackedHnsw.from_index(hmap)
    assert packed.values is not None

    q = pts[123:127]
    d, p, vals = packed.search_batch_values(q, k=1)
    assert vals[0][0] == hmap.values[int(np.asarray(p)[0, 0])]

    # filter: exclude the self-hit, next hit must differ and be eligible
    mask = np.ones(600, bool)
    self_pid = int(np.asarray(p)[0, 0])
    mask[self_pid] = False
    d2, p2 = packed.search_batch(q, k=1, filter_mask=mask)
    assert int(np.asarray(p2)[0, 0]) != self_pid

    packed.delete([self_pid])
    d3, p3 = packed.search_batch(q, k=1)
    assert int(np.asarray(p3)[0, 0]) != self_pid
