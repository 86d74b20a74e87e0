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
    pts = rng.random((1000, 8), dtype=np.float32)
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
    pts = rng.random((1000, 8), dtype=np.float32)
    cfg = Config(seed=11, ef_search=64)
    index, ids = Hnsw.build(pts[:500], cfg)
    new_pids = index.add(pts[500:])
    assert len(index) == 1000
    np.testing.assert_array_equal(new_pids, np.arange(500, 1000))

    queries = rng.random((16, 8), dtype=np.float32)
    d, p = index.search_batch(queries, k=10)
    full_ids = np.concatenate([ids, new_pids])
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    gt_pids = full_ids[np.asarray(gt_i)]
    rec = _recall(np.asarray(p), gt_pids)
    print(f"post-add recall@10 = {rec}")
    assert rec >= 0.9
    # the incrementally added points themselves are findable
    d2, p2 = index.search_batch(pts[500:516], k=1)
    assert (np.asarray(p2)[:, 0] == np.arange(500, 516)).mean() >= 0.9


def test_add_multiple_rounds_and_delete():
    rng = np.random.default_rng(13)
    pts = rng.random((600, 8), dtype=np.float32)
    cfg = Config(seed=13, ef_search=48, wave_size=128)
    index, ids = Hnsw.build(pts[:200], cfg)
    index.add(pts[200:400])
    index.delete([0, 1])
    index.add(pts[400:])           # add after delete keeps mask aligned
    assert len(index) == 600
    assert index._alive.shape == (600,)
    assert index.n_deleted == 2
    d, p = index.search_batch(pts[400:408], k=1, ef=32)
    assert (np.asarray(p)[:, 0] == np.arange(400, 408)).mean() >= 0.9


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


def test_bfloat16_point_storage():
    """Config.dtype='bfloat16' halves point-table HBM; distances stay
    f32 (upcast at the metric boundary) so recall holds."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    pts = rng.random((1000, 16), dtype=np.float32)
    cfg = Config(seed=23, ef_search=48, dtype="bfloat16")
    index, ids = Hnsw.build(pts, cfg)
    assert index.points.dtype == jnp.bfloat16

    queries = rng.random((16, 16), dtype=np.float32)
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    gt_pids = ids[np.asarray(gt_i)]
    d, p = index.search_batch(queries, k=10)
    rec = _recall(np.asarray(p), gt_pids)
    print(f"bf16-storage recall@10 = {rec}")
    assert rec >= 0.9
    # reported distances are computed from the bf16-stored vectors in
    # f32: close to the true distance at bf16 resolution
    true_d = ((queries[0] - pts[ids == p[0, 0]][0]) ** 2).sum()
    np.testing.assert_allclose(np.asarray(d)[0, 0], true_d,
                               rtol=3e-2, atol=1e-4)
    # round-trips through native dump/load keeping the configured dtype
    import tempfile, os
    f = os.path.join(tempfile.mkdtemp(), "bf16.idx")
    index.dump(f)
    back = Hnsw.load(f)
    assert back.points.dtype == jnp.bfloat16
