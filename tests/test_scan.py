"""ScanIndex (int8 MXU scan + exact rerank) correctness tests."""

import numpy as np
import pytest

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex


def _recall(got, want):
    k = want.shape[1]
    return np.mean([
        len(set(got[i].tolist()) & set(want[i].tolist())) / k
        for i in range(len(got))])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(71)
    pts = rng.standard_normal((3000, 32)).astype(np.float32)
    queries = rng.standard_normal((24, 32)).astype(np.float32)
    return pts, queries


def test_scan_matches_exact(data):
    pts, queries = data
    idx = ScanIndex(pts, chunk=1024)   # force multi-chunk streaming
    d, i = idx.search_batch(queries, k=10, ef=40)
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"scan recall@10 = {rec}")
    assert rec >= 0.99
    # rerank makes reported distances exact
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0],
                               rtol=1e-5)


def test_scan_filter_is_exact(data):
    pts, queries = data
    idx = ScanIndex(pts, chunk=1024)
    rng = np.random.default_rng(5)
    mask = rng.random(len(pts)) < 0.02     # very selective: ~60 eligible
    d, i = idx.search_batch(queries, k=5, filter_mask=mask)
    i = np.asarray(i)
    assert (i >= 0).all()
    assert mask[i].all()
    # exhaustive semantics: matches brute force over the subset exactly
    sub = np.where(mask)[0]
    gt_d, gt_s = BruteForce(pts[sub]).search_batch(queries, 5)
    np.testing.assert_array_equal(i, sub[np.asarray(gt_s)])


def test_scan_delete_and_values(data):
    pts, queries = data
    idx = ScanIndex(pts, values=[f"v{i}" for i in range(len(pts))])
    d, i, vals = idx.search_batch_values(pts[:4], k=1)
    i = np.asarray(i)
    np.testing.assert_array_equal(i[:, 0], np.arange(4))
    assert vals[2][0] == "v2"
    idx.delete([0, 1, 2, 3])
    d2, i2 = idx.search_batch(pts[:4], k=1)
    assert not np.isin(np.asarray(i2)[:, 0], np.arange(4)).any()


def test_scan_dot_and_cosine(data):
    pts, queries = data
    for metric in ("dot", "cosine"):
        idx = ScanIndex(pts, metric=metric, chunk=1024)
        d, i = idx.search_batch(queries, k=10, ef=40)
        gt_d, gt_i = BruteForce(pts, metric=metric).search_batch(queries, 10)
        rec = _recall(np.asarray(i), np.asarray(gt_i))
        print(f"scan[{metric}] recall@10 = {rec}")
        assert rec >= 0.95


def test_scan_euclidean_sqrt(data):
    pts, queries = data
    idx = ScanIndex(pts, metric="euclidean", chunk=2048)
    d, i = idx.search_batch(queries, k=3)
    want = np.sqrt(((queries[0] - pts[np.asarray(i)[0, 0]]) ** 2).sum())
    np.testing.assert_allclose(np.asarray(d)[0, 0], want, rtol=1e-5)


def test_scan_small_and_single_query():
    rng = np.random.default_rng(9)
    pts = rng.random((7, 4), dtype=np.float32)
    idx = ScanIndex(pts)
    d, i = idx.search_batch(pts[3], k=3)     # 1-d query; k<ef>n clamps
    assert np.asarray(i)[0, 0] == 3
    np.testing.assert_allclose(np.asarray(d)[0, 0], 0, atol=1e-6)


def test_sharded_scan_matches_exact():
    import jax

    from instant_distance_tpu.parallel.mesh import default_mesh
    from instant_distance_tpu.parallel.scan import ShardedScanIndex

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(77)
    pts = rng.standard_normal((2002, 16)).astype(np.float32)  # pad tail
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    idx = ShardedScanIndex(pts, mesh=default_mesh(8), chunk=128,
                           values=[f"v{i}" for i in range(2002)])
    assert len(idx) == 2002
    d, i = idx.search_batch(queries, k=10, ef=40)
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"sharded scan recall@10 = {rec}")
    assert rec >= 0.99
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0],
                               rtol=1e-5)

    # values / filter / delete
    d2, i2, vals = idx.search_batch_values(pts[:4], k=1)
    assert vals[1][0] == f"v{np.asarray(i2)[1, 0]}"
    mask = np.ones(2002, bool)
    mask[:4] = False
    d3, i3 = idx.search_batch(pts[:4], k=1, filter_mask=mask)
    assert (np.asarray(i3)[:, 0] >= 4).all()
    idx.delete([5])
    d4, i4 = idx.search_batch(pts[5:6], k=1)
    assert int(np.asarray(i4)[0, 0]) != 5


def test_fused_scan_kernel_interpret():
    """Pallas fused scan (interpret mode on CPU): matches brute force."""
    rng = np.random.default_rng(83)
    pts = rng.standard_normal((8192, 128)).astype(np.float32)
    q = rng.standard_normal((256, 128)).astype(np.float32)
    idx = ScanIndex(pts)
    d, i = idx.search_batch(q[:32], k=5, ef=16, fused=True)
    gt_d, gt_i = BruteForce(pts).search_batch(q[:32], 5)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"fused recall@5 = {rec}")
    assert rec >= 0.95
    np.testing.assert_allclose(np.asarray(d)[:, 0],
                               np.asarray(gt_d)[:, 0], rtol=1e-5)
    # filter flows through the fused path (norms -> +inf masking)
    mask = np.zeros(8192, bool)
    mask[::2] = True
    d2, i2 = idx.search_batch(q[:32], k=5, fused=True, filter_mask=mask)
    i2 = np.asarray(i2)
    assert mask[i2[i2 >= 0]].all()


def test_fused_scan_bucket_interpret():
    """Bucket-mode fused scan (interpret on CPU): matches brute force."""
    rng = np.random.default_rng(89)
    pts = rng.standard_normal((8192, 128)).astype(np.float32)
    q = rng.standard_normal((32, 128)).astype(np.float32)
    idx = ScanIndex(pts)
    d, i = idx.search_batch(q, k=5, ef=16, fused="bucket", lsub=16)
    gt_d, gt_i = BruteForce(pts).search_batch(q, 5)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"bucket recall@5 = {rec}")
    assert rec >= 0.95
    np.testing.assert_allclose(np.asarray(d)[:, 0],
                               np.asarray(gt_d)[:, 0], rtol=1e-5)
    mask = np.zeros(8192, bool)
    mask[::2] = True
    d2, i2 = idx.search_batch(q, k=5, fused="bucket", filter_mask=mask)
    i2 = np.asarray(i2)
    assert mask[i2[i2 >= 0]].all()


def test_sharded_scan_fused_matches_exact():
    """Sharded fused-bucket path (interpret on CPU) == brute force."""
    import jax

    from instant_distance_tpu.parallel.mesh import default_mesh
    from instant_distance_tpu.parallel.scan import ShardedScanIndex

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(79)
    pts = rng.standard_normal((2002, 16)).astype(np.float32)
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    idx = ShardedScanIndex(pts, mesh=default_mesh(8))
    d, i = idx.search_batch(queries, k=5, ef=20, fused=True,
                            qb=16, cb=64, lsub=8)
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 5)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"sharded fused scan recall@5 = {rec}")
    assert rec >= 0.95
    np.testing.assert_allclose(np.asarray(d)[:, 0],
                               np.asarray(gt_d)[:, 0], rtol=1e-5)
    # filter + tombstone flow through the fused shard path
    mask = np.ones(2002, bool)
    mask[:4] = False
    d2, i2 = idx.search_batch(pts[:4], k=1, fused=True, qb=4, cb=64,
                              lsub=8, filter_mask=mask)
    assert (np.asarray(i2)[:, 0] >= 4).all()
    idx.delete([7])
    d3, i3 = idx.search_batch(pts[7:8], k=1, fused=True, qb=1, cb=64,
                              lsub=8)
    assert int(np.asarray(i3)[0, 0]) != 7


def test_replicated_scan_query_dp():
    """Query-DP scan over the 8-device mesh: matches brute force, both
    the XLA streamed and the fused-bucket (interpret) paths."""
    import jax

    from instant_distance_tpu.parallel.mesh import default_mesh
    from instant_distance_tpu.parallel.replicated import (
        ReplicatedScanIndex)

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(91)
    pts = rng.standard_normal((1500, 16)).astype(np.float32)
    queries = rng.standard_normal((19, 16)).astype(np.float32)  # pads
    base = ScanIndex(pts, values=[f"v{i}" for i in range(1500)])
    base.delete([3])
    rep = ReplicatedScanIndex(base, mesh=default_mesh(8))
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 5)

    d, i = rep.search_batch(queries, k=5, ef=20)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"replicated scan recall@5 = {rec}")
    assert rec >= 0.95
    assert not (np.asarray(i) == 3).any()      # tombstone snapshot

    d2, i2 = rep.search_batch(queries, k=5, ef=20, fused=True,
                              qb=4, cb=128, lsub=8)
    rec2 = _recall(np.asarray(i2), np.asarray(gt_i))
    print(f"replicated fused scan recall@5 = {rec2}")
    assert rec2 >= 0.95

    mask = np.zeros(1500, bool)
    mask[::3] = True
    d3, i3, vals = rep.search_batch_values(queries[:4], k=3,
                                           filter_mask=mask)
    i3 = np.asarray(i3)
    assert (i3[i3 >= 0] % 3 == 0).all()
    assert vals[0][0] == f"v{i3[0, 0]}"


def test_scan_bf16_storage_roundtrip(tmp_path):
    """store_dtype='bfloat16' halves the rerank table; recall holds and
    dump/load preserves the dtype."""
    import jax.numpy as jnp

    rng = np.random.default_rng(93)
    pts = rng.standard_normal((800, 16)).astype(np.float32)
    idx = ScanIndex(pts, store_dtype="bfloat16")
    assert idx.points.dtype == jnp.bfloat16
    gt_d, gt_i = BruteForce(pts).search_batch(pts[:16], 5)
    d, i = idx.search_batch(pts[:16], k=5, ef=20)
    assert _recall(np.asarray(i), np.asarray(gt_i)) >= 0.95
    f = str(tmp_path / "bf16scan.npz")
    idx.dump(f)
    back = ScanIndex.load(f)
    assert back.points.dtype == jnp.bfloat16
    d2, i2 = back.search_batch(pts[:16], k=5, ef=20)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_scan_from_index_bridge():
    """ScanIndex.from_index: pid-order ids, values + tombstones carry."""
    from instant_distance_tpu.models.hnsw import HnswMap

    rng = np.random.default_rng(95)
    pts = rng.standard_normal((600, 12)).astype(np.float32)
    from instant_distance_tpu.config import Config as Cfg

    hmap = HnswMap.build(pts, [f"v{i}" for i in range(600)],
                         Cfg(seed=95, ef_search=32))
    hmap.delete([4])
    scan = ScanIndex.from_index(hmap)
    q = np.asarray(hmap.points[:8])          # pid-order queries
    d, i, vals = scan.search_batch_values(q, k=1)
    i = np.asarray(i)
    assert (i[:, 0] == np.arange(8)).sum() >= 7   # pid 4 tombstoned
    assert not (i == 4).any()
    assert vals[0][0] == hmap.values[i[0, 0]]
