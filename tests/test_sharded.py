"""Sharded index tests on the 8-virtual-device CPU mesh (SURVEY.md §4's
TPU-native 'fake backend': the reference has no distributed tests)."""

import jax
import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.parallel.mesh import default_mesh
from instant_distance_tpu.parallel.sharded import ShardedHnsw


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return default_mesh(8)


def test_sharded_build_and_recall(mesh):
    seed = 31
    rng = np.random.default_rng(seed)
    pts = rng.random((1200, 8), dtype=np.float32)
    cfg = Config(seed=seed, ef_search=64)
    idx = ShardedHnsw.build(pts, cfg, mesh=mesh)
    assert idx.n_shards == 8
    assert len(idx) == 1200

    queries = rng.random((16, 8), dtype=np.float32)
    d, g = idx.search_batch(queries, k=10)
    d, g = np.asarray(d), np.asarray(g)
    assert d.shape == (16, 10)
    # global ids reference original input order
    assert g.min() >= 0 and g.max() < 1200

    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    gt_i = np.asarray(gt_i)
    recall = np.mean([
        len(set(g[i].tolist()) & set(gt_i[i].tolist())) / 10
        for i in range(len(queries))])
    print(f"sharded recall@10 = {recall}")
    assert recall >= 0.95

    # distances match the metric on original points
    q0 = queries[0]
    got = ((q0 - pts[g[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(d[0, 0], got, rtol=1e-5)


def test_sharded_packed(mesh):
    rng = np.random.default_rng(35)
    pts = rng.random((800, 8), dtype=np.float32)
    cfg = Config(seed=35, ef_search=32)
    idx = ShardedHnsw.build(pts, cfg, mesh=mesh)
    packed = idx.pack(pack_links=32)

    queries = rng.random((16, 8), dtype=np.float32)
    d, g = packed.search_batch(queries, k=10)
    d, g = np.asarray(d), np.asarray(g)
    assert d.shape == (16, 10)
    gt_d, gt_i = BruteForce(pts).search_batch(queries, 10)
    gt_i = np.asarray(gt_i)
    recall = np.mean([
        len(set(g[i].tolist()) & set(gt_i[i].tolist())) / 10
        for i in range(16)])
    print(f"sharded packed recall@10 = {recall}")
    assert recall >= 0.9
    # exact rerank: distances are exact on original points
    got = ((queries[0] - pts[g[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(d[0, 0], got, rtol=1e-5)


def test_sharded_self_query(mesh):
    rng = np.random.default_rng(33)
    pts = rng.standard_normal((602, 16)).astype(np.float32)  # not 8-divisible
    idx = ShardedHnsw.build(pts, Config(seed=33, ef_search=32), mesh=mesh)
    assert len(idx) == 602
    d, g = idx.search_batch(pts[:24], k=1)
    assert (np.asarray(g)[:, 0] == np.arange(24)).mean() > 0.95
    np.testing.assert_allclose(np.asarray(d)[:, 0].max(), 0, atol=1e-5)


def test_sharded_values_filter_delete(mesh):
    rng = np.random.default_rng(41)
    pts = rng.random((640, 8), dtype=np.float32)
    cfg = Config(seed=41, ef_search=32)
    idx = ShardedHnsw.build(pts, cfg, mesh=mesh,
                            values=[f"v{i}" for i in range(640)])

    q = pts[100:104]
    d, g, vals = idx.search_batch_values(q, k=1)
    g = np.asarray(g)
    assert vals[0][0] == f"v{g[0, 0]}"     # values keyed by global id
    assert g[0, 0] == 100                  # self-query

    # filter by global id: exclude the self-hits
    mask = np.ones(640, bool)
    mask[100:104] = False
    d2, g2 = idx.search_batch(q, k=1, filter_mask=mask)
    g2 = np.asarray(g2)
    assert not np.isin(g2[:, 0], np.arange(100, 104)).any()
    assert (g2[:, 0] >= 0).all()

    # tombstones survive packing
    idx.delete([100])
    packed = idx.pack(pack_links=32)
    assert packed.values is not None
    d3, g3 = packed.search_batch(q[:1], k=1)
    assert int(np.asarray(g3)[0, 0]) != 100
    d4, g4, vals4 = packed.search_batch_values(q[1:2], k=1)
    assert vals4[0][0] == f"v{int(np.asarray(g4)[0, 0])}"


def test_sharded_dump_load_roundtrip(mesh, tmp_path):
    """Persistence of the mesh-sharded graph: a loaded dump answers
    queries identically to the original (same arrays, same mesh), and
    values/tombstones survive.  The reference persists only single-
    address-space indices (py src/lib.rs:59-75); sharded dumps have no
    reference analogue but the biggest indices need them most."""
    rng = np.random.default_rng(47)
    pts = rng.random((640, 8), dtype=np.float32)
    cfg = Config(seed=47, ef_search=32)
    idx = ShardedHnsw.build(pts, cfg, mesh=mesh,
                            values=[f"v{i}" for i in range(640)])
    idx.delete([5])
    q = pts[100:116]
    d0, g0 = idx.search_batch(q, k=10)

    fname = str(tmp_path / "sharded.npz")
    idx.dump(fname)
    idx2 = ShardedHnsw.load(fname, mesh=mesh)
    assert idx2.n_shards == idx.n_shards
    assert len(idx2) == len(idx)
    d1, g1 = idx2.search_batch(q, k=10)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
    # values + tombstones round-trip
    _, gv, vals = idx2.search_batch_values(q[:1], k=1)
    assert vals[0][0] == f"v{int(np.asarray(gv)[0, 0])}"
    d2, g2 = idx2.search_batch(pts[5:6], k=1)
    assert int(np.asarray(g2)[0, 0]) != 5
    # default mesh pickup (no mesh arg) also works on this 8-dev backend
    idx3 = ShardedHnsw.load(fname)
    d3, g3 = idx3.search_batch(q[:4], k=10)
    np.testing.assert_array_equal(np.asarray(g0)[:4], np.asarray(g3))

    # mesh-size mismatch is an error, not a silent re-shard
    with pytest.raises(ValueError):
        ShardedHnsw.load(fname, mesh=default_mesh(4))


def test_sharded_scan_dump_load_roundtrip(mesh, tmp_path):
    from instant_distance_tpu.parallel.scan import ShardedScanIndex

    rng = np.random.default_rng(53)
    pts = rng.random((500, 8), dtype=np.float32)
    idx = ShardedScanIndex(pts, mesh=mesh,
                           values=[f"s{i}" for i in range(500)])
    idx.delete([7])
    q = pts[40:48]
    d0, g0 = idx.search_batch(q, k=5)

    fname = str(tmp_path / "sscan.npz")
    idx.dump(fname)
    idx2 = ShardedScanIndex.load(fname, mesh=mesh)
    d1, g1 = idx2.search_batch(q, k=5)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
    _, gv, vals = idx2.search_batch_values(q[:1], k=1)
    assert vals[0][0] == f"s{int(np.asarray(gv)[0, 0])}"
    d2, g2 = idx2.search_batch(pts[7:8], k=1)
    assert int(np.asarray(g2)[0, 0]) != 7
