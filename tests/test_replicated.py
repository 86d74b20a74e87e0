"""Replicated (query-DP) serving tests on the 8-device CPU mesh."""

import numpy as np

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.parallel.mesh import default_mesh
from instant_distance_tpu.parallel.replicated import ReplicatedHnsw


def test_replicated_matches_single_device():
    rng = np.random.default_rng(55)
    pts = rng.random((1500, 8), dtype=np.float32)
    cfg = Config(seed=55, ef_search=32)
    index, ids = Hnsw.build(pts, cfg)
    rep = ReplicatedHnsw(index, default_mesh(8))

    q = rng.random((64, 8), dtype=np.float32)
    d0, p0 = index.search_batch(q, k=5)
    d1, p1 = rep.search_batch(q, k=5)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_replicated_packed():
    from instant_distance_tpu.models.packed import PackedHnsw
    from instant_distance_tpu.parallel.replicated import ReplicatedPackedHnsw

    rng = np.random.default_rng(57)
    pts = rng.random((900, 8), dtype=np.float32)
    cfg = Config(seed=57, ef_search=32)
    index, _ = Hnsw.build(pts, cfg)
    packed = PackedHnsw.from_index(index)
    rp = ReplicatedPackedHnsw(packed, default_mesh(8))

    q = rng.random((64, 8), dtype=np.float32)
    d0, p0 = packed.search_batch(q, k=5)
    d1, p1 = rp.search_batch(q, k=5)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_replicated_pads_uneven_batches():
    rng = np.random.default_rng(56)
    pts = rng.random((500, 4), dtype=np.float32)
    rep = ReplicatedHnsw.build(pts, Config(seed=56, ef_search=16),
                               mesh=default_mesh(8))
    q = rng.random((13, 4), dtype=np.float32)  # not divisible by 8
    d, p = rep.search_batch(q, k=3)
    assert d.shape == (13, 3) and p.shape == (13, 3)
    assert (np.asarray(p) >= 0).all()


def test_replicated_values_filter():
    import jax

    from instant_distance_tpu.models.hnsw import HnswMap
    from instant_distance_tpu.parallel.mesh import default_mesh
    from instant_distance_tpu.parallel.replicated import ReplicatedHnsw

    rng = np.random.default_rng(43)
    pts = rng.random((512, 8), dtype=np.float32)
    cfg = Config(seed=43, ef_search=32)
    hmap = HnswMap.build(pts, [f"v{i}" for i in range(512)], cfg)
    rep = ReplicatedHnsw(hmap, default_mesh(8))
    # self-query returns the point's own value (values are stored in pid
    # order, so vals[j] corresponds to original point j here)
    d, p, vals = rep.search_batch_values(pts[:16], k=1)
    p = np.asarray(p)
    assert vals[0][0] == "v0" and vals[5][0] == "v5"

    # tombstones snapshot at construction: delete the top hit's pid
    hmap.delete([int(p[0, 0])])
    rep2 = ReplicatedHnsw(hmap, default_mesh(8))
    d1, p1 = rep2.search_batch(pts[:1], k=1)
    assert int(np.asarray(p1)[0, 0]) != int(p[0, 0])
    hmap._alive = None

    # per-call filter: exclude the self-hits (mask is pid order)
    mask = np.ones(512, bool)
    mask[p[:, 0]] = False
    d2, p2 = rep.search_batch(pts[:16], k=1, filter_mask=mask)
    assert not np.isin(np.asarray(p2)[:, 0], p[:, 0]).any()
