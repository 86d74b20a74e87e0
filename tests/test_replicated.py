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
