"""Public API tests mirroring the reference's test suite.

* ``test_map_exact`` == the reference's deterministic ``map`` test
  (instant-distance/tests/all.rs:9-39): 5 collinear 2-d points with
  values, exact distances 0 / sqrt(2) / 2*sqrt(2) under Euclidean.
* ``test_binding_style_*`` == instant-distance-py/test/test.py: build a
  1024 x 300-d random index, iterate results; HnswMap self-query returns
  the point's own value first.
"""

import numpy as np
import pytest

from instant_distance_tpu import Builder, Config, Heuristic, Search
from instant_distance_tpu.models.hnsw import Hnsw, HnswMap


def test_map_exact():
    points = [[i, i] for i in range(5)]
    values = ["zero", "one", "two", "three", "four"]
    seed = np.random.randint(0, 2**31)
    cfg = Config(seed=seed, metric="euclidean")
    map_ = HnswMap.build(np.array(points, np.float32), values, cfg)

    search = Search()
    results = list(map_.search(np.array([2.0, 2.0], np.float32), search))
    assert len(results) == 5
    for i, item in enumerate(results):
        if i == 0:
            assert item.distance == pytest.approx(0.0, abs=1e-6)
            assert item.value == "two"
        elif i in (1, 2):
            assert item.distance == pytest.approx(1.4142135, rel=1e-5)
            assert item.value in ("one", "three")
        else:
            assert item.distance == pytest.approx(2.828427, rel=1e-5)
            assert item.value in ("zero", "four")


def test_builder_fluent_api():
    b = Builder().seed(42).ef_search(40).ef_construction(50).ml(0.3)
    ef_search, ef_construction, ml, seed = b.into_parts()
    assert (ef_search, ef_construction, ml, seed) == (40, 50, 0.3, 42)
    b2 = Builder().select_heuristic(None)
    assert b2.config.heuristic is None
    assert Builder().config.heuristic == Heuristic(False, True)


def test_binding_style_hnsw():
    rng = np.random.default_rng(10)
    points = rng.random((256, 32), dtype=np.float32)
    cfg = Config(seed=10, ef_search=10)
    hnsw, ids = Hnsw.build(points, cfg)
    assert sorted(ids.tolist()) == list(range(256))
    search = Search()
    results = list(hnsw.search(points[0], search))
    assert len(results) == 10
    assert results[0].value is None
    # self-query returns the point itself (through the id remap)
    assert results[0].pid == ids[0]
    assert results[0].distance == pytest.approx(0.0, abs=1e-6)


def test_binding_style_hnsw_map_self_query():
    rng = np.random.default_rng(11)
    points = rng.random((300, 16), dtype=np.float32)
    values = [f"word-{i}" for i in range(300)]
    map_ = HnswMap.build(points, values, Config(seed=11))
    search = Search()
    first = next(iter(map_.search(points[123], search)))
    assert first.value == "word-123"
    assert first.distance == pytest.approx(0.0, abs=1e-6)
    assert "word-123" in repr(first)


def test_search_batch_and_values():
    rng = np.random.default_rng(12)
    points = rng.random((200, 8), dtype=np.float32)
    values = list(range(200))
    map_ = HnswMap.build(points, values, Config(seed=12))
    d, p, vals = map_.search_batch_values(points[:4], k=3)
    assert d.shape == (4, 3) and p.shape == (4, 3)
    for i in range(4):
        # self-query: the nearest hit is the query point itself, so the
        # returned value must be the one supplied alongside points[i]
        assert vals[i][0] == values[i]
        assert np.asarray(d)[i, 0] == pytest.approx(0.0, abs=1e-6)


def test_iter_getitem_get():
    rng = np.random.default_rng(13)
    points = rng.random((50, 4), dtype=np.float32)
    hnsw, ids = Hnsw.build(points, Config(seed=13))
    assert len(hnsw) == 50
    it = list(hnsw.iter())
    assert len(it) == 50 and it[0][0] == 0
    np.testing.assert_allclose(hnsw[ids[7]], points[7], rtol=1e-6)
    search = Search()
    hnsw.search(points[0], search)
    item = hnsw.get(0, search)
    assert item is not None and item.distance == pytest.approx(0, abs=1e-6)
    assert hnsw.get(10**6, search) is None


def test_config_field_parity():
    """Field-for-field sweep of the reference's Python Config/Heuristic
    surface (instant-distance-py/src/lib.rs:216-325): same names, same
    defaults, all get/set-able.  TPU-only extras are allowed on top but
    the reference's five Config fields and two Heuristic fields must
    exist verbatim."""
    import math

    cfg = Config()
    # Config fields (py src/lib.rs:218-239) + defaults from
    # Builder::default().into_parts() (lib.rs:101-113)
    assert cfg.ef_search == 100
    assert cfg.ef_construction == 100
    assert cfg.ml == pytest.approx(1.0 / math.log(32))
    assert cfg.seed is None        # None -> entropy, like seed from rng
    assert cfg.heuristic == Heuristic(extend_candidates=False,
                                      keep_pruned=True)
    # all five are settable attributes (pyo3 get/set parity)
    for field, val in [("ef_search", 7), ("ef_construction", 9),
                       ("ml", 0.5), ("seed", 3), ("heuristic", None)]:
        setattr(cfg, field, val)
        assert getattr(cfg, field) == val
    # Heuristic fields (py src/lib.rs:277-287)
    h = Heuristic()
    assert h.extend_candidates is False and h.keep_pruned is True
    # Neighbor surface (py src/lib.rs:327-341): distance, pid, value
    from instant_distance_tpu.models.hnsw import Neighbor

    nb = Neighbor(1.5, 3, "v")
    assert (nb.distance, nb.pid, nb.value) == (1.5, 3, "v")
    assert "Neighbor" in repr(nb)
    assert "Item" in repr(Neighbor(1.5, 3))  # value-less repr form


def test_neighbor_point():
    """Results carry the point itself (reference Item.point/MapItem.point,
    instant-distance/src/lib.rs:399-413), resolved lazily."""
    rng = np.random.default_rng(14)
    points = rng.random((64, 8), dtype=np.float32)
    values = [f"v{i}" for i in range(64)]
    map_ = HnswMap.build(points, values, Config(seed=14))
    search = Search()
    first = next(iter(map_.search(points[5], search)))
    np.testing.assert_allclose(np.asarray(first.point), points[5],
                               rtol=1e-6)
    # plain Hnsw path and the get() accessor resolve too
    hnsw, ids = Hnsw.build(points, Config(seed=14))
    hnsw.search(points[5], search)
    item = hnsw.get(0, search)
    np.testing.assert_allclose(np.asarray(item.point), points[5],
                               rtol=1e-6)
    # detached Neighbors (no backing index) return None, not crash
    from instant_distance_tpu.models.hnsw import Neighbor

    assert Neighbor(0.0, 1).point is None


def test_empty_index_search():
    hnsw, ids = Hnsw.build(np.zeros((0, 4), np.float32), Config(seed=1))
    search = Search()
    assert list(hnsw.search(np.zeros(4, np.float32), search)) == []
    assert len(search) == 0
