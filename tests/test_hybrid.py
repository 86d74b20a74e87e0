"""HybridIndex: latency routing between the host engine and the device.

The reference's operating mode is one query at a time on the host
(instant-distance/src/lib.rs:352-383); the hybrid serves that mode with
the native C++ engine over the SAME graph, while large batches ride the
TPU path.  These tests pin the routing contract and result agreement.
"""

import numpy as np
import pytest

from instant_distance_tpu import Config, Search
from instant_distance_tpu.models.hnsw import Hnsw, HnswMap
from instant_distance_tpu.models.hybrid import HybridIndex
from instant_distance_tpu.native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native engine unavailable (no compiler)")


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((512, 16)).astype(np.float32)
    cfg = Config(seed=7, ef_search=20)
    index, ids = Hnsw.build(pts, cfg)
    return pts, index, ids


def _gt(pts, q, k):
    d = ((pts[None] - q[:, None]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def test_small_batch_routes_to_host(built):
    pts, index, ids = built
    hyb = HybridIndex(index, threshold=64)
    assert hyb.host_available
    q = pts[:8] + 0.01
    d, i = hyb.search_batch(q, k=5)
    assert isinstance(i, np.ndarray)          # host path returns numpy
    gt = ids[_gt(pts, q, 5)]                  # original idx -> pid space
    hits = sum(len(set(i[r]) & set(gt[r])) for r in range(len(q)))
    assert hits >= int(0.9 * 5 * len(q))
    # distances sorted ascending per row
    assert all(np.all(np.diff(d[r]) >= -1e-6) for r in range(len(q)))


def test_large_batch_routes_to_device(built):
    pts, index, _ids = built
    hyb = HybridIndex(index, threshold=4)
    q = pts[:16] + 0.01
    d, i = hyb.search_batch(q, k=5)           # 16 >= 4 -> device path
    dd, ii = index.search_batch(q, k=5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ii))


def test_paths_agree_on_self_query(built):
    pts, index, _ids = built
    hyb = HybridIndex(index, threshold=64)
    q = pts[:4]
    _, host_i = hyb.search_batch(q, k=1)              # host
    _, dev_i = index.search_batch(q, k=1)             # device
    np.testing.assert_array_equal(host_i[:, 0], np.asarray(dev_i)[:, 0])


def test_filter_forces_device_path(built):
    pts, index, _ids = built
    hyb = HybridIndex(index, threshold=1024)
    mask = np.zeros(len(pts), bool)
    mask[:100] = True
    d, i = hyb.search_batch(pts[:2], k=5, filter_mask=mask)
    i = np.asarray(i)
    assert ((i >= 0) & (i < 100) | (i == -1)).all()


def test_tombstones_force_device_path(built):
    pts, index, _ids = built
    # fresh index state: delete mutates; use a copy of the arrays
    idx2 = Hnsw(np.asarray(index.points), np.asarray(index.zero),
                [np.asarray(l) for l in index.layers], index.config)
    hyb = HybridIndex(idx2, threshold=1024)
    _, i0 = hyb.search_batch(pts[:1], k=1)
    target = int(np.asarray(i0)[0, 0])
    idx2.delete([target])
    _, i1 = hyb.search_batch(pts[:1], k=5)
    assert target not in np.asarray(i1)[0]


def test_single_query_search_api(built):
    pts, index, ids = built
    hyb = HybridIndex(index, threshold=64)
    s = Search()
    results = list(hyb.search(pts[3], s))
    assert results and results[0].pid == ids[3]
    assert results[0].distance == pytest.approx(0.0, abs=1e-5)


def test_map_values_through_hybrid():
    rng = np.random.default_rng(11)
    pts = rng.standard_normal((256, 8)).astype(np.float32)
    vals = [f"w{i}" for i in range(len(pts))]
    m = HnswMap.build(pts, vals, Config(seed=11, ef_search=10))
    hyb = HybridIndex(m, threshold=64)
    s = Search()
    results = list(hyb.search(pts[42], s))
    assert results[0].value == "w42"


def test_calibrate_sets_threshold(built):
    pts, index, _ids = built
    hyb = HybridIndex(index, threshold=7)
    th = hyb.calibrate(pts[:32], k=5, iters=2)
    assert th == hyb.threshold and th >= 1
