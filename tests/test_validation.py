"""API-boundary input validation (round-5 VERDICT ask #8).

The reference rejects wrong-dimension points at the binding boundary
with a clear message (FloatArray::try_from, py src/lib.rs:363-376);
these tests pin our equivalents: a wrong-D query/add/build input must
raise ValueError naming both dims, not a raw XLA broadcast TypeError.
"""
import numpy as np
import pytest

from instant_distance_tpu import Config, Hnsw, HnswMap


@pytest.fixture(scope="module")
def tiny_index():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(48, 16)).astype(np.float32)
    idx, _ = Hnsw.build(pts, Config(seed=7, ef_construction=16))
    return idx


def test_search_batch_wrong_dim(tiny_index):
    with pytest.raises(ValueError, match=r"dim 9 != index dim 16"):
        tiny_index.search_batch(np.zeros((4, 9), np.float32))


def test_search_single_wrong_dim(tiny_index):
    with pytest.raises(ValueError, match=r"dim 9 != index dim 16"):
        tiny_index.search_batch(np.zeros(9, np.float32))


def test_search_3d_rejected(tiny_index):
    with pytest.raises(ValueError, match=r"2-D"):
        tiny_index.search_batch(np.zeros((2, 3, 16), np.float32))


def test_add_wrong_dim(tiny_index):
    with pytest.raises(ValueError, match=r"dim 8 != index dim 16"):
        tiny_index.add(np.zeros((2, 8), np.float32))


def test_build_1d_rejected():
    with pytest.raises(ValueError, match=r"2-D"):
        Hnsw.build(np.zeros(16, np.float32), Config(seed=1))


def test_map_build_wrong_value_count():
    pts = np.zeros((4, 8), np.float32)
    with pytest.raises(ValueError, match="same length"):
        HnswMap.build(pts, ["a", "b"], Config(seed=1))


def test_empty_build_still_allowed():
    idx, ids = Hnsw.build(np.zeros((0, 4), np.float32), Config(seed=1))
    assert len(idx) == 0 and len(ids) == 0
