"""Persistence round-trips: native npz + reference bincode layout
(dump/load parity with instant-distance-py src/lib.rs:59-75,121-137)."""

import numpy as np
import pytest

from instant_distance_tpu import Config, Search
from instant_distance_tpu.models.hnsw import Hnsw, HnswMap
from instant_distance_tpu.utils import serialize


@pytest.fixture(scope="module")
def small_map():
    rng = np.random.default_rng(21)
    points = rng.random((128, 12), dtype=np.float32)
    values = [f"v{i}" for i in range(128)]
    return HnswMap.build(points, values, Config(seed=21))


def _assert_same_graph(a, b):
    np.testing.assert_array_equal(np.asarray(a.zero), np.asarray(b.zero))
    np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points),
                               rtol=1e-6)
    assert len(a.layers) == len(b.layers)
    for la, lb in zip(a.layers, b.layers):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_native_roundtrip_map(small_map, tmp_path):
    fname = str(tmp_path / "idx.npz")
    small_map.dump(fname)
    loaded = HnswMap.load(fname)
    _assert_same_graph(small_map, loaded)
    assert loaded.values == small_map.values
    assert loaded.config.ef_search == small_map.config.ef_search
    # loaded index searches identically
    q = np.asarray(small_map.points)[:3]
    d0, p0 = small_map.search_batch(q, k=5)
    d1, p1 = loaded.search_batch(q, k=5)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_native_roundtrip_hnsw(tmp_path):
    rng = np.random.default_rng(22)
    hnsw, _ = Hnsw.build(rng.random((64, 8), dtype=np.float32),
                         Config(seed=22))
    fname = str(tmp_path / "h.npz")
    hnsw.dump(fname)
    loaded = Hnsw.load(fname)
    _assert_same_graph(hnsw, loaded)
    assert not isinstance(loaded, HnswMap)


def test_bincode_roundtrip(small_map, tmp_path):
    fname = str(tmp_path / "idx.bin")
    small_map.dump(fname, format="bincode")
    loaded = serialize.load_bincode(fname, dims=12, m=small_map.config.m)
    _assert_same_graph(small_map, loaded)
    assert loaded.values == small_map.values
    assert loaded.config.ef_search == small_map.config.ef_search


def test_bincode_layout_bytes(tmp_path):
    """Byte-level check of the bincode layout (fixint LE, u64 lengths,
    u32 enum tag + u64 string length)."""
    import struct

    pts = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    hnsw = HnswMap(pts, np.full((2, 4), -1, np.int32), [],
                   Config(seed=0, m=2, ef_search=7), ["ab", "c"])
    fname = str(tmp_path / "x.bin")
    hnsw.dump(fname, format="bincode")
    raw = open(fname, "rb").read()
    off = 0
    assert struct.unpack_from("<Q", raw, off)[0] == 7; off += 8   # ef
    assert struct.unpack_from("<Q", raw, off)[0] == 2; off += 8   # n pts
    assert struct.unpack_from("<4f", raw, off) == (1, 2, 3, 4); off += 16
    assert struct.unpack_from("<Q", raw, off)[0] == 2; off += 8   # n zero
    assert struct.unpack_from("<8I", raw, off) == (2**32 - 1,) * 8
    off += 32
    assert struct.unpack_from("<Q", raw, off)[0] == 0; off += 8   # layers
    assert struct.unpack_from("<Q", raw, off)[0] == 2; off += 8   # values
    assert struct.unpack_from("<I", raw, off)[0] == 0; off += 4   # tag
    assert struct.unpack_from("<Q", raw, off)[0] == 2; off += 8
    assert raw[off:off + 2] == b"ab"; off += 2
    assert struct.unpack_from("<I", raw, off)[0] == 0; off += 4
    assert struct.unpack_from("<Q", raw, off)[0] == 1; off += 8
    assert raw[off:off + 1] == b"c"; off += 1
    assert off == len(raw)


def test_auto_format_detect(small_map, tmp_path):
    f1 = str(tmp_path / "a.npz")
    f2 = str(tmp_path / "b.bin")
    small_map.dump(f1, format="native")
    small_map.dump(f2, format="bincode")
    assert isinstance(serialize.load(f1), HnswMap)
    assert isinstance(serialize.load(f2, dims=12), HnswMap)


def test_packed_dump_load_roundtrip(tmp_path):
    from instant_distance_tpu.models.hnsw import HnswMap
    from instant_distance_tpu.models.packed import PackedHnsw

    rng = np.random.default_rng(67)
    pts = rng.random((400, 8), dtype=np.float32)
    cfg = Config(seed=67, ef_search=32)
    hmap = HnswMap.build(pts, [f"v{i}" for i in range(400)], cfg)
    packed = PackedHnsw.from_index(hmap)
    packed.delete([11])
    f = str(tmp_path / "p.npz")
    packed.dump(f)
    back = PackedHnsw.load(f)
    assert back.values == packed.values
    q = pts[:8]
    d0, p0 = packed.search_batch(q, k=3)
    d1, p1 = back.search_batch(q, k=3)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1))
    assert not (np.asarray(p1) == 11).any()


def test_scan_dump_load_roundtrip(tmp_path):
    from instant_distance_tpu.models.scan import ScanIndex

    rng = np.random.default_rng(69)
    pts = rng.standard_normal((500, 16)).astype(np.float32)
    idx = ScanIndex(pts, values=[f"v{i}" for i in range(500)])
    idx.delete([42])
    f = str(tmp_path / "s.npz")
    idx.dump(f)
    back = ScanIndex.load(f)
    assert back.values == idx.values and back.metric_name == "sqeuclidean"
    q = pts[:8]
    d0, i0 = idx.search_batch(q, k=3)
    d1, i1 = back.search_batch(q, k=3)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert not (np.asarray(i1) == 42).any()
