"""Adversarial/edge-case coverage for the bincode reader (VERDICT r3 #7).

The format is the reference binding's raw serde stream
(instant-distance-py/src/lib.rs:59-75): no magic, no checksum, no
self-description.  The only defense against a truncated or corrupt file
is strict accounting inside ``load_bincode`` — every failure here must
surface as a position-annotated ``ValueError`` naming the file, never a
raw ``struct.error`` / numpy reshape error / MemoryError.

Also widens the golden matrix with the degenerate shapes VERDICT asked
for: zero points and empty upper-layer lists.
"""

import struct

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.hnsw import Hnsw, HnswMap
from instant_distance_tpu.utils.serialize import dump_bincode, load_bincode


def _dump(idx, tmp_path, name="idx.bin"):
    import warnings

    path = str(tmp_path / name)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # tiny D/M guard, expected
        dump_bincode(idx, path)
    with open(path, "rb") as f:
        return path, f.read()


def _tiny_map(n=3, d=4, m=2, n_layers=1):
    rng = np.random.default_rng(0)
    points = rng.normal(size=(n, d)).astype(np.float32)
    zero = np.full((n, 2 * m), -1, np.int32)
    for i in range(n):
        zero[i, 0] = (i + 1) % n if n > 1 else -1
    layers = [np.full((max(1, n // 2), m), -1, np.int32)
              for _ in range(n_layers)]
    cfg = Config(m=m, ef_search=13)
    return HnswMap(points, zero, layers, cfg, [f"v{i}" for i in range(n)])


# ---------------------------------------------------------------- goldens


def test_empty_layers_roundtrip(tmp_path):
    """A single-layer graph (no upper layers at all) round-trips; the
    reference produces these for tiny builds (layers: Vec is empty)."""
    cfg = Config(m=2, ef_search=5)
    points = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    zero = np.array([[1, -1, -1, -1], [0, -1, -1, -1]], np.int32)
    idx = HnswMap(points, zero, [], cfg, ["a", "b"])
    path, raw = _dump(idx, tmp_path)
    # layer count u64 == 0 sits right after the zero rows
    off = 8 + 8 + points.nbytes + 8 + zero.nbytes
    assert raw[off:off + 8] == bytes(8)
    back = load_bincode(path, dims=2, m=2)
    assert back.values == ["a", "b"]
    assert back.layers == []
    np.testing.assert_array_equal(np.asarray(back.zero), zero)


def test_zero_points_roundtrip(tmp_path):
    """An empty index round-trips (the reference serializes Hnsw with
    empty Vecs the same way)."""
    cfg = Config(m=2, ef_search=9)
    idx = HnswMap(np.zeros((0, 3), np.float32),
                  np.zeros((0, 4), np.int32), [], cfg, [])
    path, raw = _dump(idx, tmp_path)
    assert len(raw) == 8 + 8 + 8 + 8 + 8  # five u64 counts, no payload
    back = load_bincode(path, dims=3, m=2)
    assert len(back) == 0 and back.values == []


def test_plain_hnsw_autodetect_no_values(tmp_path):
    cfg = Config(m=2, ef_search=5)
    points = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    zero = np.array([[1, -1, -1, -1], [0, -1, -1, -1]], np.int32)
    idx = Hnsw(points, zero, [], cfg)
    path, _ = _dump(idx, tmp_path)
    back = load_bincode(path, dims=2, m=2)
    assert isinstance(back, Hnsw) and not isinstance(back, HnswMap)


# ------------------------------------------------------------- truncation


def test_truncation_every_prefix_is_a_clean_error(tmp_path):
    """Chopping the file at ANY byte offset must raise ValueError naming
    the file — the property VERDICT asked for.  (Offsets that happen to
    end exactly on a valid no-values Hnsw boundary are allowed to parse.)"""
    idx = _tiny_map()
    path, raw = _dump(idx, tmp_path)
    trunc = str(tmp_path / "trunc.bin")
    parsed_ok = 0
    for cut in range(len(raw)):
        with open(trunc, "wb") as f:
            f.write(raw[:cut])
        try:
            load_bincode(trunc, dims=4, m=2)
            parsed_ok += 1  # a valid shorter stream (e.g. values dropped)
        except ValueError as exc:
            assert "trunc.bin" in str(exc), (cut, exc)
        except Exception as exc:  # pragma: no cover - the bug we guard
            raise AssertionError(
                f"cut at {cut} leaked a {type(exc).__name__}: {exc}")
    # only the exact graph-end boundary can legally parse as a plain Hnsw
    assert parsed_ok <= 1


def test_absurd_length_claim_rejected_before_allocation(tmp_path):
    """A corrupt u64 count (here ~2**61 points) must fail by accounting,
    not by attempting a multi-exabyte read."""
    idx = _tiny_map()
    path, raw = _dump(idx, tmp_path)
    bad = bytearray(raw)
    bad[8:16] = struct.pack("<Q", 1 << 61)
    p = str(tmp_path / "absurd.bin")
    with open(p, "wb") as f:
        f.write(bytes(bad))
    with pytest.raises(ValueError, match="claims"):
        load_bincode(p, dims=4, m=2)


def test_unknown_value_variant_tag(tmp_path):
    idx = _tiny_map(n=2)
    path, raw = _dump(idx, tmp_path)
    # value 0's tag is 4 bytes right after the value-count u64; find it
    # by re-deriving the graph size
    d, m, n = 4, 2, 2
    off = 8 + 8 + n * d * 4 + 8 + n * 2 * m * 4 + 8 + (8 + 1 * m * 4) + 8
    bad = bytearray(raw)
    assert bad[off:off + 4] == bytes(4)  # String tag 0
    bad[off:off + 4] = struct.pack("<I", 7)
    p = str(tmp_path / "tag.bin")
    with open(p, "wb") as f:
        f.write(bytes(bad))
    with pytest.raises(ValueError, match="MapValue variant 7"):
        load_bincode(p, dims=d, m=m)


def test_invalid_utf8_value(tmp_path):
    idx = _tiny_map(n=2)
    path, raw = _dump(idx, tmp_path)
    bad = bytearray(raw)
    # last value's payload is the trailing bytes; stomp them with 0xff
    bad[-2:] = b"\xff\xfe"
    p = str(tmp_path / "utf8.bin")
    with open(p, "wb") as f:
        f.write(bytes(bad))
    with pytest.raises(ValueError, match="not valid UTF-8"):
        load_bincode(p, dims=4, m=2)


def test_trailing_garbage_rejected(tmp_path):
    idx = _tiny_map()
    path, raw = _dump(idx, tmp_path)
    p = str(tmp_path / "trail.bin")
    with open(p, "wb") as f:
        f.write(raw + b"\x00" * 7)
    with pytest.raises(ValueError, match="trailing"):
        load_bincode(p, dims=4, m=2)


def test_wrong_dims_is_valueerror_not_shape_error(tmp_path):
    """Reading with the wrong dims (the format has no header) must fail
    with the accounting error, not a numpy reshape traceback."""
    idx = _tiny_map()
    path, _ = _dump(idx, tmp_path)
    with pytest.raises(ValueError):
        load_bincode(path, dims=128, m=2)
    with pytest.raises(ValueError):
        load_bincode(path, dims=4, m=32)


def test_value_count_mismatch(tmp_path):
    idx = _tiny_map(n=3)
    path, raw = _dump(idx, tmp_path)
    # claim 2 values instead of 3: reader must flag count != n (or the
    # resulting trailing bytes), not return a silently short map
    d, m, n = 4, 2, 3
    off = 8 + 8 + n * d * 4 + 8 + n * 2 * m * 4 + 8 + (8 + 1 * m * 4)
    bad = bytearray(raw)
    assert struct.unpack_from("<Q", bad, off)[0] == 3
    bad[off:off + 8] = struct.pack("<Q", 2)
    p = str(tmp_path / "count.bin")
    with open(p, "wb") as f:
        f.write(bytes(bad))
    with pytest.raises(ValueError):
        load_bincode(p, dims=d, m=m)


# ---------------------------------------------------------- property test


def test_random_roundtrip_and_random_truncation():
    """Random small maps: dump -> load is exact; any truncation raises
    ValueError (seeded, a few dozen cases)."""
    import tempfile, os

    rng = np.random.default_rng(42)
    with tempfile.TemporaryDirectory() as td:
        for case in range(12):
            n = int(rng.integers(0, 6))
            d = int(rng.integers(1, 7))
            m = int(rng.integers(1, 5))
            n_layers = int(rng.integers(0, 3)) if n else 0
            points = rng.normal(size=(n, d)).astype(np.float32)
            zero = rng.integers(-1, max(n, 1), size=(n, 2 * m)
                                ).astype(np.int32)
            layers = [rng.integers(-1, max(n, 1),
                                   size=(int(rng.integers(1, max(n, 2))), m)
                                   ).astype(np.int32)
                      for _ in range(n_layers)]
            vals = [f"val-{case}-{i}-é" for i in range(n)]
            idx = HnswMap(points, zero, layers,
                          Config(m=m, ef_search=int(rng.integers(1, 99))),
                          vals)
            path, raw = _dump(idx, __import__("pathlib").Path(td),
                              name=f"c{case}.bin")
            back = load_bincode(path, dims=d, m=m)
            np.testing.assert_array_equal(np.asarray(back.points), points)
            np.testing.assert_array_equal(np.asarray(back.zero), zero)
            assert back.values == vals
            assert len(back.layers) == len(layers)
            for a, b in zip(back.layers, layers):
                np.testing.assert_array_equal(np.asarray(a), b)
            if len(raw) > 1:
                cut = int(rng.integers(1, len(raw)))
                tp = os.path.join(td, "t.bin")
                with open(tp, "wb") as f:
                    f.write(raw[:cut])
                try:
                    load_bincode(tp, dims=d, m=m)
                except ValueError:
                    pass  # the expected clean failure
