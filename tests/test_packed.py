"""PackedHnsw (inline-quantized serving index) tests."""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.models.packed import PackedHnsw
from instant_distance_tpu.ops.packed import quantize_points
from instant_distance_tpu.utils.metrics import recall_at_k


def test_quantize_roundtrip():
    rng = np.random.default_rng(61)
    pts = rng.standard_normal((100, 32)).astype(np.float32)
    codes, scales = quantize_points(pts)
    deq = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    err = np.abs(deq - pts).max(axis=1)
    assert (err <= np.abs(pts).max(axis=1) / 127 + 1e-6).all()


def test_packed_recall_matches_exact():
    rng = np.random.default_rng(62)
    pts = rng.random((2000, 16), dtype=np.float32)
    cfg = Config(seed=62, ef_search=50)
    index, ids = Hnsw.build(pts, cfg)
    packed = PackedHnsw.from_index(index)

    q = rng.random((64, 16), dtype=np.float32)
    gt_d, gt_i = BruteForce(np.asarray(index.points)).search_batch(q, 10)
    d, p = packed.search_batch(q, k=10, ef=50)
    rec = recall_at_k(np.asarray(p), np.asarray(gt_i), 10)
    print(f"packed recall@10 = {rec}")
    assert rec >= 0.95

    # exact rerank means reported distances are exact
    d = np.asarray(d)
    p = np.asarray(p)
    pts_pid = np.asarray(index.points)
    for i in (0, 7, 31):
        want = ((q[i] - pts_pid[p[i, 0]]) ** 2).sum()
        np.testing.assert_allclose(d[i, 0], want, rtol=1e-5)
    # results sorted ascending
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_packed_self_query():
    rng = np.random.default_rng(63)
    pts = rng.standard_normal((800, 24)).astype(np.float32)
    packed = PackedHnsw.build(pts, Config(seed=63, ef_search=32))
    dp, pp = packed.search_batch(np.asarray(packed.points)[:32], k=1)
    assert (np.asarray(pp)[:, 0] == np.arange(32)).mean() >= 0.95


def test_packed_nbytes():
    rng = np.random.default_rng(64)
    pts = rng.random((500, 8), dtype=np.float32)
    packed = PackedHnsw.build(pts, Config(seed=64))
    # inline codes dominate: ~ N * K * D bytes plus ids/scales
    assert packed.nbytes() > 500 * 64 * 8
