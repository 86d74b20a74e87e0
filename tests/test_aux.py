"""Auxiliary subsystem tests: checkpoint/resume, validator, metrics,
datasets, profiling timers (SURVEY.md §5 parity + TPU-native additions)."""

import os

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.ops.construct import build_graph
from instant_distance_tpu.utils.datasets import (read_fvecs, read_ivecs,
                                                 synthetic_clustered)
from instant_distance_tpu.utils.metrics import (BuildStats, Timing, emit,
                                                recall_at_k, time_fn)
from instant_distance_tpu.utils.profiling import PhaseTimer
from instant_distance_tpu.utils.validate import validate_graph


def test_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(7)
    pts = rng.random((800, 4), dtype=np.float32)
    cfg = Config(seed=7, wave_size=128)
    ckpt = str(tmp_path / "build.ckpt.npz")

    # interrupted build: stop after a few waves by raising from progress
    calls = []

    def bomb(done, total, phase):
        calls.append(done)
        if len(calls) >= 6:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        build_graph(pts, cfg, progress=bomb, checkpoint=ckpt,
                    checkpoint_every=2)
    assert os.path.exists(ckpt), "checkpoint should exist after interrupt"

    resumed = build_graph(pts, cfg, checkpoint=ckpt)
    assert not os.path.exists(ckpt), "checkpoint removed on completion"
    fresh = build_graph(pts, cfg)
    # resumed build must produce the same graph as an uninterrupted one
    np.testing.assert_array_equal(np.asarray(resumed.zero),
                                  np.asarray(fresh.zero))
    for a, b in zip(resumed.layers, fresh.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validator_detects_corruption():
    rng = np.random.default_rng(8)
    pts = rng.random((300, 4), dtype=np.float32)
    g = build_graph(pts, Config(seed=8))
    rep = validate_graph(np.asarray(g.zero),
                         [np.asarray(l) for l in g.layers])
    assert rep.ok, rep.errors
    assert rep.mean_degree > 1

    bad = np.asarray(g.zero).copy()
    bad[5, 0] = 5  # self loop
    rep2 = validate_graph(bad, [])
    assert not rep2.ok and any("self loop" in e for e in rep2.errors)

    bad2 = np.asarray(g.zero).copy()
    bad2[3, 0] = -1
    if (bad2[3, 1:] >= 0).any():
        rep3 = validate_graph(bad2, [])
        assert any("hole" in e for e in rep3.errors)


def test_metrics_helpers(capsys):
    got = np.array([[1, 2, 3], [4, 5, -1]])
    want = np.array([[1, 2, 9], [4, 5, 6]])
    r = recall_at_k(got, want, 3)
    assert r == pytest.approx((2 / 3 + 2 / 3) / 2)
    line = emit("m", 1.5, "qps", vs_baseline=2.0, foo="bar")
    assert '"metric": "m"' in line and '"foo": "bar"' in line
    t = time_fn(lambda x: x + 1, 1, warmup=1, iters=3)
    assert isinstance(t, Timing) and t.calls == 3

    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    assert "a" in pt.report()

    stats = BuildStats()
    stats(10, 100, "layer 0")
    assert stats.summary()["wall_s"] >= 0


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    data = rng.standard_normal((7, 5)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    with open(path, "wb") as f:
        for row in data:
            np.int32(5).tofile(f)
            row.tofile(f)
    back = read_fvecs(path)
    np.testing.assert_array_equal(back, data)
    ints = np.arange(12, dtype=np.int32).reshape(4, 3)
    ipath = str(tmp_path / "x.ivecs")
    with open(ipath, "wb") as f:
        for row in ints:
            np.int32(3).tofile(f)
            row.tofile(f)
    np.testing.assert_array_equal(read_ivecs(ipath), ints)


def test_synthetic_clustered_shape():
    pts = synthetic_clustered(500, 16, n_clusters=10, seed=0)
    assert pts.shape == (500, 16) and pts.dtype == np.float32
