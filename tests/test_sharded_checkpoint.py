"""Fault injection for the SHARDED build: crash mid-build on the
8-virtual-device mesh, resume from checkpoint, verify bit-exactness.

VERDICT r1 weak #6: the single-chip build had crash insurance but the
sharded path — the one meant for the biggest builds — had none.  Wave
commits are deterministic, so resume must reproduce the uninterrupted
build exactly (same zero adjacency, same upper-layer snapshots), not
merely statistically.
"""

import os

import jax
import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.parallel.mesh import default_mesh
from instant_distance_tpu.parallel.sharded import ShardedHnsw


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return default_mesh(8)


class _Boom(RuntimeError):
    pass


def _build_with_crash(pts, cfg, mesh, ckpt, crash_after):
    attempts = 0
    while True:
        attempts += 1
        count = 0

        def progress(done, total, phase):
            nonlocal count
            count += 1
            if attempts == 1 and count >= crash_after:
                raise _Boom(f"injected crash at wave callback {count}")

        try:
            idx = ShardedHnsw.build(pts, cfg, mesh=mesh, progress=progress,
                                    checkpoint=ckpt, checkpoint_every=1)
            return idx, attempts
        except _Boom:
            assert attempts < 5, "crash loop"
            continue


@pytest.mark.parametrize("crash_after", [2, 5])
def test_sharded_crash_resume_bit_exact(tmp_path, mesh, crash_after):
    rng = np.random.default_rng(83)
    pts = rng.random((512, 8), dtype=np.float32)
    cfg = Config(seed=83, ef_search=32, wave_size=16)

    ref = ShardedHnsw.build(pts, cfg, mesh=mesh)   # uninterrupted

    ckpt = str(tmp_path / f"sck{crash_after}.npz")
    idx, attempts = _build_with_crash(pts, cfg, mesh, ckpt, crash_after)
    assert attempts == 2                           # crashed once, resumed
    np.testing.assert_array_equal(np.asarray(idx.zero),
                                  np.asarray(ref.zero))
    assert len(idx.layers) == len(ref.layers)
    for a, b in zip(idx.layers, ref.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(idx.gids),
                                  np.asarray(ref.gids))
    assert not os.path.exists(ckpt)                # cleaned up when done

    # resumed index still answers queries identically to the reference
    q = rng.random((8, 8), dtype=np.float32)
    da, ga = (np.asarray(x) for x in idx.search_batch(q, k=5))
    db, gb = (np.asarray(x) for x in ref.search_batch(q, k=5))
    np.testing.assert_array_equal(ga, gb)
    np.testing.assert_allclose(da, db, rtol=1e-6)


def test_sharded_stale_checkpoint_ignored(tmp_path, mesh):
    """A checkpoint written under different hyperparameters must not be
    resumed (key mismatch -> fresh build)."""
    rng = np.random.default_rng(89)
    pts = rng.random((512, 8), dtype=np.float32)
    ckpt = str(tmp_path / "sck.npz")
    cfg1 = Config(seed=89, ef_search=32, wave_size=16, ef_construction=32)
    try:
        ShardedHnsw.build(
            pts, cfg1, mesh=mesh, checkpoint=ckpt, checkpoint_every=1,
            progress=lambda d, t, p: (_ for _ in ()).throw(_Boom())
            if d > 200 else None)
    except _Boom:
        pass
    assert os.path.exists(ckpt)

    cfg2 = Config(seed=90, ef_search=32, wave_size=16, ef_construction=48)
    idx = ShardedHnsw.build(pts, cfg2, mesh=mesh, checkpoint=ckpt)
    ref = ShardedHnsw.build(pts, cfg2, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(idx.zero),
                                  np.asarray(ref.zero))
