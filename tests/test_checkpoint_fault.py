"""Fault injection: kill a build mid-flight, resume from checkpoint.

The reference has no checkpointing at all (SURVEY.md §5: "a crash loses
everything"); our build saves wave state every ``checkpoint_every``
waves.  These tests verify the crash->resume path produces exactly the
same graph as an uninterrupted build (wave commits are deterministic,
so resume is bit-exact, not merely statistically equivalent).
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.hnsw import Hnsw


class _Boom(RuntimeError):
    pass


def _build_with_crashes(pts, cfg, ckpt, crash_after):
    """Run Hnsw.build, injecting a crash after ``crash_after`` progress
    callbacks; returns the index once a (re)start completes."""
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
            index, ids = Hnsw.build(pts, cfg, progress=progress,
                                    checkpoint=ckpt, checkpoint_every=1)
            return index, ids, attempts
        except _Boom:
            assert attempts < 5, "crash loop"
            continue


@pytest.mark.parametrize("crash_after,cache_dtype",
                         [(3, "float32"), (9, "float32"),
                          (3, "bfloat16")])
def test_crash_resume_bit_exact(tmp_path, crash_after, cache_dtype):
    # bfloat16: the npy format loses ml_dtypes descriptors (loads back
    # as void |V2) — the checkpoint bit-views the distance cache through
    # uint16 + a dtype tag; this crashed the 10M resume before the fix.
    rng = np.random.default_rng(59)
    pts = rng.random((600, 8), dtype=np.float32)
    cfg = Config(seed=59, ef_search=32, wave_size=64,
                 dist_cache_dtype=cache_dtype)

    ref, ref_ids = Hnsw.build(pts, cfg)   # uninterrupted reference

    ckpt = str(tmp_path / f"ck{crash_after}.npz")
    index, ids, attempts = _build_with_crashes(pts, cfg, ckpt,
                                               crash_after)
    assert attempts == 2                  # crashed once, resumed once
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(np.asarray(index.zero),
                                  np.asarray(ref.zero))
    assert len(index.layers) == len(ref.layers)
    for a, b in zip(index.layers, ref.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # checkpoint file is cleaned up after a completed build
    import os
    assert not os.path.exists(ckpt)


def test_stale_checkpoint_ignored(tmp_path):
    """A checkpoint from different hyperparameters must not be resumed."""
    rng = np.random.default_rng(61)
    pts = rng.random((300, 8), dtype=np.float32)
    ckpt = str(tmp_path / "ck.npz")
    cfg1 = Config(seed=61, ef_search=32, wave_size=64, ef_construction=32)
    _build_with_crashes(pts, cfg1, ckpt, 2)  # leaves no file (completed)

    # write a checkpoint with cfg1, then build with cfg2: key mismatch
    try:
        Hnsw.build(pts, cfg1, checkpoint=ckpt, checkpoint_every=1,
                   progress=lambda d, t, p: (_ for _ in ()).throw(
                       _Boom()) if d > 100 else None)
    except _Boom:
        pass
    import os
    assert os.path.exists(ckpt)
    cfg2 = Config(seed=62, ef_search=32, wave_size=64, ef_construction=48)
    index, ids = Hnsw.build(pts, cfg2, checkpoint=ckpt)
    ref, ref_ids = Hnsw.build(pts, cfg2)
    np.testing.assert_array_equal(np.asarray(index.zero),
                                  np.asarray(ref.zero))


def test_entropy_seed_resume_adopts_stored_seed(tmp_path):
    """seed=None (entropy) builds resolve the seed at build time; the
    checkpoint stores it, and a resume ADOPTS the stored seed so the
    shuffle (and thus the resumed graph) stays consistent across a
    process restart."""
    rng = np.random.default_rng(63)
    pts = rng.random((600, 8), dtype=np.float32)
    cfg = Config(seed=None, ef_search=32, wave_size=64)
    assert cfg.seed is None  # lazy: not resolved at Config() time

    ckpt = str(tmp_path / "ck_entropy.npz")
    index, ids, attempts = _build_with_crashes(pts, cfg, ckpt, 5)
    assert attempts == 2
    # the graph is self-consistent: every point finds itself
    d, p = index.search_batch(pts[:32], k=1, ef=16)
    got = np.asarray(p)[:, 0]
    want = ids[:32]
    assert (got == want).mean() >= 0.95
    import os
    assert not os.path.exists(ckpt)
