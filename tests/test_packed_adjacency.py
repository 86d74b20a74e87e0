"""Lane-packed adjacency (ops/construct._pk_*): scan-mode builds store
``adj``/``adjd`` with ``pk = 128 // m0`` logical rows per 128-lane
physical row so TPU minor-dim padding costs nothing at 10M-point scale.
These tests pin (a) the helpers' round-trip algebra and (b) that a
packed build is bit-identical to the unpacked one — packing is a pure
layout change, invisible to the algorithm (lib.rs:481-517 commit
semantics unchanged).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from instant_distance_tpu import Config
from instant_distance_tpu.ops import construct as C


def test_pk_factor():
    assert C._pk_factor(64) == 2
    assert C._pk_factor(32) == 4
    assert C._pk_factor(16) == 8
    assert C._pk_factor(128) == 1   # already a full lane row
    assert C._pk_factor(48) == 1    # non-divisor: unpacked
    assert C._pk_factor(256) == 1


@pytest.mark.parametrize("m0,pk", [(64, 2), (32, 4)])
def test_pk_row_roundtrip(m0, pk):
    rng = np.random.default_rng(0)
    n_log = 11  # odd: exercises the partial final physical row
    prow = (n_log + pk - 1) // pk
    ref = rng.integers(-1, 100, size=(prow * pk, m0)).astype(np.int32)
    packed = jnp.asarray(ref.reshape(prow, pk * m0))
    # gather any logical rows
    rows = jnp.asarray([0, 3, 7, n_log - 1, 1], jnp.int32)
    got = C._pk_row_get(packed, rows, pk, m0)
    np.testing.assert_array_equal(np.asarray(got), ref[np.asarray(rows)])
    # scatter fresh values to distinct rows, read everything back
    vals = rng.integers(0, 9, size=(rows.shape[0], m0)).astype(np.int32)
    packed2 = C._pk_row_set(packed, rows, jnp.asarray(vals), pk, m0)
    ref2 = ref.copy()
    ref2[np.asarray(rows)] = vals
    np.testing.assert_array_equal(
        np.asarray(packed2).reshape(-1, m0), ref2)
    # pk=1 passthrough is the plain path
    a = jnp.asarray(ref)
    np.testing.assert_array_equal(
        np.asarray(C._pk_row_get(a, rows, 1, m0)), ref[np.asarray(rows)])


def test_pk_row_set_shared_physical_row():
    """Two logical rows sharing one physical row write disjoint columns
    in a single scatter — no intra-batch conflict."""
    m0, pk = 4, 2
    packed = jnp.zeros((3, pk * m0), jnp.int32)
    rows = jnp.asarray([2, 3], jnp.int32)          # both live in prow 1
    vals = jnp.asarray([[1] * m0, [2] * m0], jnp.int32)
    out = np.asarray(C._pk_row_set(packed, rows, vals, pk, m0))
    np.testing.assert_array_equal(out[1], [1, 1, 1, 1, 2, 2, 2, 2])
    assert out[0].sum() == 0 and out[2].sum() == 0


@pytest.mark.parametrize("m", [32, 16])
def test_packed_build_bit_identical(m, monkeypatch):
    """build_graph with lane packing == build_graph without, bit for
    bit, on a scan-mode build (the only mode that packs)."""
    rng = np.random.default_rng(7)
    pts = rng.random((600, 32), dtype=np.float32)
    cfg = Config(seed=7, m=m, ef_construction=32, wave_size=64,
                 construct_mode="scan", construct_split=True)
    assert C._pk_factor(cfg.m0) > 1
    g_packed = C.build_graph(pts, cfg)
    monkeypatch.setattr(C, "_pk_factor", lambda m0: 1)
    g_plain = C.build_graph(pts, cfg)
    np.testing.assert_array_equal(np.asarray(g_packed.zero),
                                  np.asarray(g_plain.zero))
    assert len(g_packed.layers) == len(g_plain.layers)
    for a, b in zip(g_packed.layers, g_plain.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_checkpoint_resume(tmp_path, monkeypatch):
    """Resume from a mid-build checkpoint written in packed form is
    bit-exact vs the uninterrupted packed build."""
    rng = np.random.default_rng(11)
    pts = rng.random((500, 16), dtype=np.float32)
    cfg = Config(seed=11, ef_construction=32, wave_size=64,
                 construct_mode="scan", construct_split=True)
    full = C.build_graph(pts, cfg)

    ck = str(tmp_path / "ck.npz")
    calls = {"n": 0}
    orig = C._commit_step

    def bomb(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 5:
            raise RuntimeError("injected crash after checkpoint")
        return orig(*a, **kw)

    monkeypatch.setattr(C, "_commit_step", bomb)
    with pytest.raises(RuntimeError):
        C.build_graph(pts, cfg, checkpoint=ck, checkpoint_every=2)
    monkeypatch.setattr(C, "_commit_step", orig)
    resumed = C.build_graph(pts, cfg, checkpoint=ck, checkpoint_every=2)
    np.testing.assert_array_equal(np.asarray(full.zero),
                                  np.asarray(resumed.zero))
    for a, b in zip(full.layers, resumed.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
