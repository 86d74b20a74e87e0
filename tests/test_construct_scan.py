"""Scan-mode construction (Config.construct_mode) parity.

The TPU-native default builds each wave's candidate set with an
exact-rerank int8 MXU scan of the inserted prefix instead of walking
the pre-wave graph (ops/construct.py wave_step_core: the reference
searches the graph only because a CPU cannot afford the exhaustive
scan, lib.rs:447-463).  The candidates are strictly better (the TRUE
top-efc), so graphs must meet the same recall floors; "beam" remains
for custom callable metrics and must keep meeting them too.
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config, Heuristic
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw


def _recall(index, ids, pts, queries, k=10, ef=64):
    gt = np.asarray(BruteForce(pts).search_batch(queries, k)[1])
    _, p = index.search_batch(queries, k=k, ef=ef)
    got = np.asarray(p)
    return float(np.mean([
        len(set(got[i].tolist()) & set(ids[gt[i]].tolist())) / k
        for i in range(len(queries))]))


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(67)
    return (rng.random((2048, 16), dtype=np.float32),
            rng.random((64, 16), dtype=np.float32))


def test_scan_mode_meets_recall_floor(pts):
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                       construct_mode="scan"))
    r = _recall(idx, ids, data, queries)
    assert r >= 0.97, f"scan-mode recall {r}"


def test_chunked_snapshot_bit_exact(pts, monkeypatch):
    """The layer-transition snapshot is copied into the stacked buffer
    in bounded row chunks (the one-shot gather OOM'd the 10M build);
    shrinking the chunk so several are needed must not change the
    graph at all."""
    from instant_distance_tpu.ops import construct as C

    data, queries = pts
    cfg = Config(seed=67, wave_size=512, construct_mode="scan")
    ref, ref_ids = Hnsw.build(data, cfg)
    monkeypatch.setattr(C, "_SNAP_CHUNK_ROWS", 16)
    idx, ids = Hnsw.build(data, cfg)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(np.asarray(idx.zero),
                                  np.asarray(ref.zero))
    for a, b in zip(idx.layers, ref.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_vs_beam_recall(pts):
    data, queries = pts
    scan_idx, sids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                             construct_mode="scan"))
    beam_idx, bids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                             construct_mode="beam"))
    r_scan = _recall(scan_idx, sids, data, queries)
    r_beam = _recall(beam_idx, bids, data, queries)
    # exact candidates can only help
    assert r_scan >= r_beam - 0.02, f"scan {r_scan} vs beam {r_beam}"


def test_scan_fused_mode_interpret(pts):
    """The Pallas fused-kernel wave search (the TPU default via "auto")
    runs here in interpreter mode — same code path the TPU compiles.
    construct_exact_prefix=0 forces EVERY wave through the fused kernel
    (by default waves below the exact-prefix threshold use the exact
    streamed scan and this graph would never touch the kernel)."""
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                       construct_mode="scan_fused",
                                       construct_exact_prefix=0))
    r = _recall(idx, ids, data, queries)
    assert r >= 0.97, f"scan_fused recall {r}"


def test_scan_fused_hybrid_prefix(pts):
    """Hybrid dispatch: waves below construct_exact_prefix run the exact
    streamed scan, the rest the fused kernel — the graph must meet the
    same floor and match the all-exact build closely."""
    data, queries = pts
    hybrid, hids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                           construct_mode="scan_fused",
                                           construct_exact_prefix=1024))
    exact, eids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                          construct_mode="scan"))
    r_h = _recall(hybrid, hids, data, queries)
    r_e = _recall(exact, eids, data, queries)
    assert r_h >= 0.97, f"hybrid recall {r_h}"
    assert r_h >= r_e - 0.02, f"hybrid {r_h} vs exact {r_e}"


def test_config_defaults_compare_equal():
    """Config() == Config(): the seed resolves lazily at build time
    (VERDICT r2 item 10 — an entropy seed drawn in __post_init__ made
    every default config unique, churning jit-cache keys)."""
    assert Config() == Config()
    assert Config().seed is None
    c = Config(seed=7)
    assert c == Config(seed=7) and c != Config()


def test_auto_resolves_beam_for_callable_metric(pts):
    data, queries = pts
    import jax.numpy as jnp

    def custom(a, b):  # sqeuclidean as a traceable callable
        d = a - b
        return jnp.sum(d * d, axis=-1)

    idx, ids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                       metric=custom))
    gt = np.asarray(BruteForce(data).search_batch(queries, 10)[1])
    _, p = idx.search_batch(queries, k=10, ef=64)
    got = np.asarray(p)
    r = float(np.mean([
        len(set(got[i].tolist()) & set(ids[gt[i]].tolist())) / 10
        for i in range(len(queries))]))
    assert r >= 0.9, f"callable-metric (beam) recall {r}"


def test_simple_selection_scan_mode(pts):
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=67, wave_size=512,
                                       heuristic=None,
                                       construct_mode="scan"))
    r = _recall(idx, ids, data, queries)
    assert r >= 0.90, f"simple-selection scan-mode recall {r}"


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_scan_fused_dot_cosine_build(pts, metric):
    """scan_fused construction on dot/cosine (the kernel's is_dot form:
    0/+inf eligibility bias in norms, cosine scales pre-divided by
    |p_hat|) builds graphs meeting the same floor as the beam walk."""
    data, queries = pts
    cfg = Config(seed=68, wave_size=512, metric=metric,
                 construct_mode="scan_fused")
    idx, ids = Hnsw.build(data, cfg)
    gt = np.asarray(
        BruteForce(data, metric=metric).search_batch(queries, 10)[1])
    _, p = idx.search_batch(queries, k=10, ef=64)
    got = np.asarray(p)
    r = float(np.mean([
        len(set(got[i].tolist()) & set(ids[gt[i]].tolist())) / 10
        for i in range(len(queries))]))
    assert r >= 0.9, f"scan_fused {metric} recall {r}"


def test_pool_resolution():
    """construct_pool: scan modes default to 3*ef_construction (the
    round-3 measured quality winner: 1M exact-graph recall@10(ef=50)
    0.973 at pool 100 -> 0.9946 at 200 -> 0.9990 at 300,
    tools/exp_quality.py); beam mode keeps ef_construction verbatim
    (reference parity, lib.rs:458-461); an explicit pool wins
    everywhere it applies."""
    from instant_distance_tpu.ops.construct import (_exact_prefix_of,
                                                    _hop_of, _pool_of)

    cfg = Config()
    assert _pool_of(cfg, "scan") == 300
    assert _pool_of(cfg, "scan_fused") == 300
    assert _pool_of(cfg, "beam") == 100
    assert _hop_of(cfg) == 0  # deep pools subsume hop repair (measured)
    assert _exact_prefix_of(cfg) == 0  # always-fused default (measured)
    cfg2 = Config(ef_construction=64)
    assert _pool_of(cfg2, "scan") == 192
    cfg3 = Config(construct_pool=300)
    assert _pool_of(cfg3, "scan") == 300
    assert _pool_of(cfg3, "beam") == 100
    assert _exact_prefix_of(Config(construct_exact_prefix=4096)) == 4096
