"""Sampled scan construction (Config.construct_sample_cols).

Round-5 VERDICT ask #3: the full-prefix scan makes construction
O(N^2 / wave_size).  The sampled build caps the scanned prefix at the
first ``sample_cols`` inserted pids (a uniform sample — insertion
order is a seeded shuffle, lib.rs:256-270) and recovers out-of-sample
neighbors with a graph-hop repair inside the commit program
(ops/construct.repair_commit_core).  These tests pin:

* recall floor of a sampled "scan" build (flat path),
* recall floor of a sampled "scan_fused" build (kernel path),
* sample >= N degenerates to the exact bit-identical unsampled graph
  when hop count also matches (sampling inactive),
* checkpoint keys differ between sampled and unsampled builds.
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
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
    rng = np.random.default_rng(41)
    return (rng.random((3072, 16), dtype=np.float32),
            rng.random((64, 16), dtype=np.float32))


def test_sampled_scan_meets_recall_floor(pts):
    """Split path (construct_split=True pins the 10M-scale structure:
    pool handoff + hop repair in the commit program)."""
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=41, wave_size=512,
                                       construct_mode="scan",
                                       construct_sample_cols=768,
                                       construct_sample_hops=16,
                                       construct_split=True))
    r = _recall(idx, ids, data, queries)
    # 25% sample + 1-hop repair: same floor as the unsampled build
    assert r >= 0.97, f"sampled scan recall {r}"


def test_sampled_scan_monolith_meets_recall_floor(pts):
    """Auto mode at small N runs the monolith with in-search repair."""
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=41, wave_size=512,
                                       construct_mode="scan",
                                       construct_sample_cols=768,
                                       construct_sample_hops=16))
    r = _recall(idx, ids, data, queries)
    assert r >= 0.97, f"sampled monolith recall {r}"


def test_sampled_fused_meets_recall_floor(pts):
    data, queries = pts
    idx, ids = Hnsw.build(data, Config(seed=41, wave_size=512,
                                       construct_mode="scan_fused",
                                       construct_sample_cols=1024,
                                       construct_sample_hops=16,
                                       construct_split=True))
    r = _recall(idx, ids, data, queries)
    assert r >= 0.97, f"sampled fused recall {r}"


def test_sample_ge_n_is_inactive(pts):
    """cap >= N must leave the build bit-identical to unsampled."""
    data, _ = pts
    cfg0 = Config(seed=41, wave_size=512, construct_mode="scan")
    ref, ref_ids = Hnsw.build(data, cfg0)
    cfg1 = Config(seed=41, wave_size=512, construct_mode="scan",
                  construct_sample_cols=len(data))
    idx, ids = Hnsw.build(data, cfg1)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(np.asarray(idx.zero),
                                  np.asarray(ref.zero))


def test_sampled_add_meets_recall_floor(pts):
    """Incremental adds under sampling (extend_graph): the capped scan
    + monolith hop repair must hold the same floor as unsampled adds."""
    data, queries = pts
    cfg = Config(seed=41, wave_size=512, construct_mode="scan",
                 construct_sample_cols=1024, construct_sample_hops=16)
    idx, ids = Hnsw.build(data[:2048], cfg)
    new_ids = idx.add(data[2048:])
    all_ids = np.concatenate([ids, new_ids])
    r = _recall(idx, all_ids, data, queries)
    assert r >= 0.95, f"sampled add recall {r}"


def test_sampling_invalidates_checkpoint(pts):
    """A sampled build must not resume an unsampled checkpoint (the
    graphs differ); the key carries the sampling params as a pure
    suffix so pre-sampling checkpoints keep their existing keys."""
    data, _ = pts
    cfg0 = Config(seed=41, wave_size=512, construct_mode="scan")
    k0 = _key_of(data[:1536], cfg0)
    k1 = _key_of(data[:1536],
                 Config(seed=41, wave_size=512, construct_mode="scan",
                        construct_sample_cols=512))
    assert k1 == k0 + ":sc512:sh16"
    # cap >= N: sampling inactive, key identical to unsampled
    k2 = _key_of(data[:1536],
                 Config(seed=41, wave_size=512, construct_mode="scan",
                        construct_sample_cols=len(data)))
    assert k2 == k0


def _key_of(data, cfg):
    """Reproduce build_graph's ckpt key for the given config (kept in
    lockstep by this test breaking if the format drifts)."""
    from instant_distance_tpu.ops.construct import (
        _exact_prefix_of, _hop_of, _pk_factor, _pool_of,
        _resolve_search_mode, _rev_params)

    n = len(data)
    metric_name = cfg.metric
    heur = (None if cfg.heuristic is None else
            (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned))
    pend_cap, rev_rounds = _rev_params(cfg, cfg.m0)
    search_mode = _resolve_search_mode(cfg, metric_name)
    can_split = (search_mode.startswith("scan") and _hop_of(cfg) == 0
                 and not (heur is not None and heur[0]))
    sp = getattr(cfg, "construct_split", None)
    if sp is None:
        dp_est = data.shape[1] + ((-data.shape[1]) % 128)
        sp = n * (17 * cfg.m0 + 8 * dp_est) > 8_000_000_000
    split = can_split and bool(sp)
    pk = _pk_factor(cfg.m0) if split else 1
    key = f"v8:{n}:{data.shape[1]}:{cfg.ef_construction}:" \
          f"{cfg.m}:{cfg.ml}:{heur}:{cfg.wave_size}:{pend_cap}:" \
          f"{rev_rounds}:{cfg.max_iter_factor}:" \
          f"{getattr(cfg, 'construct_expand', 1)}:{search_mode}:" \
          f"{getattr(cfg, 'select_pd_dtype', 'bfloat16')}:" \
          f"{_exact_prefix_of(cfg)}:{_hop_of(cfg)}:" \
          f"{_pool_of(cfg, search_mode)}:{pk}:" \
          f"{getattr(cfg, 'dist_cache_dtype', 'float32')}"
    sc = getattr(cfg, "construct_sample_cols", None)
    if sc is not None and search_mode.startswith("scan") and int(sc) < n:
        key += f":sc{int(sc)}:sh{getattr(cfg, 'construct_sample_hops', 16)}"
    return key
