"""Fused-scan kernel on dot/cosine metrics (interpret mode on CPU).

Round-2 roadmap item "metric surface for the fused kernel": the Pallas
bucket/topt kernels score dot and cosine via is_dot=True, with the norms
operand repurposed as an eligibility bias (0 eligible / +inf
ineligible-or-padded) and, for cosine, 1/|p| folded into the point
scales and 1/|q| into the query scale.  The reference's only metric is
squared L2 (instant-distance-py/src/lib.rs:380-412); dot/cosine are TPU
extras, so these tests gate them against the exact BruteForce oracle.
"""

import numpy as np
import pytest

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex

CB = 512   # small point block so interpret-mode cells stay cheap
LSUB = 4   # keeps cb/lsub at the production 128 ratio (32/4096), so
           # stride-group candidate loss matches serving-scale behavior


def _recall(got, want):
    k = want.shape[1]
    return np.mean([
        len(set(got[i].tolist()) & set(want[i].tolist())) / k
        for i in range(len(got))])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1203)
    # N deliberately NOT a multiple of the point block: exercises the
    # padded-tail eligibility bias (padded zeros would otherwise win
    # dot-metric ties against negative-dot points)
    pts = rng.standard_normal((1300, 16)).astype(np.float32)
    queries = rng.standard_normal((8, 16)).astype(np.float32)
    return pts, queries


@pytest.mark.parametrize("metric", ["dot", "cosine"])
@pytest.mark.parametrize("mode", ["bucket", "topt"])
def test_fused_matches_exact(data, metric, mode):
    pts, queries = data
    idx = ScanIndex(pts, metric=metric)
    d, i = idx.search_batch(queries, k=10, ef=64, fused=mode, cb=CB, lsub=LSUB)
    gt_d, gt_i = BruteForce(pts, metric=metric).search_batch(queries, 10)
    rec = _recall(np.asarray(i), np.asarray(gt_i))
    print(f"fused {mode}/{metric} recall@10 = {rec}")
    assert rec >= 0.95
    assert (np.asarray(i) < len(pts)).all()  # no padded ids leak
    # rerank makes reported values exact in the metric's units
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_fused_filter_and_delete(data, metric):
    pts, queries = data
    idx = ScanIndex(pts, metric=metric)
    gt_d, gt_i = BruteForce(pts, metric=metric).search_batch(queries, 1)
    # kill each query's true top-1 two ways: tombstone for even ids,
    # filter for odd — neither may appear in any result row
    top1 = np.asarray(gt_i)[:, 0]
    dead = np.unique(top1[::2])
    idx.delete(dead)
    mask = np.ones(len(pts), bool)
    mask[np.unique(top1[1::2])] = False
    d, i = idx.search_batch(queries, k=10, ef=64, fused="bucket", cb=CB,
                            lsub=LSUB, filter_mask=mask)
    got = np.asarray(i)
    banned = set(dead.tolist()) | set(np.unique(top1[1::2]).tolist())
    assert not (set(got.ravel().tolist()) & banned)
    # exact-oracle parity on the surviving points
    elig = np.ones(len(pts), bool)
    elig[list(banned)] = False
    sub = BruteForce(pts[elig], metric=metric)
    remap = np.flatnonzero(elig)
    _, gi = sub.search_batch(queries, 10)
    want = remap[np.asarray(gi)]
    assert _recall(got, want) >= 0.95


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_fused_rerank_false_units(data, metric):
    """rerank=False values approximate the named metric's units
    (dot = -q.p, cosine = 1 - cos), not an ordering-only surrogate."""
    pts, queries = data
    idx = ScanIndex(pts, metric=metric)
    d, i = idx.search_batch(queries, k=5, ef=64, fused="bucket", cb=CB,
                            lsub=LSUB, rerank=False)
    gt_d, gt_i = BruteForce(pts, metric=metric).search_batch(queries, 5)
    # int8 quantization error bounds the value gap; ordering may differ
    np.testing.assert_allclose(np.asarray(d)[:, 0],
                               np.asarray(gt_d)[:, 0], atol=0.05)


def test_bucket_int_falls_back_for_dot(data):
    """bucket_int's shared-scale rank trick is L2-only; requesting it
    on a dot index must silently serve the f32 bucket kernel."""
    pts, queries = data
    idx = ScanIndex(pts, metric="dot")
    d, i = idx.search_batch(queries, k=10, ef=64, fused="bucket_int",
                            cb=CB, lsub=LSUB)
    _, gt_i = BruteForce(pts, metric="dot").search_batch(queries, 10)
    assert _recall(np.asarray(i), np.asarray(gt_i)) >= 0.95


@pytest.mark.parametrize("metric", ["dot", "cosine"])
def test_parallel_fused_dot_cosine(data, metric):
    """Sharded (point-parallel) and replicated (query-DP) fused paths
    serve dot/cosine on the 8-device mesh with oracle parity."""
    from instant_distance_tpu.parallel.mesh import default_mesh
    from instant_distance_tpu.parallel.replicated import (
        ReplicatedScanIndex)
    from instant_distance_tpu.parallel.scan import ShardedScanIndex

    pts, queries = data
    mesh = default_mesh(8)
    _, gt_i = BruteForce(pts, metric=metric).search_batch(queries, 10)

    sharded = ShardedScanIndex(pts, metric=metric, mesh=mesh)
    d, i = sharded.search_batch(queries, k=10, ef=64, fused=True,
                                cb=64, lsub=4)
    assert _recall(np.asarray(i), np.asarray(gt_i)) >= 0.95

    repl = ReplicatedScanIndex(ScanIndex(pts, metric=metric), mesh=mesh)
    d, i = repl.search_batch(queries, k=10, ef=64, fused=True,
                             cb=CB, lsub=LSUB)
    assert _recall(np.asarray(i), np.asarray(gt_i)) >= 0.95
