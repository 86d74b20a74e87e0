"""StreamingHnsw: chunked add over a compiled serving form.

Beyond-parity capability (the reference's index is immutable,
SURVEY.md §5): graph wave insertion keeps the graph current, a pending
slab of rows newer than the serving snapshot is scanned exactly and
merged, and compaction recompiles the serving form.  Pending results
are exact, so a just-added point is immediately findable
(read-your-writes).
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.streaming import StreamingHnsw


def _recall(got, want):
    k = want.shape[1]
    return np.mean([
        len(set(got[i].tolist()) & set(want[i].tolist())) / k
        for i in range(len(got))])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(404)
    base = rng.random((700, 8), dtype=np.float32)
    extra = rng.random((120, 8), dtype=np.float32)
    queries = rng.random((12, 8), dtype=np.float32)
    return base, extra, queries


@pytest.fixture(scope="module", params=["scan", "packed"])
def streamed(request, data):
    base, extra, _ = data
    cfg = Config(seed=404, ef_search=64, wave_size=256)
    idx = StreamingHnsw.build(base, config=cfg, serving=request.param,
                              repack_every=10_000)  # no auto-compact
    for i in range(0, len(extra), 40):               # 3 chunked adds
        pids = idx.add(extra[i:i + 40])
        assert pids[0] == len(base) + i
    return idx


def _ground_truth(idx, queries, k=10):
    """Exact top-k in pid space over the full grown index."""
    pts = np.asarray(idx.graph.points, np.float32)
    return BruteForce(pts).search_batch(queries, k)


def test_pending_points_found(streamed, data):
    base, extra, queries = data
    assert len(streamed) == len(base) + len(extra)
    assert streamed.n_pending == len(extra)
    # query AT five pending points: exact slab scan must return each as
    # its own top-1 (read-your-writes)
    d, p = streamed.search_batch(extra[:5], k=1)
    assert np.asarray(p)[:, 0].tolist() == [len(base) + i
                                            for i in range(5)]
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-6)


def test_merged_recall(streamed, data):
    _, _, queries = data
    gt_d, gt_i = _ground_truth(streamed, queries)
    d, p = streamed.search_batch(queries, k=10)
    rec = _recall(np.asarray(p), np.asarray(gt_i))
    print(f"streaming[{streamed.serving_mode}] recall@10 = {rec}")
    assert rec >= 0.9
    np.testing.assert_allclose(np.asarray(d)[:, 0],
                               np.asarray(gt_d)[:, 0], rtol=1e-5)


def test_delete_spans_snapshot_and_slab(streamed, data):
    base, extra, queries = data
    # tombstone one snapshot point and one pending point: the current
    # top-1 of two probe queries
    probe = np.stack([base[11], extra[7]])
    _, p0 = streamed.search_batch(probe, k=1)
    top = np.asarray(p0)[:, 0]
    assert top[1] >= len(base)          # probe 2's top-1 is pending
    streamed.delete(top)
    try:
        d, p = streamed.search_batch(probe, k=10)
        assert not (set(np.asarray(p).ravel().tolist())
                    & set(top.tolist()))
    finally:  # un-tombstone: module-scoped fixture is shared
        streamed.graph._alive = streamed.graph._alive.at[
            np.asarray(top)].set(True)


def test_filter_mask_full_length(streamed, data):
    base, extra, queries = data
    n = len(streamed)
    mask = np.ones(n, bool)
    _, p0 = streamed.search_batch(queries, k=3)
    banned = np.unique(np.asarray(p0).ravel())
    mask[banned] = False
    d, p = streamed.search_batch(queries, k=5, filter_mask=mask)
    got = np.asarray(p)
    assert not (set(got.ravel().tolist()) & set(banned.tolist()))
    with pytest.raises(ValueError):
        streamed.search_batch(queries, k=3, filter_mask=mask[:-1])


def test_compact_folds_slab(streamed, data):
    _, _, queries = data
    gt_d, gt_i = _ground_truth(streamed, queries)
    streamed.compact()
    assert streamed.n_pending == 0
    assert len(streamed.serve) == len(streamed)
    d, p = streamed.search_batch(queries, k=10)
    rec = _recall(np.asarray(p), np.asarray(gt_i))
    print(f"compacted[{streamed.serving_mode}] recall@10 = {rec}")
    assert rec >= 0.9


def test_auto_compact_and_values(data):
    base, extra, queries = data
    cfg = Config(seed=405, ef_search=64, wave_size=256)
    vals = [f"v{i}" for i in range(len(base))]
    idx = StreamingHnsw.build(base, values=vals, config=cfg,
                              serving="scan", repack_every=64)
    idx.add(extra[:40], values=[f"x{i}" for i in range(40)])
    assert idx.n_pending == 40
    idx.add(extra[40:80], values=[f"x{i}" for i in range(40, 80)])
    assert idx.n_pending == 0            # 80 >= 64 triggered compact
    d, p, v = idx.search_batch_values(extra[41][None], k=1)
    assert v[0][0] == "x41"


def test_scanindex_direct_add(data):
    """ScanIndex.add is exact streaming: append IS the update."""
    from instant_distance_tpu.models.scan import ScanIndex

    base, extra, queries = data
    si = ScanIndex(base, values=[f"v{i}" for i in range(len(base))])
    ids = si.add(extra, values=[f"x{i}" for i in range(len(extra))])
    assert ids[0] == len(base) and len(si) == len(base) + len(extra)
    gt_d, gt_i = BruteForce(
        np.concatenate([base, extra])).search_batch(queries, 10)
    d, i = si.search_batch(queries, k=10, ef=64)
    assert _recall(np.asarray(i), np.asarray(gt_i)) >= 0.99
    # fused layout rebuilt after add (cb small so the kernel engages)
    d2, i2 = si.search_batch(queries, k=10, ef=64, fused="bucket",
                             cb=256, lsub=4)
    assert _recall(np.asarray(i2), np.asarray(gt_i)) >= 0.95
    # value alignment across the append boundary
    _, _, v = si.search_batch_values(extra[3][None], k=1)
    assert v[0][0] == "x3"
    with pytest.raises(ValueError):
        si.add(extra[:2])  # values required on a value-carrying index


def test_dump_load_roundtrip(tmp_path, data):
    base, extra, queries = data
    cfg = Config(seed=406, ef_search=64, wave_size=256)
    idx = StreamingHnsw.build(base, values=[f"v{i}" for i in
                                            range(len(base))], config=cfg,
                              serving="scan", repack_every=10_000)
    idx.add(extra[:30], values=[f"x{i}" for i in range(30)])
    fname = str(tmp_path / "s.idx.npz")
    idx.dump(fname)  # persists graph incl. the pending rows
    idx2 = StreamingHnsw.load(fname, serving="scan")
    assert len(idx2) == len(idx) and idx2.n_pending == 0
    d1, p1 = idx.search_batch(queries, k=5)
    d2, p2 = idx2.search_batch(queries, k=5)
    np.testing.assert_allclose(np.asarray(d1)[:, 0], np.asarray(d2)[:, 0],
                               rtol=1e-5)
    _, _, v = idx2.search_batch_values(extra[3][None], k=1)
    assert v[0][0] == "x3"


def test_grown_graph_invariants(streamed):
    """The incrementally-grown graph keeps the structural invariants the
    validator enforces (INVALID-terminated prefixes, in-range pids,
    degree caps) — adds must not corrupt rows they rewrite."""
    from instant_distance_tpu.utils.validate import validate_graph

    report = validate_graph(streamed.graph)
    assert report.ok, vars(report)
