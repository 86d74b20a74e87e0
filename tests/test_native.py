"""Native C++ host engine tests: recall floors, graph lift to the TPU
search path, host queries over TPU-built graphs."""

import jax.numpy as jnp
import numpy as np
import pytest

from instant_distance_tpu.config import Config, Heuristic
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.native import NativeHnsw, available
from instant_distance_tpu.ops.beam import hnsw_search
from instant_distance_tpu.ops.distance import resolve

pytestmark = pytest.mark.skipif(not available(),
                                reason="native engine unavailable")


@pytest.mark.parametrize("heuristic", [Heuristic(), None],
                         ids=["heuristic", "simple"])
def test_native_build_recall(heuristic):
    seed = np.random.randint(0, 2**31)
    rng = np.random.default_rng(seed)
    pts = rng.random((1024, 2), dtype=np.float32)
    cfg = Config(seed=seed, metric="euclidean", heuristic=heuristic)
    eng = NativeHnsw.build(pts, cfg)
    q = rng.random((16, 2), dtype=np.float32)
    d, i = eng.search_batch(q, ef=100)

    npts, ids, zero, layers = eng.to_arrays(cfg.m)
    gt_d, gt_i = BruteForce(npts, "euclidean").search_batch(q, 100)
    recalls = [len(set(i[r, :100].tolist()) &
                   set(np.asarray(gt_i)[r].tolist()))
               for r in range(len(q))]
    mean = float(np.mean(recalls))
    floor = 97 if heuristic is not None else 90
    print(f"native seed={seed} recall@100={mean}")
    assert mean > floor


def test_native_graph_lifts_to_tpu_search():
    """Host-built graph searched by the TPU wavefront engine — the
    'minimum end-to-end slice' of SURVEY.md §7 (reference-built graph +
    batched device search)."""
    rng = np.random.default_rng(41)
    pts = rng.random((800, 8), dtype=np.float32)
    cfg = Config(seed=41)
    eng = NativeHnsw.build(pts, cfg)
    npts, ids, zero, layers = eng.to_arrays(cfg.m)

    q = rng.random((8, 8), dtype=np.float32)
    d, p = hnsw_search(jnp.asarray(q), jnp.asarray(zero),
                       tuple(jnp.asarray(l) for l in reversed(layers)),
                       jnp.asarray(npts), resolve("sqeuclidean"),
                       ef=100, m=cfg.m, zero_links=cfg.m0)
    gt_d, gt_i = BruteForce(npts).search_batch(q, 50)
    rec = np.mean([len(set(np.asarray(p)[r, :50].tolist()) &
                       set(np.asarray(gt_i)[r].tolist())) / 50
                   for r in range(8)])
    assert rec > 0.97

    # host engine and TPU engine agree on the same graph
    hd, hi = eng.search_batch(q, ef=100, k=20)
    agree = np.mean(np.asarray(p)[:, :20] == hi)
    assert agree > 0.95


def test_tpu_graph_to_native_roundtrip():
    from instant_distance_tpu.ops.construct import build_graph

    rng = np.random.default_rng(43)
    pts = rng.random((500, 4), dtype=np.float32)
    cfg = Config(seed=43)
    g = build_graph(pts, cfg)
    eng = NativeHnsw.from_arrays(np.asarray(g.points), np.asarray(g.zero),
                                 [np.asarray(l) for l in g.layers],
                                 "sqeuclidean", cfg.m)
    d, i = eng.search_batch(np.asarray(g.points)[:16], ef=32, k=1)
    assert (i[:, 0] == np.arange(16)).mean() > 0.95
