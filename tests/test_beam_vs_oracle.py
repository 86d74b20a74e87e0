"""Core engine validation: batched TPU beam search vs the sequential oracle.

Strategy (SURVEY.md §7 minimum slice): build a graph with the sequential
reference-semantics builder, then run the batched wavefront search over the
*same* graph and require (a) recall >= the reference's own test floors vs
brute force, and (b) near-exact agreement with the oracle's single-query
search on the identical graph.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from instant_distance_tpu.config import Config, Heuristic
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.ops.beam import hnsw_search
from instant_distance_tpu.ops.distance import resolve
from instant_distance_tpu.utils.refimpl import RefHnsw


def _search_graph(ref: RefHnsw, queries, ef):
    cfg = ref.config
    metric = resolve(cfg.metric)
    upper = tuple(jnp.asarray(a) for a in reversed(ref.layers))
    d, p = hnsw_search(
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(ref.zero), upper,
        jnp.asarray(ref.points), metric,
        ef=ef, m=cfg.m, zero_links=cfg.m0)
    return np.asarray(d), np.asarray(p)


@pytest.mark.parametrize("heuristic", [Heuristic(), None],
                         ids=["heuristic", "simple"])
def test_batched_search_recall_1024(heuristic):
    """Recall@100 floors from the reference's randomized tests
    (instant-distance/tests/all.rs:41-53): heuristic > 97, simple > 90."""
    seed = np.random.randint(0, 2**31)
    rng = np.random.default_rng(seed)
    pts = rng.random((1024, 2), dtype=np.float32)
    cfg = Config(seed=seed, metric="euclidean", heuristic=heuristic)
    ref = RefHnsw(pts, cfg)

    queries = rng.random((16, 2), dtype=np.float32)
    gt_d, gt_p = BruteForce(ref.points, "euclidean").search_batch(queries, 100)
    d, p = _search_graph(ref, queries, ef=100)

    recalls = []
    for i in range(len(queries)):
        got = set(p[i, :100].tolist())
        want = set(np.asarray(gt_p)[i].tolist())
        recalls.append(len(got & want))
    mean = float(np.mean(recalls))
    floor = 97 if heuristic is not None else 90
    print(f"seed={seed} recall@100={mean}")
    assert mean > floor, f"recall {mean} (floor {floor}), seed {seed}"


def test_batched_matches_oracle_exactly():
    """On the same graph, batched beam search and the sequential oracle
    expand the same frontier => identical result sets (up to fp ties)."""
    seed = 1234
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((700, 8)).astype(np.float32)
    cfg = Config(seed=seed, metric="sqeuclidean")
    ref = RefHnsw(pts, cfg)

    queries = rng.standard_normal((8, 8)).astype(np.float32)
    d, p = _search_graph(ref, queries, ef=64)
    for i, q in enumerate(queries):
        oracle = ref.search(q, ef=64)
        op = [pid for _, pid in oracle]
        od = np.array([dd for dd, _ in oracle], np.float32)
        assert p[i, :len(op)].tolist() == op, f"query {i} mismatch"
        np.testing.assert_allclose(d[i, :len(od)], od, rtol=1e-5)


def test_search_single_and_tiny_index():
    pts = np.array([[0.0, 0.0]], np.float32)
    cfg = Config(seed=7)
    ref = RefHnsw(pts, cfg)
    d, p = _search_graph(ref, np.array([[1.0, 1.0]], np.float32), ef=4)
    assert p[0, 0] == 0
    np.testing.assert_allclose(d[0, 0], 2.0, rtol=1e-6)  # squared L2
    assert (p[0, 1:] == -1).all()
