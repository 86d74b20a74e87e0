"""Recall CI gate on the BASELINE.md config ladder (roadmap item 11).

Every ladder config (rgb / fasttext / sift1m / gist1m / deep10m shapes)
is exercised at CPU-affordable point counts but REAL dimensionality and
cluster structure, with the reference's own recall floors (tests/all.rs:
heuristic > 97/100; we gate recall@10 >= 0.95 on clustered data, the
adversarial case).  This catches dimension-specific regressions (e.g.
a 960-d gather or padding bug) that the small unit tests can't see.
"""

import numpy as np
import pytest

from instant_distance_tpu.config import Config
from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.hnsw import Hnsw
from instant_distance_tpu.models.packed import PackedHnsw
from instant_distance_tpu.utils.datasets import CONFIGS, synthetic_clustered

#: CPU-affordable stand-in sizes per ladder rung (full sizes run on TPU
#: via bench.py / the CLI; shape and clustering match BASELINE.md).
_LADDER = {
    "rgb": dict(n=256, clusters=16),
    "fasttext": dict(n=1200, clusters=40),
    "sift1m": dict(n=1200, clusters=40),
    "gist1m": dict(n=600, clusters=20),
    "deep10m": dict(n=1200, clusters=40),
}

_N_QUERIES, _K = 16, 10


@pytest.mark.parametrize("name", list(_LADDER))
def test_ladder_recall_floor(name):
    spec = _LADDER[name]
    dim = CONFIGS[name]["dim"]
    n = spec["n"]
    pts = synthetic_clustered(n + _N_QUERIES, dim,
                              n_clusters=spec["clusters"], seed=97)
    data, queries = pts[:n], pts[n:]
    cfg = Config(seed=97, ef_search=64, ef_construction=64,
                 wave_size=512)
    index, ids = Hnsw.build(data, cfg)

    gt_d, gt_i = BruteForce(data).search_batch(queries, _K)
    gt_pids = ids[np.asarray(gt_i)]

    d, p = index.search_batch(queries, k=_K)
    p = np.asarray(p)
    recall = np.mean([
        len(set(p[i].tolist()) & set(gt_pids[i].tolist())) / _K
        for i in range(_N_QUERIES)])
    print(f"ladder[{name}] exact recall@10 = {recall}")
    assert recall >= 0.95, f"{name}: recall {recall} below gate"

    # packed serving path must stay within 0.05 of the exact path
    packed = PackedHnsw.from_index(index, pack_links=32)
    dp, pp = packed.search_batch(queries, k=_K, ef=64)
    pp = np.asarray(pp)
    recall_p = np.mean([
        len(set(pp[i].tolist()) & set(gt_pids[i].tolist())) / _K
        for i in range(_N_QUERIES)])
    print(f"ladder[{name}] packed recall@10 = {recall_p}")
    assert recall_p >= recall - 0.05, f"{name}: packed recall dropped"
