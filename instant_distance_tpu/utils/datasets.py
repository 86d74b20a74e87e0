"""Benchmark datasets: synthetic generators + fvecs/ivecs readers.

The reference's examples use RGB triples (examples/colors.rs) and fastText
300-d word vectors (instant-distance-py/examples/translations).  The
BASELINE.md ladder adds SIFT1M (128-d), GIST1M (960-d) and DEEP10M (96-d).
Real datasets are read from disk when present (fvecs/ivecs, the TexMex
format); otherwise synthetic stand-ins with matching shape and roughly
matching cluster structure are generated on the fly (this image has zero
egress, so downloads are impossible).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def read_fvecs(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """TexMex .fvecs: each row = int32 dim + dim float32s."""
    data = np.fromfile(path, np.int32)
    dim = int(data[0])
    rows = data.reshape(-1, dim + 1)
    if max_rows is not None:
        rows = rows[:max_rows]
    return rows[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    data = np.fromfile(path, np.int32)
    dim = int(data[0])
    rows = data.reshape(-1, dim + 1)
    if max_rows is not None:
        rows = rows[:max_rows]
    return rows[:, 1:].copy()


def synthetic_clustered(n: int, dim: int, n_clusters: int = 1000,
                        seed: int = 0, scale: float = 0.15) -> np.ndarray:
    """Clustered Gaussian data — closer to real embedding statistics than
    uniform noise (real vector datasets are strongly clustered, which is
    what HNSW's heuristic selection exists for, lib.rs:115-119)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + scale * rng.standard_normal(
        (n, dim)).astype(np.float32)
    return pts.astype(np.float32)


def synthetic_uniform(n: int, dim: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random((n, dim), dtype=np.float32)


#: BASELINE.md config ladder (shape only; data substituted when absent).
CONFIGS = {
    "rgb": dict(dim=3, n=256),
    "fasttext": dict(dim=300, n=100_000),
    "sift1m": dict(dim=128, n=1_000_000),
    "gist1m": dict(dim=960, n=1_000_000),
    "deep10m": dict(dim=96, n=10_000_000),
}


def load_config(name: str, n: Optional[int] = None, seed: int = 0,
                data_dir: Optional[str] = None):
    """Return (points, queries) for a ladder config, preferring real data
    under ``data_dir`` (e.g. sift/sift_base.fvecs)."""
    spec = CONFIGS[name]
    n = n or spec["n"]
    dim = spec["dim"]
    data_dir = data_dir or os.environ.get("INSTANT_TPU_DATA", "")
    base = {"sift1m": "sift/sift_base.fvecs",
            "gist1m": "gist/gist_base.fvecs"}.get(name)
    if base and data_dir and os.path.exists(os.path.join(data_dir, base)):
        pts = read_fvecs(os.path.join(data_dir, base), max_rows=n)
        qpath = os.path.join(data_dir, base.replace("base", "query"))
        queries = (read_fvecs(qpath) if os.path.exists(qpath)
                   else pts[:10_000])
        return pts, queries
    pts = synthetic_clustered(n + 10_000, dim,
                              n_clusters=max(100, n // 1000), seed=seed)
    return pts[:n], pts[n:]
