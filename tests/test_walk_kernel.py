"""Fused graph-walk kernel (ops/walk_kernel.py) vs the XLA packed beam.

Interpret-mode equivalence: the kernel must reproduce
``beam_search_packed``'s traversal (same expanded-flag wavefront, same
tie-breaks, same dedup) element-for-element on valid graphs — both
paths compute the identical f32 dequant diff-square distances, so the
final beams match exactly, not just statistically.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from instant_distance_tpu.ops import packed as pk
from instant_distance_tpu.ops.walk_kernel import (pack_walk_fused,
                                                  pack_walk_meta,
                                                  walk_search)


def _mk_graph(rng, n, d, k):
    """Random points + random valid adjacency (unique ids per row,
    -1-terminated prefixes) in packed form."""
    pts = rng.standard_normal((n, d)).astype(np.float32)
    adj = np.full((n, k), -1, np.int32)
    for i in range(n):
        deg = rng.integers(1, k + 1)
        others = np.setdiff1d(rng.permutation(n)[:deg + 1], [i])[:deg]
        adj[i, :len(others)] = np.sort(others)
    codes, scales = pk.quantize_points(jnp.asarray(pts))
    _, pcodes, pscales = pk.pack_layer(jnp.asarray(adj), codes, scales)
    return pts, jnp.asarray(adj), pcodes, pscales


def _seed_beams(rng, pts, queries, n, ef, n_seed):
    sd, sp = pk.seed_entry(jnp.asarray(queries),
                           jnp.asarray(pts[:n_seed], jnp.bfloat16),
                           min(ef, n_seed))
    b = queries.shape[0]
    bd = jnp.full((b, ef), jnp.inf, jnp.float32)
    bp = jnp.full((b, ef), -1, jnp.int32)
    bd = bd.at[:, :sd.shape[1]].set(sd)
    bp = bp.at[:, :sp.shape[1]].set(sp)
    return bd, bp


@pytest.mark.parametrize("expand", [1, 2])
@pytest.mark.parametrize("merge", ["count", "extract"])
def test_walk_kernel_matches_xla_beam(expand, merge):
    rng = np.random.default_rng(7)
    n, d, k, ef, b = 300, 32, 8, 12, 16
    pts, adj, pcodes, pscales = _mk_graph(rng, n, d, k)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    bd0, bp0 = _seed_beams(rng, pts, queries, n, ef, n_seed=64)

    ids = jnp.asarray(adj)
    xd, xp = pk.beam_search_packed(
        jnp.asarray(queries), ids, pcodes, pscales,
        bd0, bp0, jnp.zeros((b, ef), bool),
        max_iters=8 * ef + 16, expand=expand)

    meta, kp = pack_walk_meta(np.asarray(ids), np.asarray(pscales))
    kd, kpids = walk_search(
        jnp.asarray(queries), bd0, bp0, pcodes, jnp.asarray(meta),
        kp=kp, expand=expand, ef=ef, max_iters=8 * ef + 16, bq=8,
        interpret=True, merge=merge)

    np.testing.assert_array_equal(np.asarray(xp), np.asarray(kpids))
    np.testing.assert_allclose(np.asarray(xd), np.asarray(kd),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("expand", [1, 2])
def test_walk_kernel_fused_rows_matches_xla_beam(expand):
    """Fused-row layout (metadata byte-planes inline, one DMA per
    expansion) must reproduce the XLA beam exactly too — covers the
    byte-plane int32/f32 reconstruction arithmetic."""
    rng = np.random.default_rng(11)
    n, d, k, ef, b = 200, 128, 8, 12, 16
    pts, adj, pcodes, pscales = _mk_graph(rng, n, d, k)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    bd0, bp0 = _seed_beams(rng, pts, queries, n, ef, n_seed=64)

    ids = jnp.asarray(adj)
    xd, xp = pk.beam_search_packed(
        jnp.asarray(queries), ids, pcodes, pscales,
        bd0, bp0, jnp.zeros((b, ef), bool),
        max_iters=8 * ef + 16, expand=expand)

    frow = pack_walk_fused(np.asarray(ids), np.asarray(pscales),
                           np.asarray(pcodes))
    kd, kpids = walk_search(
        jnp.asarray(queries), bd0, bp0, jnp.asarray(frow),
        jnp.zeros((1, 128), jnp.int32),
        kp=64, expand=expand, ef=ef, max_iters=8 * ef + 16, bq=8,
        interpret=True, fused_rows=True, k=k)

    np.testing.assert_array_equal(np.asarray(xp), np.asarray(kpids))
    np.testing.assert_allclose(np.asarray(xd), np.asarray(kd),
                               rtol=1e-6, atol=1e-6)


def test_walk_kernel_empty_start_is_noop():
    """A query whose initial beam is empty must come back unchanged."""
    rng = np.random.default_rng(3)
    n, d, k, ef, b = 100, 16, 4, 8, 8
    pts, adj, pcodes, pscales = _mk_graph(rng, n, d, k)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    bd0 = jnp.full((b, ef), jnp.inf, jnp.float32)
    bp0 = jnp.full((b, ef), -1, jnp.int32)
    meta, kp = pack_walk_meta(np.asarray(adj), np.asarray(pscales))
    kd, kpids = walk_search(
        jnp.asarray(queries), bd0, bp0, pcodes, jnp.asarray(meta),
        kp=kp, expand=2, ef=ef, max_iters=32, bq=8, interpret=True)
    assert np.all(np.asarray(kpids) == -1)
    assert np.all(np.isinf(np.asarray(kd)))
