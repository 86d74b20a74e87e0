"""Int-epilogue fused scan (bucket_int): recall parity with the
per-point-scale bucket kernel.

The shared-scale variant trades per-point int8 resolution for a
one-int-subtract epilogue (ops/scan_kernel.py:_bucket_scan_int_kernel);
the exact f32 rerank must absorb the difference.  Runs the Pallas
kernel in interpreter mode on CPU (same code path the TPU compiles).
"""

import numpy as np
import pytest

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.models.scan import ScanIndex


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(59)
    centers = rng.random((32, 32), dtype=np.float32)
    pts = (centers[rng.integers(0, 32, 8192)]
           + 0.05 * rng.standard_normal((8192, 32)).astype(np.float32))
    queries = (centers[rng.integers(0, 32, 64)]
               + 0.05 * rng.standard_normal((64, 32)).astype(np.float32))
    gt = np.asarray(BruteForce(pts).search_batch(queries, 10)[1])
    return pts.astype(np.float32), queries.astype(np.float32), gt


def _recall(p, gt):
    got = np.asarray(p)
    return float(np.mean([
        len(set(got[i].tolist()) & set(gt[i].tolist())) / 10
        for i in range(len(got))]))


KW = dict(k=10, ef=32, qb=8, cb=512, lsub=4)


def test_bucket_int_recall_matches_bucket(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p_f32 = scan.search_batch(queries, fused="bucket", **KW)
    _, p_int = scan.search_batch(queries, fused="bucket_int", **KW)
    r_f32, r_int = _recall(p_f32, gt), _recall(p_int, gt)
    assert r_f32 >= 0.95
    assert r_int >= r_f32 - 0.02, f"int {r_int} vs f32 {r_f32}"


def test_bucket_int_respects_filter(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    mask = np.zeros(len(pts), bool)
    mask[: len(pts) // 2] = True
    _, p = scan.search_batch(queries, filter_mask=mask,
                             fused="bucket_int", **KW)
    got = np.asarray(p)
    assert (got[got >= 0] < len(pts) // 2).all()


def test_bucket_pack_recall_matches_bucket(data):
    """Packed-key variant: ids reconstructed from the key's slab bits +
    output position must match the tracked-argmin kernel's quality."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p_f32 = scan.search_batch(queries, fused="bucket", **KW)
    _, p_pack = scan.search_batch(queries, fused="bucket_pack", **KW)
    r_f32, r_pack = _recall(p_f32, gt), _recall(p_pack, gt)
    assert r_f32 >= 0.95
    assert r_pack >= r_f32 - 0.02, f"pack {r_pack} vs f32 {r_f32}"


def test_bucket_pack_ids_match_bucket_int(data):
    """Same shared-scale ranking, two id recovery schemes: the winning
    ids must agree (up to exact rank ties) with the int kernel's."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p_int = scan.search_batch(queries, fused="bucket_int", **KW)
    _, p_pack = scan.search_batch(queries, fused="bucket_pack", **KW)
    a, b = np.asarray(p_int), np.asarray(p_pack)
    agree = np.mean([len(set(a[i]) & set(b[i])) / a.shape[1]
                     for i in range(len(a))])
    assert agree >= 0.95, f"id agreement {agree}"


def test_bucket_pack_respects_filter(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    mask = np.zeros(len(pts), bool)
    mask[: len(pts) // 2] = True
    _, p = scan.search_batch(queries, filter_mask=mask,
                             fused="bucket_pack", **KW)
    got = np.asarray(p)
    assert (got[got >= 0] < len(pts) // 2).all()


def test_bucket_pack_overflow_guard_falls_back(data):
    """D*lsub > 16384 would overflow packed keys: the kernel wrapper
    must reject it, and search_batch must silently route the request to
    bucket_int instead of returning garbage."""
    import jax.numpy as jnp

    from instant_distance_tpu.ops.scan_kernel import \
        fused_scan_bucket_int_packed

    with pytest.raises(ValueError, match="overflow"):
        fused_scan_bucket_int_packed(
            jnp.zeros((8, 32), jnp.int8), jnp.zeros((1, 2048), jnp.int32),
            jnp.zeros((32, 2048), jnp.int8), lsub=1024, qb=8, cb=2048,
            interpret=True)

    # search_batch path: same request must not raise (bucket_int
    # fallback) and must return well-formed ids
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p = scan.search_batch(queries, k=10, ef=32, qb=8, cb=2048,
                             lsub=1024, fused="bucket_pack")
    got = np.asarray(p)
    # lsub=1024 leaves only N/1024=8 stride groups, so at most 8 results
    assert got.shape[0] == len(queries) and got.shape[1] <= 10
    assert (got < len(pts)).all()


def test_bucket_int_norerank_values_in_metric_units(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    d, p = scan.search_batch(queries, rerank=False, fused="bucket_int",
                             **KW)
    de, pe = scan.search_batch(queries, rerank=True, fused="bucket_int",
                               **KW)
    d, de = np.asarray(d), np.asarray(de)
    ok = np.isfinite(d[:, 0])
    # quantized approximation of the same metric: the shared-scale int8
    # codes carry ~0.4%/component noise, a few percent on a 32-d
    # squared distance — same units, not an ordering-only surrogate
    rel = np.abs(d[ok, 0] - de[ok, 0]) / np.maximum(de[ok, 0], 1e-6)
    assert np.median(rel) < 0.15


def test_slab_kernel_bit_identical():
    """The slab-loop body (per-slab matmuls, min accumulated in
    registers — built to kill the VMEM re-read of the materialized dot
    tile measured at ~46% of cell time) must produce byte-identical
    keys to the materialize-then-chain body."""
    import jax.numpy as jnp

    from instant_distance_tpu.ops.scan_kernel import \
        fused_scan_bucket_int_packed

    rng = np.random.default_rng(11)
    qc = jnp.asarray(rng.integers(-127, 128, (16, 16), dtype=np.int8))
    codes_t = jnp.asarray(rng.integers(-127, 128, (16, 256),
                                       dtype=np.int8))
    w2 = jnp.asarray(rng.integers(0, 1 << 24, (1, 256), dtype=np.int32))
    for inner in (1, 2):
        kw = dict(lsub=4, qb=8, cb=32, inner=inner, interpret=True)
        want = fused_scan_bucket_int_packed(qc, w2, codes_t, slab=False,
                                            **kw)
        got = fused_scan_bucket_int_packed(qc, w2, codes_t, slab=True,
                                           **kw)
        assert np.array_equal(np.asarray(want), np.asarray(got))


def test_pack_w2_bias_keeps_keys_normal_and_bitcast_monotone():
    """pack_w2's 127^2*D rank bias + 2^23 offset guarantee every
    emitted key lands in [2^23, PACK_THRESH), so the f32 BITCAST of the
    key array is a NORMAL float (approx_min_k flushes denormals to
    zero — keys below 2^23 would scramble the selection) and
    order-preserving (the contract the approx_min_k consumers rely on
    to skip the converted copy)."""
    import jax
    import jax.numpy as jnp

    from instant_distance_tpu.ops.scan_kernel import (
        PACK_OFFSET, PACK_THRESH, fused_scan_bucket_int_packed, pack_w2)

    rng = np.random.default_rng(7)
    d, n, lsub, cb = 16, 256, 4, 32
    # worst case: zero norms (w=0) against maximally-aligned codes
    pts = rng.standard_normal((n, d)).astype(np.float32)
    norms = jnp.asarray(np.sum(pts * pts, 1, dtype=np.float32))[None, :]
    w2 = pack_w2(norms, jnp.float32(1.0), None, lsub=lsub, cb=cb, d=d)
    qc = jnp.full((8, d), 127, jnp.int8)
    codes_t = jnp.full((d, n), -127, jnp.int8)  # dot = -127^2*d (max key)
    hi = fused_scan_bucket_int_packed(qc, w2, codes_t, lsub=lsub, qb=8,
                                      cb=cb, interpret=True)
    codes_t = jnp.full((d, n), 127, jnp.int8)   # dot = +127^2*d (min key)
    w0 = pack_w2(jnp.zeros_like(norms), jnp.float32(1.0), None,
                 lsub=lsub, cb=cb, d=d)
    lo = fused_scan_bucket_int_packed(qc, w0, codes_t, lsub=lsub, qb=8,
                                      cb=cb, interpret=True)
    keys = np.concatenate([np.asarray(hi).ravel(), np.asarray(lo).ravel()])
    assert (keys >= PACK_OFFSET).all()   # normal-float bitcast range
    assert keys.max() < PACK_THRESH
    # bitcast order == integer order on the emitted keys
    asf = np.asarray(jax.lax.bitcast_convert_type(jnp.asarray(keys),
                                                  jnp.float32))
    assert (np.argsort(asf, kind="stable")
            == np.argsort(keys, kind="stable")).all()


def test_probe_full_matches_production_kernel():
    """The roofline-attribution probe at probe="full" runs the exact
    production packed-key epilogue; its output must be bit-identical
    to fused_scan_bucket_int_packed on the same operands (the "mm" and
    "min" probes are timing-only truncations with meaningless
    content)."""
    import jax.numpy as jnp

    from instant_distance_tpu.ops.scan_kernel import (
        fused_scan_bucket_int_packed, fused_scan_probe)

    rng = np.random.default_rng(5)
    qc = jnp.asarray(rng.integers(-127, 128, (8, 16), dtype=np.int8))
    codes_t = jnp.asarray(rng.integers(-127, 128, (16, 64),
                                       dtype=np.int8))
    w2 = jnp.asarray(rng.integers(0, 1 << 20, (1, 64), dtype=np.int32))
    kw = dict(lsub=4, qb=8, cb=32, interpret=True)
    want = fused_scan_bucket_int_packed(qc, w2, codes_t, **kw)
    got = fused_scan_probe(qc, w2, codes_t, probe="full", **kw)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    for probe in ("mm", "min"):  # truncated probes must at least run
        out = fused_scan_probe(qc, w2, codes_t, probe=probe, **kw)
        assert np.asarray(out).shape == np.asarray(want).shape


def test_sel_group_recall_matches_full_selection(data):
    """Grouped-min pre-selection (sel_group) trades the full-width
    approx_min_k for a bandwidth-bound column-group min; candidates are
    the top-ef distinct-group columns, so recall must track the full
    selection closely (an id-decode bug would crater it instead)."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p_full = scan.search_batch(queries, fused="bucket_pack", **KW)
    _, p_grp = scan.search_batch(queries, fused="bucket_pack",
                                 sel_group=8, **KW)
    r_full, r_grp = _recall(p_full, gt), _recall(p_grp, gt)
    assert r_full >= 0.95
    assert r_grp >= r_full - 0.02, f"grouped {r_grp} vs full {r_full}"


def test_sel_group_respects_filter(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    mask = np.zeros(len(pts), bool)
    mask[: len(pts) // 2] = True
    _, p = scan.search_batch(queries, filter_mask=mask,
                             fused="bucket_pack", sel_group=8, **KW)
    got = np.asarray(p)
    assert (got[got >= 0] < len(pts) // 2).all()


def test_sel_kgroup_recall_matches_full_selection(data):
    """In-kernel grouped-min selection (sel_kgroup): the kernel emits a
    second g-fold-smaller min array and the XLA side gathers only
    winner groups — an og-layout/decode bug would crater recall."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    _, p_full = scan.search_batch(queries, fused="bucket_pack", **KW)
    for g in (2, 8):
        _, p_kg = scan.search_batch(queries, fused="bucket_pack",
                                    sel_kgroup=g, **KW)
        r_full, r_kg = _recall(p_full, gt), _recall(p_kg, gt)
        assert r_full >= 0.95
        assert r_kg >= r_full - 0.02, f"kgroup{g} {r_kg} vs {r_full}"


def test_sel_kgroup_slab_body_matches(data):
    """The slab-loop kernel body must emit identical group minima."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    d1, p1 = scan.search_batch(queries, fused="bucket_pack",
                               sel_kgroup=4, **KW)
    d2, p2 = scan.search_batch(queries, fused="bucket_pack",
                               sel_kgroup=4, slab=True, **KW)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_sel_kgroup_respects_filter(data):
    pts, queries, gt = data
    scan = ScanIndex(pts)
    mask = np.zeros(len(pts), bool)
    mask[: len(pts) // 2] = True
    _, p = scan.search_batch(queries, filter_mask=mask,
                             fused="bucket_pack", sel_kgroup=8, **KW)
    got = np.asarray(p)
    assert (got[got >= 0] < len(pts) // 2).all()


def test_sel_group_falls_back_when_too_coarse(data):
    """ef exceeding the group count must silently fall back to the
    full-width selection rather than truncating the beam."""
    pts, queries, gt = data
    scan = ScanIndex(pts)
    # 2048 columns / 512-wide groups = 4 groups < ef=32 -> fallback
    _, p = scan.search_batch(queries, fused="bucket_pack",
                             sel_group=512, **KW)
    assert _recall(p, gt) >= 0.95
