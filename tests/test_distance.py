"""Distance kernel unit tests (the AVX2 kernel's TPU equivalent,
reference instant-distance-py/src/lib.rs:378-420)."""

import jax.numpy as jnp
import numpy as np

from instant_distance_tpu.models.brute import BruteForce
from instant_distance_tpu.ops.distance import resolve


def test_pairwise_matches_direct():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((7, 33)).astype(np.float32)
    p = rng.standard_normal((19, 33)).astype(np.float32)
    for name in ["sqeuclidean", "euclidean", "dot", "cosine"]:
        m = resolve(name)
        got = np.asarray(m.pairwise(jnp.asarray(q), jnp.asarray(p)))
        want = np.asarray(m.fn(q[:, None, :], p[None, :, :]))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gathered_and_self_pairwise():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    p = rng.standard_normal((5, 9, 16)).astype(np.float32)
    m = resolve("sqeuclidean")
    got = np.asarray(m.gathered(jnp.asarray(q), jnp.asarray(p)))
    want = ((q[:, None, :] - p) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    sp = np.asarray(m.self_pairwise(jnp.asarray(p)))
    want = ((p[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(sp, want, rtol=1e-4, atol=1e-4)


def test_pairwise_precision_vs_float64():
    """Matmul-form distances must resolve intra-cluster differences.

    Regression test for the TPU MXU default-precision bug: bf16 input
    rounding produced |p|^2-scale errors that corrupted brute-force
    ground truth on clustered data.  The matmul form must match a float64
    reference to near-f32 accuracy on whatever backend runs the suite.
    """
    rng = np.random.default_rng(5)
    center = rng.standard_normal(128).astype(np.float32)
    pts = center + 0.1 * rng.standard_normal((64, 128)).astype(np.float32)
    q = center + 0.1 * rng.standard_normal((8, 128)).astype(np.float32)
    m = resolve("sqeuclidean")
    got = np.asarray(m.pairwise(jnp.asarray(q), jnp.asarray(pts)))
    want = ((q[:, None, :].astype(np.float64)
             - pts[None, :, :].astype(np.float64)) ** 2).sum(-1)
    # intra-cluster d^2 ~ 2.5 with |p|^2 ~ 128: f32 cancellation error is
    # ~1e-4, bf16 input rounding is ~0.5 — the tolerance separates them
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_custom_metric_callable():
    def manhattan(a, b):
        return jnp.sum(jnp.abs(a - b), axis=-1)

    m = resolve(manhattan)
    q = jnp.ones((2, 4))
    p = jnp.zeros((3, 4))
    np.testing.assert_allclose(np.asarray(m.pairwise(q, p)), 4.0)


def test_brute_force_topk():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((500, 12)).astype(np.float32)
    q = rng.standard_normal((9, 12)).astype(np.float32)
    bf = BruteForce(pts, "sqeuclidean", chunk=128)
    d, i = bf.search_batch(q, 10)
    d, i = np.asarray(d), np.asarray(i)
    full = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :10]
    np.testing.assert_allclose(d, want, rtol=1e-4)
    # ids agree with an argsort ground truth
    want_i = np.argsort(full, axis=1)[:, :10]
    assert (i == want_i).mean() > 0.99  # ties may reorder


def test_bruteforce_streaming_equivalence(monkeypatch):
    """The outer-sliced streaming path (tables past OUTER_BYTES) must
    return exactly the one-program path's results (same (dist, id)
    candidate order, including -1 invalid lanes when k > n)."""
    import numpy as np

    from instant_distance_tpu.models.brute import BruteForce

    rng = np.random.default_rng(11)
    pts = rng.random((1000, 8), dtype=np.float32)
    q = rng.random((16, 8), dtype=np.float32)
    ref_d, ref_i = (np.asarray(x) for x in
                    BruteForce(pts, chunk=128).search_batch(q, 10))
    monkeypatch.setattr(BruteForce, "OUTER_BYTES", 8 * 128 * 4)
    sd, si = (np.asarray(x) for x in
              BruteForce(pts, chunk=128).search_batch(q, 10))
    np.testing.assert_array_equal(si, ref_i)
    # slice-offset matmuls reassociate: distances agree to float ulps
    np.testing.assert_allclose(sd, ref_d, rtol=1e-5, atol=1e-6)
