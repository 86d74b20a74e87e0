"""Batched distance kernels — the TPU equivalent of the reference's metric.

The reference has two metric implementations: the ``Point`` trait hook
(instant-distance/src/lib.rs:780-782) and the hand-written AVX2/FMA squared
Euclidean kernel in the Python binding (instant-distance-py
src/lib.rs:378-420).  On TPU the same math runs as *batched* array ops:

* ``pairwise``   — [B, D] x [N, D] -> [B, N] via one MXU matmul
                   (dist^2 = |p|^2 - 2 q.p + |q|^2) or a vmapped custom metric.
* ``gathered``   — [B, D] x [B, K, D] -> [B, K] for adjacency-gathered
                   candidate rows inside the beam-search loop (VPU).

A ``Metric`` is either one of the registered names below or any JAX-traceable
callable ``f(a[D], b[D]) -> scalar`` (the ``Point`` trait equivalent).
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

MetricLike = Union[str, Callable]


def _f32(x):
    """Upcast storage dtypes (bfloat16 point arrays) to f32 at the
    metric boundary: distances are always evaluated in full f32 — the
    MXU's bf16 input rounding corrupts near-neighbor ordering (see
    ``Metric.pairwise``), and VPU diff-square in bf16 is no cheaper."""
    x = jnp.asarray(x)
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def _sqeuclidean(a, b):
    d = a - b
    return jnp.sum(d * d, axis=-1)


def _euclidean(a, b):
    return jnp.sqrt(_sqeuclidean(a, b))


def _neg_dot(a, b):
    # Larger dot product = closer; negate so "smaller is nearer" holds.
    return -jnp.sum(a * b, axis=-1)


def _cosine(a, b):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-30)
    return 1.0 - jnp.sum(an * bn, axis=-1)


# Elementwise (broadcasting) metric implementations: f(a[..., D], b[..., D])
# -> [...].  All are written to broadcast, so gathered/pairwise forms fall
# out of the same function.
METRICS: dict[str, Callable] = {
    "sqeuclidean": _sqeuclidean,
    "euclidean": _euclidean,
    "dot": _neg_dot,
    "cosine": _cosine,
}


class Metric:
    """Resolved metric with batched evaluation forms.

    ``matmul_form`` is True for (sq)euclidean, where the pairwise form can run
    as a single MXU matmul with precomputed squared norms instead of
    materializing [B, N, D] differences.
    """

    def __init__(self, metric: MetricLike):
        if isinstance(metric, Metric):
            metric = metric.name if metric.name in METRICS else metric.fn
        if callable(metric):
            self.name = getattr(metric, "__name__", "custom")
            self.fn = metric
            self._broadcasts = False
        else:
            if metric not in METRICS:
                raise ValueError(
                    f"unknown metric {metric!r}; known: {sorted(METRICS)}")
            self.name = metric
            self.fn = METRICS[metric]
            self._broadcasts = True
        self.matmul_form = self.name in ("sqeuclidean", "euclidean")

    # -- single pair -------------------------------------------------------
    def one(self, a, b):
        return self.fn(_f32(a), _f32(b))

    # -- gathered candidates: q [B, D] vs p [B, K, D] -> [B, K] ------------
    def gathered(self, q, p):
        q, p = _f32(q), _f32(p)
        if self._broadcasts:
            return self.fn(q[:, None, :], p)
        f = jax.vmap(jax.vmap(self.fn, in_axes=(None, 0)), in_axes=(0, 0))
        return f(q, p)

    # -- all pairs: q [B, D] vs p [N, D] -> [B, N] -------------------------
    def pairwise(self, q, p):
        q, p = _f32(q), _f32(p)
        if self.matmul_form:
            qn = jnp.sum(q * q, axis=-1)  # [B]
            pn = jnp.sum(p * p, axis=-1)  # [N]
            # HIGHEST precision: the TPU MXU's default bf16 input rounding
            # produces |p|^2-scale absolute errors that swamp near-neighbor
            # distance differences on clustered data (exact-ranking ground
            # truth and neighbor selection both need full f32).
            cross = jax.lax.dot_general(
                q, p,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, N]
            d2 = qn[:, None] - 2.0 * cross + pn[None, :]
            d2 = jnp.maximum(d2, 0.0)  # clamp catastrophic cancellation
            return jnp.sqrt(d2) if self.name == "euclidean" else d2
        if self._broadcasts:
            return self.fn(q[:, None, :], p[None, :, :])
        f = jax.vmap(jax.vmap(self.fn, in_axes=(None, 0)), in_axes=(0, None))
        return f(q, p)

    # -- pairwise among gathered sets: p [B, C, D] -> [B, C, C] ------------
    def self_pairwise(self, p, out_dtype=None):
        """``out_dtype=bfloat16`` halves the HBM traffic of the [B, C, C]
        result — used by Alg. 4 selection, whose keep/block comparisons
        tolerate bf16 resolution (query-ranking distances do NOT: they
        stay f32/HIGHEST, see ``pairwise``)."""
        p = _f32(p)
        if self.matmul_form:
            n = jnp.sum(p * p, axis=-1)  # [B, C]
            cross = jnp.einsum(
                "bid,bjd->bij", p, p, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.maximum(n[:, :, None] - 2.0 * cross + n[:, None, :], 0.0)
            d2 = jnp.sqrt(d2) if self.name == "euclidean" else d2
        elif self._broadcasts:
            d2 = self.fn(p[:, :, None, :], p[:, None, :, :])
        else:
            f = jax.vmap(jax.vmap(jax.vmap(self.fn, in_axes=(None, 0)),
                                  in_axes=(0, None)))
            d2 = f(p, p)
        return d2 if out_dtype is None else d2.astype(out_dtype)


def resolve(metric: MetricLike) -> Metric:
    return metric if isinstance(metric, Metric) else Metric(metric)
