"""Pallas fused-scan kernel: int8 MXU scoring + in-VMEM top-T selection.

The pure-XLA quantized scan (models/scan.py) is HBM-traffic-bound: the
[B, chunk] f32 score matrix is written by the matmul and re-read by the
top-k — at SIFT1M/B=8k that is ~64 GB of score traffic per batch, ~4x
the time of the matmul itself.  XLA cannot fuse a top-k (or even a
strided min+argmin — measured 20x *slower* due to lane-splitting
relayouts) into the GEMM epilogue.  This kernel does exactly that fuse:

  grid cell (ic, iq) = (point block of CB, query block of QB)
    1. scores = qc[QB, D] . codes_t[D, CB]  (int8 x int8 -> int32, MXU)
    2. dist   = |p|^2 - 2 * qs * s * scores           (VPU epilogue)
    3. strided tile-min: dist[QB, CB] -> m[QB, CB/L] keeping argmin ids
       (L contiguous [QB, CB/L] slabs elementwise-min'd -- no relayout)
    4. iterative top-T extraction over m -> (dists [QB, T], ids [QB, T])

Only [B, N/CB, T] candidate tuples ever leave VMEM — a ~CB/T (500x)
reduction in HBM traffic.  The final global top-ef merge + exact rerank
runs in XLA on that small array.

Recall loss vs the exact scan: a true neighbor is lost only if it
shares a stride-group with a better one (P ~ k*L/CB per pair) or if
more than T of the true top-k fall in one CB-block (negligible for
random id order; callers should not feed cluster-sorted ids with tiny
T).  Measured at SIFT1M shapes: recall@10 >= 0.999 with T=8, L=16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32MAX = np.iinfo(np.int32).max


def _bucket_scan_kernel(qc_ref, qs_ref, codes_ref, sc_ref, no_ref,
                        od_ref, oi_ref, *, lsub: int, cb: int,
                        inner: int, is_dot: bool):
    """Bucket-min variant: no in-kernel top-T extraction.

    The top-T loop in ``_fused_scan_kernel`` costs ``topt`` cross-lane
    min-reductions plus full-width wheres per grid cell — measured to
    dominate the cell time (the matmul itself is ~1 us).  Here the cell
    emits ALL ``cb/lsub`` stride-group minima (values + argmin ids);
    every VPU op stays lane-local elementwise, and the global top-ef
    runs once in XLA over the (lsub x smaller) candidate array.

    ``inner`` sub-chunks per cell amortize the measured ~30 us fixed
    per-grid-cell cost: one cell loads codes for ``inner * cb`` points
    and loops, keeping only one [qb, cb] distance tile live in VMEM.
    """
    qs = qs_ref[:]                                         # [QB, 1]
    qb = qs.shape[0]
    ct = cb // lsub
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, ct), 1)
    for j in range(inner):
        sl = slice(j * cb, (j + 1) * cb)
        dot = jax.lax.dot_general(
            qc_ref[:], codes_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # [QB, CB]
        prod = (qs * sc_ref[:, sl]) * dot.astype(jnp.float32)
        # is_dot: norms carries an eligibility BIAS (0 eligible, +inf
        # ineligible/padded) instead of |p|^2 — dist = bias - q.p; the
        # caller folds 1/|p| into scales/qs for cosine.
        dist = (no_ref[:, sl] - prod if is_dot
                else no_ref[:, sl] - 2.0 * prod)
        # strided group-min: groups are {g, ct+g, 2ct+g, ...} —
        # contiguous [QB, ct] slabs, elementwise min, zero relayout
        m = dist[:, :ct]
        am = jnp.zeros((qb, ct), jnp.int32)
        for t in range(1, lsub):
            blk = dist[:, t * ct:(t + 1) * ct]
            upd = blk < m
            am = jnp.where(upd, t, am)
            m = jnp.minimum(m, blk)
        base = (pl.program_id(0) * inner + j) * cb
        od_ref[:, j * ct:(j + 1) * ct] = m
        oi_ref[:, j * ct:(j + 1) * ct] = jnp.where(
            jnp.isfinite(m), base + am * ct + col, -1)


@functools.partial(
    jax.jit, static_argnames=("lsub", "qb", "cb", "inner", "is_dot",
                              "interpret"))
def fused_scan_bucket(qc, qs, codes_t, scales, norms, *, lsub: int = 16,
                      qb: int = 256, cb: int = 4096, inner: int = 1,
                      is_dot: bool = False, interpret: bool = False):
    """Fused scan, bucket-min form: returns per-stride-group minima.

    Same arguments as :func:`fused_scan_topt`; returns
    ``(dists [B, N/lsub], ids [B, N/lsub])`` laid out block-major along
    the candidate axis (no transpose needed — the out spec writes
    [B, nc*ct] directly).  A true neighbor is lost only when a nearer
    point shares its lsub-wide stride group (P ~ k*lsub/cb per pair).
    ``inner`` sub-chunks per grid cell cut fixed per-cell overhead;
    N must divide by cb*inner and cb/lsub must be a lane multiple
    (128) for the output tiling.
    """
    b, d = qc.shape
    n = codes_t.shape[1]
    cbo = cb * inner
    ct = cb // lsub
    assert b % qb == 0 and n % cbo == 0 and cb % lsub == 0
    if not interpret and ct % 128 != 0:
        raise ValueError(
            f"cb/lsub = {ct} must be a multiple of 128 lanes")
    nc = n // cbo
    grid = (nc, b // qb)  # query blocks innermost: codes block is reused

    kernel = functools.partial(_bucket_scan_kernel, lsub=lsub, cb=cb,
                               inner=inner, is_dot=is_dot)
    od, oi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.float32),
            jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.int32),
        ],
        # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
        # the fatter (qb, cb, inner) tilings that amortize per-cell cost
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qc, qs, codes_t, scales, norms)
    return od, oi


def _bucket_scan_int_kernel(qc_ref, w_ref, codes_ref, od_ref, oi_ref, *,
                            lsub: int, cb: int, inner: int):
    """Int-epilogue bucket variant (shared scales).

    With ONE point scale s and ONE query scale qs for the whole
    call, squared-L2 ranking collapses to integers:

        dist_ij = |p_j|^2 - 2 qs s (q_i . c_j)  ~  rank_ij = W_j - dot_ij
        with W_j = round(|p_j|^2 / (2 qs s))  (precomputed, int32)

    so the per-element epilogue is ONE int32 subtract instead of the
    f32 convert + two multiplies + subtract of ``_bucket_scan_kernel``
    — the VPU epilogue is what keeps that kernel at ~2x its roofline
    (docs/performance.md).  The group-min loop runs on int32.  Shared
    scales cost quantization resolution on points/queries far from the
    max norm; the caller's exact f32 rerank repairs ordering, so end
    recall matches the per-point-scale kernel at SIFT1M shapes (see
    tests/test_scan_int.py).  Ineligible/padded points carry
    W_j = INT32_MAX/2 (bigger than any real rank).
    """
    qb = qc_ref.shape[0]
    ct = cb // lsub
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, ct), 1)
    big = jnp.int32(_I32MAX // 2)
    for j in range(inner):
        sl = slice(j * cb, (j + 1) * cb)
        dot = jax.lax.dot_general(
            qc_ref[:], codes_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # [QB, CB]
        rank = w_ref[:, sl] - dot                          # ONE int sub
        m = rank[:, :ct]
        am = jnp.zeros((qb, ct), jnp.int32)
        for t in range(1, lsub):
            blk = rank[:, t * ct:(t + 1) * ct]
            upd = blk < m
            am = jnp.where(upd, t, am)
            m = jnp.minimum(m, blk)
        base = (pl.program_id(0) * inner + j) * cb
        od_ref[:, j * ct:(j + 1) * ct] = m
        oi_ref[:, j * ct:(j + 1) * ct] = jnp.where(
            m < big // 2, base + am * ct + col, -1)


@functools.partial(
    jax.jit, static_argnames=("lsub", "qb", "cb", "inner", "interpret"))
def fused_scan_bucket_int(qc, w, codes_t, *, lsub: int = 32,
                          qb: int = 512, cb: int = 4096, inner: int = 1,
                          interpret: bool = False):
    """Int-epilogue fused scan (see ``_bucket_scan_int_kernel``).

    Args:
      qc:      [B, D] int8 query codes, ONE shared scale qs.
      w:       [1, N] int32: round(|p_hat_j|^2 / (2 qs s)), with
               INT32_MAX/2 marking ineligible/padded points.  One row
               serves every query because qs is shared — that is the
               point of the variant.
      codes_t: [D, N] int8 point codes, ONE shared scale s.
    Returns (rank [B, N/lsub] int32, ids [B, N/lsub]) block-major like
    :func:`fused_scan_bucket`; rank values are monotone in squared-L2
    per query row (rank = W - dot, both from the shared-scale space).
    """
    b, d = qc.shape
    n = codes_t.shape[1]
    cbo = cb * inner
    ct = cb // lsub
    assert b % qb == 0 and n % cbo == 0 and cb % lsub == 0
    if not interpret and ct % 128 != 0:
        raise ValueError(f"cb/lsub = {ct} must be a multiple of 128")
    nc = n // cbo
    grid = (nc, b // qb)

    kernel = functools.partial(_bucket_scan_int_kernel, lsub=lsub, cb=cb,
                               inner=inner)
    od, oi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.int32),
            jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qc, w, codes_t)
    return od, oi


#: Packed-key constants (``fused_scan_bucket_int_packed``).  The packed
#: weights carry a +127^2*D rank bias and a +2^23 offset (see
#: :func:`pack_w2`) so every emitted key lands in [2^23, 2^31):
#: positive int32 in that range bitcast to f32 are NORMAL floats whose
#: order equals integer order, which lets consumers run
#: ``approx_min_k`` directly on the (free) bitcast of the key array
#: instead of materializing an f32 convert of the full [B, N/lsub]
#: array (a ~1 GB HBM pass per 8k batch at 1M points).  Keys below
#: 2^23 would bitcast to denormals, which approx_min_k's reduction
#: flushes to zero — scrambling the selection entirely.  Bounds, given
#: the wrapper's D*lsub <= 16384 guard (so |dot|*lsub <= 127^2*16384
#: < 2^28) and the callers' w <= 2^29/lsub - 1 clamp:
#:   real key      in [2^23, 2^29 + 2*2^28 + 2^23)    <  9*2^27
#:   ineligible    in [3*2^29 - 2^28, 3*2^29 + 2^28 + 2^23]  > 9*2^27
PACK_INELIGIBLE = 3 << 29
PACK_THRESH = 9 << 27
PACK_OFFSET = 1 << 23


def pack_w2(norms_row, denom, eligible_row, *, lsub: int, cb: int,
            d: int):
    """Build the packed-weight operand for the packed-key kernels.

    Args:
      norms_row:    [1, N] f32 squared norms of the dequantized points
                    (non-finite marks padding).
      denom:        scalar f32, ``2 * qs * s`` (shared query x point
                    quantization scales).
      eligible_row: [1, N] bool, or None — extra eligibility mask
                    (filters / prefix bounds) beyond finite norms.
      lsub, cb, d:  kernel stride-group width, point-block size, dim.
    Returns [1, N] int32:
      ``(clamp(round(norms/denom), 0, 2^29/lsub - 1) + 127^2*d) * lsub
      + slab(col) + 2^23`` for eligible points, else PACK_INELIGIBLE.
    The 127^2*d bias keeps ``key = w2 - dot*lsub`` non-negative for
    every possible int8 dot and the 2^23 offset lifts it into the
    normal-float bitcast range (see PACK_OFFSET; 2^23 is a multiple of
    lsub so the slab bits are untouched); rank decode is
    ``(key >> log2(lsub)) - 2^23/lsub - 127^2*d``.
    """
    bias = 127 * 127 * d
    wclamp = (1 << 29) // lsub - 1
    fin = jnp.isfinite(norms_row)
    w = jnp.where(fin, jnp.clip(jnp.round(norms_row / denom), 0, wclamp),
                  0).astype(jnp.int32)
    ct = cb // lsub
    col = jax.lax.broadcasted_iota(jnp.int32, norms_row.shape, 1)
    w2 = (w + bias) * lsub + (col % cb) // ct + PACK_OFFSET
    ok = fin if eligible_row is None else (fin & eligible_row)
    return jnp.where(ok, w2, PACK_INELIGIBLE)


def _bucket_scan_int_packed_kernel(qc_ref, w2_ref, codes_ref, od_ref,
                                   *rest, lsub: int, cb: int, inner: int,
                                   groups: int = 0):
    """Packed-key bucket variant: the minimal VPU epilogue.

    ``_bucket_scan_int_kernel`` spends 4 VPU ops per score element
    (subtract + compare + select + min — the argmin tracking is half of
    it) and writes TWO [qb, ct] outputs per block.  Packing the
    stride-slab index into the rank's low bits removes the tracking:

        key[col] = w2[col] - dot[col] * lsub
        w2[col]  = clamp(W[col]) * lsub + slab(col)   (precomputed)

    is monotone in rank = W - dot with ties broken by slab index, so a
    plain min-chain (ONE min per element after the 2-op key) yields
    both the winning rank AND which slab won: the caller reconstructs
    id = block*cb + (key & (lsub-1))*ct + lane from the key and the
    output position alone.  3 VPU ops per element, ONE int32 output —
    epilogue cost -25%, output HBM traffic -50% vs the int kernel.
    """
    ct = cb // lsub
    for j in range(inner):
        sl = slice(j * cb, (j + 1) * cb)
        dot = jax.lax.dot_general(
            qc_ref[:], codes_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # [QB, CB]
        key = w2_ref[:, sl] - dot * lsub
        m = key[:, :ct]
        for t in range(1, lsub):
            m = jnp.minimum(m, key[:, t * ct:(t + 1) * ct])
        od_ref[:, j * ct:(j + 1) * ct] = m
        if groups > 1:
            _emit_group_min(rest[0], m, j, ct, groups)


def _emit_group_min(og_ref, m, j, ct, groups):
    """Second-level strided min over the per-cell key tile.

    The XLA selection epilogue's cost is reading the full [B, N/lsub]
    key array back from HBM (grouped-min pass or approx_min_k input —
    measured ~6.6 ms of a 17 ms batch at 1M x 128).  The keys are
    already in registers here, so a ``groups``-fold second reduction is
    ~1 extra VPU op per ``ct/groups`` elements and shrinks what XLA
    must read by ``groups``x.  Group i holds od columns
    {cell*ct + t*(ct/groups) + i} — strided slabs again, zero relayout.
    """
    ctg = ct // groups
    gm = m[:, :ctg]
    for t in range(1, groups):
        gm = jnp.minimum(gm, m[:, t * ctg:(t + 1) * ctg])
    og_ref[:, j * ctg:(j + 1) * ctg] = gm


def _bucket_scan_int_packed_slab_kernel(qc_ref, w2_ref, codes_ref,
                                        od_ref, *rest, lsub: int,
                                        cb: int, inner: int,
                                        groups: int = 0):
    """Slab-loop form of the packed kernel.

    ``_bucket_scan_int_packed_kernel`` materializes the full [qb, cb]
    int32 dot tile to VMEM and the min-chain re-reads it — the round-3
    probe attribution measured that re-read at ~46% of cell time (the
    1-op/element min stage cost 4.2 ms/batch while the 2-op key compute
    cost 0.3 ms: the chain is VPU-load-bound, not ALU-bound).  Here each
    stride-slab gets its own [qb, ct] matmul and the min accumulates in
    registers, so the dot tile never round-trips VMEM — and slab t+1's
    MXU pass is independent of slab t's VPU epilogue, letting the
    scheduler overlap the two units.
    """
    ct = cb // lsub
    for j in range(inner):
        m = None
        for t in range(lsub):
            sl = slice(j * cb + t * ct, j * cb + (t + 1) * ct)
            dot = jax.lax.dot_general(
                qc_ref[:], codes_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # [QB, ct]
            key = w2_ref[:, sl] - dot * lsub
            m = key if m is None else jnp.minimum(m, key)
        od_ref[:, j * ct:(j + 1) * ct] = m
        if groups > 1:
            _emit_group_min(rest[0], m, j, ct, groups)


@functools.partial(
    jax.jit, static_argnames=("lsub", "qb", "cb", "inner", "slab",
                              "groups", "interpret"))
def fused_scan_bucket_int_packed(qc, w2, codes_t, *, lsub: int = 32,
                                 qb: int = 512, cb: int = 4096,
                                 inner: int = 1, slab: bool = False,
                                 groups: int = 0,
                                 interpret: bool = False):
    """Packed-key int-epilogue fused scan.

    Args:
      qc:      [B, D] int8 query codes, ONE shared scale.
      w2:      [1, N] int32 packed weights, built by :func:`pack_w2`
               (rank-biased so emitted keys are non-negative),
               PACK_INELIGIBLE for ineligible/padded columns.
      codes_t: [D, N] int8 point codes, ONE shared scale.
    Returns ``keys [B, N/lsub]`` int32, block-major, all >= 0.  Decode:
    rank = (key >> log2(lsub)) - 127^2*D (monotone in squared L2),
    slab = key & (lsub-1), id = (col//ct)*cb + slab*ct + col%ct;
    key >= PACK_THRESH marks groups with no eligible point.  Requires
    D * lsub <= 16384 so real and ineligible keys cannot collide (see
    PACK_THRESH) and the bias cannot overflow.
    ``slab=True`` selects the slab-loop kernel body (identical output;
    see ``_bucket_scan_int_packed_slab_kernel``).

    ``groups > 1`` additionally returns ``og [B, N/(lsub*groups)]``, a
    second-level min over ``groups``-wide strided column groups of the
    keys (computed in-kernel while they are still in registers — see
    ``_emit_group_min``).  og's group i covers od columns
    ``cell*ct + t*(ct/groups) + (i % (ct/groups))`` for t in
    [0, groups), where cell = i // (ct/groups) indexes the
    (inner-sub-chunked) kernel tiles and ct = cb // lsub.  The XLA
    selection runs approx_min_k on og and re-gathers only winner
    groups' od columns, never reading the full key array back.
    """
    b, d = qc.shape
    n = codes_t.shape[1]
    cbo = cb * inner
    ct = cb // lsub
    assert b % qb == 0 and n % cbo == 0 and cb % lsub == 0
    if lsub & (lsub - 1):
        raise ValueError(f"lsub must be a power of two, got {lsub}")
    if d * lsub > 16384:
        raise ValueError(
            f"D*lsub = {d * lsub} > 16384: packed keys could overflow "
            "(use fused_scan_bucket_int)")
    if not interpret and ct % 128 != 0:
        raise ValueError(f"cb/lsub = {ct} must be a multiple of 128")
    if groups > 1:
        if groups & (groups - 1) or ct % groups:
            raise ValueError(f"groups must be a power of two dividing "
                             f"cb/lsub = {ct}, got {groups}")
        if not interpret and (ct // groups) % 128 != 0:
            raise ValueError(
                f"cb/(lsub*groups) = {ct // groups} must be a multiple "
                "of 128 lanes")
    nc = n // cbo
    grid = (nc, b // qb)

    body = (_bucket_scan_int_packed_slab_kernel if slab
            else _bucket_scan_int_packed_kernel)
    kernel = functools.partial(body, lsub=lsub, cb=cb, inner=inner,
                               groups=groups)
    out_specs = [
        pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.int32),
    ]
    if groups > 1:
        ctg = ct // groups
        out_specs.append(
            pl.BlockSpec((qb, inner * ctg), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, nc * inner * ctg), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qc, w2, codes_t)
    if groups > 1:
        return out[0], out[1]
    return out[0]


def _probe_kernel(qc_ref, w2_ref, codes_ref, od_ref, *, lsub: int,
                  cb: int, inner: int, probe: str):
    """Roofline-attribution probe (timing only, NOT a search kernel).

    Identical structure to ``_bucket_scan_int_packed_kernel`` with the
    epilogue truncated at three levels, so timing differences attribute
    cell time to each stage:

      probe="mm":   matmul + output write only (0 VPU ops/element —
                    the MXU + HBM floor; w2 may be dead-code-eliminated,
                    which is part of what is being measured)
      probe="min":  matmul + min-chain over the RAW dot (1 VPU
                    op/element; result is semantically meaningless)
      probe="full": the production packed-key epilogue (3 VPU
                    ops/element: mul + sub + min)
    """
    ct = cb // lsub
    for j in range(inner):
        sl = slice(j * cb, (j + 1) * cb)
        dot = jax.lax.dot_general(
            qc_ref[:], codes_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if probe == "mm":
            od_ref[:, j * ct:(j + 1) * ct] = dot[:, :ct]
            continue
        key = dot if probe == "min" else w2_ref[:, sl] - dot * lsub
        m = key[:, :ct]
        for t in range(1, lsub):
            m = jnp.minimum(m, key[:, t * ct:(t + 1) * ct])
        od_ref[:, j * ct:(j + 1) * ct] = m


@functools.partial(
    jax.jit, static_argnames=("lsub", "qb", "cb", "inner", "probe",
                              "interpret"))
def fused_scan_probe(qc, w2, codes_t, *, lsub: int = 64, qb: int = 1024,
                     cb: int = 8192, inner: int = 1, probe: str = "full",
                     interpret: bool = False):
    """Timing probe for roofline attribution (see ``_probe_kernel``).
    Same operands/blocking as :func:`fused_scan_bucket_int_packed`;
    returns one int32 array whose CONTENT is only meaningful for
    probe="full"."""
    b, d = qc.shape
    n = codes_t.shape[1]
    cbo = cb * inner
    ct = cb // lsub
    assert b % qb == 0 and n % cbo == 0 and cb % lsub == 0
    nc = n // cbo
    grid = (nc, b // qb)
    kernel = functools.partial(_probe_kernel, lsub=lsub, cb=cb,
                               inner=inner, probe=probe)
    (od,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cbo), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, inner * ct), lambda ic, iq: (iq, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc * inner * ct), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qc, w2, codes_t)
    return od


def _fused_scan_kernel(qc_ref, qs_ref, codes_ref, sc_ref, no_ref,
                       od_ref, oi_ref, *, lsub: int, topt: int,
                       is_dot: bool):
    # 1. MXU: int8 x int8 -> int32 scores
    dot = jax.lax.dot_general(
        qc_ref[:], codes_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [QB, CB]
    qs = qs_ref[:]                                         # [QB, 1]
    sc = sc_ref[:]                                         # [1, CB]
    prod = (qs * sc) * dot.astype(jnp.float32)
    if is_dot:
        # norms = eligibility bias (0 eligible, +inf ineligible/padded);
        # cosine folds 1/|p| into scales and 1/|q| into qs
        dist = no_ref[:] - prod
    else:
        dist = no_ref[:] - 2.0 * prod                      # [QB, CB]

    qb, cb = dist.shape
    ct = cb // lsub
    # 2. strided tile-min: groups are {j, ct+j, 2ct+j, ...} — contiguous
    #    [QB, ct] slabs so the VPU reduces with zero relayout
    m = dist[:, :ct]
    am = jnp.zeros((qb, ct), jnp.int32)
    for t in range(1, lsub):
        blk = dist[:, t * ct:(t + 1) * ct]
        upd = blk < m
        am = jnp.where(upd, t, am)
        m = jnp.minimum(m, blk)
    ic = pl.program_id(0)
    base = ic * cb
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, ct), 1)
    lid = base + am * ct + col                             # global ids

    # 3. iterative top-T extraction (T tiny: T * O(ct) VPU work);
    #    accumulate the T columns and store once (single wide write)
    out_d, out_i = [], []
    for t in range(topt):
        mv = jnp.min(m, axis=1, keepdims=True)             # [QB, 1]
        tie = jnp.where((m == mv) & jnp.isfinite(mv), lid, _I32MAX)
        mi = jnp.min(tie, axis=1, keepdims=True)           # smallest id
        out_d.append(mv)
        out_i.append(jnp.where(jnp.isfinite(mv), mi, -1))
        m = jnp.where(lid == mi, jnp.inf, m)
    od_ref[0, :, :] = jnp.concatenate(out_d, axis=1)
    oi_ref[0, :, :] = jnp.concatenate(out_i, axis=1)


@functools.partial(
    jax.jit, static_argnames=("lsub", "topt", "qb", "cb", "is_dot",
                              "interpret"))
def fused_scan_topt(qc, qs, codes_t, scales, norms, *, lsub: int = 16,
                    topt: int = 8, qb: int = 256, cb: int = 4096,
                    is_dot: bool = False, interpret: bool = False):
    """Run the fused scan.

    Args:
      qc:      [B, D] int8 query codes (B % qb == 0).
      qs:      [B, 1] f32 query scales (pre-divided by |q| for cosine).
      codes_t: [D, N] int8 point codes, TRANSPOSED (N % cb == 0).
      scales:  [1, N] f32 point scales.
      norms:   [1, N] f32 squared norms of dequantized points, with
               +inf marking ineligible/padded points.  Under
               ``is_dot=True`` it is an eligibility BIAS instead: 0 for
               eligible points, +inf for ineligible/padded (dist =
               bias - q.p; cosine callers fold 1/|p| into ``scales``
               and 1/|q| into ``qs``).
    Returns:
      (dists [B, (N/cb) * topt], ids [B, (N/cb) * topt]) — per-block
      top-T candidates; ids are -1 where a block had fewer eligible
      points.  Merge + rerank in the caller.
    """
    b, d = qc.shape
    n = codes_t.shape[1]
    assert b % qb == 0 and n % cb == 0 and cb % lsub == 0
    nc = n // cb
    grid = (nc, b // qb)  # query blocks innermost: codes block is reused

    kernel = functools.partial(_fused_scan_kernel, lsub=lsub, topt=topt,
                               is_dot=is_dot)
    od, oi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda ic, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cb), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda ic, iq: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, topt), lambda ic, iq: (ic, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, topt), lambda ic, iq: (ic, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, b, topt), jnp.float32),
            jax.ShapeDtypeStruct((nc, b, topt), jnp.int32),
        ],
        interpret=interpret,
    )(qc, qs, codes_t, scales, norms)
    # [nc, B, T] -> [B, nc*T]
    return (od.transpose(1, 0, 2).reshape(b, nc * topt),
            oi.transpose(1, 0, 2).reshape(b, nc * topt))
