"""Configuration for index construction and search.

TPU-native analogue of the reference's ``Builder`` / ``Heuristic`` /
``Config`` types (reference: instant-distance/src/lib.rs:21-128 and
instant-distance-py/src/lib.rs:216-325).  Field names and defaults match the
reference exactly: ef_search=100, ef_construction=100, ml=1/ln(M),
heuristic on with keep_pruned=True (lib.rs:101-113, 121-128).

TPU-only extras (batching, dtype, mesh) live on the same dataclass but are
clearly separated; they have no effect on the logical graph semantics.
"""

from __future__ import annotations

import dataclasses
import math
import secrets
from typing import Optional

#: The parameter ``M`` from the HNSW paper (reference lib.rs:784-787).
#: Upper layers keep M links per node, the zero layer keeps M * 2.
DEFAULT_M = 32

#: Sentinel for "no neighbor" adjacency slots.  The reference uses
#: PointId(u32::MAX) (types.rs:293); as int32 that is exactly -1, so the two
#: representations are bit-identical and serialization round-trips for free.
INVALID = -1


def resolve_seed(seed: Optional[int]) -> int:
    """Resolve ``Config.seed``: an explicit seed passes through, ``None``
    draws entropy — at BUILD time, not ``Config()`` time (the reference
    seeds ``Builder::default`` from entropy the same way, lib.rs:108).
    Lazy resolution keeps ``Config() == Config()`` true, so default
    configs hash/compare stably and jit-cache keys don't churn."""
    return seed if seed is not None else secrets.randbits(64)


@dataclasses.dataclass(frozen=True)
class Heuristic:
    """Algorithm-4 neighbor-selection knobs (reference lib.rs:115-128)."""

    #: Extend the candidate set with candidate neighbors before selecting
    #: (useful only for extremely clustered data).
    extend_candidates: bool = False
    #: Keep pruned candidates to pad the neighbor set to a constant size.
    keep_pruned: bool = True


@dataclasses.dataclass
class Config:
    """All hyperparameters for building and searching an index.

    Mirrors the reference's Python ``Config`` (instant-distance-py
    src/lib.rs:216-256) plus TPU-native extras.
    """

    # -- reference-parity fields (same names, same defaults) ---------------
    ef_search: int = 100
    ef_construction: int = 100
    ml: float = 1.0 / math.log(DEFAULT_M)
    seed: Optional[int] = None  # None -> entropy, like Builder::default
    heuristic: Optional[Heuristic] = dataclasses.field(default_factory=Heuristic)

    # -- TPU-native extras -------------------------------------------------
    #: Graph degree parameter M; zero layer stores 2*M links.
    m: int = DEFAULT_M
    #: Distance metric name (see ops.distance.METRICS) or a JAX-traceable
    #: callable f(a[D], b[D]) -> scalar.  This is the ``Point`` trait
    #: equivalent (reference lib.rs:780-782).  Default matches the
    #: reference Python binding's FloatArray (squared Euclidean,
    #: py src/lib.rs:378-420).
    metric: object = "sqeuclidean"
    #: Max number of points inserted per construction wave.  Waves double
    #: from 1 up to this cap so early points see a dense enough graph.
    wave_size: int = 2048
    #: Storage dtype for points on device ("float32" or "bfloat16").
    dtype: str = "float32"
    #: Dtype of the construction-time neighbor-distance cache
    #: ("float32" or "bfloat16").  bfloat16 halves a large build's HBM
    #: footprint (the cache matches the adjacency in size) at the cost
    #: of tiny ordering jitter among near-equal reverse-edge candidates.
    dist_cache_dtype: str = "float32"
    #: Safety cap on beam-search iterations, as a multiple of ef.
    max_iter_factor: int = 8
    #: Build-time dispatch-queue throttle: force a [1] device->host
    #: readback every this many waves so async dispatch (which returns
    #: at ack through a relay) can't enqueue unboundedly far ahead of
    #: execution — the queued programs' buffers pile up in HBM and can
    #: OOM a near-full chip.  0 disables.
    dispatch_sync_every: int = 16
    #: Wavefront width at query time: how many beam entries expand per
    #: step (1 = the reference's strict best-first order; higher = fewer,
    #: fatter steps, better TPU throughput, never-lower recall).
    search_expand: int = 4
    #: Wavefront width during construction searches.
    construct_expand: int = 4
    #: Serving entry strategy: S>0 replaces the upper-layer greedy
    #: descent with ONE MXU scan over the first S points (a uniform
    #: sample, since pids are a seeded shuffle) and starts the beam at
    #: the ef nearest seeds.  Cuts the descent's sequential dispatches
    #: and the zero-layer iterations to convergence; 0 = classic descent.
    entry_seeds: int = 0
    #: Dtype of the candidate-pairwise matrix driving Alg. 4's bridging
    #: comparisons ("bfloat16" halves the reverse-commit's dominant HBM
    #: traffic; "float32" = reference-exact comparisons).  Query-ranking
    #: distances are unaffected (always f32/HIGHEST).
    select_pd_dtype: str = "bfloat16"
    #: Construction wave-search mode: "scan" finds each wave's candidates
    #: with an exact-rerank int8 MXU scan of the inserted prefix (the
    #: TPU-native default — ~50x cheaper than walking the graph and
    #: strictly better candidates); "beam" searches the pre-wave graph
    #: like the reference (required for custom callable metrics);
    #: "auto" = scan for named metrics, beam otherwise.
    construct_mode: str = "auto"
    #: Width of one reverse-edge commit round: pending additions per
    #: target re-selected together (None -> min(m0, 32); see
    #: ops/construct._rev_params — narrower rounds are cheaper per pass
    #: and the auto round loop keeps the commit lossless regardless).
    pend_cap: Optional[int] = None
    #: Reverse-commit rounds per wave.  None/0 = auto (LOSSLESS): rounds
    #: of pend_cap nearest-first additions per target, re-selected
    #: between rounds (mirrors the reference's sequential per-edge
    #: re-selection, lib.rs:484-496), looping until every pending
    #: addition is consumed; rounds past the first cost nothing unless
    #: some target actually overflowed.  An explicit value caps total
    #: per-target capacity at pend_cap*rev_rounds; overflow beyond it is
    #: dropped, counted (``reverse_drops``) and warned about.
    rev_rounds: Optional[int] = None

    #: Construction waves whose inserted prefix is smaller than this use
    #: the EXACT streamed scan for their candidate search instead of the
    #: fused bucket kernel.  None = default (0 = always fused): measured
    #: at 400k and 1M, the fused kernel's stride-group losses cost
    #: <=0.1 pt of exact-graph recall and the deep default pool absorbs
    #: them — the exact-prefix hybrid measured 0.9951 vs 0.9946 at pool
    #: 200 while costing +80% build time (docs/performance.md, round
    #: 3).  Set a prefix (e.g. 131072) to re-enable the hybrid.
    construct_exact_prefix: Optional[int] = None
    #: Scan-mode candidate hop expansion: the graph neighbors of each
    #: wave point's top-H candidates are merged (exact distances,
    #: deduped) into its candidate list before selection.  Repairs the
    #: fused kernel's stride-group collision losses and injects
    #: graph-local "bridge" candidates (see ops/construct._hop_repair).
    #: Default 0: measured on 1M clustered 128-d (tools/exp_quality.py,
    #: 2026-08-19), hop=8 changed exact-graph recall@10 by <=0.0005 in
    #: either direction while costing ~25% build time — the deep
    #: default candidate pool (``construct_pool``) subsumes it.  Keep
    #: as a knob for extremely clustered data at shallow pools.
    construct_hop_repair: int = 0
    #: Scan-mode candidate-pool size (the "efc" the wave search returns
    #: and Alg. 4 selects from).  None -> 3 * ef_construction.  Pool
    #: depth is nearly free for the scan — the kernel scores every
    #: inserted point regardless — so scan-mode builds default to a
    #: deeper pool than the reference's beam can afford (its search
    #: cost scales with efc, lib.rs:447-463).  Measured on 1M clustered
    #: 128-d (tools/exp_quality.py): pool 100 -> 0.973 exact-graph
    #: recall@10(ef=50), pool 200 -> 0.9946, pool 300 -> 0.9990
    #: (1.0000 at ef=100) at 285 s — vs the reference-recipe beam
    #: build's 0.9773 at 569 s.  Beam-mode builds ignore this and use
    #: ef_construction verbatim (reference parity).
    construct_pool: Optional[int] = None
    #: Scan-mode candidate-search SAMPLE cap (points).  None = every
    #: wave scans the full inserted prefix — per-wave cost grows with N
    #: and the whole build is O(N^2 / wave_size), ~1.1k pts/s at 10M vs
    #: ~3.5k at 1M.  Set to cap the scanned prefix: waves scan only the
    #: FIRST ``min(prefix, cap)`` inserted pids — a uniform sample of
    #: the dataset, because insertion order is a seeded shuffle
    #: (lib.rs:256-270) — so per-wave scan cost is O(cap) at any N.
    #: True neighbors outside the sample are recovered in the commit
    #: program by a graph-hop repair over the pre-wave adjacency (the
    #: sample points' rows accumulate reverse edges to ALL inserted
    #: points, so one hop reaches the unsampled neighborhood; see
    #: ``construct_sample_hops``).  The cap is rounded up to the scan
    #: kernel's point-block multiple.
    construct_sample_cols: Optional[int] = None
    #: With ``construct_sample_cols`` active: each wave point's top-H
    #: pool candidates are hop-expanded through the pre-wave graph
    #: (exact rerank, deduped) before Alg. 4 selection — the repair
    #: runs inside the commit program, which already holds the
    #: adjacency, so the split search/commit memory plan survives.
    construct_sample_hops: int = 16
    #: Scan-mode wave-program structure: None = auto (split the wave
    #: into separate search and commit programs only when the
    #: monolithic program's memory plan would not fit — the split is
    #: required at 10M x 96 but costs ~15% build time at 1M, measured
    #: interleaved).  True/False force the choice.
    construct_split: Optional[bool] = None

    def __post_init__(self) -> None:
        if self.ef_construction < 1 or self.ef_search < 1:
            raise ValueError("ef_search and ef_construction must be >= 1")
        if self.m < 1:
            raise ValueError("m must be >= 1")
        if (self.construct_sample_cols is not None
                and self.construct_sample_cols < 1):
            raise ValueError("construct_sample_cols must be >= 1")

    @property
    def m0(self) -> int:
        """Zero-layer degree (M * 2), reference types.rs:83-85."""
        return 2 * self.m


class Builder:
    """Fluent builder mirroring the reference API (lib.rs:21-113).

    Example::

        hnsw, ids = Builder().seed(42).ef_search(100).build_hnsw(points)
    """

    def __init__(self, config: Optional[Config] = None):
        self._config = config if config is not None else Config()

    def ef_construction(self, ef_construction: int) -> "Builder":
        self._config.ef_construction = ef_construction
        return self

    def ef_search(self, ef: int) -> "Builder":
        self._config.ef_search = ef
        return self

    def select_heuristic(self, params: Optional[Heuristic]) -> "Builder":
        self._config.heuristic = params
        return self

    def ml(self, ml: float) -> "Builder":
        self._config.ml = ml
        return self

    def seed(self, seed: int) -> "Builder":
        self._config.seed = seed
        return self

    def metric(self, metric) -> "Builder":
        self._config.metric = metric
        return self

    def progress(self, callback) -> "Builder":
        """Register a progress callback ``f(done, total, phase)``.

        TPU-native analogue of ``Builder::progress`` (lib.rs:71-75), which
        takes an indicatif ProgressBar in the reference.
        """
        self._progress = callback
        return self

    def into_parts(self):
        """Expose (ef_search, ef_construction, ml, seed), lib.rs:88-98."""
        c = self._config
        return (c.ef_search, c.ef_construction, c.ml, c.seed)

    @property
    def config(self) -> Config:
        return self._config

    def build(self, points, values):
        """Build an ``HnswMap`` (reference lib.rs:78-80)."""
        from .models.hnsw import HnswMap

        return HnswMap.build(points, values, self._config,
                             progress=getattr(self, "_progress", None))

    def build_hnsw(self, points):
        """Build an ``Hnsw``, returning (index, ids) (reference lib.rs:83-85)."""
        from .models.hnsw import Hnsw

        return Hnsw.build(points, self._config,
                          progress=getattr(self, "_progress", None))


def layer_sizes(n: int, ml: float, m: int = DEFAULT_M) -> list[tuple[int, int]]:
    """Geometric layer sizing, top layer first.

    Returns ``[(size, cumulative), ...]`` exactly like the reference's sizing
    loop (lib.rs:238-250): repeatedly shrink by ``ml`` until the next level
    would hold fewer than M points.  ``cumulative`` is the number of points
    that exist at that layer *or above* once construction of the layer
    completes; the list is ordered top layer first.
    """
    sizes = []
    num = n
    while True:
        next_num = int(num * ml)  # f32 truncation parity is irrelevant here
        if next_num < m:
            break
        sizes.append((num - next_num, num))
        num = next_num
    sizes.append((num, num))
    sizes.reverse()
    return sizes
