"""AOT compile-only HBM probe for the construction wave program.

The 10M x 96 single-chip build OOMs AT COMPILE TIME (the TPU AOT
compiler plans 21.2 GB vs 15.75 GB HBM: the [N, 64] adjacency arrays
pay 2x (8,128)-tile lane padding and XLA adds whole-array staging
copies under pressure).  Iterating on that by launching real builds
costs ~15 min each (datagen + a 3.8 GB upload through the relay);
this probe lowers and compiles the EXACT wave program from abstract
ShapeDtypeStructs instead — no data, no upload, answers in ~1 min.

Run (TPU relay must be up; compile-only, safe to run while the chip
is otherwise idle):
    PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/probe_build_memory.py \
        N D [points_dtype [cache_dtype [wave]]]
Prints the compiler's memory plan (or the OOM breakdown) per config.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_distance_tpu.config import Config
from instant_distance_tpu.ops import construct as C


def probe(n: int, d: int, points_dtype="float32",
          cache_dtype="bfloat16", wave=4096) -> bool:
    cfg = Config(seed=3, wave_size=wave, construct_mode="scan",
                 dist_cache_dtype=cache_dtype)
    m, m0 = cfg.m, cfg.m0
    heur = (None if cfg.heuristic is None else
            (cfg.heuristic.extend_candidates, cfg.heuristic.keep_pruned))
    pend_cap, rev_rounds = C._rev_params(cfg, m0)
    search_mode = C._resolve_search_mode(cfg, cfg.metric)
    exact_prefix = C._exact_prefix_of(cfg)
    sizes = C.layer_sizes(n, cfg.ml, m)
    pack = C._pack_factor(m)

    def _pal(x):
        return ((x + pack - 1) // pack) * pack

    cap_rows = max(pack, sum(_pal(c) for (_, c) in sizes[:-1]))
    S = jax.ShapeDtypeStruct
    # build_graph pads scan-mode device points to a 128-lane multiple
    # (kills the per-program tiled-copy staging of compact arguments)
    d_dev = d + ((-d) % 128 if search_mode.startswith("scan") else 0)
    pts_s = S((n, d_dev), jnp.dtype(points_dtype))
    # operand shapes via eval_shape so they can't drift from the code
    main_ops, _ = jax.eval_shape(
        lambda p: C._scan_operands(p, search_mode, "sqeuclidean",
                                   exact_prefix), pts_s)
    args = (
        S((n + 1, m0), jnp.int32),                    # adj
        S((n + 1, m0), jnp.dtype(cache_dtype)),       # adjd
        S((wave,), jnp.int32),                        # wave pids
        pts_s,                                        # points
        S((cap_rows // pack, m * pack), jnp.int32),   # stacked snapshots
        S((16,), jnp.int32),                          # offsets
        S((), jnp.int32),                             # n_upper
        S((), jnp.int32),                             # zero_links
        *main_ops,                                    # wcodes/wscales/wnorms
    )
    kw = dict(metric_name="sqeuclidean",
              efc=C._pool_of(cfg, search_mode), m=m, m0=m0,
              heuristic=heur, rev_chunk=8192, pend_cap=pend_cap,
              rev_rounds=rev_rounds, max_iter_factor=cfg.max_iter_factor,
              expand=getattr(cfg, "construct_expand", 1),
              search_mode=search_mode,
              pd_dtype=getattr(cfg, "select_pd_dtype", "bfloat16"),
              hop_repair=C._hop_of(cfg))
    tag = (f"n={n:,} d={d} pts={points_dtype} cache={cache_dtype} "
           f"wave={wave} mode={search_mode}")

    def _compile(name, fn, fargs, fkw):
        try:
            compiled = fn.lower(*fargs, **fkw).compile()
        except Exception as exc:  # the OOM text carries the breakdown
            import os
            msg = str(exc)
            cut = msg.find("Largest program allocations")
            if os.environ.get("PROBE_FULL"):
                cut = -1
                msg = msg[:12000]
            print(f"[probe] {tag} [{name}]\n  FAIL: "
                  f"{msg[:cut] if cut > 0 else msg}", flush=True)
            return False
        try:
            ma = compiled.memory_analysis()
            print(f"[probe] {tag} [{name}]\n  OK  "
                  f"temp={ma.temp_size_in_bytes / 2**30:.2f}G "
                  f"args={ma.argument_size_in_bytes / 2**30:.2f}G "
                  f"out={ma.output_size_in_bytes / 2**30:.2f}G",
                  flush=True)
        except Exception:
            print(f"[probe] {tag} [{name}]  OK (no memory_analysis)",
                  flush=True)
        return True

    # split programs — what scan-mode build_graph actually runs,
    # including the lane-packed (pk) adjacency shapes
    pk_ = C._pk_factor(m0)
    prow = (n + 1 + pk_ - 1) // pk_
    adj_s = S((prow, pk_ * m0), jnp.int32)
    adjd_s = S((prow, pk_ * m0), jnp.dtype(cache_dtype))
    s_args = (args[2], pts_s, None, None, args[6], args[7],
              *main_ops, None)
    s_kw = dict(metric_name="sqeuclidean",
                efc=C._pool_of(cfg, search_mode), m=m, m0=m0,
                heuristic=heur, max_iter_factor=cfg.max_iter_factor,
                expand=getattr(cfg, "construct_expand", 1),
                search_mode=search_mode, pd_dtype=kw["pd_dtype"],
                hop_repair=0)
    sel_s = (S((wave, m0), jnp.float32), S((wave, m0), jnp.int32))
    c_args = (adj_s, adjd_s, args[2], pts_s, *sel_s)
    c_kw = dict(metric_name="sqeuclidean", m0=m0, heuristic=heur,
                rev_chunk=8192, pend_cap=pend_cap,
                rev_rounds=rev_rounds, pd_dtype=kw["pd_dtype"],
                pk=pk_, n_points=n)
    ok = _compile(
        "quantize",
        jax.jit(C._scan_operands, static_argnames=("search_mode",
                                                   "metric_name",
                                                   "exact_prefix")),
        (pts_s,), dict(search_mode=search_mode,
                       metric_name="sqeuclidean",
                       exact_prefix=exact_prefix))
    ok &= _compile("search", C._search_step, s_args, s_kw)
    ok &= _compile("commit", C._commit_step, c_args, c_kw)
    return ok


def main():
    a = sys.argv[1:]
    n = int(a[0]) if a else 10_000_000
    d = int(a[1]) if len(a) > 1 else 96
    pdt = a[2] if len(a) > 2 else "float32"
    cdt = a[3] if len(a) > 3 else "bfloat16"
    wave = int(a[4]) if len(a) > 4 else 4096
    probe(n, d, pdt, cdt, wave)


if __name__ == "__main__":
    main()
