"""Command-line tools: inspect, validate, convert, self-test indices.

Usage:
  python -m instant_distance_tpu info INDEX [--dims D]
  python -m instant_distance_tpu validate INDEX [--dims D]
  python -m instant_distance_tpu convert SRC DST [--dims D]
  python -m instant_distance_tpu selftest INDEX [--dims D] [--queries Q]

INDEX may be native .npz or a reference bincode dump (auto-detected;
bincode needs --dims unless it is the binding's fixed 300).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str, dims: int):
    from .utils import serialize

    kw = {}
    with open(path, "rb") as f:
        if not f.read(4).startswith(b"PK"):
            kw["dims"] = dims
    return serialize.load(path, **kw)


def cmd_info(args) -> int:
    import numpy as np

    idx = _load(args.index, args.dims)
    zero = np.asarray(idx.zero)
    degrees = (zero >= 0).sum(axis=1) if zero.size else np.zeros(0)
    info = {
        "type": type(idx).__name__,
        "points": int(idx.points.shape[0]),
        "dims": int(idx.points.shape[1]) if idx.points.ndim == 2 else 0,
        "m": idx.config.m,
        "ef_search": idx.config.ef_search,
        "layers": [int(np.asarray(l).shape[0]) for l in idx.layers],
        "mean_degree": float(degrees.mean()) if degrees.size else 0.0,
        "values": len(getattr(idx, "values", []) or []),
    }
    print(json.dumps(info, indent=2))
    return 0


def cmd_validate(args) -> int:
    from .utils.validate import validate_graph

    idx = _load(args.index, args.dims)
    rep = validate_graph(idx)
    print(json.dumps({
        "ok": rep.ok, "errors": rep.errors, "n": rep.n,
        "mean_degree": round(rep.mean_degree, 2),
        "degree_histogram": rep.degree_histogram,
        "n_layers": rep.n_layers}, indent=2))
    return 0 if rep.ok else 1


def cmd_convert(args) -> int:
    idx = _load(args.src, args.dims)
    fmt = "bincode" if args.dst.endswith((".bin", ".idx")) else "native"
    idx.dump(args.dst, format=fmt)
    print(f"wrote {args.dst} ({fmt})")
    return 0


def cmd_selftest(args) -> int:
    """Self-query recall: every point should find itself first, and
    near-neighbor recall vs brute force should be high."""
    import numpy as np

    from .models.brute import BruteForce
    from .utils.metrics import recall_at_k

    idx = _load(args.index, args.dims)
    n = len(idx)
    q = np.asarray(idx.points[:min(args.queries, n)])
    d, p = idx.search_batch(q, k=min(10, n))
    self_ok = float((np.asarray(p)[:, 0] == np.arange(len(q))).mean())
    gt_d, gt_i = BruteForce(np.asarray(idx.points)).search_batch(
        q, min(10, n))
    rec = recall_at_k(np.asarray(p), np.asarray(gt_i), min(10, n))
    print(json.dumps({"self_top1": self_ok,
                      "recall_at_10": round(rec, 4),
                      "queries": len(q)}))
    return 0 if self_ok > 0.9 and rec > 0.9 else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="instant_distance_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in [("info", cmd_info), ("validate", cmd_validate),
                     ("selftest", cmd_selftest)]:
        p = sub.add_parser(name)
        p.add_argument("index")
        p.add_argument("--dims", type=int, default=300)
        if name == "selftest":
            p.add_argument("--queries", type=int, default=256)
        p.set_defaults(fn=fn)
    p = sub.add_parser("convert")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--dims", type=int, default=300)
    p.set_defaults(fn=cmd_convert)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
