"""On-hardware fused-kernel vs XLA-scan agreement check (~2 min).

All fused-kernel TESTS run interpret=True on CPU (the suite must stay
hermetic on the single-core box), so a Mosaic-only miscompile would slip
through to the bench.  This stage runs the real compiled kernels on the
TPU against the pure-XLA streamed scan on 100k points and asserts top-1
agreement >= 0.999 for every fused variant (bucket / bucket_int /
bucket_pack / bucket_pack's slab-loop body) — tie-breaks between
equidistant points account for the tiny allowed slack.

Run (serialized with other TPU work):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 900 \
        python -u tools/check_kernel_agreement.py
Exit code 0 = all variants agree; 1 = any disagreement.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from instant_distance_tpu.models.scan import ScanIndex  # noqa: E402
from instant_distance_tpu.utils.datasets import synthetic_clustered  # noqa: E402


def main() -> int:
    n, dim, b, k = 131072, 128, 1024, 10
    data = synthetic_clustered(n + b, dim, n_clusters=1000, seed=17)
    pts, queries = data[:n], data[n:]
    idx = ScanIndex(pts)
    print(f"[agree] n={n} d={dim} B={b} backend={jax.default_backend()}",
          flush=True)

    # reference: pure-XLA streamed scan over the SAME int8 codes with
    # exact rerank — identical candidate math, no Pallas
    xd, xi = idx.search_batch(queries, k=k, ef=16)
    xi = np.asarray(xi)

    failed = False
    for mode in ("bucket", "bucket_int", "bucket_pack", "bucket_pack_slab"):
        slab = mode == "bucket_pack_slab"
        fd, fi = idx.search_batch(queries, k=k, ef=16,
                                  fused="bucket_pack" if slab else mode,
                                  qb=512, cb=4096, lsub=32, slab=slab)
        fi = np.asarray(fi)
        top1 = float((fi[:, 0] == xi[:, 0]).mean())
        # top-k set agreement is the serving-relevant metric
        setk = np.mean([len(set(fi[r]) & set(xi[r])) / k
                        for r in range(b)])
        ok = top1 >= 0.999
        failed |= not ok
        print(f"[agree] {mode:12s} top1={top1:.4f} set@{k}={setk:.4f} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
