#!/usr/bin/env bash
# Round-5 TPU measurement queue (serial; probe the relay first; never
# run CPU-heavy work concurrently — CLAUDE.md).
#
# Stages (run AFTER the 10M resume finishes):
#   b10m_sampled — fresh 10M x 96 build with the sampled prefix scan
#                  (construct_sample_cols=2^22 + 16-hop commit repair):
#                  the O(N^2)-fix measurement (VERDICT r4 #3). ~75 min
#   bench        — full bench.py record: proves the HBM-exhaustion fix
#                  (non-null scan re-time / p50 / hybrid tails) and
#                  re-lands build_s (VERDICT r4 #2, #6). ~60 min
#   b1m_mono     — 1M x 128 build with INSTANT_TPU_NO_SPLIT=1 (the r3
#                  monolithic recipe): brackets the 745s-vs-344s
#                  build_s regression structurally (VERDICT r4 #6). ~12 min
#   b1m_def      — same 1M with r5 defaults, interleaved for drift. ~12 min
#   walkvar      — walk-kernel v2 variant matrix, 200k (VERDICT r4 #4)
#   walkreal     — real-graph walk kernel vs XLA packed at 1M
#   kgroup       — kgroup corner reconcile at bench scale (VERDICT r4 #7)
#
# Usage: bash tools/run_r5_queue.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    echo "relay DOWN - not starting TPU work"; exit 2
fi

run() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name -> /tmp/q_$name.log ($(date +%T))"
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout "$tmo" \
        "$@" > "/tmp/q_$name.log" 2>&1
    echo "=== $name rc=$? ($(date +%T), tail):"; tail -5 "/tmp/q_$name.log"
}

stages=("$@"); [ $# -eq 0 ] && stages=(b10m_sampled bench b1m_mono b1m_def
                                       walkvar walkreal kgroup)
for stage in "${stages[@]}"; do
  case "$stage" in
    b10m_sampled)
        run b10m_sampled 9000 env BENCH_BUILD_D=96 \
            BENCH_BUILD_CACHE_DTYPE=bfloat16 BENCH_BUILD_SAMPLE=4194304 \
            BENCH_BUILD_CKPT=/tmp/build10m_s.ckpt.npz \
            BENCH_BUILD_CKPT_EVERY=512 \
            python -u tools/bench_build.py scan 10000000 ;;
    bench)  run bench 7200 python -u bench.py ;;
    b1m_mono)
        run b1m_mono 2400 env INSTANT_TPU_NO_SPLIT=1 \
            python -u tools/bench_build.py scan 1000000 ;;
    b1m_def)
        run b1m_def 2400 python -u tools/bench_build.py scan 1000000 ;;
    b1m_s96)
        # same recipe as b10m_sampled at 1M: the honest per-point-cost
        # denominator for the O(N^2)-fix ratio (same D, dtype, sampling)
        run b1m_s96 2400 env BENCH_BUILD_D=96 \
            BENCH_BUILD_CACHE_DTYPE=bfloat16 BENCH_BUILD_SAMPLE=4194304 \
            python -u tools/bench_build.py scan 1000000 ;;
    walkvar)  run walkvar 1800 python -u tools/test_walk_tpu.py 200000 ;;
    walkreal) run walkreal 3600 python -u tools/bench_walk_real.py 1000000 ;;
    kgroup)   run kgroup 3600 python -u tools/tune_kgroup.py ;;
    *) echo "unknown stage: $stage" ;;
  esac
done
echo "r5 queue done"
