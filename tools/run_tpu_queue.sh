#!/bin/bash
# Fire the queued TPU measurements the moment the axon relay is alive.
#
# The relay died mid-round-2 and several measurements are pending
# (docs/roadmap.md "Performance (round 3+)" items 1-3).  This script
# probes the tunnel, then runs the queue SERIALLY (one process may hold
# the TPU; the relay shares the single CPU core — never run anything
# CPU-heavy concurrently).  Each stage logs to /tmp and survives a
# session death; re-running skips nothing (stages are cheap to repeat
# relative to losing the measurement).
#
# Usage: bash tools/run_tpu_queue.sh [stage...]   (default: all)
#   stages: agree build packed kernel bench
set -u
cd "$(dirname "$0")/.."

if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    echo "relay DOWN (port 8093 closed) — not starting TPU work"
    exit 2
fi
echo "relay up; running queue: ${*:-build packed kernel bench}"

run() {  # name, timeout, cmd...
    local name=$1 tmo=$2; shift 2
    echo "=== $name -> /tmp/q_$name.log"
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout "$tmo" \
        python -u "$@" > "/tmp/q_$name.log" 2>&1
    echo "=== $name rc=$? (tail):"; tail -3 "/tmp/q_$name.log"
}

for stage in "${@:-agree build packed kernel bench}"; do
  case "$stage" in
    # 0. on-hardware fused-kernel vs XLA agreement (VERDICT r2 #5: all
    #    kernel tests are interpret-mode CPU; this catches Mosaic-only
    #    miscompiles in ~2 min)
    agree)  run agree 900 tools/check_kernel_agreement.py ;;
    # 1. optimized scan-mode build at 2M (the 2M recall re-check,
    #    roadmap item 4; 1M is covered by tools/exp_quality.py runs)
    build)  run build 7200 tools/bench_build.py scan 2000000 ;;
    # 1b. 10M-scale checkpointed graph build on one chip (VERDICT r2
    #    #9): D=96 so points+codes+adjacency+bf16 cache fit 16 GB HBM
    build10m) BENCH_BUILD_D=96 BENCH_BUILD_CACHE_DTYPE=bfloat16 \
              BENCH_BUILD_CKPT=/tmp/build10m.ckpt.npz \
              run build10m 14400 tools/bench_build.py scan 10000000 ;;
    # 2. seeded-entry packed serving sweep (VERDICT #2: >=34k @ >=0.95)
    packed) run packed 5400 tools/tune_packed.py ;;
    # 3. bucket_int kernel sweep (VERDICT #5: >=600k @ >=0.99)
    kernel) run kernel 5400 tools/tune_scan_kernel.py ;;
    # 4. the headline bench (driver-format JSON)
    bench)  run bench 7200 bench.py ;;
    *) echo "unknown stage: $stage" ;;
  esac
done
echo "queue done"
