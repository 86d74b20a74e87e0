#!/usr/bin/env bash
# Round-4 post-10M TPU measurement queue (serial; probe the relay first;
# never run CPU-heavy work concurrently — CLAUDE.md).
#
# Stages:
#   kgroup   — fused-scan epilogue sweep (sel_kgroup in-kernel grouped
#              min vs anchor), interleaved vs the XLA scan (~30 min)
#   walkvar  — walk-kernel variant matrix (split/fused x count/extract)
#              vs the XLA packed beam on a 200k random graph (~10 min)
#   sweep    — r4 packed serving sweep at 1M (seeds-up/walk-lean corner
#              + kernel probes), interleaved vs the XLA scan (~45 min;
#              builds + dumps the shared 1M pack cache on first run)
#   walkreal — real-graph walk kernel vs XLA packed at 1M (reuses the
#              sweep's pack cache, ~10 min)
#
# Usage: bash tools/run_r4_queue.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    echo "relay DOWN - not starting TPU work"; exit 2
fi

run() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name -> /tmp/q_$name.log"
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout "$tmo" \
        python -u "$@" > "/tmp/q_$name.log" 2>&1
    echo "=== $name rc=$? (tail):"; tail -5 "/tmp/q_$name.log"
}

stages=("$@"); [ $# -eq 0 ] && stages=(kgroup walkvar sweep walkreal)
for stage in "${stages[@]}"; do
  case "$stage" in
    kgroup)   run kgroup 3600 tools/tune_kgroup.py ;;
    walkvar)  run walkvar 1800 tools/test_walk_tpu.py 200000 ;;
    sweep)    run sweep 5400 tools/tune_packed_r4.py ;;
    walkreal) run walkreal 1800 tools/bench_walk_real.py 1000000 ;;
    *) echo "unknown stage: $stage" ;;
  esac
done
echo "r4 queue done"
