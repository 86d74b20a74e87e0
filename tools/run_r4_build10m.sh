#!/usr/bin/env bash
# Round-4 VERDICT item #2: 10M x 96 single-chip graph build with
# checkpoint/resume exercised ONCE mid-build at that scale.
#
# Phase A runs the build under a timeout that kills it mid-waves (after
# at least one checkpoint landed at wave 256 of ~2441); phase B reruns
# the same command, which resumes from /tmp/build10m.ckpt.npz and
# finishes + measures recall.  Total wall = A + B; the honest full-build
# estimate is in phase B's log (resume skips completed waves).
set -u
cd "$(dirname "$0")/.."
timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' || {
    echo "TPU relay closed - aborting" >&2; exit 1; }
CKPT=/tmp/build10m.ckpt.npz
rm -f "$CKPT"
env=(BENCH_BUILD_D=96 BENCH_BUILD_CACHE_DTYPE=bfloat16
     BENCH_BUILD_CKPT="$CKPT" PYTHONPATH=/root/repo:${PYTHONPATH:-})
echo "phase A (mid-build kill) started $(date +%T)"
timeout 2700 env "${env[@]}" \
    python -u tools/bench_build.py scan 10000000 > /tmp/q_b10m_a.log 2>&1
rca=$?
echo "phase A rc=$rca $(date +%T)"
if [ "$rca" -eq 0 ]; then
    echo "build finished inside phase A (no resume needed)"; exit 0
fi
if [ ! -f "$CKPT" ]; then
    echo "no checkpoint landed before the kill - rerun with smaller CKPT_EVERY" >&2
    exit 3
fi
echo "phase B (resume) started $(date +%T), ckpt=$(du -h "$CKPT" | cut -f1)"
timeout 12000 env "${env[@]}" \
    python -u tools/bench_build.py scan 10000000 > /tmp/q_b10m_b.log 2>&1
echo "phase B rc=$? $(date +%T)"
tail -4 /tmp/q_b10m_b.log
