#!/usr/bin/env bash
# Round-3 follow-up TPU queue: run AFTER the 10M build drains.
# Probes the relay first (CLAUDE.md); serializes the three stages:
#   1. post sweep  — stage attribution incl. the new grouped-min
#                    selection (sel_group) + its recall deltas
#   2. agreement   — all fused kernels (incl. slab body) vs XLA scan
# Logs to /tmp/q_post3.log and /tmp/q_agree2.log.
set -u
cd "$(dirname "$0")/.."
timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' || {
    echo "TPU relay closed - aborting" >&2; exit 1; }
export PYTHONPATH=$PWD:${PYTHONPATH:-}
timeout 2400 env TUNE_SWEEP=post TUNE_ROUNDS=3 \
    python -u tools/tune_scan_kernel.py > /tmp/q_post3.log 2>&1
timeout 900 python -u tools/check_kernel_agreement.py \
    > /tmp/q_agree2.log 2>&1
echo "followup done: post=$(tail -1 /tmp/q_post3.log | head -c 80)"
