#!/bin/bash
# Round-5 TPU follow-up, run AFTER run_r5_quality_queue.sh completes
# (tunnel is single-client): third sagan 60ep seed, re-measure of the
# fused e2e rung post-optimization_barrier, and a live bench.py sync.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STATUS=/tmp/r5_followup_status
echo "start $(date -u +%H:%M:%S)" > $STATUS

run() {
  tag=$1; shift
  echo "running-$tag $(date -u +%H:%M:%S)" >> $STATUS
  timeout 2400 python -u "$@" > /tmp/r5_$tag.log 2>&1
  echo "done-$tag rc=$? $(date -u +%H:%M:%S)" >> $STATUS
}

run sagan_s2 benchmarks/quality_ab_sagan.py --epochs 60 --seed 2 \
  --out benchmarks/quality_ab_sagan_seed2.json

run e2e_fused benchmarks/e2e_bench.py --only fused

run bench bench.py

echo "all-done $(date -u +%H:%M:%S)" >> $STATUS
