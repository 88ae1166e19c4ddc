#!/bin/bash
# Round-5 quality-seed queue (VERDICT r4 #5): waits for the axon tunnel,
# then runs the remaining A/B seeds STRICTLY SEQUENTIALLY (the tunnel is
# single-client). Logs to /tmp/r5_quality_*.log; status in
# /tmp/r5_queue_status.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STATUS=/tmp/r5_queue_status
echo "waiting-for-tunnel $(date -u +%H:%M:%S)" > $STATUS

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0])
" >/dev/null 2>&1
}

deadline=$(( $(date +%s) + 10800 ))  # give up after 3h
until probe; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "gave-up-tunnel-down $(date -u +%H:%M:%S)" > $STATUS
    exit 1
  fi
  echo "waiting-for-tunnel retry $(date -u +%H:%M:%S)" > $STATUS
  sleep 150
done

echo "tunnel-up $(date -u +%H:%M:%S)" > $STATUS

run() {  # run <tag> <cmd...>
  tag=$1; shift
  echo "running-$tag $(date -u +%H:%M:%S)" >> $STATUS
  timeout 3600 python -u "$@" > /tmp/r5_quality_$tag.log 2>&1
  echo "done-$tag rc=$? $(date -u +%H:%M:%S)" >> $STATUS
}

# 1. srgan third seed (40ep row -> 3 seeds)
run srgan_s2 benchmarks/quality_ab_srgan.py --epochs 40 --seed 2 \
  --out benchmarks/quality_ab_srgan_seed2.json

# 2. pix2pix-128 ample-capacity second seed
run 128_s1 benchmarks/quality_ab.py --size 128 --num_downs 7 --ngf 32 \
  --ndf 64 --teacher_ngf 64 --teacher_ndf 64 --epochs 80 \
  --prune_frac 0.25 --seed 1 --out benchmarks/quality_ab_128_seed1.json

# 3. srgan 80ep-horizon second seed
run srgan80_s1 benchmarks/quality_ab_srgan.py --epochs 80 --seed 1 \
  --out benchmarks/quality_ab_srgan_80ep_seed1.json

echo "all-done $(date -u +%H:%M:%S)" >> $STATUS
