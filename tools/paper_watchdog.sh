#!/bin/bash
# Retry wrapper for the paper-scale measurement: the axon tunnel
# intermittently drops an RPC and the client futex-waits forever.
# Watch the run log's mtime; no new line in STALL_S => kill + retry.
# The persistent JAX compile cache (/tmp/jax_cache_r5) ratchets
# compiled programs across attempts, shrinking the flake window.
set -u
LOG=/tmp/paper_round/paper_r5_stdout.log
STALL_S=900
for attempt in 1 2 3; do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> /tmp/paper_round/watchdog.log
  rm -rf /tmp/paper_round/ckpt_r5 /tmp/paper_round/paper_r5.log
  JAX_CACHE_DIR=/tmp/jax_cache_r5 PYTHONPATH=/root/repo:/root/.axon_site timeout 6000 python -m creamfl_tpu.main \
    --synthetic --paper_scale --contrast_local_inter --contrast_local_intra \
    --comm_rounds 3 --seed 42 --name paper_r5 \
    --exp_dir /tmp/paper_round --ckpt_dir /tmp/paper_round/ckpt_r5 \
    > "$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt $STALL_S ]; then
      echo "stalled $((now - mt))s at $(date -u +%H:%M:%S); killing $pid" >> /tmp/paper_round/watchdog.log
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  echo "attempt $attempt rc=$rc" >> /tmp/paper_round/watchdog.log
  if grep -q "round 3 timing" "$LOG"; then
    echo "SUCCESS on attempt $attempt" >> /tmp/paper_round/watchdog.log
    exit 0
  fi
done
echo "FAILED all attempts" >> /tmp/paper_round/watchdog.log
exit 1
