#!/bin/bash
# Round-5g (final) queue: r5f's 5-stage fast decomposition no longer fits
# the remaining round budget next to the two measurements that matter more —
# the driver-headline bench confirm (12-iter window) and the train-step
# re-measure with the rebuilt real-branch augmentation.  The isolated grads
# stage (the missing piece of the <350 ms argument) goes last.
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q "r5e queue done" "$LOG" && break
  sleep 30
done
grep -q "r5e queue done" "$LOG" || { echo "r5e never finished; aborting r5g" >> "$LOG"; exit 1; }

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5g queue start $(date)" >> "$LOG"
TMO=2400 run python bench.py
TMO=1800 run python tools/bench_train.py --steps 6 --fast
TMO=1500 run python tools/profile_train.py --fast --stage grads
echo "### $(date) r5g queue done" >> "$LOG"
