#!/bin/bash
# Round-5f queue: the fast_train stage decomposition (profile_train OOM'd
# all-in-one-process; stages are now subprocess-isolated).  Waits for r5e.
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q "r5e queue done" "$LOG" && break
  sleep 30
done
grep -q "r5e queue done" "$LOG" || { echo "r5e never finished; aborting r5f" >> "$LOG"; exit 1; }

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5f queue start $(date)" >> "$LOG"
TMO=3000 run python tools/profile_train.py --fast
echo "### $(date) r5f queue done" >> "$LOG"
