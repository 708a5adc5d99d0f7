#!/bin/bash
# Round-5e queue: re-runs of the two r5d items that failed for fixable
# reasons — profile_flagship.py's __future__-import ordering (SyntaxError)
# and bench_minres's transient tunnel drop ("response body closed").  Each
# item retries once after 120 s if it fails (the tools lack bench.py's
# retry wrapper and a single tunnel flake shouldn't lose the round's
# number).  Waits for the r5d completion marker so TPU processes never
# overlap.
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q "r5d queue done" "$LOG" && break
  sleep 30
done
grep -q "r5d queue done" "$LOG" || { echo "r5d never finished; aborting r5e" >> "$LOG"; exit 1; }

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- rc=$rc ($(date +%H:%M:%S))" >> "$LOG"
  if [ "$rc" -ne 0 ]; then
    sleep 120
    echo "=== RETRY $* ($(date +%H:%M:%S)) ===" >> "$LOG"
    timeout "$TMO" "$@" >> "$LOG" 2>&1
    echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
  fi
}

echo "### round-5e queue start $(date)" >> "$LOG"

TMO=2400 run python tools/profile_flagship.py --fast
TMO=2400 run python tools/bench_minres.py

echo "### $(date) r5e queue done" >> "$LOG"
