#!/bin/bash
# Round-5h: the definitive headline run — bench.py with the round's final
# defaults (12-iter window + fast_min_res=256 from the sweep).  Waits for
# r5g so TPU processes never overlap; also warms the remote compile cache
# for the driver's own bench.py invocation after the round.
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q "r5g queue done" "$LOG" && break
  sleep 30
done
grep -q "r5g queue done" "$LOG" || { echo "r5g never finished; aborting r5h" >> "$LOG"; exit 1; }

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5h queue start $(date)" >> "$LOG"
TMO=2400 run python bench.py
echo "### $(date) r5h queue done" >> "$LOG"
