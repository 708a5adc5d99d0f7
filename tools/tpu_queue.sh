#!/bin/bash
# Round-4 TPU measurement queue, run serially by tools/tpu_watch.sh the
# moment the axon tunnel comes back.  NEVER run two TPU processes at once
# (the tunnel serializes and one hangs) — keep this strictly sequential.
# Most valuable measurements first in case the tunnel flaps mid-queue.
cd /root/repo || exit 1
LOG=${1:-/tmp/tpu_watch.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. train-step timing, plain vs fast_train (VERDICT item 2; target <350 ms)
TMO=1500 run python tools/bench_train.py --steps 6
TMO=1500 run python tools/bench_train.py --steps 6 --fast

# 2. pair-kernel decision measurement (VERDICT item 1 fusion candidate)
TMO=2400 run python tools/bench_pair.py

# 3. headline bench (has its own retry wrapper; one attempt here is fine)
TMO=2400 run python bench.py

echo "$(date) queue done" >> "$LOG"
