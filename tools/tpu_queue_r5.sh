#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items 2,4,5,7; durability item 6).
# Runs serially — NEVER two TPU processes at once (the tunnel serializes and
# one hangs).  Logs into the REPO (tools/logs/r5_tpu.log) so results survive
# the session and get committed; most valuable measurements first in case the
# tunnel flaps mid-queue.
cd /root/repo || exit 1
mkdir -p tools/logs
LOG=${1:-/root/repo/tools/logs/r5_tpu.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5 queue start $(date)" >> "$LOG"

# 1. headline control: the exact command the driver runs (batch 3, no tail)
TMO=2400 run python bench.py

# 2. headline A/B: pallas tails (VERDICT item 2 — pick bench.py's default)
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up python bench.py
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair python bench.py

# 3. headline A/B: batch 4/6 with the halved intermediate
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up EDS_BENCH_BATCH=4 python bench.py
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up EDS_BENCH_BATCH=6 python bench.py
TMO=2400 run env EDS_BENCH_BATCH=4 python bench.py

# 4. fast_min_res sweep on the 8-view forward
TMO=2400 run python tools/bench_minres.py

# 5. train-step timing, plain vs fast_train (VERDICT item 4; target <350 ms)
TMO=1500 run python tools/bench_train.py --steps 6
TMO=1500 run python tools/bench_train.py --steps 6 --fast

# 6. decoder roofline, round 2 (VERDICT item 7): per-node ms on the fast path
TMO=2400 run python tools/profile_flagship.py --fast

# 7. TTA pre/post transport stages (VERDICT item 5: quantify r4 host overhaul)
TMO=1200 run python tools/bench_prepost.py

# 8. train-step stage decomposition (supports item 4's MFU analysis)
TMO=1800 run python tools/profile_train.py

# 9. real-TPU e2e pipeline: train -> TTA -> analysis (VERDICT item 5)
TMO=3600 run bash tools/tpu_e2e.sh

echo "### $(date) queue done" >> "$LOG"
