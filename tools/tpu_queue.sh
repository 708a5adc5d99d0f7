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

# 4. fast_min_res sweep on the 8-view forward (round-3 pending probe)
TMO=2400 run python tools/bench_minres.py

# 4b. headline-bench A/B of the pallas tails (full pre/post included); the
# default-path number from step 3 is the control
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up python bench.py
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair python bench.py
# pair_up halves the biggest decoder intermediate — batch 4/6 may now beat
# the round-3 batch-3 optimum (more views amortizing dispatch)
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up EDS_BENCH_BATCH=4 python bench.py
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up EDS_BENCH_BATCH=6 python bench.py

# 5. decoder roofline, round 2 (VERDICT item 8): per-node ms on the fast path
TMO=2400 run python tools/profile_flagship.py --fast

# 5b. TTA pre/post stages (everything outside the forward) — candidate ms
TMO=1200 run python tools/bench_prepost.py

# 6. train-step stage decomposition (supports item 2's MFU analysis)
TMO=1800 run python tools/profile_train.py

# 7. real-TPU e2e pipeline: train -> TTA -> analysis (VERDICT item 7)
TMO=3600 run bash tools/tpu_e2e.sh

echo "$(date) queue done" >> "$LOG"
