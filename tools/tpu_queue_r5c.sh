#!/bin/bash
# Round-5 follow-up queue: the tools/* items the first queue lost to a
# sys.path bug (fixed by the per-script bootstrap), plus re-runs of the two
# headline configs that missed their window (pair_up@b3 post-fixes, control
# post merge-semantics change).  WAITS for the r5 queue's completion marker
# so two TPU processes never overlap.
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q "queue done" "$LOG" && break
  sleep 30
done
grep -q "queue done" "$LOG" || { echo "r5 queue never finished" >> "$LOG"; exit 1; }

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5c follow-up queue start $(date)" >> "$LOG"

# 1. train-step timing, plain vs fast_train (VERDICT item 4; target <350 ms)
TMO=1800 run python tools/bench_train.py --steps 6
TMO=1800 run python tools/bench_train.py --steps 6 --fast

# 2. headline control re-run (logit-merge + antialias changes landed mid-round;
#    this is the exact command the driver runs)
TMO=2400 run python bench.py

# 3. the missed pair_up@batch3 decision measurement (post dtype/VMEM fixes)
TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up python bench.py

# 4. fast_min_res sweep
TMO=2400 run python tools/bench_minres.py

# 5. decoder roofline round 2
TMO=2400 run python tools/profile_flagship.py --fast

# 6. TTA pre/post transport stages
TMO=1200 run python tools/bench_prepost.py

# 7. train-step stage decomposition
TMO=1800 run python tools/profile_train.py

# 8. plain batch-4 retry (timed out twice at the old 900 s attempt cap)
TMO=2400 run env EDS_BENCH_BATCH=4 python bench.py

echo "### $(date) r5c queue done" >> "$LOG"
