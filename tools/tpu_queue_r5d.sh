#!/bin/bash
# Round-5d queue: relaunch of the r5c follow-up items (the VM restarted at
# 19:27 and killed r5c mid-item-1; workspace restored from the last commit).
# Reordered so the headline-deciding A/Bs land first if the tunnel flakes:
#   1-2. pair_up@b3 (the last unmeasured >=5.0 candidate, post dtype/VMEM
#        fixes) and the control re-run (exact driver command)
#   3-4. train-step timing plain/fast (VERDICT item 4, <350 ms target)
#   5.   decoder roofline round 2 (VERDICT item 7)
#   6.   transport pre/post stages (VERDICT item 5 quantification)
#   7-9. minres sweep, train decomposition, plain batch-4 retry
# Starts immediately: the r5 queue's "queue done" marker is in the log and
# no TPU process is alive (fresh boot).
cd /root/repo || exit 1
LOG=/root/repo/tools/logs/r5_tpu.log
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

echo "### round-5d queue start $(date) (r5c died with the 19:27 VM restart)" >> "$LOG"

TMO=2400 run env EDS_BENCH_PALLAS_TAIL=pair_up python bench.py
TMO=2400 run python bench.py
TMO=1800 run python tools/bench_train.py --steps 6
TMO=1800 run python tools/bench_train.py --steps 6 --fast
TMO=2400 run python tools/profile_flagship.py --fast
TMO=1200 run python tools/bench_prepost.py
TMO=2400 run python tools/bench_minres.py
TMO=1800 run python tools/profile_train.py
TMO=2400 run env EDS_BENCH_BATCH=4 python bench.py

echo "### $(date) r5d queue done" >> "$LOG"
