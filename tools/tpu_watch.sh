#!/bin/bash
# Tunnel watcher: probe the axon TPU tunnel every 5 min; when it comes back,
# run the queued round-4 measurements (tools/tpu_queue.sh — editable while
# this waits) once and exit.  Logs to /tmp/tpu_watch.log.
# (Round-3 lesson: outages last hours; queue measurements, don't poll by hand.)
cd /root/repo || exit 1
LOG=/tmp/tpu_watch.log
echo "$(date) watcher start" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d=jax.devices(); print(d); assert d" \
      > /tmp/tpu_probe.log 2>&1; then
    echo "$(date) tunnel LIVE: $(cat /tmp/tpu_probe.log)" >> "$LOG"
    bash tools/tpu_queue.sh "$LOG"
    echo "$(date) measurements done" >> "$LOG"
    break
  fi
  echo "$(date) tunnel down ($(tail -c 120 /tmp/tpu_probe.log | tr '\n' ' '))" >> "$LOG"
  sleep 300
done
