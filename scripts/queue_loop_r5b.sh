#!/bin/bash
# Chain behind the r5 queue loop: wait until it finishes (pidfile gone or
# process dead), then run the r5b cells across outages.
cd "$(dirname "$0")/.."
while kill -0 "$(cat /tmp/r5loop.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
for i in $(seq 1 60); do
  if bash scripts/device_queue_r5b.sh artifacts/device_log_r5.txt; then
    echo "r5b loop: COMPLETE after $i launches" >> artifacts/device_log_r5.txt
    exit 0
  fi
  echo "r5b loop: relaunch $i at $(date), sleeping 300s" >> artifacts/device_log_r5.txt
  sleep 300
done
