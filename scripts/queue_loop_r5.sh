#!/bin/bash
# Relaunch the r5 device queue across tunnel outages until it completes
# (or ~11h elapse).  All queue cells are probe-gated and resumable.
cd "$(dirname "$0")/.."
for i in $(seq 1 80); do
  if bash scripts/device_queue_r5.sh artifacts/device_log_r5.txt; then
    echo "queue loop: COMPLETE after $i launches" >> artifacts/device_log_r5.txt
    exit 0
  fi
  echo "queue loop: relaunch $i at $(date), sleeping 300s" >> artifacts/device_log_r5.txt
  sleep 300
done
echo "queue loop: gave up" >> artifacts/device_log_r5.txt
