#!/bin/bash
# Relaunch the r5c device queue across tunnel outages until it completes
# (or ~6h elapse).  All queue cells are probe-gated and resumable.
cd "$(dirname "$0")/.."
for i in $(seq 1 45); do
  if bash scripts/device_queue_r5c.sh artifacts/device_log_r5.txt; then
    echo "r5c loop: COMPLETE after $i launches" >> artifacts/device_log_r5.txt
    exit 0
  fi
  echo "r5c loop: relaunch $i at $(date), sleeping 300s" >> artifacts/device_log_r5.txt
  sleep 300
done
echo "r5c loop: gave up" >> artifacts/device_log_r5.txt
