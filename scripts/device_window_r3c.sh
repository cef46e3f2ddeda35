#!/bin/bash
# Tail queue: runs after device_window_r3b.sh if the tunnel window holds.
# 128-img grid for the 11 non-flagship models (ROADMAP #6) + serving
# refresh incl. the relaxed mode's first device numbers.
#   scripts/device_window_r3c.sh [logfile]
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)) ---" >> "$LOG"
}

# serving first (bench_infer covers exact fused AND fused_relaxed)
run 1800 env BENCH_PROBE_MAX=2 python bench_infer.py
run 1800 env BENCH_PROBE_MAX=2 BENCH_MODEL=swin_base_patch4_window12_384 python bench_infer.py

# 128-img cells for the rest of the zoo, small->large so a mid-window
# outage keeps the cheap cells
for m in vit_tiny_patch16_224 deit_tiny_patch16_224 vit_small_patch32_224 \
         deit_small_patch16_224 vit_small_patch16_224 swin_tiny_patch4_window7_224 \
         vit_base_patch16_224 deit_base_patch16_224 swin_small_patch4_window7_224 \
         swin_base_patch4_window7_224 deit_base_patch16_384; do
  run 1200 env BENCH_MODEL="$m" BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
done

echo "TAIL QUEUE DONE $(date)" >> "$LOG"
