#!/bin/bash
# Consolidated reordered device queue (round-3 resume, single owner).
# Headline 128-img calib runs first — the scorer micro A/Bs hit a ~10 min
# stall on their third shape and got demoted below everything that feeds
# BENCH/GRID artifacts directly.
#   scripts/device_window_r3d.sh [logfile]
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)) ---" >> "$LOG"
}

# 1. weakest published ratio first
run 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run 1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 2. 32-img flagships (also warms the driver's round-end bench)
run 900 env BENCH_PROBE_MAX=2 python bench.py
run 900 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# 3. serving incl. first device numbers for fused_relaxed
run 1500 env BENCH_PROBE_MAX=2 python bench_infer.py
run 1500 env BENCH_PROBE_MAX=2 BENCH_MODEL=swin_base_patch4_window12_384 python bench_infer.py

# 4. 128-img cells for the rest of the zoo, small->large
for m in vit_tiny_patch16_224 deit_tiny_patch16_224 vit_small_patch32_224 \
         deit_small_patch16_224 vit_small_patch16_224 swin_tiny_patch4_window7_224 \
         vit_base_patch16_224 deit_base_patch16_224 swin_small_patch4_window7_224 \
         swin_base_patch4_window7_224 deit_base_patch16_384; do
  run 1200 env BENCH_MODEL="$m" BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
done

# 5. scorer A/Bs (demoted; shape 3 stalled >10 min once already)
run 900 python scripts/mm_scorer_bench.py
run 600 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run 600 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py

# 6. Swin-B/384 128-img cohort-path A/B
run 1500 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py

echo "QUEUE R3D DONE $(date)" >> "$LOG"
