#!/bin/bash
# Trimmed device queue for a ~1 h healthy-tunnel window (round-3 resume).
# Ordered by value-per-minute; every step timeout-bounded and logged.
#   scripts/device_window_r3b.sh [logfile]
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)) ---" >> "$LOG"
}

# 1. scorer A/Bs at Swin 128-img window shapes: isolate SB and fold
run 600 python scripts/mm_scorer_bench.py
run 420 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run 420 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py
run 420 env PTQ4VIT_TPU_MM_ROWSUM=1 python scripts/mm_scorer_bench.py

# 2. the weakest published ratio: Swin-B/384 128-img with SB+fold defaults
run 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 3. ViT-B/384 128-img refresh
run 1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 4. 32-img flagships (warm the driver's round-end bench + refresh headline)
run 900 env BENCH_PROBE_MAX=2 python bench.py
run 900 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# 5. Swin-B/384 128-img cohort-path A/B (is the fused scorer still winning?)
run 1500 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py

echo "QUEUE DONE $(date)" >> "$LOG"
