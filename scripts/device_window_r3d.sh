#!/bin/bash
# Consolidated reordered device queue (round-3 resume, single owner).
# This revision assumes an EMPTY persistent XLA cache (the repo-resident
# cache landed during an outage and never got populated): the 32-img
# flagships run first — they are cheap even with cold remote compiles,
# refresh the headline BENCH numbers, and absorb shared-infra compiles —
# then the 128-img flagships get generous timeouts (cold run 1 pays every
# remote compile; bench.py reports best-of-2 so run 2 is the number).
#   scripts/device_window_r3d.sh [logfile]
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)) ---" >> "$LOG"
}
harvest() { python scripts/harvest_device_log.py "$LOG" >> "$LOG" 2>&1; }

# 1. 32-img flagships (headline refresh with fold on; warms shared compiles)
run 1800 env BENCH_PROBE_MAX=2 python bench.py
harvest
run 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py
harvest

# 2. the weakest published ratio: Swin-B/384 @128 with SB+fold scorer grid
run 3600 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
harvest
run 2400 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
harvest

# 3. serving incl. first device numbers for fused_relaxed
run 1500 env BENCH_PROBE_MAX=2 python bench_infer.py
run 1500 env BENCH_PROBE_MAX=2 BENCH_MODEL=swin_base_patch4_window12_384 python bench_infer.py
harvest

# 4. 128-img cells for the rest of the zoo, small->large
for m in vit_tiny_patch16_224 deit_tiny_patch16_224 vit_small_patch32_224 \
         deit_small_patch16_224 vit_small_patch16_224 swin_tiny_patch4_window7_224 \
         vit_base_patch16_224 deit_base_patch16_224 swin_small_patch4_window7_224 \
         swin_base_patch4_window7_224 deit_base_patch16_384; do
  run 1500 env BENCH_MODEL="$m" BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
  harvest
done

# 5. Swin-B/384 128-img attribution (where do the search seconds go now)
run 1200 python scripts/calib_attribution.py swin_base_patch4_window12_384 128

# 6. scorer A/Bs (demoted; shape 3 stalled >10 min once already)
run 900 python scripts/mm_scorer_bench.py
run 600 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run 600 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py

# 7. Swin-B/384 128-img cohort-path A/B
run 2400 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py
harvest

echo "QUEUE R3D DONE $(date)" >> "$LOG"
