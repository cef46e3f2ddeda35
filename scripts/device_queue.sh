#!/bin/bash
# One-shot device work queue for a healthy tunnel window.  Each step is
# timeout-bounded and appends to $LOG; a failed step doesn't stop the rest.
# Ordered by value-per-minute in case the window is short.
#   scripts/device_queue.sh [logfile]
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# 0. probe
run 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe', float((x@x).sum()))"

# 1. the headline 128-img flagships with the new SB+fold scorer grid
#    (Swin-B/384 was 6.57 min / 10.5x — the weakest published ratio)
# timeouts sized for a contention-polluted run 1 + a clean run 2 (bench.py
# prints only at the END of both repeats — a too-tight timeout loses both)
run 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 2. 32-img flagships (refresh the headline BENCH numbers with fold on)
run 900 env BENCH_PROBE_MAX=2 python bench.py
run 900 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# 3. 128-img grid for the whole zoo (ROADMAP #6); short probe patience so a
#    mid-grid outage fails each cell fast instead of burning 30 min per model
# grid rows append to a repo-resident artifact (NOT /tmp: wiped between
# sessions; a mid-grid death must not lose the completed cells)
run 14400 env BENCH_PROBE_MAX=2 bash scripts/run_grid.sh artifacts/grid128.jsonl 128

# 4. serving: exact vs relaxed, ViT-B/384 and Swin-B/384
run 1800 env BENCH_PROBE_MAX=2 python bench_infer.py
run 1800 env BENCH_PROBE_MAX=2 BENCH_MODEL=swin_base_patch4_window12_384 python bench_infer.py

# 5. Swin-B/384 128-img attribution (where do the search seconds go now)
run 1200 python scripts/calib_attribution.py swin_base_patch4_window12_384 128

# 6. scorer A/Bs at Swin window shapes: SB and fold isolated
run 580 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_SB=1 PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_ROWSUM=1 python scripts/mm_scorer_bench.py

# 7. Swin-B/384 128-img: the vmapped cohort path A/B (ROADMAP #2's lever)
run 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py

echo "QUEUE DONE $(date)" >> "$LOG"
