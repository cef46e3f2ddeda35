#!/bin/bash
# Round-3 window g: tunnel measured healthy (probe compile+first 0.89 s).
# Reordered device_queue.sh for a ~1h window: headline 128-img Swin first
# (weakest published ratio, 10.5x), then the cheap scorer A/Bs, then the
# rest.  Appends to a repo-resident log; harvest with
#   python scripts/harvest_device_log.py
set -u
LOG="${1:-artifacts/device_log_r3g.txt}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# 0. probe
run 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe', float((x@x).sum()))"

# 1. Swin-B/384 128-img with the SB+fold scorer grid (the headline gap)
run 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 2. scorer A/Bs at Swin window shapes (fast, isolate SB and fold)
run 580 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py
run 580 env PTQ4VIT_TPU_MM_SB=1 PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py

# 3. ViT-B/384 128-img
run 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 4. 32-img flagship refreshes with fold on
run 900 env BENCH_PROBE_MAX=2 python bench.py
run 900 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# 5. serving: exact vs relaxed
run 1800 env BENCH_PROBE_MAX=2 python bench_infer.py
run 1800 env BENCH_PROBE_MAX=2 BENCH_MODEL=swin_base_patch4_window12_384 python bench_infer.py

# 6. Swin-B/384 128-img attribution
run 1200 python scripts/calib_attribution.py swin_base_patch4_window12_384 128

# 7. 128-img grid for the whole zoo (ROADMAP #6)
run 14400 env BENCH_PROBE_MAX=2 bash scripts/run_grid.sh artifacts/grid128.jsonl 128

# 8. cohort-path A/B at 128 imgs
run 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py

echo "QUEUE DONE $(date)" >> "$LOG"
