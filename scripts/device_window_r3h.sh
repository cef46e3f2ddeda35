#!/bin/bash
# Round-3 window h: the OTHER half of the reference benchmark grid
# (example/test_all.py:100-113 crosses configs {PTQ4ViT, BasePTQ} and bits
# {(8,8),(6,6)}): W6A6 and BasePTQ calibration timings for the flagships,
# via bench.py's BENCH_CONFIG / BENCH_BITS knobs.  Run after
# device_window_r3g.sh finishes.
set -u
LOG="${1:-artifacts/device_log_r3h.txt}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

run 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe', float((x@x).sum()))"

# W6A6 (same search shapes as W8A8 — mostly warm executables, candidate
# grids differ only in qmax values baked as data)
run 900 env BENCH_BITS=6,6 BENCH_PROBE_MAX=2 python bench.py
run 1200 env BENCH_BITS=6,6 BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# BasePTQ (cosine, 1 round — should be ~3x cheaper than PTQ4ViT)
run 900 env BENCH_CONFIG=BasePTQ BENCH_PROBE_MAX=2 python bench.py
run 1200 env BENCH_CONFIG=BasePTQ BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# Warm-cache retry of the headline 128-img cells in case window g's first
# attempt spent its budget on the fold/SB kernels' fresh remote compiles
# (the persistent cache keeps those even when the run times out).
run 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

echo "QUEUE DONE $(date)" >> "$LOG"
