#!/bin/bash
# 13-model calibration grid on the real TPU (reference example/test_all.py
# model list).  One JSON line per model via bench.py; run TWICE for
# warm-cache numbers (the persistent XLA cache makes run 2 compile-free).
#   scripts/run_grid.sh [out.jsonl] [calib_size]
set -u
OUT="${1:-/tmp/grid.jsonl}"
CALIB="${2:-32}"
MODELS=(
  vit_tiny_patch16_224
  vit_small_patch32_224
  vit_small_patch16_224
  vit_base_patch16_224
  vit_base_patch16_384
  deit_tiny_patch16_224
  deit_small_patch16_224
  deit_base_patch16_224
  deit_base_patch16_384
  swin_tiny_patch4_window7_224
  swin_small_patch4_window7_224
  swin_base_patch4_window7_224
  swin_base_patch4_window12_384
)
: > "$OUT"
for m in "${MODELS[@]}"; do
  BENCH_MODEL="$m" BENCH_CALIB="$CALIB" timeout 3600 python "$(dirname "$0")/../bench.py" \
    >> "$OUT" 2>> "$OUT.err" || echo "{\"metric\": \"$m\", \"error\": true}" >> "$OUT"
done
cat "$OUT"
