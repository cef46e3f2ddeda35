#!/bin/bash
# 13-model calibration grid on the real TPU (reference example/test_all.py
# model list).  One FINAL JSON line per model via bench.py (its interim
# startup rows are filtered out of the artifact); run TWICE for
# warm-cache numbers (the persistent XLA cache makes run 2 compile-free).
#   scripts/run_grid.sh [out.jsonl] [calib_size]
# RESUMABLE: a model whose metric already has a successful row in out.jsonl
# is skipped, so a mid-grid tunnel outage only costs the unfinished cells.
# BENCH_CONFIG/BENCH_BITS/BENCH_METRIC pass through to bench.py (which
# suffixes the metric name per cell, so mixed grids never collide).
set -u -o pipefail   # pipeline status = bench's exit, not grep's
OUT="${1:-/tmp/grid.jsonl}"
CALIB="${2:-32}"
# bench's own watchdog must not fire before this script's per-cell timeout
# (a cold-cache 128-img Swin cell can legitimately run ~50 min)
export BENCH_HARD_TIMEOUT_S="${BENCH_HARD_TIMEOUT_S:-$(( ${GRID_CELL_TIMEOUT:-3600} - 120 ))}"
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
touch "$OUT"
suffix=""
case "${BENCH_CONFIG:-PTQ4ViT}" in PTQ4ViT) ;; *) suffix="${suffix}_$(echo "${BENCH_CONFIG}" | tr 'A-Z' 'a-z')";; esac
case "${BENCH_BITS:-8,8}" in 8,8) ;; *) suffix="${suffix}_w${BENCH_BITS%%,*}a${BENCH_BITS##*,}";; esac
case "${BENCH_METRIC:-hessian}" in hessian) ;; *) suffix="${suffix}_${BENCH_METRIC}";; esac
for m in "${MODELS[@]}"; do
  metric="ptq4vit_calib_minutes_${m}_${CALIB}imgs${suffix}"
  if grep -q "\"metric\": \"$metric\", \"value\": [0-9]" "$OUT" 2>/dev/null; then
    echo "skip $m (already measured in $OUT)"
    continue
  fi
  BENCH_MODEL="$m" BENCH_CALIB="$CALIB" timeout "${GRID_CELL_TIMEOUT:-3600}" \
    python "$(dirname "$0")/../bench.py" 2>> "$OUT.err" \
    | grep -v '"interim": true' >> "$OUT" \
    || echo "{\"metric\": \"$m\", \"error\": true}" >> "$OUT"
done
cat "$OUT"
# a queue cell invoking this script must not be marked done unless EVERY
# model has a measured row (a swallowed per-cell failure previously let
# resumable queues skip unfilled grid holes forever)
missing=0
for m in "${MODELS[@]}"; do
  metric="ptq4vit_calib_minutes_${m}_${CALIB}imgs${suffix}"
  grep -q "\"metric\": \"$metric\", \"value\": [0-9]" "$OUT" || { echo "MISSING: $metric"; missing=1; }
done
exit "$missing"
