#!/bin/bash
# Round-4d device queue: full-zoo 128-img grid refresh with BOTH round-4
# search levers default-on (linear p-loop in-kernel candidate loop +
# folded-matmul rowsum epilogue), so the committed 128-img grid artifact
# carries post-lever numbers for every model (the r4 grid128 rows for the
# B/384 flagships predate the levers; the swin row also landed in a
# degraded window).  Appends to a FRESH artifact to keep history.
# Also re-times sequential Swin-B/384 after the HBM OOM fix (single
# masked eps + micro-batch shrink, capture.SequentialCapturePlan).
# Probe-gated + resumable like r4/r4c.
#   scripts/device_queue_r4d.sh [logfile]
set -u
export BENCH_STRICT_EXIT=1
LOG="${1:-artifacts/device_log_r4d.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4d_done

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe-ok', float((x@x).sum()))" >> "$LOG" 2>&1
}
await() {
  for i in 1 2 3 4 5; do
    probe && return 0
    echo "probe failed ($i/5) at $(date), sleeping 240s" >> "$LOG"
    sleep 240
  done
  return 1
}
run() {
  local name="$1" t="$2"; shift 2
  if [ -e "artifacts/r4d_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"
    return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); queue exits (watchdog will relaunch)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r4d_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

# 1. sequential Swin-B/384, first timing after the OOM fix (plan shrinks
#    to micro-batch 2; fresh run pays the one shared-plan compile)
run seq_swin_base_r4d 3600 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_SEQUENTIAL=1 BENCH_PROBE_MAX=2 python bench.py

# 2. rowsum epilogue full-calibration A/B at Swin@128 (micro A/B said
#    1.3-1.5x; the one post-lever full run landed in a noisy window —
#    adjacent-window control: ROWSUM=0 right next to the r4c/r4d
#    default-on cells)
run sw128_ab_rowsum0 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_MM_ROWSUM=0 python bench.py

# 3. full 13-model 128-img grid with post-lever scorers (fresh artifact)
run grid128_r4d 18000 env BENCH_PROBE_MAX=2 bash scripts/run_grid.sh artifacts/grid128_r4d.jsonl 128

missing=""
for n in seq_swin_base_r4d sw128_ab_rowsum0 grid128_r4d; do
  [ -e "artifacts/r4d_done/$n.ok" ] || missing="$missing $n"
done
if [ -n "$missing" ]; then
  echo "queue incomplete, missing:$missing" >> "$LOG"
  exit 1
fi
echo "r4d queue COMPLETE at $(date)" >> "$LOG"
exit 0
