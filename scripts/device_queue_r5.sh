#!/bin/bash
# Round-5 device queue (VERDICT r4 items 2, 4a, 7):
#   1-4. variance-hardened headline cells — ViT-B/384 + Swin-B/384 at 32 and
#        128 imgs, 4 repeats each (run 1 absorbs cold compiles, median over
#        the 3 warm repeats) with a weather-probe stamp before EVERY repeat,
#        so README/BENCH_NOTES can quote medians with per-run probe evidence
#        (reconciles the 4.77-vs-7.3 Swin@128 discrepancy).
#   5.   refill the W6A6 Swin-B/384@32 hole in grid32_w6a6_r4.jsonl (the
#        run_grid resume-grep only re-runs the missing cell).
#   6-9. large-variant rows (vit_large 224/384, swin_large 224/384) at 32
#        imgs — reference grid names with no published reference timing
#        (vs_baseline stays null); proves the HBM planner at 1.5-2x the
#        flagship sizes.
# Probe-gated + resumable like r4/r4d: rerun after an outage and completed
# cells are skipped via artifacts/r5_done markers.
#   scripts/device_queue_r5.sh [logfile]
set -u
export BENCH_STRICT_EXIT=1
export BENCH_MAX_WAIT_S=240    # the queue's own await loop provides patience
export BENCH_HARD_TIMEOUT_S=10000  # per-cell `timeout` values are the real bound
LOG="${1:-artifacts/device_log_r5.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_done

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
  if [ -e "artifacts/r5_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"
    return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); queue exits (rerun to resume)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r5_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

# 1-4. headline variance study: 4 repeats, median over the warm 3
run hl_vit32   2400 env BENCH_MODEL=vit_base_patch16_384        BENCH_CALIB=32  BENCH_REPEATS=4 python bench.py
run hl_swin32  3000 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=32  BENCH_REPEATS=4 python bench.py
run hl_vit128  4200 env BENCH_MODEL=vit_base_patch16_384        BENCH_CALIB=128 BENCH_REPEATS=4 python bench.py
run hl_swin128 10800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=4 python bench.py

# 5. W6A6 grid hole: resume-grep in run_grid.sh skips the 12 done cells
run w6a6_refill 4200 env BENCH_BITS=6,6 bash scripts/run_grid.sh artifacts/grid32_w6a6_r4.jsonl 32

# 6-9. large variants, 32 imgs (no reference-published timing -> null)
run lg_vit224  3600 env BENCH_MODEL=vit_large_patch16_224         BENCH_CALIB=32 BENCH_REPEATS=2 python bench.py
run lg_vit384  5400 env BENCH_MODEL=vit_large_patch16_384         BENCH_CALIB=32 BENCH_REPEATS=2 python bench.py
run lg_swin224 5400 env BENCH_MODEL=swin_large_patch4_window7_224 BENCH_CALIB=32 BENCH_REPEATS=2 python bench.py
run lg_swin384 7200 env BENCH_MODEL=swin_large_patch4_window12_384 BENCH_CALIB=32 BENCH_REPEATS=2 python bench.py

missing=""
for n in hl_vit32 hl_swin32 hl_vit128 hl_swin128 w6a6_refill lg_vit224 lg_vit384 lg_swin224 lg_swin384; do
  [ -e "artifacts/r5_done/$n.ok" ] || missing="$missing $n"
done
if [ -n "$missing" ]; then
  echo "queue incomplete, missing:$missing" >> "$LOG"
  exit 1
fi
echo "r5 queue COMPLETE at $(date)" >> "$LOG"
exit 0
