#!/bin/bash
# Round-4c device queue: healthy-window re-measures of the headline cells
# with BOTH round-4 scorer levers now default-on (linear p-loop in-kernel
# candidate loop + folded-matmul rowsum epilogue).  The r4b re-measures in
# device_log_r4.txt caught the 32-img cells in a good window (ViT-B/384
# 0.321 min / 37.3x, Swin-B/384 0.471 min / 53.1x) but the 128-img retries
# landed in a degraded window (Swin 11.0 min @ probe 57 vs best 4.77) or an
# outright outage (ViT) — these cells are search-dominated, so the levers
# should move them the most.  Probe-gated + resumable like r4.
#   scripts/device_queue_r4c.sh [logfile]
set -u
export BENCH_STRICT_EXIT=1
LOG="${1:-artifacts/device_log_r4c.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4c_done

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
  if [ -e "artifacts/r4c_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"
    return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); queue exits (watchdog will relaunch)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r4c_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

# 1. the search-dominated 128-img headliners (biggest expected movement)
run vit128_r4c 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run sw128_r4c  2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 2. reproduce the 32-img records within +-10% (BENCH_NOTES convention:
#    headline numbers are best-of-repeats, reproduced at least twice)
run vit32_r4c 1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_PROBE_MAX=2 python bench.py
run sw32_r4c  1200 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py

# 3. refresh the 128-img grid rows for the two flagships so the grid
#    artifact carries post-lever numbers (append rows, keep history)
run grid128_vit_refresh 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 bash -c 'python bench.py >> artifacts/grid128_r4.jsonl 2>> artifacts/grid128_r4.jsonl.err'

missing=""
for n in vit128_r4c sw128_r4c vit32_r4c sw32_r4c grid128_vit_refresh; do
  [ -e "artifacts/r4c_done/$n.ok" ] || missing="$missing $n"
done
if [ -n "$missing" ]; then
  echo "queue incomplete, missing:$missing" >> "$LOG"
  exit 1
fi
echo "r4c queue COMPLETE at $(date)" >> "$LOG"
exit 0
