#!/bin/bash
# Round-5c device cells: (a) warm DISPATCH_THREADS=4 A/B on ViT-B/384@128 —
# settles whether the round-5 2.2x @128 inflation is dispatch-RTT
# serialization (threads recover it) or sustained device/tunnel contention
# (they don't); (b) a later-window re-sample of both @128 flagship cells for
# cross-window variance evidence feeding the BENCH_NOTES reconciliation.
# Probe-gated + resumable (artifacts/r5c_done markers).
set -u
export BENCH_STRICT_EXIT=1
export BENCH_MAX_WAIT_S=240
export BENCH_HARD_TIMEOUT_S=5000
LOG="${1:-artifacts/device_log_r5.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5c_done

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
  if [ -e "artifacts/r5c_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"; return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); r5c exits (rerun to resume)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r5c_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

run ab_vit128_threads 5400 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_REPEATS=2 PTQ4VIT_TPU_DISPATCH_THREADS=4 python bench.py
run resample_vit128   5400 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_REPEATS=2 python bench.py
run resample_swin128  7200 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=2 python bench.py

for n in ab_vit128_threads resample_vit128 resample_swin128; do
  [ -e "artifacts/r5c_done/$n.ok" ] || exit 1
done
echo "r5c queue COMPLETE at $(date)" >> "$LOG"
exit 0
