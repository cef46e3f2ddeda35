#!/bin/bash
# Round-5b device cells: end-to-end serving ingest A/B (uint8 + pipelined
# ServingEngine vs naive f32 sync loop, scripts/serve_e2e_bench.py) and a
# device-path re-check of bench_infer after the probe-signature change.
# Probe-gated + resumable (artifacts/r5b_done markers).
set -u
export BENCH_STRICT_EXIT=1
export BENCH_MAX_WAIT_S=240
export BENCH_HARD_TIMEOUT_S=2200
LOG="${1:-artifacts/device_log_r5.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5b_done

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
  if [ -e "artifacts/r5b_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"; return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); r5b exits (rerun to resume)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r5b_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

run serve_e2e 2400 python scripts/serve_e2e_bench.py
run infer_recheck 2400 python bench_infer.py

for n in serve_e2e infer_recheck; do
  [ -e "artifacts/r5b_done/$n.ok" ] || exit 1
done
echo "r5b queue COMPLETE at $(date)" >> "$LOG"
exit 0
