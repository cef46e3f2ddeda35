#!/bin/bash
# Probe the axon tunnel every SLEEP_S seconds (default ~4 min); when a
# trivial matmul probe succeeds, fire scripts/device_queue.sh once and
# exit.  Bounded to N_PROBES attempts (~11 h at the defaults).
set -u
LOG="${1:-/tmp/device_queue.log}"
SLEEP_S="${WATCHDOG_SLEEP_S:-240}"
N_PROBES="${WATCHDOG_N_PROBES:-160}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N_PROBES"); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe-ok', float((x@x).sum()))" >> "$LOG" 2>&1; then
    echo "TUNNEL HEALTHY at $(date), running queue" >> "$LOG"
    bash scripts/device_queue.sh "$LOG"
    exit 0
  fi
  echo "probe $i failed at $(date), sleeping ${SLEEP_S}s" >> "$LOG"
  sleep "$SLEEP_S"
done
echo "WATCHDOG GAVE UP $(date)" >> "$LOG"
