#!/bin/bash
# Probe the axon tunnel every ~4 min; when a trivial matmul probe succeeds,
# fire scripts/device_queue.sh once and exit.  Bounded to ~11 h of waiting.
set -u
LOG="${1:-/tmp/device_queue.log}"
cd "$(dirname "$0")/.."
for i in $(seq 1 160); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe-ok', float((x@x).sum()))" >> "$LOG" 2>&1; then
    echo "TUNNEL HEALTHY at $(date), running queue" >> "$LOG"
    bash scripts/device_queue.sh "$LOG"
    exit 0
  fi
  echo "probe $i failed at $(date), sleeping 240s" >> "$LOG"
  sleep 240
done
echo "WATCHDOG GAVE UP $(date)" >> "$LOG"
