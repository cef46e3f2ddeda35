#!/bin/bash
# Chain behind the r5 queue loop: wait until it finishes (pidfile gone or
# process dead), then run the r5b cells across outages.
cd "$(dirname "$0")/.."
# Gate on BOTH the r5 loop pid (if its pidfile survives) AND the r5 done
# markers: the pidfile lives in /tmp (wiped between sessions), so the
# markers are the durable signal that the headline cells are finished and
# the device is free of r5 contention.
r5_done() {
  for n in hl_vit32 hl_swin32 hl_vit128 hl_swin128 w6a6_refill lg_vit224 lg_vit384 lg_swin224 lg_swin384; do
    [ -e "artifacts/r5_done/$n.ok" ] || return 1
  done
  return 0
}
while kill -0 "$(cat /tmp/r5loop.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
# r5 loop pid gone.  If its cells are incomplete and its log shows no
# terminal line, a fresh session may have relaunched it without the
# pidfile — grace-wait up to ~2h, then proceed (no pid = no contention).
i=0
while ! r5_done \
      && ! grep -qE "queue loop: (COMPLETE|gave up)" artifacts/device_log_r5.txt 2>/dev/null \
      && [ "$i" -lt 30 ]; do
  sleep 240; i=$((i+1))
done
for i in $(seq 1 60); do
  if bash scripts/device_queue_r5b.sh artifacts/device_log_r5.txt; then
    echo "r5b loop: COMPLETE after $i launches" >> artifacts/device_log_r5.txt
    exit 0
  fi
  echo "r5b loop: relaunch $i at $(date), sleeping 300s" >> artifacts/device_log_r5.txt
  sleep 300
done
