#!/bin/bash
# Round-4 device work queue: probe-gated per step (ADVICE r3: no more
# multi-hour queues that keep running blind after the window closes) and
# RESUMABLE via done-markers in artifacts/r4_done/, so the watchdog can
# relaunch it across windows and it continues where it left off.
# Ordered by value-per-minute (VERDICT r3 items 2, 6, 3, then A/Bs).
#   scripts/device_queue_r4.sh [logfile]
set -u
export BENCH_STRICT_EXIT=1   # probe-failed bench runs exit 3 -> no done-marker
LOG="${1:-artifacts/device_log_r4.txt}"
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_done

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256), jnp.bfloat16); print('probe-ok', float((x@x).sum()))" >> "$LOG" 2>&1
}
await() {  # up to ~20 min of patience, then give up on this window
  for i in 1 2 3 4 5; do
    probe && return 0
    echo "probe failed ($i/5) at $(date), sleeping 240s" >> "$LOG"
    sleep 240
  done
  return 1
}
run() {  # run <name> <timeout_s> <cmd...>; probe-gates, marks done on exit 0
  local name="$1" t="$2"; shift 2
  if [ -e "artifacts/r4_done/$name.ok" ]; then
    echo "skip $name (done)" >> "$LOG"
    return 0
  fi
  if ! await; then
    echo "WINDOW CLOSED before $name at $(date); queue exits (watchdog will relaunch)" >> "$LOG"
    exit 1
  fi
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    touch "artifacts/r4_done/$name.ok"
    echo "--- exit 0 [$name done] ---" >> "$LOG"
  else
    echo "--- exit $? [$name FAILED, will retry next launch] ---" >> "$LOG"
  fi
}

# 1. headline 128-img flagships with the round-3 levers now default-on
#    (SB=16 sample-blocked grid steps + auto head-folded dense-K dots):
#    Swin-B/384 @128 was the weakest published ratio (6.57 min, 10.5x)
run sw128   2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run vit128  1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py

# 2. serving incl. fused_relaxed (VERDICT 6: the mode's justification is
#    throughput past the ~770 img/s VPU ceiling — measure it or cut it)
run serve_vit  1800 env BENCH_PROBE_MAX=2 python bench_infer.py
run serve_swin 1800 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench_infer.py

# 3. 32-img config x bits grid cells (VERDICT 3): BasePTQ (now correctly
#    hessian-metric per the reference cfg_modifier) and W6A6 across the zoo
run grid32_baseptq 7200 env BENCH_PROBE_MAX=2 BENCH_CONFIG=BasePTQ bash scripts/run_grid.sh artifacts/grid32_baseptq_r4.jsonl 32
run grid32_w6a6    7200 env BENCH_PROBE_MAX=2 BENCH_BITS=6,6 bash scripts/run_grid.sh artifacts/grid32_w6a6_r4.jsonl 32

# 4. 128-img grid for the whole zoo (VERDICT 2; reference README 128 column)
run grid128 14400 env BENCH_PROBE_MAX=2 bash scripts/run_grid.sh artifacts/grid128_r4.jsonl 128

# 5. Swin-B/384 128-img lever A/Bs (isolate SB and fold; PALLAS=0 cohorts)
run ab_sw128_nosb   2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_MM_SB=1 python bench.py
run ab_sw128_nofold 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_MM_FOLD=1 python bench.py
run ab_sw128_nopallas 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_PALLAS=0 python bench.py

# 6. Swin-B/384 128-img attribution (where do the search seconds go now)
run attr_sw128 1200 python scripts/calib_attribution.py swin_base_patch4_window12_384 128

# 7. scorer micro A/Bs at Swin window shapes
run mmab_default 580 python scripts/mm_scorer_bench.py
run mmab_nosb    580 env PTQ4VIT_TPU_MM_SB=1 python scripts/mm_scorer_bench.py
run mmab_nofold  580 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py

# 8. fresh-run latency A/B (VERDICT 8): PTQ4VIT_TPU_DISPATCH_THREADS=4
#    overlaps the per-op search compile-loads that dominate a cold process;
#    all_minutes[0] of each run is the fresh number, [1] the warm control
run fresh_ab_vit_base    1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_PROBE_MAX=2 python bench.py
run fresh_ab_vit_threads 1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_DISPATCH_THREADS=4 python bench.py
run fresh_ab_sw_threads  1500 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_DISPATCH_THREADS=4 python bench.py

# 8b. linear-scorer p-loop layout (grid (M,O) + in-kernel candidate loop,
#     bitwise-equal, ~P x less DMA — ops/pallas_search._ploop_default):
#     micro A/B at the dominant shapes, then headline re-measures
run linab_ploop  1500 python scripts/linear_scorer_bench.py
run linab_legacy 2700 env PTQ4VIT_TPU_SCORER_PLOOP=0 python scripts/linear_scorer_bench.py
run sw128_r4b  2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run vit128_r4b 1800 env BENCH_MODEL=vit_base_patch16_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 python bench.py
run sw32_r4b   1200 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_PROBE_MAX=2 python bench.py
run vit32_r4b  1200 env BENCH_MODEL=vit_base_patch16_384 BENCH_PROBE_MAX=2 python bench.py

# 8c. matmul-scorer epilogue A/Bs at the extended shape matrix (rowsum
#     saves F-1 full-tile masked-reduction passes; fold was neutral-to-
#     negative at window-12 in the r4 micro — retune the auto heuristic
#     from this data)
run mmab2_default 900 python scripts/mm_scorer_bench.py
run mmab2_rowsum  900 env PTQ4VIT_TPU_MM_ROWSUM=1 python scripts/mm_scorer_bench.py
run mmab2_nofold  900 env PTQ4VIT_TPU_MM_FOLD=1 python scripts/mm_scorer_bench.py

# 9. sequential mode (reference quant_calib.py:360-378) with the shared
#    compiled-once capture plan — first-ever device timing of the mode that
#    was "practically unusable" under per-step remote compiles (VERDICT
#    weak 6); A/B against the legacy structural captures on the small model
run seq_vit_base 2700 env BENCH_MODEL=vit_base_patch16_384 BENCH_SEQUENTIAL=1 BENCH_PROBE_MAX=2 python bench.py
run seq_vit_small 1800 env BENCH_MODEL=vit_small_patch16_224 BENCH_SEQUENTIAL=1 BENCH_PROBE_MAX=2 python bench.py
run seq_vit_small_legacy 3600 env BENCH_MODEL=vit_small_patch16_224 BENCH_SEQUENTIAL=1 BENCH_REPEATS=1 BENCH_PROBE_MAX=2 PTQ4VIT_TPU_SEQ_SHARED=0 python bench.py
run seq_swin_base 2700 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_SEQUENTIAL=1 BENCH_PROBE_MAX=2 python bench.py

# 10. the grid128 swin_base/384 cell ran in a degraded window (8.72 min,
#     probe 48.8 vs the dedicated run's 4.77 @ 56.4) — append a retry row
#     to the artifact so the grid file itself carries a healthy number
run grid128_swin_retry 2400 env BENCH_MODEL=swin_base_patch4_window12_384 BENCH_CALIB=128 BENCH_PROBE_MAX=2 bash -c 'python bench.py >> artifacts/grid128_r4.jsonl 2>> artifacts/grid128_r4.jsonl.err'

# exit 0 only when every step is done, so a relaunch loop knows to continue
missing=""
for n in sw128 vit128 serve_vit serve_swin grid32_baseptq grid32_w6a6 \
         grid128 ab_sw128_nosb ab_sw128_nofold ab_sw128_nopallas \
         attr_sw128 mmab_default mmab_nosb mmab_nofold \
         fresh_ab_vit_base fresh_ab_vit_threads fresh_ab_sw_threads \
         linab_ploop linab_legacy sw128_r4b vit128_r4b sw32_r4b vit32_r4b \
         mmab2_default mmab2_rowsum mmab2_nofold \
         seq_vit_base seq_vit_small seq_vit_small_legacy seq_swin_base \
         grid128_swin_retry; do
  [ -e "artifacts/r4_done/$n.ok" ] || missing="$missing $n"
done
echo "QUEUE PASS DONE $(date), missing:${missing:- none}" >> "$LOG"
[ -z "$missing" ]
