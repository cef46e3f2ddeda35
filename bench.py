#!/usr/bin/env python
"""Headline benchmark: full PTQ4ViT calibration (hessian metric, twin
quantizers, eq_n=100, 3 search rounds) of ViT-B/384 with 32 calibration
images, wall-clock minutes on one TPU chip.

Reference baseline: 12 minutes on the reference's (unspecified) single GPU
(README.md:33; BASELINE.md).  North star: < 2 minutes.  Calibration time is
weight-independent, so synthetic weights/images time exactly what the real
pipeline costs.

stdout contract (all lines are JSON; consumers take the LAST one):
  1. an interim startup line ({"interim": true, "startup": true, ...})
     printed before any JAX import, so whatever kills the process later
     still leaves a parseable row pointing at last_measured;
  2. the final row {"metric": ..., "value": best-of minutes, "median":
     median over healthy warm repeats, "unit": "min", "vs_baseline": ...}.
Per-repeat rows go to stderr.
"""
import json
import os
import threading
import time

MODEL = os.environ.get("BENCH_MODEL", "vit_base_patch16_384")
CALIB = int(os.environ.get("BENCH_CALIB", "32"))
# the reference grid also crosses configs {PTQ4ViT, BasePTQ} and bits
# {(8,8), (6,6)} (example/test_all.py:100-113); expose both so device
# windows can time those cells too.  Non-default settings suffix the
# metric name so artifact rows never mix cells.
CONFIG = os.environ.get("BENCH_CONFIG", "PTQ4ViT")
_bits_raw = os.environ.get("BENCH_BITS", "8,8")
BITS = tuple(int(b) for b in _bits_raw.split(","))
if len(BITS) != 2:
    raise SystemExit(f"BENCH_BITS must be 'w,a' (two ints), got {_bits_raw!r}")
# the reference grid applies cfg_modifier(metric="hessian") to EVERY cell —
# including BasePTQ (example/test_all.py:100-113) — so grid parity means the
# BasePTQ cells run the hessian metric (gradient capture included), not
# BasePTQ's own cosine default.  BENCH_METRIC=config opts back into the raw
# config metric (suffixed in the metric name so rows never mix).
METRIC = os.environ.get("BENCH_METRIC", "hessian")
# BENCH_SEQUENTIAL=1 times the reference's sequential mode
# (quant_calib.py:360-378: each op captured under the already-quantized
# prefix) — practical on the tunneled TPU only because the shared
# compiled-once capture plan (calib/capture.py SequentialCapturePlan)
# removes the O(num_ops) per-step compiles.  Suffixed in the metric name.
SEQUENTIAL = os.environ.get("BENCH_SEQUENTIAL") == "1"
# reference calibration minutes (README.md:28-40) per (model, calib size)
_BASELINES = {
    "vit_small_patch32_224": {32: 2, 128: 5},
    "vit_small_patch16_224": {32: 3, 128: 7},
    "vit_base_patch16_224": {32: 4, 128: 13},
    "vit_base_patch16_384": {32: 12, 128: 43},
    "deit_small_patch16_224": {32: 3, 128: 7},
    "deit_base_patch16_224": {32: 4, 128: 16},
    "deit_base_patch16_384": {32: 14, 128: 52},
    "swin_tiny_patch4_window7_224": {32: 3, 128: 9},
    "swin_small_patch4_window7_224": {32: 8, 128: 17},
    "swin_base_patch4_window7_224": {32: 10, 128: 23},
    "swin_base_patch4_window12_384": {32: 25, 128: 69},
}
# None when the reference README published no timing for this cell —
# vs_baseline is then reported null instead of inventing a denominator
_b = _BASELINES.get(MODEL, {}).get(CALIB)
BASELINE_MIN = float(_b) if _b is not None else None


def _await_healthy_device(max_wait_s: float, probe_timeout: int = 120,
                          sleep_s: int = 60) -> bool:
    """Probe the backend with a trivial matmul in a SUBPROCESS (a hung PJRT
    client cannot be recovered in-process) before committing to the run.

    The axon tunnel has full-outage windows where even jax.devices() hangs;
    without this, a driver-invoked bench would hang forever instead of either
    waiting out the outage or failing honestly.  Total patience is HARD
    bounded by `max_wait_s` (BENCH_MAX_WAIT_S, default 600 s): round 4's
    bench was still inside its ~30 min probe loop when the driver's own
    timeout killed it, so the round's scoreboard entry was an unparseable
    rc=124.  Better to give up early and print the last_measured fallback.
    """
    import subprocess
    import sys
    probe = os.environ.get(
        "BENCH_PROBE_PY",
        "import jax, jax.numpy as jnp; "
        "x = jnp.ones((256, 256), jnp.bfloat16); "
        "print(float((x @ x).sum()))")
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", probe_timeout))
    sleep_s = int(os.environ.get("BENCH_PROBE_SLEEP", sleep_s))
    # legacy knob (pre-r5 queue scripts): BENCH_PROBE_MAX=N meant "give up
    # after N probes" — map it onto the wall-clock bound when the caller
    # didn't set BENCH_MAX_WAIT_S itself
    if "BENCH_MAX_WAIT_S" not in os.environ and "BENCH_PROBE_MAX" in os.environ:
        n = max(1, int(os.environ["BENCH_PROBE_MAX"]))
        max_wait_s = min(max_wait_s, n * probe_timeout + (n - 1) * sleep_s)
    deadline = time.time() + max_wait_s
    while True:
        budget = deadline - time.time()
        if budget <= 0:
            return False
        try:
            subprocess.run([sys.executable, "-c", probe],
                           timeout=max(1, min(probe_timeout, budget)),
                           check=True, capture_output=True)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() + sleep_s >= deadline:
                return False
            time.sleep(sleep_s)


# Amortized bf16 rate (CLAUDE.md) — physical ceiling for the probe; any
# stamp above ~1.5x this cannot be a real execution.  NOTE the probe's
# EMPIRICAL healthy band is lower: one 16-dot chain is a single dispatch
# whose time includes the tunnel round-trip, so healthy windows stamp
# ~50-62 (median ~56 across the r4 grids); degraded windows stamp <40
# (e.g. 6.6 during a near-outage).  Cross-ref a run's stamp against that
# band, not against 112.
HEALTHY_BF16_TFLOPS = 112.0
# empirical floor of the healthy probe band: rows stamped below this ran in
# a degraded tunnel window and carry "window_degraded": true so harvesting
# can't mistake them for real regressions (or real speedups — the r4 W6A6
# grid had a 6.6-TFLOP/s row whose minutes were ~6x off its class)
DEGRADED_BF16_TFLOPS = 40.0

_final_lock = threading.Lock()
_final_emitted = False


def _emit_final(obj) -> bool:
    """Print the run's FINAL stdout JSON line exactly once (the watchdog and
    the main thread race for it during an outage)."""
    global _final_emitted
    with _final_lock:
        if _final_emitted:
            return False
        _final_emitted = True
        print(json.dumps(obj), flush=True)
        return True


def _start_watchdog(metric: str, hard_timeout_s: float):
    """Last-resort guarantee that stdout gets a parseable final line: if the
    measured run itself wedges on a tunnel outage (post-probe), print the
    last_measured fallback and exit before the DRIVER's own timeout turns
    the round's scoreboard entry into rc=124/parsed=null (BENCH_r04)."""
    fallback = {
        "metric": metric, "value": None, "unit": "min", "vs_baseline": None,
        "error": f"watchdog: run exceeded BENCH_HARD_TIMEOUT_S="
                 f"{hard_timeout_s:.0f}s (tunnel outage mid-run, or a "
                 "cold-cache run bigger than this budget — raise the env "
                 "var for legitimately long cells)",
        "last_measured": _last_measured(metric)}

    def _fire():
        time.sleep(hard_timeout_s)
        if _emit_final(fallback):
            # queue mode (BENCH_STRICT_EXIT=1): a watchdog-killed run must
            # NOT count as done — exit nonzero so the resumable queue
            # retries the cell (warm caches make the retry much faster).
            # Driver mode: exit 0 with the parseable fallback line.
            os._exit(3 if os.environ.get("BENCH_STRICT_EXIT") == "1" else 0)

    threading.Thread(target=_fire, daemon=True).start()


def _probe_tflops():
    """Amortized bf16 matmul throughput right now, in (TFLOP/s, invalid) —
    quantifies tunnel weather (healthy chip ≈ 112, CLAUDE.md).  16 chained
    4096³ dots in ONE dispatch so the ~130 ms tunnel latency doesn't
    dominate.  Runs BEFORE the timed calibration so it cannot perturb the
    metric.

    Round-3's committed artifact stamped 13664 TFLOP/s — physically
    impossible (~122x the chip), i.e. the second identical-args dispatch
    never actually executed (result reuse somewhere behind the tunnel).
    Defenses: the timed call gets DISTINCT random operands from the warm-up
    call, the scalar is device_get (full round-trip), and any reading above
    1.5x the healthy rate is flagged invalid instead of trusted."""
    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "cpu":
        return None, False
    try:
        @jax.jit
        def chain(x, w):
            for _ in range(16):
                x = x @ w
            return x.sum()
        k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
        shape = (4096, 4096)
        xw = jax.random.normal(k1, shape, jnp.bfloat16), \
            jax.random.normal(k2, shape, jnp.bfloat16)
        jax.device_get(chain(*xw))               # compile + warm
        xw2 = jax.random.normal(k3, shape, jnp.bfloat16), \
            jax.random.normal(k4, shape, jnp.bfloat16)
        for a in xw2:
            a.block_until_ready()                # materialize before timing
        t0 = time.time()
        jax.device_get(chain(*xw2))
        dt = time.time() - t0
        tflops = round(16 * 2 * 4096**3 / dt / 1e12, 1)
        return tflops, tflops > 1.5 * HEALTHY_BF16_TFLOPS
    except Exception:
        return None, False


def _last_measured(metric: str):
    """Best committed measurement of `metric` across the grid, bench and
    device-window artifacts — so an outage-time bench failure can still
    point at the last real measurement (clearly marked as such, value stays
    null), and a contention-window success can cite the machine's real
    number."""
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    paths = (sorted(glob.glob(os.path.join(here, "GRID_r*.jsonl")))
             + sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
             + sorted(glob.glob(os.path.join(here, "artifacts",
                                             "DEVICE_RESULTS_*.jsonl"))))
    for path in paths:
        try:
            for line in open(path):
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if (row.get("metric") == metric and row.get("value")
                        and not row.get("interim")
                        and not row.get("window_degraded")
                        and (best is None or row["value"] < best["value"])):
                    best = {"value": row["value"],
                            "vs_baseline": row.get("vs_baseline"),
                            "from": os.path.basename(path)}
        except Exception:
            continue
    return best


def main():
    metric = f"ptq4vit_calib_minutes_{MODEL}_{CALIB}imgs"
    if CONFIG != "PTQ4ViT":
        metric += f"_{CONFIG.lower()}"
    if BITS != (8, 8):
        metric += f"_w{BITS[0]}a{BITS[1]}"
    if METRIC != "hessian":
        metric += f"_{METRIC}"
    if SEQUENTIAL:
        metric += "_sequential"
        if os.environ.get("PTQ4VIT_TPU_SEQ_SHARED") == "0":
            metric += "_legacy"   # per-op structural captures A/B arm
    # published reference timings are the PTQ4ViT W8A8 cells; any other
    # cell has no denominator
    global BASELINE_MIN
    if CONFIG != "PTQ4ViT" or BITS != (8, 8) or SEQUENTIAL:
        BASELINE_MIN = None
    # FIRST byte out is a parseable interim line, printed before any JAX
    # import or device touch — whatever kills this process later (driver
    # timeout, tunnel outage, OOM), the round's scoreboard channel already
    # holds valid JSON pointing at the last committed measurement.
    print(json.dumps({
        "metric": metric, "interim": True, "startup": True,
        "value": None, "unit": "min", "vs_baseline": None,
        "last_measured": _last_measured(metric)}), flush=True)
    # ... and a watchdog guarantees a FINAL line even if the run wedges
    # post-probe (default 40 min, well under typical driver budgets).
    _start_watchdog(metric,
                    float(os.environ.get("BENCH_HARD_TIMEOUT_S", "2400")))
    if os.environ.get("BENCH_TEST_HANG_S"):   # outage simulation (tests)
        time.sleep(float(os.environ["BENCH_TEST_HANG_S"]))
    if os.environ.get("BENCH_SKIP_PROBE") != "1" and not _await_healthy_device(
            max_wait_s=float(os.environ.get("BENCH_MAX_WAIT_S", "600"))):
        _emit_final({
            "metric": metric,
            "value": None, "unit": "min", "vs_baseline": None,
            "error": "device unreachable: trivial matmul probe hung/failed "
                     "(axon tunnel outage)",
            "last_measured": _last_measured(metric)})
        if os.environ.get("BENCH_STRICT_EXIT") == "1":
            # queue mode: a probe-failed run must NOT count as done
            # (the driver's own invocations stay exit-0 tolerant)
            raise SystemExit(3)
        return
    # persistent XLA compilation cache: repeat runs (and the driver's bench
    # invocations) skip the expensive compiles
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import apply_modifier, get_config
    from ptq4vit_tpu.models import get_net
    from ptq4vit_tpu.utils.synthetic import synthetic_images

    net = get_net(MODEL)
    calib = synthetic_images(CALIB, net.cfg.img_size, seed=3)

    import jax.numpy as jnp
    cache_dtype = (jnp.bfloat16
                   if os.environ.get("BENCH_CACHE_DTYPE") == "bfloat16"
                   else None)

    def make_cfg():
        # the reference grid runs EVERY cell through
        # cfg_modifier(metric="hessian", bit_setting=..., (1,1,1))
        # (example/test_all.py:48-78,107-113) — a no-op for the default
        # PTQ4ViT W8A8 cell, but it switches BasePTQ cells from their
        # config-default cosine metric onto hessian (with gradient capture),
        # which is the workload the published grid actually times.
        cfg = get_config(CONFIG)
        apply_modifier(cfg, bit_setting=BITS,
                       metric=None if METRIC == "config" else METRIC)
        return cfg

    def one_run():
        t0 = time.time()
        calibrator = HessianQuantCalibrator(net, make_cfg(), calib,
                                            sequential=SEQUENTIAL,
                                            batch_size=4,
                                            cache_dtype=cache_dtype)
        qstate = calibrator.batching_quant_calib(verbose=False)
        # force completion: fetch the (tiny) calibrated intervals — on the
        # axon backend block_until_ready can return before execution ends
        qstate = jax.device_get(qstate)
        minutes = (time.time() - t0) / 60.0
        assert len(qstate) == len(net.op_inventory)
        return minutes, calibrator.report

    # the tunneled chip has contention windows where identical warm runs
    # degrade 1.5-10x (BENCH_NOTES.md); best-of-N reports the machine, not
    # the tunnel weather.  Run 1 also absorbs any cold compiles.
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    runs = []
    import sys
    errors = []
    probes = []       # weather stamp taken immediately BEFORE each repeat
    for i in range(max(1, repeats)):
        # a single crashed repeat (e.g. the tunnel's remote compile helper
        # SIGTERMing mid-compile, seen as JaxRuntimeError HTTP 500) must not
        # lose the other repeats — every compile that DID land is in the
        # persistent cache, so the next repeat resumes warm
        probes.append(_probe_tflops())
        try:
            runs.append(one_run() + (i,))
        except Exception as e:
            errors.append(f"run {i + 1}: {type(e).__name__}: {e}")
            print(json.dumps({"metric": metric, "interim": True,
                              "run": i + 1, "error": errors[-1][:500]}),
                  file=sys.stderr, flush=True)
            continue
        # interim row on STDERR after every repeat: a timeout mid-run-2 no
        # longer loses run 1's measurement (stdout stays ONE json line);
        # device-window logs capture 2>&1, the harvester keeps the rows
        print(json.dumps({"metric": metric, "interim": True,
                          "run": i + 1, "value": round(runs[-1][0], 3),
                          "probe_bf16_tflops": probes[-1][0],
                          "unit": "min"}), file=sys.stderr, flush=True)
    if not runs:
        _emit_final({
            "metric": metric, "value": None, "unit": "min",
            "vs_baseline": None,
            "error": f"all {max(1, repeats)} runs failed: {errors[-1][:500]}",
            "last_measured": _last_measured(metric)})
        if os.environ.get("BENCH_STRICT_EXIT") == "1":
            raise SystemExit(3)
        return
    minutes, r, best_i = min(runs, key=lambda mr: mr[0])

    # median over WARM repeats only (run 1 absorbs cold compiles — including
    # it would penalize fresh-cache invocations for compile time, which the
    # reference baselines don't include either), and only over repeats whose
    # OWN weather probe was healthy — a degraded-window repeat measures the
    # tunnel, not the machine, and must not poison the variance-honest
    # median (the flag-less 6.6-TFLOP/s row in the r4 W6A6 grid is the
    # precedent).  With no healthy warm repeat, fall back to all warm runs.
    def _run_healthy(i):
        p = probes[i][0]
        return p is None or p >= DEGRADED_BF16_TFLOPS

    warm_all = [(m, i) for m, _, i in runs if i > 0]
    warm = sorted(m for m, i in warm_all if _run_healthy(i))
    n_excluded = len(warm_all) - len(warm)
    if not warm:
        warm = sorted(m for m, _ in warm_all) or [minutes]
    median = warm[len(warm) // 2] if len(warm) % 2 else (
        warm[len(warm) // 2 - 1] + warm[len(warm) // 2]) / 2
    capture_s = r.capture_seconds
    search_s = sum(r.search_seconds.values())
    probe_tflops, probe_invalid = probes[best_i]
    out = {
        "metric": metric,
        "value": round(minutes, 3),
        "unit": "min",
        "vs_baseline": (round(BASELINE_MIN / minutes, 2)
                        if BASELINE_MIN is not None else None),
        "median": round(median, 3),
        "median_vs_baseline": (round(BASELINE_MIN / median, 2)
                               if BASELINE_MIN is not None else None),
        # the exact runs the median was taken over (crashed repeats are
        # absent from all_minutes, so "skip the first entry" is NOT a valid
        # way to recover the warm list downstream)
        "warm_minutes": [round(m, 3) for m in warm],
        **({"median_excluded_degraded_runs": n_excluded}
           if n_excluded else {}),
        "capture_s": round(capture_s, 1),
        "search_s": round(search_s, 1),
        "target_s": round(r.target_seconds, 1),
        "sync_s": round(r.sync_seconds, 1),
        # capture is pipelined behind searches, so phase seconds can sum
        # past wall-clock; the excess is reported as overlap, not a
        # negative "other"
        "other_s": round(max(0.0, minutes * 60 - capture_s - search_s
                             - r.target_seconds - r.sync_seconds), 1),
        "overlap_s": round(max(0.0, capture_s + search_s + r.target_seconds
                               + r.sync_seconds - minutes * 60), 1),
        "all_minutes": [round(m, 3) for m, _, _ in runs],
        "probe_per_run": [p for p, _ in probes],
    }
    if probe_tflops is not None:
        out["probe_bf16_tflops"] = probe_tflops  # healthy chip ≈ 112
        if probe_invalid:
            out["probe_invalid"] = True          # physically impossible read
        if probe_tflops < DEGRADED_BF16_TFLOPS:
            # tunnel was in a degraded window when this row ran: the minutes
            # measure the weather, not the machine — self-describe so
            # harvesting and the grid artifacts never mix such rows in
            out["window_degraded"] = True
    best = _last_measured(metric)
    if best and best["value"] and minutes > 1.3 * best["value"]:
        # this run landed in a tunnel contention window (BENCH_NOTES.md);
        # point at the best committed measurement of the same metric
        out["best_recorded"] = best
    _emit_final(out)


if __name__ == "__main__":
    main()
