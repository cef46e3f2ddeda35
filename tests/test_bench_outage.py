"""The driver bench channel must be outage-proof.

Round 4's scoreboard entry was rc=124/parsed=null: bench.py sat in its
~30 min device-probe loop during an axon tunnel outage and the driver's own
timeout killed it before the first stdout byte.  These tests simulate a hung
probe (BENCH_PROBE_PY sleeps past the probe timeout) and a post-probe wedge
(BENCH_TEST_HANG_S) and assert that bench.py ALWAYS emits parseable JSON
lines on stdout within a bounded wall-clock:

  1. an interim line IMMEDIATELY at startup (before any JAX import), and
  2. a final line with the last_measured fallback once patience runs out.

Reference parity note: the reference has no driver-facing bench contract at
all (its timings are hand-published, README.md:28-40); this subsystem is
the TPU framework's failure-detection surface (SURVEY.md §5).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ)
    env.pop("BENCH_SKIP_PROBE", None)
    env.update(env_extra)
    t0 = time.time()
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env)
    wall = time.time() - t0
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    rows = [json.loads(ln) for ln in lines]   # every stdout line is JSON
    return proc, wall, rows


def test_hung_probe_emits_parseable_json_quickly():
    """Outage window: the probe subprocess hangs → startup interim line plus
    a final fallback line, all inside a small bounded wall-clock."""
    proc, wall, rows = _run({
        "BENCH_PROBE_PY": "import time; time.sleep(120)",  # hung tunnel
        "BENCH_PROBE_TIMEOUT": "2",
        "BENCH_PROBE_SLEEP": "1",
        "BENCH_MAX_WAIT_S": "6",
    })
    assert proc.returncode == 0
    assert wall < 45, f"bench took {wall:.0f}s under a simulated outage"
    assert len(rows) >= 2
    first, last = rows[0], rows[-1]
    assert first["interim"] and first.get("startup")
    assert "last_measured" in first
    assert last["value"] is None and "error" in last
    assert "last_measured" in last
    assert last["metric"].startswith("ptq4vit_calib_minutes_")
    # the fallback points at a real committed measurement of this metric
    lm = last["last_measured"]
    assert lm is None or (lm["value"] > 0 and "from" in lm)


def test_hung_probe_strict_exit_for_queue_mode():
    proc, _, rows = _run({
        "BENCH_PROBE_PY": "import time; time.sleep(120)",
        "BENCH_PROBE_TIMEOUT": "1",
        "BENCH_PROBE_SLEEP": "1",
        "BENCH_MAX_WAIT_S": "3",
        "BENCH_STRICT_EXIT": "1",
    })
    assert proc.returncode == 3          # queue retries this cell
    assert rows[-1]["value"] is None     # ... but stdout is still parseable


def test_watchdog_fires_on_post_probe_wedge():
    """A wedge AFTER the probe succeeded (mid-run outage) still produces a
    final parseable line: the watchdog prints the fallback and exits 0."""
    proc, wall, rows = _run({
        "BENCH_TEST_HANG_S": "30",       # simulated mid-run wedge
        "BENCH_HARD_TIMEOUT_S": "3",
        "BENCH_SKIP_PROBE": "1",
    })
    assert proc.returncode == 0
    assert wall < 30, "watchdog must fire long before the wedge clears"
    last = rows[-1]
    assert last["value"] is None
    assert "watchdog" in last["error"]
    assert "last_measured" in last


def test_startup_line_appears_before_any_waiting():
    """The FIRST stdout byte must not wait on the probe loop: stream the
    process and require the startup line within seconds even though the
    probe will then block for much longer."""
    env = dict(os.environ)
    env.pop("BENCH_SKIP_PROBE", None)
    env.update({
        "BENCH_PROBE_PY": "import time; time.sleep(120)",
        "BENCH_PROBE_TIMEOUT": "8",
        "BENCH_PROBE_SLEEP": "2",
        "BENCH_MAX_WAIT_S": "20",
    })
    proc = subprocess.Popen([sys.executable, BENCH], stdout=subprocess.PIPE,
                            text=True, env=env)
    try:
        t0 = time.time()
        first = proc.stdout.readline()
        dt = time.time() - t0
        row = json.loads(first)
        assert row["interim"] and row.get("startup")
        assert dt < 10, f"startup line took {dt:.1f}s"
    finally:
        proc.kill()
        proc.wait()


def test_serve_e2e_bench_smoke():
    """scripts/serve_e2e_bench.py emits one parseable JSON row with all four
    ingest modes (tiny model, CPU backend, probe skipped)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve_e2e_bench.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "BENCH_SKIP_PROBE": "1", "JAX_PLATFORMS": "cpu",
             "BENCH_MODEL": "vit_tiny_patch16_224", "BENCH_BS": "2",
             "BENCH_NBATCH": "2"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    for k in ("f32_sync", "f32_pipe", "u8_sync", "u8_pipe"):
        assert row[k] > 0
