#!/usr/bin/env python
"""Harvest bench JSON lines out of device-window logs into a structured
repo artifact (artifacts/DEVICE_RESULTS_r03.jsonl).

The device queue (scripts/device_queue.sh) logs free-form stdout from
bench.py / bench_infer.py runs; each of those prints exactly one JSON line
with a "metric" key.  This script rescans ALL artifacts/device_log_*.txt
logs (idempotent — the output file is rewritten, not appended) and tags
every JSON row with the queue command that produced it, so A/B runs of the
same metric (e.g. the PTQ4VIT_TPU_PALLAS=0 cohort A/B) stay
distinguishable.

Usage: python scripts/harvest_device_log.py [logfile ...] [--out out.jsonl]
       (no args: every artifacts/device_log_*.txt, in name order)
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    from bench import DEGRADED_BF16_TFLOPS
except Exception:                       # standalone use outside the repo
    DEGRADED_BF16_TFLOPS = 40.0


def harvest_lines(lines):
    rows = []
    cmd = None
    for line in lines:
        if line.startswith("=== ") and line.endswith(") ==="):
            cmd = line[4:].rsplit(" (", 1)[0]
        stripped = line.strip()
        if not stripped.startswith("{"):
            continue
        try:
            row = json.loads(stripped)
        except json.JSONDecodeError:
            continue
        if isinstance(row, dict) and "metric" in row:
            # retro-tag degraded-window rows harvested from logs that
            # predate bench.py's own "window_degraded" stamp: a probe below
            # the healthy floor (bench.DEGRADED_BF16_TFLOPS; CLAUDE.md band 50-62)
            # means the minutes measured tunnel weather, not the machine —
            # consumers (bench._last_measured, BENCH_NOTES medians) must
            # never pick such a row over a healthy-window one
            probe = row.get("probe_bf16_tflops")
            if (probe is not None and probe < DEGRADED_BF16_TFLOPS
                    and not row.get("window_degraded")):
                row["window_degraded"] = True
            rows.append({"cmd": cmd, **row})
    return rows


def harvest(log_paths, out_path: str) -> int:
    rows = []
    for log_path in log_paths:
        try:
            lines = open(log_path, errors="replace").read().splitlines()
        except OSError:
            continue
        rows.extend(harvest_lines(lines))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    os.replace(tmp, out_path)
    return len(rows)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    out = os.path.join(here, "artifacts", "DEVICE_RESULTS_r03.jsonl")
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    logs = args or sorted(glob.glob(
        os.path.join(here, "artifacts", "device_log_*.txt")))
    n = harvest(logs, out)
    print(f"harvested {n} result rows from {len(logs)} logs -> {out}")
