#!/usr/bin/env python
"""Harvest bench JSON lines out of a device-window log into a structured
repo artifact (artifacts/DEVICE_RESULTS_r03.jsonl).

The device queue (scripts/device_window_r3d.sh) logs free-form stdout from
bench.py / bench_infer.py runs; each of those prints exactly one JSON line
with a "metric" key.  This script rescans the whole log (idempotent — the
output file is rewritten, not appended) and tags every JSON row with the
queue command that produced it, so A/B runs of the same metric (e.g. the
PTQ4VIT_TPU_PALLAS=0 cohort A/B) stay distinguishable.

Usage: python scripts/harvest_device_log.py [logfile] [out.jsonl]
"""
import json
import os
import sys


def harvest(log_path: str, out_path: str) -> int:
    rows = []
    cmd = None
    try:
        lines = open(log_path, errors="replace").read().splitlines()
    except OSError:
        return 0
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
            rows.append({"cmd": cmd, **row})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    os.replace(tmp, out_path)
    return len(rows)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "artifacts", "device_log_r3e.txt")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "artifacts", "DEVICE_RESULTS_r03.jsonl")
    n = harvest(log, out)
    print(f"harvested {n} result rows -> {out}")
