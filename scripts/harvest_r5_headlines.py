#!/usr/bin/env python
"""Build the BENCH_NOTES round-5 headline-variance table from the device
log: for every final bench row with >=2 warm repeats, print a markdown row
with warm runs, median, best-of, and the per-repeat weather stamps.

Usage: python scripts/harvest_r5_headlines.py [logfile ...]
       (default: artifacts/device_log_r5.txt)
"""
import json
import os
import sys


def rows_from(path):
    for line in open(path, errors="replace"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if (isinstance(row, dict) and not row.get("interim")
                and row.get("metric", "").startswith("ptq4vit_calib_minutes")
                and row.get("median") is not None
                and len(row.get("all_minutes", [])) >= 2):
            yield row


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sys.argv[1:] or [os.path.join(here, "artifacts",
                                          "device_log_r5.txt")]
    best = {}
    for p in paths:
        if not os.path.exists(p):
            continue
        for row in rows_from(p):
            m = row["metric"]
            # keep the study with the MOST warm repeats per metric (the
            # designed variance study), tie-broken by recency — single-warm
            # re-samples and lever A/Bs must not shadow a 3-warm median
            n_warm = len(row.get("warm_minutes")
                         or row["all_minutes"][1:] or row["all_minutes"])
            prev = best.get(m)
            if prev is None or n_warm >= prev[0]:
                best[m] = (n_warm, row)
    print("| cell | warm runs (min) | median | best | probes |")
    print("|---|---|---|---|---|")
    for m in sorted(best):
        r = best[m][1]
        # bench.py reports the exact runs its median covers (crashed
        # repeats are dropped from all_minutes, so "skip entry 0" would
        # mislabel the first survivor after a run-1 crash)
        warm = r.get("warm_minutes") or r["all_minutes"][1:] \
            or r["all_minutes"]
        cell = m.replace("ptq4vit_calib_minutes_", "")
        med = r["median"]
        mvb = r.get("median_vs_baseline")
        vb = r.get("vs_baseline")
        probes = [p for p in (r.get("probe_per_run") or
                              [r.get("probe_bf16_tflops")])
                  if p is not None]
        flag = " **degraded**" if r.get("window_degraded") else ""
        if r.get("median_excluded_degraded_runs"):
            flag += (f" ({r['median_excluded_degraded_runs']} degraded "
                     "run(s) excluded from median)")
        print(f"| {cell} | {' / '.join(f'{w:.3f}' for w in warm)} "
              f"| **{med:.3f}**{f' ({mvb}x)' if mvb else ''} "
              f"| {r['value']:.3f}{f' ({vb}x)' if vb else ''} "
              f"| {'-'.join(str(p) for p in probes)}{flag} |")


if __name__ == "__main__":
    main()
