#!/usr/bin/env python3
"""Cross-SF scaling self-audit: compare per-query bench times across
scale factors and flag super-linear steps (a 10x data step costing more
than FACTOR x wall). Dev tool feeding PERF.md; single-iteration runs, so
treat flags as leads, not verdicts.

Usage: python3 tools/scaling_audit.py bench_sf0.001.json bench_sf0.01.json bench_sf0.1.json
"""
import json
import sys

FACTOR = 12.0  # 10x data; allow some fixed-cost amortization noise
FLOOR = 0.35   # ignore sub-350ms rows (pure fixed overhead)


def main():
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    names = sorted(set(runs[0]) & set(runs[-1]))
    flagged = []
    for name in names:
        times = [r.get(name, -1.0) for r in runs]
        if any(t < 0 for t in times):
            print(f"SKIP {name}: failed in some run {times}")
            continue
        for i in range(len(times) - 1):
            if times[i + 1] > FLOOR and times[i] > 0.05 and times[i + 1] / times[i] > FACTOR:
                flagged.append((name, i, times))
    for name, i, times in flagged:
        print(f"SUPERLINEAR? {name}: step {i}->{i+1} " +
              " ".join(f"{t:.2f}" for t in times))
    print(f"\n== {len(names)} compared, {len(flagged)} flagged "
          f"(factor>{FACTOR} on a 10x step with t>{FLOOR}s)")


if __name__ == "__main__":
    main()
