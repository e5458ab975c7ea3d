#!/usr/bin/env python3
"""Fit growth exponents from graft.Stress output.

Usage: python3 tools/stress_fit.py <stress-log-file>

Reads the {"probe":"stress",...} JSON lines, and for each (mode, query)
fits the least-squares slope of log(sec) and log(rows) against
log(scale) over the measured points (scale=1 included). Slope ~1 =
linear growth, ~2 = quadratic. Points with sec < 0.5 s are flagged:
at sub-second runtimes the fixed per-query overhead (job scheduling,
plan compile) dominates and flattens the fitted slope.
"""
import json
import math
import sys
from collections import defaultdict


def fit(points):
    """least-squares slope of log(y) on log(x) for (x, y) pairs"""
    pts = [(math.log(x), math.log(y)) for x, y in points if y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    d = n * sxx - sx * sx
    return (n * sxy - sx * sy) / d if d else None


def main(path):
    series = defaultdict(list)
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"probe":"stress"'):
            continue
        r = json.loads(line)
        series[(r["mode"], r["query"])].append(
            (r["scale"], r["sec"], r["rows"]))
    print(f"{'mode':9} {'query':22} {'t-slope':>7} {'row-slope':>9} "
          f"{'t@max':>8} points")
    for (mode, query), pts in sorted(series.items()):
        pts.sort()
        ts = fit([(s, t) for s, t, _ in pts])
        rs = fit([(s, n) for s, _, n in pts])
        tmax = pts[-1][1]
        flag = " (overhead-dominated)" if all(t < 0.5 for _, t, _ in pts) \
            else ""
        print(f"{mode:9} {query:22} "
              f"{ts if ts is not None else float('nan'):7.2f} "
              f"{rs if rs is not None else float('nan'):9.2f} "
              f"{tmax:7.1f}s {[s for s, _, _ in pts]}{flag}")


if __name__ == "__main__":
    main(sys.argv[1])
