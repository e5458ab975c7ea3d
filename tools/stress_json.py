#!/usr/bin/env python3
"""Aggregate graft.Stress output into one machine-diffable JSON artifact.

Usage: python3 tools/stress_json.py <stress-log-file> <out.json>

Reads the {"probe":"stress",...} lines graft.Stress prints (tolerating
any build-tool prefix on the line), fits the least-squares growth slope
of log(sec) and log(rows) against log(scale) per (query, mode), and
writes one JSON object:

  {"modes": [...], "scales": [...],
   "queries": {q: {mode: {"scales": [...], "sec": [...], "rows": [...],
                          "t_slope": x, "row_slope": y,
                          "overhead_dominated": bool,
                          "superlinear": bool}}},
   "superlinear": [ [q, mode], ... ]}

Flags:
 - overhead_dominated: every point ran < 0.5 s — job scheduling and
   plan compile dominate, the fitted slope is meaningless noise.
 - superlinear: t_slope > 1.15 on a non-overhead-dominated series
   whose time slope also exceeds its ROW slope by > 0.15 — growth in
   wall time beyond what the output itself forces (a replica corpus's
   s^2 duplicate pairs are irreducible output, not engine waste; see
   Stress.scala's mode commentary). These are the series a round must
   explain or fix.

The top-level "superlinear" list is the round's headline: empty = every
measured query grows no faster than its output across the sweep.
"""
import json
import sys

from stress_fit import fit


def main(log_path, out_path):
    series = {}
    modes, scales = [], []
    for raw in open(log_path):
        i = raw.find('{"probe":"stress"')
        if i < 0:
            continue
        r = json.loads(raw[i:].strip())
        key = (r["query"], r["mode"])
        series.setdefault(key, []).append((r["scale"], r["sec"], r["rows"]))
        if r["mode"] not in modes:
            modes.append(r["mode"])
        if r["scale"] not in scales:
            scales.append(r["scale"])
    queries = {}
    flagged = []
    for (query, mode), pts in sorted(series.items()):
        pts.sort()
        ts = fit([(s, t) for s, t, _ in pts])
        rs = fit([(s, max(n, 1)) for s, _, n in pts])
        overhead = all(t < 0.5 for _, t, _ in pts)
        superlinear = (ts is not None and not overhead and ts > 1.15
                       and (rs is None or ts - rs > 0.15))
        if superlinear:
            flagged.append([query, mode])
        queries.setdefault(query, {})[mode] = {
            "scales": [s for s, _, _ in pts],
            "sec": [round(t, 3) for _, t, _ in pts],
            "rows": [n for _, _, n in pts],
            "t_slope": round(ts, 3) if ts is not None else None,
            "row_slope": round(rs, 3) if rs is not None else None,
            "overhead_dominated": overhead,
            "superlinear": superlinear,
        }
    out = {"modes": modes, "scales": sorted(scales),
           "n_series": len(series), "queries": queries,
           "superlinear": flagged}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(queries)} queries, "
          f"{len(series)} series, {len(flagged)} superlinear")
    return 0 if not flagged else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
