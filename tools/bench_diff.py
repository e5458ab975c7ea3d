#!/usr/bin/env python3
"""Per-query diff of two bench artifacts: which queries moved >threshold.

Accepts either the driver's BENCH_rN.json wrapper ({"parsed": {"queries":
...}}) or a raw graft.Bench output line ({"queries": ...}). Queries with a
-1 sentinel (errored) are reported separately, never as movers.

Usage: tools/bench_diff.py OLD.json NEW.json [threshold=1.2]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"] or {}
    qs = d.get("queries") or {}
    return {k: float(v) for k, v in qs.items()}, d.get("value")


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, old_total = load(sys.argv[1])
    new, new_total = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2

    shared = sorted(set(old) & set(new))
    errs = sorted([q for q in new if new[q] < 0])
    movers = []
    for q in shared:
        if old[q] <= 0 or new[q] < 0:
            continue
        # floor tiny queries: a 0.08s->0.12s flap is timer noise, not a plan
        ratio = new[q] / max(old[q], 1e-9)
        if (ratio > thr or ratio < 1 / thr) and abs(new[q] - old[q]) > 0.05:
            movers.append((ratio, q))
    movers.sort(reverse=True)

    print(f"old total={old_total} ({len(old)} queries)  "
          f"new total={new_total} ({len(new)} queries)")
    shared_old = sum(old[q] for q in shared if old[q] > 0)
    shared_new = sum(new[q] for q in shared if new[q] > 0)
    if shared:
        print(f"shared {len(shared)} queries: {shared_old:.3f}s -> "
              f"{shared_new:.3f}s ({shared_new / max(shared_old, 1e-9):.2f}x)")
    for q in sorted(set(new) - set(old)):
        print(f"  NEW     {q}: {new[q]:.3f}s")
    for q in sorted(set(old) - set(new)):
        print(f"  DROPPED {q} (was {old[q]:.3f}s)")
    for q in errs:
        print(f"  ERROR   {q}: -1 sentinel")
    if movers:
        print(f"movers >{thr}x either way:")
        for ratio, q in movers:
            tag = "SLOWER" if ratio > 1 else "faster"
            print(f"  {tag} {q}: {old[q]:.3f}s -> {new[q]:.3f}s "
                  f"({ratio:.2f}x)")
    else:
        print(f"no movers >{thr}x")


if __name__ == "__main__":
    main()
