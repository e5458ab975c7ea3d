#!/usr/bin/env python3
"""Split a graft.Explain multi-query dump into per-query plan files.

Usage: tools/split_plans.py plans/r18/before_lake.txt plans/r18 _before
Writes plans/r18/<query>_before.txt for each '========== name =========='
section of the input.
"""
import sys, os, re

src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
text = open(src).read()
parts = re.split(r"^========== (\S+) ==========$", text, flags=re.M)
# parts = [prefix, name1, body1, name2, body2, ...]
os.makedirs(outdir, exist_ok=True)
n = 0
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1].strip("\n")
    with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
        f.write(body + "\n")
    n += 1
print(f"wrote {n} plan files to {outdir}")
