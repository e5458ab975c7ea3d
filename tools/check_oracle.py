#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs their DuckDB oracles.

Mimics the driver's t2 check as strictly as possible: run each oracle SQL
in DuckDB over the sf tables, load the Verify-dumped parquet, sort columns
by name, sort rows, compare values exactly (floats bit-exact).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        # exact (bit-level) compare — except NaN, where IEEE `!=` would
        # make identical outputs miscompare; map to a sentinel so
        # NaN == NaN (both engines emitting NaN in the same cell is
        # agreement, e.g. a NaN measurement passed through unchanged)
        if math.isnan(v):
            return "__NaN__"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def driver_hazards(rel, side):
    """The driver's pandas harness is stricter than a value compare:
    array-typed cells crash its row sort ('unhashable numpy.ndarray'),
    and dtype widening (e.g. DuckDB HUGEINT -> object) breaks its hash
    even when values agree. Reproduce both checks locally so a query
    that would fail the driver gate fails here first."""
    probs = []
    df = rel.df()
    for c in df.columns:
        if df[c].dtype.kind == "O":
            sample = df[c].dropna()
            v = sample.iloc[0] if len(sample) else None
            if isinstance(v, (list, tuple, dict, set)) or (
                    v is not None and type(v).__name__ == "ndarray"):
                probs.append(
                    f"{side}.{c} container cell ({type(v).__name__}) — "
                    "unhashable in the driver's row sort")
    return probs, {c: df[c].dtype.kind for c in df.columns}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Queries that crashed during Verify leave no dump — absence must read
    # as FAILURE by name, never as "not declared" (round 8's 130/130
    # artifact silently dropped 6 crashed queries). Verify writes them to
    # _errors.json; surface each one as its own FAIL line.
    try:
        crashed = json.load(open(f"{out_dir}/_errors.json"))
    except FileNotFoundError:
        crashed = {}
    for name, msg in sorted(crashed.items()):
        print(f"FAIL {name}: crashed during Verify: {msg}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in crashed:
            continue  # already FAILed above; no dump exists to compare
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
            gprobs, gkinds = driver_hazards(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"),
                "spark")
            exp_rel = con.sql(sql)
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
            eprobs, ekinds = driver_hazards(con.sql(sql), "oracle")
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gprobs or eprobs:
            print(f"FAIL {name}: {'; '.join(gprobs + eprobs)}")
            n_fail += 1
        elif gkinds != ekinds:
            print(f"FAIL {name}: dtype kinds {gkinds} != {ekinds}")
            n_fail += 1
        elif got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif got != exp:
            bad = [(a, b) for a, b in zip(got, exp) if a != b]
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
