#!/usr/bin/env python3
"""Adversarial-corpus generator for the oracle parity gate.

The 136-query DuckDB comparison has only ever run against the driver's
well-behaved synthetic testdata. This tool builds a corpus that is
IN-CONTRACT (same schemas, same categorical domains, non-null keys/text,
embedding dim preserved) but adversarial in every way real 100 TB data
is and clean test fixtures aren't:

- documents: empty / single-char / whitespace-edged / double-spaced
  texts, unicode (CJK, combining accents, emoji), punctuation and
  regex-metacharacter soup, exact and near duplicates, a 500-token doc,
  a doc that is one token repeated 50x, a source stratum with exactly
  one doc.
- embeddings: the zero vector, identical triplets, near-identical
  (1e-7), exact scaled copies (cosine exactly 1), negated copies
  (cosine exactly -1), orthogonal basis vectors, huge (1e6) and tiny
  (1e-20) magnitudes.
- events: microsecond-tied (user, ts) pairs, inter-event gaps exactly
  AT the 6 h sessionization boundary, events on exact 15-minute window
  edges, a 20-event 1 s burst, single-event users, tied values across
  users.
- orders/lineitem: one customer holding 30 orders (skew), an order
  with no lineitems, an order whose 7 lineitems are value-identical
  (tie storms), discount/tax at both domain extremes.

Everything appends AFTER the real sf tables (ids offset to 10000+), so
existing query constants (probe ids, thresholds, date filters) still
select the same base rows — the fuzz rows ride along through every
operator. Deterministic: seeded, no wall-clock.

Usage: python3 tools/gen_fuzz.py [srcDir] [outDir]
  defaults: /root/testdata/sf0.001 /tmp/graft_fuzz
Then:  sbt -batch "runMain graft.Verify <outDir> /tmp/fuzz_out"
       python3 tools/check_oracle.py <outDir> /tmp/fuzz_out
"""
import datetime as dt
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = _args[0] if len(_args) > 0 else "/root/testdata/sf0.001"
OUT = _args[1] if len(_args) > 1 else (
    "/tmp/graft_empty" if "--empty" in sys.argv
    else "/tmp/graft_tiny" if "--tiny" in sys.argv
    else "/tmp/graft_mono" if "--mono" in sys.argv
    else "/tmp/graft_fuzz")
SEED = 7
ID0 = 10000  # injected ids start here: above every base id, below any
             # offset used elsewhere

rng = random.Random(SEED)

VOCAB = ("the fast key order sort table scan merge part window small hash "
         "join batch stream spark group query row data slow filter customer "
         "line value agg column big vector a").split()


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")


def append(name, base, rows, schema):
    """rows: list of dicts; cast through the BASE schema so dtypes match
    the driver layout exactly (int32 keys stay int32, ts stays us)."""
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    extra = pa.table(
        {f.name: pa.array(cols[f.name], type=f.type) for f in schema},
        schema=schema)
    write(name, pa.concat_tables([base, extra]))


def fuzz_documents():
    base = read("documents")
    dup_src = base.column("text")[0].as_py()   # an existing doc to clone
    near = dup_src.split()
    near[len(near) // 2] = "changed"
    texts = [
        "",                                    # empty
        "a",                                   # single char
        " ",                                   # lone space
        "  double  spaced  tokens  ",          # empty split segments
        "leading", "trailing ",                # edge whitespace
        dup_src, dup_src, dup_src,             # exact dup x3 (new ids)
        " ".join(near),                        # near duplicate
        "déjà vu naïve café résumé",
        "你好 世界 数据 引擎 "
        "分布式 计算",
        "\U0001f680 data \U0001f680 engine \U0001f680",
        "é combining é accents é",  # combining marks
        "a,b.c;d:e!f?g\"h'i(j)k[l]m{n}o",
        "a+b*c?d|e\\f^g$h (regex) [soup] {here}",
        " ".join(rng.choices(VOCAB, k=500)),   # long doc
        ("dup " * 50).strip(),                 # one token repeated
        "tab\tseparated\ttokens",              # \t is NOT a token break
        "line\nbreaks\nin\ntext",              # \n is NOT a token break
        "carriage\r\nreturns",
        "x" * 1000,                            # one 1000-char token
        "the a of to the a of to",             # all stopwords
        "👩‍👩‍👧 family emoji zwj cluster",        # ZWJ grapheme cluster
        "solo",                                # the 1-doc stratum below
    ]
    rows = []
    langs = ["en", "de", "zh", "fr", "es"]
    for i, t in enumerate(texts):
        rows.append({
            "doc_id": ID0 + i,
            "text": t,
            "lang": langs[i % len(langs)],
            # last row gets its own never-seen-elsewhere stratum: rare
            # strata exercise sampling/stratification edge paths
            "source": "src_solo" if t == "solo" else f"src{i % 20}",
            "n_chars": len(t),
        })
    append("documents", base, rows, base.schema)


def fuzz_embeddings():
    base = read("embeddings")
    dim = len(base.column("embedding")[0])
    v = np.array(base.column("embedding")[0].as_py(), dtype=np.float32)
    basis0 = np.zeros(dim, dtype=np.float32); basis0[0] = 1.0
    basis1 = np.zeros(dim, dtype=np.float32); basis1[1] = 1.0
    ident = np.array([rng.uniform(-1, 1) for _ in range(dim)],
                     dtype=np.float32)
    vecs = [
        np.zeros(dim, dtype=np.float32),       # zero vector
        ident, ident.copy(), ident.copy(),     # identical triplet
        ident + np.float32(1e-7),              # near-identical
        v * np.float32(2.0),                   # exact scaled copy: cos=1
        -v,                                    # negated: cos=-1
        basis0, basis1,                        # orthogonal
        np.full(dim, 1e6, dtype=np.float32),   # huge magnitude
        np.full(dim, 1e-20, dtype=np.float32), # tiny magnitude
        np.ones(dim, dtype=np.float32),
    ]
    rows = [{"vec_id": ID0 + i,
             "embedding": [float(x) for x in vec],
             "label": i % 10}
            for i, vec in enumerate(vecs)]
    append("embeddings", base, rows, base.schema)


def fuzz_events():
    base = read("events")
    t0 = dt.datetime(2024, 1, 15, 0, 0, 0, 0)  # exact window boundary
    types = ["signup", "click", "error", "view", "purchase"]
    rows = []
    eid = [ID0]

    def ev(ts, user, etype, value, k):
        rows.append({"event_id": eid[0], "ts": ts, "user_id": user,
                     "event_type": etype, "value": value,
                     "props": '{"k": %d}' % k})
        eid[0] += 1

    u = ID0
    # three events on the SAME microsecond for one user (sessionize /
    # as-of tie), plus one more a microsecond later
    for _ in range(3):
        ev(t0, u, "click", 1.0, 1)
    ev(t0 + dt.timedelta(microseconds=1), u, "view", 1.0, 2)
    # gaps exactly AT and just over the 6 h session boundary: the > vs
    # >= decision must agree between engines
    ev(t0 + dt.timedelta(seconds=21600), u + 1, "click", 2.0, 3)
    ev(t0 + dt.timedelta(seconds=2 * 21600), u + 1, "click", 2.0, 4)
    ev(t0 + dt.timedelta(seconds=3 * 21600, microseconds=1), u + 1,
       "click", 2.0, 5)
    # exact 15-minute window edges (streaming/window bucketing)
    for m in (0, 15, 30, 45):
        ev(t0 + dt.timedelta(minutes=m), u + 2, "view", 0.0, m)
    # a 20-event 1 s burst (one dense session)
    for sidx in range(20):
        ev(t0 + dt.timedelta(hours=1, seconds=sidx), u + 3,
           types[sidx % 5], float(sidx % 3), sidx)
    # single-event users, tied values ACROSS users (rank ties)
    for j in range(5):
        ev(t0 + dt.timedelta(hours=2), u + 10 + j, "purchase", 7.5, j)
    # negative and zero values
    ev(t0 + dt.timedelta(hours=3), u + 20, "error", -1.0, 0)
    ev(t0 + dt.timedelta(hours=3, seconds=1), u + 20, "error", 0.0, 0)
    # NULL payloads (keys stay non-null — that's the load contract):
    # a null measurement and a null props blob, the two fields a real
    # event stream actually loses
    rows.append({"event_id": eid[0], "ts": t0 + dt.timedelta(hours=4),
                 "user_id": u + 21, "event_type": "view",
                 "value": None, "props": '{"k": 1}'})
    eid[0] += 1
    rows.append({"event_id": eid[0], "ts": t0 + dt.timedelta(hours=4,
                 seconds=1), "user_id": u + 21, "event_type": "view",
                 "value": 2.5, "props": None})
    eid[0] += 1
    # non-finite measurements: a real metrics stream emits NaN and Inf
    ev(t0 + dt.timedelta(hours=5), u + 22, "error", float("nan"), 0)
    ev(t0 + dt.timedelta(hours=5, seconds=1), u + 22, "error",
       float("inf"), 0)
    ev(t0 + dt.timedelta(hours=5, seconds=2), u + 22, "error",
       float("-inf"), 0)
    # finite but absurd: cents would overflow BIGINT — must read as
    # missing, same as Inf
    ev(t0 + dt.timedelta(hours=5, seconds=3), u + 22, "error", 1e17, 0)
    ev(t0 + dt.timedelta(hours=5, seconds=4), u + 22, "error",
       1.7976931348623157e308, 0)
    # epoch-boundary timestamps: pre-1970 events have NEGATIVE epoch
    # micros — floor division vs truncate-toward-zero division diverge
    # exactly there (bucketing, gap slicing, window alignment)
    ev(dt.datetime(1969, 12, 31, 23, 59, 59, 123456), u + 23, "view",
       1.0, 1)
    ev(dt.datetime(1969, 12, 31, 22, 0, 0, 1), u + 23, "view", 1.0, 2)
    ev(dt.datetime(1969, 12, 31, 22, 0, 0, 1), u + 23, "click", 1.0, 3)
    ev(dt.datetime(2150, 1, 1, 0, 0, 0, 0), u + 24, "purchase", 2.0, 4)
    append("events", base, rows, base.schema)


def fuzz_orders_lineitem():
    orders = read("orders")
    lineitem = read("lineitem")
    orows, lrows = [], []
    d0 = dt.datetime(1998, 6, 1)
    # one orphan order (custkey with no customer row — real warehouses
    # carry referential breaks; inner joins must drop it identically in
    # both engines, left joins must keep it)
    orows.append({"o_orderkey": ID0 + 99, "o_custkey": ID0 + 99,
                  "o_orderstatus": "O", "o_totalprice": 1.0,
                  "o_orderdate": d0, "o_orderpriority": "1-X"})
    # one customer with 30 orders (skew); reuses an EXISTING custkey so
    # customer-side joins stay referentially intact
    skew_cust = 7
    for i in range(30):
        ok = ID0 + i
        orows.append({"o_orderkey": ok, "o_custkey": skew_cust,
                      "o_orderstatus": "OPF"[i % 3],
                      "o_totalprice": 1000.0,   # tied totals
                      "o_orderdate": d0 + dt.timedelta(days=i),
                      "o_orderpriority": f"{i % 5 + 1}-X"})
        # order ID0 gets 7 value-identical lineitems; ID0+1 gets NONE
        # (order with no lineitems); the rest get one each
        n = 7 if i == 0 else (0 if i == 1 else 1)
        for ln in range(n):
            lrows.append({
                "l_orderkey": ok, "l_partkey": ln % 200,
                "l_suppkey": ln % 10, "l_linenumber": ln + 1,
                "l_quantity": 25.0, "l_extendedprice": 1000.0,
                "l_discount": 0.0 if ln % 2 == 0 else 0.1,  # extremes
                "l_tax": 0.0 if ln % 2 == 0 else 0.08,
                "l_returnflag": "ANR"[ln % 3],
                "l_linestatus": "OF"[ln % 2],
                "l_shipdate": d0 + dt.timedelta(days=i, hours=ln)})
    append("orders", orders, orows, orders.schema)
    append("lineitem", lineitem, lrows, lineitem.schema)


def write_empty():
    """Empty-corpus mode: every table schema-identical but 0 rows — the
    100 TB analogue of a pipeline run over an empty date partition.
    Every query must return its (empty or aggregate-of-nothing) result,
    not crash on a .head of nothing or a train step with no data."""
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings", "events", "orders", "lineitem"):
        write(t, read(t).slice(0, 0))
    print(f"EMPTY corpus written to {OUT}")


def write_mono():
    """All-identical mode: every document the SAME text, every embedding
    the SAME vector (a scraper gone wrong) — the whole corpus is one
    duplicate cluster: C(n,2) candidate pairs, a single connected
    component, every LSH bucket maximal, zero diversity everywhere.

    Sized DOWN to 60 docs / 40 vectors: the degeneracy class is the
    same at any n (one cluster, all-pairs candidates, one keeper), but
    the ORACLE cost is not — DuckDB's recursive-CTE reachability over a
    complete K_500 graph ground for the better part of an hour on the
    full-size corpus, while the Spark side finished in seconds. The
    gate checks semantics, not oracle throughput."""
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        write(t, read(t))
    docs = read("documents")
    one_text = docs.column("text")[0].as_py()
    n = min(60, docs.num_rows)
    rows = [{"doc_id": i, "text": one_text, "lang": "en", "source": "src0",
             "n_chars": len(one_text)} for i in range(n)]
    pq.write_table(pa.table(
        {f.name: pa.array([r[f.name] for r in rows], type=f.type)
         for f in docs.schema}, schema=docs.schema),
        f"{OUT}/documents.parquet")
    emb = read("embeddings")
    one_vec = emb.column("embedding")[0].as_py()
    m = min(40, emb.num_rows)
    erows = [{"vec_id": i, "embedding": one_vec, "label": i % 10}
             for i in range(m)]
    pq.write_table(pa.table(
        {f.name: pa.array([r[f.name] for r in erows], type=f.type)
         for f in emb.schema}, schema=emb.schema),
        f"{OUT}/embeddings.parquet")
    print(f"MONO corpus written to {OUT}")


def write_tiny():
    """Single-row mode: each table exactly 1 row — the n=1 degeneracies
    (n−1 divisors, percent_rank of one, k-means with k > n, idf of a
    term in every doc, a 1-member cluster/stratum everywhere)."""
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings", "events", "orders", "lineitem"):
        write(t, read(t).slice(0, 1))
    print(f"TINY corpus written to {OUT}")


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    import os
    os.makedirs(OUT)
    if "--empty" in sys.argv:
        write_empty()
        return
    if "--tiny" in sys.argv:
        write_tiny()
        return
    if "--mono" in sys.argv:
        write_mono()
        return
    # dims copied verbatim: referential targets stay identical
    for t in ("region", "nation", "customer", "supplier", "part"):
        write(t, read(t))
    fuzz_documents()
    fuzz_embeddings()
    fuzz_events()
    fuzz_orders_lineitem()
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = pq.read_table(f"{OUT}/{t}.parquet").num_rows
        print(f"{t}: {n} rows")
    print(f"fuzz corpus written to {OUT}")


if __name__ == "__main__":
    main()
