#!/usr/bin/env python3
"""Integrity gate for ScaleData output (r8 verdict item 7).

Usage: python3 tools/check_scaledata.py <baseDir> <scaledDir> <factor>

Asserts, via DuckDB over the parquet files directly:
  - row-count ratios: facts (customer supplier part orders lineitem
    events documents embeddings) are exactly factor x the base; the
    fixed dims (region nation) are exactly 1x (TPC-H semantics).
  - FK health: zero orphans in lineitem->orders, lineitem->part,
    lineitem->supplier, orders->customer, embeddings.vec_id ⊆
    documents.doc_id (the shared-shift contract).
  - key-space growth: max(key) in the scaled dir ≈ factor x the base
    key space (shift contract applied, not just row duplication).
Exits nonzero on any violation — run this BEFORE trusting any bench
numbers taken on the scaled directory.
"""
import os
import sys

import duckdb


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    base, scaled = sys.argv[1], sys.argv[2]
    try:
        factor = int(sys.argv[3])
    except ValueError:
        print(f"factor must be an integer, got {sys.argv[3]!r}\n\n{__doc__}")
        sys.exit(2)
    if factor < 1:
        print(f"factor must be >= 1, got {factor}\n\n{__doc__}")
        sys.exit(2)
    con = duckdb.connect()
    fails = []

    def q(sql):
        return con.execute(sql).fetchone()[0]

    def p(d, t):
        # driver testdata is a single file; Spark writes a directory
        path = f"{d}/{t}.parquet"
        return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"

    def rows(d, t):
        return q(f"SELECT count(*) FROM {p(d, t)}")

    facts = ["customer", "supplier", "part", "orders", "lineitem",
             "events", "documents", "embeddings"]
    for t in facts + ["region", "nation"]:
        want = factor if t in facts else 1
        nb, ns = rows(base, t), rows(scaled, t)
        ok = ns == nb * want
        print(f"[rows] {t}: {nb} -> {ns} (want {want}x) {'OK' if ok else 'FAIL'}")
        if not ok:
            fails.append(f"rows:{t}")

    fks = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("embeddings", "vec_id", "documents", "doc_id"),
    ]
    for fact, fk, dim, pk in fks:
        orphans = q(
            f"SELECT count(*) FROM {p(scaled, fact)} f "
            f"ANTI JOIN {p(scaled, dim)} d ON f.{fk} = d.{pk}")
        ok = orphans == 0
        print(f"[fk] {fact}.{fk} -> {dim}.{pk}: {orphans} orphans "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            fails.append(f"fk:{fact}.{fk}")

    keyspaces = [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("documents", "doc_id")]
    for t, k in keyspaces:
        mb = q(f"SELECT max({k}) FROM {p(base, t)}")
        ms = q(f"SELECT max({k}) FROM {p(scaled, t)}")
        # shift contract: copy i adds i*(max+1), so max_scaled =
        # max_base + (factor-1)*(max_base+1)
        want = mb + (factor - 1) * (mb + 1)
        ok = ms == want
        print(f"[keyspace] {t}.{k}: max {mb} -> {ms} (want {want}) "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            fails.append(f"keyspace:{t}.{k}")

    if fails:
        print(f"\nFAILED: {', '.join(fails)}")
        sys.exit(1)
    print("\nAll scale-data integrity checks passed.")


if __name__ == "__main__":
    main()
