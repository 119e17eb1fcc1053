#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB against views named
after the tables in <sfDir>, and compares: row count, column names,
and a hash of all values with columns sorted by name (rows sorted too).
"""
import json, sys, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: everything to string via repr-ish
    def cell(x):
        if isinstance(x, float):
            return f"{x:.10g}"
        return str(x)
    out = df.apply(lambda c: c.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            expected = set(json.load(f))
        for missing in sorted(expected - set(names)):
            print(f"  [FAIL-miss] {missing}: query crashed (no output written)")
            n_fail += 1
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: rows={len(spark_df)} "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # the driver's hash is dtype-sensitive: DuckDB sum(BIGINT)→HUGEINT
        # lands in pandas as float64 while Spark writes int64, and the
        # values-equal-but-dtype-differ case hash-mismatches (r1: 3 queries)
        sd = {c: str(spark_df[c].dtype) for c in sorted(spark_df.columns)}
        od = {c: str(oracle_df[c].dtype) for c in sorted(oracle_df.columns)}
        if sd != od and set(sd) == set(od):
            diffs = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
            print(f"  [FAIL-dtyp] {name}: {diffs}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"  [FAIL-cols] {name}: spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"  [FAIL-rows] {name}: spark={len(a)} oracle={len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            print(f"  [FAIL-vals] {name}: first diff at sorted row {i}:")
            print(f"      spark : {a.loc[i].to_dict()}")
            print(f"      oracle: {b.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"  [PASS     ] {name}: rows={len(a)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
