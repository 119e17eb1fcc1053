#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json out.json] [-j N]

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql*.json in DuckDB against views named
after the tables in <sfDir>, and compares: row count, column names,
and a hash of all values with columns sorted by name (rows sorted too).

The sweep is embarrassingly parallel (one DuckDB query per name), so it
fans out over a process pool (-j, default = cpu count) — the r6 verdict's
gate-budget fix. --json writes the per-query result map the builder
commits as CORRECTNESS_builder_rN.json. oracle_sql.shard-*.json /
manifest.shard-*.json files (from `Verify --shard k/n`) are merged with
the unsharded ones, so sharded and whole-registry sweeps compare alike.
"""
import glob
import json
import multiprocessing as mp
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

_sf_dir = None
_oracles = None


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


def _init(sf_dir, oracles):
    global _sf_dir, _oracles
    _sf_dir, _oracles = sf_dir, oracles


def check_one(arg):
    """One query's compare in its own process: returns
    (name, status, detail, rows, secs). Any exception (e.g. a
    partial/corrupt parquet dir left by a killed shard JVM) is reported
    as THAT query's failure instead of crashing the whole pool sweep."""
    import time
    t0 = time.time()
    try:
        name, status, detail, rows = _check_inner(arg)
    except Exception as e:  # noqa: BLE001 — one bad dir must not kill the gate
        name = arg[0]
        status, rows = "fail", 0
        detail = f"  [FAIL-read] {name}: read/compare error: {e}"
    return name, status, detail, rows, round(time.time() - t0, 2)


def _check_inner(arg):
    name, out_dir = arg
    spark_df = pd.read_parquet(os.path.join(out_dir, name))
    if name not in _oracles:
        ok = len(spark_df) > 0
        return (name, "rows-only" if ok else "fail",
                f"  [rows-only] {name}: rows={len(spark_df)} "
                f"{'OK' if ok else 'EMPTY!'}", len(spark_df))
    con = duckdb.connect()
    # default is all cores PER worker: pool_size × n_cores threads thrash
    # the box into sys-time (measured 10 min wall for a 1-min sweep)
    con.execute("SET threads=2")
    for t in TABLES:
        p = os.path.join(_sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        oracle_df = con.execute(_oracles[name]).df()
    except Exception as e:
        return (name, "fail", f"  [FAIL-sql ] {name}: oracle SQL error: {e}",
                len(spark_df))
    # the driver's hash is dtype-sensitive: DuckDB sum(BIGINT)→HUGEINT
    # lands in pandas as float64 while Spark writes int64, and the
    # values-equal-but-dtype-differ case hash-mismatches (r1: 3 queries)
    sd = {c: str(spark_df[c].dtype) for c in sorted(spark_df.columns)}
    od = {c: str(oracle_df[c].dtype) for c in sorted(oracle_df.columns)}
    if sd != od and set(sd) == set(od):
        diffs = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
        return (name, "fail", f"  [FAIL-dtyp] {name}: {diffs}", len(spark_df))
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return (name, "fail",
                f"  [FAIL-cols] {name}: spark={list(a.columns)} oracle={list(b.columns)}",
                len(spark_df))
    if len(a) != len(b):
        return (name, "fail", f"  [FAIL-rows] {name}: spark={len(a)} oracle={len(b)}",
                len(spark_df))
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        return (name, "fail",
                f"  [FAIL-vals] {name}: first diff at sorted row {i}:\n"
                f"      spark : {a.loc[i].to_dict()}\n"
                f"      oracle: {b.loc[i].to_dict()}", len(spark_df))
    return (name, "pass", f"  [PASS     ] {name}: rows={len(a)}", len(a))


def load_merged(out_dir, stem):
    """Merge <stem>.json with any <stem>.shard-*.json (Verify --shard).

    A directory holding BOTH an unsharded file and shard-tagged files is
    almost always a stale-artifact mixup (only run_gate.sh rm -rfs the
    outDir): a leftover unsharded manifest can FAIL-miss queries that no
    longer exist, a stale oracle_sql.json can mask a missing shard. Warn
    loudly so the operator re-runs from a clean outDir."""
    paths = sorted(glob.glob(os.path.join(out_dir, f"{stem}*.json")))
    whole = [p for p in paths if os.path.basename(p) == f"{stem}.json"]
    shards = [p for p in paths if p not in whole]
    if whole and shards:
        print(f"WARNING: {out_dir} mixes {stem}.json with shard-tagged "
              f"{stem}.shard-*.json — one of them is probably stale "
              "(only run_gate.sh clears outDir); results may be wrong. "
              "Delete the stale set and re-run.", file=sys.stderr)
    merged = {} if stem == "oracle_sql" else []
    for p in paths:
        with open(p) as f:
            part = json.load(f)
        if isinstance(merged, dict):
            merged.update(part)
        else:
            merged.extend(part)
    return merged


def main():
    argv = sys.argv[1:]
    json_out, jobs = None, min(16, os.cpu_count() or 4)
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if "-j" in argv:
        i = argv.index("-j")
        jobs = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    oracles = load_merged(out_dir, "oracle_sql")
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    results = {}
    expected = set(load_merged(out_dir, "manifest"))
    for missing in sorted(expected - set(names)):
        print(f"  [FAIL-miss] {missing}: query crashed (no output written)")
        results[missing] = {"status": "fail", "reason": "crashed: no output"}
        n_fail += 1
    with mp.Pool(jobs, initializer=_init, initargs=(sf_dir, oracles)) as pool:
        for name, status, detail, rows, secs in pool.imap_unordered(
                check_one, [(n, out_dir) for n in names]):
            print(f"{detail}  ({secs}s)")
            results[name] = {"status": status, "rows": rows, "secs": secs}
            if status == "pass":
                n_pass += 1
            elif status == "rows-only":
                n_noracle += 1
            else:
                n_fail += 1
                results[name]["reason"] = detail.strip()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if json_out:
        summary = {"pass": n_pass, "fail": n_fail, "rows_only": n_noracle,
                   "queries": dict(sorted(results.items()))}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
