#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate (SURVEY.md §6e).

Usage: python3 tools/crosscheck.py [sf_dir] [verify_out_dir] [query...]

Reads each <out>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against views named after
the test tables. Compares: row count, name-sorted column set, and exact
values after sorting rows by all columns. Queries without oracle SQL get
a rows-only report.
"""
import duckdb, json, sys, os, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_vals(a, b):
    """Exact compare; returns (n_diff, max_float_delta)."""
    ndiff, maxd = 0, 0.0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for x, y in zip(av, bv):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    ndiff += 1
                    maxd = max(maxd, abs(x - y))
            elif x != y:
                ndiff += 1
                maxd = float("inf")
    return ndiff, maxd

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    fails = 0
    for name in names:
        if only and name not in only:
            continue
        sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"{name:28s} rows-only: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        s, o = canon(sdf), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        if not rows or not schema:
            print(f"{name:28s} FAIL rows={len(s)}/{len(o)} "
                  f"cols spark={list(s.columns)} oracle={list(o.columns)}")
            fails += 1
            continue
        nd, maxd = cmp_vals(s, o)
        if nd == 0:
            print(f"{name:28s} OK   ({len(s)} rows)")
        else:
            print(f"{name:28s} FAIL {nd} value diffs, max float delta {maxd}")
            print("  spark:", s.head(3).to_dict("records"))
            print("  oracle:", o.head(3).to_dict("records"))
            fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
