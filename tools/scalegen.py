#!/usr/bin/env python3
"""Materialize an N-times-mass copy of a testdata dir (default x10 of
sf0.1 -> a "sf1-like" corpus) with CONSISTENT key shifts, for one-shot
bench probes a decade above the pinned gate SF (VERDICT r15 item 7).

Facts keep their FK structure: copy c shifts every key column by
c * 100_000_000, so orders still join customers, lineitems their
orders/parts/suppliers. Dims (region, nation) stay single-copy, like
real TPC-H scaling. Documents get a per-copy text suffix (mass growth
without the verbatim-df cliff, which probes 27/30 price separately);
embeddings perturb their first component per copy.

Usage: python3 tools/scalegen.py [src] [out] [scale]
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
scale = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SH = 100_000_000

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

SHIFTS = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

for t, keys in SHIFTS.items():
    p = f"{src}/{t}.parquet"
    if not os.path.exists(p):
        print(f"skip {t} (absent)")
        continue
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
    if keys is None:
        con.execute(f"COPY (SELECT * FROM '{p}') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: dim, single copy")
        continue
    parts = []
    for c in range(scale):
        sel = []
        for col in cols:
            if col in keys:
                sel.append(f"{col} + {c * SH} AS {col}")
            elif t == "documents" and col == "text" and c > 0:
                sel.append(f"text || ' copysuffix{c}' AS text")
            elif t == "documents" and col == "n_chars" and c > 0:
                # keep the stored char count consistent with the
                # suffixed text (q_domain_stats sums this column)
                sel.append(f"length(text || ' copysuffix{c}') AS n_chars")
            elif t == "embeddings" and col == "embedding" and c > 0:
                sel.append(
                    "list_concat([CAST(embedding[1] + %s AS FLOAT)], embedding[2:]) AS embedding"
                    % (c * 1e-3))
            else:
                sel.append(col)
        parts.append(f"SELECT {', '.join(sel)} FROM '{p}'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: x{scale} -> {n} rows")
print(f"wrote {out}")
