#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (columns sorted by name,
values compared exactly). Usage: selfcheck.py <sfDir> <verifyOutDir>."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        oracle_df = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)])
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"schema: spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rowcount: spark={len(a)} oracle={len(b)}"))
        continue
    # exact compare cell by cell
    mism = []
    for c in a.columns:
        av, bv = a[c], b[c].astype(a[c].dtype) if a[c].dtype != b[c].dtype else b[c]
        neq = ~((av == bv) | (av.isna() & bv.isna()))
        if neq.any():
            i = neq.idxmax()
            mism.append(f"col {c} ({neq.sum()} diffs; row {i}: spark={av[i]!r} oracle={bv[i]!r} dtypes {a[c].dtype}/{b[c].dtype})")
    if mism:
        fails.append((name, "; ".join(mism)))
    else:
        passes.append(name)

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
