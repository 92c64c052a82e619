#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, compare to the Spark parquet dump
(columns sorted by name, values hashed)."""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.6g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

ok = fail = 0
for name in sorted(glob.glob(f"{out_dir}/*/")):
    key = name.rstrip("/").split("/")[-1]
    spark_df = pd.concat([pd.read_parquet(f) for f in
                          sorted(glob.glob(f"{name}/*.parquet"))], ignore_index=True)
    if key not in oracle:
        status = "rows-only" if len(spark_df) > 0 else "EMPTY!"
        print(f"{key:24s} {status} rows={len(spark_df)}")
        if len(spark_df) == 0: fail += 1
        else: ok += 1
        continue
    try:
        duck_df = con.execute(oracle[key]).df()
    except Exception as e:
        print(f"{key:24s} ORACLE-SQL-ERROR {e}")
        fail += 1
        continue
    schema_s = sorted(spark_df.columns); schema_d = sorted(duck_df.columns)
    if schema_s != schema_d:
        print(f"{key:24s} SCHEMA-MISMATCH spark={schema_s} duck={schema_d}")
        fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"{key:24s} ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1
        continue
    hs, hd = canon(spark_df), canon(duck_df)
    if hs != hd:
        print(f"{key:24s} HASH-MISMATCH rows={len(spark_df)}")
        fail += 1
    else:
        print(f"{key:24s} OK rows={len(spark_df)}")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
