#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
parquet vs DuckDB oracle SQL on the same testdata tables.

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    # driver testdata = flat files; ScaleUp-synthesized dirs = part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"MISSING  {name} (no parquet dir)")
        fails.append(name)
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORA-ERR  {name}: {e}")
        fails.append(name)
        continue
    # driver semantics: sort columns by name, then compare values
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA   {name}: got {list(got.columns)} exp {list(exp.columns)}")
        fails.append(name)
        continue
    if len(got) != len(exp):
        print(f"ROWS     {name}: got {len(got)} exp {len(exp)}")
        fails.append(name)
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    ok = True
    for c in got.columns:
        gv, ev = gs[c], es[c]
        if str(gv.dtype) != str(ev.dtype):
            print(f"DTYPE    {name}.{c}: got {gv.dtype} exp {ev.dtype}")
            ok = False
        try:
            same = (gv.astype(str) == ev.astype(str)).all()
        except Exception:
            same = False
        if not same:
            bad = (gv.astype(str) != ev.astype(str))
            i = bad[bad].index[0]
            print(f"VALUE    {name}.{c}: first diff row {i}: "
                  f"got={gv[i]!r} exp={ev[i]!r}")
            ok = False
    if ok:
        print(f"OK       {name} ({len(got)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle)-len(set(fails))}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
