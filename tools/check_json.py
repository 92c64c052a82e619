#!/usr/bin/env python3
"""check.py's compare, emitted in the driver's CORRECTNESS JSON shape:
per key {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}. Usage: python3 tools/check_json.py <outDir> <sfDir> <outJson>
"""
import sys, json, glob, os, time
import duckdb

outdir, sfdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
con = duckdb.connect()
con.execute("SET threads=8")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
# per-key oracle budget: DuckDB replicas of the heavy dedup/BPE chains
# can be arbitrarily slow at large SF — interrupt and record, so one
# heavy oracle cannot starve the rest of the gate
budget = float(os.environ.get("ORACLE_BUDGET_SEC", "0") or 0)
import threading
result = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    timer = None
    if budget > 0:
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
    ent = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    result[name] = ent
    try:
        pdir = f"{outdir}/{name}"
        if not os.path.isdir(pdir):
            ent["err"] = "no parquet dir"
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = con.execute(sql).fetchdf()
        ent["spark_rows"] = len(got)
        ent["oracle_rows"] = len(exp)
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ent["schema_match"] = list(got.columns) == list(exp.columns)
        ent["rows_match"] = len(got) == len(exp)
        if ent["schema_match"] and ent["rows_match"]:
            gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            ok = True
            for c in got.columns:
                try:
                    if not (gs[c].astype(str) == es[c].astype(str)).all():
                        ok = False
                except Exception:
                    ok = False
            ent["hash_match"] = ok
    except Exception as e:
        msg = str(e)[:300]
        if "INTERRUPT" in msg.upper():
            msg = f"oracle_budget_exceeded({int(budget)}s)"
        ent["err"] = msg
    finally:
        if timer is not None:
            timer.cancel()
    ok = (ent["rows_match"] and ent["schema_match"] and ent["hash_match"]
          and not ent["err"])
    print(f"{'OK ' if ok else 'BAD'} {name} {time.time()-t0:.1f}s"
          + ("" if ok else f" err={ent['err']}"), flush=True)
    json.dump(result, open(outjson, "w"), indent=2)

n_ok = sum(1 for e in result.values()
           if e["rows_match"] and e["schema_match"] and e["hash_match"]
           and not e["err"])
json.dump(result, open(outjson, "w"), indent=2)
print(f"{n_ok}/{len(result)} OK -> {outjson}")
sys.exit(0 if n_ok == len(result) else 1)
