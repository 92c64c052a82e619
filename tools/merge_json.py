#!/usr/bin/env python3
"""Merge per-key CORRECTNESS JSON fragments (later files win), used to
assemble a full-suite artifact from budgeted partial runs.
Usage: merge_json.py out.json in1.json [in2.json ...]"""
import sys, json

out = sys.argv[1]
merged = {}
for p in sys.argv[2:]:
    merged.update(json.load(open(p)))
json.dump(dict(sorted(merged.items())), open(out, "w"), indent=2)
n_ok = sum(1 for e in merged.values()
           if e["rows_match"] and e["schema_match"] and e["hash_match"]
           and not e["err"])
print(f"{n_ok}/{len(merged)} OK -> {out}")
