#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle gate (NOT part of the
library). Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the raw fixture tables, and compares
schema-insensitively: columns sorted by name, rows sorted, values
normalized (Decimal -> str, ts -> iso). Prints PASS/FAIL per query."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
from decimal import Decimal

args = list(sys.argv[1:])
json_out = None
if "--json" in args:
    i = args.index("--json")
    json_out = args[i + 1]
    del args[i:i + 2]
sf_dir, out_dir = args[0], args[1]
report = {}
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, Decimal):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, float):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

n_pass = n_fail = n_noorc = 0
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    tbl = pq.read_table(d)
    scols = tbl.column_names
    srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
    if name not in oracle:
        n_noorc += 1
        report[name] = {"rows": len(srows), "oracle": False}
        print(f"  ....  {name}: no oracle ({len(srows)} rows)")
        continue
    try:
        res = con.execute(oracle[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
    except Exception as e:
        n_fail += 1
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "error": str(e)}
        print(f"  FAIL  {name}: oracle SQL error: {e}")
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    report[name] = {"rows_match": len(sr) == len(orr),
                    "schema_match": sc == oc, "hash_match": sr == orr}
    if sc != oc:
        n_fail += 1
        print(f"  FAIL  {name}: columns differ: spark={sc} oracle={oc}")
    elif sr != orr:
        n_fail += 1
        diff = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
        msg = f"rows {len(sr)} vs {len(orr)}"
        for i in diff:
            msg += f"\n          [{i}] spark={sr[i]}\n               orcl ={orr[i]}"
        print(f"  FAIL  {name}: {msg}")
    else:
        n_pass += 1
        print(f"  PASS  {name} ({len(sr)} rows)")
print(f"== {n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
if json_out:
    summary = {"pass": n_pass, "fail": n_fail, "rows_only": n_noorc,
               "queries": report}
    with open(json_out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
sys.exit(1 if n_fail else 0)
