#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's DuckDB
compare: for each query parquet written by graft.Verify, run the oracle SQL
in DuckDB over the same sf tables and diff values (columns sorted by name,
rows sorted). Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        exp = con.execute(sql).df()
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"row count differs: oracle={len(exp)} spark={len(got)}"))
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        # Dtype-strict: the driver's hash is dtype-sensitive, so an int64
        # Spark column vs a HUGEINT/float64 oracle column must FAIL here too.
        if ev.dtype.kind != gv.dtype.kind:
            bad = f"col {c}: dtype kind differs: oracle={ev.dtype} spark={gv.dtype}"
            break
        if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
            diff = ~((ev.isna() & gv.isna()) | (abs(ev - gv) <= 0))
        else:
            diff = ev.astype(str) != gv.astype(str)
        if diff.any():
            i = diff.idxmax()
            bad = f"col {c} row {i}: oracle={ev[i]!r} spark={gv[i]!r}"
            break
    if bad:
        fails.append((name, bad))
    else:
        print(f"  OK   {name} ({len(exp)} rows)")
for name, msg in fails:
    print(f"  FAIL {name}: {msg}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracles match")
sys.exit(1 if fails else 0)
