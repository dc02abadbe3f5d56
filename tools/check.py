#!/usr/bin/env python3
"""Local oracle self-check, mimicking the driver's t2 gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs DuckDB on oracle_sql.json (dumped by graft.Verify) against the same
parquet tables, and compares each query's parquet output: column names
(sorted), row count, and values (rows sorted by all columns).
"""
import json
import math
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    ec = sorted(exp.columns)
    gc = sorted(got.columns)
    if ec != gc:
        fails.append((name, f"columns differ: oracle={ec} spark={gc}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"row count differs: oracle={len(exp)} spark={len(got)}"))
        continue
    e = exp[ec].sort_values(ec, ignore_index=True)
    g = got[gc].sort_values(gc, ignore_index=True)
    bad = None
    for c in ec:
        ev, gv = e[c].tolist(), g[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    bad = f"col {c} row {i}: oracle={a!r} spark={b!r} (diff={a-b!r})"
                    break
            elif str(a) != str(b):
                bad = f"col {c} row {i}: oracle={a!r} spark={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        print(f"  OK   {name} ({len(exp)} rows)")

if fails:
    for name, msg in fails:
        print(f"  FAIL {name}: {msg}")
    sys.exit(1)
print(f"all {len(oracle)} queries match")
