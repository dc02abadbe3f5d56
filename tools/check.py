#!/usr/bin/env python3
"""Local oracle self-check, mimicking the driver's t2 gate — strict form.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs DuckDB on oracle_sql.json (dumped by graft.Verify) against the same
parquet tables and compares each query's parquet output against the oracle:

  1. column names (sorted) must match;
  2. column TYPES must match exactly (DuckDB DESCRIBE of both sides) — a
     Spark DECIMAL(28,4) vs DuckDB DECIMAL(38,4) is a FAIL here even when
     the values agree, because the driver's hasher canonicalizes decimals
     differently than a float64 round-trip (the r10 q117/q118/q119 lesson);
  3. every output column type must be driver-stable — decimals must be
     frozen to DOUBLE (or BIGINT cents) at the query boundary, never
     emitted raw;
  4. values must match exactly, compared inside DuckDB (EXCEPT ALL both
     directions on the native types — scale-preserving for decimals, bit
     compare for doubles; NaNs compare equal under DuckDB set semantics),
     never through a pandas float64 conversion that can mask divergence.
"""
import json
import re
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types the driver's hasher is known to canonicalize identically on both
# engines. Anything else (DECIMAL especially) must be frozen before the
# query boundary.
STABLE = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|HUGEINT|DOUBLE|FLOAT|VARCHAR|DATE|"
    r"BOOLEAN|TIMESTAMP(_NS| WITH TIME ZONE)?|BLOB|"
    r"(BIGINT|INTEGER|DOUBLE|VARCHAR|FLOAT)\[\])$"
)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
unstable = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql)
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue

    etypes = dict(zip(exp.columns, (str(t) for t in exp.types)))
    gtypes = dict(zip(got.columns, (str(t) for t in got.types)))
    ec, gc = sorted(etypes), sorted(gtypes)
    if ec != gc:
        fails.append((name, f"columns differ: oracle={ec} spark={gc}"))
        continue

    # 2. exact type equality per column (normalize the one benign family:
    #    duckdb reads Spark's timestamp parquet as TIMESTAMP WITH TIME ZONE
    #    or TIMESTAMP_NS depending on writer options — both hash as the
    #    same instant, so collapse the timestamp spellings).
    def norm(t):
        return "TIMESTAMP" if t.startswith("TIMESTAMP") else t

    tbad = [
        (c, etypes[c], gtypes[c])
        for c in ec
        if norm(etypes[c]) != norm(gtypes[c])
    ]
    if tbad:
        fails.append((name, "types differ: " + "; ".join(
            f"{c}: oracle={a} spark={b}" for c, a, b in tbad)))
        continue

    # 3. stable-type sweep: raw decimals (or other exotic types) at the
    #    output boundary are a driver hazard even when both sides agree.
    for c in ec:
        if not STABLE.match(norm(gtypes[c])):
            unstable.append((name, c, gtypes[c]))

    nexp = exp.aggregate("count(*)").fetchone()[0]
    ngot = got.aggregate("count(*)").fetchone()[0]
    if nexp != ngot:
        fails.append((name, f"row count differs: oracle={nexp} spark={ngot}"))
        continue

    # 4. exact value compare inside DuckDB, native types, both directions.
    cols = ", ".join(f'"{c}"' for c in ec)
    con.register("_exp_rel", exp)
    con.register("_got_rel", got)
    ndiff = con.sql(
        f"SELECT count(*) FROM ("
        f"(SELECT {cols} FROM _exp_rel EXCEPT ALL SELECT {cols} FROM _got_rel)"
        f" UNION ALL "
        f"(SELECT {cols} FROM _got_rel EXCEPT ALL SELECT {cols} FROM _exp_rel))"
    ).fetchone()[0]
    if ndiff:
        sample = con.sql(
            f"SELECT 'oracle' AS side, * FROM "
            f"(SELECT {cols} FROM _exp_rel EXCEPT ALL SELECT {cols} FROM _got_rel) LIMIT 2"
        ).fetchall() + con.sql(
            f"SELECT 'spark' AS side, * FROM "
            f"(SELECT {cols} FROM _got_rel EXCEPT ALL SELECT {cols} FROM _exp_rel) LIMIT 2"
        ).fetchall()
        fails.append((name, f"{ndiff} differing rows, e.g. {sample}"))
    else:
        print(f"  OK   {name} ({nexp} rows)")
    con.unregister("_exp_rel")
    con.unregister("_got_rel")

if unstable:
    print(f"\n  {len(unstable)} driver-UNSTABLE output column(s) — freeze these:")
    for name, c, t in unstable:
        print(f"  UNSTABLE {name}.{c}: {t}")
if fails:
    for name, msg in fails:
        print(f"  FAIL {name}: {msg}")
if fails or unstable:
    sys.exit(1)
print(f"all {len(oracle)} queries match (values + exact types)")
