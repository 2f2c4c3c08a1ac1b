#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mirrors the driver's t2 gate: run graft.Verify at a given SF dir, then run
each oracle_sql.json query in DuckDB over the same parquet tables, sort
columns by name, and compare row counts, schemas, and values.

Usage: python3 scripts/check_correctness.py [sfdir] [outdir] [skip=q1,q2]

sfdir may be a ScaleBuild replica dir (tables as parquet DIRECTORIES,
events.ts as raw INT64 nanos): views use the glob form and the events
view applies the same µs floor-divide Tables.events applies, so the
oracle compare works at replica scales too. skip= leaves out queries
whose oracle is known not to finish at that scale (the recursive-CTE
graph family past sf0.1).
"""
import json, math, os, sys, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
skip = set()
for a in sys.argv[3:]:
    if a.startswith("skip="):
        skip = set(a[5:].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
if [r for r in con.execute("DESCRIBE events").fetchall()
        if r[0] == "ts" and r[1] == "BIGINT"]:
    cols = [r[0] for r in con.execute("DESCRIBE events").fetchall()]
    sel = ", ".join("make_timestamp(ts // 1000) AS ts" if c == "ts" else c
                    for c in cols)
    con.execute(f"CREATE OR REPLACE VIEW events AS SELECT {sel} FROM "
                f"'{sfdir}/events.parquet/*.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Guard against comparing stale outputs from an earlier run: oracle_sql.json
# is written last by Verify, so every result dir must be at least as new.
_mtime = os.path.getmtime(f"{outdir}/oracle_sql.json")
for _name in oracle:
    d = f"{outdir}/{_name}"
    if not os.path.isdir(d) or os.path.getmtime(d) < _mtime - 3600:
        print(f"WARN {_name}: result dir missing or stale — rerun graft.Verify")

def norm(v):
    if v is None:
        return "\0NULL"  # sortable sentinel: None < str comparisons raise
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

ok = fail = skipped = 0
for name, sql in sorted(oracle.items()):
    if name in skip:
        print(f"SKIP {name} (oracle DNF at this scale)")
        skipped += 1
        continue
    try:
        spark_rel = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        spark_cols = [c.lower() for c in spark_rel.description and [d[0] for d in spark_rel.description]]
        spark_rows = spark_rel.fetchall()
        duck_rel = con.execute(sql)
        duck_cols = [d[0].lower() for d in duck_rel.description]
        duck_rows = duck_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fail += 1
        continue
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
        sv = sorted(tuple(norm(r[i]) for i in s_ix) for r in spark_rows)
        dv = sorted(tuple(norm(r[i]) for i in d_ix) for r in duck_rows)
        if sv != dv:
            nbad = sum(1 for a, b in zip(sv, dv) if a != b)
            problems.append(f"values: {nbad}/{len(sv)} rows differ")
            for a, b in list(zip(sv, dv))[:2000]:
                if a != b:
                    problems.append(f"  spark={a}\n   duck={b}")
                    break
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems[:3]))
        fail += 1
    else:
        print(f"OK   {name} ({len(spark_rows)} rows)")
        ok += 1

print(f"\n{ok} ok, {fail} fail / {len(oracle)} total"
      + (f" ({skipped} skipped)" if skipped else ""))
sys.exit(1 if fail else 0)
