#!/usr/bin/env python3
"""Full DuckDB baseline sweep over every oracle SQL, mirroring
graft.Bench's measurement protocol exactly: per query a warm-in run,
then the measured value is the MIN of up to three post-warm runs with a
15% two-run agreement early exit (min-of-N because external CPU
interference on this shared box strictly adds time). 32 threads, same
parquet views the oracle compare uses.

Prints ONE JSON line: {"metric":"duckdb_total","value":N,"unit":"sec",
"queries":{...},"datadir":...} — the same shape as Bench's line so the
two sweeps diff directly. Per-query run spreads go to stderr.

A per-query wall clamp (default 900 s on the whole query incl. warm-in)
records -1 (DNF) instead of hanging the sweep — recursive-CTE oracles
blow up superlinearly on the graph family at larger SFs.

Usage: python3 scripts/duckdb_bench.py <datadir> [timeout_s] [oracle.json] [only=q1,q2]
"""
import json, os, signal, sys, time
import duckdb

datadir = sys.argv[1]
timeout_s = int(sys.argv[2]) if len(sys.argv) > 2 else 900
oracle_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out/oracle_sql.json"
only = None
for a in sys.argv[4:]:
    if a.startswith("only="):
        only = set(a[5:].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open(oracle_path))


def connect():
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{datadir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    # ScaleBuild replicas keep events.ts as the raw INT64 nanosecond value
    # (Spark reads it back through Tables.events' explicit schema). Give
    # DuckDB the identical normalization Tables.events applies — floor-
    # divide to µs — so both engines see the same TIMESTAMP column.
    if [r for r in con.execute("DESCRIBE events").fetchall()
            if r[0] == "ts" and r[1] == "BIGINT"]:
        cols = [r[0] for r in con.execute("DESCRIBE events").fetchall()]
        sel = ", ".join("make_timestamp(ts // 1000) AS ts" if c == "ts" else c
                        for c in cols)
        con.execute(f"CREATE OR REPLACE VIEW events AS SELECT {sel} FROM "
                    f"'{datadir}/events.parquet/*.parquet'")
    return con


def measure(sql):
    """Child process: warm + min-of-N protocol; prints CHILD_RESULT."""
    pid = os.fork()
    if pid == 0:
        try:
            con = connect()
            t0 = time.time()
            con.execute(sql).fetchall()
            warm = time.time() - t0
            runs = []
            while len(runs) < 3 and (len(runs) < 2 or
                                     max(runs) > min(runs) * 1.15):
                t0 = time.time()
                con.execute(sql).fetchall()
                runs.append(time.time() - t0)
            spread = "/".join(f"{r:.2f}" for r in runs)
            print(f"CHILD_RESULT {min(runs):.3f} warm={warm:.2f} runs={spread}",
                  flush=True)
            os._exit(0)
        except Exception as e:
            print(f"CHILD_ERROR {e}", flush=True)
            os._exit(1)
    r, w = None, None
    deadline = time.time() + timeout_s
    while True:
        done, status = os.waitpid(pid, os.WNOHANG)
        if done:
            return status == 0
        if time.time() > deadline:
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
            print(f"CHILD_TIMEOUT >{timeout_s}s", flush=True)
            return False
        time.sleep(0.2)


# run each query in a fresh child, parse its CHILD_RESULT line via a pipe
results = {}
for n in sorted(oracle):
    if only is not None and n not in only:
        continue
    sql = oracle[n]
    rfd, wfd = os.pipe()
    pid = os.fork()
    if pid == 0:
        os.close(rfd)
        os.dup2(wfd, 1)
        ok = measure(sql)
        os._exit(0 if ok else 1)
    os.close(wfd)
    out = b""
    with os.fdopen(rfd, "rb") as f:
        out = f.read()
    os.waitpid(pid, 0)
    val = -1.0
    for line in out.decode(errors="replace").splitlines():
        if line.startswith("CHILD_RESULT"):
            val = float(line.split()[1])
            print(f"[duck] {n:<24s} {line[len('CHILD_RESULT '):]}",
                  file=sys.stderr, flush=True)
        elif line.startswith(("CHILD_ERROR", "CHILD_TIMEOUT")):
            print(f"[duck] {n:<24s} {line}", file=sys.stderr, flush=True)
    results[n] = val
    sys.stderr.flush()

# Host-calibration anchor: the same fixed CPU probe arithmetic
# graft.Bench runs (sum(i % 1000003) over range(), 32 threads, warm +
# min-of-3; 2e8 rows here vs Spark's 4e9 because DuckDB's per-row cost
# on this shape is ~20× — each engine carries its own pinned
# reference). A host_factor of 1.3 in a sweep's artifact says that
# sweep ran on a ~30%-slower host — drift triage becomes a recorded
# column instead of a hand-run protocol.
PROBE_REF_SEC = 1.00  # pinned 2026-08-15 (round 12), quiet host


def host_probe():
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    sql = "SELECT sum(i % 1000003) FROM range(200000000) t(i)"
    con.execute(sql).fetchall()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        con.execute(sql).fetchall()
        runs.append(time.time() - t0)
    return min(runs)


probe = host_probe()
host_factor = probe / PROBE_REF_SEC
print(f"[duck] host_probe={probe:.3f} factor={host_factor:.2f} "
      f"(ref={PROBE_REF_SEC})", file=sys.stderr)

total = sum(v for v in results.values() if v >= 0)
qs = ",".join(f'"{k}":{v}' for k, v in results.items())
print(f'{{"metric":"duckdb_total","value":{total:.3f},"unit":"sec",'
      f'"host_probe_sec":{probe:.3f},"host_factor":{host_factor:.3f},'
      f'"value_norm":{total / host_factor:.3f},'
      f'"queries":{{{qs}}},"datadir":"{datadir}"}}')
