#!/usr/bin/env python3
"""Re-derive BASELINE for the current declared suite (round-7 task 2).

Runs the FULL declared oracle suite (oracle_sql.json as dumped by
graft.Verify) in DuckDB against a chosen SF tier and reports per-query
and total wall times, warm-process methodology (suite executed twice in
one process; the second pass is the measurement — same as the original
BASELINE.md 58-query derivation).

Usage:
  python3 scripts/baseline_oracle.py [oracle_sql.json] [sfdir] [threads]

Defaults: /tmp/verify_out/oracle_sql.json, /root/testdata/sf0.1, 4.
The dump's read_parquet paths point at the tier Verify ran on (sf0.01);
they are rewritten to the target tier.
"""
import duckdb, json, re, sys, time

dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 4

sql = json.load(open(dump))
# rewrite whatever tier the dump was produced on to the target tier
sql = {n: re.sub(r"/root/testdata/sf[0-9.]+", sfdir, q) for n, q in sql.items()}

con = duckdb.connect()
con.execute(f"SET threads={threads}")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def run_suite():
    times = {}
    for name, q in sql.items():
        t0 = time.perf_counter()
        try:
            con.sql(q).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:
            times[name] = None
            print(f"ERR {name}: {str(e)[:200]}", file=sys.stderr)
    return times

cold = run_suite()          # warm the FS cache / duckdb process
warm = run_suite()          # the measurement
ok = {n: t for n, t in warm.items() if t is not None}
total = sum(ok.values())
top = sorted(ok.items(), key=lambda kv: -kv[1])[:15]
print(json.dumps({
    "sfdir": sfdir, "threads": threads, "n_queries": len(sql),
    "n_ok": len(ok), "total_warm_sec": round(total, 2),
    "total_cold_sec": round(sum(t for t in cold.values() if t is not None), 2),
    "top15": {n: round(t, 3) for n, t in top},
}, indent=1))
