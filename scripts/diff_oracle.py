#!/usr/bin/env python3
"""Local differential check: Spark Verify output vs DuckDB oracle.

Mimics the driver's t2 gate (row count / schema / value compare with
columns sorted by name) so mismatches are caught before the driver runs.
Usage: python3 scripts/diff_oracle.py <verify_out_dir> [query ...]
"""
import duckdb, glob, json, sys, math

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
only = set(sys.argv[2:])
con = duckdb.connect()
sql = json.load(open(f"{out}/oracle_sql.json"))

def norm_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and getattr(df[c].dt, "tz", None) is not None:
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b or str(a) == str(b)

fails = 0
for name, q in sql.items():
    if only and name not in only:
        continue
    d = f"{out}/{name}"
    files = glob.glob(d + "/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        a = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        b = con.sql(q).df()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fails += 1
        continue
    a, b = norm_df(a), norm_df(b)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
        fails += 1
        continue
    dt_a, dt_b = [str(t) for t in a.dtypes], [str(t) for t in b.dtypes]
    if dt_a != dt_b:
        print(f"WARN {name}: dtypes spark={dt_a} oracle={dt_b}")
    bad = []
    av, bv = a.values, b.values
    for i in range(len(a)):
        for j in range(len(a.columns)):
            if not cell_eq(av[i, j], bv[i, j]):
                bad.append((i, a.columns[j], av[i, j], bv[i, j]))
    if bad:
        print(f"FAIL {name}: {len(bad)} differing cells; first: {bad[:5]}")
        fails += 1
    else:
        print(f"ok   {name} ({len(a)} rows)")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len([n for n in sql if not only or n in only])} queries")
sys.exit(1 if fails else 0)
