#!/usr/bin/env python3
"""Per-query CPU drift check between two bench detail dumps.

The bench main writes `bench/bench_detail_latest.json`, whose first
line (`"metric":"detail"`) carries `queries_cpu_sec` — per-query
executor CPU, which is contention-immune (BASELINE.md's triage rule).
Per round, snapshot it as `bench/bench_detail_rNN.json`; this script
diffs the two newest snapshots (or two explicit paths) and flags any
query whose CPU moved more than THRESHOLD, either direction — the
check that would have auto-flagged round 8's dedup_simhash +15% watch
item had the threshold been lower.

Usage: python3 scripts/cpu_drift.py [old.json new.json] [--threshold 0.25]
Exit code 0 always (drift is a review signal, not a gate).
"""
import glob, json, re, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
thr = 0.25
for a in sys.argv[1:]:
    if a.startswith("--threshold"):
        thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

if len(args) >= 2:
    old_path, new_path = args[0], args[1]
else:
    snaps = sorted(glob.glob("bench/bench_detail_r*.json"),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if len(snaps) < 2:
        print(f"need two bench/bench_detail_r*.json snapshots, found {len(snaps)}")
        sys.exit(0)
    old_path, new_path = snaps[-2], snaps[-1]


def cpu_map(path):
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("metric") == "detail" and "queries_cpu_sec" in d:
                return d["queries_cpu_sec"]
    raise SystemExit(f"{path}: no detail line with queries_cpu_sec")


old, new = cpu_map(old_path), cpu_map(new_path)
rows = []
for q in sorted(set(old) & set(new)):
    a, b = old[q], new[q]
    if a <= 0:
        continue
    rel = (b - a) / a
    # ignore sub-100ms queries: scheduler noise dominates there
    if abs(rel) > thr and max(a, b) >= 0.1:
        rows.append((rel, q, a, b))

added = sorted(set(new) - set(old))
removed = sorted(set(old) - set(new))
print(f"cpu_drift: {old_path} -> {new_path}  threshold ±{thr:.0%}  "
      f"common={len(set(old) & set(new))} added={len(added)} removed={len(removed)}")
if not rows:
    print("no per-query CPU drift beyond threshold")
for rel, q, a, b in sorted(rows, key=lambda r: -abs(r[0])):
    print(f"{rel:+7.1%}  {q:40s} {a:8.3f}s -> {b:8.3f}s")
if added:
    print("new queries:", ", ".join(added))
if removed:
    print("removed queries:", ", ".join(removed))
