#!/usr/bin/env python3
"""Generate the 10x events/lineitem fixture tier (fixtures/sf1_facts).

Round-7 task: the dedup/ANN family has measured 3-tier scale curves
(fixtures/sf1_docs); the window/graph/as-of families do not — their
inputs are events and lineitem, which top out at sf0.1 (100k events /
600k lineitem). This produces the 10x continuation of the driver's
generative family so ScalingBench can fit alpha for graph_pagerank3,
graph_kcore3, join_asof and funnel_three_step on measured points.

Shape continuation (driver tiers scale keyspaces WITH rows — measured
sf0.001 -> 0.01 -> 0.1: parts 200 -> 2k -> 20k, users 15 -> 150 ->
1500, orders ~1.47k -> ~14.7k -> ~147k):

- lineitem: ~6M rows. Orders drawn until 6M lines: lines/order =
  1 + Poisson(3.075) capped at 17 (matches the observed histogram,
  mean 4.07); l_partkey uniform over 200,000 parts; l_suppkey uniform
  over 10,000; qty uniform 1..50; price uniform 900..105000 (2dp);
  discount 0..0.10, tax 0..0.08 (2dp); returnflag A/N/R, linestatus
  F/O uniform; shipdate uniform 1995-01-02..2001-11-04. The strong
  (w>=2) co-purchase graph stays ~4k edges like every driver tier —
  pair re-occurrence thins as the part keyspace grows, which is
  exactly the property that makes the EDGES *build* (one l_orderkey
  shuffle over 10x rows) the scale-sensitive part, not the traversal.
- events: ~1M rows over 15,000 users; events/user uniform 45..99
  (observed 45..99, mean 66.7); ts uniform 2024-01-01..2024-01-30
  (timestamp[us], matching the regenerated driver fixtures);
  event_type uniform over {click,view,purchase,signup,error}; value
  Exponential(mean 50) rounded to 2dp; props = {"k": 0..99}.

Deterministic: seed 1007. Output ~70 MB; written once, the repo
carries the generator (driver's read-only testdata untouched).
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "sf1_facts")
rng = np.random.RandomState(1007)

# ---- lineitem ----
TARGET_LINES = 6_000_000
N_PARTS = 200_000
N_SUPP = 10_000
counts = []
total = 0
while total < TARGET_LINES:
    c = min(17, 1 + rng.poisson(3.075))
    counts.append(c)
    total += c
counts = np.array(counts)
n = int(counts.sum())
orderkeys = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
linenumber = np.concatenate([np.arange(1, c + 1) for c in counts]).astype(np.int32)
ship_lo = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
ship_hi = np.datetime64("2001-11-04").astype("datetime64[us]").astype(np.int64)
li = pa.table({
    "l_orderkey": pa.array(orderkeys),
    "l_partkey": pa.array(rng.randint(0, N_PARTS, n).astype(np.int64)),
    "l_suppkey": pa.array(rng.randint(0, N_SUPP, n).astype(np.int64)),
    "l_linenumber": pa.array(linenumber),
    "l_quantity": pa.array(rng.randint(1, 51, n).astype(np.float64)),
    "l_extendedprice": pa.array(np.round(900 + rng.rand(n) * 104100, 2)),
    "l_discount": pa.array(np.round(rng.rand(n) * 0.10, 2)),
    "l_tax": pa.array(np.round(rng.rand(n) * 0.08, 2)),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.randint(0, 3, n)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.randint(0, 2, n)]),
    "l_shipdate": pa.array(
        (ship_lo + (rng.rand(n) * (ship_hi - ship_lo)).astype(np.int64))
        // 86_400_000_000 * 86_400_000_000,
        pa.timestamp("us")),
})

# ---- events ----
N_USERS = 15_000
per_user = rng.randint(45, 100, N_USERS)
m = int(per_user.sum())
user_id = np.repeat(np.arange(N_USERS, dtype=np.int64), per_user)
ts_lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
ts_hi = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(np.int64)
ts = ts_lo + (rng.rand(m) * (ts_hi - ts_lo)).astype(np.int64)
order = np.argsort(ts, kind="stable")  # event_id assigned in time order
ev = pa.table({
    "event_id": pa.array(np.arange(m, dtype=np.int64)),
    "ts": pa.array(ts[order], pa.timestamp("us")),
    "user_id": pa.array(user_id[order]),
    "event_type": pa.array(
        np.array(["click", "view", "purchase", "signup", "error"])[
            rng.randint(0, 5, m)]),
    "value": pa.array(np.round(rng.exponential(50.0, m), 2)),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.randint(0, 100, m)]),
})

os.makedirs(OUT, exist_ok=True)
pq.write_table(li, os.path.join(OUT, "lineitem.parquet"))
pq.write_table(ev, os.path.join(OUT, "events.parquet"))
print(f"wrote {n} lineitem rows ({len(counts)} orders) and {m} events "
      f"({N_USERS} users) to {OUT}")
