#!/usr/bin/env python3
"""Generate the 100x events/lineitem fixture tier (fixtures/sf10_facts).

Round-8 task (VERDICT r7 #7): the EDGES build is the facts family's
scale-sensitive step (alpha 0.87 fitted over sf0.01 -> sf0.1 ->
sf1_facts); this adds one more 10x point — 60M lineitem rows / ~10.8M
events — so the exponent is confirmed PAST the 10x tier. Same shape
continuation as scripts/gen_sf1_facts.py (keyspaces scale with rows:
parts 200k -> 2M, suppliers 10k -> 100k, users 15k -> 150k), but the
order-size draw is vectorized (chunked Poisson + cumsum trim) — the
sf1 generator's one-at-a-time loop would take minutes at 14.7M orders.

Deterministic: seed 1008. Output ~1.3 GB; .gitignored for size, the
repo carries the generator.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "sf10_facts")
rng = np.random.RandomState(1008)

# ---- lineitem ----
TARGET_LINES = 60_000_000
N_PARTS = 2_000_000
N_SUPP = 100_000
# vectorized order-size draw: overshoot the order count estimate, trim
# at the first order whose cumulative line count reaches the target
est_orders = int(TARGET_LINES / 4.0 * 1.05)
counts = np.minimum(17, 1 + rng.poisson(3.075, est_orders))
cum = np.cumsum(counts)
n_orders = int(np.searchsorted(cum, TARGET_LINES) + 1)
counts = counts[:n_orders]
n = int(counts.sum())
orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), counts)
# per-line 1..c numbering without a Python loop: position minus the
# order's starting offset
starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
linenumber = (np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1).astype(np.int32)
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
os.makedirs(OUT, exist_ok=True)
pq.write_table(li, os.path.join(OUT, "lineitem.parquet"))
del li, orderkeys, linenumber, starts

# ---- events ----
N_USERS = 150_000
per_user = rng.randint(45, 100, N_USERS)
m = int(per_user.sum())
user_id = np.repeat(np.arange(N_USERS, dtype=np.int64), per_user)
ts_lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
ts_hi = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(np.int64)
ts = ts_lo + (rng.rand(m) * (ts_hi - ts_lo)).astype(np.int64)
order = np.argsort(ts, kind="stable")  # event_id assigned in time order
props_k = rng.randint(0, 100, m)
ev = pa.table({
    "event_id": pa.array(np.arange(m, dtype=np.int64)),
    "ts": pa.array(ts[order], pa.timestamp("us")),
    "user_id": pa.array(user_id[order]),
    "event_type": pa.array(
        np.array(["click", "view", "purchase", "signup", "error"])[
            rng.randint(0, 5, m)]),
    "value": pa.array(np.round(rng.exponential(50.0, m), 2)),
    "props": pa.array([f'{{"k": {k}}}' for k in props_k]),
})
pq.write_table(ev, os.path.join(OUT, "events.parquet"))
print(f"wrote {n} lineitem rows ({n_orders} orders) and {m} events "
      f"({N_USERS} users) to {OUT}")
