#!/usr/bin/env python3
"""Add a shape-continued `orders` table to the facts fixture tiers.

Round-8 companion to gen_sf1_facts.py / gen_sf10_facts.py: the new
orders-grain operators (agg_rfm_segments — three GlobalRank quintile
passes on the customer grain; agg_winsorized_mean — percentile +
clamped sum) need 10x/100x points too, and the facts fixtures carried
only lineitem + events. Shape continuation measured from the driver
tiers (sf0.001/0.01/0.1): orders = 10 x customers exactly (o_custkey
uniform over n_orders/10 keys), o_totalprice uniform ~1000..500000
(2dp), o_orderdate uniform 1995-01-01..2001-08-01, status P/F/O and
the five priorities uniform. Row counts follow each tier's lineitem
order count (sf1: ~1.47M orders / 147k customers; sf10: ~14.7M / 1.47M).

Deterministic: seed 813. Idempotent — skips a tier whose orders.parquet
already exists (delete to regenerate).
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

for out in ["fixtures/sf1_facts", "fixtures/sf10_facts"]:
    li_path = os.path.join(out, "lineitem.parquet")
    o_path = os.path.join(out, "orders.parquet")
    if not os.path.exists(li_path):
        print(f"skip {out}: no lineitem.parquet (run the tier generator first)")
        continue
    # order count = the tier's actual lineitem order keyspace
    n_orders = int(pq.read_table(li_path, columns=["l_orderkey"])
                   .column("l_orderkey").to_numpy().max()) + 1
    n_cust = n_orders // 10
    if os.path.exists(o_path):
        print(f"skip {out}: orders.parquet already present")
    else:
        rng = np.random.default_rng(813)
        lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
        hi = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
        tbl = pa.table({
            "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_orders, dtype=np.int64)),
            "o_orderstatus": pa.array(
                np.array(["P", "F", "O"])[rng.integers(0, 3, n_orders)]),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000.0, 500000.0, n_orders), 2)),
            "o_orderdate": pa.array(
                rng.integers(lo, hi, n_orders), type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                          "5-LOW"])[rng.integers(0, 5, n_orders)]),
        })
        pq.write_table(tbl, o_path)
        print(f"wrote {n_orders} orders ({n_cust} customers) -> {o_path}")

    # round-12 companion: the customer DIMENSION for the orders above
    # (the §2.41/§2.43 segment-joining ops need it at the 10x/100x
    # tiers). Shape continuation from the driver tiers: 5 market
    # segments uniform, acctbal uniform -999.99..9999.99 (2dp).
    c_path = os.path.join(out, "customer.parquet")
    if not os.path.exists(c_path):
        crng = np.random.default_rng(814)
        segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                         "HOUSEHOLD", "MACHINERY"])
        ctbl = pa.table({
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": pa.array(
                np.char.add("Customer#", np.arange(n_cust).astype(str))),
            "c_nationkey": pa.array(
                crng.integers(0, 25, n_cust, dtype=np.int64)),
            "c_acctbal": pa.array(
                np.round(crng.uniform(-999.99, 9999.99, n_cust), 2)),
            "c_mktsegment": pa.array(segs[crng.integers(0, 5, n_cust)]),
        })
        pq.write_table(ctbl, c_path)
        print(f"wrote {n_cust} customers -> {c_path}")
