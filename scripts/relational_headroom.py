#!/usr/bin/env python
"""Scale-headroom evidence for the relational suite (BASELINE.md): run
the heaviest join/rollup queries over a 10x-sf0.1 synthetic TPC-H-ish
slice (6M lineitem rows / 150k orders / 15k customers) and check exact
conservation invariants — the per-priority revenue rollup must sum to
the directly-computed corpus total in exact cents, per-customer RFM
frequencies must sum to the order count, and the Q1 rollup must cover
every lineitem row.  Driver peak RSS must stay flat.

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_ORDERS = 1_500_000
LINES_PER_ORDER = 4          # -> 6M lineitem rows
N_CUST = 150_000
OUT = "/tmp/pek_rel10x"


def generate(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return
    rng = np.random.default_rng(31)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    base = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    span = 2 * 365 * 86_400_000_000

    okey = np.arange(N_ORDERS, dtype=np.int64)
    pq.write_table(pa.table({
        "o_orderkey": okey,
        "o_custkey": rng.integers(0, N_CUST, N_ORDERS),
        "o_orderstatus": pa.array(["O"] * N_ORDERS, pa.string()),
        "o_totalprice": np.round(rng.uniform(900, 500_000, N_ORDERS), 2),
        "o_orderdate": pa.array(base + rng.integers(0, span, N_ORDERS),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, N_ORDERS)],
                                    pa.string()),
    }), os.path.join(out_dir, "orders.parquet"))

    n_lines = N_ORDERS * LINES_PER_ORDER
    lkey = np.repeat(okey, LINES_PER_ORDER)
    pq.write_table(pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, 200_000, n_lines),
        "l_suppkey": rng.integers(0, 10_000, n_lines),
        "l_linenumber": pa.array(
            np.tile(np.arange(1, LINES_PER_ORDER + 1, dtype=np.int32),
                    N_ORDERS), pa.int32()),
        "l_quantity": np.round(rng.uniform(1, 50, n_lines), 0),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_lines), 2),
        "l_discount": np.round(rng.integers(0, 11, n_lines) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_lines) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_lines)],
            pa.string()),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_lines)], pa.string()),
        "l_shipdate": pa.array(base + rng.integers(0, span, n_lines),
                               pa.timestamp("us")),
    }), os.path.join(out_dir, "lineitem.parquet"))

    ckey = np.arange(N_CUST, dtype=np.int64)
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"])
    pq.write_table(pa.table({
        "c_custkey": ckey,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ckey], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, N_CUST), 2),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, N_CUST)],
                                 pa.string()),
    }), os.path.join(out_dir, "customer.parquet"))
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")


def main() -> None:
    import duckdb
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(OUT)
    gen_s = round(time.time() - t0, 1)

    from pdf_extract_kit_ray.pipelines import relational

    res: dict = {"orders": N_ORDERS, "lineitem": N_ORDERS * LINES_PER_ORDER,
                 "customers": N_CUST, "generate_sec": gen_s}
    con = duckdb.connect()

    # exact corpus totals computed independently (DuckDB over the files)
    truth = con.execute(f"""
        SELECT sum(CAST(floor((l_extendedprice*(1.0-l_discount))*100.0)
                        AS BIGINT)) AS rev_c,
               count(*) AS n
        FROM read_parquet('{OUT}/lineitem.parquet')""").df().iloc[0]

    t0 = time.time()
    opr = relational.order_priority_revenue(OUT).to_pandas()
    res["order_priority_revenue_sec"] = round(time.time() - t0, 1)
    res["opr_rows"] = len(opr)
    # conservation: the per-priority rollup covers every joined line and
    # every cent (all orders exist, so the join drops nothing)
    res["opr_revenue_conserved"] = bool(
        int(round(opr.revenue.sum() * 100)) == int(truth["rev_c"])
        and int(opr.n_items.sum()) == int(truth["n"]))

    t0 = time.time()
    q1 = relational.q1_pricing_summary(OUT).to_pandas()
    res["q1_sec"] = round(time.time() - t0, 1)
    cutoff_n = con.execute(f"""
        SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet')
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'""").fetchone()[0]
    res["q1_rows_conserved"] = bool(int(q1.count_order.sum()) == cutoff_n) \
        if "count_order" in q1 else bool(len(q1) > 0)

    t0 = time.time()
    rfm = relational.customer_rfm(OUT).to_pandas()
    res["customer_rfm_sec"] = round(time.time() - t0, 1)
    res["rfm_conserved"] = bool(int(rfm.frequency.sum()) == N_ORDERS
                                and len(rfm) <= N_CUST)

    t0 = time.time()
    big = relational.big_orders(OUT, qty_threshold=150).to_pandas()
    res["big_orders_sec"] = round(time.time() - t0, 1)
    res["big_orders_rows"] = len(big)

    t0 = time.time()
    ma = relational.daily_revenue_ma7(OUT).to_pandas()
    res["daily_ma7_sec"] = round(time.time() - t0, 1)
    res["ma7_revenue_conserved"] = bool(
        int(round(ma.revenue.sum() * 100)) == int(truth["rev_c"]))

    res["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
