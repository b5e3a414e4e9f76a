"""Discriminating edges for customer_order_cadence (same-day ties pin a
zero gap, single-order customers vanish, NULL dates drop) and
supplier_hhi_by_type (monopoly pins hhi=1, even split pins 0.5, NULL
quantity and unknown parts drop), each against the DuckDB twin."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _oracle(d, name, tables):
    con = duckdb.connect()
    for tab in tables:
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM "
                    f"read_parquet('{d}/{tab}.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def _cmp(res, want, keys):
    a = res.sort_values(keys).reset_index(drop=True)
    b = want[list(a.columns)].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)


def test_cadence_edges(ray_session, tmp_path):
    d = str(tmp_path)
    ts = pa.timestamp("us")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 3, 3, 4, 4], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-01", "2024-01-11",   # tie then +10d
             "2024-03-01",                               # single order
             "2024-02-01", None,                         # null date drops
             "2024-05-05", "2024-05-09"]), ts),
    }), os.path.join(d, "orders.parquet"))
    res = E.queries()["customer_order_cadence"](d).to_pandas()
    # customer 2 (single order) and 3 (one valid date) are excluded
    assert sorted(res["o_custkey"]) == [1, 4]
    r1 = res[res["o_custkey"] == 1].iloc[0]
    assert (r1["n_orders"], r1["n_gaps"]) == (3, 2)
    assert (r1["min_gap_days"], r1["max_gap_days"]) == (0, 10)
    assert r1["mean_gap_days"] == 5.0
    r4 = res[res["o_custkey"] == 4].iloc[0]
    assert (r4["n_gaps"], r4["min_gap_days"], r4["max_gap_days"]) \
        == (1, 4, 4)
    _cmp(res, _oracle(d, "customer_order_cadence", ["orders"]),
         ["o_custkey"])


def test_hhi_edges(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 11, 12], pa.int64()),
        "p_type": pa.array(["MONO", "SPLIT", "SPLIT"], pa.string()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        # part 99 is not in the part table -> inner-join drop;
        # NULL quantity drops before aggregation
        "l_partkey": pa.array([10, 10, 11, 12, 99, 10], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 3, 4, 1], pa.int64()),
        "l_quantity": pa.array([5.0, 7.0, 6.0, 6.0, 8.0, None],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    res = E.queries()["supplier_hhi_by_type"](d).to_pandas()
    mono = res[res["p_type"] == "MONO"].iloc[0]
    assert (mono["n_suppliers"], mono["total_qty"]) == (1, 12)
    assert (mono["hhi"], mono["top_share"]) == (1.0, 1.0)
    split = res[res["p_type"] == "SPLIT"].iloc[0]
    assert (split["n_suppliers"], split["total_qty"]) == (2, 12)
    assert (split["hhi"], split["top_share"]) == (0.5, 0.5)
    _cmp(res, _oracle(d, "supplier_hhi_by_type", ["lineitem", "part"]),
         ["p_type"])
