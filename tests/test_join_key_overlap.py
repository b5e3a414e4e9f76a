"""join_key_overlap edge pins the sweep corpus can't exercise: dangling
foreign keys (containment_a < 1), dim keys never referenced
(containment_b < 1), NULL keys dropped on both sides, and a key that is
distinct-counted once despite many duplicate rows."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def test_overlap_edges(ray_session, tmp_path):
    d = str(tmp_path)
    i64 = pa.int64()
    # orders.o_custkey {1,2,3,NULL} (3 distinct) vs customer {2,3,4}:
    # common {2,3} -> containment_a 2/3, containment_b 2/3, jaccard 2/4
    _write(d, "orders", {
        "o_orderkey": pa.array([10, 11, 12, 13], i64),
        "o_custkey": pa.array([1, 2, 3, None], i64)})
    _write(d, "customer", {"c_custkey": pa.array([2, 3, 4], i64)})
    # lineitem: duplicate part refs count once; suppkey fully contained;
    # one dangling orderkey (99)
    _write(d, "lineitem", {
        "l_orderkey": pa.array([10, 10, 11, 99], i64),
        "l_partkey": pa.array([7, 7, 7, 8], i64),
        "l_suppkey": pa.array([5, 5, 6, 6], i64)})
    _write(d, "part", {"p_partkey": pa.array([7, 8, 9], i64)})
    _write(d, "supplier", {"s_suppkey": pa.array([5, 6], i64)})
    _write(d, "events", {"user_id": pa.array([2, 2, 99], i64)})

    res = E.queries()["join_key_overlap"](d).to_pandas() \
        .sort_values("pair").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["orders", "customer", "lineitem", "part", "supplier",
              "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    orc = con.execute(E.oracle_sql()["join_key_overlap"]).df() \
        .sort_values("pair").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)

    by = res.set_index("pair")
    row = by.loc["orders.o_custkey->customer.c_custkey"]
    assert (row["n_a"], row["n_b"], row["n_common"]) == (3, 3, 2)
    assert abs(row["jaccard"] - 0.5) < 1e-9
    row = by.loc["lineitem.l_partkey->part.p_partkey"]
    assert (row["n_a"], row["n_common"]) == (2, 2)   # dup rows count once
    assert row["containment_b"] < 1.0                # part 9 unreferenced
    row = by.loc["lineitem.l_orderkey->orders.o_orderkey"]
    assert row["containment_a"] < 1.0                # dangling 99
    row = by.loc["events.user_id->customer.c_custkey"]
    assert (row["n_a"], row["n_common"]) == (2, 1)


def test_hll_estimates_bound_exact(ray_session):
    """The shuffle-free HLL profile tracks the exact operator within
    sketch tolerance on the real sf0.001 tables (p=12 -> ~1.6% std
    error per register set; inclusion-exclusion compounds it, so the
    bound here is deliberately loose but non-vacuous)."""
    exact = E.queries()["join_key_overlap"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("pair")
    est = E.queries()["join_overlap_hll"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("pair")
    assert sorted(exact.index) == sorted(est.index)
    for pair in exact.index:
        for side, col in (("n_a", "est_n_a"), ("n_b", "est_n_b")):
            n = exact.loc[pair, side]
            e = est.loc[pair, col]
            assert abs(e - n) <= max(0.1 * n, 8), (pair, side, n, e)
        ncm = exact.loc[pair, "n_common"]
        ecm = est.loc[pair, "est_common"]
        assert abs(ecm - ncm) <= max(0.2 * max(ncm, 1), 16), \
            (pair, ncm, ecm)
