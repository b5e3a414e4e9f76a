"""Planted violations for every constraint class in integrity_report:
range breaks, nulls, duplicate keys (single and composite), and orphan
foreign keys — including a NULL fk, pinned as an orphan on both engines
(the NOT EXISTS contract)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines.streaming import integrity_report


def test_planted_violations(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    ts = pd.Timestamp("1997-01-01")
    pq.write_table(pa.table({
        # rows: ok, bad discount, null shipdate, orphan part, orphan supp,
        # orphan order (NULL fk), duplicate (orderkey, linenumber)
        "l_orderkey": pa.array([1, 1, 1, 1, 1, None, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 4, 5, 6, 1], pa.int32()),
        "l_partkey": pa.array([10, 10, 10, 99, 10, 10, 10], pa.int64()),
        "l_suppkey": pa.array([20, 20, 20, 20, 88, 20, 20], pa.int64()),
        "l_discount": pa.array([0.05, 1.5, 0.0, 0.0, 0.0, 0.0, 0.0],
                               pa.float64()),
        "l_shipdate": pa.array([ts, ts, None, ts, ts, ts, ts],
                               pa.timestamp("us")),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 2], pa.int64()),   # dup orderkey 2
        "o_custkey": pa.array([30, 30, 31], pa.int64()), # 31 is orphan
        "o_totalprice": pa.array([100.0, -5.0, 50.0], pa.float64()),
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([30, 30], pa.int64()),     # dup custkey
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([10], pa.int64()),
    }), d / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([20], pa.int64()),
    }), d / "supplier.parquet")

    got = integrity_report(str(d)).to_pandas() \
        .set_index("constraint_name")["n_violations"].to_dict()
    assert got == {
        "chk_lineitem_discount_range": 1,
        "chk_lineitem_shipdate_notnull": 1,
        "chk_orders_totalprice_positive": 1,
        "fk_lineitem_orderkey": 1,      # the NULL fk is an orphan
        "fk_lineitem_partkey": 1,
        "fk_lineitem_suppkey": 1,
        "fk_orders_custkey": 1,
        "pk_customer": 1,
        "pk_lineitem": 1,               # (1,1) appears twice
        "pk_orders": 1,
    }


def test_bundled_corpus_known_violations(ray_session):
    """The suite correctly surfaces the one REAL artifact of the bundled
    generator: (l_orderkey, l_linenumber) is not unique (6000 rows, 4599
    distinct pairs at sf0.001 — verified against DuckDB's count
    DISTINCT).  Everything else is clean."""
    df = integrity_report("/root/testdata/sf0.001").to_pandas() \
        .set_index("constraint_name")["n_violations"]
    assert len(df) == 10
    assert df["pk_lineitem"] == 6000 - 4599
    assert (df.drop("pk_lineitem") == 0).all()
