"""part_triangles on a hand-computable graph: two orders over parts
{1,2,3,4} make a 4-clique (every pair co-occurs twice, min_count=2),
plus two orders over {4,5} add a pendant edge.  Expected: 4 triangles,
clique nodes each in 3 with clustering 1.0 except node 4 (degree 4,
clustering 3*2/(4*3)=0.5), pendant node 5 in none (degree 1, pinned
0.0).  Also cross-checks the DuckDB twin on the same tables."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_clique_plus_pendant(ray_session, tmp_path):
    d = str(tmp_path)
    i64 = pa.int64()
    orders, parts = [], []
    for ok in (100, 101):                    # 4-clique, every pair twice
        for p in (1, 2, 3, 4):
            orders.append(ok)
            parts.append(p)
    for ok in (102, 103):                    # pendant edge 4-5 twice
        for p in (4, 5):
            orders.append(ok)
            parts.append(p)
    orders.append(104)                        # singleton basket: no pairs
    parts.append(1)
    pq.write_table(pa.table({"l_orderkey": pa.array(orders, i64),
                             "l_partkey": pa.array(parts, i64)}),
                   os.path.join(d, "lineitem.parquet"))

    res = E.queries()["part_triangles"](d).to_pandas() \
        .sort_values("p_partkey").reset_index(drop=True)
    assert list(res["p_partkey"]) == [1, 2, 3, 4, 5]
    assert list(res["degree"]) == [3, 3, 3, 4, 1]
    assert list(res["n_triangles"]) == [3, 3, 3, 3, 0]
    assert list(res["clustering"]) == [1.0, 1.0, 1.0, 0.5, 0.0]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{d}/lineitem.parquet')")
    orc = con.execute(E.oracle_sql()["part_triangles"]).df() \
        .sort_values("p_partkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_no_edges_empty(ray_session, tmp_path):
    """Every basket is a singleton -> empty graph -> typed empty frame."""
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([7, 8, 9], pa.int64())}),
        os.path.join(d, "lineitem.parquet"))
    ds = E.queries()["part_triangles"](d)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"p_partkey", "degree",
                                      "n_triangles", "clustering"}
