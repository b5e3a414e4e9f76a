"""Discriminating edges for value_psi_by_type: a planted mass shift
yields positive PSI where mass arrived and negative terms where it left;
zero-count buckets survive via Laplace smoothing; a type present in only
one half is omitted — against the DuckDB twin."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_psi_edges(ray_session, tmp_path):
    d = str(tmp_path)
    ts = pa.timestamp("us")
    # first half: type S values 1..10 (edges at 2,4,6,8 cents*100);
    # second half: all mass at 9..10 -> top bucket gains, rest lose.
    # type ONLYFIRST appears only in the first half -> omitted.
    first_ts = ["2024-01-01 00:00"] * 10 + ["2024-01-01 00:01"]
    second_ts = ["2024-01-31 00:00"] * 6
    rows_v = list(range(1, 11)) + [5] + [9, 9, 10, 10, 10, 9]
    types = ["S"] * 10 + ["ONLYFIRST"] + ["S"] * 6
    pq.write_table(pa.table({
        "event_id": pa.array(range(17), pa.int64()),
        "user_id": pa.array([0] * 17, pa.int64()),
        "ts": pa.array(pd.to_datetime(first_ts + second_ts), ts),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([float(v) for v in rows_v], pa.float64()),
        "props": pa.array([None] * 17, pa.string()),
    }), os.path.join(d, "events.parquet"))

    res = E.queries()["value_psi_by_type"](d).to_pandas()
    assert set(res["event_type"]) == {"S"}          # ONLYFIRST omitted
    s = res.sort_values("bucket").reset_index(drop=True)
    assert list(s["bucket"]) == [0, 1, 2, 3, 4]
    # first half: 2 values per quintile; second half: all 6 in bucket 4
    assert list(s["n_first"]) == [2, 2, 2, 2, 2]
    assert list(s["n_second"]) == [0, 0, 0, 0, 6]
    assert (s.loc[:3, "psi_term"] > 0).all()        # mass left -> term > 0
    assert s.loc[4, "psi_term"] > 0                 # mass arrived -> > 0
    # smoothing pins the exact shares
    assert s.loc[0, "share_first"] == round((2 + 1.0) / (10 + 5.0), 6)
    assert s.loc[0, "share_second"] == round((0 + 1.0) / (6 + 5.0), 6)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.execute(E.oracle_sql()["value_psi_by_type"]).df()
    a = res.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    b = want[list(a.columns)].sort_values(["event_type", "bucket"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
