"""Discriminating edges for events_interpolate_grid: exact grid hits,
(type, ts) tie resolution by max event_id, NULL winning values, no
extrapolation outside the observed range, single-event types — against
the DuckDB twin on a hand-built stream."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_interpolate_edges(ray_session, tmp_path):
    d = str(tmp_path)
    ts = pa.timestamp("us")
    # type A: events at Jan-01 00:00 (grid hit, tied ids) and Jan-02
    # 12:00; type B: single event; type C: winning value NULL at a
    # bracketing endpoint
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array(pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 00:00", "2024-01-02 12:00",
             "2024-01-01 03:00",
             "2024-01-01 00:00", "2024-01-01 12:00"]), ts),
        "user_id": pa.array([0] * 6, pa.int64()),
        "event_type": pa.array(["A", "A", "A", "B", "C", "C"],
                               pa.string()),
        "value": pa.array([10.0, 20.0, 80.0, 7.0, None, 4.0],
                          pa.float64()),
        "props": pa.array([None] * 6, pa.string()),
    }), os.path.join(d, "events.parquet"))

    res = E.queries()["events_interpolate_grid"](d).to_pandas()
    a = res[res["event_type"] == "A"].sort_values("grid_ts") \
        .reset_index(drop=True)
    # exact hit at 00:00 takes the MAX event_id's value (20, not 10)
    assert a.loc[0, "interp_value"] == 20.0
    # Jan-01 06:00 = 10/36 of the way from 20 -> 80
    assert a.loc[1, "interp_value"] == round(20.0 + 60.0 * (6.0 / 36.0), 6)
    # Jan-02 18:00 is past the last event -> NULL (no extrapolation)
    after = a[a["grid_ts"] > pd.Timestamp("2024-01-02 12:00")]
    assert after["interp_value"].isna().all()
    b = res[res["event_type"] == "B"]
    # single event off-grid: nothing brackets any grid point
    assert b["interp_value"].isna().all() and len(b) == len(a)
    c = res[res["event_type"] == "C"].sort_values("grid_ts") \
        .reset_index(drop=True)
    # NULL endpoint poisons both the exact hit and the blend
    assert np.isnan(c.loc[0, "interp_value"])
    assert np.isnan(c.loc[1, "interp_value"])   # 06:00 blend with NULL prev

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.execute(E.oracle_sql()["events_interpolate_grid"]).df()
    aa = res.sort_values(["event_type", "grid_ts"]).reset_index(drop=True)
    bb = want[list(aa.columns)].sort_values(["event_type", "grid_ts"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(aa, bb, check_dtype=True)
