"""Discriminating edges for event_cooccurrence_pairs: exact-window
boundary is INCLUSIVE, equal timestamps never pair, users never cross,
same-type pairs count — against hand counts and the DuckDB twin."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_cooccurrence_edges(ray_session, tmp_path):
    d = str(tmp_path)
    ts = pa.timestamp("us")
    pq.write_table(pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array(pd.to_datetime([
            "2024-01-01 00:00:00",      # u1 click
            "2024-01-01 00:30:00",      # u1 buy: exactly 30m -> pairs
            "2024-01-01 00:30:00",      # u1 click: equal ts to buy -> no pair
            "2024-01-01 01:00:01",      # u1 buy: 30m01s after #2 -> out
            "2024-01-01 00:10:00",      # u2 click
            "2024-01-01 00:20:00",      # u2 click (same-type pair)
            "2024-01-01 00:05:00",      # u3 buy (user isolation)
            None,                       # null ts drops
        ]), ts),
        "event_type": pa.array(["click", "buy", "click", "buy",
                                "click", "click", "buy", "click"],
                               pa.string()),
        "value": pa.array([0.0] * 8, pa.float64()),
        "props": pa.array([None] * 8, pa.string()),
    }), os.path.join(d, "events.parquet"))

    res = E.queries()["event_cooccurrence_pairs"](d).to_pandas()
    got = {(r.type_earlier, r.type_later): r.n_pairs
           for r in res.itertuples()}
    # u1: click@00:00 -> buy@30:00 (inclusive) and click@30:00 (<=30m);
    #     buy@30:00 / click@30:00 share a timestamp -> no pair either way;
    #     click@30:00 -> buy@1:00:01 is 30m01s -> out; buy@30:00 -> same.
    # u2: click -> click (10m apart).
    # u3: single valid event.
    assert got == {("click", "buy"): 1, ("click", "click"): 2}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.execute(E.oracle_sql()["event_cooccurrence_pairs"]).df()
    a = res.sort_values(["type_earlier", "type_later"]) \
        .reset_index(drop=True)
    b = want[list(a.columns)].sort_values(["type_earlier", "type_later"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
