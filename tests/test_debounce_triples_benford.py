"""Discriminating edges for the session-11 batch: events_debounce_report
(strict-< window, event_id tie-break, per-(user,type) stream reset),
part_frequent_triples (distinct-basket semantics, <3-part baskets,
support cut) and value_benford_deviation (cents-string digit, sub-cent
drop, missing-digit L1 contribution).  Each cross-checks the DuckDB twin
on the same synthetic tables."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _write_events(d, rows):
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("us")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array([None] * len(rows), pa.string()),
    }), os.path.join(d, "events.parquet"))


def _oracle(d, name):
    con = duckdb.connect()
    for tab in ("events", "lineitem"):
        if os.path.exists(f"{d}/{tab}.parquet"):
            con.execute(f"CREATE VIEW {tab} AS SELECT * FROM "
                        f"read_parquet('{d}/{tab}.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def test_debounce_window_edges(ray_session, tmp_path):
    """Gap == window is NOT suppressed (strict <); ties on ts order by
    event_id so the later id is suppressed at gap 0; a different type
    within the same user starts its own stream; NULL type/ts dropped."""
    d = str(tmp_path)
    H = 3_600_000_000  # 1h in us
    rows = [
        # user 1, type a: 0, +30min (suppressed), +30min+1h (gap exactly
        # 1h from prev -> NOT suppressed)
        (1, 0, 1, "a", 1.0),
        (2, H // 2, 1, "a", 1.0),
        (3, H // 2 + H, 1, "a", 1.0),
        # tie on ts for user 1 type b: id 5 follows id 4 at gap 0
        (4, 0, 1, "b", 1.0),
        (5, 0, 1, "b", 1.0),
        # user 2 type a: same ts values as user 1 -> independent stream
        (6, 0, 2, "a", 1.0),
        # dropped rows
        (7, None, 1, "a", 1.0),
        (8, 0, 1, None, 1.0),
    ]
    _write_events(d, rows)
    res = E.queries()["events_debounce_report"](d).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert list(res["event_type"]) == ["a", "b"]
    assert list(res["n_events"]) == [4, 2]
    assert list(res["n_suppressed"]) == [1, 1]
    assert list(res["suppressed_frac"]) == [0.25, 0.5]
    orc = _oracle(d, "events_debounce_report") \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_frequent_triples_support_and_distinct(ray_session, tmp_path):
    """Order A={1,2,3,4} (its 4 triples once each), order B={1,2,3}
    with part 2 listed TWICE (distinct -> counted once): only (1,2,3)
    reaches support 2.  A 2-part basket contributes nothing."""
    d = str(tmp_path)
    orders = [10, 10, 10, 10, 11, 11, 11, 11, 12, 12]
    parts = [1, 2, 3, 4, 1, 2, 2, 3, 8, 9]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orders, pa.int64()),
        "l_partkey": pa.array(parts, pa.int64())}),
        os.path.join(d, "lineitem.parquet"))
    res = E.queries()["part_frequent_triples"](d).to_pandas()
    assert len(res) == 1
    assert list(res.iloc[0][["part_a", "part_b", "part_c",
                             "n_orders"]]) == [1, 2, 3, 2]
    orc = _oracle(d, "part_frequent_triples")
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), orc.reset_index(drop=True),
        check_dtype=False)


def test_frequent_triples_empty(ray_session, tmp_path):
    """All baskets below width 3 -> typed empty output."""
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([5, 6, 7], pa.int64())}),
        os.path.join(d, "lineitem.parquet"))
    ds = E.queries()["part_frequent_triples"](d)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"part_a", "part_b", "part_c",
                                      "n_orders"}


def test_benford_digit_and_drop_edges(ray_session, tmp_path):
    """Digit comes from exact cents (0.995 -> 99 cents -> digit 9;
    95.0 -> 9500 -> 9); sub-cent (0.005), zero, negative and NULL
    values are dropped; an all-digit-9 type pays the full missing-mass
    L1 computed with the same micro-int formula."""
    d = str(tmp_path)
    rows = [
        (1, 0, 1, "x", 0.995),   # 99 cents -> digit 9
        (2, 0, 1, "x", 95.0),    # 9500 -> digit 9
        (3, 0, 1, "x", 0.005),   # 0 cents -> dropped
        (4, 0, 1, "x", -5.0),    # non-positive -> dropped
        (5, 0, 1, "x", None),    # NULL -> dropped
        (6, 0, 1, None, 1.0),    # NULL type -> dropped
    ]
    _write_events(d, rows)
    res = E.queries()["value_benford_deviation"](d).to_pandas()
    assert len(res) == 1
    assert res.iloc[0]["event_type"] == "x"
    assert res.iloc[0]["n_values"] == 2
    p = np.floor(np.log10(1.0 + 1.0 / np.arange(1, 10)) * 1e6
                 + 0.5).astype(np.int64)
    share = np.zeros(9, np.int64)
    share[8] = 2 * 1_000_000 // 2
    want = round(int(np.abs(share - p).sum()) / 1e6, 6)
    assert math.isclose(res.iloc[0]["benford_l1"], want, abs_tol=1e-9)
    orc = _oracle(d, "value_benford_deviation")
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), orc.reset_index(drop=True),
        check_dtype=False)


def test_rolling_median_window_edges(ray_session, tmp_path):
    """Window is the 7 calendar days ENDING at each observed day: day 6
    still sees day 0, day 7 does not; even counts pick the LOWER middle
    (percentile_disc); NULL value rows drop."""
    d = str(tmp_path)
    DAY = 86_400_000_000
    rows = [
        (1, 0 * DAY, 1, "a", 10.0),
        (2, 0 * DAY, 1, "a", 20.0),     # day 0: {10, 20} -> med 10
        (3, 6 * DAY, 1, "a", 30.0),     # day 6: {10,20,30} -> 20
        (4, 7 * DAY, 1, "a", 40.0),     # day 7: {30,40} (day 0 aged out) -> 30
        (5, 7 * DAY, 1, "a", None),     # dropped
    ]
    _write_events(d, rows)
    res = E.queries()["rolling_median_value"](d).to_pandas() \
        .sort_values("day_no").reset_index(drop=True)
    assert list(res["day_no"]) == [0, 6, 7]
    assert list(res["median_7d"]) == [10.0, 20.0, 30.0]
    orc = _oracle(d, "rolling_median_value") \
        .sort_values("day_no").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)
