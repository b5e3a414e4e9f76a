"""Discriminating edges for the session-12 operator batch, each pinned
against its DuckDB twin on planted inputs the corpus can't exercise:

- seasonal_decompose: edge days get NULL trend; a series shorter than
  one full window decomposes to all-NULL trend/seasonal/residual.
- events_autocorrelation: a linear ramp gives r=1 exactly at both lags;
  a constant series has zero variance -> NULL; a calendar gap breaks
  pair alignment (row-adjacency would wrongly pair across the gap).
- fd_violations: held vs violated dependencies, NULL key rows dropped.
- unicode_script_profile: codepoint (not byte) counting on non-ASCII
  text; an all-empty source reports NULL fractions; NULL text dropped.
"""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _cmp(res: pd.DataFrame, d: str, views: dict, name: str, keys: list):
    con = duckdb.connect()
    for v, path in views.items():
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    want = con.execute(E.oracle_sql()[name]).df()
    a = res.sort_values(keys).reset_index(drop=True)
    b = want[list(a.columns)].sort_values(keys).reset_index(drop=True)
    for col in a.columns:   # unify datetime unit (value-identical)
        if str(a[col].dtype).startswith("datetime64"):
            a[col] = a[col].astype("datetime64[us]")
            b[col] = b[col].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b, check_dtype=True)


def _write_lineitem(d: str, dates, prices):
    pq.write_table(pa.table({
        "l_shipdate": pa.array(pd.to_datetime(list(dates)),
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([float(p) for p in prices],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * len(prices), pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))


def test_seasonal_decompose_edges(ray_session, tmp_path):
    d = str(tmp_path / "long")
    os.makedirs(d)
    # 14 consecutive days starting Monday 2024-01-01; revenue encodes
    # a weekly pattern (100 + 10*weekday dollars) so the detrended
    # weekday means are sharp.
    days = pd.date_range("2024-01-01", periods=14, freq="D")
    _write_lineitem(d, days, [100.0 + 10.0 * (dt.weekday()) for dt in days])

    res = E.queries()["seasonal_decompose"](d).to_pandas()
    assert len(res) == 14
    s = res.sort_values("day").reset_index(drop=True)
    assert list(s["weekday"][:7]) == [0, 1, 2, 3, 4, 5, 6]  # Monday=0
    # rows 0-2 and 11-13 lack a full centered window -> NULL trend
    assert s["trend"][:3].isna().all() and s["trend"][11:].isna().all()
    assert s["trend"][3:11].notna().all()
    # the 8 full rows cover every weekday -> seasonal defined everywhere
    assert s["seasonal"].notna().all()
    assert s["residual"][3:11].notna().all()
    assert s["residual"][:3].isna().all()
    _cmp(res, d, {"lineitem": f"{d}/lineitem.parquet"},
         "seasonal_decompose", ["day"])

    # shorter than one window: decomposition is all-NULL, revenue kept
    d2 = str(tmp_path / "short")
    os.makedirs(d2)
    days2 = pd.date_range("2024-03-01", periods=5, freq="D")
    _write_lineitem(d2, days2, [50.0] * 5)
    res2 = E.queries()["seasonal_decompose"](d2).to_pandas()
    assert len(res2) == 5
    assert res2["trend"].isna().all()
    assert res2["seasonal"].isna().all()
    assert res2["residual"].isna().all()
    assert (res2["revenue"] == 50.0).all()
    _cmp(res2, d2, {"lineitem": f"{d2}/lineitem.parquet"},
         "seasonal_decompose", ["day"])


def test_events_autocorrelation_edges(ray_session, tmp_path):
    d = str(tmp_path)
    rows_ts, rows_type = [], []
    # UP: counts 1..10 over 10 consecutive days -> r = 1.0 at both lags
    for i in range(10):
        for _ in range(i + 1):
            rows_ts.append(f"2024-01-{i + 1:02d} 12:00")
            rows_type.append("UP")
    # CONST: 5 days of count 2 -> zero variance -> NULL (lag-1 n=4)
    for i in range(5):
        for _ in range(2):
            rows_ts.append(f"2024-02-{i + 1:02d} 12:00")
            rows_type.append("CONST")
    # GAP: days 1,2,4 -> lag-1 aligns only (d1,d2); n=1 < 2 -> NULL
    for day, k in ((1, 1), (2, 5), (4, 9)):
        for _ in range(k):
            rows_ts.append(f"2024-03-{day:02d} 12:00")
            rows_type.append("GAP")
    n = len(rows_ts)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([0] * n, pa.int64()),
        "ts": pa.array(pd.to_datetime(rows_ts), pa.timestamp("us")),
        "event_type": pa.array(rows_type, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array([None] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))

    res = E.queries()["events_autocorrelation"](d).to_pandas()
    assert len(res) == 6                      # 3 types x 2 lags
    r = {(t, g): (np_, ac) for t, g, np_, ac in
         res[["event_type", "lag", "n_pairs", "autocorr"]].itertuples(
             index=False)}
    assert r[("UP", 1)] == (9, 1.0)
    assert r[("UP", 7)] == (3, 1.0)
    assert r[("CONST", 1)][0] == 4 and pd.isna(r[("CONST", 1)][1])
    assert r[("CONST", 7)][0] == 0 and pd.isna(r[("CONST", 7)][1])
    assert r[("GAP", 1)][0] == 1 and pd.isna(r[("GAP", 1)][1])
    _cmp(res, d, {"events": f"{d}/events.parquet"},
         "events_autocorrelation", ["event_type", "lag"])


def test_fd_violations_edges(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        # o_orderkey -> o_orderstatus HOLDS (NULL-key row dropped)
        "o_orderkey": pa.array([1, 1, 2, None], pa.int64()),
        "o_orderstatus": pa.array(["O", "O", "F", "X"], pa.string()),
        # o_custkey -> o_orderpriority VIOLATED by custkey 7 (2 values)
        "o_custkey": pa.array([7, 7, 8, 9], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH",
                                     None], pa.string()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_returnflag": pa.array(["A", "R", "N"], pa.string()),
        "l_partkey": pa.array([10, 10, 11], pa.int64()),
        "l_suppkey": pa.array([5, 5, 6], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_brand": pa.array(["B#1", "B#1", "B#2"], pa.string()),
        "p_type": pa.array(["tin", "tin", "brass"], pa.string()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "source": pa.array(["web", "web", "pdf"], pa.string()),
        "lang": pa.array(["en", "zh", "en"], pa.string()),
    }), os.path.join(d, "documents.parquet"))

    res = E.queries()["fd_violations"](d).to_pandas()
    byfd = res.set_index("fd")
    ok = byfd.loc["orders.o_orderkey->o_orderstatus"]
    assert (ok["n_lhs"], ok["n_violating_lhs"], ok["max_rhs_per_lhs"],
            ok["n_distinct_pairs"], ok["holds"]) == (2, 0, 1, 2, True)
    vi = byfd.loc["orders.o_custkey->o_orderpriority"]
    # custkey 9's NULL priority drops -> 2 surviving lhs values
    assert (vi["n_lhs"], vi["n_violating_lhs"], vi["max_rhs_per_lhs"],
            vi["holds"]) == (2, 1, 2, False)
    assert not byfd.loc["lineitem.l_orderkey->l_returnflag"]["holds"]
    assert byfd.loc["lineitem.l_partkey->l_suppkey"]["holds"]
    assert byfd.loc["part.p_brand->p_type"]["holds"]
    assert not byfd.loc["documents.source->lang"]["holds"]
    _cmp(res, d, {v: f"{d}/{v}.parquet"
                  for v in ("orders", "lineitem", "part", "documents")},
         "fd_violations", ["fd"])


def test_unicode_script_profile_edges(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(["a1", "a2", "a3", "b1", "b2"], pa.string()),
        "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "text": pa.array(["héllo wörld 123\t", "", None,
                          "", ""], pa.string()),
    }), os.path.join(d, "documents.parquet"))

    res = E.queries()["unicode_script_profile"](d).to_pandas()
    bysrc = res.set_index("source")
    a = bysrc.loc["a"]
    # NULL text dropped -> 2 docs; "héllo wörld 123\t" = 16 CODEPOINTS
    assert a["n_docs"] == 2 and a["n_chars"] == 16
    assert a["frac_letter"] == round(8 / 16, 6)      # h,llo,w,rld
    assert a["frac_digit"] == round(3 / 16, 6)
    assert a["frac_space"] == round(3 / 16, 6)       # 2 spaces + tab
    assert a["frac_punct"] == 0.0                    # no ASCII leftovers
    assert a["frac_non_ascii"] == round(2 / 16, 6)   # é, ö
    b = bysrc.loc["b"]                               # all-empty source
    assert b["n_docs"] == 2 and b["n_chars"] == 0
    assert b[["frac_letter", "frac_digit", "frac_space", "frac_punct",
              "frac_non_ascii"]].isna().all()
    _cmp(res, d, {"documents": f"{d}/documents.parquet"},
         "unicode_script_profile", ["source"])
