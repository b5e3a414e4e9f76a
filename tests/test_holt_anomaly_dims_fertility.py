"""Discriminating edges for the Holt forecast, seasonal anomaly flags,
embedding dimension profile and tokenizer fertility — each pinned
against its DuckDB twin on planted inputs:

- holt_linear_forecast: 1-point series (zero trend, flat forecast);
  2-point series (fitted at t2 equals the actual — Holt with b1=y2-y1
  nails a linear start).
- seasonal_anomalies: a constant series has all-zero residuals and NO
  flags (strict >); a planted spike IS flagged.
- embedding_dim_stats: ragged vectors (dim coverage differs), negative
  components, single-vector dims (variance 0).
- tokenizer_fertility: empty/punctuation-only text, an all-empty source
  (NULL ratios), multi-byte chars making bytes > chars.
"""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _cmp(res: pd.DataFrame, views: dict, name: str, keys: list):
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


def test_holt_single_and_linear(ray_session, tmp_path):
    d1 = str(tmp_path / "one")
    os.makedirs(d1)
    _write_lineitem(d1, ["2024-01-15"], [200.0])
    res = E.queries()["holt_linear_forecast"](d1).to_pandas()
    assert len(res) == 4                        # 1 observed + 3 forecast
    s = res.sort_values("month").reset_index(drop=True)
    assert not s.loc[0, "is_forecast"] and s.loc[1:, "is_forecast"].all()
    assert s.loc[0, "trend"] == 0.0             # b1 = 0 for 1-point
    assert pd.isna(s.loc[0, "fitted"])
    assert (s.loc[1:, "fitted"] == 200.0).all()  # flat forecast
    assert str(s.loc[3, "month"])[:7] == "2024-04"
    _cmp(res, {"lineitem": f"{d1}/lineitem.parquet"},
         "holt_linear_forecast", ["month"])

    d2 = str(tmp_path / "two")
    os.makedirs(d2)
    _write_lineitem(d2, ["2024-01-15", "2024-02-15"], [100.0, 150.0])
    res2 = E.queries()["holt_linear_forecast"](d2).to_pandas()
    s2 = res2.sort_values("month").reset_index(drop=True)
    # b1 = y2 - y1 = 50: the t=2 one-step forecast is exact
    assert s2.loc[1, "fitted"] == 150.0
    assert s2.loc[1, "level"] == 150.0
    # linear series continues linearly: forecasts 200, 250, 300
    assert list(s2.loc[2:, "fitted"]) == [200.0, 250.0, 300.0]
    _cmp(res2, {"lineitem": f"{d2}/lineitem.parquet"},
         "holt_linear_forecast", ["month"])


def test_seasonal_anomalies_edges(ray_session, tmp_path):
    d1 = str(tmp_path / "flat")
    os.makedirs(d1)
    days = pd.date_range("2024-01-01", periods=21, freq="D")
    _write_lineitem(d1, days, [100.0] * 21)     # constant -> no flags
    res = E.queries()["seasonal_anomalies"](d1).to_pandas()
    assert len(res) == 15                       # 21 - 6 edge days
    assert not res["is_anomaly"].any()
    _cmp(res, {"lineitem": f"{d1}/lineitem.parquet"},
         "seasonal_anomalies", ["day"])

    d2 = str(tmp_path / "spike")
    os.makedirs(d2)
    prices = [100.0] * 21
    prices[10] = 5000.0                         # planted mid-series spike
    _write_lineitem(d2, days, prices)
    res2 = E.queries()["seasonal_anomalies"](d2).to_pandas()
    s2 = res2.sort_values("day").reset_index(drop=True)
    spike = s2[s2["day"] == pd.Timestamp("2024-01-11")]
    assert len(spike) == 1 and bool(spike["is_anomaly"].iloc[0])
    _cmp(res2, {"lineitem": f"{d2}/lineitem.parquet"},
         "seasonal_anomalies", ["day"])


def test_embedding_dim_stats_edges(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, -2.0, 0.5], [3.0, 2.0, 0.5], [0.25], None],
            pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))

    res = E.queries()["embedding_dim_stats"](d).to_pandas()
    bydim = res.set_index("dim")
    assert list(res["dim"].sort_values()) == [0, 1, 2]
    assert bydim.loc[0, "n"] == 3               # ragged: dim 0 has 3
    assert bydim.loc[1, "n"] == 2 and bydim.loc[2, "n"] == 2
    assert bydim.loc[0, "min_v"] == 0.25 and bydim.loc[0, "max_v"] == 3.0
    assert bydim.loc[1, "min_v"] == -2.0        # negatives survive
    assert bydim.loc[2, "var_v"] == 0.0         # identical components
    assert bydim.loc[1, "mean_v"] == 0.0
    assert bydim.loc[1, "var_v"] == 4.0         # ((-2)^2 + 2^2)/2
    _cmp(res, {"embeddings": f"{d}/embeddings.parquet"},
         "embedding_dim_stats", ["dim"])


def test_tokenizer_fertility_edges(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "text": pa.array(["héllo, wörld-1!", "", None,
                          "", "  "], pa.string()),
    }), os.path.join(d, "documents.parquet"))

    res = E.queries()["tokenizer_fertility"](d).to_pandas()
    bysrc = res.set_index("source")
    a = bysrc.loc["a"]
    # "héllo, wörld-1!": 2 ws words; the ASCII-class pre-tokenizer cuts
    # at each non-ASCII letter: h|é|llo|,|w|ö|rld|-|1|! = 10 subwords;
    # 15 codepoints, 17 bytes (two 2-byte chars)
    assert (a["n_docs"], a["n_words"], a["n_subwords"]) == (2, 2, 10)
    assert (a["n_chars"], a["n_bytes"]) == (15, 17)
    assert a["subwords_per_word"] == 5.0
    assert a["bytes_per_subword"] == round(17 / 10, 6)
    b = bysrc.loc["b"]                           # empty-only source
    assert (b["n_docs"], b["n_words"]) == (2, 0)
    assert pd.isna(b["subwords_per_word"])
    assert pd.isna(b["bytes_per_subword"])
    _cmp(res, {"documents": f"{d}/documents.parquet"},
         "tokenizer_fertility", ["source"])
