"""Discriminating edges for fim_pairs (md5 cut-point reconstruction,
token-less frame, null-text vanish), user_value_median (percentile_disc
lower-middle on even counts, null handling) and
quality_quantile_normalize (single-doc source pins 0.0, ties share the
min rank), each against the DuckDB twin."""

import hashlib
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


def _write_docs(d, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] if len(r) > 2 else "s0" for r in rows],
                           pa.string()),
        "n_chars": pa.array([0] * len(rows), pa.int64())}),
        os.path.join(d, "documents.parquet"))


def _cut(doc_id, salt, mod):
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) % mod


def test_fim_reconstruction(ray_session, tmp_path):
    d = str(tmp_path)
    _write_docs(d, [(1, "a b c d e f g h"), (2, ""), (3, None)])
    res = E.queries()["fim_pairs"](d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["doc_id"]) == [1, 2]         # null text vanished
    toks = "a b c d e f g h".split()
    n = len(toks)
    i = _cut(1, "a", n + 1)
    j = i + _cut(1, "b", n - i + 1)
    want = " ".join(["<fim_prefix>"] + toks[:i] + ["<fim_suffix>"]
                    + toks[j:] + ["<fim_middle>"] + toks[i:j])
    r1 = res.iloc[0]
    assert r1["fim_text"] == want
    assert (r1["n_prefix"], r1["n_middle"], r1["n_suffix"]) \
        == (i, j - i, n - j)
    r2 = res.iloc[1]                             # token-less frame
    assert r2["fim_text"] == "<fim_prefix> <fim_suffix> <fim_middle>"
    assert (r2["n_prefix"], r2["n_middle"], r2["n_suffix"]) == (0, 0, 0)
    orc = _oracle(d, "fim_pairs", ["documents"]) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_user_value_median_even_and_nulls(ray_session, tmp_path):
    """Even count -> the LOWER middle element (percentile_disc, no
    interpolation); NULL values drop; an all-null user vanishes."""
    d = str(tmp_path)
    rows = [(1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0), (4, 1, 40.0),
            (5, 2, 7.0), (6, 2, None), (7, 3, None)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["t"] * len(rows), pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array([None] * len(rows), pa.string())}),
        os.path.join(d, "events.parquet"))
    res = E.queries()["user_value_median"](d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(res["user_id"]) == [1, 2]        # user 3 vanished
    assert list(res["n_values"]) == [4, 1]
    assert list(res["median_value"]) == [20.0, 7.0]   # lower middle
    orc = _oracle(d, "user_value_median", ["events"]) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_quantile_normalize_ties_and_singleton(ray_session, tmp_path):
    """Three identical scores share the same min-rank percent (one doc
    below them -> 1/3 each, NOT distinct row-number ranks); the
    lowest-quality doc gets 0.0; a single-doc source pins 0.0."""
    d = str(tmp_path)
    same = "aaaa"                       # identical quality (alpha 1.0)
    rows = [(1, same, "big"), (2, same, "big"), (3, same, "big"),
            (4, "aaaa aaaa. aaaa!", "big"),     # punct -> lower alpha
            (5, "anything", "solo")]
    _write_docs(d, rows)
    res = E.queries()["quality_quantile_normalize"](d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert res.iloc[3]["quality"] < res.iloc[0]["quality"]
    assert list(res["pct_rank"])[:3] == [0.333333] * 3   # shared min rank
    assert res.iloc[3]["pct_rank"] == 0.0
    assert res.iloc[4]["pct_rank"] == 0.0        # singleton source
    orc = _oracle(d, "quality_quantile_normalize", ["documents"]) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)
