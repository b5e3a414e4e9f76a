"""Unit semantics for the funnel / retention / language-model operators.

The oracle tests (test_queries_oracle) pin these against their SQL twins on
the generated corpora; the micro-tables here pin the DISCRIMINATING edges
the corpus may not exercise: conversion-window exclusion, stage order,
cohort/offset arithmetic, out-of-vocab scoring and the min_count prune.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines import streaming, text

H = 3_600_000_000  # one hour in us


def _write_events(tmpdir, rows):
    """rows: list of (user_id, ts_us, event_type)."""
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, os.path.join(tmpdir, "events.parquet"))


def _write_docs(tmpdir, texts):
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, os.path.join(tmpdir, "documents.parquet"))


def test_event_funnel_window_and_order(ray_session, tmp_path):
    d = str(tmp_path / "funnel")
    t0 = 1_700_000_000_000_000
    _write_events(d, [
        # A: full funnel inside the windows
        (1, t0, "signup"), (1, t0 + 1 * H, "click"), (1, t0 + 2 * H, "purchase"),
        # B: click 25h after signup -> outside the 24h window, depth 1
        (2, t0, "signup"), (2, t0 + 25 * H, "click"),
        # C: click only, never signed up -> depth 0
        (3, t0, "click"),
        # D: purchase 29h after the click -> depth 2
        (4, t0, "signup"), (4, t0 + 1 * H, "click"), (4, t0 + 30 * H, "purchase"),
        # E: purchase BEFORE the click must not count; the later one does
        (5, t0, "signup"), (5, t0 + 1 * H, "purchase"),
        (5, t0 + 2 * H, "click"), (5, t0 + 3 * H, "purchase"),
    ])
    res = streaming.event_funnel(d).to_pydict()
    assert res["stage"] == ["signup", "click", "purchase"]
    assert res["n_users"] == [4, 3, 2]


def test_user_retention_cohorts(ray_session, tmp_path):
    d = str(tmp_path / "ret")
    # 2024-01-01 and 2024-01-08 are Mondays
    jan = {day: int(np.datetime64(f"2024-01-{day:02d}T12:00").astype(
        "datetime64[us]").astype(np.int64)) for day in (2, 4, 9, 10)}
    _write_events(d, [
        (1, jan[2], "view"), (1, jan[4], "view"),   # cohort 1/1, same week
        (1, jan[10], "view"),                       # .. active week offset 1
        (2, jan[9], "view"),                        # cohort 1/8, offset 0
    ])
    rows = sorted((r["cohort_week"].isoformat(), r["week_offset"],
                   r["n_users"])
                  for r in streaming.user_retention(d).take_all())
    assert rows == [("2024-01-01T00:00:00", 0, 1),
                    ("2024-01-01T00:00:00", 1, 1),
                    ("2024-01-08T00:00:00", 0, 1)]


def test_value_zscore_outliers_planted(ray_session, tmp_path):
    d = str(tmp_path / "zs")
    t0 = 1_700_000_000_000_000
    rows = [(1, t0 + i, "spiky") for i in range(50)]
    rows.append((1, t0 + 99, "spiky"))       # the planted outlier
    rows += [(2, t0 + i, "flat") for i in range(50)]
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * 50 + [500.0] + [2.0] * 50, pa.float64()),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    res = {r["event_type"]: r for r in
           streaming.value_zscore_outliers(d).to_pylist()}
    assert res["spiky"]["n_outliers"] == 1 and res["spiky"]["n_events"] == 51
    assert res["flat"]["n_outliers"] == 0 and res["flat"]["n_events"] == 50


def test_unigram_logprob_oov_path(ray_session, tmp_path):
    d = str(tmp_path / "lm")
    _write_docs(d, ["a a a b", "a b"])     # counts: a=4, b=2, total=6
    # vocab_size=1 keeps only 'a'; 'b' scores as count 0.5
    res = {r["doc_id"]: r for r in
           text.unigram_logprob(d, vocab_size=1).take_all()}
    m_a = round(-np.log(4 / 6) * 1e6)
    m_b = round(-np.log(0.5 / 6) * 1e6)
    exp0 = round((3 * m_a + m_b) / (4 * 1e6), 6)
    exp1 = round((m_a + m_b) / (2 * 1e6), 6)
    assert res[0]["n_tokens"] == 4 and abs(res[0]["avg_neg_logprob"] - exp0) < 1e-9
    assert res[1]["n_tokens"] == 2 and abs(res[1]["avg_neg_logprob"] - exp1) < 1e-9


def test_bigram_pmi_min_count_prune(ray_session, tmp_path):
    d = str(tmp_path / "pmi")
    # "x y" appears 3 times (>= min_count), "y z" once (pruned)
    _write_docs(d, ["x y", "x y", "x y z"])
    rows = text.bigram_pmi(d, k=10, min_count=3).take_all()
    assert [(r["w1"], r["w2"], r["n_pairs"]) for r in rows] == [("x", "y", 3)]
    # pmi = ln((3/4) / ((3/7)*(3/7))) with total pairs 4, x=3, y=3 of 7 tokens
    exp = round(np.log((3 / 4) / ((3 / 7) * (3 / 7))), 6)
    assert abs(rows[0]["pmi"] - exp) < 1e-9
