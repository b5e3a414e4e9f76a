"""Planted-structure edge tests for the session's new operators:
SCD2 interval compaction, time-weighted average, readability /
mojibake text QA, the expectation suite, and the blocked fuzzy
name join.  The synthetic corpora exercise the happy path via the
oracle sweep; these pin the discriminating edges (ties, NULLs,
planted violations, open runs)."""

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_kit_ray.pipelines import relational, streaming, text


def _ts(s: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _write_events(tmp_path, rows):
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64())]))
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_scd2_runs_open_interval_and_ties(ray_session, tmp_path):
    """Runs split on type change; same-ts ties order by event_id (the
    A@t0/B@t0 pair is two runs in event_id order); the last run per user
    is open (NULL valid_to); NULL ts drops; NULL type is a run value."""
    rows = [
        # user 1: A A B A -> 3 intervals (A:2, B:1, A:1 open)
        {"event_id": 1, "ts": _ts(0), "user_id": 1, "event_type": "A",
         "value": 1.0},
        {"event_id": 2, "ts": _ts(10), "user_id": 1, "event_type": "A",
         "value": 1.0},
        {"event_id": 3, "ts": _ts(20), "user_id": 1, "event_type": "B",
         "value": 1.0},
        {"event_id": 4, "ts": _ts(30), "user_id": 1, "event_type": "A",
         "value": 1.0},
        # user 2: tie on ts -> event_id order decides the runs
        {"event_id": 6, "ts": _ts(0), "user_id": 2, "event_type": "Y",
         "value": 1.0},
        {"event_id": 5, "ts": _ts(0), "user_id": 2, "event_type": "X",
         "value": 1.0},
        # user 3: NULL type run + NULL ts row (dropped)
        {"event_id": 7, "ts": _ts(0), "user_id": 3, "event_type": None,
         "value": 1.0},
        {"event_id": 8, "ts": None, "user_id": 3, "event_type": "Z",
         "value": 1.0},
    ]
    sf = _write_events(tmp_path, rows)
    df = streaming.events_scd2_intervals(sf).to_pandas().sort_values(
        ["user_id", "valid_from"]).reset_index(drop=True)
    u1 = df[df.user_id == 1]
    assert list(u1.event_type) == ["A", "B", "A"]
    assert list(u1.n_events) == [2, 1, 1]
    assert u1.iloc[0].valid_to == _ts(20)
    assert u1.iloc[1].valid_to == _ts(30)
    assert u1.iloc[2].valid_to is None or str(u1.iloc[2].valid_to) == "NaT"
    u2 = df[df.user_id == 2]
    assert list(u2.event_type) == ["X", "Y"]      # event_id tiebreak
    u3 = df[df.user_id == 3]
    assert len(u3) == 1 and u3.iloc[0].event_type is None
    assert u3.iloc[0].n_events == 1


def test_twap_holding_weights_and_exclusions(ray_session, tmp_path):
    """value 100 held 10 s then 200 held 30 s -> twap 125/175 checkpoints;
    single-event and zero-duration users emit nothing; NULL value rows
    drop before the gap scan."""
    rows = [
        {"event_id": 1, "ts": _ts(0), "user_id": 1, "event_type": "A",
         "value": 100.0},
        {"event_id": 2, "ts": _ts(10), "user_id": 1, "event_type": "A",
         "value": 200.0},
        {"event_id": 3, "ts": _ts(40), "user_id": 1, "event_type": "A",
         "value": 0.0},
        # user 2: single event -> no output
        {"event_id": 4, "ts": _ts(0), "user_id": 2, "event_type": "A",
         "value": 5.0},
        # user 3: two events, same timestamp -> zero duration -> no output
        {"event_id": 5, "ts": _ts(0), "user_id": 3, "event_type": "A",
         "value": 5.0},
        {"event_id": 6, "ts": _ts(0), "user_id": 3, "event_type": "A",
         "value": 9.0},
        # user 4: NULL value row splits the stream -> gap 0..20 uses v=7
        {"event_id": 7, "ts": _ts(0), "user_id": 4, "event_type": "A",
         "value": 7.0},
        {"event_id": 8, "ts": _ts(10), "user_id": 4, "event_type": "A",
         "value": None},
        {"event_id": 9, "ts": _ts(20), "user_id": 4, "event_type": "A",
         "value": 7.0},
    ]
    sf = _write_events(tmp_path, rows)
    df = streaming.user_value_twap(sf).to_pandas().set_index("user_id")
    assert set(df.index) == {1, 4}
    # (100*10 + 200*30) / 40 = 175
    assert df.loc[1].twap == pytest.approx(175.0)
    assert df.loc[1].n_gaps == 2
    assert df.loc[1].total_dur_s == pytest.approx(40.0)
    assert df.loc[4].twap == pytest.approx(7.0)
    assert df.loc[4].n_gaps == 1


def test_readability_known_text(ray_session, tmp_path):
    rows = [
        {"doc_id": 1, "text": "The cat sat.", "source": "s"},
        {"doc_id": 2, "text": "no terminator here", "source": "s"},
        {"doc_id": 3, "text": "", "source": "s"},
        {"doc_id": 4, "text": None, "source": "s"},
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    df = text.readability_scores(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    assert df.loc[1].n_words == 3 and df.loc[1].n_sentences == 1
    assert df.loc[1].n_syllables == 3
    assert df.loc[1].flesch == pytest.approx(
        206.835 - 1.015 * 3 - 84.6 * 1.0)
    # no [.!?] but has words -> sentence clamp to 1
    assert df.loc[2].n_sentences == 1
    # empty text: 0 words -> NULL flesch, 0 sentences
    assert df.loc[3].n_words == 0 and df.loc[3].n_sentences == 0
    assert np.isnan(df.loc[3].flesch)
    # NULL text propagates NULL everywhere
    assert np.isnan(df.loc[4].flesch)


def test_mojibake_planted(ray_session, tmp_path):
    rows = [
        {"doc_id": 1, "text": "cafÃ© and more cafÃ©",
         "source": "bad"},                      # 2 artifacts ('Ã.')
        {"doc_id": 2, "text": "clean text", "source": "bad"},
        {"doc_id": 3, "text": "lost � byte", "source": "worse"},
        {"doc_id": 4, "text": None, "source": "worse"},
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    df = text.mojibake_report(str(tmp_path)).to_pandas() \
        .set_index("source")
    assert df.loc["bad"].n_docs == 2
    assert df.loc["bad"].n_flagged == 1
    assert df.loc["bad"].n_artifacts == 2
    assert df.loc["worse"].n_docs == 2          # NULL text is a clean doc
    assert df.loc["worse"].n_flagged == 1
    assert df.loc["worse"].n_artifacts == 1


def test_expectation_report_planted_violations(ray_session, tmp_path):
    base = str(tmp_path)
    os.makedirs(base, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([
        {"c_custkey": 1}, {"c_custkey": 2}, {"c_custkey": 2},  # dup PK
    ], schema=pa.schema([("c_custkey", pa.int64())])),
        os.path.join(base, "customer.parquet"))
    pq.write_table(pa.Table.from_pylist([
        # orphan custkey 9; NULL custkey passes FK; price<=0 violation
        {"o_orderkey": 10, "o_custkey": 1, "o_totalprice": 5.0,
         "o_orderdate": datetime.date(2024, 1, 1)},
        {"o_orderkey": 11, "o_custkey": 9, "o_totalprice": -1.0,
         "o_orderdate": datetime.date(2024, 1, 2)},
        {"o_orderkey": 12, "o_custkey": None, "o_totalprice": 1.0,
         "o_orderdate": None},
    ]), os.path.join(base, "orders.parquet"))
    pq.write_table(pa.Table.from_pylist([
        {"l_orderkey": 10, "l_quantity": 5.0, "l_discount": 0.05},
        {"l_orderkey": 99, "l_quantity": 99.0, "l_discount": 2.0},  # all bad
    ]), os.path.join(base, "lineitem.parquet"))
    pq.write_table(pa.Table.from_pylist([
        {"event_id": 1, "ts": _ts(0), "user_id": 1, "event_type": "A",
         "value": 1.0},
        {"event_id": 2, "ts": None, "user_id": None, "event_type": "A",
         "value": 1.0},
    ], schema=pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64())])),
        os.path.join(base, "events.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": 1, "text": None, "source": "s"}]),
        os.path.join(base, "documents.parquet"))

    df = relational.expectation_report(base).to_pandas() \
        .set_index("expectation")
    assert df.loc["o_custkey_fk_customer"].n_violations == 1   # key 9 only
    assert df.loc["l_orderkey_fk_orders"].n_violations == 1
    assert df.loc["c_custkey_unique"].n_violations == 1
    assert df.loc["o_orderkey_unique"].n_violations == 0
    assert bool(df.loc["o_orderkey_unique"].passed)
    assert df.loc["o_totalprice_positive"].n_violations == 1
    assert df.loc["o_orderdate_not_null"].n_violations == 1
    assert df.loc["l_quantity_range_1_50"].n_violations == 1
    assert df.loc["l_discount_range_0_1"].n_violations == 1
    assert df.loc["user_id_not_null"].n_violations == 1
    assert df.loc["ts_not_null"].n_violations == 1
    assert df.loc["text_not_null"].n_violations == 1
    assert not bool(df.loc["text_not_null"].passed)


def test_levenshtein_matches_duckdb_on_random_strings():
    import random

    import duckdb

    rng = random.Random(7)
    alpha = "abcde"
    pairs = [("".join(rng.choices(alpha, k=rng.randint(0, 8))),
              "".join(rng.choices(alpha, k=rng.randint(0, 8))))
             for _ in range(200)]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = relational._levenshtein(a, b, cap=16)
        assert got == want, (a, b, got, want)
    # early-abandon contract: beyond the cap it reports cap + 1
    assert relational._levenshtein("aaaaaaaa", "bbbbbbbb", cap=3) == 4


def test_part_name_typo_pairs_blocking(ray_session, tmp_path):
    """Pairs never cross the last-token block even when the edit distance
    is tiny; within a block distances respect max_dist; counts attach."""
    rows = ([{"p_partkey": i, "p_name": "red gear"} for i in range(3)]
            + [{"p_partkey": 10, "p_name": "ted gear"},
               {"p_partkey": 11, "p_name": "red bear"},   # other block
               {"p_partkey": 12, "p_name": "wildly different gear"}])
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "part.parquet"))
    df = relational.part_name_typo_pairs(str(tmp_path)).to_pandas()
    got = set(map(tuple, df[["name_a", "name_b"]].values.tolist()))
    assert got == {("red gear", "ted gear")}
    row = df.iloc[0]
    assert row.dist == 1 and row.n_uses_a == 3 and row.n_uses_b == 1


def test_mahalanobis_planted_outlier_and_degenerate(ray_session, tmp_path):
    """A tight (value, hour) cloud with one far point -> exactly that
    point flags; a type with zero covariance (all identical) has det = 0
    -> 0 outliers by contract."""
    rows = []
    rng = np.random.default_rng(11)
    for i in range(200):
        rows.append({"event_id": i, "ts": _ts(3600 * 10 + i % 60),
                     "user_id": 1, "event_type": "A",
                     "value": float(np.round(10 + rng.normal(0, 0.5), 2))})
    rows.append({"event_id": 999, "ts": _ts(3600 * 23),  # hour 23, far value
                 "user_id": 1, "event_type": "A", "value": 500.0})
    for i in range(20):                       # degenerate: all identical
        rows.append({"event_id": 2000 + i, "ts": _ts(3600 * 5),
                     "user_id": 2, "event_type": "B", "value": 7.0})
    sf = _write_events(tmp_path, rows)
    df = relational.value_hour_mahalanobis(sf).to_pandas() \
        .set_index("event_type")
    assert df.loc["A"].n == 201 and df.loc["A"].n_outliers >= 1
    assert df.loc["A"].n_outliers <= 5        # the bulk stays inside
    assert df.loc["B"].n == 20 and df.loc["B"].n_outliers == 0


def test_markov_stationary_two_state_chain(ray_session, tmp_path):
    """Hand-computed 2-state chain: P(A->B)=1, P(B->A)=1/2, P(B->B)=1/2
    -> stationary pi = (1/3, 2/3).  Also pins the row-sum invariant."""
    rows = []
    # one user emitting A B B A B B ... gives exactly those transition
    # frequencies: A->B n, B->B n, B->A n (cycle A B B)
    seq = ["A", "B", "B"] * 40
    for i, t in enumerate(seq):
        rows.append({"event_id": i, "ts": _ts(i), "user_id": 1,
                     "event_type": t, "value": 1.0})
    sf = _write_events(tmp_path, rows)
    df = streaming.event_markov_stationary(sf).to_pandas() \
        .set_index("event_type")
    assert df.stationary_prob.sum() == pytest.approx(1.0, abs=1e-5)
    # finite stream: 40 A->B, 40 B->B, 39 B->A (the final B has no
    # successor), so P(B->A) = 39/79 and pi = (39/118, 79/118)
    assert df.loc["A"].stationary_prob == pytest.approx(39 / 118, abs=1e-5)
    assert df.loc["B"].stationary_prob == pytest.approx(79 / 118, abs=1e-5)


def test_woe_planted_odds(ray_session, tmp_path):
    """Category H: 3 returned of 4; category L: 0 returned of 4 (one with
    no line items at all -> counts as not-returned).  WOE signs must
    separate, and the 0.5 smoothing keeps the zero-bad category finite."""
    base = str(tmp_path)
    os.makedirs(base, exist_ok=True)
    orders = [{"o_orderkey": i, "o_orderpriority": "H" if i < 4 else "L",
               "o_totalprice": 1.0,
               "o_orderdate": datetime.date(2024, 1, 1)}
              for i in range(8)]
    pq.write_table(pa.Table.from_pylist(orders),
                   os.path.join(base, "orders.parquet"))
    lines = []
    for i in range(3):                       # H orders 0-2 returned
        lines.append({"l_orderkey": i, "l_returnflag": "R",
                      "l_quantity": 1.0, "l_discount": 0.0})
    lines.append({"l_orderkey": 3, "l_returnflag": "N",
                  "l_quantity": 1.0, "l_discount": 0.0})
    for i in range(4, 7):                    # L orders 4-6 not returned
        lines.append({"l_orderkey": i, "l_returnflag": "N",
                      "l_quantity": 1.0, "l_discount": 0.0})
    # order 7 (L) has NO line items -> label 0 by contract
    pq.write_table(pa.Table.from_pylist(lines),
                   os.path.join(base, "lineitem.parquet"))
    df = relational.woe_priority_returns(base).to_pandas() \
        .set_index("o_orderpriority")
    assert df.loc["H"].n_orders == 4 and df.loc["H"].n_returned == 3
    assert df.loc["L"].n_orders == 4 and df.loc["L"].n_returned == 0
    assert df.loc["H"].woe < 0 < df.loc["L"].woe
    assert np.isfinite(df.loc["L"].woe)
    # closed form: good=(1,4), bad=(3,0), G=5, B=3, K=2
    exp_h = np.log(((1 + 0.5) / (5 + 1.0)) / ((3 + 0.5) / (3 + 1.0)))
    assert df.loc["H"].woe == pytest.approx(exp_h, abs=1e-6)


def test_burstiness_poisson_vs_bursty(ray_session, tmp_path):
    """A uniform 1-per-hour type has Fano 0 (deterministic counts); a
    type concentrating 100 events in one hour out of ten observed
    buckets has Fano >> 1."""
    rows = []
    for h in range(50):                       # exactly 1 event per hour
        rows.append({"event_id": h, "ts": _ts(3600 * h), "user_id": 1,
                     "event_type": "steady", "value": 1.0})
    eid = 1000
    for h in range(10):                       # 10 observed buckets
        burst = 100 if h == 0 else 1
        for j in range(burst):
            rows.append({"event_id": eid, "ts": _ts(3600 * h + j),
                         "user_id": 2, "event_type": "bursty",
                         "value": 1.0})
            eid += 1
    sf = _write_events(tmp_path, rows)
    df = streaming.events_burstiness(sf).to_pandas().set_index("event_type")
    assert df.loc["steady"].fano == 0.0
    assert df.loc["steady"].n_buckets == 50
    assert df.loc["bursty"].fano > 10
    assert df.loc["bursty"].n_events == 109
