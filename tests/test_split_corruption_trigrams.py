"""Discriminating edges for the session-11 second batch:
leakage_safe_split (planted near-dups land in ONE split via the
component rep's hash; singletons hash their own id),
span_corruption_pairs (island merge, sentinel numbering, terminator,
all-masked / no-masked / token-less docs) and event_trigrams (streams
shorter than 3 emit nothing, user boundaries never pair).  Each
cross-checks the DuckDB twin where one exists."""

import hashlib
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E
from pdf_extract_kit_ray.pipelines.curation import (_CORRUPT_HEX,
                                                    VAL_HEX_THRESHOLD)


def _write_docs(d, rows):
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text": pa.array(cols[1], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s0"] * len(rows), pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in cols[1]],
                            pa.int64()),
    }), os.path.join(d, "documents.parquet"))


def _oracle(d, name):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    if os.path.exists(f"{d}/events.parquet"):
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{d}/events.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def _mask(doc_id, i):
    return (hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:2]
            < _CORRUPT_HEX)


def test_leakage_safe_split_planted_dups(ray_session, tmp_path):
    """Three exact copies land in ONE split keyed by the min doc_id;
    a singleton keeps its own hash."""
    d = str(tmp_path)
    dup = "the exact same duplicated text body here"
    rows = [(10, dup), (20, dup), (30, dup),
            (40, "a unique singleton document body")]
    _write_docs(d, rows)
    res = E.queries()["leakage_safe_split"](d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["doc_id"]) == [10, 20, 30, 40]
    assert list(res["rep_id"]) == [10, 10, 10, 40]
    assert list(res["cluster_size"]) == [3, 3, 3, 1]
    # all three dups share the SAME split, decided by rep 10's hash
    want10 = ("val" if hashlib.md5(b"10").hexdigest()[:2]
              < VAL_HEX_THRESHOLD else "train")
    want40 = ("val" if hashlib.md5(b"40").hexdigest()[:2]
              < VAL_HEX_THRESHOLD else "train")
    assert list(res["split"]) == [want10, want10, want10, want40]
    orc = _oracle(d, "leakage_safe_split") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_span_corruption_shapes(ray_session, tmp_path):
    """Hand-verified reconstruction: islands merge into one sentinel,
    sentinel ids are ordinal, the target ends with the terminator, and
    the no-mask / empty-text docs follow the pinned contract."""
    d = str(tmp_path)
    rows = [(1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, ""),                      # token-less
            (3, None),                    # vanishes
            (4, "   ")]                   # whitespace-only -> token-less
    _write_docs(d, rows)
    res = E.queries()["span_corruption_pairs"](d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["doc_id"]) == [1, 2, 4]

    # rebuild doc 1's expectation from the shared mask rule
    toks = [f"w{i}" for i in range(1, 9)]
    m = [_mask(1, i) for i in range(1, 9)]
    pieces, tgt_parts, sid = [], [], -1
    i = 0
    n_masked = 0
    while i < len(toks):
        if m[i]:
            sid += 1
            span = []
            while i < len(toks) and m[i]:
                span.append(toks[i])
                n_masked += 1
                i += 1
            pieces.append(f"<extra_id_{sid}>")
            tgt_parts.append(f"<extra_id_{sid}> " + " ".join(span))
        else:
            pieces.append(toks[i])
            i += 1
    n_spans = sid + 1
    want_input = " ".join(pieces)
    want_target = (" ".join(tgt_parts) + f" <extra_id_{n_spans}>"
                   if n_spans else "<extra_id_0>")
    r1 = res.iloc[0]
    assert r1["input_text"] == want_input
    assert r1["target_text"] == want_target
    assert r1["n_spans"] == n_spans and r1["n_masked"] == n_masked

    for ridx in (1, 2):                   # docs 2 and 4: token-less
        r = res.iloc[ridx]
        assert r["input_text"] == ""
        assert r["target_text"] == "<extra_id_0>"
        assert r["n_spans"] == 0 and r["n_masked"] == 0

    orc = _oracle(d, "span_corruption_pairs") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_event_trigrams_boundaries(ray_session, tmp_path):
    """User boundaries never pair; 2-event streams emit nothing; NULL
    types are excluded BEFORE adjacency (so a NULL cannot split a
    trigram)."""
    d = str(tmp_path)
    rows = [
        # user 1: a, NULL, b, c  -> trigram (a, b, c) after NULL drop
        (1, 0, 1, "a", 1.0),
        (2, 1, 1, None, 1.0),
        (3, 2, 1, "b", 1.0),
        (4, 3, 1, "c", 1.0),
        # user 2: only two events -> nothing
        (5, 0, 2, "a", 1.0),
        (6, 1, 2, "b", 1.0),
    ]
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("us")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array([None] * len(rows), pa.string()),
    }), os.path.join(d, "events.parquet"))
    _write_docs(d, [(1, "x")])            # unused view dependency
    res = E.queries()["event_trigrams"](d).to_pandas()
    assert len(res) == 1
    assert list(res.iloc[0][["type_1", "type_2", "type_3", "n"]]) \
        == ["a", "b", "c", 1]
    orc = _oracle(d, "event_trigrams")
    pd.testing.assert_frame_equal(res.reset_index(drop=True),
                                  orc.reset_index(drop=True),
                                  check_dtype=False)
