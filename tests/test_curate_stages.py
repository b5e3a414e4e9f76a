"""Edges for the curation registry stages: null text flows through the
whole chain without crashing (and is gated out by any positive quality
threshold), filters work standalone (computing signals on the fly), and
doc_signals is idempotent under re-application."""

import pyarrow as pa

from pdf_extract_kit_ray.stages.curate import (doc_fingerprint,
                                               doc_signals, lang_filter,
                                               pii_scrub, quality_filter,
                                               token_filter)


def _batch(rows):
    """rows: (doc_id, text, lang)"""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })


def test_null_text_through_full_chain():
    b = _batch([(1, "a good document with several tokens here", "en"),
                (2, None, "en")])
    b = pii_scrub(b)
    b = doc_signals(b)
    assert b.column("quality").to_pylist()[1] == 0.0   # NULL scores 0
    b = quality_filter(b, min_quality=0.01)
    assert b.column("doc_id").to_pylist() == [1]       # null doc gated
    b = doc_fingerprint(b)
    assert len(b.column("fp").to_pylist()[0]) == 32


def test_filters_work_standalone():
    b = _batch([(1, "one two three four five six", "en"),
                (2, "short", "en"),
                (3, "uno dos tres cuatro cinco seis", "es")])
    assert token_filter(b, min_tokens=6).column("doc_id").to_pylist() \
        == [1, 3]
    assert lang_filter(b, langs=["es"]).column("doc_id").to_pylist() == [3]
    # quality_filter computes the score on the fly (no quality column)
    assert "quality" not in b.column_names
    kept = quality_filter(b, min_quality=0.0)
    assert kept.num_rows == 3


def test_doc_signals_idempotent_and_pii_in_place():
    b = _batch([(1, "contact me at bob@example.com or 555-123-4567",
                 "en")])
    b = pii_scrub(b)
    txt = b.column("text").to_pylist()[0]
    assert "[EMAIL]" in txt and "[PHONE]" in txt
    assert "bob@example.com" not in txt
    one = doc_signals(b)
    twice = doc_signals(one)
    assert one.schema == twice.schema
    assert one.column("quality") == twice.column("quality")
    # fingerprint replaces, not duplicates
    fp2 = doc_fingerprint(doc_fingerprint(b))
    assert fp2.column_names.count("fp") == 1


def test_lang_filter_drops_null_lang():
    b = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x", "y"], pa.string()),
        "lang": pa.array(["en", None], pa.string()),
    })
    assert lang_filter(b).column("doc_id").to_pylist() == [1]
