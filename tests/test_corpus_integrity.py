"""corpus_integrity_report must actually DETECT violations — the clean
sweep corpus has zero, so this plants one of each class and asserts the
exact counts (and DuckDB twin agreement on the same corrupt table)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _span(kind="plain_text", text="hello", ref="geom://1,2,3,4",
          offset=0):
    return {"kind": kind, "text": text, "media_ref": ref,
            "offset": offset}


def test_planted_violations(ray_session, tmp_path):
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    docs = [
        ("doc-00000000", [_span()]),                        # clean
        ("doc-00000000", [_span()]),                        # dup id
        (None, [_span()]),                                  # null id
        ("weird-1", [_span()]),                             # bad format
        ("doc-00000004", None),                             # null spans
        ("doc-00000005", [_span(kind="mystery_kind")]),     # bad kind
        ("doc-00000006", [_span(text=None)]),               # null text
        ("doc-00000007", [_span(ref="ftp://x")]),           # bad scheme
        ("doc-00000008", [_span(offset=-5)]),               # negative off
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.string()),
        "spans": pa.array([s for _, s in docs], pa.list_(span_t)),
    })
    d = str(tmp_path / "raw")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))

    # oracle first (the no-arg twin pins the sf0.01 raw glob: swap it
    # for the corrupt dir), then the engine via a patched _corpus_path
    clean_glob = os.path.join(E._corpus_path("/root/testdata/sf0.01"),
                              "*.parquet")
    sql = E.oracle_sql()["corpus_integrity_report"] \
        .replace(clean_glob, os.path.join(d, "*.parquet"))
    orc = duckdb.sql(sql).df() \
        .set_index("constraint_name")["n_violations"]
    orig = E._corpus_path
    E._corpus_path = lambda sf, **kw: d
    try:
        got = E.queries()["corpus_integrity_report"]("ignored") \
            .to_pandas().set_index("constraint_name")["n_violations"]
    finally:
        E._corpus_path = orig
    expected = {
        "doc_id_not_null": 1, "doc_id_unique": 1, "doc_id_format": 1,
        "spans_not_null": 1, "span_kind_known": 1,
        "span_text_not_null": 1, "span_ref_scheme": 1,
        "span_offset_nonneg": 1,
    }
    assert dict(got) == expected
    assert dict(orc) == expected
