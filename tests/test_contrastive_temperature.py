"""Discriminating edges for contrastive_pairs (self-exclusion, missing
positive when a label is unique, id-asc tie-break) and
temperature_mixture (tail upsample / head downsample, null-text 0
tokens, zero-mass source dropped), each against the DuckDB twin."""

import os

import duckdb
import numpy as np
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


def test_contrastive_edges(ray_session, tmp_path):
    """Anchor 0 (label 7 unique): no positive, only a hard negative.
    Anchor 1: vectors 10 and 11 tie exactly (identical embeddings,
    same label) -> positive is the LOWER id; self never wins the
    positive slot despite cosine 1.0."""
    d = str(tmp_path)
    rows = [
        (0, [1.0, 0.0], 7),       # anchor, unique label
        (1, [0.0, 1.0], 3),       # anchor
        (10, [0.0, 2.0], 3),      # same label as 1, same direction
        (11, [0.0, 3.0], 3),      # identical direction -> exact tie
        (12, [1.0, 1.0], 4),      # the hard-negative pool
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32())}),
        os.path.join(d, "embeddings.parquet"))
    res = E.queries()["contrastive_pairs"](d).to_pandas() \
        .sort_values(["anchor_id", "pair_kind"]).reset_index(drop=True)
    by = {(r.anchor_id, r.pair_kind): r for r in res.itertuples()}
    assert (0, "positive") not in by            # unique label
    assert by[(0, "hard_negative")].pair_id in (1, 10, 11, 12)
    assert by[(1, "positive")].pair_id == 10    # tie -> lower id
    assert by[(1, "positive")].score == 1.0
    assert by[(1, "hard_negative")].pair_id == 12
    orc = _oracle(d, "contrastive_pairs", ["embeddings"]) \
        .sort_values(["anchor_id", "pair_kind"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)


def test_temperature_mixture_edges(ray_session, tmp_path):
    """Head source (90% of mass) downsampled, tail source upsampled;
    null-text docs count 0 tokens; an all-null source is dropped."""
    d = str(tmp_path)
    texts = ["w " * 900, "w " * 100, None, "  "]
    srcs = ["head", "tail", "tail", "deadmass"]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([0] * 4, pa.int64())}),
        os.path.join(d, "documents.parquet"))
    res = E.queries()["temperature_mixture"](d).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert list(res["source"]) == ["head", "tail"]   # deadmass dropped
    head = res[res.source == "head"].iloc[0]
    tail = res[res.source == "tail"].iloc[0]
    assert head["n_tokens"] == 900 and tail["n_tokens"] == 100
    assert tail["n_docs"] == 2                       # null doc counted
    assert head["boost"] < 1.0 < tail["boost"]
    # exact α=0.7 math
    p = np.array([900.0, 100.0]) ** 0.7
    want_temp = p / p.sum()
    assert abs(head["temp_share"] - round(want_temp[0], 6)) < 1e-9
    assert abs(tail["temp_share"] - round(want_temp[1], 6)) < 1e-9
    orc = _oracle(d, "temperature_mixture", ["documents"]) \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, orc, check_dtype=False)
