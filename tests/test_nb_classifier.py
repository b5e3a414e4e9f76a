"""Discriminating edges for the Naive-Bayes weak-supervision quality
classifier: OOV-only documents score prior-only, the pred boundary is
strictly-greater-than-zero, null text keeps its (prior-only) row, and a
class-distinctive token moves the score in the right direction."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines.curation import nb_quality_scores


def _write_docs(d, rows):
    """rows: (doc_id, text, source)"""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int64()),
    })
    pq.write_table(t, d / "documents.parquet")


def test_oov_prior_only_and_strict_zero_boundary(ray_session, tmp_path):
    """Hand-checkable 2-term vocab: w_good = ln(4/5)-ln(1/4) > 0,
    w_bad = ln(1/5)-ln(3/4) < 0; equal class doc counts make the prior
    micro exactly 0, so the OOV-only doc sits exactly ON the strict
    pred boundary."""
    d = tmp_path / "sf"
    d.mkdir()
    _write_docs(d, [
        (1, "good good", "src0"),
        (2, "good", "src0"),
        (3, "bad bad", "src9"),
        (4, "zzz yyy", "src9"),     # both tokens below the vocab_k=2 cut
    ])
    df = nb_quality_scores(str(d), vocab_k=2).to_pandas() \
        .set_index("doc_id")
    # prior = ln((2+1)/(2+1)) = 0; doc 4 has no vocab tokens -> exactly 0,
    # and the boundary is strictly-greater -> pred 0
    assert df.loc[4, "nb_score"] == 0.0
    assert df.loc[4, "pred_pos"] == 0
    assert df.loc[1, "nb_score"] > df.loc[2, "nb_score"] > 0  # 2 hits > 1
    assert df.loc[1, "pred_pos"] == 1 and df.loc[2, "pred_pos"] == 1
    assert df.loc[3, "nb_score"] < 0 and df.loc[3, "pred_pos"] == 0
    # exact micro arithmetic: doc1 carries exactly 2x w_good
    import math
    w_good = round((math.log(4.0 / 5.0) - math.log(1.0 / 4.0)) * 1e6)
    assert df.loc[1, "nb_score"] == (2 * w_good) / 1e6
    assert df.loc[2, "nb_score"] == w_good / 1e6


def test_null_text_keeps_prior_row(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_docs(d, [
        (1, "hello world", "src0"),
        (2, None, "src9"),
    ])
    df = nb_quality_scores(str(d)).to_pandas()
    assert sorted(df["doc_id"]) == [1, 2]
    import math
    prior = round(math.log((1 + 1.0) / (1 + 1.0)) * 1e6) / 1e6
    assert df.set_index("doc_id").loc[2, "nb_score"] == prior


def test_distinctive_token_separates_classes(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    rows = []
    for i in range(10):
        rows.append((i, "good signal shared", "src0"))
    for i in range(10, 20):
        rows.append((i, "bad noise shared", "src9"))
    _write_docs(d, rows)
    df = nb_quality_scores(str(d)).to_pandas()
    pos_scores = df[df["doc_id"] < 10]["nb_score"]
    neg_scores = df[df["doc_id"] >= 10]["nb_score"]
    assert (pos_scores > 0).all() and (df[df["doc_id"] < 10]
                                       ["pred_pos"] == 1).all()
    assert (neg_scores < 0).all() and (df[df["doc_id"] >= 10]
                                       ["pred_pos"] == 0).all()
