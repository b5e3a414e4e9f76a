"""Unit semantics for bm25_topk / user_event_entropy / knn_classify.

The oracle tests (test_queries_oracle) pin these against their SQL twins on
the generated corpora; the micro-tables here pin the DISCRIMINATING edges:
entropy of degenerate vs uniform distributions, BM25 tf saturation /
absent-term behavior / n_terms_hit, and the majority-vote tie-break.
"""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines import similarity, streaming, text


def _write_events(tmpdir, rows):
    """rows: list of (user_id, event_type)."""
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
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


def _write_embeddings(tmpdir, rows):
    """rows: list of (vec_id, [floats], label)."""
    os.makedirs(tmpdir, exist_ok=True)
    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(t, os.path.join(tmpdir, "embeddings.parquet"))


def test_user_event_entropy_values(ray_session, tmp_path):
    d = str(tmp_path / "ent")
    _write_events(d, [
        # user 1: one type repeated -> entropy exactly 0 (the bot signature)
        (1, "click"), (1, "click"), (1, "click"), (1, "click"),
        # user 2: perfectly uniform over two types -> ln(2)
        (2, "click"), (2, "view"), (2, "click"), (2, "view"),
        # user 3: 3 click + 1 view -> micro-snapped (m(1,4) + 3*m(3,4)) / 4e6
        (3, "click"), (3, "view"), (3, "click"), (3, "click"),
    ])
    res = streaming.user_event_entropy(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert res["user_id"].tolist() == [1, 2, 3]
    assert res["n_events"].tolist() == [4, 4, 4]
    assert res["n_types"].tolist() == [1, 2, 2]
    ln2_micro = math.floor(math.log(2.0) * 1e6 + 0.5)
    m14 = math.floor(math.log(4.0) * 1e6 + 0.5)
    m34 = math.floor(-math.log(3.0 / 4.0) * 1e6 + 0.5)
    exp3 = round((m14 + 3 * m34) / 4e6, 6)
    assert res["entropy"].tolist() == [
        0.0, round(4 * ln2_micro / 4e6, 6), exp3]


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Straight-line reimplementation of the micro-int BM25 spec."""
    toks = [t.lower().split() for t in texts]
    dls = [len(tk) for tk in toks]
    n = float(len(texts))
    avgdl = math.floor((float(sum(dls)) * 1e6) / n + 0.5) / 1e6
    scores, hits = {}, {}
    for term in terms:
        df = float(sum(1 for tk in toks if term in tk))
        if df == 0:
            continue
        idf = math.floor(
            math.log(1.0 + ((n - df) + 0.5) / (df + 0.5)) * 1e6 + 0.5) / 1e6
        for i, tk in enumerate(toks):
            tf = float(tk.count(term))
            if tf == 0:
                continue
            den = tf + k1 * ((1.0 - b) + b * (dls[i] / avgdl))
            c = math.floor(idf * ((tf * (k1 + 1.0)) / den) * 1e6 + 0.5)
            scores[i] = scores.get(i, 0) + c
            hits[i] = hits.get(i, 0) + 1
    return {i: (hits[i], s / 1e6) for i, s in scores.items() if s > 0}


def test_bm25_topk_semantics(ray_session, tmp_path):
    d = str(tmp_path / "bm25")
    texts = [
        "data data data",          # tf saturation: 3x 'data' in a short doc
        "data join",               # two distinct hits
        "stream stream stream stream",
        "nothing relevant here",   # no query term -> never returned
        "join data stream",        # all three terms
    ]
    _write_docs(d, texts)
    res = text.bm25_topk(d).to_pandas()
    exp = _bm25_reference(texts, ("data", "join", "stream"))
    assert set(res["doc_id"]) == set(exp)          # doc 3 absent
    for _, row in res.iterrows():
        h, s = exp[row["doc_id"]]
        assert row["n_terms_hit"] == h
        assert row["score"] == s
    # top-k ordering: score desc, doc_id asc
    got = list(zip(res["score"], res["doc_id"]))
    assert got == sorted(got, key=lambda x: (-x[0], x[1]))
    assert res["doc_id"].iloc[0] == 4              # 3 hits ranks first


def test_bm25_absent_term_is_ignored(ray_session, tmp_path):
    d = str(tmp_path / "bm25_absent")
    _write_docs(d, ["data here", "other text"])
    res = text.bm25_topk(d, terms=("data", "zzz_not_in_corpus")) \
        .to_pandas()
    assert res["doc_id"].tolist() == [0]
    assert res["n_terms_hit"].tolist() == [1]


def test_knn_classify_majority_and_tiebreak(ray_session, tmp_path):
    d = str(tmp_path / "knn")
    rows = [
        # queries (vec_id < 64)
        (0, [1.0, 0.0], 9),       # true label 9
        (1, [0.0, 1.0], 7),
        # candidates for query 0, by descending cosine: labels 5, 5, 3, 3
        (64, [1.0, 0.0], 5),
        (65, [0.99, 0.05], 5),
        (66, [0.98, 0.1], 3),
        (67, [0.97, 0.15], 3),
        # candidates near query 1: clear majority label 2
        (68, [0.0, 1.0], 2),
        (69, [0.05, 0.99], 2),
        (70, [0.1, 0.98], 2),
        (71, [0.9, 0.4], 4),
    ]
    _write_embeddings(d, rows)
    res = similarity.knn_classify(d, k=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert res["vec_id"].tolist() == [0, 1]
    assert res["true_label"].tolist() == [9, 7]
    # query 0's top-4 votes are {5: 2, 3: 2} -> tie breaks to the SMALLER label
    assert res["pred_label"].tolist()[0] == 3
    assert res["n_votes"].tolist()[0] == 2
    # query 1: its 3 nearest are label 2 (the label-4 vector is the farthest)
    assert res["pred_label"].tolist()[1] == 2
    assert res["n_votes"].tolist()[1] == 3


def test_doc_byte_entropy_known_values(ray_session, tmp_path):
    """Straight-line numpy twin + closed-form cases: a single repeated
    byte has entropy 0; 'ab'*n has exactly 1 bit; NULL and empty docs
    vanish."""
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import text as T

    rows = [
        {"doc_id": 0, "text": "aaaaaaaa"},
        {"doc_id": 1, "text": "ab" * 16},
        {"doc_id": 2, "text": "The quick brown fox jumps over the lazy dog"},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": ""},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (T.doc_byte_entropy(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(res.index) == [0, 1, 2]
    assert res.loc[0, "entropy_bits"] == 0.0
    assert res.loc[1, "entropy_bits"] == 1.0
    # numpy twin for the prose doc — per-bin micro-int term snap before
    # the sum (the operator's SQL-replayable reduction contract)
    b = np.frombuffer(rows[2]["text"].encode(), np.uint8)
    p = np.bincount(b, minlength=256) / float(len(b))
    terms = -np.where(p > 0, p * np.log2(p), 0.0)
    ref = np.floor(terms * 1e6 + 0.5).astype(np.int64).sum() / 1e6
    assert res.loc[2, "entropy_bits"] == ref
    assert res.loc[2, "n_bytes"] == len(b)
