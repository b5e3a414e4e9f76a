"""logreg_quality_scores bit-equality against a single-node numpy replay
of the identical math (same tokenizer/hash, pinned dot order, per-row
micro-snapped residuals, exact int gradient sums) — proves the
distributed GD is deterministic and batch-boundary-independent.  Also
pins: separable weak labels are actually learned (training accuracy
beats the majority class), NULL text scores at the bias, and empty
input returns the typed empty frame."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import __ray_entry__ as E
from pdf_extract_kit_ray.pipelines.curation import (_logreg_sigmoid,
                                                    _logreg_tokenize)

DIM, ITERS, LR = 128, 6, 0.5
POS = ("src0", "src1", "src2", "src3", "src4")


def _reference(table: pa.Table):
    """Single-node replay of the exact distributed recipe."""
    rows, buck = _logreg_tokenize(table, DIM)
    n = table.num_rows
    y = pc.fill_null(pc.is_in(table.column("source"),
                              value_set=pa.array(sorted(set(POS)))),
                     False).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    w = np.zeros(DIM + 1, np.float64)
    for _ in range(ITERS):
        dot = np.bincount(rows, weights=w[buck], minlength=n) + w[DIM]
        r = _logreg_sigmoid(dot) - y
        r_int = np.where(r >= 0, np.floor(r * 1e6 + 0.5),
                         np.ceil(r * 1e6 - 0.5)).astype(np.int64)
        g = np.bincount(buck, weights=r_int[rows].astype(np.float64),
                        minlength=DIM).astype(np.int64)
        G = np.concatenate([g, [r_int.sum()]]).astype(np.float64)
        w = w - LR * (G / 1e6) / n
    dot = np.bincount(rows, weights=w[buck], minlength=n) + w[DIM]
    return _logreg_sigmoid(dot), (dot >= 0).astype(np.int64)


def test_bit_equality_and_learning(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    texts, sources = [], []
    for i in range(400):
        pos = i % 2 == 0
        vocab = (["good", "clean", "prose", "signal"] if pos
                 else ["spam", "junk", "noise", "clutter"])
        shared = ["the", "and", "of"]
        k = rng.randint(3, 12)
        words = [str(rng.choice(vocab + shared)) for _ in range(k)]
        texts.append(" ".join(words))
        sources.append("src0" if pos else "src9")
    texts[0], texts[1] = None, ""           # NULL and empty text edges
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(t, f"{d}/documents.parquet")

    got = E.queries()["logreg_quality_scores"](d).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref_score, ref_pred = _reference(t)
    ref_r6 = np.round(ref_score * 1e6) / 1e6   # engine rounds half-away;
    # scores here are far from 5e-7 midpoints so np.round agrees
    assert np.array_equal(got["pred_pos"].to_numpy(), ref_pred)
    assert np.allclose(got["lr_score"].to_numpy(), ref_r6, atol=1e-9,
                       rtol=0)

    # the weak labels are separable by construction: training accuracy
    # must clearly beat the 50% majority baseline
    y = (t.column("source").to_pandas() == "src0").astype(int).to_numpy()
    acc = (got["pred_pos"].to_numpy() == y).mean()
    assert acc > 0.9, acc
    # NULL text scores exactly at the bias (same as empty text)
    assert got.loc[0, "lr_score"] == got.loc[1, "lr_score"]


def test_empty_corpus(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}), f"{d}/documents.parquet")
    ds = E.queries()["logreg_quality_scores"](d)
    df = ds.to_pandas()
    assert len(df) == 0
