"""Null-text contract: document queries must agree with their SQL twins
when the text column contains NULLs (routine in web-scale corpora).

Pinned contracts (chosen deliberately, enforced on BOTH sides):
- quality(NULL) = 0.0 — the naive SQL spelling accidentally yields 0.4
  because DuckDB's least() ignores NULL arguments;
- per-doc stats (n_chars/n_tokens/n_alpha) stay NULL;
- shingle/signature dedup ops skip null docs entirely (no fingerprints,
  never candidates);
- incremental_dedup: null fingerprints match nothing (is_dup FALSE);
- sequence_pack: null docs pack as 0 tokens;
- paragraph_dedup: null-text docs vanish (SQL unnest of NULL split);
- span_corruption_pairs: null-text docs vanish (same unnest contract);
- leakage_safe_split: null-text docs never cluster (NULL fingerprints
  match nothing) but still receive a singleton split assignment.
"""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

SRC = "/root/testdata/sf0.001"
NULL_DIR = "/tmp/pek_nulltext_sf"

ORACLE_QUERIES = [
    "doc_stats", "lang_profile", "incremental_dedup", "sequence_pack",
    "quality_percentile_filter", "ngram_jaccard_pairs", "curated_docs",
    "exact_dedup", "unigram_logprob", "doc_fingerprints",
    "gopher_quality_flags", "vocab_growth", "doc_length_histogram",
    "dedup_rate_report", "token_budget_mixture", "cross_source_overlap",
    "top_terms_per_source", "dedup_keep_best", "paragraph_dedup",
    "line_dedup_intra", "term_label_mi", "quality_calibration",
    "dsir_weights", "ngram_repetition", "source_divergence",
    "inverted_index", "epoch_plan", "curation_funnel", "filter_report",
    "zipf_slope", "quality_by_source", "doc_novelty",
    "doc_sentence_stats", "term_frequency_spectrum", "url_density",
    "nb_quality_scores", "span_corruption_pairs", "leakage_safe_split",
    "temperature_mixture", "fim_pairs", "quality_quantile_normalize",
]
ROWS_ONLY_QUERIES = ["winnow_neardup", "minhash_dedup", "simhash_dedup"]


def _make_null_dir():
    os.makedirs(NULL_DIR, exist_ok=True)
    for f in glob.glob(f"{SRC}/*.parquet"):
        out = os.path.join(NULL_DIR, os.path.basename(f))
        # regenerate when the source table is newer (stale-schema guard)
        if os.path.exists(out) and \
                os.path.getmtime(out) >= os.path.getmtime(f):
            continue
        t = pq.read_table(f)
        if os.path.basename(f) == "documents.parquet":
            rng = np.random.RandomState(7)
            mask = rng.rand(t.num_rows) < 0.1
            text = [None if m else x
                    for x, m in zip(t.column("text").to_pylist(), mask)]
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pa.array(text, pa.string()))
        pq.write_table(t, out)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for f in glob.glob(f"{NULL_DIR}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con.execute(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          ignore_index=True)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_null_text_matches_oracle(ray_session, name):
    _make_null_dir()
    a = _canon(_to_pandas(entrymod.queries()[name](NULL_DIR)))
    b = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_null_text_rows_only(ray_session, name):
    _make_null_dir()
    res = _to_pandas(entrymod.queries()[name](NULL_DIR))
    assert res is not None and len(res.columns) > 0
