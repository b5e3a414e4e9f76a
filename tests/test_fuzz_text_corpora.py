"""Deterministic fuzz of the text-query twins on adversarial corpora.

Seeded generators build documents full of the edge shapes real web text
has — runs of spaces/tabs/newlines, leading/trailing whitespace, empty
and punctuation-only docs, digits, CJK, very long tokens — and every
ASCII-whitespace-contract query must still hash-match its DuckDB twin.
(U+00A0-style exotic whitespace is deliberately excluded: the documented
tokenization contract scopes the SQL twins to ASCII whitespace.)
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

QUERIES = ["doc_stats", "doc_token_counts", "top_terms", "exact_dedup",
           "doc_chunks", "lang_profile", "unigram_logprob",
           "gopher_quality_flags", "vocab_growth", "doc_length_histogram",
           "token_budget_mixture", "cross_source_overlap",
           "top_terms_per_source", "dedup_keep_best", "paragraph_dedup",
           "line_dedup_intra", "term_label_mi", "quality_calibration",
           "dsir_weights", "ngram_repetition", "source_divergence",
           "inverted_index", "epoch_plan", "curation_funnel", "filter_report",
           "zipf_slope", "quality_by_source", "doc_novelty",
           "doc_sentence_stats", "term_frequency_spectrum", "url_density",
           # round-5 expansion: every remaining documents-only twin
           "bigram_perplexity", "bigram_pmi", "blocklist_filter",
           "bloom_incremental_dedup", "bm25_topk", "contamination_check",
           "curated_docs", "dedup_rate_report", "doc_byte_entropy",
           "doc_fingerprints", "doc_hash_sample", "doc_length_outliers",
           "doc_repetition", "domain_counts", "dup_clusters", "dup_spans",
           "fim_pairs", "html_boilerplate_rate", "html_main_content",
           "incremental_dedup", "leakage_safe_split", "mojibake_report",
           "nb_quality_scores", "ngram_jaccard_pairs", "pii_redact",
           "prefix_jaccard_pairs", "quality_percentile_filter",
           "quality_quantile_normalize", "quality_weighted_sample",
           "readability_scores", "sequence_pack",
           "sorted_neighborhood_pairs", "source_char_class_profile",
           "source_mixture", "source_simpson_diversity",
           "span_corruption_pairs", "stratified_sample",
           "temperature_mixture", "tfidf_top_terms", "tokenizer_fertility",
           "train_val_split", "training_order", "unicode_script_profile",
           "uniform_sample", "weighted_sample_topk",
           "minhash_dedup", "minhash_estimation_error", "simhash_dedup"]

_PIECES = [
    "word", "Word", "WORD", "w0rd", "123", "!!!", "a,b.c", "$x$",
    "\t", "\n", "  ", " ", "longtoken" * 40, "一二三", "mixed一x",
    "", "trailing ", " leading", "CR\r\nLF",
]


def _make_corpus(tmpdir: str, seed: int) -> str:
    d = os.path.join(tmpdir, f"fuzz{seed}")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(60):
        k = rng.randint(0, 12)
        texts.append("".join(rng.choice(_PIECES)
                             for _ in range(k)) if k else "")
    # force the classic edge docs in every corpus
    texts[:6] = ["", " ", "\t\n", "a", " a  b\tc \n", "一二三 一二三"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(len(texts))],
                           pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          ignore_index=True)


@pytest.mark.parametrize("seed", [11, 23])
@pytest.mark.parametrize("name", QUERIES)
def test_fuzz_corpus_matches_oracle(ray_session, tmp_path, seed, name):
    import ray.data
    sf = _make_corpus(str(tmp_path), seed)
    res = entrymod.queries()[name](sf)
    if isinstance(res, (ray.data.Dataset, pa.Table)):
        if isinstance(res, ray.data.Dataset):
            schema = res.schema()
            res = res.to_pandas()
            if len(res) == 0 and len(res.columns) == 0 \
                    and schema is not None and schema.names:
                # Ray drops columns from an empty Dataset's to_pandas
                res = pa.schema(list(zip(schema.names, schema.types))) \
                    .empty_table().to_pandas()
        else:
            res = res.to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    oracle = con.execute(entrymod.oracle_sql()[name]).df()
    a, b = _canon(pd.DataFrame(res)), _canon(oracle)
    if len(a) == 0 and len(b) == 0 and len(a.columns) == 0:
        return          # both empty; Ray lost the schema entirely
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  obj=f"{name} seed={seed}")
