"""Curation operators: planted-PII redaction, repetition scoring, and the
hash-split determinism contracts (the clean-corpus no-op paths are covered
by the oracle-twin parametrized test)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def planted_dir(tmp_path):
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "contact me at alice.smith+x@example.org for details",
            "server 10.0.255.3 responded then 192.168.1.1 timed out",
            "call 555-867-5309 or 555.123.4567 now",
            "clean text with no pii at all",
        ], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["src0"] * 4, pa.string()),
        "n_chars": pa.array([10, 10, 10, 10], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_pii_redact_planted(ray_session, planted_dir):
    from pdf_extract_kit_ray.pipelines.curation import pii_redact
    df = pii_redact(planted_dir).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[1, "n_emails"] == 1 and "[EMAIL]" in df.loc[1, "clean_text"]
    assert "alice" not in df.loc[1, "clean_text"]
    assert df.loc[2, "n_ips"] == 2 and df.loc[2, "clean_text"].count("[IP]") == 2
    assert df.loc[3, "n_phones"] == 2 \
        and df.loc[3, "clean_text"].count("[PHONE]") == 2
    assert df.loc[4, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    assert df.loc[4, "clean_text"] == "clean text with no pii at all"


def test_pii_redact_matches_duckdb_on_planted(ray_session, planted_dir):
    """The RE2 patterns behave identically in Arrow and DuckDB on text
    that actually contains PII (the sf corpus exercises only the no-op
    path)."""
    import __ray_entry__ as entrymod
    from pdf_extract_kit_ray.pipelines.curation import pii_redact
    ray_df = pii_redact(planted_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{planted_dir}/documents.parquet')")
    duck_df = con.execute(entrymod.oracle_sql()["pii_redact"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for col in ["n_emails", "n_ips", "n_phones", "clean_text"]:
        assert list(ray_df[col]) == list(duck_df[col]), col


def test_doc_repetition_planted(ray_session, planted_dir):
    from pdf_extract_kit_ray.pipelines.curation import doc_repetition
    df = doc_repetition(planted_dir).to_pandas().set_index("doc_id")
    # doc 4: "clean text with no pii at all" — 7 tokens, all distinct
    assert df.loc[4, "n_tokens"] == 7
    assert df.loc[4, "n_distinct"] == 7
    assert abs(df.loc[4, "top_token_frac"] - round(1 / 7, 6)) < 1e-9
    # doc 3 repeats "or"-free but has two "555..." distinct tokens; just
    # sanity: fractions in (0, 1]
    assert ((df["top_token_frac"] > 0) & (df["top_token_frac"] <= 1)).all()


def test_train_val_split_deterministic(ray_session):
    from pdf_extract_kit_ray.pipelines.curation import train_val_split
    sf = "/root/testdata/sf0.001"
    a = train_val_split(sf).to_pandas().sort_values("split") \
        .reset_index(drop=True)
    b = train_val_split(sf).to_pandas().sort_values("split") \
        .reset_index(drop=True)
    assert a.equals(b)
    total = a.n_docs.sum()
    val = a.set_index("split").loc["val", "n_docs"]
    # 26/256 expected; at 50 docs allow a wide band but require both splits
    assert 0 < val < total


def test_source_mixture_rates(ray_session):
    from pdf_extract_kit_ray.pipelines.curation import source_mixture
    df = source_mixture("/root/testdata/sf0.01").to_pandas()
    df["num"] = df.source.str.slice(3).astype(int)
    full = df[df.num < 4]
    assert (full.n_kept == full.n_docs).all()          # tier 1: keep all
    tail = df[df.num >= 12]
    assert (tail.n_kept < tail.n_docs).all()           # tier 3: downsampled


def test_incremental_dedup_planted(ray_session, tmp_path):
    """A new-shard doc whose text matches an established doc (doc_id%8==0)
    must flag is_dup; distinct new docs must not."""
    import pyarrow.parquet as pq
    docs = pa.table({
        "doc_id": pa.array([0, 8, 1, 2], pa.int64()),    # 0,8 established
        "text": pa.array(["alpha beta", "gamma delta",
                          "ALPHA   beta", "unique text"], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["src0"] * 4, pa.string()),
        "n_chars": pa.array([10, 11, 12, 11], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    from pdf_extract_kit_ray.pipelines.curation import incremental_dedup
    df = incremental_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert set(df.index) == {1, 2}            # only NEW docs emitted
    assert bool(df.loc[1, "is_dup"])          # normalized match vs doc 0
    assert not bool(df.loc[2, "is_dup"])


def test_doc_repetition_unicode_whitespace_parity(ray_session, tmp_path):
    """Tokenization must match the RE2 '\\s+' oracle even on non-ASCII
    whitespace (U+00A0 is NOT a token separator for either engine)."""
    import duckdb
    import pyarrow.parquet as pq
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b a b c"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["src0"], pa.string()),
        "n_chars": pa.array([11], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    import __ray_entry__ as entrymod
    from pdf_extract_kit_ray.pipelines.curation import doc_repetition
    df = doc_repetition(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(entrymod.oracle_sql()["doc_repetition"]).df()
    assert df.iloc[0]["n_tokens"] == o.iloc[0]["n_tokens"] == 3
    assert df.iloc[0]["n_distinct"] == o.iloc[0]["n_distinct"] == 2
    assert df.iloc[0]["top_token_frac"] == o.iloc[0]["top_token_frac"]


def test_quality_percentile_filter_tie_and_rank(ray_session, tmp_path):
    """percentile_disc semantics on a tiny corpus with score ties: the
    threshold is the value at rank ceil(p*n), and EVERY doc at the
    threshold survives (ties are kept, like the SQL twin)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.curation import \
        quality_percentile_filter
    # identical texts -> identical scores (a tie group at the top)
    texts = ["low 1"] * 6 + ["The quick brown fox jumps high"] * 4
    docs = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "source": pa.array(["src0"] * 10, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    res = quality_percentile_filter(str(tmp_path), p=0.7).to_pandas()
    # rank ceil(0.7*10)=7 in ascending order -> threshold = the high
    # score; all 4 high docs kept, all 6 low dropped
    assert sorted(res["doc_id"].tolist()) == [6, 7, 8, 9]
    assert res["quality"].nunique() == 1


@pytest.fixture()
def gopher_dir(tmp_path):
    """Docs planted to trip each Gopher rule independently (the sf corpus
    exercises none of the fail paths: no symbols, ample stopwords)."""
    good = "the quick brown fox jumps over a lazy dog on that sunny day " \
           * 10  # 120 words, mwl ~4, stopwords present, no symbols
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            good,                                   # passes every rule
            "the of to and with short",             # < 50 words
            " ".join(["supercalifragilistic"] * 60) + " the a of to",
            # ^ mean word length > 10
            ("the and $$$ %%% ### !!! ^^^ &&& " * 20),  # symbol ratio > 0.1
            " ".join(["word"] * 80),                # zero stopword hits
            None,                                   # null text
        ], pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["src0"] * 6, pa.string()),
        "n_chars": pa.array([1] * 6, pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_gopher_quality_flags_planted(ray_session, gopher_dir):
    from pdf_extract_kit_ray.pipelines.curation import gopher_quality_flags
    df = gopher_quality_flags(gopher_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    assert bool(df.loc[1, "keep"]) is True
    assert not df.loc[2, "keep"] and df.loc[2, "n_words"] < 50
    assert not df.loc[3, "keep"] and df.loc[3, "mean_word_len"] > 10
    assert not df.loc[4, "keep"] and df.loc[4, "symbol_ratio"] > 0.1
    assert not df.loc[5, "keep"] and df.loc[5, "n_stop_hits"] == 0
    assert not df.loc[6, "keep"] and df.loc[6, "n_words"] == 0 \
        and df.loc[6, "mean_word_len"] == 0.0


def test_gopher_quality_flags_matches_duckdb_on_planted(ray_session,
                                                        gopher_dir):
    import __ray_entry__ as entrymod
    from pdf_extract_kit_ray.pipelines.curation import gopher_quality_flags
    ray_df = gopher_quality_flags(gopher_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{gopher_dir}/documents.parquet')")
    duck_df = con.execute(entrymod.oracle_sql()["gopher_quality_flags"]) \
        .df().sort_values("doc_id").reset_index(drop=True)
    for col in ["n_words", "mean_word_len", "symbol_ratio", "n_stop_hits",
                "keep"]:
        assert list(ray_df[col]) == list(duck_df[col]), col


def test_dsir_weights_orders_target_like_docs(ray_session, tmp_path):
    """A doc written in the target slice's vocabulary must outweigh one
    written in the raw slice's vocabulary, and the capped-vocab path
    (vocab_size smaller than distinct terms) must still score every doc
    via the OOV constant."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "source": "src0", "text": "quant flux quant flux"},
        {"doc_id": 1, "source": "src0", "text": "flux warp quant"},
        {"doc_id": 2, "source": "src1", "text": "mud rock mud rock mud"},
        {"doc_id": 3, "source": "src1", "text": "rock mud"},
        # the probes: 4 speaks target, 5 speaks raw
        {"doc_id": 4, "source": "src2", "text": "quant flux warp"},
        {"doc_id": 5, "source": "src2", "text": "mud rock mud"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (curation.dsir_weights(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert res.loc[4, "logw"] > 0 > res.loc[5, "logw"]
    assert res.loc[4, "logw"] > res.loc[5, "logw"]
    # capped vocab: every doc still gets a row, weights stay ordered
    capped = (curation.dsir_weights(str(tmp_path), vocab_size=2)
              .to_pandas().set_index("doc_id"))
    assert len(capped) == 6


def test_ngram_repetition_planted(ray_session, tmp_path):
    """'click here click here click here' must light up the bigram signal
    ('click here' = 3 of 5 bigrams), a 2-token doc gets NULL trigram
    columns, and a 1-token doc vanishes."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "text": "click here click here click here"},
        {"doc_id": 1, "text": "all words differ in this doc body"},
        {"doc_id": 2, "text": "just two"},
        {"doc_id": 3, "text": "one"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (curation.ngram_repetition(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(res.index) == [0, 1, 2]
    assert res.loc[0, "n_bigrams"] == 5 and res.loc[0, "top_bigram_frac"] == 0.6
    assert res.loc[0, "n_trigrams"] == 4 and res.loc[0, "top_trigram_frac"] == 0.5
    assert res.loc[1, "top_bigram_frac"] == round(1/6, 6)
    assert res.loc[2, "n_bigrams"] == 1
    assert pd.isna(res.loc[2, "n_trigrams"])


def test_curation_funnel_planted(ray_session, tmp_path):
    """Each stage's count drops by exactly the planted attrition: one
    low-quality doc, one duplicate, one PII-bearing winner."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "text": "a fine clean document with plenty of words"},
        {"doc_id": 1, "text": "a fine clean document with plenty of words"},  # dup of 0
        {"doc_id": 2, "text": "123 456 789"},                                 # low quality
        {"doc_id": 3, "text": "contact me at leak@example.com for details"}, # PII winner
        {"doc_id": 4, "text": "another good and unique body of words here"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (curation.curation_funnel(str(tmp_path)).to_pandas()
           .set_index("stage"))
    assert res.loc["raw", "n_docs"] == 5
    assert res.loc["quality_pass", "n_docs"] == 4      # doc 2 dropped
    assert res.loc["dedup_kept", "n_docs"] == 3        # doc 1 deduped
    assert res.loc["pii_clean", "n_docs"] == 2         # doc 3 has PII


def test_url_density_planted(ray_session, tmp_path):
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "text": "see https://a.example/x and www.b.org now"},
        {"doc_id": 1, "text": "no links in this plain body of text"},
        {"doc_id": 2, "text": ""},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (curation.url_density(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert res.loc[0, "n_urls"] == 2 and res.loc[0, "n_tokens"] == 5
    assert res.loc[0, "urls_per_100_tokens"] == round(2 / 5 * 100, 6)
    assert res.loc[1, "n_urls"] == 0
    assert pd.isna(res.loc[2, "urls_per_100_tokens"])


def test_domain_counts_planted(ray_session, tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "text": "x https://www.A.example/p?q=1 y "
                              "http://a.example:8080/z and www.b.org"},
        {"doc_id": 1, "text": "again https://a.example/other plain"},
        {"doc_id": 2, "text": "no links"},
        {"doc_id": 3, "text": None},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = {r["domain"]: (r["n_urls"], r["n_docs"])
           for r in curation.domain_counts(str(tmp_path)).take_all()}
    # www. and scheme stripped, host lowercased, port/path cut
    assert res == {"a.example": (3, 2), "b.org": (1, 1)}


def test_blocklist_filter_planted(ray_session, tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = [
        {"doc_id": 0, "text": "buy at https://ads.example/buy and "
                              "https://ok.org/fine"},
        {"doc_id": 1, "text": "clean https://ok.org/page only"},
        {"doc_id": 2, "text": "WWW.SPAM.EXAMPLE/lp is blocked too"
                              .replace("WWW.SPAM.EXAMPLE", "www.Spam.example")},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = {r["doc_id"]: (r["n_urls"], r["n_blocked_urls"], r["kept"])
           for r in curation.blocklist_filter(str(tmp_path)).take_all()}
    assert res == {0: (2, 1, False), 1: (1, 0, True),
                   2: (1, 1, False), 3: (0, 0, True), 4: (0, 0, True)}
