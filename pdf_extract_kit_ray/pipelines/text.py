"""Text-analysis operators over a document table (training-data pipeline ops).

All hot paths are vectorized Arrow (`pyarrow.compute` kernels) inside
``map_batches``; reads prune to the needed columns.  Each operator has an
exact DuckDB-SQL twin in ``__ray_entry__.oracle_sql`` — the expressions are
written so both engines compute bit-identical doubles (same operation order,
rounded to 6dp at the end).

Tokenization contract: the engine's semantic is Python ``str.split()``
(UNICODE whitespace, via ``utf8_split_whitespace`` — 3.5x faster than the
RE2 kernel on the 100 TB map path and the right behavior for real web text
full of U+00A0).  The SQL twins split on RE2 ``'\\s+'`` (ASCII whitespace),
which is equivalent on the test corpora (no exotic whitespace by
construction); an operator that needs strict engine/oracle parity on
arbitrary bytes uses ``pc.split_pattern_regex`` instead (see
curation.doc_repetition).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.joins import sized_read_parquet
from ..functions.num import round6

_CJK_PATTERN = "[一-鿿]"


def _read_docs(sf_dir: str, columns) -> "ray.data.Dataset":
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _token_count(text: pa.ChunkedArray) -> pa.Array:
    """Python-str.split() semantics: runs of whitespace, no empty tokens.
    SQL twin: CASE WHEN trim(text)='' THEN 0 ELSE
    length(string_split_regex(trim(text), '\\s+')) END."""
    trimmed = pc.utf8_trim_whitespace(text)
    counts = pc.list_value_length(pc.utf8_split_whitespace(trimmed))
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), counts)


def quality_score(text: "pa.ChunkedArray") -> pa.Array:
    """The document quality score (alpha ratio 0.6 + capped token count
    0.4, rounded to 6dp) — THE single definition shared by ``doc_stats``
    and ``curated_docs`` so the two cannot drift.  Rounds half away from
    zero (``half_towards_infinity``) to match DuckDB's ``round`` on
    midpoint values; Arrow's default half-to-even would diverge from the
    SQL twins on exact 1e-6 midpoints.

    NULL text scores 0.0 (same as empty text) — pinned explicitly here
    and in the twins' shared quality expression, because the naive SQL
    spelling accidentally gives NULL docs 0.4 (DuckDB's ``least()``
    ignores NULL arguments)."""
    n_chars = pc.utf8_length(text)
    n_alpha = pc.count_substring_regex(text, "[a-zA-Z]")
    alpha_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(n_alpha, pa.float64()),
                  pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0))
    tokens_norm = pc.divide(
        pc.cast(pc.min_element_wise(_token_count(text), 100),
                pa.float64()), 100.0)
    raw = pc.add(pc.multiply(alpha_ratio, 0.6), pc.multiply(tokens_norm, 0.4))
    return pc.fill_null(round6(raw), 0.0)


def doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc: n_chars, n_tokens, n_alpha, quality score."""
    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(_token_count(text), pa.int64()),
            "n_alpha": pc.cast(
                pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64()),
            "quality": quality_score(text),
        })
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def lang_profile(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID heuristic (CJK n-gram presence -> zh, else en) rolled up
    per (source, lang_guess) with a partial combine inside map_batches so the
    shuffle moves only (source, lang, count) partials."""
    def partial(batch: pa.Table) -> pa.Table:
        # null text takes the ELSE branch ('en'), matching the SQL twin's
        # CASE WHEN regexp_matches(NULL) semantics
        has_cjk = pc.fill_null(pc.greater(
            pc.count_substring_regex(batch.column("text"), _CJK_PATTERN), 0),
            False)
        lang = pc.if_else(has_cjk, "zh", "en")
        t = pa.table({"source": batch.column("source"), "lang_guess": lang})
        return t.group_by(["source", "lang_guess"]).aggregate([([], "count_all")]) \
                .rename_columns(["source", "lang_guess", "partial_n"])
    partials = _read_docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return partials.groupby(["source", "lang_guess"]).aggregate(
        Sum("partial_n", alias_name="n_docs"))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Array:
    """md5 of whitespace-collapsed, lowercased text (the SQL-twinnable
    document fingerprint; rolling-hash shingle fingerprints live in
    dedup.py).  Null text rows fingerprint to NULL (not md5("")) so null
    docs can never silently merge with empty-string docs in a dedup
    group."""
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(
        pc.replace_substring_regex(batch.column(text_col), r"\s+", " ")))
    return md5_hex(norm)


def md5_hex(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """md5 hex digest of each row's raw utf8 bytes.

    md5 has no Arrow kernel, so per-row hashing is unavoidable — but the
    rows are hashed straight off the Arrow string buffer (memoryview
    slices), skipping the str-materialize + re-encode round-trip (~1.5x on
    the 100 TB-path map cost).  NULL rows hash to NULL."""
    import numpy as np
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1]
    mv = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    if arr.null_count == 0:
        return pa.array([md5(mv[off[i]:off[i + 1]]).hexdigest()
                         for i in range(len(arr))], pa.string())
    valid = np.asarray(pc.is_valid(arr))
    return pa.array([md5(mv[off[i]:off[i + 1]]).hexdigest() if valid[i]
                     else None for i in range(len(arr))], pa.string())


def doc_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    def fp(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": fingerprint_batch(batch)})
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow")


def doc_token_counts(sf_dir: str) -> "ray.data.Dataset":
    """Token counting two ways per doc: whitespace tokens and a BPE-style
    pre-tokenizer regex (letter runs | digit runs | single punctuation) —
    the word-count vs subword-unit-count pair a training-data pipeline
    tracks.  Both are vectorized re2/pyarrow kernels (the round-2 per-row
    ``t.split()`` / ``findall`` loops are gone) with exact SQL twins."""
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_ws_tokens": pc.cast(_token_count(text), pa.int64()),
            "n_bpe_tokens": pc.cast(pc.count_substring_regex(
                text, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


def doc_chunks(sf_dir: str, window: int = 64,
               stride: int = 48) -> "ray.data.Dataset":
    """Context-window chunking with stride — the canonical pre-training
    prep op: each document's whitespace tokens are cut into windows of
    ``window`` tokens starting every ``stride`` tokens (overlap =
    window - stride).  Emission stops once a window reaches the document
    end — the trailing window may be short, but a tail fully contained
    in the previous window is never emitted.  Emits one row per chunk
    (doc_id, chunk_id, n_tokens, chunk_text).

    Pure map — embarrassingly parallel, no shuffle.  The whole batch is
    chunked vectorized: one Arrow whitespace split, then numpy index
    algebra builds a flat gather of every chunk's token positions and a
    single ``pc.binary_join`` re-joins them — no per-row Python.  Chunks
    overlap on token positions, so the gather (not slicing) is what keeps
    it one pass."""
    import numpy as np

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        split = pc.utf8_split_whitespace(trimmed)
        arr = (split.combine_chunks()
               if isinstance(split, pa.ChunkedArray) else split)
        off = arr.offsets.to_numpy().astype(np.int64)
        n_tok = np.diff(off)
        # "" splits to [""] (one empty token): those docs have 0 tokens
        n_tok = np.where(np.asarray(pc.equal(trimmed, "")), 0, n_tok)
        # chunks while the previous window hasn't reached the end:
        # 1 + max(ceil((n - window)/stride), 0) for n > 0
        n_chunks = np.where(
            n_tok > 0,
            np.maximum((n_tok - window + stride - 1) // stride, 0) + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        doc_rep = np.repeat(np.arange(len(n_tok)), n_chunks)
        cum = np.cumsum(n_chunks) - n_chunks
        chunk_idx = np.arange(total) - cum[doc_rep]
        starts = chunk_idx * stride
        # clip: with stride > window (gap sampling) the last start can
        # land exactly at the end -> an empty chunk, same as the SQL twin
        lens = np.clip(np.minimum(window, n_tok[doc_rep] - starts), 0, None)
        # flat gather positions: off[doc] + start + arange(len) per chunk
        base = off[doc_rep] + starts
        lcum = np.cumsum(lens) - lens
        idx = np.repeat(base - lcum, lens) + np.arange(int(lens.sum()))
        gathered = arr.values.take(pa.array(idx, pa.int64()))
        lists = pa.LargeListArray.from_arrays(
            np.r_[0, np.cumsum(lens)], gathered)
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(doc_rep, pa.int64())),
            "chunk_id": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pc.binary_join(lists, " "),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


def stratified_sample(sf_dir: str, quota: int = 25) -> "ray.data.Dataset":
    """Deterministic stratified sampling — the training-data curation step
    that takes a fixed quota of documents PER SOURCE, selected by md5 hash
    order (stable across runs/workers, no RNG state).

    Scale shape: the hash rank is computed per batch (vectorized md5 off
    the Arrow buffer is not needed — doc_id is an int, hashed via md5 of
    its decimal string to match the SQL twin), then ONE shuffle groups
    each source and keeps its quota smallest hashes.  Sources are
    low-cardinality; per-group top-k is a partial sort.  At extreme
    source cardinality the same shape holds (groups shrink, not grow)."""
    import hashlib

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def ranks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "source": batch.column("source"),
                         "h": pa.array(h, pa.string())})

    def take_quota(group: pa.Table) -> pa.Table:
        group = group.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        return group.slice(0, quota).select(["doc_id", "source"])

    return (ds.map_batches(ranks, batch_format="pyarrow")
              .groupby("source")
              .map_groups(take_quota, batch_format="pyarrow"))


def tfidf_top_terms(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Per-source TF-IDF top-k terms — the curation signal for source-level
    vocabulary profiling.

    Two shuffles total, no driver state:
    1. per-batch (source, term) partial counts (the combiner) -> ONE coarse
       shuffle hashed on *term*.  Because the coarse key co-locates every
       row of a term, the bucket reduce computes tf (Arrow group_by sum),
       df (distinct-source count per term = tf rows per term), the tfidf
       score, AND a per-(bucket, source) partial top-k in one C++ pass —
       no tf/df join, no second vocab-scale shuffle.
    2. the final groupby(source) sees only <= num_coarse * k rows per
       source (each bucket's terms are disjoint, so per-bucket top-k is a
       lossless candidate filter) and takes the global top-k.

    ns (distinct sources) comes from a pruned one-column scan with per-batch
    unique partials — bounded by |sources| * blocks rows, never corpus-sized.
    """
    ds = _read_docs(sf_dir, ["source", "text"])

    # ns first: the idf factor ln(ns/df) is needed inside the bucket reduce.
    ns = (_read_docs(sf_dir, ["source"])
          .map_batches(lambda b: pa.table(
              {"source": pc.unique(b.column("source"))}),
              batch_format="pyarrow")
          .groupby("source").count().count())

    def partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
        toks = pc.list_flatten(split)
        src = pc.list_parent_indices(split)
        t = pa.table({"source": batch.column("source").take(src),
                      "term": toks}).filter(pc.not_equal(toks, ""))
        g = t.group_by(["source", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "term", "partial_tf"])

    from ..functions.agg import _coarse_of, _default_num_coarse
    nc = _default_num_coarse()

    def tag(batch: pa.Table) -> pa.Table:
        coarse = _coarse_of(batch.column("term"), nc)
        return batch.append_column("__coarse", pa.array(coarse, pa.int64()))

    def reduce_score_topk(group: pa.Table) -> pa.Table:
        tf = (group.select(["term", "source", "partial_tf"])
                   .group_by(["term", "source"])
                   .aggregate([("partial_tf", "sum")])
                   .rename_columns(["term", "source", "tf"]))
        # df per term = number of (term, source) rows — exact here because
        # the coarse key hashes term, so every source of a term is present
        df = (tf.select(["term"]).group_by("term")
                .aggregate([([], "count_all")])
                .rename_columns(["term", "df"]))
        scored = tf.join(df, keys="term", join_type="inner")  # in-memory C++
        idf = pc.ln(pc.divide(float(ns),
                              pc.cast(scored.column("df"), pa.float64())))
        tfidf = pc.multiply(pc.cast(scored.column("tf"), pa.float64()), idf)
        cand = pa.table({"source": scored.column("source"),
                         "term": scored.column("term"),
                         "tfidf": round6(tfidf)})  # micro-int, SQL bit-parity
        # per-(bucket, source) partial top-k: buckets own disjoint terms,
        # so the global per-source top-k is a subset of these candidates
        order = pc.sort_indices(cand, sort_keys=[
            ("source", "ascending"), ("tfidf", "descending"),
            ("term", "ascending")])
        cand = cand.take(order)
        src = cand.column("source").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        rank = np.arange(len(src)) - np.repeat(
            starts, np.diff(np.r_[starts, len(src)]))
        return cand.filter(pa.array(rank < k))

    def topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("tfidf", "descending"), ("term", "ascending")])
        return group.take(order.slice(0, k))

    return (ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(reduce_score_topk, batch_format="pyarrow")
              .groupby("source")
              .map_groups(topk, batch_format="pyarrow"))


def _corpus_unigram_counts(sf_dir: str) -> "ray.data.Dataset":
    """Distributed wordcount over raw (not lowercased) whitespace tokens:
    per-batch histogram combiner -> coarse-keyed Arrow aggregate.  Shared
    by the language-model scorers below.  Returns (term, n)."""
    ds = _read_docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text"))))
        toks = toks.filter(pc.not_equal(toks, ""))
        g = pa.table({"term": toks}).group_by("term") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["term", "partial_n"])

    from ..functions.agg import coarse_grouped_aggregate
    return coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "term", [("partial_n", "sum", "n")])


def unigram_logprob(sf_dir: str, vocab_size: int = 1 << 17) -> "ray.data.Dataset":
    """Per-document unigram language-model score — the CCNet-style quality
    signal: avg over the doc's tokens of -ln(corpus_count(token) / total),
    plus the token count.  Low values = stereotyped text, high = rare-token
    soup; curation filters both tails.

    Scale shape: one wordcount shuffle builds the corpus LM; the top
    ``vocab_size`` terms (plus the total token count) broadcast via
    ``ray.put`` — kilobytes at test scale, bounded by the vocab cap at any
    scale — and scoring is a pure map (a hashed gather per token, a
    segmented integer sum per doc).  Out-of-vocab tokens (possible only
    when distinct terms exceed ``vocab_size``; never on the test corpora)
    score as count 0.5.

    Bit-parity with the SQL twin: each token's -ln(c/total) is snapped to
    integer micro-units (1e-6, half away from zero — one value per
    DISTINCT count, so both engines round the same handful of doubles);
    per-doc summation is then exact integer math, immune to float
    reassociation across engines/block orders."""
    counts = _corpus_unigram_counts(sf_dir).materialize()
    total = counts.sum("n") or 0
    if total == 0:                           # empty corpus
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "avg_neg_logprob": pa.array([], pa.float64())}))
    vocab = counts.sort(["n", "term"], descending=[True, False]) \
                  .limit(vocab_size).to_pandas()
    # micro-int neg-logprob per vocab term (same expression as the twin:
    # round(-ln(c/s) * 1e6) half away from zero)
    micro = pc.cast(pc.round(
        pc.multiply(pc.negate(pc.ln(pc.divide(
            vocab["n"].to_numpy().astype(np.float64), float(total)))),
            1_000_000.0),
        ndigits=0, round_mode="half_towards_infinity"), pa.int64())
    from ..functions.joins import make_lookup, lookup_np
    mtab = make_lookup(vocab["term"], micro)
    # same half-away-from-zero micro snap as the in-vocab values (Python
    # round() is half-to-even and would break the convention on midpoints)
    m_oov = int(pc.round(pa.scalar(-np.log(0.5 / total) * 1e6),
                         ndigits=0,
                         round_mode="half_towards_infinity").as_py())
    ref = ray.put((mtab, m_oov))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "avg_neg_logprob": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        md, mo = ray.get(ref)
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        if len(flat) == 0:
            return empty
        # dictionary-encode first: the md lookup runs over the batch's
        # UNIQUE tokens (vocab-bounded), then fans out by index gather
        denc = pc.dictionary_encode(flat)
        arr = (denc.combine_chunks()
               if isinstance(denc, pa.ChunkedArray) else denc)
        m_uniq = lookup_np(arr.dictionary, md, default=mo) \
            .astype(np.int64)
        m = m_uniq[arr.indices.to_numpy()]
        par = parent.to_numpy()
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        msum = np.add.reduceat(m, starts)
        n = np.diff(np.r_[starts, len(par)]).astype(np.int64)
        from ..functions.num import round6
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(par[starts], pa.int64())),
            "n_tokens": pa.array(n, pa.int64()),
            "avg_neg_logprob": round6(pa.array(
                msum.astype(np.float64) / (n * 1_000_000.0))),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def _bigram_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-token bigram histogram (the combiner shared by
    ``bigram_pmi`` and ``bigram_perplexity``): the shuffle ships one row
    per distinct (w1, w2) per batch, never per token."""
    split = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(batch.column("text")))
    arr = (split.combine_chunks()
           if isinstance(split, pa.ChunkedArray) else split)
    # list_flatten/list_parent_indices (not .values) — both slice-aware
    vals = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(arr).to_numpy()
    if len(vals) < 2:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "partial_n": pa.array([], pa.int64())})
    adj = (par[:-1] == par[1:]) & (vals[:-1] != "") & (vals[1:] != "")
    t = pa.table({"w1": pa.array(vals[:-1][adj], pa.string()),
                  "w2": pa.array(vals[1:][adj], pa.string())})
    g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return g.rename_columns(["w1", "w2", "partial_n"])


def bigram_perplexity(sf_dir: str, k_smooth: float = 0.5,
                      min_count: int = 1) -> "ray.data.Dataset":
    """Per-document bigram-LM perplexity — the conditional-probability
    companion to ``unigram_logprob`` (CCNet scores documents with a
    pretrained LM; here the LM is the corpus's own add-k-smoothed bigram
    model, the self-contained analog):

        P(w2|w1) = (c(w1,w2) + k) / (c(w1, ·) + k·V)

    with V = |distinct tokens appearing in any bigram| and c(w1, ·) the
    corpus count of w1 as a LEFT context.  Emits per doc (docs with < 2
    tokens have no bigrams and are omitted, like the SQL twin's join):
    n_pairs, avg_neg_logprob and ppl = exp(avg).  Low ppl = stereotyped
    text, high = token soup; curation filters both tails.

    Scale shape: ONE coarse (w1, w2)-keyed shuffle builds the pair table
    (per-batch combiner ``_bigram_pair_partial``); left-context totals
    and V derive from that table Arrow-side; the pair->micro-logp mapping
    broadcasts via ``ray.put`` and scoring is a pure map.  At 100 TB the
    broadcast is bounded by ``min_count`` pruning (a pruned pair backs
    off to the per-w1 smoothing floor, the second broadcast table); the
    default ``min_count=1`` keeps the test-scale model exact.

    Bit-parity with the SQL twin: each DISTINCT pair's -ln P is snapped
    to integer micro-units (half away from zero), per-doc sums are exact
    integer math, and the final ``exp`` runs through libm (``math.exp``)
    on both engines — numpy's SIMD exp can differ in the last ulp."""
    import math

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import lookup_np, make_lookup

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_pairs", pa.int64()),
                            ("avg_neg_logprob", pa.float64()),
                            ("ppl", pa.float64())])
    pairs = coarse_grouped_aggregate(
        _read_docs(sf_dir, ["text"]).map_batches(
            _bigram_pair_partial, batch_format="pyarrow"),
        ["w1", "w2"], [("partial_n", "sum", "n_pairs")],
        hash_cols=["w1", "w2"])
    # bounded driver pull: the DISTINCT-pair table (min_count prunes it at
    # scale; left totals/V are computed before pruning so the smoothing
    # denominators stay exact)
    tab = pa.concat_tables(
        [pa.table({"w1": pa.array([], pa.string()),
                   "w2": pa.array([], pa.string()),
                   "n_pairs": pa.array([], pa.int64())})]
        + list(pairs.iter_batches(batch_format="pyarrow")))
    if tab.num_rows == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    lc = tab.group_by("w1").aggregate([("n_pairs", "sum")]) \
            .rename_columns(["w1", "cw"])
    n_vocab = len(pc.unique(pa.chunked_array(
        [tab.column("w1").combine_chunks(),
         tab.column("w2").combine_chunks()])))
    kept = tab.filter(pc.greater_equal(tab.column("n_pairs"), min_count)) \
        if min_count > 1 else tab

    def micro_neg_ln(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        return pc.cast(pc.round(
            pc.multiply(pc.negate(pc.ln(pa.array(num / den))), 1_000_000.0),
            ndigits=0, round_mode="half_towards_infinity"),
            pa.int64()).to_numpy()

    cw_of = make_lookup(lc.column("w1"), lc.column("cw"))
    den_kept = lookup_np(kept.column("w1").combine_chunks(), cw_of) \
        .astype(np.float64) + k_smooth * n_vocab
    pair_keys = pc.binary_join_element_wise(
        kept.column("w1"), kept.column("w2"), "\x1f")
    pair_tab = make_lookup(pair_keys.combine_chunks(), micro_neg_ln(
        kept.column("n_pairs").to_numpy().astype(np.float64) + k_smooth,
        den_kept))
    # smoothing floor per left context (hit only for min_count-pruned
    # pairs): -ln(k / (cw + kV))
    floor_tab = make_lookup(lc.column("w1"), micro_neg_ln(
        np.full(lc.num_rows, k_smooth),
        lc.column("cw").to_numpy().astype(np.float64) + k_smooth * n_vocab))
    refs = ray.put((pair_tab, floor_tab))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        ptab, ftab = ray.get(refs)
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        arr = (split.combine_chunks()
               if isinstance(split, pa.ChunkedArray) else split)
        vals = pc.list_flatten(arr)
        par = pc.list_parent_indices(arr).to_numpy()
        if len(vals) < 2:
            return out_schema.empty_table()
        v_np = vals.to_numpy(zero_copy_only=False)
        adj = (par[:-1] == par[1:]) & (v_np[:-1] != "") & (v_np[1:] != "")
        if not adj.any():
            return out_schema.empty_table()
        w1 = vals.filter(pa.array(np.r_[adj, False]))
        w2 = vals.filter(pa.array(np.r_[False, adj]))
        keys = pc.binary_join_element_wise(w1, w2, "\x1f")
        denc = pc.dictionary_encode(keys)
        denc = (denc.combine_chunks()
                if isinstance(denc, pa.ChunkedArray) else denc)
        m_uniq = lookup_np(denc.dictionary, ptab, default=-1)
        miss = m_uniq < 0
        if miss.any():                      # min_count-pruned pairs
            u_w1 = pc.list_element(
                pc.split_pattern(denc.dictionary, "\x1f", max_splits=1), 0)
            m_uniq = np.where(
                miss,
                lookup_np(u_w1, ftab,
                          default=int(round(math.log(n_vocab) * 1e6))),
                m_uniq)
        m = m_uniq[denc.indices.to_numpy()].astype(np.int64)
        pd_ = par[:-1][adj]                  # doc index per pair
        starts = np.flatnonzero(np.r_[True, pd_[1:] != pd_[:-1]])
        msum = np.add.reduceat(m, starts)
        n = np.diff(np.r_[starts, len(pd_)]).astype(np.int64)
        avg = msum.astype(np.float64) / (n * 1_000_000.0)
        ppl = np.array([math.exp(a) for a in avg])
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(pd_[starts], pa.int64())),
            "n_pairs": pa.array(n, pa.int64()),
            "avg_neg_logprob": round6(pa.array(avg)),
            "ppl": round6(pa.array(ppl)),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


_BPE_EOW = "</w>"


def _bpe_learn(vocab: "dict[tuple, int]", num_merges: int) -> list:
    """Sennrich-style BPE merge learning over a word-frequency table:
    repeatedly merge the most frequent adjacent symbol pair (ties broken
    by lexicographically smallest (left, right) — deterministic).
    Returns [(rank, left, right, pair_freq), ...]."""
    merges = []
    for rank in range(num_merges):
        pairs: dict = {}
        for seq, f in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best_n = max(pairs.values())
        left, right = min(p for p, n in pairs.items() if n == best_n)
        merges.append((rank, left, right, best_n))
        merged = left + right
        out: dict = {}
        for seq, f in vocab.items():
            i, acc = 0, []
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(seq[i])
                    i += 1
            t = tuple(acc)
            out[t] = out.get(t, 0) + f
        vocab = out
    return merges


def _bpe_apply(word: str, ranks: dict) -> int:
    """Number of BPE pieces for one word under learned merge ranks —
    the standard greedy lowest-rank-first application."""
    seq = list(word) + [_BPE_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return len(seq)


def _trained_merges(sf_dir: str, num_merges: int, max_vocab: int) -> list:
    """ONE distributed wordcount shuffle -> bounded vocab pull -> the
    driver-side merge loop (the fastBPE/Sennrich shape: BPE trains on
    the word-FREQUENCY table, never the raw corpus — the loop's input
    is capped at ``max_vocab`` rows at any corpus scale)."""
    counts = _corpus_unigram_counts(sf_dir)
    top = pa.concat_tables(
        [pa.table({"term": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64())})]
        + list(counts.sort(["n", "term"], descending=[True, False])
               .limit(max_vocab).iter_batches(batch_format="pyarrow")))
    vocab = {tuple(t) + (_BPE_EOW,): n for t, n in
             zip(top.column("term").to_pylist(),
                 top.column("n").to_pylist())}
    return _bpe_learn(vocab, num_merges)


def bpe_train(sf_dir: str, num_merges: int = 32,
              max_vocab: int = 1 << 16) -> "ray.data.Dataset":
    """Learn a byte-pair-encoding merge table over the corpus (tokenizer
    training — the step every LLM data pipeline runs before packing).

    Scale shape: see ``_trained_merges`` — the corpus contributes one
    wordcount shuffle; the quadratic-ish merge loop runs over the capped
    word-frequency table only.  Iterative and therefore non-SQL (rows-only
    driver check); the merge semantics are pinned against a straight-line
    reference implementation in tests/test_bpe.py."""
    merges = _trained_merges(sf_dir, num_merges, max_vocab)
    return ray.data.from_arrow(pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_freq": pa.array([m[3] for m in merges], pa.int64()),
    }))


def bpe_encode(sf_dir: str, num_merges: int = 32,
               max_vocab: int = 1 << 16) -> "ray.data.Dataset":
    """Encode every document with the corpus-trained BPE merges and emit
    per-doc piece counts: (doc_id, n_tokens, n_bpe_tokens, pieces_per_tok
    = round6(n_bpe/n_tokens), NULL for token-less docs).

    Scale shape: the merge-rank dict broadcasts via ``ray.put``; each
    batch dictionary-encodes its words so the Python merge application
    runs once per DISTINCT word (vocab-bounded), then fans out by index
    gather + segmented sums — same pattern as ``unigram_logprob``."""
    ranks = {(m[1], m[2]): m[0]
             for m in _trained_merges(sf_dir, num_merges, max_vocab)}
    ref = ray.put(ranks)

    def encode(batch: pa.Table) -> pa.Table:
        rk = ray.get(ref)
        n_rows = batch.num_rows
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        arr = (split.combine_chunks()
               if isinstance(split, pa.ChunkedArray) else split)
        flat = pc.list_flatten(arr)
        par = pc.list_parent_indices(arr)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        n_tok = np.zeros(n_rows, dtype=np.int64)
        n_bpe = np.zeros(n_rows, dtype=np.int64)
        if len(flat):
            denc = pc.dictionary_encode(flat)
            denc = (denc.combine_chunks()
                    if isinstance(denc, pa.ChunkedArray) else denc)
            per_uniq = np.array([_bpe_apply(w, rk)
                                 for w in denc.dictionary.to_pylist()],
                                dtype=np.int64)
            p = par.to_numpy()
            np.add.at(n_tok, p, 1)
            np.add.at(n_bpe, p, per_uniq[denc.indices.to_numpy()])
        # snap on zero-filled lanes (round6 casts through int64 — NaN
        # would throw), then NULL out the token-less docs
        ratio = pc.if_else(
            pa.array(n_tok > 0),
            round6(pa.array(n_bpe / np.maximum(n_tok, 1))),
            pa.scalar(None, pa.float64()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "pieces_per_tok": ratio,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


def bigram_pmi(sf_dir: str, k: int = 20, min_count: int = 5) -> "ray.data.Dataset":
    """Top-k adjacent-token bigrams by pointwise mutual information —
    Mikolov-style phrase mining over the corpus:
    pmi = ln( (c_pair/total_pairs) / ((c_w1/total_toks)(c_w2/total_toks)) )
    for pairs with c_pair >= ``min_count``.

    Scale shape: per-batch bigram histograms (the combiner) feed ONE
    coarse shuffle keyed on the (w1, w2) pair; unigram counts come from
    the shared wordcount and only terms with count >= min_count are pulled
    (lossless: a pair at min_count implies both words at min_count), so
    the broadcast side is bounded by the frequent-term vocabulary; the
    min_count filter prunes the pair table before the final global
    sort+limit."""
    counts = _corpus_unigram_counts(sf_dir).materialize()
    total_uni = counts.sum("n") or 0
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "n_pairs": pa.array([], pa.int64()),
                      "pmi": pa.array([], pa.float64())})
    if total_uni == 0:
        return ray.data.from_arrow(empty)
    freq_batches = list(counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), min_count)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    # a filter-all pipeline can yield ZERO batches; seed with a typed empty
    freq = pa.concat_tables(
        [pa.table({"term": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64())})] + freq_batches)
    from ..functions.joins import make_lookup, lookup_np
    uref = ray.put(make_lookup(freq.column("term"), freq.column("n")))

    ds = _read_docs(sf_dir, ["text"])

    from ..functions.agg import coarse_grouped_aggregate
    pairs = coarse_grouped_aggregate(
        ds.map_batches(_bigram_pair_partial, batch_format="pyarrow"),
        ["w1", "w2"], [("partial_n", "sum", "n_pairs")],
        hash_cols=["w1", "w2"]).materialize()
    total_bg = pairs.sum("n_pairs") or 0
    if total_bg == 0:
        return ray.data.from_arrow(empty)

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater_equal(batch.column("n_pairs"), min_count))
        if batch.num_rows == 0:
            return empty
        ud = ray.get(uref)
        c1 = lookup_np(batch.column("w1"), ud).astype(np.float64)
        c2 = lookup_np(batch.column("w2"), ud).astype(np.float64)
        c = batch.column("n_pairs").to_numpy().astype(np.float64)
        pmi = np.log((c / total_bg)
                     / ((c1 / total_uni) * (c2 / total_uni)))
        return pa.table({"w1": batch.column("w1"),
                         "w2": batch.column("w2"),
                         "n_pairs": batch.column("n_pairs"),
                         "pmi": round6(pa.array(pmi))})

    return (pairs.map_batches(score, batch_format="pyarrow")
                 .sort(["pmi", "w1", "w2"], descending=[True, False, False])
                 .limit(k))


def hybrid_rrf_topk(sf_dir: str, k: int = 20,
                    rrf_k: int = 60) -> "ray.data.Dataset":
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    ranking (``bm25_topk``) and the dense cosine ranking (query vector 0
    of ``similarity.ann_topk``) — rrf = Σ 1/(rrf_k + rank), the standard
    score-free fusion for lexical+dense corpus slicing.

    Scale shape: both constituent rankings are already bounded top-k
    results (their own pipelines carry the distributed work — BM25's
    stats combiner, ANN's per-batch partial top-k); fusion itself touches
    ≤ 2k rows on the driver by construction.  Ranks are assigned over
    each constituent's OUTPUT ordering (score desc, id asc — on the
    emitted, rounding-snapped scores), so both engines rank the same
    values; the fused score is a two-term double sum in fixed order,
    round6."""
    from ..functions.num import round6  # noqa: F401 (same convention)
    from .similarity import ann_topk

    bm = sorted(((r["score"], r["doc_id"]) for r in
                 bm25_topk(sf_dir, k=k).take_all()),
                key=lambda t: (-t[0], t[1]))
    dn = sorted(((r["score"], r["neighbor_id"]) for r in
                 ann_topk(sf_dir).take_all() if r["query_id"] == 0),
                key=lambda t: (-t[0], t[1]))
    bm_rank = {d: i + 1 for i, (_, d) in enumerate(bm)}
    dn_rank = {d: i + 1 for i, (_, d) in enumerate(dn)}
    rows = []
    for d in set(bm_rank) | set(dn_rank):
        s = (1.0 / (rrf_k + bm_rank[d]) if d in bm_rank else 0.0) \
            + (1.0 / (rrf_k + dn_rank[d]) if d in dn_rank else 0.0)
        rows.append((d, bm_rank.get(d), dn_rank.get(d), round(s, 6)))
    rows.sort(key=lambda t: (-t[3], t[0]))
    rows = rows[:k]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "bm25_rank": pa.array([r[1] for r in rows], pa.int64()),
        "dense_rank": pa.array([r[2] for r in rows], pa.int64()),
        "rrf": pa.array([r[3] for r in rows], pa.float64()),
    }))


def top_terms(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Distributed wordcount with global top-k: per-batch term counting
    (the combiner — each block ships its term histogram, not its words),
    one groupby, then sort+limit over the pre-reduced term table."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow end-to-end: lower -> whitespace split -> flatten -> in-batch
        # group_by count (the combiner).  split_whitespace emits empty
        # tokens at string edges — filter them to match str.split().
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.utf8_lower(batch.column("text"))))
        toks = toks.filter(pc.not_equal(toks, ""))
        g = pa.table({"term": toks}).group_by("term") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["term", "partial_n"])

    from ..functions.agg import coarse_grouped_aggregate
    counts = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "term", [("partial_n", "sum", "n")])
    return counts.sort(["n", "term"], descending=[True, False]).limit(k)


_BM25_TERMS = ("data", "join", "stream")


def bm25_topk(sf_dir: str, terms: tuple = _BM25_TERMS, k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> "ray.data.Dataset":
    """BM25 lexical search: the top-``k`` documents for a bag-of-terms
    query, scored with Okapi BM25 — the classic retrieval ranking a
    training-data pipeline uses for benchmark decontamination lookups and
    quality-targeted corpus slicing (the lexical sibling of `ann_topk`).

    Scale shape: pass 1 reduces each batch to ONE stats row (doc count,
    token total, per-query-term document frequency — the per-batch
    combiner), finished by a scalar global aggregate (kilobytes; bounded
    by the query size, never the corpus).  The resulting IDF table and
    average doc length are plain floats closed over by pass 2, a pure
    scoring map with a per-batch partial top-k; the final sort+limit sees
    only ``blocks x k`` rows.  No corpus-sized shuffle anywhere.

    Bit-parity with the SQL twin: IDF and the average doc length are
    snapped to integer micro-units (half away from zero; one ln() call
    per term), each (doc, term) contribution is snapped to micro-units
    after an identically-associated double expression, and per-doc
    summation is exact integer math (`unigram_logprob` convention).
    Tie-break: score desc, doc_id asc."""
    import math

    terms = tuple(terms)
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_terms_hit": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})

    def _tokens(text):
        split = pc.utf8_split_whitespace(pc.utf8_lower(text))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        return flat.filter(keep), parent.filter(keep)

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        dl = pc.fill_null(pc.cast(_token_count(text), pa.int64()), 0)
        flat, parent = _tokens(text)
        par = parent.to_numpy(zero_copy_only=False)
        cols = {"n_docs": [batch.num_rows],
                "total_tokens": [int(pc.sum(dl).as_py() or 0)]}
        for i, t in enumerate(terms):
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            cols[f"df_{i}"] = [int(np.unique(par[eq]).size)]
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in cols.items()})

    tot = ds.map_batches(stats, batch_format="pyarrow").sum(
        ["n_docs", "total_tokens"] + [f"df_{i}" for i in range(len(terms))])
    if not tot:                              # zero-block input
        return ray.data.from_arrow(empty)
    n_docs = int(tot.get("sum(n_docs)") or 0)
    if n_docs == 0:                          # empty corpus
        return ray.data.from_arrow(empty)
    total_tokens = int(tot.get("sum(total_tokens)") or 0)
    nf = float(n_docs)
    # micro-int snaps, half away from zero (all values are positive, so
    # floor(x + 0.5) IS half-away; the SQL twin uses DuckDB round())
    avg_micro = math.floor((float(total_tokens) * 1e6) / nf + 0.5)
    avgdl = avg_micro / 1e6
    idf = []                                 # idf_micro/1e6 per term
    for i in range(len(terms)):
        df = float(int(tot.get(f"sum(df_{i})") or 0))
        if df == 0.0:                        # absent term: no tf rows anywhere
            idf.append(None)
            continue
        m = math.floor(math.log(1.0 + ((nf - df) + 0.5) / (df + 0.5))
                       * 1e6 + 0.5)
        idf.append(m / 1e6)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty
        text = batch.column("text")
        dl = (pc.fill_null(pc.cast(_token_count(text), pa.int64()), 0)
              .to_numpy(zero_copy_only=False).astype(np.float64))
        flat, parent = _tokens(text)
        par = parent.to_numpy(zero_copy_only=False)
        # SQL-identical association: tf + 1.2*((1.0-0.75) + 0.75*(dl/avgdl))
        den_base = k1 * ((1.0 - b) + b * (dl / avgdl))
        score_micro = np.zeros(n, dtype=np.int64)
        hits = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(terms):
            if idf[i] is None:
                continue
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(par[eq], minlength=n).astype(np.float64)
            m = tf > 0
            contrib = np.floor(
                idf[i] * ((tf[m] * (k1 + 1.0)) / (tf[m] + den_base[m]))
                * 1e6 + 0.5).astype(np.int64)
            score_micro[m] += contrib
            hits[m] += 1
        ids = (batch.column("doc_id").to_numpy(zero_copy_only=False)
               .astype(np.int64))
        sel = score_micro > 0
        ids, hits, sm = ids[sel], hits[sel], score_micro[sel]
        order = np.lexsort((ids, -sm))[:k]   # partial top-k, global tie-break
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_terms_hit": pa.array(hits[order], pa.int64()),
            "score": pa.array(sm[order].astype(np.float64) / 1e6,
                              pa.float64())})

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["score", "doc_id"], descending=[True, False])
              .limit(k))


def vocab_growth(sf_dir: str) -> "ray.data.Dataset":
    """Per-source vocabulary profile: total token occurrences, distinct
    terms, and the type-token ratio (Herdan/Heaps-law inputs — the
    vocabulary-diversity curation signal; a source whose TTR collapses is
    template/boilerplate-heavy).

    Scale shape (the tfidf_top_terms shuffle, minus scoring): per-batch
    (source, term) partial counts (combiner — shuffle volume bounded by
    sources x vocabulary, not corpus tokens) -> ONE coarse shuffle hashed
    on term, so each bucket owns its terms EXACTLY and can finish distinct
    counts per (source, term) without a second vocab-scale exchange ->
    per-bucket per-source partials -> a final sources-sized groupby.
    TTR is 6dp micro-int rounded for SQL bit-parity."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _coarse_of, _default_num_coarse

    ds = _read_docs(sf_dir, ["source", "text"])
    nc = _default_num_coarse()

    def partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
        toks = pc.list_flatten(split)
        src = pc.list_parent_indices(split)
        t = pa.table({"source": batch.column("source").take(src),
                      "term": toks}).filter(pc.not_equal(toks, ""))
        g = (t.group_by(["source", "term"]).aggregate([([], "count_all")])
              .rename_columns(["source", "term", "partial_c"]))
        coarse = _coarse_of(g.column("term"), nc)
        return g.append_column("__coarse", pa.array(coarse, pa.int64()))

    def bucket_partials(group: pa.Table) -> pa.Table:
        # finish (source, term) counts inside the bucket, then collapse to
        # one partial row per source: rows-per-source = distinct terms here
        tf = (group.select(["source", "term", "partial_c"])
                   .group_by(["source", "term"])
                   .aggregate([("partial_c", "sum")]))
        g = (tf.group_by("source")
               .aggregate([("partial_c_sum", "sum"), ([], "count_all")]))
        return g.rename_columns(["source", "tok_p", "term_p"])

    def finish(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(batch.column("n_tokens"), pa.int64())
        n_term = pc.cast(batch.column("n_terms"), pa.int64())
        ttr = round6(pc.divide(pc.cast(n_term, pa.float64()),
                               pc.cast(n_tok, pa.float64())))
        return pa.table({"source": batch.column("source"),
                         "n_tokens": n_tok, "n_terms": n_term,
                         "type_token_ratio": ttr})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(bucket_partials, batch_format="pyarrow")
              .groupby("source")
              .aggregate(Sum("tok_p", alias_name="n_tokens"),
                         Sum("term_p", alias_name="n_terms"))
              .map_batches(finish, batch_format="pyarrow"))


def doc_length_histogram(sf_dir: str,
                         bucket_tokens: int = 32) -> "ray.data.Dataset":
    """Corpus length histogram: documents bucketed by whitespace token
    count (``bucket = n_tokens // bucket_tokens``), per bucket — doc
    count, token sum, min/max token count.  The sequence-length planning
    input for packing/batching at training time.

    Pure partial-combine: each batch collapses to per-bucket partials with
    one Arrow group_by (shuffle volume = buckets x blocks), finished by a
    buckets-sized groupby.  NULL text counts as 0 tokens (bucket 0)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(_token_count(batch.column("text")), 0),
                    pa.int64())
        bucket = pc.floor(pc.divide(pc.cast(n, pa.float64()),
                                    float(bucket_tokens)))
        t = pa.table({"bucket": pc.cast(bucket, pa.int64()), "n": n})
        g = t.group_by("bucket").aggregate(
            [("n", "sum"), ("n", "min"), ("n", "max"), ([], "count_all")])
        return g.rename_columns(["bucket", "tok_p", "min_p", "max_p", "doc_p"])

    return (_read_docs(sf_dir, ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("doc_p", alias_name="n_docs"),
                       Sum("tok_p", alias_name="n_tokens"),
                       Min("min_p", alias_name="min_tokens"),
                       Max("max_p", alias_name="max_tokens")))


def top_terms_per_source(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Per-source top-k terms by frequency (the per-domain vocabulary
    fingerprint) — GROUPED top-k without sorting any source's full
    vocabulary in one place.

    Scale shape: the vocab_growth shuffle (per-batch (source, term)
    combiner -> ONE coarse shuffle hashed on term so each bucket owns its
    terms' complete counts) -> each bucket emits its own per-source top-k
    CANDIDATES (lossless: a global top-k term is top-k within the bucket
    that owns it) -> final per-source merge over k x buckets candidate
    rows (bounded, tiny).  Ties break (count desc, term asc) in both
    engines."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _coarse_of, _default_num_coarse

    ds = _read_docs(sf_dir, ["source", "text"])
    nc = _default_num_coarse()

    def partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
        toks = pc.list_flatten(split)
        src = pc.list_parent_indices(split)
        t = pa.table({"source": batch.column("source").take(src),
                      "term": toks}).filter(pc.not_equal(toks, ""))
        g = (t.group_by(["source", "term"]).aggregate([([], "count_all")])
              .rename_columns(["source", "term", "partial_c"]))
        coarse = _coarse_of(g.column("term"), nc)
        return g.append_column("__coarse", pa.array(coarse, pa.int64()))

    empty = pa.table({"source": pa.array([], pa.string()),
                      "term": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})

    def bucket_candidates(group: pa.Table) -> pa.Table:
        tf = (group.select(["source", "term", "partial_c"])
                   .group_by(["source", "term"])
                   .aggregate([("partial_c", "sum")])
                   .rename_columns(["source", "term", "c"]))
        tf = tf.take(pc.sort_indices(tf, sort_keys=[
            ("source", "ascending"), ("c", "descending"),
            ("term", "ascending")]))
        src = tf.column("source").to_pandas().to_numpy()
        if len(src) == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        keep_idx = np.concatenate([
            np.arange(s, s + min(int(n), k))
            for s, n in zip(starts, sizes)])
        return tf.take(pa.array(keep_idx, pa.int64()))

    def merge_topk(group: pa.Table) -> pa.Table:
        t = group.select(["source", "term", "c"])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("c", "descending"), ("term", "ascending")]))
        n = min(k, t.num_rows)
        t = t.slice(0, n)
        return t.append_column("rank", pa.array(
            np.arange(1, n + 1, dtype=np.int64), pa.int64()))

    cands = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("__coarse")
               .map_groups(bucket_candidates, batch_format="pyarrow")
               .map_batches(lambda b: b if b.num_rows else empty,
                            batch_format="pyarrow"))
    out = cands.groupby("source").map_groups(merge_topk,
                                             batch_format="pyarrow")
    empty_out = empty.append_column("rank", pa.array([], pa.int64()))
    return out.map_batches(lambda b: b if b.num_rows else empty_out,
                           batch_format="pyarrow")


def source_divergence(sf_dir: str) -> "ray.data.Dataset":
    """Per-source KL divergence of the source's unigram distribution from
    the corpus distribution — the dataset-card "how far does each slice
    skew" metric (high KL = jargon-heavy or templated slice; near 0 =
    indistinguishable from the mixture).  KL(p_s ‖ p) =
    Σ_t p_s(t)·ln(p_s(t)/p(t)).

    Scale shape: a first tiny pass broadcasts per-source token totals
    (#sources rows); then ONE term-coarse shuffle of per-batch
    (term, source, count) partials — each bucket owns its terms fully,
    so corpus term totals and every KL contribution are computed
    in-bucket and pre-reduced to (source, partial) rows; the final
    groupby is #sources-sized.  Bit-parity: each (term, source)
    contribution snaps to integer NANO-units (1e-9; contributions are
    tiny) with the identical double expression as the SQL twin, so the
    per-source sum is exact integer math."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ray.data.aggregate import Sum

    nc = _default_num_coarse()
    ds = _read_docs(sf_dir, ["text", "source"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        src = batch.column("source").take(parent)
        g = pa.table({"term": flat, "source": src}) \
            .group_by(["term", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "source", "c"])

    partials = ds.map_batches(tok_partial, batch_format="pyarrow")

    # pass 1: per-source token totals (bounded by #sources) from a cheap
    # count kernel over its own read — not a second execution of the
    # term-histogram pipeline
    def src_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({
            "source": batch.column("source"),
            "n": pc.cast(_token_count(batch.column("text")), pa.int64()),
        }).group_by("source").aggregate([("n", "sum")])
        return g.rename_columns(["source", "n"])

    totals = (_read_docs(sf_dir, ["text", "source"])
              .map_batches(src_partial, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("n", alias_name="n_tokens"))
              .to_pandas())
    empty = pa.table({"source": pa.array([], pa.string()),
                      "m": pa.array([], pa.int64())})
    if len(totals) == 0:
        return ray.data.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "kl": pa.array([], pa.float64())}))
    from ..functions.joins import make_lookup, lookup_np
    s_tok = make_lookup(totals["source"], totals["n_tokens"])
    t_total = float(totals["n_tokens"].sum())
    ref = ray.put(s_tok)

    def tag(batch: pa.Table) -> pa.Table:
        from .dedup import _string_coarse_hash
        coarse = _string_coarse_hash(
            batch.column("term").combine_chunks(), nc)
        return batch.append_column("__coarse", pa.array(coarse, pa.int64()))

    def bucket_kl(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        import pandas as pd
        st = ray.get(ref)
        ts = group.select(["term", "source", "c"]) \
            .group_by(["term", "source"]).aggregate([("c", "sum")]) \
            .to_pandas().rename(columns={"c_sum": "c"})
        ct = ts.groupby("term", sort=False)["c"].transform("sum") \
            .to_numpy(dtype=np.float64)
        c = ts["c"].to_numpy(dtype=np.float64)
        s = lookup_np(pa.array(ts["source"]), st).astype(np.float64)
        # the twin's exact operation order: (c/s) * ln((c/s) / (ct/t))
        ps = c / s
        contrib = ps * np.log(ps / (ct / t_total))
        m = pc.cast(pc.round(pa.array(contrib * 1e9), ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64())
        out = pa.table({"source": pa.array(ts["source"]), "m": m}) \
            .group_by("source").aggregate([("m", "sum")])
        return out.rename_columns(["source", "m"])

    agg = (partials.map_batches(tag, batch_format="pyarrow")
           .groupby("__coarse").map_groups(bucket_kl,
                                           batch_format="pyarrow")
           .groupby("source").aggregate(Sum("m", alias_name="m")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch.column("source"),
            "n_tokens": pa.array(
                lookup_np(batch.column("source"), s_tok).astype(np.int64),
                pa.int64()),
            "kl": pc.divide(pc.cast(batch.column("m"), pa.float64(),
                                    safe=False), 1e9),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def inverted_index(sf_dir: str, head_k: int = 8) -> "ray.data.Dataset":
    """Distributed inverted-index build: per term, document frequency,
    total term frequency, and the head of the posting list (first
    ``head_k`` doc_ids ascending, comma-joined) — the search-engine /
    BM25-serving artifact, bounded per row by ``head_k`` so no term's
    output grows with corpus size.

    Scale shape: docs never span batches, so per-batch (term, doc_id,
    tf) rows are already final partials; ONE term-coarse shuffle then
    owns each term fully per bucket, and a segmented numpy scan emits
    df / tf_total / head postings with no per-term dispatch (the
    segmented-arange gather caps each segment at ``head_k``)."""
    from ..functions.agg import _default_num_coarse

    nc = _default_num_coarse()
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def td_partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        doc = batch.column("doc_id").take(parent)
        g = pa.table({"term": flat, "doc_id": doc}) \
            .group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "doc_id", "tf"])

    def tag(batch: pa.Table) -> pa.Table:
        from .dedup import _string_coarse_hash
        coarse = _string_coarse_hash(
            batch.column("term").combine_chunks(), nc)
        return batch.append_column("__coarse", pa.array(coarse, pa.int64()))

    empty = pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "tf_total": pa.array([], pa.int64()),
                      "postings_head": pa.array([], pa.large_string())})

    def bucket_index(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[
            ("term", "ascending"), ("doc_id", "ascending")])
        g = group.take(idx)
        terms = g.column("term").combine_chunks()
        doc = g.column("doc_id").to_numpy()
        tf = g.column("tf").to_numpy()
        neq = pc.not_equal(terms.slice(1),
                           terms.slice(0, len(terms) - 1)).to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, neq])
        bounds = np.r_[starts, len(doc)].astype(np.int64)
        df = np.diff(bounds)
        tf_total = np.add.reduceat(tf, starts)
        # segmented arange capped at head_k: positions start..start+min(df,k)
        take_n = np.minimum(df, head_k)
        offs = np.r_[0, np.cumsum(take_n)].astype(np.int64)
        pos = (np.arange(int(offs[-1]), dtype=np.int64)
               - np.repeat(offs[:-1], take_n)
               + np.repeat(starts, take_n))
        head = pc.cast(pa.array(doc[pos], pa.int64()), pa.large_string())
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), head),
            pa.scalar(",", pa.large_string()))
        return pa.table({
            "term": terms.take(pa.array(starts, pa.int64())),
            "df": pa.array(df, pa.int64()),
            "tf_total": pa.array(tf_total.astype(np.int64), pa.int64()),
            "postings_head": joined,
        })

    return (ds.map_batches(td_partial, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket_index, batch_format="pyarrow"))


def zipf_slope(sf_dir: str, top_n: int = 500) -> "ray.data.Dataset":
    """Zipf power-law fit of the corpus rank-frequency curve: the least-
    squares slope of ln(freq) vs ln(rank) over the ``top_n`` most
    frequent terms (natural text sits near −1; templated/boilerplate
    corpora flatten, spam steepens) — the corpus-health statistic a
    dataset card plots.

    Scale shape: one wordcount shuffle (shared
    ``_corpus_unigram_counts``), a bounded ``top_n``-row driver pull
    (deterministic (count desc, term asc) ranks), then closed-form
    regression on micro-int ln values — all four regression sums are
    exact arbitrary-precision integers in the engine and HUGEINTs in
    the twin, so the single final division is bit-identical."""
    counts = _corpus_unigram_counts(sf_dir)
    top = counts.sort(["n", "term"], descending=[True, False]) \
        .limit(top_n).to_pandas()
    empty = pa.table({"zipf_slope": pa.array([], pa.float64()),
                      "n_terms": pa.array([], pa.int64())})
    n = len(top)
    if n == 0:
        return ray.data.from_arrow(empty)
    rank = np.arange(1, n + 1, dtype=np.float64)
    # half-away-from-zero micro snap (DuckDB round semantics; np.round is
    # half-to-even and could diverge on exact .5-micro boundaries)
    def _snap(v: np.ndarray) -> np.ndarray:
        return pc.round(pa.array(v * 1e6), ndigits=0,
                        round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()
    x = _snap(np.log(rank))
    y = _snap(np.log(top["n"].to_numpy(dtype=np.float64)))
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    num = n * sxy - sx * sy          # exact Python ints (no overflow)
    den = n * sxx - sx * sx
    from ..functions.num import round6_scalar
    slope = round6_scalar(float(num) / float(den)) if den else None
    return ray.data.from_arrow(pa.table({
        "zipf_slope": pa.array([slope], pa.float64()),
        "n_terms": pa.array([n], pa.int64())}))


def doc_byte_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Per-document byte-level Shannon entropy (bits/byte) — the
    compressibility quality signal (RefinedWeb-style): near-0 entropy =
    repeated filler, ~4.2 = typical English, ~6 = random-ish/encoded
    junk; curation filters both tails.

    Pure vectorized map, no shuffle: the batch's utf8 buffer flattens
    ONCE into a (doc, byte) histogram via a single ``np.bincount`` over
    ``doc_index*256 + byte`` (no per-row loop); entropy is a segmented
    numpy reduction over each doc's 256-bin slice.  Each bin's
    ``-p*log2(p)`` term snaps to a 6dp micro-int BEFORE the per-doc sum
    (the chi2_independence convention), so the reduction is an exact
    integer sum and the DuckDB twin (hex()-substr byte unnest + the same
    term tree) matches hash-exactly.  NULL/empty docs yield no row."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_bytes": pa.array([], pa.int64()),
                      "entropy_bits": pa.array([], pa.float64())})

    def ent(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        text = batch.column("text").combine_chunks()
        off_dtype = (np.int64 if pa.types.is_large_string(text.type)
                     else np.int32)
        off = np.frombuffer(text.buffers()[1], dtype=off_dtype,
                            count=len(text) + 1,
                            offset=text.offset * off_dtype().itemsize) \
            .astype(np.int64)
        data = np.frombuffer(text.buffers()[2], np.uint8)[
            int(off[0]):int(off[-1])]
        lens = np.diff(off)
        valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
        keep = valid & (lens > 0)
        if not keep.any():
            return empty
        # every buffer byte maps to its row (null rows may carry buffer
        # extent; their histogram rows are dropped by `keep` below, so
        # their bytes only ever land in their own discarded bin)
        doc_idx = np.repeat(np.arange(len(text), dtype=np.int64), lens)
        hist = np.bincount(doc_idx * 256 + data.astype(np.int64),
                           minlength=len(text) * 256) \
            .reshape(len(text), 256)[keep]
        n = hist.sum(axis=1, keepdims=True).astype(np.float64)
        p = hist / n
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = -np.where(p > 0, p * np.log2(p), 0.0)
        # 6dp micro-int term snap -> exact integer per-doc sum (order-
        # independent, and replayable by the SQL twin's BIGINT sum)
        ent_micro = np.floor(terms * 1e6 + 0.5).astype(np.int64).sum(axis=1)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(n.ravel().astype(np.int64), pa.int64()),
            "entropy_bits": pa.array(ent_micro / 1e6, pa.float64()),
        })

    return ds.map_batches(ent, batch_format="pyarrow")


def quality_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source quality calibration: doc count, exact mean quality, and
    the median quality (percentile_disc over the micro-int score) — the
    dataset-card table that shows which slices drag the corpus down.

    Scale shape: quality scores are 6dp micro-ints (bounded domain
    0..1e6), so each batch reduces to (source, q_micro, count) histogram
    partials and ONE shuffle delivers every source's full histogram to
    its kernel — mean is an exact integer ratio rounded once, median a
    cumulative walk; nothing row-sized moves."""
    ds = _read_docs(sf_dir, ["source", "text"])

    def hist(batch: pa.Table) -> pa.Table:
        q = quality_score(batch.column("text"))
        t = pa.table({
            "source": batch.column("source"),
            "q_micro": pc.cast(pc.round(
                pc.multiply(q, 1e6),
                round_mode="half_towards_infinity"), pa.int64()),
        })
        g = t.group_by(["source", "q_micro"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "q_micro", "partial_n"])

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("q_micro"))
        vals = group.column("q_micro").take(order).to_numpy()
        counts = group.column("partial_n").take(order).to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        med = int(vals[int(np.searchsorted(
            cum, int(np.ceil(0.5 * total))))])
        qsum = int((vals * counts).sum())
        mean = round6(pa.array([qsum / (total * 1e6)]))
        return pa.table({
            "source": pa.array([group.column("source")[0].as_py()],
                               pa.string()),
            "n_docs": pa.array([total], pa.int64()),
            "mean_quality": mean,
            "median_quality": pa.array([med / 1e6], pa.float64()),
        })

    return (ds.map_batches(hist, batch_format="pyarrow")
            .groupby("source").map_groups(kernel, batch_format="pyarrow"))


def doc_sentence_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc sentence statistics: sentence count (runs of [.!?]) and
    mean tokens per sentence — the Gopher-family format signals that
    catch list-like or run-on text.  Pure vectorized map: two RE2
    counts + one division, no shuffle.  Docs with no sentence
    terminator count one sentence when they have tokens (and mean =
    token count); token-less docs emit NULL mean."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        term_runs = pc.count_substring_regex(text, r"[.!?]+")
        toks = pc.cast(_token_count(text), pa.int64())
        n_sent = pc.cast(pc.if_else(
            pc.and_(pc.equal(term_runs, 0), pc.greater(toks, 0)),
            1, term_runs), pa.int64())
        # if_else evaluates both branches eagerly: divide by a CLAMPED
        # denominator (round6's int snap rejects the 0-division NaN),
        # then null out the n_sent == 0 rows
        safe = pc.cast(pc.max_element_wise(n_sent, 1), pa.float64())
        mean = pc.if_else(
            pc.greater(n_sent, 0),
            round6(pc.divide(pc.cast(toks, pa.float64()), safe)),
            pa.scalar(None, pa.float64()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": toks,
            "n_sentences": n_sent,
            "mean_sentence_tokens": mean,
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def term_frequency_spectrum(sf_dir: str) -> "ray.data.Dataset":
    """Vocabulary frequency-of-frequencies: how many distinct terms occur
    exactly k times — the Good-Turing smoothing input and the classic
    corpus-health spectrum (a healthy natural corpus has a heavy
    hapax-legomena head; dedup failures hollow it out).

    Scale shape: the shared wordcount shuffle produces (term, n); the
    spectrum is a per-batch count-of-counts partial plus a tiny rollup
    over the bounded frequency domain."""
    from ray.data.aggregate import Sum

    counts = _corpus_unigram_counts(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["n"]).group_by("n").aggregate([([], "count_all")])
        return g.rename_columns(["term_freq", "partial_n"])

    return (counts.map_batches(partial, batch_format="pyarrow")
            .groupby("term_freq")
            .aggregate(Sum("partial_n", alias_name="n_terms")))


def quality_quantile_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Within-source quantile normalization of the quality score — each
    doc's PERCENT_RANK among its source's scores (rank semantics: ties
    share the min rank, denominator n-1, single-doc sources pin 0.0) —
    the cross-source score calibration step before a global quality cut
    (raw scores are not comparable across sources with different length
    / punctuation profiles).

    Scale shape: the quality_percentile_filter histogram trade — scores
    are exact micro-ints, so the per-(source, qm) histogram is bounded
    by |sources| x 1e6 distinct values REGARDLESS of corpus size
    (coarse-shuffled, then one documented bounded driver pull); the
    assignment pass is a pure map doing a per-source searchsorted
    against the broadcast CDF.  Text is scanned exactly twice (score
    histogram + score emission), no per-doc shuffle rows."""
    from ..functions.agg import coarse_grouped_aggregate

    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def hist(batch: pa.Table) -> pa.Table:
        qm = pc.cast(pc.round(pc.multiply(
            quality_score(batch.column("text")), 1e6),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"source": batch.column("source"), "qm": qm})
        g = t.group_by(["source", "qm"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "qm", "pn"])

    h = coarse_grouped_aggregate(
        ds.map_batches(hist, batch_format="pyarrow"),
        ["source", "qm"], [("pn", "sum", "n")],
        hash_cols=["source", "qm"])
    seed = pa.table({"source": pa.array([], pa.string()),
                     "qm": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())})
    htab = pa.concat_tables(
        [seed] + list(h.iter_batches(batch_format="pyarrow")))
    cdf: dict = {}
    if htab.num_rows:
        idx = pc.sort_indices(htab, sort_keys=[
            ("source", "ascending"), ("qm", "ascending")])
        ht = htab.take(idx)
        src = np.asarray(ht.column("source").to_pylist(), dtype=object)
        qv = ht.column("qm").to_numpy()
        cnt = ht.column("n").to_numpy()
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        bounds = np.r_[starts, len(src)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            c = cnt[a:b]
            below = np.cumsum(np.r_[0, c[:-1]])     # exclusive prefix
            cdf[src[a]] = (qv[a:b], below, int(c.sum()))
    cdf_ref = ray.put(cdf)

    def assign(batch: pa.Table) -> pa.Table:
        table = ray.get(cdf_ref)
        q = quality_score(batch.column("text"))
        qm = pc.cast(pc.round(pc.multiply(q, 1e6),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        srcs = np.asarray(batch.column("source").to_pylist(),
                          dtype=object)
        pct = np.zeros(len(qm), dtype=np.float64)
        for s in set(srcs.tolist()):
            vals, below, n = table[s]
            m = srcs == s
            if n > 1:
                pos = np.searchsorted(vals, qm[m], side="left")
                pct[m] = below[pos] / (n - 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "quality": q,
            "pct_rank": round6(pa.array(pct, pa.float64()))})

    return ds.map_batches(assign, batch_format="pyarrow")


def unicode_script_profile(sf_dir: str) -> "ray.data.Dataset":
    """Character-class mix per source: fractions of ASCII letters, digits,
    whitespace, ASCII punctuation/other, and non-ASCII codepoints — the
    CCNet-style script signal that separates prose from code/markup and
    flags mojibake or wrong-language contamination per ingest source.

    The kernel never decodes: it classifies the raw UTF-8 buffer with
    numpy byte masks (a codepoint = one non-continuation byte; a
    non-ASCII codepoint = one lead byte >= 0xC0), so the per-batch cost
    is a handful of vectorized passes over the bytes.  Char counts equal
    DuckDB ``length()`` / regexp-class counts on valid UTF-8.
    Contract: NULL source/text rows drop in both engines; a source with
    zero total chars reports NULL fractions.

    Scale shape: per-batch byte-mask partials reduce per source inside
    the map, then ONE #sources-sized groupby; fractions are single
    double divisions in the finish map (round6)."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch.column("source")),
                                     pc.is_valid(batch.column("text"))))
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "docs": pa.array([], pa.int64()),
            "chars": pa.array([], pa.int64()),
            "letters": pa.array([], pa.int64()),
            "digits": pa.array([], pa.int64()),
            "spaces": pa.array([], pa.int64()),
            "asciis": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        off_dtype = (np.int64 if pa.types.is_large_string(txt.type)
                     else np.int32)
        n = len(txt)
        off = np.frombuffer(txt.buffers()[1], dtype=off_dtype,
                            count=n + 1,
                            offset=txt.offset * off_dtype().itemsize
                            ).astype(np.int64)
        # the data buffer can be absent when every kept string is empty
        data_buf = txt.buffers()[2]
        b = (np.frombuffer(data_buf, np.uint8) if data_buf is not None
             else np.zeros(0, np.uint8))

        def rowsum(ind: np.ndarray) -> np.ndarray:
            cs = np.r_[0, np.cumsum(ind, dtype=np.int64)]
            return cs[off[1:]] - cs[off[:-1]]

        is_char = (b & 0xC0) != 0x80          # one per codepoint
        is_ascii = b < 0x80
        letter = ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122))
        digit = (b >= 48) & (b <= 57)
        space = (b == 32) | (b == 9) | (b == 10) | (b == 13)
        t = pa.table({
            "source": batch.column("source"),
            "docs": pa.array(np.ones(n, np.int64)),
            "chars": pa.array(rowsum(is_char)),
            "letters": pa.array(rowsum(letter)),
            "digits": pa.array(rowsum(digit)),
            "spaces": pa.array(rowsum(space)),
            "asciis": pa.array(rowsum(is_ascii)),
        })
        g = t.group_by("source").aggregate(
            [(c, "sum") for c in ("docs", "chars", "letters", "digits",
                                  "spaces", "asciis")])
        return g.rename_columns(["source", "docs", "chars", "letters",
                                 "digits", "spaces", "asciis"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("docs", alias_name="n_docs"),
                      Sum("chars", alias_name="n_chars"),
                      Sum("letters", alias_name="s_letters"),
                      Sum("digits", alias_name="s_digits"),
                      Sum("spaces", alias_name="s_spaces"),
                      Sum("asciis", alias_name="s_asciis")))

    def finish(batch: pa.Table) -> pa.Table:
        chars = batch.column("n_chars").to_numpy().astype(np.int64)
        letters = batch.column("s_letters").to_numpy().astype(np.int64)
        digits = batch.column("s_digits").to_numpy().astype(np.int64)
        spaces = batch.column("s_spaces").to_numpy().astype(np.int64)
        asciis = batch.column("s_asciis").to_numpy().astype(np.int64)
        punct = asciis - letters - digits - spaces
        non_ascii = chars - asciis
        ok = chars > 0

        def frac(num: np.ndarray) -> pa.Array:
            with np.errstate(divide="ignore", invalid="ignore"):
                v = num.astype(np.float64) / chars
            return round6(pa.array(np.where(ok, v, np.nan), pa.float64(),
                                   mask=~ok))

        return pa.table({
            "source": batch.column("source"),
            "n_docs": batch.column("n_docs"),
            "n_chars": pa.array(chars, pa.int64()),
            "frac_letter": frac(letters),
            "frac_digit": frac(digits),
            "frac_space": frac(spaces),
            "frac_punct": frac(punct),
            "frac_non_ascii": frac(non_ascii),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def tokenizer_fertility(sf_dir: str) -> "ray.data.Dataset":
    """Tokenizer-budget fertility per source: how many BPE-style subword
    units, whitespace words, characters and bytes a source spends — and
    the ratios (subwords per word, bytes per subword, chars per word) a
    token-budget planner uses to convert corpus bytes into training
    tokens per mixture component.

    Token definitions are the shared contracts: whitespace words via
    ``_token_count`` (str.split semantics) and subword units via the
    BPE pre-tokenizer regex (letter runs | digit runs | single
    non-alnum), both vectorized RE2 kernels.  Counts are exact int64
    sums; each ratio is ONE double division (NULL denominator-zero),
    round6.  Contract: NULL source/text rows drop in both engines.

    Scale shape: per-batch per-source int partials inside the map, ONE
    #sources-sized groupby, divisions in the finish map."""
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    ds = _read_docs(sf_dir, ["source", "text"])

    empty = pa.table({
        "source": pa.array([], pa.string()),
        "docs": pa.array([], pa.int64()),
        "words": pa.array([], pa.int64()),
        "subwords": pa.array([], pa.int64()),
        "chars": pa.array([], pa.int64()),
        "bytes": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch.column("source")),
                                     pc.is_valid(batch.column("text"))))
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        t = pa.table({
            "source": batch.column("source"),
            "docs": pa.array(np.ones(batch.num_rows, np.int64)),
            "words": pc.cast(_token_count(text), pa.int64()),
            "subwords": pc.cast(pc.count_substring_regex(
                text, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), pa.int64()),
            "chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "bytes": pc.cast(pc.binary_length(text), pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [(c, "sum") for c in ("docs", "words", "subwords", "chars",
                                  "bytes")])
        return g.rename_columns(["source", "docs", "words", "subwords",
                                 "chars", "bytes"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("docs", alias_name="n_docs"),
                      Sum("words", alias_name="n_words"),
                      Sum("subwords", alias_name="n_subwords"),
                      Sum("chars", alias_name="n_chars"),
                      Sum("bytes", alias_name="n_bytes")))

    def finish(batch: pa.Table) -> pa.Table:
        def ratio(num_col: str, den_col: str) -> pa.Array:
            num = batch.column(num_col).to_numpy().astype(np.int64)
            den = batch.column(den_col).to_numpy().astype(np.int64)
            ok = den > 0
            with np.errstate(divide="ignore", invalid="ignore"):
                v = num.astype(np.float64) / den
            return round6(pa.array(np.where(ok, v, np.nan), pa.float64(),
                                   mask=~ok))

        return pa.table({
            "source": batch.column("source"),
            "n_docs": batch.column("n_docs"),
            "n_words": batch.column("n_words"),
            "n_subwords": batch.column("n_subwords"),
            "n_chars": batch.column("n_chars"),
            "n_bytes": batch.column("n_bytes"),
            "subwords_per_word": ratio("n_subwords", "n_words"),
            "bytes_per_subword": ratio("n_bytes", "n_subwords"),
            "chars_per_word": ratio("n_chars", "n_words"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def readability_scores(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc Flesch Reading Ease — the classic readability filter a
    curation pipeline runs alongside the Gopher heuristics (very low or
    very high scores flag machine-generated lists / legalese / gibberish).

    Contract (identical in the SQL twin): words = str.split() tokens;
    sentences = runs of [.!?], clamped to 1 when the doc has tokens but
    no terminator (doc_sentence_stats' convention); syllables = vowel
    RUNS ([aeiouyAEIOUY]+ — the standard cheap syllable proxy, counted
    over raw text since separators are non-vowels); flesch = round6(
    206.835 - 1.015*words/sentences - 84.6*syllables/words), NULL when
    the doc has no words.  NULL text propagates NULL through every
    column.

    Scale shape: a pure vectorized map (three RE2/split kernels + float
    arithmetic), no shuffle — embarrassingly parallel at any corpus
    size."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        words = pc.cast(_token_count(text), pa.int64())
        runs = pc.count_substring_regex(text, r"[.!?]+")
        sents = pc.cast(pc.if_else(
            pc.and_(pc.equal(runs, 0), pc.greater(words, 0)),
            1, runs), pa.int64())
        syll = pc.cast(
            pc.count_substring_regex(text, "[aeiouyAEIOUY]+"), pa.int64())
        # if_else evaluates both branches: divide by CLAMPED denominators,
        # then null out the words == 0 rows (doc_sentence_stats idiom)
        w_f = pc.cast(words, pa.float64())
        safe_s = pc.cast(pc.max_element_wise(sents, 1), pa.float64())
        safe_w = pc.max_element_wise(w_f, 1.0)
        raw = pc.subtract(
            pc.subtract(206.835, pc.multiply(1.015, pc.divide(w_f, safe_s))),
            pc.multiply(84.6, pc.divide(pc.cast(syll, pa.float64()), safe_w)))
        flesch = pc.if_else(pc.greater(words, 0), round6(raw),
                            pa.scalar(None, pa.float64()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": words,
            "n_sentences": sents,
            "n_syllables": syll,
            "flesch": flesch,
        })

    return ds.map_batches(score, batch_format="pyarrow")


def mojibake_report(sf_dir: str) -> "ray.data.Dataset":
    """Per-source encoding-damage audit (the ftfy-style QA pass): how many
    docs carry UTF-8-decoded-as-CP1252 artifacts ('Ã'/'Â' lead bytes,
    'â€¦'-family punctuation wrecks) or U+FFFD replacement characters,
    and the total artifact count — the table that catches a bad upstream
    transcode before it trains.

    Both engines run the SAME RE2 pattern (pyarrow and DuckDB both embed
    RE2), so parity is by construction.  NULL text counts as clean (0
    matches) but is still a row in n_docs.

    Scale shape: one vectorized regex count per batch, per-batch
    (source, partials) combine, ONE #sources-sized groupby."""
    from ray.data.aggregate import Sum

    pat = "(Ã.|Â.|â€|�)"
    ds = _read_docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        hits = pc.fill_null(pc.cast(pc.count_substring_regex(
            batch.column("text"), pat), pa.int64()), 0)
        t = pa.table({
            "source": batch.column("source"),
            "hits": hits,
            "flagged": pc.cast(pc.greater(hits, 0), pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [([], "count_all"), ("hits", "sum"), ("flagged", "sum")])
        return g.rename_columns(
            ["source", "partial_n", "partial_h", "partial_f"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("partial_n", alias_name="n_docs"),
                      Sum("partial_f", alias_name="n_flagged"),
                      Sum("partial_h", alias_name="n_artifacts")))
    return agg


def source_simpson_diversity(sf_dir: str) -> "ray.data.Dataset":
    """Per-source lexical diversity via Simpson's index: Σ(n_t/N)² over
    the source's term distribution (the probability two random tokens
    coincide) and its inverse (the "effective vocabulary" size) — the
    diversity pair that catches template-flooded or boilerplate-heavy
    sources which length/entropy stats miss.

    Exact parity: Simpson reduces to integer sufficient statistics —
    Σn_t², Σn_t, #terms — so both engines sum exact integers (HUGEINT in
    the twin; the Ray side's int64 Σn² bounds a single term at ~3·10⁹
    occurrences, documented headroom) and divide once.

    Scale shape: per-batch (source, term, count) combiners, ONE coarse
    hash(source, term) shuffle for exact counts, then a #sources-sized
    moment rollup — the shared wordcount shape."""
    from ray.data.aggregate import Sum

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6

    ds = _read_docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch.column("text"))
        toklists = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        lens = pc.fill_null(pc.list_value_length(toklists), 0) \
            .to_numpy(zero_copy_only=False)
        toks = pc.list_flatten(toklists)
        src = batch.column("source").take(pa.array(
            np.repeat(np.arange(batch.num_rows), lens), pa.int64()))
        t = pa.table({"source": src, "term": toks})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        g = t.group_by(["source", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "term", "partial_n"])

    counts = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "term"], [("partial_n", "sum", "n")])

    def moments(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.int64)
        t = pa.table({
            "source": batch.column("source"),
            "t_p": pa.array(np.ones(len(n), np.int64)),
            "s_p": pa.array(n, pa.int64()),
            "ss_p": pa.array(n * n, pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [("t_p", "sum"), ("s_p", "sum"), ("ss_p", "sum")])
        return g.rename_columns(["source", "t_p", "s_p", "ss_p"])

    agg = (counts.map_batches(moments, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("t_p", alias_name="n_terms"),
                      Sum("s_p", alias_name="n_tokens"),
                      Sum("ss_p", alias_name="ss")))

    def finish(batch: pa.Table) -> pa.Table:
        nf = batch.column("n_tokens").to_numpy().astype(np.float64)
        ss = batch.column("ss").to_numpy().astype(np.float64)
        return pa.table({
            "source": batch.column("source"),
            "n_terms": batch.column("n_terms").cast(pa.int64()),
            "n_tokens": batch.column("n_tokens").cast(pa.int64()),
            "simpson": round6(pa.array(ss / (nf * nf), pa.float64())),
            "inv_simpson": round6(pa.array((nf * nf) / ss, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def doc_length_outliers(sf_dir: str, k: float = 1.5) -> "ray.data.Dataset":
    """Per-source Tukey-fence length audit: quartiles of the character
    length distribution (percentile_disc over the bounded int domain),
    the IQR fences lo = q1 - 1.5·IQR / hi = q3 + 1.5·IQR, and how many
    docs fall outside — the robust length-outlier gate (truncated pages,
    concatenation blowups) that a mean/std rule misses on skewed
    corpora.  NULL text counts length 0 (a doc that exists but carries
    nothing is exactly what the fence should see).

    Exact parity: lengths are integers; quartiles use the
    percentile_disc rank convention (ceil(q·n), the repo standard);
    fences evaluate in exact double arithmetic from integer quartiles;
    outlier comparisons are against the same fence doubles.

    Scale shape: per-batch (source, len, count) histogram partials, ONE
    shuffle over the bounded (source x distinct-length) domain, per
    source a cumulative walk + a second pass over its own histogram
    rows — doc rows never move."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["text", "source"])

    def hist(batch: pa.Table) -> pa.Table:
        ln = pc.fill_null(pc.cast(pc.utf8_length(batch.column("text")),
                                  pa.int64()), 0)
        t = pa.table({"source": batch.column("source"), "len": ln})
        g = t.group_by(["source", "len"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "len", "partial_n"])

    agg = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby(["source", "len"])
           .aggregate(Sum("partial_n", alias_name="n")))

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("len"))
        vals = group.column("len").take(order).to_numpy()
        counts = group.column("n").take(order).to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        q1 = float(vals[int(np.searchsorted(
            cum, int(np.ceil(0.25 * total))))])
        q3 = float(vals[int(np.searchsorted(
            cum, int(np.ceil(0.75 * total))))])
        lo = q1 - k * (q3 - q1)
        hi = q3 + k * (q3 - q1)
        below = int(counts[vals < lo].sum())
        above = int(counts[vals > hi].sum())
        return pa.table({
            "source": pa.array([group.column("source")[0].as_py()],
                               pa.string()),
            "n_docs": pa.array([total], pa.int64()),
            "q1": pa.array([q1], pa.float64()),
            "q3": pa.array([q3], pa.float64()),
            "n_below": pa.array([below], pa.int64()),
            "n_above": pa.array([above], pa.int64()),
        })

    return agg.groupby("source").map_groups(kernel,
                                            batch_format="pyarrow")


def source_char_class_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per-source character-class mix: shares of alphabetic, digit,
    whitespace, punctuation-ish, and other codepoints — the one-glance
    fingerprint that separates prose, tables, code and binary-leak
    sources before any model-based scoring.  Classes are RE2 classes
    evaluated identically in both engines; "other" is the remainder, so
    the five shares sum to 1 by construction.

    Scale shape: four vectorized regex counts per batch, per-batch
    integer partials, ONE #sources-sized groupby; shares divide exact
    integer sums once."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")

        def cnt(pat):
            return pc.fill_null(pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()), 0)

        t = pa.table({
            "source": batch.column("source"),
            "n_chars": pc.fill_null(pc.cast(
                pc.utf8_length(text), pa.int64()), 0),
            "n_alpha": cnt("[a-zA-Z]"),
            "n_digit": cnt("[0-9]"),
            "n_space": cnt(r"\s"),
            "n_punct": cnt(r"[!-/:-@\[-`{-~]"),
        })
        g = t.group_by("source").aggregate(
            [("n_chars", "sum"), ("n_alpha", "sum"), ("n_digit", "sum"),
             ("n_space", "sum"), ("n_punct", "sum")])
        return g.rename_columns(
            ["source", "c_p", "a_p", "d_p", "s_p", "p_p"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("c_p", alias_name="n_chars"),
                      Sum("a_p", alias_name="a"),
                      Sum("d_p", alias_name="d"),
                      Sum("s_p", alias_name="s"),
                      Sum("p_p", alias_name="p")))

    from ..functions.num import round6

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("n_chars").to_numpy().astype(np.float64)
        safe = np.maximum(c, 1.0)
        a = batch.column("a").to_numpy().astype(np.float64)
        d = batch.column("d").to_numpy().astype(np.float64)
        s = batch.column("s").to_numpy().astype(np.float64)
        p = batch.column("p").to_numpy().astype(np.float64)
        other = c - a - d - s - p

        def share(x):
            return round6(pa.array(
                np.where(c > 0, x / safe, 0.0), pa.float64()))

        return pa.table({
            "source": batch.column("source"),
            "n_chars": batch.column("n_chars").cast(pa.int64()),
            "alpha_share": share(a),
            "digit_share": share(d),
            "space_share": share(s),
            "punct_share": share(p),
            "other_share": share(other),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
