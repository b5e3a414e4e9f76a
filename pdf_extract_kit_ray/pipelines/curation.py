"""Corpus-curation operators: PII scrubbing, repetition quality, dataset
splitting, source mixing, and JSON property extraction.

These are the remaining curation steps a 100 TB training-data pipeline runs
between raw ingestion and tokenization.  Every operator here is a pure
``map_batches`` pass or a partial-combine + one small ``groupby`` — no
all-to-all over row-sized data — and each has an exact DuckDB-SQL twin in
``__ray_entry__.oracle_sql`` (both engines run RE2 regexes and the same
micro-int rounding, so value hashes are bit-identical).

Determinism notes shared by the hash-based ops (`train_val_split`,
`source_mixture`): assignment is by md5 of the document id's DECIMAL STRING
(matching SQL ``md5(CAST(doc_id AS VARCHAR))``), so membership is a pure
function of the row — stable across runs, workers, block layouts, and
engine (no RNG state to synchronize, the property that makes hash-split the
standard over `random()` sampling at scale).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.joins import sized_read_parquet
from ..functions.num import round6

# RE2 patterns, identical strings on the Arrow and DuckDB sides (both
# engines are RE2, so alternation/word-boundary semantics agree).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def _read_docs(sf_dir: str, columns) -> "ray.data.Dataset":
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _md5_prefix2(ids: pa.ChunkedArray) -> list:
    """First two hex chars of md5(decimal-string id) per row — the split
    key.  md5 has no Arrow kernel; the per-row cost is one short-string
    hash (amortized ~100 ns/row), not a text-sized scan."""
    md5 = hashlib.md5
    return [md5(str(i).encode()).hexdigest()[:2] for i in ids.to_pylist()]


def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrub — emails, IPv4s, and US-style phone numbers counted and
    replaced with typed placeholder tokens, per document.

    Pure map, no shuffle: counts come from ``pc.count_substring_regex`` on
    the original text; the redacted text applies the three replacements in
    a fixed order (email -> ip -> phone) so both engines transform
    identically.  On a clean corpus this is a verified no-op (counts 0,
    text unchanged) — the planted-PII path is pinned by unit tests."""
    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        clean = pc.replace_substring_regex(text, PII_EMAIL, "[EMAIL]")
        clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
        clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_emails": pc.cast(
                pc.count_substring_regex(text, PII_EMAIL), pa.int64()),
            "n_ips": pc.cast(
                pc.count_substring_regex(text, PII_IP), pa.int64()),
            "n_phones": pc.cast(
                pc.count_substring_regex(text, PII_PHONE), pa.int64()),
            "clean_text": clean,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


def doc_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Repetition-based quality signal (the Gopher-style "fraction of the
    document that is its single most frequent token"): per doc —
    n_tokens, n_distinct, top_token_frac.

    Pure map: each batch splits on whitespace, counts (doc, token) pairs
    with ONE Arrow group_by, reduces to per-doc (sum, max, count) with a
    second — no Python loop, no shuffle (docs never span batches).  Docs
    with zero tokens are dropped (same as the SQL twin, where they have no
    token rows to group)."""
    def rep(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64()),
                          "top_token_frac": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        # split on RE2 '\s+' (ASCII whitespace), NOT utf8_split_whitespace
        # (Unicode whitespace): the oracle twin's string_split_regex is
        # RE2, and e.g. U+00A0 would tokenize differently otherwise
        split = pc.split_pattern_regex(batch.column("text"), r"\s+")
        toks = pc.list_flatten(split)
        idx = pc.list_parent_indices(split)
        t = pa.table({"idx": idx, "tok": toks}).filter(
            pc.not_equal(toks, ""))
        if t.num_rows == 0:
            return empty
        tc = t.group_by(["idx", "tok"]).aggregate([([], "count_all")]) \
            .rename_columns(["idx", "tok", "c"])
        agg = tc.group_by("idx").aggregate(
            [("c", "sum"), ("c", "max"), ("c", "count")]) \
            .rename_columns(["idx", "n_tokens", "top_c", "n_distinct"])
        frac = pc.divide(pc.cast(agg.column("top_c"), pa.float64(), safe=False),
                         pc.cast(agg.column("n_tokens"), pa.float64(), safe=False))
        return pa.table({
            "doc_id": batch.column("doc_id").take(agg.column("idx")),
            "n_tokens": pc.cast(agg.column("n_tokens"), pa.int64()),
            "n_distinct": pc.cast(agg.column("n_distinct"), pa.int64()),
            "top_token_frac": round6(frac),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rep, batch_format="pyarrow")


# 'val' iff the first two md5 hex chars sort below this string: '1a' = 26
# of 256 buckets ~ 10.2%.  Lexicographic compare of fixed-width lowercase
# hex == numeric compare, and works identically in SQL.
VAL_HEX_THRESHOLD = "1a"


def quality_weighted_sample(sf_dir: str) -> "ray.data.Dataset":
    """Quality-WEIGHTED deterministic sampling (the DCLM/DataComp-style
    curation step): each document is kept with probability equal to its
    quality score, decided by comparing the md5 hash fraction of its
    doc_id against the score — stable across runs/workers/cluster sizes,
    no RNG state, reproducible joins against the kept set.

    Pure map, no shuffle.  The hash-int comparison is bit-identical to
    the SQL twin's fixed-width hex-string comparison (threshold clamped
    to 2^32-1 so a quality of exactly 1.0 cannot produce a 9-hex-digit
    threshold that breaks lexicographic compare).  Emits (doc_id,
    quality) for kept docs."""
    import numpy as np

    from .text import quality_score

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def sample(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "quality": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        q = quality_score(batch.column("text"))
        thr = pc.cast(pc.min_element_wise(
            pc.floor(pc.multiply(q, 4294967296.0)), 4294967295.0),
            pa.int64()).to_numpy()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in batch.column("doc_id").to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        keep = pa.array(h < thr)
        return pa.table({"doc_id": batch.column("doc_id").filter(keep),
                         "quality": q.filter(keep)
                         if not isinstance(q, pa.ChunkedArray)
                         else q.combine_chunks().filter(keep)})

    return ds.map_batches(sample, batch_format="pyarrow")


def train_val_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic train/validation split by id-hash, rolled up to
    (split, n_docs, total_chars).  The per-batch combiner ships two rows
    per block; the groupby sums block partials."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        h2 = pa.array(_md5_prefix2(batch.column("doc_id")), pa.string())
        split = pc.if_else(pc.less(h2, VAL_HEX_THRESHOLD), "val", "train")
        t = pa.table({"split": split, "n_chars": batch.column("n_chars")})
        g = t.group_by("split").aggregate([([], "count_all"),
                                           ("n_chars", "sum")])
        return g.rename_columns(["split", "partial_docs", "partial_chars"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("split").aggregate(
            Sum("partial_docs", alias_name="n_docs"),
            Sum("partial_chars", alias_name="total_chars"))


# Per-source sampling rates for the mixture: heavy sources kept whole,
# mid-tier at 1/2, tail at 1/8 — thresholds again as 2-hex-char strings.
_MIX_FULL_BELOW = 4        # src0..src3: keep all
_MIX_HALF_BELOW = 12       # src4..src11: keep hash < '80' (128/256)
_MIX_HALF_HEX = "80"
_MIX_TAIL_HEX = "20"       # src12+: keep hash < '20' (32/256)


def source_mixture(sf_dir: str) -> "ray.data.Dataset":
    """Data-mixture downsampling: each source keeps a deterministic
    hash-fraction of its documents (1.0 / 0.5 / 0.125 by source tier),
    reported as (source, n_docs, n_kept).  The real pipeline would emit
    the kept rows; the rollup form keeps the oracle comparison small while
    exercising the same per-row membership predicate."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        num = pc.cast(pc.utf8_slice_codeunits(src, 3, 32), pa.int64())
        h2 = pa.array(_md5_prefix2(batch.column("doc_id")), pa.string())
        keep = pc.if_else(
            pc.less(num, _MIX_FULL_BELOW), pa.scalar(True),
            pc.if_else(pc.less(num, _MIX_HALF_BELOW),
                       pc.less(h2, _MIX_HALF_HEX),
                       pc.less(h2, _MIX_TAIL_HEX)))
        t = pa.table({"source": src,
                      "kept": pc.cast(keep, pa.int64())})
        g = t.group_by("source").aggregate([([], "count_all"),
                                            ("kept", "sum")])
        return g.rename_columns(["source", "partial_docs", "partial_kept"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("partial_docs", alias_name="n_docs"),
            Sum("partial_kept", alias_name="n_kept"))


def props_value_stats(sf_dir: str) -> "ray.data.Dataset":
    """JSON property extraction + rollup over the event stream: parse the
    integer ``k`` out of the ``props`` JSON string (vectorized
    ``pc.extract_regex`` — the fixed {"k": N} shape needs no tree parser)
    and aggregate per k: event count and the value total in exact
    micro-units (int64) so the parallel sum is order-insensitive — the
    float-sum twin would hash-differ run to run."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["props", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # \s* not a literal space: the twin's json_extract_string parses
        # real JSON, so the regex must accept any inter-token whitespace
        ext = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        micro = pc.cast(pc.round(pc.multiply(batch.column("value"), 1e6),
                                 ndigits=0,
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"k": k, "micro": micro})
        g = t.group_by("k").aggregate([([], "count_all"), ("micro", "sum")])
        return g.rename_columns(["k", "partial_n", "partial_micro"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(
            Sum("partial_n", alias_name="n_events"),
            Sum("partial_micro", alias_name="total_value_micro"))


def incremental_dedup(sf_dir: str, mask: int = 7) -> "ray.data.Dataset":
    """Incremental-ingest dedup: flag every NEW document whose content
    fingerprint already exists in the ESTABLISHED corpus — the shape every
    growing training corpus needs (dedup the day's shard against the
    index, not the whole corpus against itself).

    The established corpus here is the deterministic pseudo-subset
    ``doc_id % (mask+1) == 0`` (in production: the prior snapshot's
    fingerprint index).  Scale shape: the index is the SMALL side — built
    from a pushed-down parquet read, deduped, shipped once via
    ``ray.put`` (16 B/doc: 10^9 established docs ≈ 16 GB, the practical
    broadcast ceiling) — and the new shard streams through a pure map
    with a vectorized ``pc.is_in`` membership probe, NO shuffle.  Past
    the broadcast ceiling the same predicate runs as a hash-shuffle
    semi-join (the ``exact_dedup`` groupby shape).

    Output: (doc_id, fp, is_dup) for every NEW doc — is_dup marks a
    collision with the established index (the downstream ingest filter
    keeps ``NOT is_dup``; emitting the full flag column keeps the result
    schema-stable even on a collision-free corpus).
    """
    import pyarrow.dataset as pads
    import ray

    from .text import fingerprint_batch

    path = f"{sf_dir}/documents.parquet"
    # build the index STREAMING: fingerprint one record batch at a time
    # and keep only the fp set — never the established corpus's text —
    # so driver memory is bounded by the 16 B/doc index, not by 1/8 of
    # the corpus
    scanner = pads.dataset(path).scanner(
        columns=["text"],
        filter=pc.bit_wise_and(pads.field("doc_id"), mask) == 0)
    fp_chunks = [fingerprint_batch(pa.Table.from_batches([rb]))
                 for rb in scanner.to_batches() if rb.num_rows]
    # null fingerprints (null-text docs) never enter the index: a null can
    # match nothing, per the twin's COALESCE(fp IN (...), FALSE)
    base_fp = pc.drop_null(pc.unique(pa.chunked_array(fp_chunks))) \
        if fp_chunks else pa.array([], pa.string())
    fp_ref = ray.put(base_fp)

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def flag(batch: pa.Table) -> pa.Table:
        new = batch.filter(pc.not_equal(
            pc.bit_wise_and(batch.column("doc_id"), mask), 0))
        if new.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.string()),
                             "is_dup": pa.array([], pa.bool_())})
        fps = fingerprint_batch(new)
        hit = pc.fill_null(pc.and_kleene(
            pc.is_valid(fps), pc.is_in(fps, value_set=ray.get(fp_ref))),
            False)
        return pa.table({"doc_id": new.column("doc_id"),
                         "fp": fps,
                         "is_dup": hit})

    return ds.map_batches(flag, batch_format="pyarrow")


def sequence_pack(sf_dir: str, budget: int = 1024,
                  n_buckets: int = 1 << 12) -> "ray.data.Dataset":
    """Concat-and-chunk sequence packing — assign every document a GLOBAL
    token offset in doc_id order and derive which fixed-size training
    sequence (context window of ``budget`` tokens) it starts in:

        token_start = sum of n_tokens over all docs with smaller doc_id
        seq_id      = token_start // budget
        seq_off     = token_start %  budget

    the bookkeeping a "concatenate the corpus, split every N tokens"
    pre-training tokenizer run needs, computed WITHOUT concatenating
    anything.  The core is the two-phase distributed prefix scan
    (functions/scan.py): tokenize once into a materialized int-only table
    (16 B/row — the object store holds it, text is never re-read), pull
    O(n_buckets) bucket sums to the driver, broadcast exclusive prefixes,
    and cumsum inside each order-preserving bucket group.  One hash
    shuffle of int rows; no global sort.

    SQL twin: a SUM() OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING AND
    1 PRECEDING) window — hash-verified row-for-row.
    """
    import numpy as np

    from ..functions.scan import int_range_buckets, ordered_prefix_scan
    from .text import _token_count

    def tok(batch: pa.Table) -> pa.Table:
        # null text packs as 0 tokens (COALESCE in the SQL twin): the
        # global offset scan needs a number for every doc
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.fill_null(
                pc.cast(_token_count(batch.column("text")), pa.int64()), 0),
        })

    toks = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        tok, batch_format="pyarrow").materialize()

    # key-range bounds from a pruned single-column pass over the already-
    # materialized int table (no re-tokenization)
    from ray.data.aggregate import Max, Min
    bounds = toks.aggregate(Min("doc_id"), Max("doc_id"))
    if not bounds or bounds.get("min(doc_id)") is None:   # empty corpus
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "token_start": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64()),
            "seq_off": pa.array([], pa.int64())}))
    lo, hi = int(bounds["min(doc_id)"]), int(bounds["max(doc_id)"])

    scanned = ordered_prefix_scan(
        toks, ["doc_id"], int_range_buckets("doc_id", lo, hi, n_buckets),
        value_col="n_tokens", out_col="token_start")

    def pack(batch: pa.Table) -> pa.Table:
        ts = batch.column("token_start").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "token_start": batch.column("token_start"),
            "seq_id": pa.array(ts // budget, pa.int64()),
            "seq_off": pa.array(ts % budget, pa.int64()),
        })

    return scanned.map_batches(pack, batch_format="pyarrow")


def training_order(sf_dir: str, seed: str = "42") -> "ray.data.Dataset":
    """Deterministic seeded global shuffle for training order: every doc
    gets ``shuffle_key = md5(seed || '-' || doc_id)`` and its 0-based
    GLOBAL rank in (shuffle_key, doc_id) order — a reproducible
    random-looking permutation of the corpus that is a pure function of
    (seed, doc_id): stable across runs, workers, and block layouts, the
    property ``random_shuffle()`` cannot give.

    The rank is a count-scan on the shared distributed-prefix-scan
    primitive: buckets are the first 4 hex chars of the key (65,536
    order-preserving buckets), so the driver holds at most 64 Ki ints and
    the only exchange is one hash shuffle of (doc_id, 32-byte key) rows.
    A downstream epoch reader sorts or range-partitions by ``train_rank``.

    SQL twin: row_number() OVER (ORDER BY md5(...), doc_id) — hash-
    verified.
    """
    import hashlib

    from ..functions.scan import hex_prefix_buckets, ordered_prefix_scan

    md5 = hashlib.md5

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [md5(f"{seed}-{i}".encode()).hexdigest() for i in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "shuffle_key": pa.array(keys, pa.string())})

    keyed_ds = _read_docs(sf_dir, ["doc_id"]).map_batches(
        keyed, batch_format="pyarrow").materialize()

    return ordered_prefix_scan(
        keyed_ds, ["shuffle_key", "doc_id"],
        hex_prefix_buckets("shuffle_key", 4), out_col="train_rank")


def quality_percentile_filter(sf_dir: str, p: float = 0.9) -> "ray.data.Dataset":
    """Keep the top (1-p) quality tail of the corpus by GLOBAL percentile —
    "train on the best 10%" — without sorting anything: quality scores are
    exact micro-ints (the shared 6dp ``text.quality_score``), so the global
    percentile_disc threshold comes from a bounded-domain histogram
    (<= 1e6+1 distinct values regardless of corpus size) pulled once to the
    driver, and the keep-pass is a pure vectorized filter map.

    Scale shape: one pass computes (doc_id, q_micro) into a materialized
    int table (16 B/row — text is read exactly once); histogram partials
    combine per batch before the tiny groupby; no shuffle ever carries a
    per-doc row.  SQL twin: percentile_disc WITHIN GROUP — hash-exact."""
    import numpy as np

    from .text import quality_score

    def qm(batch: pa.Table) -> pa.Table:
        q = quality_score(batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "q_micro": pc.cast(pc.round(pc.multiply(q, 1000000.0)),
                               pa.int64()),
        })

    scored = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        qm, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        g = batch.select(["q_micro"]).group_by("q_micro") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["q_micro", "partial_n"])

    from ..functions.agg import coarse_grouped_aggregate
    counts = coarse_grouped_aggregate(
        scored.map_batches(hist, batch_format="pyarrow"),
        "q_micro", [("partial_n", "sum", "n")]).take_all()
    counts.sort(key=lambda r: r["q_micro"])
    vals = np.array([r["q_micro"] for r in counts], dtype=np.int64)
    cum = np.cumsum(np.array([r["n"] for r in counts], dtype=np.int64))
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return scored.map_batches(
            lambda b: pa.table({"doc_id": pa.array([], pa.int64()),
                                "quality": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    target = int(np.ceil(p * total))          # percentile_disc rank
    thr = int(vals[int(np.searchsorted(cum, target))])

    def keep(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.greater_equal(batch.column("q_micro"), thr))
        return pa.table({
            "doc_id": sel.column("doc_id"),
            "quality": pc.divide(pc.cast(sel.column("q_micro"),
                                         pa.float64()), 1000000.0),
        })

    return scored.map_batches(keep, batch_format="pyarrow")


def curate_corpus(docs: "ray.data.Dataset",
                  min_quality: float = 0.5) -> "ray.data.Dataset":
    """The end-to-end curation pipeline over a raw document table — the
    composition a training-data job runs before tokenization:

        quality filter -> exact dedup (keep lowest doc_id) -> PII redact

    emitting (doc_id, text [redacted], lang, source, quality, n_tokens).

    One pass computes quality + fingerprint and drops low-quality rows;
    ONE fingerprint shuffle performs keep-first dedup — coarse-bucketed
    (the _string_coarse_hash pattern) so group dispatch amortizes and the
    in-bucket winner scan is a vectorized sort + segment-head take, not
    per-group Python.  PII redaction and token counting run on the
    surviving rows only.  Unlike ``curated_docs`` (the SQL-twinned
    diagnostic projection), this keeps full text columns — it IS the
    writer's input."""
    from ..pipelines.dedup import _num_coarse, _string_coarse_hash
    from .text import _token_count, fingerprint_batch, quality_score

    num_coarse = _num_coarse(docs.count())

    def prep(batch: pa.Table) -> pa.Table:
        quality = quality_score(batch.column("text"))
        batch = batch.append_column("quality", quality).filter(
            pc.greater_equal(quality, min_quality))
        if batch.num_rows == 0:
            fp = pa.array([], pa.string())
        else:
            fp = fingerprint_batch(batch)
        coarse = _string_coarse_hash(fp, num_coarse) if len(fp) else []
        return (batch.append_column("fp", fp)
                     .append_column("coarse",
                                    pa.array(coarse, pa.int64())))

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("fp", "ascending"),
                                                ("doc_id", "ascending")])
        g = group.take(idx)
        fp = g.column("fp")
        if isinstance(fp, pa.ChunkedArray):
            fp = fp.combine_chunks()
        m = len(fp)
        import numpy as np
        head = np.r_[True, ~np.asarray(
            pc.equal(fp.slice(1), fp.slice(0, m - 1)))] if m > 1 \
            else np.array([True][:m])
        return g.filter(pa.array(head)).drop_columns(["coarse", "fp"])

    def finish(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        clean = pc.replace_substring_regex(text, PII_EMAIL, "[EMAIL]")
        clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
        clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": clean,
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "quality": batch.column("quality"),
            "n_tokens": pc.cast(_token_count(text), pa.int64()),
        })

    return (docs.map_batches(prep, batch_format="pyarrow")
                .groupby("coarse")
                .map_groups(keep_first, batch_format="pyarrow")
                .map_batches(finish, batch_format="pyarrow"))


# Gopher-style stopword list (a small English function-word vocabulary,
# per Rae et al. 2021 "Scaling Language Models: ... Gopher" §A.1.1's
# stop-word presence rule) — fixed here so engine and SQL twin share it.
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on",
                    "that", "with")
GOPHER_STOPWORD_RE = r"\b(" + "|".join(GOPHER_STOPWORDS) + r")\b"


def gopher_quality_flags(sf_dir: str, min_words: int = 50,
                         max_words: int = 100000,
                         min_mwl: float = 3.0, max_mwl: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         min_stop_hits: int = 2) -> "ray.data.Dataset":
    """Gopher-rule quality flags (Rae et al. 2021 §A.1.1): per document —
    word count, mean word length, symbol-to-word ratio, stopword hits, and
    the composite ``keep`` flag (word count in [50, 1e5], mean word length
    in [3, 10], symbol ratio < 0.1, >= 2 stopword hits).

    Pure vectorized map, no shuffle: counts are single
    ``pc.count_substring_regex`` passes (RE2 on both engines), ratios are
    computed on 6dp micro-ints (functions/num.round6) and COMPARED on the
    rounded values in both engines so the keep flag cannot diverge on a
    boundary document.  NULL text pins every count to 0, ratios to 0.0 and
    ``keep`` to FALSE (same contract as quality_score)."""
    from .text import _token_count

    def flags(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.cast(pc.fill_null(_token_count(text), 0), pa.int64())
        n_chars = pc.fill_null(pc.utf8_length(text), 0)
        n_ws = pc.fill_null(pc.count_substring_regex(text, r"\s"), 0)
        n_nonspace = pc.cast(pc.subtract(n_chars, n_ws), pa.float64())
        n_sym = pc.cast(pc.fill_null(
            pc.count_substring_regex(text, r"[^A-Za-z0-9\s]"), 0),
            pa.float64())
        n_stop = pc.cast(pc.fill_null(
            pc.count_substring_regex(pc.utf8_lower(text),
                                     GOPHER_STOPWORD_RE), 0), pa.int64())
        pos = pc.greater(n_words, 0)
        # guard the 0-word divide (if_else evaluates both branches; an
        # inf would poison round6's int64 cast)
        denom = pc.cast(pc.max_element_wise(n_words, 1), pa.float64())
        mwl = pc.if_else(pos, round6(pc.divide(n_nonspace, denom)),
                         pa.scalar(0.0))
        sym = pc.if_else(pos, round6(pc.divide(n_sym, denom)),
                         pa.scalar(0.0))
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(n_words, min_words),
                        pc.less_equal(n_words, max_words)),
                pc.and_(pc.greater_equal(mwl, min_mwl),
                        pc.less_equal(mwl, max_mwl))),
            pc.and_(pc.less(sym, max_symbol_ratio),
                    pc.greater_equal(n_stop, min_stop_hits)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": n_words,
            "mean_word_len": mwl,
            "symbol_ratio": sym,
            "n_stop_hits": n_stop,
            "keep": keep,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        flags, batch_format="pyarrow")


def uniform_sample(sf_dir: str, k: int = 200) -> "ray.data.Dataset":
    """Deterministic uniform-without-replacement sample of ``k`` docs by
    hash priority (bottom-k sampling): priority = md5 of the doc-id string,
    the k globally-smallest priorities win.  Equivalent to
    ``ORDER BY md5(id) LIMIT k`` but computed WITHOUT a global sort: each
    batch keeps only its own k smallest (a lossless candidate filter —
    the global bottom-k is a subset of every block's bottom-k), candidate
    volume is k x blocks, and one bounded final reduce takes the true
    bottom-k.  Bottom-k-by-hash is mergeable and union-consistent, which
    is what makes it THE distributed uniform-sampling shape (and gives
    consistent samples across corpus increments, unlike reservoirs)."""
    ds = _read_docs(sf_dir, ["doc_id"])

    def candidates(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        pri = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                        for i in ids.to_pylist()], pa.string())
        t = pa.table({"doc_id": ids, "priority": pri, "__g": pa.array(
            [0] * batch.num_rows, pa.int64())})
        order = pc.sort_indices(t, sort_keys=[("priority", "ascending"),
                                              ("doc_id", "ascending")])
        return t.take(order.slice(0, k))

    def bottom_k(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("priority", "ascending"), ("doc_id", "ascending")])
        g = group.take(order.slice(0, k))
        import numpy as np
        return pa.table({
            "doc_id": g.column("doc_id"),
            "priority": g.column("priority"),
            "sample_rank": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
        })

    return (ds.map_batches(candidates, batch_format="pyarrow")
              .groupby("__g")
              .map_groups(bottom_k, batch_format="pyarrow"))


def token_budget_mixture(sf_dir: str, budget: int = 800
                         ) -> "ray.data.Dataset":
    """Per-source token-budget subcorpus: within EACH source, documents are
    admitted in md5(doc_id) hash-priority order until the source's
    cumulative whitespace-token count reaches ``budget`` — the "sample N
    tokens per source" step that builds a training mixture from per-domain
    token quotas (vs ``source_mixture``'s per-doc rates).

    Scale shape: the per-source cumulative sum is ONE global
    ``ordered_prefix_scan`` over (source, hash, doc_id) order — per-source
    prefixes fall out by subtracting each source's exclusive global offset
    (computed from a tiny per-source total rollup, driver state =
    O(#sources)).  No per-source pass, no global sort; admission is a pure
    function of the row plus O(#sources) broadcast state, so membership is
    stable across block layouts and cluster sizes.  Null text counts 0
    tokens (admitted while under budget, consuming nothing), matching the
    SQL twin's COALESCE.  Scan buckets are 16 hash slots per source —
    widen the per-source hash prefix (h[:2], h[:3], ...) as corpus/bucket
    size grows so each phase-2 group stays worker-heap-sized."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.scan import ordered_prefix_scan
    from .text import _token_count

    read_cols = ["doc_id", "source", "text"]

    def tot_partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(_token_count(batch.column("text")), 0),
                    pa.int64())
        g = pa.table({"source": batch.column("source"), "n": n}) \
            .group_by("source").aggregate([("n", "sum")])
        return g.rename_columns(["source", "partial_t"])

    totals = (_read_docs(sf_dir, ["source", "text"])
              .map_batches(tot_partial, batch_format="pyarrow")
              .groupby("source")
              .aggregate(Sum("partial_t", alias_name="t"))
              .take_all())                  # bounded: one row per source
    totals.sort(key=lambda r: r["source"])
    src_idx = {r["source"]: i for i, r in enumerate(totals)}
    offsets = np.zeros(len(totals), dtype=np.int64)
    if len(totals) > 1:
        offsets[1:] = np.cumsum([r["t"] for r in totals])[:-1]

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "n_tok": pa.array([], pa.int64()),
                      "h": pa.array([], pa.string()),
                      "__hb": pa.array([], pa.int64())})

    md5 = hashlib.md5

    def enrich(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        hexes = [md5(str(i).encode()).hexdigest()
                 for i in batch.column("doc_id").to_pylist()]
        srcs = batch.column("source").to_pylist()
        hb = np.array([src_idx[s] * 16 + int(h[0], 16)
                       for s, h in zip(srcs, hexes)], dtype=np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_tok": pc.cast(pc.fill_null(
                _token_count(batch.column("text")), 0), pa.int64()),
            "h": pa.array(hexes, pa.string()),
            "__hb": pa.array(hb, pa.int64()),
        })

    enriched = _read_docs(sf_dir, read_cols).map_batches(
        enrich, batch_format="pyarrow")
    scanned = ordered_prefix_scan(
        enriched, ["source", "h", "doc_id"],
        lambda b: b.column("__hb").to_numpy(zero_copy_only=False),
        value_col="n_tok", out_col="__cum",
        max_buckets=max(16 * len(totals), 1))

    off_map = {r["source"]: int(offsets[i]) for i, r in enumerate(totals)}

    def admit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "n_tok": pa.array([], pa.int64()),
                             "toks_before": pa.array([], pa.int64())})
        srcs = batch.column("source").to_pylist()
        off = np.array([off_map[s] for s in srcs], dtype=np.int64)
        before = batch.column("__cum").to_numpy(zero_copy_only=False) - off
        keep = before < budget
        kept = batch.filter(pa.array(keep))
        return pa.table({
            "doc_id": kept.column("doc_id"),
            "source": kept.column("source"),
            "n_tok": kept.column("n_tok"),
            "toks_before": pa.array(before[keep], pa.int64()),
        })

    return scanned.map_batches(admit, batch_format="pyarrow")


def dsir_weights(sf_dir: str, target_source: str = "src0",
                 vocab_size: int = 1 << 17) -> "ray.data.Dataset":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how target-like its token distribution is, log w(doc) = Σ_tokens
    [ln p_target(tok) − ln p_raw(tok)], with add-one-smoothed bag-of-
    unigram models fit on the target slice (``source == target_source``)
    vs the rest of the corpus.  Downstream selection keeps the
    highest-weight docs (importance resampling); the weight itself is
    the deliverable here.  DSIR's hashed n-gram buckets are replaced by
    a capped exact vocabulary — same estimator, exact in both engines
    (the hash is an implementation device for bounded memory, which the
    vocab cap provides).

    Scale shape: ONE wordcount shuffle fits both models ((term,
    target_n, raw_n) conditional-count partials per batch -> coarse
    term-keyed Arrow aggregate); the top ``vocab_size`` terms broadcast
    once via ``ray.put``; scoring is a pure map (dictionary-encode the
    batch, one lookup per UNIQUE token, index gather + segmented integer
    sum per doc).  Bit-parity with the SQL twin: each term's log-ratio
    is snapped to integer micro-units before the per-doc sum, so float
    reassociation cannot flip a hash (the unigram_logprob discipline).

    Docs with no tokens (empty/whitespace/NULL text) yield no rows in
    both engines (SQL: no unnest rows survive the join)."""
    import numpy as np
    from ..functions.agg import coarse_grouped_aggregate

    ds = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        is_t = pc.fill_null(pc.equal(
            batch.column("source").take(parent), target_source), False)
        t = pa.table({"term": flat,
                      "t_n": pc.cast(is_t, pa.int64()),
                      "r_n": pc.cast(pc.invert(is_t), pa.int64())})
        g = t.group_by("term").aggregate([("t_n", "sum"), ("r_n", "sum")])
        return g.rename_columns(["term", "t_n", "r_n"])

    counts = coarse_grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        "term", [("t_n", "sum", "t_n"), ("r_n", "sum", "r_n")]) \
        .materialize()

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "logw": pa.array([], pa.float64())})
    n_vocab = counts.count()
    if n_vocab == 0:
        return ray.data.from_arrow(empty)
    t_total = counts.sum("t_n") or 0
    r_total = counts.sum("r_n") or 0
    # bounded driver pull: the model is vocab-capped BY DESIGN (DSIR's
    # hashed features bound it the same way); total-count-desc keeps the
    # most informative terms when the cap binds (never on test corpora)
    def total(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "tot", pc.add(batch.column("t_n"), batch.column("r_n")))
    vocab = (counts.map_batches(total, batch_format="pyarrow")
             .sort(["tot", "term"], descending=[True, False])
             .limit(vocab_size).to_pandas())
    # micro-int log-ratio per term, the identical double expression as
    # the twin: round((ln((t+1)/(T+V)) - ln((r+1)/(R+V))) * 1e6) half
    # away from zero
    tv = float(t_total + n_vocab)
    rv = float(r_total + n_vocab)
    lam = (np.log((vocab["t_n"].to_numpy() + 1.0) / tv)
           - np.log((vocab["r_n"].to_numpy() + 1.0) / rv))
    micro = pc.cast(pc.round(pa.array(lam * 1_000_000.0), ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64())
    from ..functions.joins import make_lookup, lookup_np
    mtab = make_lookup(vocab["term"], micro)
    m_oov = int(pc.round(
        pa.scalar((np.log(1.0 / tv) - np.log(1.0 / rv)) * 1e6),
        ndigits=0, round_mode="half_towards_infinity").as_py())
    ref = ray.put((mtab, m_oov))

    def score(batch: pa.Table) -> pa.Table:
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
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(par[starts], pa.int64())),
            "n_tokens": pa.array(n, pa.int64()),
            "logw": pa.array(msum.astype(np.float64) / 1_000_000.0),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def ngram_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style n-gram repetition signals (Rae 2021 §A.1.1): per doc,
    the fraction of word n-grams taken by the single most frequent one,
    for n = 2 and 3 (token-count fractions; Gopher's char-weighted
    variant is the same signal).  Filters on these catch boilerplate the
    top-token fraction misses ("click here click here ...").

    Pure map, no shuffle (docs never span batches): one RE2 split, the
    n-grams materialize as adjacent-slice joins over the flattened token
    array (separator chr(31); both engines build grams with the same
    separator, so even a pathological token containing it yields
    identical groups), and TWO Arrow group_bys per n reduce to per-doc
    (total, max).  Docs with fewer than 2 tokens yield no row; trigram
    columns are NULL for 2-token docs (SQL LEFT JOIN semantics)."""
    import numpy as np
    import pandas as pd

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_bigrams": pa.array([], pa.int64()),
        "top_bigram_frac": pa.array([], pa.float64()),
        "n_trigrams": pa.array([], pa.int64()),
        "top_trigram_frac": pa.array([], pa.float64()),
    })

    def _per_doc(pidx: pa.Array, grams: pa.Array) -> "pd.DataFrame":
        t = pa.table({"idx": pidx, "gram": grams})
        c = t.group_by(["idx", "gram"]).aggregate([([], "count_all")]) \
            .rename_columns(["idx", "gram", "c"])
        a = c.group_by("idx").aggregate([("c", "sum"), ("c", "max")]) \
            .rename_columns(["idx", "n", "m"])
        return a.to_pandas()

    def rep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        split = pc.split_pattern_regex(batch.column("text"), r"\s+")
        flat = pc.list_flatten(split).combine_chunks()
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        if len(flat) < 2:
            return empty
        par = parent.to_numpy()
        sep = pa.scalar("\x1f")
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        m2 = pa.array(same)
        g2 = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1).filter(m2),
            flat.slice(1).filter(m2), sep)
        a2 = _per_doc(pa.array(par[:-1][same], pa.int64()), g2)

        tri = same[1:] & same[:-1]
        if tri.any():
            m3 = pa.array(tri)
            g3 = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 2).filter(m3),
                flat.slice(1, len(flat) - 2).filter(m3),
                flat.slice(2).filter(m3), sep)
            a3 = _per_doc(pa.array(par[:-2][tri], pa.int64()), g3)
        else:
            a3 = pd.DataFrame({"idx": [], "n": [], "m": []})
        out = a2.merge(a3, on="idx", how="left", suffixes=("2", "3"))
        frac2 = round6(pa.array(out["m2"].to_numpy(dtype=np.float64)
                                / out["n2"].to_numpy(dtype=np.float64)))
        n3 = out["n3"].to_numpy(dtype=np.float64)     # NaN where absent
        # from_pandas=True turns the NaNs of trigram-less docs into NULLs
        # (SQL LEFT JOIN semantics); round6(NULL) stays NULL
        frac3 = round6(pa.array(
            out["m3"].to_numpy(dtype=np.float64) / n3, from_pandas=True))
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(out["idx"].to_numpy(dtype=np.int64), pa.int64())),
            "n_bigrams": pa.array(out["n2"].to_numpy(dtype=np.int64),
                                  pa.int64()),
            "top_bigram_frac": frac2,
            "n_trigrams": pa.array(n3, from_pandas=True).cast(pa.int64()),
            "top_trigram_frac": frac3,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rep, batch_format="pyarrow")


def epoch_plan(sf_dir: str) -> "ray.data.Dataset":
    """Per-source epoch/repeat plan for mixture UP-sampling (the
    LLaMA-style "how many passes over each slice" table, complementing
    ``token_budget_mixture``'s down-sampling): bring every source up to
    token parity with the largest source.  repeat = T_max / n_tokens
    splits into ``n_epochs`` full passes (integer division) plus a
    fractional pass sampled with probability ``frac_keep`` (exact
    remainder ratio, 6dp in both engines).

    Scale shape: per-batch (source, docs, tokens) partials -> one
    #sources-sized groupby -> pure arithmetic finish on the rollup (the
    driver never sees row-level data; T_max is a window max over the
    #sources rollup in both engines)."""
    import numpy as np
    from ray.data.aggregate import Sum
    from .text import _token_count

    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        # null text counts 0 tokens (pinned; SQL coalesce(sum(...), 0))
        t = pa.table({
            "source": batch.column("source"),
            "n_tok": pc.fill_null(pc.cast(
                _token_count(batch.column("text")), pa.int64()), 0),
        })
        g = t.group_by("source").aggregate([([], "count_all"),
                                            ("n_tok", "sum")])
        return g.rename_columns(["source", "n_docs", "n_tokens"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens")))

    def finish(batch: pa.Table) -> pa.Table:
        # the rollup is #sources-sized; a single batch at any corpus size
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        t_max = int(tok.max()) if len(tok) else 0
        n_epochs = np.where(tok > 0, t_max // np.maximum(tok, 1), 0)
        rem = np.where(tok > 0, t_max % np.maximum(tok, 1), 0)
        frac = round6(pa.array(np.where(
            tok > 0, rem / np.maximum(tok, 1).astype(np.float64), 0.0)))
        return pa.table({
            "source": batch.column("source"),
            "n_docs": batch.column("n_docs"),
            "n_tokens": batch.column("n_tokens"),
            "n_epochs": pa.array(n_epochs.astype(np.int64), pa.int64()),
            "frac_keep": frac,
        })

    # repartition(1): the finish map needs T_max across ALL sources in
    # one batch; the rollup is #sources rows, so this is a no-op at scale
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def curation_funnel(sf_dir: str, min_quality: float = 0.5) -> "ray.data.Dataset":
    """Curation-funnel attrition report: how many docs survive each stage
    of the canonical curation composition — raw -> quality filter ->
    exact dedup (keep-first among quality passers) -> PII-clean — the
    dataset-card table that justifies a corpus release ("we started with
    N, kept M").

    Scale shape: ONE pass computes quality, fingerprint, and PII flags
    per batch; the only shuffle is the fingerprint-coarse winner
    decision among quality passers (exact_dedup's shape, carrying a
    packed (doc_id, pii) int so the winner's PII flag survives the
    native Min); stage counts are partial-combined sums.  The stage
    definitions reuse text.quality_score and the shared PII regexes so
    this report can never drift from curated_docs / pii_redact."""
    import numpy as np
    from ..functions.agg import coarse_grouped_aggregate
    from ray.data.aggregate import Sum
    from .text import fingerprint_batch, quality_score

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        q = quality_score(text)
        pii = pc.fill_null(pc.greater(pc.add(pc.add(
            pc.count_substring_regex(text, PII_EMAIL),
            pc.count_substring_regex(text, PII_IP)),
            pc.count_substring_regex(text, PII_PHONE)), 0), False)
        kept = batch.append_column("pii", pc.cast(pii, pa.int64())) \
            .filter(pc.greater_equal(q, min_quality))
        # pack (doc_id, pii) so the fp-group Min keeps the winner's flag
        pack = pc.add(pc.multiply(kept.column("doc_id"), 2),
                      kept.column("pii"))
        t = pa.table({"fp": fingerprint_batch(kept), "pack": pack})
        return t.group_by("fp").aggregate([("pack", "min")]) \
            .rename_columns(["fp", "pack"])

    # counts ride a separate cheap pass (pure map over the same read)
    def count_partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        q = quality_score(text)
        return pa.table({
            "n_raw": pa.array([batch.num_rows], pa.int64()),
            "n_quality": pa.array(
                [pc.sum(pc.cast(pc.greater_equal(q, min_quality),
                                pa.int64())).as_py() or 0], pa.int64())})

    totals = (ds.map_batches(count_partial, batch_format="pyarrow")
              .aggregate(Sum("n_raw", alias_name="n_raw"),
                         Sum("n_quality", alias_name="n_quality")))

    winners = coarse_grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        "fp", [("pack", "min", "pack")])

    def winner_partial(batch: pa.Table) -> pa.Table:
        pii = pc.bit_wise_and(batch.column("pack"), 1)
        return pa.table({
            "n_dedup": pa.array([batch.num_rows], pa.int64()),
            "n_clean": pa.array([
                batch.num_rows - (pc.sum(pii).as_py() or 0)], pa.int64())})

    wtotals = (winners.map_batches(winner_partial, batch_format="pyarrow")
               .aggregate(Sum("n_dedup", alias_name="n_dedup"),
                          Sum("n_clean", alias_name="n_clean")))

    stages = ["raw", "quality_pass", "dedup_kept", "pii_clean"]
    counts = [totals["n_raw"] or 0, totals["n_quality"] or 0,
              wtotals["n_dedup"] or 0, wtotals["n_clean"] or 0]
    return ray.data.from_arrow(pa.table({
        "stage": pa.array(stages, pa.string()),
        "n_docs": pa.array(counts, pa.int64()),
        "stage_idx": pa.array(range(4), pa.int64()),
    }))


def filter_report(sf_dir: str, min_quality: float = 0.5,
                  min_tokens: int = 5,
                  max_top_frac: float = 0.3) -> "ray.data.Dataset":
    """Composite filter decision with per-reason audit flags — the final
    keep/drop gate a corpus release runs, emitting WHY each document
    fell (the auditability requirement behind every dataset card):
    fail_quality (< min_quality), fail_short (< min_tokens whitespace
    tokens), fail_repeat (top-token fraction > max_top_frac), fail_pii
    (any email/IP/phone), and the composite ``keep``.

    Pure vectorized map, no shuffle; every flag reuses THE shared
    definition (text.quality_score, the doc_repetition token grouping,
    the pii_redact regexes) so this report cannot drift from the
    operators it summarizes.  NULL text: quality 0 -> fail_quality,
    token count 0 -> fail_short, never fail_pii (no match on NULL)."""
    import numpy as np
    from .text import quality_score

    def report(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        q = quality_score(text)
        fail_quality = pc.less(q, min_quality)
        # RE2 split (the doc_repetition tokenization contract)
        split = pc.split_pattern_regex(text, r"\s+")
        toks = pc.list_flatten(split)
        idx = pc.list_parent_indices(split)
        keepm = pc.not_equal(toks, "")
        t = pa.table({"idx": idx.filter(keepm), "tok": toks.filter(keepm)})
        n_tok = np.zeros(batch.num_rows, np.int64)
        top_c = np.zeros(batch.num_rows, np.int64)
        if t.num_rows:
            tc = t.group_by(["idx", "tok"]).aggregate([([], "count_all")]) \
                .rename_columns(["idx", "tok", "c"])
            agg = tc.group_by("idx").aggregate(
                [("c", "sum"), ("c", "max")]) \
                .rename_columns(["idx", "n", "m"])
            ii = agg.column("idx").to_numpy()
            n_tok[ii] = agg.column("n").to_numpy()
            top_c[ii] = agg.column("m").to_numpy()
        fail_short = pa.array(n_tok < min_tokens)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(n_tok > 0, top_c / np.maximum(n_tok, 1), 0.0)
        fail_repeat = pa.array(frac > max_top_frac)
        fail_pii = pc.fill_null(pc.greater(pc.add(pc.add(
            pc.count_substring_regex(text, PII_EMAIL),
            pc.count_substring_regex(text, PII_IP)),
            pc.count_substring_regex(text, PII_PHONE)), 0), False)
        fq = pc.fill_null(fail_quality, True)
        keep = pc.and_(pc.and_(pc.invert(fq), pc.invert(fail_short)),
                       pc.and_(pc.invert(fail_repeat),
                               pc.invert(fail_pii)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fail_quality": fq,
            "fail_short": fail_short,
            "fail_repeat": fail_repeat,
            "fail_pii": fail_pii,
            "keep": keep,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        report, batch_format="pyarrow")


def bloom_incremental_dedup(sf_dir: str, mask: int = 7,
                            m_bits: int = 1 << 20,
                            k_hashes: int = 4) -> "ray.data.Dataset":
    """Incremental dedup with a BLOOM index instead of the exact
    fingerprint set — the shape past ``incremental_dedup``'s broadcast
    ceiling (the bitmap is m/8 bytes REGARDLESS of corpus size: a 10^9-doc
    index at 1% FP is ~1.2 GB vs 16 GB of raw fingerprints).  The
    established corpus's bitmap builds as a mergeable ``AggregateFnV2``
    (per-block bitmaps OR-combine in the aggregation tree — no driver
    merge loop), broadcasts once, and the new shard streams through a
    pure probe map.

    Contract: NO false negatives (every true duplicate flags
    ``maybe_dup``); false positives at the documented (1-e^{-kn/m})^k
    rate — downstream either re-verifies flagged docs against the exact
    index (a candidate-sized lookup) or accepts the over-drop.  Null-text
    docs never flag (null fingerprints enter neither build nor probe).
    Output: (doc_id, maybe_dup) for every NEW doc."""
    import numpy as np
    import ray
    from ..functions.sketches import bloom_probe, make_bloom_aggregator
    from .text import fingerprint_batch

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def established_fps(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"), mask), 0)
        return pa.table({"fp": pc.drop_null(
            fingerprint_batch(batch.filter(keep)))})

    agg = (ds.map_batches(established_fps, batch_format="pyarrow")
           .aggregate(make_bloom_aggregator("fp", m_bits=m_bits,
                                            k=k_hashes, name="bloom")))
    bitmap = (agg or {}).get("bloom") or bytes(m_bits // 8)
    bm_ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(pc.bit_wise_and(batch.column("doc_id"), mask), 0)
        new = batch.filter(keep)
        fp = fingerprint_batch(new)
        valid = pc.is_valid(fp)
        hits = np.zeros(new.num_rows, bool)
        fpv = fp.filter(valid)
        if len(fpv):
            hits[valid.to_numpy(zero_copy_only=False)] = bloom_probe(
                ray.get(bm_ref), fpv, m_bits, k_hashes)
        return pa.table({"doc_id": new.column("doc_id"),
                         "maybe_dup": pa.array(hits)})

    return ds.map_batches(probe, batch_format="pyarrow")


URL_RE = r"https?://[^\s]+|www\.[^\s]+"


def url_density(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc URL counts and density (URLs per 100 tokens) — the
    link-farm / navigation-page signal web curation filters on.  Pure
    vectorized RE2 map, no shuffle; a no-op on the synthetic corpus
    (zero URLs) exactly like the PII scrubber, with the planted path
    pinned by unit tests.  Token-less docs emit NULL density."""
    from .text import _token_count

    def density(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_urls = pc.cast(pc.count_substring_regex(text, URL_RE), pa.int64())
        toks = pc.cast(_token_count(text), pa.int64())
        safe = pc.cast(pc.max_element_wise(toks, 1), pa.float64())
        dens = pc.if_else(
            pc.greater(toks, 0),
            round6(pc.multiply(pc.divide(
                pc.cast(n_urls, pa.float64()), safe), 100.0)),
            pa.scalar(None, pa.float64()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_urls": n_urls,
            "n_tokens": toks,
            "urls_per_100_tokens": dens,
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        density, batch_format="pyarrow")


# registrable-domain extraction from a matched URL: scheme and a single
# leading "www." stripped, host ends at / : ? # or whitespace.  RE2 in
# both engines (Arrow and DuckDB), so the twins match byte-for-byte.
_DOMAIN_RE = r"^(?:https?://)?(?:www\.)?(?P<dom>[^/:?#\s]+)"

# deterministic default blocklist for the sandbox corpora (real
# deployments broadcast UT1-style lists of millions of domains through
# the same ray.put path — the lookup is an Arrow index_in probe either way)
DEFAULT_BLOCKLIST = ("spam.example", "ads.example", "tracker.test")


def _doc_domains(text: "pa.ChunkedArray") -> tuple:
    """Every URL occurrence's (lowercased registrable domain, parent row
    index) — fully vectorized.  Arrow has no findall kernel, so matches
    are recovered by wrapping each one in a \\x1e sentinel (RE2 backref
    replace), splitting on the sentinel, and keeping the segments that ARE
    a whole match.  Sentinel contract: \\x1e (ASCII record separator) must
    not appear in the text — true of any real corpus; a hostile document
    could only split its own URLs, never leak another row's."""
    marked = pc.replace_substring_regex(text, f"({URL_RE})", "\x1e\\1\x1e")
    parts = pc.split_pattern(marked, "\x1e")
    flat = pc.list_flatten(parts)
    par = pc.list_parent_indices(parts)
    is_url = pc.match_substring_regex(flat, f"^(?:{URL_RE})$")
    urls, par = flat.filter(is_url), par.filter(is_url)
    dom = pc.utf8_lower(pc.struct_field(
        pc.extract_regex(urls, _DOMAIN_RE), "dom"))
    return dom, par


def domain_counts(sf_dir: str) -> "ray.data.Dataset":
    """Per-domain URL and document counts across the corpus — the
    link-graph rollup web curation ranks and blocklists from.

    Scale shape: per-batch domain histograms (URL count + distinct-doc
    count, exact because a document row lives in exactly one batch) feed
    ONE domain-keyed coarse shuffle.  Zero rows on the clean synthetic
    corpus (exact twin either way); the planted-URL path is unit-tested."""
    from ..functions.agg import coarse_grouped_aggregate
    from .text import _read_docs as _read

    def partial(batch: pa.Table) -> pa.Table:
        dom, par = _doc_domains(batch.column("text"))
        t = pa.table({"domain": dom, "par": par})
        g = t.group_by("domain").aggregate([([], "count_all"),
                                            ("par", "count_distinct")])
        return g.rename_columns(["domain", "p_urls", "p_docs"])

    agg = coarse_grouped_aggregate(
        _read(sf_dir, ["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        ["domain"], [("p_urls", "sum", "n_urls"),
                     ("p_docs", "sum", "n_docs")])
    # typed empty seed: a URL-free corpus yields ZERO aggregate rows and
    # Ray drops the schema entirely; the union pins it
    import ray as _ray
    seed = pa.table({"domain": pa.array([], pa.string()),
                     "n_urls": pa.array([], pa.int64()),
                     "n_docs": pa.array([], pa.int64())})
    return _ray.data.from_arrow(seed).union(agg)


def blocklist_filter(sf_dir: str,
                     blocklist=DEFAULT_BLOCKLIST) -> "ray.data.Dataset":
    """UT1-style domain blocklist audit — the RefinedWeb/FineWeb URL
    filtering step: per doc, count URL occurrences whose registrable
    domain is on the (broadcast) blocklist and flag survivors.

    Pure map, no shuffle: the blocklist ships once via ``ray.put`` and
    each batch probes it with one Arrow ``index_in`` over the batch's
    extracted domains.  On the clean corpus every doc survives with
    0 urls / 0 hits (exact twin); planted-URL paths are unit-tested.
    NULL/empty text emits 0 urls / 0 blocked / kept=true in both engines
    (the twin coalesces ``len(NULL)`` to 0)."""
    import numpy as np
    import ray as _ray

    from .text import _read_docs as _read
    bl_ref = _ray.put(pa.array(sorted(set(blocklist)), pa.string()))

    def audit(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        dom, par = _doc_domains(text)
        hit = pc.is_in(dom, value_set=_ray.get(bl_ref))
        n_urls = np.zeros(batch.num_rows, dtype=np.int64)
        n_blocked = np.zeros(batch.num_rows, dtype=np.int64)
        if len(par):
            p = par.to_numpy()
            np.add.at(n_urls, p, 1)
            np.add.at(n_blocked, p,
                      hit.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_blocked_urls": pa.array(n_blocked, pa.int64()),
            "kept": pa.array(n_blocked == 0, pa.bool_()),
        })

    return _read(sf_dir, ["doc_id", "text"]).map_batches(
        audit, batch_format="pyarrow")


def nb_quality_scores(sf_dir: str,
                      pos_sources: tuple = ("src0", "src1", "src2",
                                            "src3", "src4"),
                      vocab_k: int = 512,
                      alpha: float = 1.0) -> "ray.data.Dataset":
    """FastText-style weak-supervision quality classifier, Naive-Bayes
    form: train a multinomial NB model on weak source labels (docs from
    ``pos_sources`` are the positive class — the CCNet/RefinedWeb setup
    where a trusted corpus slice defines "high quality"), then score and
    label EVERY document with the log-odds

        score(d) = ln(P_pos/P_neg)
                 + sum_{t in d, t in vocab} [ln p(t|pos) - ln p(t|neg)]

    with add-``alpha`` smoothing over the top-``vocab_k`` vocabulary.
    Emits one row per document (prior-only when the doc has no vocab
    tokens or no text): ``doc_id, nb_score, pred_pos``.

    Scale shape: training is ONE coarse term shuffle whose per-batch
    combiner ships (term, n_pos, n) histograms, finished by a vocab_k-
    bounded sort+limit pull (kilobytes at any corpus size); the class
    priors ride a one-column scalar aggregate.  The per-term log-odds
    table broadcasts via ``ray.put`` and scoring is a pure map — a
    dictionary-encoded gather over each batch's unique tokens and a
    segmented integer sum per doc.  No corpus-sized state anywhere.

    Bit-parity with the SQL twin: each vocab term's log-odds is snapped
    to integer micro-units (half away from zero) with the same
    double-expression shape DuckDB evaluates; per-doc summation and the
    prior addition are exact integer math; out-of-vocab tokens contribute
    exactly 0.  NULL sources count as negative on both sides (SQL CASE
    over a NULL IN-list is not-true)."""
    import math

    import numpy as np

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import lookup_np, make_lookup

    pos = set(pos_sources)
    out_schema = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "nb_score": pa.array([], pa.float64()),
        "pred_pos": pa.array([], pa.int64())})

    # --- class priors: one pruned-column scalar aggregate -------------
    def prior_partial(batch: pa.Table) -> pa.Table:
        is_pos = pc.fill_null(
            pc.is_in(batch.column("source"),
                     value_set=pa.array(sorted(pos), pa.string())), False)
        npos = int(pc.sum(pc.cast(is_pos, pa.int64())).as_py() or 0)
        return pa.table({"n_pos": pa.array([npos], pa.int64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    tot = _read_docs(sf_dir, ["source"]).map_batches(
        prior_partial, batch_format="pyarrow").sum(["n_pos", "n"])
    n_docs = int((tot or {}).get("sum(n)") or 0)
    if n_docs == 0:
        return ray.data.from_arrow(out_schema)
    nd_pos = int(tot.get("sum(n_pos)") or 0)
    prior_micro = int(pc.round(
        pa.scalar(math.log((nd_pos + 1.0) / ((n_docs - nd_pos) + 1.0))
                  * 1e6),
        ndigits=0, round_mode="half_towards_infinity").as_py())

    # --- training: (term, n_pos, n) histograms, one coarse shuffle ----
    def train_partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch.column("text")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat, parent = flat.filter(keep), parent.filter(keep)
        is_pos = pc.fill_null(
            pc.is_in(batch.column("source"),
                     value_set=pa.array(sorted(pos), pa.string())), False)
        tok_pos = pc.cast(is_pos.take(parent), pa.int64())
        g = pa.table({"term": flat, "pos": tok_pos}).group_by("term") \
            .aggregate([("pos", "sum"), ([], "count_all")])
        return g.rename_columns(["term", "n_pos", "n"])

    counts = coarse_grouped_aggregate(
        _read_docs(sf_dir, ["text", "source"]).map_batches(
            train_partial, batch_format="pyarrow"),
        "term", [("n_pos", "sum", "n_pos"), ("n", "sum", "n")])
    # bounded pull: vocab_k rows after the sort+limit, never the corpus
    vocab = counts.sort(["n", "term"], descending=[True, False]) \
                  .limit(vocab_k).to_pandas()
    if len(vocab) == 0:                       # corpus with no tokens at all
        w_ref = None
    else:
        v = len(vocab)
        n_pos_t = vocab["n_pos"].to_numpy().astype(np.float64)
        n_neg_t = (vocab["n"] - vocab["n_pos"]).to_numpy() \
            .astype(np.float64)
        tp = float(int(vocab["n_pos"].sum()))
        tn = float(int((vocab["n"] - vocab["n_pos"]).sum()))
        # same expression shape as the SQL twin: ln((n+alpha)/(tot+alpha*V))
        # per class, differenced, x1e6, half-away-from-zero snap
        w_micro = pc.cast(pc.round(pc.multiply(
            pc.subtract(
                pc.ln(pc.divide(pa.array(n_pos_t + alpha, pa.float64()),
                                tp + alpha * v)),
                pc.ln(pc.divide(pa.array(n_neg_t + alpha, pa.float64()),
                                tn + alpha * v))),
            1_000_000.0), ndigits=0, round_mode="half_towards_infinity"),
            pa.int64())
        w_ref = ray.put(make_lookup(vocab["term"], w_micro))

    # --- scoring: pure map, one output row per input row ---------------
    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema
        s_micro = np.full(batch.num_rows, prior_micro, dtype=np.int64)
        if w_ref is not None:
            wtab = ray.get(w_ref)
            split = pc.utf8_split_whitespace(
                pc.utf8_trim_whitespace(batch.column("text")))
            flat = pc.list_flatten(split)
            parent = pc.list_parent_indices(split)
            keep = pc.not_equal(flat, "")
            flat, parent = flat.filter(keep), parent.filter(keep)
            if len(flat):
                denc = pc.dictionary_encode(flat)
                arr = (denc.combine_chunks()
                       if isinstance(denc, pa.ChunkedArray) else denc)
                w_uniq = lookup_np(arr.dictionary, wtab,
                                   default=0).astype(np.int64)
                w = w_uniq[arr.indices.to_numpy()]
                par = parent.to_numpy()
                starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
                np.add.at(s_micro, par[starts],
                          np.add.reduceat(w, starts))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "nb_score": pa.array(s_micro.astype(np.float64) / 1e6,
                                 pa.float64()),
            "pred_pos": pa.array((s_micro > 0).astype(np.int64),
                                 pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def _logreg_tokenize(batch: pa.Table, dim: int):
    """Shared tokenizer+hasher for the logistic-regression family: str.split
    tokens hashed into ``dim`` buckets (the hashing trick), uniqued per doc
    (binary features).  Returns (parent_row, bucket) int64 arrays sorted by
    (row, bucket) — THE pinned dot-product summation order."""
    import numpy as np
    from .dedup import _string_coarse_hash

    split = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(
        pc.fill_null(batch.column("text"), "")))
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(flat) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    bucket = _string_coarse_hash(flat.combine_chunks()
                                 if isinstance(flat, pa.ChunkedArray)
                                 else flat, dim).astype(np.int64)
    packed = np.unique(parent * dim + bucket)
    return packed // dim, packed % dim


def _logreg_sigmoid(dot):
    """Numerically-stable sigmoid, the SAME branch split in the engine and
    the in-test reference so results are bit-identical."""
    import numpy as np
    out = np.empty_like(dot)
    pos = dot >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-dot[pos]))
    e = np.exp(dot[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_quality_scores(sf_dir: str,
                          pos_sources: tuple = ("src0", "src1", "src2",
                                                "src3", "src4"),
                          dim: int = 128,
                          iters: int = 6,
                          lr: float = 0.5) -> "ray.data.Dataset":
    """Weak-supervision quality classifier, logistic-regression form —
    the iterative-optimization sibling of ``nb_quality_scores``: binary
    hashed bag-of-words features (``dim`` buckets + bias), weak labels
    from ``pos_sources``, trained with ``iters`` rounds of full-batch
    gradient descent and scored over every document.  Output (doc_id,
    lr_score, pred_pos).

    Scale shape (the distributed-GD template): each round broadcasts the
    (dim+1)-double weight vector via ``ray.put``, a pure map computes
    per-batch gradient partials, and the partials reduce through a
    dim-bounded rollup pulled to the driver (kilobytes at any corpus
    size) — ``iters`` streamed passes over the corpus, no corpus-sized
    state, no shuffle of the fact data.  At 100 TB you'd train on a
    doc_id-hash sample (one extra filter in the training read) and still
    score everything; the full-batch form is kept here because it is
    exactly reproducible.

    Determinism contract (why this hash-matches run-to-run while a
    textbook float GD would not): per-row residuals snap to integer
    MICRO-UNITS before entering the gradient, so partials are exact
    int64 sums — independent of batch boundaries AND reduce order; the
    dot product sums weights in ascending bucket order (pinned by the
    tokenizer); weight updates happen once per round on the driver in
    float64.  tests/test_logreg.py replays the identical math
    single-node and asserts bit-equality."""
    import numpy as np

    from ..functions.agg import coarse_grouped_aggregate
    from ray.data.aggregate import Sum

    out_schema = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lr_score": pa.array([], pa.float64()),
        "pred_pos": pa.array([], pa.int64())})
    pos_set = pa.array(sorted(set(pos_sources)), pa.string())

    def count_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    tot = _read_docs(sf_dir, ["doc_id"]).map_batches(
        count_partial, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n")) or {}
    n_docs = int(tot.get("n") or 0)
    if n_docs == 0:
        return ray.data.from_arrow(out_schema)

    def make_grad(w_ref):
        def grad_partial(batch: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            rows, buck = _logreg_tokenize(batch, dim)
            n = batch.num_rows
            dot = np.bincount(rows, weights=w[buck],
                              minlength=n) + w[dim]
            y = pc.fill_null(pc.is_in(batch.column("source"),
                                      value_set=pos_set), False) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            r = _logreg_sigmoid(dot) - y
            # per-ROW micro-snap (half away from zero): partials become
            # exact ints, immune to batch boundaries and reduce order
            r_int = np.where(r >= 0, np.floor(r * 1e6 + 0.5),
                             np.ceil(r * 1e6 - 0.5)).astype(np.int64)
            g = np.bincount(buck, weights=r_int[rows].astype(np.float64),
                            minlength=dim).astype(np.int64)
            gi = np.concatenate([g, [r_int.sum()]])
            return pa.table({"j": pa.array(np.arange(dim + 1,
                                                     dtype=np.int64)),
                             "g": pa.array(gi, pa.int64())})
        return grad_partial

    w = np.zeros(dim + 1, np.float64)
    for _ in range(iters):
        w_ref = ray.put(w)
        grads = coarse_grouped_aggregate(
            _read_docs(sf_dir, ["text", "source"]).map_batches(
                make_grad(w_ref), batch_format="pyarrow"),
            "j", [("g", "sum", "g")])
        gt = pa.concat_tables(
            [pa.table({"j": pa.array([], pa.int64()),
                       "g": pa.array([], pa.int64())})]
            + list(grads.iter_batches(batch_format="pyarrow")))
        G = np.zeros(dim + 1, np.float64)
        jv = gt.column("j").to_numpy().astype(np.int64)
        G[jv] = gt.column("g").to_numpy().astype(np.float64)
        w = w - lr * (G / 1e6) / n_docs

    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema
        wv = ray.get(w_ref)
        rows, buck = _logreg_tokenize(batch, dim)
        dot = np.bincount(rows, weights=wv[buck],
                          minlength=batch.num_rows) + wv[dim]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lr_score": round6(pa.array(_logreg_sigmoid(dot),
                                        pa.float64())),
            "pred_pos": pa.array((dot >= 0).astype(np.int64), pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        score, batch_format="pyarrow")


def interleaved_pack_plan(corpus_dir: str, budget: int = 2048,
                          media_tokens: int = 64,
                          n_buckets: int = 1 << 12) -> "ray.data.Dataset":
    """Multimodal sequence packing over the north-rule interleaved corpus:
    every document costs ``n_text_tokens + media_tokens * n_media_spans``
    context slots (text spans tokenize by the str.split contract; each
    ``media://`` span pays the fixed vision-token budget a multimodal LM
    spends per image), and docs pack concat-and-chunk in doc_id order —
    global cost offset, sequence id and in-sequence offset per doc.  The
    bookkeeping an interleaved text+image pre-training run needs, without
    concatenating anything (the multimodal extension of
    ``sequence_pack``).

    Scale shape: one pure vectorized map turns each doc row into a
    4-int row (spans flatten once; token counts and media flags reduce by
    parent with bincounts), then the shared two-phase distributed prefix
    scan (functions/scan.py) assigns global offsets — driver state is
    O(n_buckets) ints, one hash shuffle of int rows, no global sort.
    Buckets key on the doc_id's numeric suffix (the corpus id scheme
    ``doc-%08d``, zero-padded so bytewise doc_id order == numeric order);
    in-bucket ordering uses the doc_id string itself, bytewise like the
    twin's ORDER BY.

    Null contract: zero-span docs (and NULL span text) cost 0 and still
    occupy a row (COALESCE left join in the twin)."""
    import numpy as np

    from ray.data.aggregate import Max, Min
    from ..functions.scan import int_range_buckets, ordered_prefix_scan
    from .text import _token_count

    ds = ray.data.read_parquet(corpus_dir, columns=["doc_id", "spans"])

    def cost_map(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        toks = pc.fill_null(pc.cast(
            _token_count(flat.field("text")), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        im = pc.fill_null(pc.starts_with(flat.field("media_ref"),
                                         "media://"), False) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_text = np.bincount(par, weights=toks,
                             minlength=n).astype(np.int64)
        n_media = np.bincount(par, weights=im,
                              minlength=n).astype(np.int64)
        did = pc.cast(pc.utf8_slice_codeunits(
            batch.column("doc_id"), 4), pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "did": did,
            "n_text_tokens": pa.array(n_text, pa.int64()),
            "n_media_spans": pa.array(n_media, pa.int64()),
            "cost": pa.array(n_text + media_tokens * n_media, pa.int64()),
        })

    costs = ds.map_batches(cost_map, batch_format="pyarrow").materialize()

    empty_out = pa.table({
        "doc_id": pa.array([], pa.string()),
        "n_text_tokens": pa.array([], pa.int64()),
        "n_media_spans": pa.array([], pa.int64()),
        "cost": pa.array([], pa.int64()),
        "cost_start": pa.array([], pa.int64()),
        "seq_id": pa.array([], pa.int64()),
        "seq_off": pa.array([], pa.int64()),
    })
    bounds = costs.aggregate(Min("did"), Max("did")) or {}
    if bounds.get("min(did)") is None:
        return ray.data.from_arrow(empty_out)
    lo, hi = int(bounds["min(did)"]), int(bounds["max(did)"])

    scanned = ordered_prefix_scan(
        costs, ["doc_id"], int_range_buckets("did", lo, hi, n_buckets),
        value_col="cost", out_col="cost_start")

    def pack(batch: pa.Table) -> pa.Table:
        cs = batch.column("cost_start").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_text_tokens": batch.column("n_text_tokens"),
            "n_media_spans": batch.column("n_media_spans"),
            "cost": batch.column("cost"),
            "cost_start": batch.column("cost_start"),
            "seq_id": pa.array(cs // budget, pa.int64()),
            "seq_off": pa.array(cs % budget, pa.int64()),
        })

    return scanned.map_batches(pack, batch_format="pyarrow")


def term_label_mi(sf_dir: str,
                  pos_sources: tuple = ("src0", "src1", "src2",
                                        "src3", "src4"),
                  vocab_k: int = 256) -> "ray.data.Dataset":
    """Mutual information between term PRESENCE and the weak quality
    label, per top-``vocab_k`` term — the feature-selection report behind
    the classifier family (nb/logreg): which words actually carry the
    quality signal.  For each term the doc-level 2x2 contingency
    (present/absent x pos/neg) yields

        MI = sum_cells (cell/n) * ln(cell*n / (row_tot*col_tot))

    in nats, zero-cell terms contributing 0.  Output (term, n_docs_with,
    n_pos_with, mi).

    Scale shape: ONE coarse term shuffle of per-batch DISTINCT
    (doc, term) presence partials (a doc is one row, so per-batch
    dedup is exact), a vocab_k-bounded sort+limit pull, one scalar doc
    rollup, and a driver-side K-row finish — kilobytes of driver state
    at any corpus size.  The MI doubles evaluate the four cell terms in
    a pinned left-to-right order with the twin's exact expression shape,
    then snap to 6dp.  NULL sources count as negative; NULL text docs
    simply contribute no presences (they still count in n)."""
    import numpy as np

    from ray.data.aggregate import Sum
    from ..functions.agg import coarse_grouped_aggregate

    pos_set = pa.array(sorted(set(pos_sources)), pa.string())
    empty_out = pa.table({
        "term": pa.array([], pa.string()),
        "n_docs_with": pa.array([], pa.int64()),
        "n_pos_with": pa.array([], pa.int64()),
        "mi": pa.array([], pa.float64())})

    def presence_partial(batch: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(
            pc.fill_null(batch.column("text"), "")))
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        # exact doc-level presence: one doc == one row, dedup in-batch
        t = pa.table({"d": parent, "term": flat}).group_by(
            ["d", "term"]).aggregate([])
        is_pos = pc.fill_null(pc.is_in(batch.column("source"),
                                       value_set=pos_set), False)
        dpos = pc.cast(is_pos.take(t.column("d")), pa.int64())
        g = pa.table({"term": t.column("term"), "a": dpos}) \
            .group_by("term").aggregate([("a", "sum"), ([], "count_all")])
        return g.rename_columns(["term", "pa_", "pab"])

    counts = coarse_grouped_aggregate(
        _read_docs(sf_dir, ["text", "source"]).map_batches(
            presence_partial, batch_format="pyarrow"),
        "term", [("pa_", "sum", "a"), ("pab", "sum", "ab")])
    vocab = counts.sort(["ab", "term"], descending=[True, False]) \
        .limit(vocab_k).to_pandas()               # vocab_k-bounded pull
    if len(vocab) == 0:
        return ray.data.from_arrow(empty_out)

    def doc_partial(batch: pa.Table) -> pa.Table:
        is_pos = pc.fill_null(pc.is_in(batch.column("source"),
                                       value_set=pos_set), False)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "np_": pa.array([int(pc.sum(pc.cast(is_pos, pa.int64()))
                                 .as_py() or 0)], pa.int64())})

    tot = _read_docs(sf_dir, ["source"]).map_batches(
        doc_partial, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("np_", alias_name="np_")) or {}
    n = int(tot.get("n") or 0)
    npos = int(tot.get("np_") or 0)

    a = vocab["a"].to_numpy().astype(np.int64)
    ab = vocab["ab"].to_numpy().astype(np.int64)
    b = ab - a
    c = npos - a
    d = (n - npos) - b

    def cell(cnt, rt, ct):
        cnt = cnt.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = (cnt / n) * np.log(cnt * n / (rt.astype(np.float64) * ct))
        return np.where((cnt > 0) & (rt > 0) & (ct > 0), v, 0.0)

    # pinned left-to-right cell order: (present,pos) + (present,neg)
    # + (absent,pos) + (absent,neg) — matches the twin's + chain
    mi = ((cell(a, ab, npos) + cell(b, ab, n - npos))
          + cell(c, n - ab, npos)) + cell(d, n - ab, n - npos)
    from ..functions.num import round6
    return ray.data.from_arrow(pa.table({
        "term": pa.array(vocab["term"].tolist(), pa.string()),
        "n_docs_with": pa.array(ab, pa.int64()),
        "n_pos_with": pa.array(a, pa.int64()),
        "mi": round6(pa.array(mi, pa.float64())),
    }))


def quality_calibration(sf_dir: str,
                        pos_sources: tuple = ("src0", "src1", "src2",
                                              "src3", "src4"),
                        n_bins: int = 10) -> "ray.data.Dataset":
    """Reliability diagram for the shared quality score against the weak
    source labels: equal-width score bins (the calibration-curve
    convention — bin by predicted score, compare to observed positive
    rate), one row per occupied bin: (bin, n_docs, mean_quality,
    pos_rate).  A well-calibrated filter shows pos_rate rising with the
    bin; a flat curve means the score is not separating the weak classes
    and the threshold knobs are arbitrary.

    Bin assignment is PURE INTEGER — bin = min(q_micro // (1e6/n_bins),
    n_bins-1) on the micro-int snap of THE shared quality definition —
    so both engines bucket identically (no float x10-floor edge); the
    two divisions (mean, rate) happen once in the finish with the twin's
    operation order.  One #bins-sized groupby; everything else is a
    per-batch partial."""
    import numpy as np

    from ray.data.aggregate import Sum
    from .text import quality_score

    width = 1_000_000 // n_bins
    pos_set = pa.array(sorted(set(pos_sources)), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_score(batch.column("text"))
        qm = pc.cast(pc.round(pc.multiply(q, 1_000_000.0), ndigits=0,
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        b = np.minimum(qm // width, n_bins - 1)
        pos = pc.fill_null(pc.is_in(batch.column("source"),
                                    value_set=pos_set), False) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"bin": pa.array(b, pa.int64()),
                      "n": pa.array(np.ones(len(b), np.int64)),
                      "qm": pa.array(qm, pa.int64()),
                      "pos": pa.array(pos, pa.int64())})
        g = t.group_by("bin").aggregate([("n", "sum"), ("qm", "sum"),
                                         ("pos", "sum")])
        return g.rename_columns(["bin", "pn", "pqm", "ppos"])

    agg = (_read_docs(sf_dir, ["text", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("pn", alias_name="n_docs"),
                      Sum("pqm", alias_name="sum_qm"),
                      Sum("ppos", alias_name="n_pos")))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bin": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64()),
                          "mean_quality": pa.array([], pa.float64()),
                          "pos_rate": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        n = batch.column("n_docs").to_numpy().astype(np.float64)
        qm = batch.column("sum_qm").to_numpy().astype(np.float64)
        pos = batch.column("n_pos").to_numpy().astype(np.float64)
        return pa.table({
            "bin": batch.column("bin"),
            "n_docs": batch.column("n_docs"),
            "mean_quality": round6(pa.array(qm / (n * 1_000_000.0),
                                            pa.float64())),
            "pos_rate": round6(pa.array(pos / n, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def weighted_sample_topk(sf_dir: str, k: int = 200) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    (2006) exponential keys: es_key = ln(u)/w with u the doc's md5 hash
    fraction in (0, 1] and w its quality weight; the k LARGEST keys are
    exactly a w-weighted sample without replacement.  Deterministic (no
    RNG state — the same hash-fraction trick as quality_weighted_sample,
    which is Bernoulli/with-INCLUSION-probability; this one draws an
    exact-size sample), reproducible across runs and cluster sizes.
    Zero-weight docs are never sampled (contract; w > 0 filter).

    Scale shape: pure scoring map, then a per-block LOSSLESS top-k
    candidate cut before one k-bounded final sort — no global sort of
    the corpus.  Ties break on (es_key desc, doc_id) in both engines."""
    import numpy as np

    from .text import quality_score

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "weight": pa.array([], pa.float64()),
                      "es_key": pa.array([], pa.float64())})

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        w = quality_score(batch.column("text"))
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        pos = pc.greater(w, 0.0)
        ids = batch.column("doc_id").filter(pos)
        w = w.filter(pos)
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in ids.to_pylist()),
            dtype=np.int64, count=len(ids))
        u = (h + 1) / 4294967296.0            # hash fraction in (0, 1]
        key = np.log(u) / w.to_numpy(zero_copy_only=False)
        t = pa.table({"doc_id": ids, "weight": w,
                      "es_key": pa.array(key, pa.float64())})
        if t.num_rows > k:                    # lossless per-block cut
            idx = pc.sort_indices(t, sort_keys=[("es_key", "descending"),
                                                ("doc_id", "ascending")])
            t = t.take(idx.slice(0, k))
        return t

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[("es_key", "descending"),
                                                ("doc_id", "ascending")])
        return batch.take(idx.slice(0, k))

    return ray.data.from_arrow(empty).union(
        ds.map_batches(score, batch_format="pyarrow")
          .repartition(1)
          .map_batches(finish, batch_format="pyarrow"))


def leakage_safe_split(sf_dir: str, threshold: float = 0.5,
                       max_doc: int = 300, k: int = 3
                       ) -> "ray.data.Dataset":
    """Cluster-consistent train/val split — the decontamination-aware
    version of ``train_val_split``: every document in a near-duplicate
    component (exact-fingerprint union n-gram-Jaccard edges, the
    ``dup_clusters`` graph) is assigned by its component REPRESENTATIVE's
    hash, so near-duplicates can never straddle the split boundary and
    leak validation content into training (the Lee et al. 2022
    dedup-before-split finding).  Singleton docs hash their own id.

    Output per doc: (doc_id, rep_id, cluster_size, split) — rep_id is
    the component-minimum doc_id (or the doc itself), split by the same
    md5-prefix rule as ``train_val_split``.

    Scale shape: ``dup_clusters``' distributed Hash-to-Min components
    (its Jaccard tier carries the documented ``max_doc`` demo cap; the
    exact-fingerprint tier is uncapped), then ONE coarse doc-hash
    co-shuffle merges docs with the (dup-docs-sized) assignment — a
    union + per-bucket Arrow group_by rather than ``Dataset.join``
    because the assignment side is sparse and Ray's hash join drops the
    key schema on empty partitions; never a broadcast, since at web
    scale the duplicate set is a constant fraction of the corpus — and
    the hash split finishes inside the bucket kernel."""
    import numpy as np

    from ..functions.agg import _GOLDEN, _default_num_coarse
    from .dedup import dup_clusters

    nc = _default_num_coarse()
    docs = _read_docs(sf_dir, ["doc_id"])
    clusters = dup_clusters(sf_dir, threshold=threshold,
                            max_doc=max_doc, k=k)

    def as_doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "cluster_id": pa.nulls(batch.num_rows, pa.int64()),
            "cluster_size": pa.nulls(batch.num_rows, pa.int64())})

    def as_clu_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "cluster_id": pc.cast(batch.column("cluster_id"), pa.int64()),
            "cluster_size": pc.cast(batch.column("cluster_size"),
                                    pa.int64())})

    both = docs.map_batches(as_doc_rows, batch_format="pyarrow").union(
        clusters.map_batches(as_clu_rows, batch_format="pyarrow"))

    def tag(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((did * _GOLDEN) % nc, pa.int64()))

    def bucket(group: pa.Table) -> pa.Table:
        g = group.select(["doc_id", "cluster_id", "cluster_size"]) \
            .group_by("doc_id").aggregate([("cluster_id", "max"),
                                           ("cluster_size", "max")])
        rep = pc.coalesce(g.column("cluster_id_max"), g.column("doc_id"))
        size = pc.coalesce(g.column("cluster_size_max"),
                           pa.scalar(1, pa.int64()))
        h2 = pa.array(_md5_prefix2(pc.cast(rep, pa.int64())), pa.string())
        split = pc.if_else(pc.less(h2, VAL_HEX_THRESHOLD), "val", "train")
        return pa.table({"doc_id": g.column("doc_id"),
                         "rep_id": pc.cast(rep, pa.int64()),
                         "cluster_size": pc.cast(size, pa.int64()),
                         "split": split})

    return (both.map_batches(tag, batch_format="pyarrow")
                .groupby("__coarse")
                .map_groups(bucket, batch_format="pyarrow"))



# mask ~15.6% of tokens (first-2-hex-chars threshold, 40/256) — the
# T5 corruption-rate knob as a hex string so both engines compare equal
_CORRUPT_HEX = "28"


def span_corruption_pairs(sf_dir: str) -> "ray.data.Dataset":
    """T5-style span-corruption training pairs (Raffel et al. 2020,
    arXiv:1910.10683 §3.1.4): mask a deterministic ~15.6% of whitespace
    tokens per document, merge CONSECUTIVE masked tokens into spans,
    replace each span in the input with an ordinal sentinel
    ``<extra_id_k>``, and emit the target as the masked spans prefixed
    by their sentinels plus a final ``<extra_id_n>`` terminator — the
    denoising-objective example generator a pre-training pipeline runs
    over the whole corpus.

    Determinism is cross-engine-pinned: token i (1-based) of doc d is
    masked iff ``md5(f"{d}:{i}")[:2] < "28"`` — md5 because it is the
    one hash both Arrow-side Python and DuckDB share, so the twin
    reproduces the exact example set (the per-token short-string hash
    is the documented cost; a production run would swap a vectorized
    hash and lose only the SQL twin).  NULL-text docs vanish (the
    unnest-of-NULL contract); token-less docs emit an empty input and
    the bare ``<extra_id_0>`` terminator.

    Scale shape: PURE MAP — no shuffle; numpy island/segment kernels
    for mask runs, Python only for per-doc string assembly (bounded by
    doc length, never corpus size)."""
    import hashlib
    import re

    import numpy as np

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    ws = re.compile(r"\s+")
    md5 = hashlib.md5

    def corrupt(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        inputs, targets, n_spans_out, n_masked_out = [], [], [], []
        for d, text in zip(ids, texts):
            toks = [t for t in ws.split(text) if t]
            n = len(toks)
            if n == 0:
                inputs.append("")
                targets.append("<extra_id_0>")
                n_spans_out.append(0)
                n_masked_out.append(0)
                continue
            pre = f"{d}:".encode()
            m = np.fromiter(
                (md5(pre + str(i).encode()).hexdigest()[:2] < _CORRUPT_HEX
                 for i in range(1, n + 1)), bool, count=n)
            starts = m & np.r_[True, ~m[:-1]]
            sid = np.cumsum(starts) - 1          # span id where m
            n_spans = int(starts.sum())
            toks_arr = np.array(toks, dtype=object)
            piece = toks_arr.copy()
            piece[starts] = [f"<extra_id_{k}>"
                             for k in sid[starts]]
            inputs.append(" ".join(piece[~m | starts]))
            if n_spans == 0:
                targets.append("<extra_id_0>")
            else:
                span_start_idx = np.flatnonzero(starts)
                parts = []
                for k, s in enumerate(span_start_idx):
                    e = s
                    while e < n and m[e]:   # runs can't abut: a start
                        e += 1              # needs an unmasked predecessor
                    parts.append(f"<extra_id_{k}> "
                                 + " ".join(toks_arr[s:e]))
                targets.append(" ".join(parts)
                               + f" <extra_id_{n_spans}>")
            n_spans_out.append(n_spans)
            n_masked_out.append(int(m.sum()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "input_text": pa.array(inputs, pa.string()),
            "target_text": pa.array(targets, pa.string()),
            "n_spans": pa.array(n_spans_out, pa.int64()),
            "n_masked": pa.array(n_masked_out, pa.int64())})

    return ds.map_batches(corrupt, batch_format="pyarrow")


def temperature_mixture(sf_dir: str, alpha: float = 0.7
                        ) -> "ray.data.Dataset":
    """Temperature-scaled sampling plan over sources — the multilingual
    mixture exponent (p_s ∝ n_s^α, XLM-R / mT5 style, arXiv:1911.02116
    §3.1): per source its token mass, raw corpus share, α-tempered
    share, and the boost factor a sampler would apply (upsamples tails,
    downsamples heads).  NULL text counts 0 tokens (the
    token_budget_mixture contract); sources whose mass is 0 are dropped
    (no defined share).

    Float parity with the twin: pow on doubles both engines (the
    decayed_user_value precedent), all three emitted ratios snapped
    round6 half-away.

    Scale shape: per-batch (source, docs, tokens) Arrow partials,
    |sources|-bounded groupby, single-block finish map — no shuffle
    carries a per-doc row."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.num import round6
    from .text import _token_count

    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(_token_count(batch.column("text")),
                                  pa.int64()), 0)
        t = pa.table({"source": batch.column("source"), "nt": nt})
        g = t.group_by("source").aggregate([([], "count_all"),
                                            ("nt", "sum")])
        return g.rename_columns(["source", "pd_docs", "pt_tokens"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("pd_docs", alias_name="n_docs"),
                        Sum("pt_tokens", alias_name="n_tokens")))

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch.column("n_tokens"), 0))
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "raw_share": pa.array([], pa.float64()),
            "temp_share": pa.array([], pa.float64()),
            "boost": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        n = batch.column("n_tokens").to_numpy().astype(np.float64)
        raw = n / n.sum()
        p = n ** alpha
        temp = p / p.sum()
        return pa.table({
            "source": batch.column("source"),
            "n_docs": batch.column("n_docs"),
            "n_tokens": batch.column("n_tokens"),
            "raw_share": round6(pa.array(raw, pa.float64())),
            "temp_share": round6(pa.array(temp, pa.float64())),
            "boost": round6(pa.array(temp / raw, pa.float64()))})

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def fim_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Fill-in-the-middle training examples (Bavarian et al. 2022,
    arXiv:2207.14255): split each document's token sequence at two
    deterministic cut points i <= j and emit the PSM-format string
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — the infilling
    objective's document transform.  Cut points are md5-keyed so the
    twin reproduces the exact example set: i = H(d, 'a') % (n+1),
    j = i + H(d, 'b') % (n-i+1) with H = first 8 md5 hex chars as an
    int (the part_random_walks idiom).  NULL-text docs vanish;
    token-less docs emit the bare sentinel frame.

    Scale shape: PURE MAP — per-doc work is two short-string hashes
    plus list slicing, bounded by doc length."""
    import hashlib

    import numpy as np

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    import re
    ws = re.compile(r"\s+")
    md5 = hashlib.md5

    def fim(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t, out_p, out_m, out_s = [], [], [], []
        for d, text in zip(ids, texts):
            toks = [t for t in ws.split(text) if t]
            n = len(toks)
            i = int(md5(f"{d}:a".encode()).hexdigest()[:8], 16) % (n + 1)
            j = i + int(md5(f"{d}:b".encode()).hexdigest()[:8], 16) \
                % (n - i + 1)
            pieces = (["<fim_prefix>"] + toks[:i] + ["<fim_suffix>"]
                      + toks[j:] + ["<fim_middle>"] + toks[i:j])
            out_t.append(" ".join(pieces))
            out_p.append(i)
            out_m.append(j - i)
            out_s.append(n - j)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fim_text": pa.array(out_t, pa.string()),
            "n_prefix": pa.array(out_p, pa.int64()),
            "n_middle": pa.array(out_m, pa.int64()),
            "n_suffix": pa.array(out_s, pa.int64())})

    return ds.map_batches(fim, batch_format="pyarrow")
