"""Registry stages for the training-data curation surface.

The extraction stages cover the reference's task list; these cover the
curation steps a 100 TB pipeline chains AFTER extraction (quality
scoring, PII scrubbing, length/language gating, fingerprinting for a
downstream dedup shuffle).  Each is a PURE per-batch map over a
``documents``-shaped table — no state, no shuffle — so all of them
compose through ``registry.build_pipeline`` as autoscaling task stages
and any subset can be expressed in a YAML spec (configs/curate_docs.yaml
is the shipped example).

The heavy lifting reuses the pipelines' shared kernels (``text.
quality_score``, ``text._token_count``, ``text.fingerprint_batch``, the
``curation`` PII regexes) so stage output can never drift from the
oracle-checked query semantics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..registry import STAGE_REGISTRY


def _drop_if_present(batch: pa.Table, name: str) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch


@STAGE_REGISTRY.register("doc_signals")
def doc_signals(batch: pa.Table) -> pa.Table:
    """Append per-doc quality signals: ``quality`` (the shared 6dp score),
    ``n_tokens`` (str.split semantics).  Idempotent: recomputes and
    replaces the columns if already present."""
    from ..pipelines.text import _token_count, quality_score

    text = batch.column("text")
    batch = _drop_if_present(batch, "quality")
    batch = _drop_if_present(batch, "n_tokens")
    batch = batch.append_column("quality", quality_score(text))
    return batch.append_column(
        "n_tokens", pc.cast(_token_count(text), pa.int64()))


@STAGE_REGISTRY.register("pii_scrub")
def pii_scrub(batch: pa.Table) -> pa.Table:
    """Redact emails, IPv4s and US-style phone numbers IN PLACE in the
    ``text`` column (fixed email -> ip -> phone order, the pii_redact
    query's contract)."""
    from ..pipelines.curation import PII_EMAIL, PII_IP, PII_PHONE

    clean = pc.replace_substring_regex(batch.column("text"), PII_EMAIL,
                                       "[EMAIL]")
    clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
    clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
    return batch.set_column(batch.schema.get_field_index("text"),
                            "text", clean)


@STAGE_REGISTRY.register("quality_filter")
def quality_filter(batch: pa.Table, min_quality: float = 0.3) -> pa.Table:
    """Keep docs whose shared quality score is >= ``min_quality``.
    Computes the score on the fly when `doc_signals` hasn't run (so the
    stage works standalone); NULL text scores 0.0 and is dropped by any
    positive threshold."""
    if "quality" in batch.column_names:
        q = batch.column("quality")
    else:
        from ..pipelines.text import quality_score
        q = quality_score(batch.column("text"))
    return batch.filter(pc.greater_equal(q, min_quality))


@STAGE_REGISTRY.register("token_filter")
def token_filter(batch: pa.Table, min_tokens: int = 0,
                 max_tokens: int = 1 << 62) -> pa.Table:
    """Gopher-style length gate: keep docs with min_tokens <= n_tokens <=
    max_tokens (whitespace tokens; NULL text counts 0)."""
    if "n_tokens" in batch.column_names:
        n = batch.column("n_tokens")
    else:
        from ..pipelines.text import _token_count
        n = pc.cast(_token_count(batch.column("text")), pa.int64())
    n = pc.fill_null(n, 0)
    keep = pc.and_(pc.greater_equal(n, min_tokens),
                   pc.less_equal(n, max_tokens))
    return batch.filter(keep)


@STAGE_REGISTRY.register("lang_filter")
def lang_filter(batch: pa.Table, langs: "list[str]" = ("en",)) -> pa.Table:
    """Keep docs whose ``lang`` column is in the allowlist (NULL lang is
    dropped — unknown-language text is not trainable-on by default)."""
    keep = pc.fill_null(
        pc.is_in(batch.column("lang"),
                 value_set=pa.array(sorted(set(langs)), pa.string())),
        False)
    return batch.filter(keep)


@STAGE_REGISTRY.register("doc_fingerprint")
def doc_fingerprint(batch: pa.Table) -> pa.Table:
    """Append the SQL-twinnable document fingerprint ``fp`` (md5 of
    whitespace-collapsed lowercased text; NULL text -> NULL fp) — the
    key a downstream exact-dedup shuffle partitions on."""
    from ..pipelines.text import fingerprint_batch

    batch = _drop_if_present(batch, "fp")
    return batch.append_column("fp", fingerprint_batch(batch))
