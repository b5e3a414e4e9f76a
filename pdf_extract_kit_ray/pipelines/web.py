"""HTML main-content extraction (web-tier boilerplate strip).

The north rule names "HTML boilerplate strip … DOM heuristics" as part of
the main-content extraction tier alongside the PDF/layout path.  The
PDF-Extract-Kit reference strips boilerplate via its ``abandon`` layout
class (pdf_extract_kit/tasks/layout_detection — headers/footers dropped in
markdown assembly, project/pdf2markdown/scripts/pdf2markdown.py:307-320);
this module is the HTML-side analog: a readability/trafilatura-style
leaf-block scorer that segments a page into block elements, measures
text- and link-density per block, drops chrome regions
(nav/aside/footer/header) and link-dominated blocks, and emits the
surviving text in document order.

Per north-star scope, DOM/byte-stream heuristics are "pure-Python …
stateless batch UDFs": HTML is not Arrow-vectorizable, so the per-doc
parser runs as a compiled-regex scan inside ``map_batches`` (patterns
compiled once at module import; strings move zero-copy from the Arrow
buffer in and one Arrow array out).  No tree is built — one linear pass
for region spans + one for leaf blocks, O(page bytes).

Correctness strategy (no SQL HTML parser exists): the query path
synthesizes a deterministic HTML page per document row (``synth_html`` —
fixed chrome + the doc's text re-wrapped into 12-token ``<p>`` blocks),
extracts it back, and emits counters whose closed forms a DuckDB twin
computes straight from ``documents.text``.  An extractor bug (dropped
paragraph, leaked nav text, miscounted block) breaks ``main_chars`` /
``kept_blocks`` / ``dropped_blocks`` equality.  Handcrafted-HTML edge
semantics (nested links, escaped entities, link-density boundary, td/h
blocks) are pinned in tests/test_html_extract.py.

Null contract: NULL text synthesizes the empty page (no content blocks);
``main_chars`` / ``kept_blocks`` are 0, chrome still counts as dropped.
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.joins import sized_read_parquet
from ..functions.num import round6

# --- compiled once per process (module import), shared by every batch ---

# invisible content: scripts, styles, comments vanish before any scoring
_STRIP_RE = re.compile(
    r"(?is)<script\b.*?</script>|<style\b.*?</style>|<!--.*?-->")
# chrome regions whose leaf blocks are boilerplate by position.  Matched
# non-greedily without nesting (same-tag nesting inside chrome is rare on
# real pages; a missed nested close degrades to scoring the block on its
# own link density, never to dropping content outside the region).
_REGION_RE = re.compile(r"(?is)<(nav|aside|footer|header)\b.*?</\1\s*>")
# leaf blocks: the elements whose direct text is a reading unit
_BLOCK_RE = re.compile(r"(?is)<(p|li|h[1-6]|td)\b[^>]*>(.*?)</\1\s*>")
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")

# keep a block when anchor text is at most this share of its text
LINK_DENSITY_MAX = 0.5

# chunking used by the synthetic page (and therefore by the SQL twins)
_SYNTH_PARA_TOKENS = 12
# chrome leaf blocks per synthetic page: h1(header) + 3 nav li +
# read-more p + 2 aside li + footer p
SYNTH_CHROME_BLOCKS = 8


def _block_text(inner: str) -> str:
    """Visible text of a block: tags stripped, entities unescaped,
    edges trimmed (inner whitespace preserved — char counts matter)."""
    return _html.unescape(_TAG_RE.sub("", inner)).strip()


def extract_main_content(page: str) -> Tuple[str, int, int]:
    """One page -> (main_text, kept_blocks, dropped_blocks).

    main_text is the newline-join of surviving leaf-block texts in
    document order.  A leaf block survives iff it is outside every
    nav/aside/footer/header region, has non-empty visible text, and its
    link density (anchor-text chars / text chars) is <= 0.5."""
    page = _STRIP_RE.sub("", page)
    regions = [m.span() for m in _REGION_RE.finditer(page)]
    kept: List[str] = []
    dropped = 0
    for m in _BLOCK_RE.finditer(page):
        start = m.start()
        if any(a <= start < b for a, b in regions):
            dropped += 1
            continue
        text = _block_text(m.group(2))
        if not text:
            dropped += 1
            continue
        link_chars = sum(
            len(_block_text(a.group(1)))
            for a in _ANCHOR_RE.finditer(m.group(2)))
        if link_chars / len(text) > LINK_DENSITY_MAX:
            dropped += 1
            continue
        kept.append(text)
    return "\n".join(kept), len(kept), dropped


def synth_html(doc_id: int, text: str) -> str:
    """Deterministic page: fixed chrome (header/nav/aside/footer + a
    link-only read-more block — SYNTH_CHROME_BLOCKS leaf blocks) around
    the doc text re-wrapped into 12-token paragraphs.  Inverse invariant
    (the twin's closed form): extracted main_text == text with every
    12th space replaced by a newline, so len(main_text) == len(text)."""
    toks = text.split(" ") if text else []
    paras = "".join(
        f"<p>{_html.escape(' '.join(toks[i:i + _SYNTH_PARA_TOKENS]))}</p>\n"
        for i in range(0, len(toks), _SYNTH_PARA_TOKENS))
    site = doc_id % 7
    return (
        f"<html><head><title>doc {doc_id}</title><style>p{{margin:0}}"
        f"</style><script>var x={doc_id};</script></head>\n<body>\n"
        f"<header><h1>site {site}</h1></header>\n"
        '<nav><ul><li><a href="/">home</a></li>'
        '<li><a href="/a">about</a></li>'
        '<li><a href="/c">contact</a></li></ul></nav>\n'
        f"<!-- generated page {doc_id} -->\n<main>\n{paras}"
        '<p><a href="/more">read more</a></p>\n</main>\n'
        '<aside><ul><li><a href="/r1">related one</a></li>'
        '<li><a href="/r2">related two</a></li></ul></aside>\n'
        f"<footer><p>copyright site {site}</p></footer>\n</body></html>")


def _read_docs(sf_dir: str, columns) -> "ray.data.Dataset":
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _extract_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    main_chars, kept, dropped = [], [], []
    for i, t in zip(ids, texts):
        main, k, d = extract_main_content(synth_html(i, t or ""))
        main_chars.append(len(main))
        kept.append(k)
        dropped.append(d)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "main_chars": pa.array(main_chars, pa.int64()),
        "kept_blocks": pa.array(kept, pa.int64()),
        "dropped_blocks": pa.array(dropped, pa.int64()),
    })


def html_main_content(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc main-content extraction audit over the synthesized pages:
    (doc_id, main_chars, kept_blocks, dropped_blocks).  The DuckDB twin
    computes the closed forms from ``documents.text`` directly (see
    module docstring) — any extractor drift breaks the hash match."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _extract_batch, batch_format="pyarrow")


def html_boilerplate_rate(sf_dir: str) -> "ray.data.Dataset":
    """Per-source boilerplate share of the synthesized corpus: kept vs
    dropped leaf blocks and dropped/(kept+dropped), 6dp.  Partial-combined
    per batch so the shuffle moves one row per (batch, source)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ex = _extract_batch(batch)
        t = pa.table({"source": batch.column("source"),
                      "kept": ex.column("kept_blocks"),
                      "dropped": ex.column("dropped_blocks")})
        g = t.group_by("source").aggregate([("kept", "sum"),
                                            ("dropped", "sum")])
        return g.rename_columns(["source", "p_kept", "p_dropped"])

    def finish(batch: pa.Table) -> pa.Table:
        kept = pc.cast(batch.column("kept_blocks"), pa.float64())
        dropped = pc.cast(batch.column("dropped_blocks"), pa.float64())
        rate = round6(pc.divide(dropped, pc.add(kept, dropped)))
        return batch.append_column("boilerplate_rate", rate)

    partials = _read_docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        partial, batch_format="pyarrow")
    return (partials.groupby("source")
            .aggregate(Sum("p_kept", alias_name="kept_blocks"),
                       Sum("p_dropped", alias_name="dropped_blocks"))
            .map_batches(finish, batch_format="pyarrow"))
