"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1/F2).

The input table matches BASELINE.json's ``input_hint`` exactly:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>)``.

A *raw* document is the un-extracted state — one span per page element
(blocks, text lines, formulas), **seeded-shuffled within each page** so that
correctness requires actually reconstructing reading order.  Geometry rides
in the ``media_ref`` field with a parseable ``geom://`` encoding (the raw
table is the "rendered PDF" analog: it carries positions the way a PDF
carries glyph coordinates):

* non-media element: ``geom://x0,y0,x1,y1/score``
* figure/table:      ``media://{doc_id}/{n}|geom://x0,y0,x1,y1/score``

``offset`` on the raw side is the page-local emission index; a new page
starts at every ``offset == 0``.  The golden table is computed by the
straight-line oracle (oracle.py) — never hand-written.

Raw span kinds (12): the 10 layout classes (snake_case), plus
``inline_formula`` and ``text_line`` (SURVEY.md §1.2 vocabularies).
"""

from __future__ import annotations

import random
from typing import Dict, Iterable, List, Optional, Tuple

import pyarrow as pa

from ..schemas import DOC_SCHEMA

PAGE_W, PAGE_H = 1654, 2339

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog data span block merge line "
    "page model layout table figure formula text order offset stream batch "
    "actor shuffle arrow vector kernel index golden oracle corpus engine "
    "read write scale node worker cluster queue cache spill lineage "
).split()
_SPECIALS = ["*", "$", "~", "`", "%", "&", "#"]
_ZH_CHARS = "文档提取引擎分布式数据流水线页面布局公式表格图片标题正文阅读顺序确定性测试基准吞吐量扩展效率"
_LATEX_FRAGS = [
    "\\alpha", "\\beta", "\\gamma", "\\lambda", "x", "y", "n", "k", "2", "3",
    "+", "-", "=", "^", "_", "(", ")", "\\frac", "{", "}", "\\sum", "\\int",
    "\\operatorname {lim}", "\\mathrm {d}", "\\text {if}", "\\mathbf {v}",
]


# ---------------------------------------------------------------------------
# geom:// encoding
# ---------------------------------------------------------------------------

def encode_geom(x0: int, y0: int, x1: int, y1: int, score: float,
                media_ref: str = "") -> str:
    geom = "geom://%d,%d,%d,%d/%.4f" % (x0, y0, x1, y1, score)
    return ("%s|%s" % (media_ref, geom)) if media_ref else geom


def parse_raw_span(span: dict) -> dict:
    """Raw table span -> raw detection dict (the page-payload element)."""
    ref = span["media_ref"]
    media = ""
    if "|" in ref:
        media, ref = ref.split("|", 1)
    coords, score = ref[len("geom://"):].split("/")
    x0, y0, x1, y1 = (int(v) for v in coords.split(","))
    return {
        "kind": span["kind"],
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "score": float(score),
        "text": span["text"],
        "media_ref": media,
    }


# S4 (pdf2image/poppler variant): pdf2image.convert_from_path renders at
# its default 200 dpi with NO size cap (pdf_extract_kit/utils/
# pdf_utils.py:3-5 passes no dpi argument).  Relative to the corpus's
# dpi-144 coordinate frame that is a uniform 200/144 upscale.
_PDF2IMAGE_SCALE = 200.0 / 144.0


def render_geometry(width: int, height: int,
                    backend: str = "fitz") -> Tuple[int, int, float]:
    """The reference's render-resolution rule per backend.

    ``fitz`` (the main path, pdf_extract_kit/utils/data_preprocess.py:5-11):
    pages render at dpi 144 (zoom 2.0 over the PDF's dpi-72 user space), but
    if either side of the dpi-144 render exceeds 3000 px the page is
    re-rendered at dpi 72 — exactly half the dims — so detector coordinates
    stay in the expected dynamic range.

    ``pdf2image`` (S4, pdf_extract_kit/utils/pdf_utils.py:3-5): poppler
    renders every page at the library-default 200 dpi with no size cap —
    a uniform 200/144 upscale of the dpi-144 frame.

    Input: the dpi-144 render dims; returns the effective
    (width, height, scale) the pipeline must operate in."""
    if backend == "pdf2image":
        return (int(width * _PDF2IMAGE_SCALE), int(height * _PDF2IMAGE_SCALE),
                _PDF2IMAGE_SCALE)
    if backend != "fitz":
        raise ValueError(f"unknown render backend: {backend!r}")
    if width > 3000 or height > 3000:
        return width // 2, height // 2, 0.5
    return width, height, 1.0


def _scale_els(els: List[dict], scale: float) -> List[dict]:
    if scale == 1.0:
        return els
    # int-truncate: the downshift re-renders onto a pixel grid, so half
    # coordinates do not exist; truncation here keeps the oracle and the
    # Arrow page schema (int32 coords) computing on IDENTICAL values
    for el in els:
        el["x0"] = int(el["x0"] * scale)
        el["y0"] = int(el["y0"] * scale)
        el["x1"] = int(el["x1"] * scale)
        el["y1"] = int(el["y1"] * scale)
    return els


def split_pages_geom(raw_spans: Iterable[dict],
                     backend: str = "fitz") -> List[dict]:
    """Partition a raw span stream into pages with render geometry applied:
    a page starts at offset==0; a leading ``page_geom`` pseudo-span carries
    the page's dpi-144 render dims (older corpora without it default to the
    A4 dpi-144 dims).  Element coordinates are brought into the effective
    render frame per ``render_geometry`` for the selected backend — the
    >3000px dpi-72 downshift (fitz) or the uniform 200-dpi upscale
    (pdf2image, S4)."""
    pages: List[dict] = []
    for span in raw_spans:
        if span["offset"] == 0 or not pages:
            pages.append({"width": PAGE_W, "height": PAGE_H, "scale": 1.0,
                          "els": []})
        el = parse_raw_span(span)
        if el["kind"] == "page_geom":
            w, h, scale = render_geometry(int(el["x1"]), int(el["y1"]),
                                          backend)
            pages[-1].update(width=w, height=h, scale=scale)
        else:
            pages[-1]["els"].append(el)
    for page in pages:
        _scale_els(page["els"], page["scale"])
    return pages


def split_pages(raw_spans: Iterable[dict],
                backend: str = "fitz") -> List[List[dict]]:
    """Back-compat view of ``split_pages_geom``: just the per-page element
    payload lists (geometry applied)."""
    return [p["els"] for p in split_pages_geom(raw_spans, backend)]


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def _score(rng: random.Random) -> float:
    # ~10% below the 0.5 drop threshold to exercise the rec-score filter.
    return round(rng.uniform(0.42, 0.99), 4)


def _words(rng: random.Random, lo: int, hi: int) -> str:
    n = rng.randint(lo, hi)
    toks = [rng.choice(_EN_WORDS) for _ in range(n)]
    if rng.random() < 0.15:
        toks[rng.randrange(len(toks))] += rng.choice(_SPECIALS)
    return " ".join(toks)


def _zh_text(rng: random.Random, lo: int, hi: int) -> str:
    return "".join(rng.choice(_ZH_CHARS) for _ in range(rng.randint(lo, hi)))


def _line_text(rng: random.Random, lo: int = 3, hi: int = 9) -> str:
    return _zh_text(rng, 6, 18) if rng.random() < 0.2 else _words(rng, lo, hi)


def _latex(rng: random.Random) -> str:
    n = rng.randint(3, 10)
    out = []
    for _ in range(n):
        out.append(rng.choice(_LATEX_FRAGS))
        out.append(rng.choice(["", " ", "  ", " "]))
    return "".join(out).strip()


class _PageBuilder:
    def __init__(self, rng: random.Random, doc_id: str, media_counter: List[int]):
        self.rng = rng
        self.doc_id = doc_id
        self.media_counter = media_counter
        self.els: List[dict] = []

    def add(self, kind: str, bbox: Tuple[int, int, int, int],
            text: str = "", media: bool = False) -> dict:
        media_ref = ""
        if media:
            media_ref = "media://%s/%d" % (self.doc_id, self.media_counter[0])
            self.media_counter[0] += 1
        el = {"kind": kind, "bbox": bbox, "score": _score(self.rng),
              "text": text, "media_ref": media_ref}
        self.els.append(el)
        return el

    def text_block(self, kind: str, x0: int, y: int, width: int,
                   nlines: int, allow_formula: bool = False) -> int:
        """Block + its text_line (and optional inline_formula) elements.
        Returns the y just below the block."""
        rng = self.rng
        line_h, gap, pad = 30, 6, 8
        height = pad * 2 + nlines * line_h + (nlines - 1) * gap
        self.add(kind, (x0, y, x0 + width, y + height))
        cy = y + pad
        for _ in range(nlines):
            lw = int((width - 16) * rng.uniform(0.62, 0.98))
            lx0 = x0 + 8
            if allow_formula and rng.random() < 0.3:
                left = _line_text(rng, 2, 5)
                right = _line_text(rng, 2, 5)
                k = rng.randint(4, 10)
                total = len(left) + k + len(right)
                cell = lw / total
                fx0 = int(lx0 + len(left) * cell)
                fx1 = int(lx0 + (len(left) + k) * cell)
                self.add("text_line", (lx0, cy, lx0 + lw, cy + line_h),
                         text=left + " " * k + right)
                self.add("inline_formula", (fx0, cy + 2, fx1, cy + line_h - 2),
                         text=_latex(rng))
            else:
                self.add("text_line", (lx0, cy, lx0 + lw, cy + line_h),
                         text=_line_text(rng))
            cy += line_h + gap
        return y + height

    def build(self) -> List[dict]:
        rng = self.rng
        margin_x = 127
        full_w = PAGE_W - 2 * margin_x
        if rng.random() < 0.5:
            self.add("abandon", (600, 30, 1054, 62))
            self.add("text_line", (610, 34, 1044, 58), text=_words(rng, 2, 4))
        y = rng.randint(90, 130)
        nblocks = rng.randint(3, 8)
        for _ in range(nblocks):
            if y > PAGE_H - 420:
                break
            roll = rng.random()
            if roll < 0.12:
                y = self.text_block("title", margin_x, y,
                                    rng.randint(400, full_w), 1)
            elif roll < 0.55:
                y = self.text_block("plain_text", margin_x, y, full_w,
                                    rng.randint(1, 4), allow_formula=True)
            elif roll < 0.63:
                # two-column pair: same y0 exercises the x tiebreak of the
                # ymin*3000+xmin reading-order key.
                col_w = (full_w - 80) // 2
                n1, n2 = rng.randint(1, 3), rng.randint(1, 3)
                y1 = self.text_block("plain_text", margin_x, y, col_w, n1,
                                     allow_formula=True)
                y2 = self.text_block("plain_text", margin_x + col_w + 80, y,
                                     col_w, n2, allow_formula=True)
                y = max(y1, y2)
            elif roll < 0.74:
                h = rng.randint(180, 360)
                self.add("figure", (margin_x + 100, y, PAGE_W - margin_x - 100,
                                    y + h), media=True)
                y = self.text_block("figure_caption", margin_x + 60, y + h + 14,
                                    full_w - 120, rng.randint(1, 2))
            elif roll < 0.84:
                y = self.text_block("table_caption", margin_x + 60, y,
                                    full_w - 120, 1)
                h = rng.randint(150, 300)
                self.add("table", (margin_x + 80, y + 10,
                                   PAGE_W - margin_x - 80, y + 10 + h),
                         media=True)
                y = self.text_block("table_footnote", margin_x + 60,
                                    y + h + 24, full_w - 120, 1)
            else:
                fh = 56
                self.add("isolated_formula",
                         (427, y, 1227, y + fh), text=_latex(rng))
                if rng.random() < 0.3:
                    self.add("formula_caption", (1270, y + 10, 1430, y + 46))
                    self.add("text_line", (1278, y + 14, 1422, y + 42),
                             text="(%d)" % rng.randint(1, 99))
                y += fh
            y += rng.randint(20, 60)
        self.add("abandon", (margin_x, 2280, PAGE_W - margin_x, 2310))
        self.add("text_line", (760, 2284, 900, 2306), text=_words(rng, 1, 2))
        return self.els


def page_count(rng: random.Random, max_pages: int = 40) -> int:
    """Skewed page-count distribution: 90% of docs 1-5 pages, long tail."""
    if rng.random() < 0.9:
        return rng.randint(1, 5)
    return min(6 + int(rng.expovariate(0.12)), max_pages)


def generate_raw_document(doc_id: str, seed: int, n_pages: Optional[int] = None,
                          max_pages: int = 40) -> List[dict]:
    """Raw span stream of one document (all pages, shuffled per page)."""
    doc_rng = random.Random("%d/%s" % (seed, doc_id))
    if n_pages is None:
        n_pages = page_count(doc_rng, max_pages)
    spans: List[dict] = []
    media_counter = [0]
    for page_no in range(n_pages):
        rng = random.Random("%d/%s/%d" % (seed, doc_id, page_no))
        els = _PageBuilder(rng, doc_id, media_counter).build()
        rng.shuffle(els)
        # ~7% of pages are oversized (the A2-at-dpi-144 analog, both sides
        # doubled past the 3000px limit) so the render_geometry downshift
        # branch is exercised corpus-wide
        mult = 2 if rng.random() < 0.07 else 1
        spans.append({
            "kind": "page_geom", "text": "",
            "media_ref": encode_geom(0, 0, PAGE_W * mult, PAGE_H * mult, 1.0),
            "offset": 0,
        })
        for offset, el in enumerate(els, start=1):
            x0, y0, x1, y1 = (v * mult for v in el["bbox"])
            spans.append({
                "kind": el["kind"],
                "text": el["text"],
                "media_ref": encode_geom(x0, y0, x1, y1, el["score"],
                                         el["media_ref"]),
                "offset": offset,
            })
    return spans


def generate_corpus(num_docs: int, seed: int = 0, max_pages: int = 40,
                    with_golden: bool = True) -> Tuple[pa.Table, Optional[pa.Table]]:
    """Build (raw_table, golden_table); golden via the straight-line oracle."""
    from ..oracle import extract_document  # local import: avoid cycle

    raw_rows, golden_rows = [], []
    for i in range(num_docs):
        doc_id = "doc-%08d" % i
        raw_spans = generate_raw_document(doc_id, seed, max_pages=max_pages)
        raw_rows.append({"doc_id": doc_id, "spans": raw_spans})
        if with_golden:
            golden_rows.append({"doc_id": doc_id,
                                "spans": extract_document(raw_spans)})
    raw = pa.Table.from_pylist(raw_rows, schema=DOC_SCHEMA)
    golden = pa.Table.from_pylist(golden_rows, schema=DOC_SCHEMA) if with_golden else None
    return raw, golden


def write_corpus(out_dir: str, num_docs: int, seed: int = 0,
                 max_pages: int = 40, with_golden: bool = True,
                 docs_per_file: int = 512) -> Tuple[str, Optional[str]]:
    """Write raw (and golden) corpus parquet under ``out_dir``; returns the
    (raw_path, golden_path) file paths.  Files are chunked so large corpora
    read as multiple blocks."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    raw_dir = os.path.join(out_dir, "raw")
    golden_dir = os.path.join(out_dir, "golden")
    golden_md_dir = os.path.join(out_dir, "golden_md")
    os.makedirs(raw_dir, exist_ok=True)
    if with_golden:
        os.makedirs(golden_dir, exist_ok=True)
        os.makedirs(golden_md_dir, exist_ok=True)
    from ..oracle import extract_document, extract_markdown_document

    md_schema = pa.schema([("doc_id", pa.string()),
                           ("markdown", pa.string())])
    part = 0
    raw_rows, golden_rows, md_rows = [], [], []

    def flush():
        nonlocal part, raw_rows, golden_rows, md_rows
        if not raw_rows:
            return
        pq.write_table(pa.Table.from_pylist(raw_rows, schema=DOC_SCHEMA),
                       os.path.join(raw_dir, "part-%05d.parquet" % part))
        if with_golden:
            pq.write_table(pa.Table.from_pylist(golden_rows, schema=DOC_SCHEMA),
                           os.path.join(golden_dir, "part-%05d.parquet" % part))
            pq.write_table(pa.Table.from_pylist(md_rows, schema=md_schema),
                           os.path.join(golden_md_dir,
                                        "part-%05d.parquet" % part))
        part += 1
        raw_rows, golden_rows, md_rows = [], [], []

    for i in range(num_docs):
        doc_id = "doc-%08d" % i
        raw_spans = generate_raw_document(doc_id, seed, max_pages=max_pages)
        raw_rows.append({"doc_id": doc_id, "spans": raw_spans})
        if with_golden:
            golden_rows.append({"doc_id": doc_id,
                                "spans": extract_document(raw_spans)})
            md_rows.append({"doc_id": doc_id,
                            "markdown": extract_markdown_document(raw_spans)})
        if len(raw_rows) >= docs_per_file:
            flush()
    flush()
    return raw_dir, (golden_dir if with_golden else None)


def write_corpus_distributed(out_dir: str, num_docs: int, seed: int = 0,
                             max_pages: int = 40,
                             docs_per_block: int = 512) -> str:
    """Generate the raw corpus WITH RAY (one task per block of doc ids)
    and write partitioned parquet — the driver-side loop of
    ``write_corpus`` is single-threaded and becomes the bottleneck beyond
    ~10k docs.  Generation is a pure function of (doc_id, seed), so the
    distributed output is row-identical to the sequential writer."""
    import ray
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for i in batch.column("id").to_pylist():
            doc_id = "doc-%08d" % i
            rows.append({"doc_id": doc_id,
                         "spans": generate_raw_document(doc_id, seed,
                                                        max_pages=max_pages)})
        return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)

    (ray.data.range(num_docs,
                    override_num_blocks=max(1, num_docs // docs_per_block))
        .map_batches(gen, batch_format="pyarrow")
        .write_parquet(out_dir))
    return out_dir
