"""Straight-line, single-process extraction oracle.

Re-implements the reference flagship's exact order of operations
(project/pdf2markdown/scripts/pdf2markdown.py:99-260 ``process_single_pdf``
and :268-324 ``convert2md`` — SURVEY.md §3.2):

* Pass A (per page): layout detections, then MFD detections appended; every
  formula crop queued doc-wide.
* Pass B (whole doc): batched formula recognition, LaTeX whitespace
  compaction, fill-back — here by explicit (page, det) index instead of the
  reference's positional-zip-over-aliased-dicts, which is the same mapping.
* Pass C (per page): route detections; per OCR region crop with 25px padding,
  adjust formula boxes into the crop frame, OCR, restore coordinates, append
  text detections.
* Assembly (per page): convert to ordered spans; document result is the page
  concatenation with dense global offsets.

The Ray pipeline (pipelines/extract.py) must produce byte-identical span
sequences while composing the same primitives as distributed, shuffle-safe
stages — this oracle is the correctness bar for that composition and is what
generates the golden tables (sources/corpus.py).
"""

from __future__ import annotations

from typing import Dict, List

from .functions.assemble import page_spans_from_dets
from .functions.geometry import quad_crop_to_page, quad_to_bbox
from .functions.textnorm import latex_compact
from .mocks import (
    formula_crop_payload,
    mock_mfd,
    mock_mfr,
    ocr_page_text_dets,
)
from .sources.corpus import split_pages


def extract_document(raw_spans: List[dict],
                     render_backend: str = "fitz",
                     layout_backend: str = "mock") -> List[Dict]:
    """One raw document's span stream -> the golden extracted span sequence
    ``[{kind, text, media_ref, offset}, ...]`` with dense offsets.  Render
    geometry (the S3 dpi-72 downshift for >3000px pages) is applied inside
    split_pages, identically to the Ray pipeline's explode stage.
    ``layout_backend`` selects the layout head (M1 YOLO-analog "mock" /
    M2 LayoutLMv3-analog "mock2"), as the reference's MODEL_REGISTRY does."""
    out: List[Dict] = []
    for page_spans in extract_document_pages(raw_spans, render_backend,
                                             layout_backend):
        for span in page_spans:
            out.append(dict(span, offset=len(out)))
    return out


def extract_markdown_document(raw_spans: List[dict]) -> str:
    """Golden markdown of one document: the reference's per-page
    ``convert2md`` emission joined with blank lines
    (pdf2markdown.py:312-324, 341-347)."""
    from .functions.assemble import spans_to_markdown
    return "\n\n".join(spans_to_markdown(p)
                       for p in extract_document_pages(raw_spans))


def extract_document_pages(raw_spans: List[dict],
                           render_backend: str = "fitz",
                           layout_backend: str = "mock") -> List[List[Dict]]:
    """Per-page ordered span lists (no global offsets) — the common core of
    the span-sequence and markdown goldens."""
    from .mocks import LAYOUT_BACKENDS
    layout = LAYOUT_BACKENDS[layout_backend]
    pages = split_pages(raw_spans, render_backend)

    # Pass A: layout + MFD per page; queue formula crops doc-wide.
    page_dets: List[List[dict]] = []
    fill_keys: List[tuple] = []
    crops: List[tuple] = []
    for p_idx, page in enumerate(pages):
        dets = layout(page)
        for det in mock_mfd(page):
            dets.append(det)
            fill_keys.append((p_idx, len(dets) - 1))
            crops.append((formula_crop_payload(page, det), det))
        page_dets.append(dets)

    # Pass B: batched MFR + normalization, filled back by key.
    for (p_idx, d_idx), (payload, det) in zip(fill_keys, crops):
        page_dets[p_idx][d_idx]["text"] = latex_compact(mock_mfr(payload, det))

    # Pass C: OCR per region, text dets appended in region order (shared
    # page-level driver, mocks.ocr_page_text_dets).
    from .mocks import ocr_page_text_dets
    for p_idx, page in enumerate(pages):
        dets = page_dets[p_idx]
        dets.extend(ocr_page_text_dets(page, dets))

    # Assembly: per-page ordered spans.
    return [page_spans_from_dets(dets) for dets in page_dets]


def span_sequence_equal(actual: List[dict], expected: List[dict]) -> bool:
    """The per-row invariant: element-wise (kind, text, media_ref) equality
    in offset order (FIXTURES.md F2)."""
    a = sorted(actual, key=lambda s: s["offset"])
    b = sorted(expected, key=lambda s: s["offset"])
    if len(a) != len(b):
        return False
    return all(x["kind"] == y["kind"] and x["text"] == y["text"]
               and x["media_ref"] == y["media_ref"] for x, y in zip(a, b))
