"""Declared Arrow schemas for every stage boundary.

The reference engine passes implicit dict-shaped records between stages; here
every boundary has a fixed ``pyarrow`` schema (SURVEY.md §1.4) so blocks are
zero-copy Arrow end-to-end and schema drift is a test failure, not a silent
corruption.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input/output document table (BASELINE.json input_hint): one row per doc.
# Raw side: spans are the scrambled page-local emission stream; golden side:
# spans are the extracted, globally ordered sequence.
# ---------------------------------------------------------------------------

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])

# ---------------------------------------------------------------------------
# Page rows after the doc→page explode.  ``raw_dets`` is the page payload —
# the decoded-page analog (in production this row carries encoded image bytes
# instead; see stages/models.py docstring).
# ---------------------------------------------------------------------------

RAW_DET_TYPE = pa.struct([
    ("kind", pa.string()),
    ("x0", pa.int32()), ("y0", pa.int32()),
    ("x1", pa.int32()), ("y1", pa.int32()),
    ("score", pa.float64()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
])

PAGE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("raw_dets", pa.list_(RAW_DET_TYPE)),
])

# ---------------------------------------------------------------------------
# Detection records accumulated by the model stages (layout → MFD/MFR → OCR).
# Axis-aligned bbox; ``text`` holds OCR text for kind='text' and (normalized)
# LaTeX for kind in ('inline','isolated'); ``media_ref`` survives only on
# figure/table detections.
# ---------------------------------------------------------------------------

DET_TYPE = pa.struct([
    ("kind", pa.string()),
    ("x0", pa.float64()), ("y0", pa.float64()),
    ("x1", pa.float64()), ("y1", pa.float64()),
    ("score", pa.float64()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
])

PAGE_DETS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("raw_dets", pa.list_(RAW_DET_TYPE)),
    ("dets", pa.list_(DET_TYPE)),
])

# ---------------------------------------------------------------------------
# Per-page assembled spans (after the convert-to-spans stage, before the
# doc_id reassembly shuffle).  block_idx is the page-local emission index in
# reading order — the shuffle-safe replacement for Python list order.
# ---------------------------------------------------------------------------

PAGE_SPANS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("block_idx", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
])


def det_to_poly(det: dict) -> list:
    """Axis-aligned det record -> the reference's 8-float poly layout."""
    return [det["x0"], det["y0"], det["x1"], det["y0"],
            det["x1"], det["y1"], det["x0"], det["y1"]]
