"""Per-page span assembly — the convert-to-spans stage (pure function).

Reproduces the order of operations of the reference's ``convert2md``
(project/pdf2markdown/scripts/pdf2markdown.py:268-324) but emits the ordered
span records the engine's output schema requires instead of a markdown
string (markdown is a trivial projection of these spans — SURVEY.md §2.4 G7).

Emission policy for the final, reading-ordered blocks:

* ``abandon``                      -> dropped (boilerplate strip; the
  reference's md emitter skips it via the ``else: continue`` arm)
* ``figure`` / ``table``           -> span with ``text=''`` and the
  ``media_ref`` carried from detection (text dropped, media ref survives)
* ``isolate_formula``              -> kind ``isolated_formula``, text = the
  merged LaTeX paragraph
* ``plain text``                   -> kind ``plain_text``, text = merged para
* title / captions / footnotes     -> same kind, text = merged para

This is richer than the reference's markdown (which also drops
table_footnote/formula_caption text) but is a pure superset ordered by the
same ``ymin*3000+xmin`` key; tests that need strict markdown parity project
through ``spans_to_markdown``.
"""

from __future__ import annotations

from typing import Dict, List

from .geometry import reading_order_key
from .spans import fill_spans_in_blocks, fix_block_spans, merge_para_with_text

# Block classes that receive spans (pdf2markdown.py:289).
FILLABLE_BLOCKS = ("title", "plain text", "figure_caption", "table_caption",
                   "table_footnote", "isolate_formula", "formula_caption")

_KIND_OUT = {"plain text": "plain_text", "isolate_formula": "isolated_formula"}


def _det_poly(det: dict) -> list:
    return [det["x0"], det["y0"], det["x1"], det["y0"],
            det["x1"], det["y1"], det["x0"], det["y1"]]


def page_spans_from_dets(dets: List[dict],
                         reading_order: str = "reference",
                         page_width: float = 1654.0) -> List[Dict[str, str]]:
    """Page detection list (in stage order: layout, MFD w/ LaTeX, OCR text)
    -> ordered span records ``{"kind","text","media_ref"}``.

    ``reading_order``: "reference" (the ymin*3000+xmin key — the equality
    contract) or "columns" (optional two-column-aware ordering, see
    ``order_blocks_columns``)."""
    spans: List[dict] = []
    blocks: List[dict] = []
    for det in dets:
        kind = det["kind"]
        if kind in ("inline", "text", "isolated"):
            spans.append({
                "type": kind,
                "bbox": [det["x0"], det["y0"], det["x1"], det["y1"]],
                "content": det["text"],
            })
            if kind == "isolated":
                # The MFD detection doubles as the isolate_formula block
                # (pdf2markdown.py:283-285 mutates the same record).
                blocks.append(dict(det, kind="isolate_formula"))
        else:
            blocks.append(det)

    passthrough: List[dict] = []
    fillable: List[dict] = []
    for det in blocks:
        (fillable if det["kind"] in FILLABLE_BLOCKS else passthrough).append(det)

    filled, _leftover = fill_spans_in_blocks(
        [dict(b, poly=_det_poly(b)) for b in fillable], spans, 0.6)
    merged_blocks: List[dict] = []
    for block in fix_block_spans(filled):
        saved = dict(block["saved_info"])
        saved["text"] = merge_para_with_text(block)
        merged_blocks.append(saved)

    all_blocks = passthrough + merged_blocks
    if reading_order == "columns":
        ordered = order_blocks_columns(all_blocks, page_width)
    else:
        ordered = sorted(all_blocks,
                         key=lambda det: reading_order_key(_det_poly(det)))

    out: List[Dict[str, str]] = []
    for det in ordered:
        kind = det["kind"]
        if kind == "abandon":
            continue
        if kind in ("figure", "table"):
            out.append({"kind": kind, "text": "", "media_ref": det["media_ref"]})
            continue
        out.append({
            "kind": _KIND_OUT.get(kind, kind),
            "text": det.get("text", ""),
            "media_ref": "",
        })
    return out


def spans_to_markdown(spans: List[dict]) -> str:
    """Project ordered spans to the reference's per-page markdown emission
    (pdf2markdown.py:312-324): titles as ``# ``, isolated formulas verbatim,
    body classes inline; figure/table/footnote/caption-of-formula dropped."""
    md = ""
    for sp in spans:
        kind = sp["kind"]
        if kind == "title":
            md += "\n# " + sp["text"] + "\n"
        elif kind == "isolated_formula":
            md += "\n" + sp["text"] + "\n"
        elif kind in ("plain_text", "figure_caption", "table_caption"):
            md += " " + sp["text"] + " "
    return md


# ---------------------------------------------------------------------------
# optional column-aware reading order (engine extension; OFF for equality)
# ---------------------------------------------------------------------------

def detect_column_split(blocks: List[dict], page_width: float) -> float | None:
    """Detect a two-column layout: a vertical gutter that no block crosses,
    located in the middle 40% of the page, with blocks on both sides.
    Returns the gutter x or None.

    The reference's ``ymin*3000+xmin`` key interleaves two-column text by
    design (its README lists a proper reading-order model as "Coming Soon",
    /root/reference/README.md:151); this heuristic is the engine's optional
    improvement and is OFF by default because span-sequence equality is
    defined against reference semantics."""
    if len(blocks) < 4:
        return None
    lo, hi = 0.3 * page_width, 0.7 * page_width
    # candidate gutters: midpoints between sorted distinct x-extents
    xs = sorted({b["x1"] for b in blocks} | {b["x0"] for b in blocks})
    best, best_margin = None, 0.0
    for x in xs:
        if not (lo <= x <= hi):
            continue
        left = [b for b in blocks if b["x1"] <= x]
        right = [b for b in blocks if b["x0"] >= x]
        if len(left) + len(right) < len(blocks):
            continue                      # some block crosses this x
        if len(left) < 2 or len(right) < 2:
            continue
        margin = min(x - max(b["x1"] for b in left),
                     min(b["x0"] for b in right) - x) + 1.0
        if margin > best_margin:
            best, best_margin = x, margin
    return best


def order_blocks_columns(blocks: List[dict], page_width: float) -> List[dict]:
    """Column-major reading order when a two-column gutter is detected
    (left column top-to-bottom, then right); falls back to the reference's
    row-major ``ymin*3000+xmin`` key otherwise."""
    split = detect_column_split(blocks, page_width)
    if split is None:
        return sorted(blocks,
                      key=lambda det: reading_order_key(_det_poly(det)))
    left = [b for b in blocks if b["x1"] <= split]
    right = [b for b in blocks if b["x1"] > split]
    key = lambda det: reading_order_key(_det_poly(det))  # noqa: E731
    return sorted(left, key=key) + sorted(right, key=key)
