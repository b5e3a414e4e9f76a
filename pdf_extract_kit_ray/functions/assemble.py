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


def page_spans_from_dets(dets: List[dict]) -> List[Dict[str, str]]:
    """Page detection list (in stage order: layout, MFD w/ LaTeX, OCR text)
    -> ordered span records ``{"kind","text","media_ref"}``."""
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

    ordered = sorted(passthrough + merged_blocks,
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
