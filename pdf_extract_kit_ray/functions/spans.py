"""Block/span assembly algebra — the semantic core of markdown-merge.

These pure functions reproduce, order-for-order, the reference's
span-to-block pipeline:

* ``merge_spans_to_line``     — pdf_extract_kit/utils/merge_blocks_and_spans.py:19-51
  (NOTE: unlike the OCR-internal variant in ``geometry.group_bboxes_into_lines``,
  this one forces a new line at any ``isolated`` span)
* ``lines_sorted_left_to_right`` — merge_blocks_and_spans.py:54-69
* ``fill_spans_in_blocks``    — merge_blocks_and_spans.py:111-155 (consumption
  semantics: first block in block order claims a span; claimed spans leave the
  pool — order-dependent and non-commutative, so block order is part of the
  contract)
* ``fix_block_spans``         — merge_blocks_and_spans.py:157-177 (+71-88)
* ``merge_para_with_text``    — merge_blocks_and_spans.py:228-268

Span records are dicts ``{"type": str, "bbox": [x0,y0,x1,y1], "content": str}``;
block records are detection dicts ``{"kind": str, "poly": [8 floats],
"score": float, ...}`` (our engine uses ``kind`` where the reference uses
``category_type``; the class vocabulary values are identical).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .geometry import y_overlap_exceeds
from .textnorm import detect_lang, escape_markdown


def merge_spans_to_line(spans: List[dict]) -> List[List[dict]]:
    """Group spans into lines by >80% y-overlap with the line's last span,
    after sorting by y0.  Any ``isolated`` span starts its own line, and a
    line containing an ``isolated`` span accepts no further spans."""
    if not spans:
        return []
    ordered = sorted(spans, key=lambda sp: sp["bbox"][1])
    lines: List[List[dict]] = [[ordered[0]]]
    for span in ordered[1:]:
        current = lines[-1]
        if span["type"] == "isolated" or any(s["type"] == "isolated" for s in current):
            lines.append([span])
        elif y_overlap_exceeds(span["bbox"], current[-1]["bbox"]):
            current.append(span)
        else:
            lines.append([span])
    return lines


def lines_sorted_left_to_right(lines: List[List[dict]]) -> List[dict]:
    """Sort each line's spans by x0 and attach the line's union bbox."""
    out = []
    for line in lines:
        ordered = sorted(line, key=lambda sp: sp["bbox"][0])
        out.append({
            "bbox": [
                min(sp["bbox"][0] for sp in ordered),
                min(sp["bbox"][1] for sp in ordered),
                max(sp["bbox"][2] for sp in ordered),
                max(sp["bbox"][3] for sp in ordered),
            ],
            "spans": ordered,
        })
    return out


def fill_spans_in_blocks(blocks: List[dict], spans: List[dict],
                         ratio: float = 0.6) -> Tuple[List[dict], List[dict]]:
    """Spatial semi-join with consumption.

    For each block IN BLOCK ORDER, attach every span still in the pool whose
    overlap-area/span-area is strictly greater than ``ratio``, then remove the
    claimed spans from the pool.  A span therefore belongs to at most one
    block — the first block (in block order) that overlaps it enough.

    The block bbox is read from the detection poly corners 0/1 (L,U) and 2/5
    (R,D) with min/max normalization, exactly as the reference does.
    Returns ``(blocks_with_spans, leftover_spans)``.
    """
    # consumption scan in plain Python: a page's span pool is BOUNDED
    # (~tens of spans, independent of corpus size), and at that size the
    # scalar loop beats small-array numpy dispatch ~2x (measured; an
    # earlier vectorized variant is in git history).  The float expression
    # is overlap_ratio_of_first's exactly — (min-max)*(min-max)/area with
    # a strict > ratio comparison — so results match the reference
    # bit-for-bit.
    n = len(spans)
    sb = [sp["bbox"] for sp in spans]
    areas = [(b[2] - b[0]) * (b[3] - b[1]) for b in sb]
    alive = [True] * n
    filled: List[dict] = []
    for det in blocks:
        poly = det["poly"]
        left, right = min(poly[0], poly[2]), max(poly[0], poly[2])
        top, bottom = min(poly[1], poly[5]), max(poly[1], poly[5])
        block_bbox = [left, top, right, bottom]
        claimed: List[dict] = []
        for i in range(n):
            if not alive[i]:
                continue
            b = sb[i]
            ix0 = b[0] if b[0] > left else left
            iy0 = b[1] if b[1] > top else top
            ix1 = b[2] if b[2] < right else right
            iy1 = b[3] if b[3] < bottom else bottom
            if ix1 < ix0 or iy1 < iy0:
                continue
            a = areas[i]
            if a == 0:
                continue
            if (ix1 - ix0) * (iy1 - iy0) / a > ratio:
                claimed.append(spans[i])
                alive[i] = False
        filled.append({
            "type": det["kind"],
            "bbox": block_bbox,
            "saved_info": det,
            "spans": claimed,
        })
    return filled, [spans[i] for i in range(n) if alive[i]]


def fix_block_spans(blocks_with_spans: List[dict]) -> List[dict]:
    """Turn each block's flat span list into sorted lines.

    * ``isolate_formula`` blocks keep span types as-is (interline treatment);
    * every other block demotes stray ``isolated`` spans to ``inline`` first.

    The flat ``spans`` key is replaced by a ``lines`` key.
    """
    fixed = []
    for block in blocks_with_spans:
        spans = block.pop("spans")
        if block["type"] != "isolate_formula":
            for sp in spans:
                if sp["type"] == "isolated":
                    sp["type"] = "inline"
        block["lines"] = lines_sorted_left_to_right(merge_spans_to_line(spans))
        fixed.append(block)
    return fixed


def merge_para_with_text(block: dict) -> str:
    """Concatenate a block's lines into one paragraph string.

    Per line: compute the line language from the concatenation of the
    STRIPPED text-span contents (empty line text -> empty lang); then emit
    each span's contribution —

    * ``text``            -> markdown-escaped content (un-stripped at escape
      time; the join strips it)
    * ``inline`` / ``ignore-formula`` -> `` $<latex stripped of $>$ ``
    * ``isolated``        -> ``\\n$$\\n<latex>\\n$$\\n``
    * ``footnote``        -> `` $^<c>$ `` (caret added only when absent)

    Non-empty contributions are stripped and joined with no separator for zh
    lines, a single trailing space otherwise (so en paragraphs end with a
    trailing space — part of byte-equality).
    """
    para = ""
    for line in block["lines"]:
        line_text = "".join(sp["content"].strip() for sp in line["spans"]
                            if sp["type"] == "text")
        line_lang = detect_lang(line_text) if line_text else ""
        for sp in line["spans"]:
            kind = sp["type"]
            piece = ""
            if kind == "text":
                piece = escape_markdown(sp["content"])
            elif kind in ("inline", "ignore-formula"):
                piece = " $%s$ " % sp["content"].strip("$")
            elif kind == "isolated":
                piece = "\n$$\n%s\n$$\n" % sp["content"].strip("$")
            elif kind == "footnote":
                body = sp["content"].strip("$")
                piece = " $%s$ " % body if "^" in body else " $^%s$ " % body
            if piece:
                para += piece.strip() if "zh" in line_lang else piece.strip() + " "
    return para
