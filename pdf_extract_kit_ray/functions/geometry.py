"""Pure interval / box algebra used by the extraction stages.

Semantics are pinned to the reference implementation
(``/root/reference/pdf_extract_kit/tasks/ocr/models/paddle_ocr.py`` — each
function cites the exact lines whose behavior it reproduces).  Everything here
is pure Python over tiny per-page lists (tens of boxes); there is no Ray, no
I/O, and no numpy dependency, so the functions are trivially testable and run
inside any ``map_batches`` UDF.

Box conventions:

* ``bbox``  — ``(x0, y0, x1, y1)`` with ``x0 <= x1`` and ``y0 <= y1``.
* ``quad``  — four ``(x, y)`` corner points, clockwise from top-left
  ``[(x0,y0), (x1,y0), (x1,y1), (x0,y1)]``.
* ``poly``  — flat 8-float list ``[x0,y0, x1,y0, x1,y1, x0,y1]`` (the
  serialization the reference uses for detection records).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

Bbox = Tuple[float, float, float, float]


# ---------------------------------------------------------------------------
# bbox <-> quad <-> poly conversions
# (reference: paddle_ocr.py:94-105 bbox_to_points / points_to_bbox)
# ---------------------------------------------------------------------------

def bbox_to_quad(bbox: Sequence[float]) -> List[List[float]]:
    """bbox -> 4 corner points, clockwise from top-left."""
    x0, y0, x1, y1 = bbox
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def quad_to_bbox(quad: Sequence[Sequence[float]]) -> List[float]:
    """4 corner points -> bbox, same corner-reading as the reference
    (paddle_ocr.py:100-105: x0,y0 from point 0, x1 from point 1, y1 from
    point 2 — no min/max normalization)."""
    x0, y0 = quad[0][0], quad[0][1]
    x1 = quad[1][0]
    y1 = quad[2][1]
    return [x0, y0, x1, y1]


def bbox_to_poly(bbox: Sequence[float]) -> List[float]:
    x0, y0, x1, y1 = bbox
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def poly_to_bbox(poly: Sequence[float]) -> List[float]:
    """Detection-record poly -> bbox reading corners 0 and 2 like the
    reference's consumers (pdf2markdown.py:275, 206-207)."""
    return [poly[0], poly[1], poly[4], poly[5]]


# ---------------------------------------------------------------------------
# y-overlap predicate (paddle_ocr.py:81-91 / merge_blocks_and_spans.py:7-17)
# ---------------------------------------------------------------------------

def y_overlap_exceeds(bbox1: Sequence[float], bbox2: Sequence[float],
                      threshold: float = 0.8) -> bool:
    """True iff the y-overlap of the two boxes is STRICTLY greater than
    ``threshold`` of the shorter box's height (strict ``>`` — exactly 0.8
    must be False)."""
    y0a, y1a = bbox1[1], bbox1[3]
    y0b, y1b = bbox2[1], bbox2[3]
    overlap = min(y1a, y1b) - max(y0a, y0b)
    if overlap <= 0:
        return False
    shorter = min(y1a - y0a, y1b - y0b)
    if shorter <= 0:
        return False
    return overlap / shorter > threshold


# ---------------------------------------------------------------------------
# overlap-area ratio (merge_blocks_and_spans.py:90-109)
# ---------------------------------------------------------------------------

def overlap_ratio_of_first(bbox1: Sequence[float], bbox2: Sequence[float]) -> float:
    """Intersection area divided by bbox1's area (0 when bbox1 degenerate)."""
    ix0 = max(bbox1[0], bbox2[0])
    iy0 = max(bbox1[1], bbox2[1])
    ix1 = min(bbox1[2], bbox2[2])
    iy1 = min(bbox1[3], bbox2[3])
    if ix1 < ix0 or iy1 < iy0:
        return 0.0
    area1 = (bbox1[2] - bbox1[0]) * (bbox1[3] - bbox1[1])
    if area1 == 0:
        return 0.0
    return (ix1 - ix0) * (iy1 - iy0) / area1


# ---------------------------------------------------------------------------
# 1-D interval ops (paddle_ocr.py:108-153)
# ---------------------------------------------------------------------------

def merge_intervals(intervals: Iterable[Sequence[float]]) -> List[List[float]]:
    """Union of closed intervals; touching-or-overlapping intervals merge
    (prev_end >= cur_start)."""
    out: List[List[float]] = []
    for lo, hi in sorted((list(iv) for iv in intervals), key=lambda iv: iv[0]):
        if out and out[-1][1] >= lo:
            if hi > out[-1][1]:
                out[-1][1] = hi
        else:
            out.append([lo, hi])
    return out


def remove_intervals(original: Sequence[float],
                     masks: Iterable[Sequence[float]]) -> List[List[float]]:
    """Subtract ``masks`` from ``original`` with the reference's integer
    shrink: surviving pieces end at ``mask_start - 1`` and restart at
    ``mask_end + 1`` (paddle_ocr.py:125-153)."""
    lo, hi = original[0], original[1]
    pieces: List[List[float]] = []
    for m_lo, m_hi in merge_intervals(masks):
        if m_lo > hi or m_hi < lo:
            continue
        if lo < m_lo:
            pieces.append([lo, m_lo - 1])
        lo = max(m_hi + 1, lo)
    if lo <= hi:
        pieces.append([lo, hi])
    return pieces


# ---------------------------------------------------------------------------
# sorted_boxes: top→bottom then left→right with 10px y-tolerance bubble pass
# (paddle_ocr.py:57-78)
# ---------------------------------------------------------------------------

def sort_quads_reading_order(quads: Sequence) -> List:
    """Sort OCR det quads by (top-left y, top-left x) then run the
    reference's adjacent bubble pass: a later box bubbles left past
    neighbours whose top-left y is within 10px and whose x is greater."""
    boxes = sorted(quads, key=lambda q: (q[0][1], q[0][0]))
    for i in range(len(boxes) - 1):
        j = i
        while j >= 0 and abs(boxes[j + 1][0][1] - boxes[j][0][1]) < 10 \
                and boxes[j + 1][0][0] < boxes[j][0][0]:
            boxes[j], boxes[j + 1] = boxes[j + 1], boxes[j]
            j -= 1
    return boxes


# ---------------------------------------------------------------------------
# line grouping of OCR det boxes (paddle_ocr.py:175-210) — note: this variant
# has NO isolated-formula rule (that rule lives in spans.merge_spans_to_line).
# ---------------------------------------------------------------------------

def group_bboxes_into_lines(bboxes: Sequence[Sequence[float]]) -> List[List[List[float]]]:
    """Group bboxes into lines: sort by y0, then extend the current line while
    the next box y-overlaps >80% with the LAST box added to the line."""
    if not bboxes:
        return []
    ordered = sorted((list(b) for b in bboxes), key=lambda b: b[1])
    lines = [[ordered[0]]]
    for box in ordered[1:]:
        if y_overlap_exceeds(box, lines[-1][-1]):
            lines[-1].append(box)
        else:
            lines.append([box])
    return lines


def merge_x_overlapping(bboxes: Sequence[Sequence[float]]) -> List[List[float]]:
    """Within one line, union boxes whose x-ranges overlap or touch
    (prev_x1 >= cur_x0), per paddle_ocr.py:213-247."""
    if not bboxes:
        return []
    out: List[List[float]] = []
    for box in sorted((list(b) for b in bboxes), key=lambda b: b[0]):
        if out and out[-1][2] >= box[0]:
            last = out[-1]
            out[-1] = [min(last[0], box[0]), min(last[1], box[1]),
                       max(last[2], box[2]), max(last[3], box[3])]
        else:
            out.append(box)
    return out


def merge_det_quads(quads: Sequence) -> List[List[List[float]]]:
    """Full det-box merge (paddle_ocr.py:250-289): quads -> bboxes -> line
    grouping -> per-line x-overlap union -> quads."""
    bboxes = [quad_to_bbox(q) for q in quads]
    merged: List[List[List[float]]] = []
    for line in group_bboxes_into_lines(bboxes):
        for box in merge_x_overlapping(line):
            merged.append(bbox_to_quad(box))
    return merged


def sort_bboxes_reading_order(bboxes: Sequence[Sequence[float]]) -> List:
    """Rect-native twin of ``sort_quads_reading_order`` (paddle_ocr.py:
    57-78) for the axis-aligned hot path: same (y0, x0) sort + 10px
    bubble pass, on [x0,y0,x1,y1] rects instead of 4-point quads (every
    box in the mock OCR chain is axis-aligned, so the quad layer is pure
    allocation).  Equivalence is pinned by tests."""
    boxes = sorted(bboxes, key=lambda b: (b[1], b[0]))
    for i in range(len(boxes) - 1):
        j = i
        while j >= 0 and abs(boxes[j + 1][1] - boxes[j][1]) < 10 \
                and boxes[j + 1][0] < boxes[j][0]:
            boxes[j], boxes[j + 1] = boxes[j + 1], boxes[j]
            j -= 1
    return boxes


def merge_det_bboxes(bboxes: Sequence[Sequence[float]]) -> List[List[float]]:
    """Rect-native twin of ``merge_det_quads`` (paddle_ocr.py:250-289):
    line grouping + per-line x-union without the quad<->bbox roundtrips."""
    out: List[List[float]] = []
    for line in group_bboxes_into_lines(bboxes):
        out.extend(merge_x_overlapping(line))
    return out


def mask_bboxes_with_formulas(bboxes: Sequence[Sequence[float]],
                              formula_bboxes: Sequence[Sequence[float]]
                              ) -> List[List[float]]:
    """Rect-native twin of ``mask_quads_with_formulas`` (paddle_ocr.py:
    156-172): subtract y-overlapping formula x-ranges, one rect per
    surviving x-segment."""
    out: List[List[float]] = []
    for tb in bboxes:
        masks = [[fb[0], fb[2]] for fb in formula_bboxes
                 if y_overlap_exceeds(tb, fb)]
        if not masks:
            out.append(list(tb))
            continue
        for seg_lo, seg_hi in remove_intervals([tb[0], tb[2]], masks):
            out.append([seg_lo, tb[1], seg_hi, tb[3]])
    return out


# ---------------------------------------------------------------------------
# formula masking of text det boxes (paddle_ocr.py:156-172)
# ---------------------------------------------------------------------------

def mask_quads_with_formulas(quads: Sequence,
                             formula_bboxes: Sequence[Sequence[float]]) -> List[List[List[float]]]:
    """Subtract the x-ranges of y-overlapping (>80%) formula boxes from each
    text det quad, re-emitting one quad per surviving x-segment.  This is the
    "text must not swallow formulas" invariant — it directly determines which
    characters the recognizer sees."""
    out: List[List[List[float]]] = []
    for quad in quads:
        tb = quad_to_bbox(quad)
        masks = [[fb[0], fb[2]] for fb in formula_bboxes
                 if y_overlap_exceeds(tb, fb)]
        for seg_lo, seg_hi in remove_intervals([tb[0], tb[2]], masks):
            out.append(bbox_to_quad([seg_lo, tb[1], seg_hi, tb[3]]))
    return out


# ---------------------------------------------------------------------------
# crop-frame transforms (pdf2markdown.py:41-54, 219-234, 245-249)
# ---------------------------------------------------------------------------

def crop_frame(poly: Sequence[float], pad_x: int = 25, pad_y: int = 25) -> dict:
    """Frame record of a padded region crop: the reference crops
    ``int(poly[0]),int(poly[1])..int(poly[4]),int(poly[5])`` and pastes it at
    ``(pad_x, pad_y)`` on a white canvas of size (w+2*pad_x, h+2*pad_y)."""
    x0, y0 = int(poly[0]), int(poly[1])
    x1, y1 = int(poly[4]), int(poly[5])
    return {
        "pad_x": pad_x, "pad_y": pad_y,
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "width": x1 - x0 + 2 * pad_x,
        "height": y1 - y0 + 2 * pad_y,
    }


def bbox_page_to_crop(bbox: Sequence[float], frame: dict):
    """Translate a page-frame bbox into the crop frame; returns None when the
    box lies fully outside the crop canvas (reference drop rule: x1<0 or y1<0
    or x0>width or y0>height)."""
    x0 = bbox[0] - frame["x0"] + frame["pad_x"]
    y0 = bbox[1] - frame["y0"] + frame["pad_y"]
    x1 = bbox[2] - frame["x0"] + frame["pad_x"]
    y1 = bbox[3] - frame["y0"] + frame["pad_y"]
    if x1 < 0 or y1 < 0 or x0 > frame["width"] or y0 > frame["height"]:
        return None
    return [x0, y0, x1, y1]


def quad_crop_to_page(quad: Sequence[Sequence[float]], frame: dict) -> List[List[float]]:
    """Translate an OCR quad from crop frame back to page frame
    (pdf2markdown.py:245-249)."""
    dx = frame["x0"] - frame["pad_x"]
    dy = frame["y0"] - frame["pad_y"]
    return [[p[0] + dx, p[1] + dy] for p in quad]


# ---------------------------------------------------------------------------
# IoU NMS (the optional re-filter of tasks/layout_detection/models/yolo.py:74-80)
# ---------------------------------------------------------------------------

def iou(bbox1: Sequence[float], bbox2: Sequence[float]) -> float:
    ix0 = max(bbox1[0], bbox2[0])
    iy0 = max(bbox1[1], bbox2[1])
    ix1 = min(bbox1[2], bbox2[2])
    iy1 = min(bbox1[3], bbox2[3])
    if ix1 <= ix0 or iy1 <= iy0:
        return 0.0
    inter = (ix1 - ix0) * (iy1 - iy0)
    a1 = (bbox1[2] - bbox1[0]) * (bbox1[3] - bbox1[1])
    a2 = (bbox2[2] - bbox2[0]) * (bbox2[3] - bbox2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def nms_bboxes(bboxes: Sequence[Sequence[float]], scores: Sequence[float],
               iou_threshold: float) -> List[int]:
    """Greedy non-maximum suppression: keep boxes in descending score order,
    dropping any box whose IoU with an already-kept box exceeds the
    threshold.  Ties broken by original index (deterministic).  Returns kept
    indices in score order."""
    order = sorted(range(len(bboxes)), key=lambda i: (-scores[i], i))
    kept: List[int] = []
    for i in order:
        if all(iou(bboxes[i], bboxes[j]) <= iou_threshold for j in kept):
            kept.append(i)
    return kept


# ---------------------------------------------------------------------------
# reading-order key (pdf2markdown.py:262-266)
# ---------------------------------------------------------------------------

def reading_order_key(poly: Sequence[float]) -> float:
    """Row-major scalar order key ``ymin*3000 + xmin`` over the det poly.
    The reference applies it to int-truncated coordinates, so ties are real;
    ``sorted`` stability then preserves emission order among ties."""
    return poly[1] * 3000 + poly[0]
