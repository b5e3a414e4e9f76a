"""Deterministic mock model backends (sandbox stand-ins for the GPU models).

The real engine's stateful stages (layout detector, formula detector MFD,
formula recognizer MFR, OCR, table parser — SURVEY.md §2.2 M1-M6) load
weights once per actor and run batched inference.  This container has no
vision/OCR libraries, so each backend is a *deterministic pure function of
the page payload* with the same interface the real backend would have.  The
Ray-side plumbing (actor pools, batch gather/scatter, crop-frame transforms,
keyed merge-back) is real and identical either way.

A raw page payload is a list of "raw detection" dicts parsed from the input
table (see sources/corpus.py for the encoding):
``{"kind", "x0","y0","x1","y1", "score", "text", "media_ref"}``.

* ``mock_layout``  — emits block detections for the 10 layout classes in raw
  emission order (the class vocabulary of
  /root/reference/pdf_extract_kit/tasks/layout_detection/models/yolo.py:18-29,
  coords int-truncated and scores rounded to 2dp like
  project/pdf2markdown/scripts/pdf2markdown.py:83-96).
* ``mock_mfd``     — emits 'inline'/'isolated' formula detections
  (tasks/formula_detection/models/yolo.py:22-25).
* ``mock_mfr``     — "recognizes" the LaTeX of a formula crop (the raw text
  of the formula element whose box best matches the crop).
* ``mock_ocr``     — full det→merge→mask→rec emulation over a padded region
  crop, using the reference's exact box algebra; recognition reads the chars
  whose grid-cell centers fall inside each final det box, and drops results
  scoring below ``drop_score`` (tasks/ocr/models/paddle_ocr.py:442-447).
* ``mock_table``   — table crop -> deterministic HTML; honors a per-row time
  cap analog (tasks/table_parsing/models/struct_eqtable.py:21-22): payloads
  marked as stragglers yield an empty result instead of hanging the stage.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .functions.geometry import (
    bbox_page_to_crop,
    bbox_to_quad,
    crop_frame,
    mask_bboxes_with_formulas,
    mask_quads_with_formulas,
    merge_det_bboxes,
    merge_det_quads,
    quad_crop_to_page,
    quad_to_bbox,
    sort_bboxes_reading_order,
    sort_quads_reading_order,
)

# Raw corpus kind -> reference layout class name.  'isolated_formula' is
# deliberately absent: the MFD 'isolated' detection becomes the
# isolate_formula block during assembly (pdf2markdown.py:283-285), and this
# mock layout model does not emit a duplicate class-8 box for the same region.
LAYOUT_KIND_MAP = {
    "title": "title",
    "plain_text": "plain text",
    "abandon": "abandon",
    "figure": "figure",
    "figure_caption": "figure_caption",
    "table": "table",
    "table_caption": "table_caption",
    "table_footnote": "table_footnote",
    "formula_caption": "formula_caption",
}

# Raw corpus kind -> MFD class name (2 classes).
MFD_KIND_MAP = {"inline_formula": "inline", "isolated_formula": "isolated"}

# Layout classes routed to OCR: ids {0,1,2,4,6,7} of the 10-class vocabulary
# (pdf2markdown.py:209).
OCR_CLASSES = {"title", "plain text", "abandon",
               "figure_caption", "table_caption", "table_footnote"}
TABLE_CLASSES = {"table"}

DROP_SCORE = 0.5



def burn_compute(ms: float) -> None:
    """Occupy this worker for ``ms`` milliseconds (busy wall-clock wait),
    emulating a fixed-latency model-inference call.

    Time-based rather than FLOP-based on purpose: a real detector/recognizer
    has a latency set by its own accelerator, independent of how many sibling
    CPU workers the host is running — a FLOP-count burn instead slows down
    ~30% when all cores are busy (all-core turbo / SMT sharing), which
    contaminates the N-vs-4N scaling measurement with host frequency
    artifacts that have no analog on a real multi-node cluster.  (Two
    earlier designs are documented in git history: a matmul burn let BLAS
    oversubscribe threads and serialized whole stages; an elementwise-FMA
    burn was single-threaded but frequency-sensitive.)

    The sandbox mocks cost ~2 ms/page of pointer-chasing Python, so an
    unpadded single-node benchmark measures the host's memory-allocator
    contention rather than pipeline orchestration.  Enabling this knob
    (bench --scaling does, and discloses it) makes the measurement reflect
    the model-bound target workload.  It never changes any output value."""
    if ms <= 0:
        return
    import time as _time
    deadline = _time.perf_counter() + ms / 1000.0
    x = 1.0
    while _time.perf_counter() < deadline:
        for _ in range(64):
            x = x * 0.999999 + 1e-9



def _det(kind: str, raw: dict, text: str = "", media_ref: str = "") -> dict:
    return {
        "kind": kind,
        "x0": float(int(raw["x0"])), "y0": float(int(raw["y0"])),
        "x1": float(int(raw["x1"])), "y1": float(int(raw["y1"])),
        "score": round(float(raw["score"]), 2),
        "text": text,
        "media_ref": media_ref,
    }


def mock_layout(raw_dets: Sequence[dict], score_thresh: float = 0.0) -> List[dict]:
    """Layout detector: one detection per block-level raw element, in raw
    emission order (the model's output order is the block-consumption order
    downstream, so it is part of the contract).  ``score_thresh`` drops
    low-confidence blocks before emission — the knob that differs between
    the reference's switchable backends (LayoutLMv3 pins
    SCORE_THRESH_TEST=0.2, layoutlmv3_util/model_init.py:71, while the
    YOLO backend emits at its own default)."""
    out = []
    for raw in raw_dets:
        cls = LAYOUT_KIND_MAP.get(raw["kind"])
        if cls is None:
            continue
        if float(raw["score"]) < score_thresh:
            continue
        media = raw["media_ref"] if cls in ("figure", "table") else ""
        out.append(_det(cls, raw, media_ref=media))
    return out


def mock_layout_lmv3(raw_dets: Sequence[dict], score_thresh: float = 0.5,
                     nms_iou: float = 0.5) -> List[dict]:
    """LayoutLMv3-analog head (M2): same candidate gather as ``mock_layout``
    but with detectron2 ROI-heads POST-PROCESSING semantics — the part of
    the alternate backend that is observable without the 3.6k-LoC vendored
    ViT weights (tasks/layout_detection/models/layoutlmv3.py:11-81,
    layoutlmv3_util/model_init.py:71,119-141):

    * score threshold BEFORE emission — 0.2 in the reference
      (``SCORE_THRESH_TEST``, model_init.py:71); 0.5 here because the mock
      score distribution is uniform 0.42-0.99, where 0.2 would drop nothing;
    * CLASS-WISE greedy NMS at IoU 0.5 (detectron2
      ``ROI_HEADS.NMS_THRESH_TEST`` default — an RCNN head proposes
      overlapping regions per class; the YOLO mock's raw elements are
      pre-NMS'd by construction);
    * emission sorted by score DESCENDING, ties by candidate index
      (detectron2 ``Instances`` arrive score-sorted, model_init.py:125-128),
      vs the YOLO mock's raw emission order.

    The downstream block-consumption order therefore genuinely differs from
    the "mock" backend — not just the det COUNT (the old threshold-only
    analog) but the det ORDER, which ``fill_spans_in_blocks`` consumes.
    Like ``mock_layout`` it emits no class-8 isolate_formula box: the MFD
    'isolated' det becomes that block during assembly (see LAYOUT_KIND_MAP
    note)."""
    from .functions.geometry import nms_bboxes
    cands = mock_layout(raw_dets, score_thresh=score_thresh)
    out: List[dict] = []
    for cls in {d["kind"] for d in cands}:
        idx = [i for i, d in enumerate(cands) if d["kind"] == cls]
        boxes = [(cands[i]["x0"], cands[i]["y0"],
                  cands[i]["x1"], cands[i]["y1"]) for i in idx]
        scores = [cands[i]["score"] for i in idx]
        out.extend(cands[idx[k]] for k in nms_bboxes(boxes, scores, nms_iou))
    # global score-descending order across classes (Instances order);
    # ties broken by candidate emission index for determinism under the
    # 2dp-rounded mock scores
    order = {id(d): i for i, d in enumerate(cands)}
    out.sort(key=lambda d: (-d["score"], order[id(d)]))
    return out


# Config-selectable layout backends (the reference's MODEL_REGISTRY switch,
# layout_detection/models/{yolo,layoutlmv3}.py): same interface, different
# head semantics.  "mock2" is the LayoutLMv3 analog (threshold + class-wise
# NMS + score-sorted emission); "layoutlmv3-mock" is its explicit alias.
LAYOUT_BACKENDS = {
    "mock": mock_layout,
    "mock2": mock_layout_lmv3,
    "layoutlmv3-mock": mock_layout_lmv3,
}


def mock_mfd(raw_dets: Sequence[dict]) -> List[dict]:
    """Formula detector: inline/isolated boxes with empty text (LaTeX is
    filled by the MFR stage)."""
    return [_det(MFD_KIND_MAP[raw["kind"]], raw)
            for raw in raw_dets if raw["kind"] in MFD_KIND_MAP]


def formula_crop_payload(raw_dets: Sequence[dict], det: dict) -> List[dict]:
    """The "crop" an MFR actor receives: raw elements intersecting the
    formula box (stands in for the cropped pixel region)."""
    return [raw for raw in raw_dets
            if not (raw["x1"] <= det["x0"] or raw["x0"] >= det["x1"]
                    or raw["y1"] <= det["y0"] or raw["y0"] >= det["y1"])]


def mock_mfr(crop_payload: Sequence[dict], det: dict) -> str:
    """Formula recognizer: return the raw (pre-normalization) LaTeX of the
    formula element whose box best overlaps the crop; '' when none."""
    best, best_overlap = "", -1.0
    for raw in crop_payload:
        if raw["kind"] not in MFD_KIND_MAP:
            continue
        ox = min(raw["x1"], det["x1"]) - max(raw["x0"], det["x0"])
        oy = min(raw["y1"], det["y1"]) - max(raw["y0"], det["y0"])
        overlap = max(ox, 0.0) * max(oy, 0.0)
        if overlap > best_overlap:
            best, best_overlap = raw["text"], overlap
    return best


def build_line_context(raw_dets: Sequence[dict]) -> dict:
    """Per-PAGE precomputation for the OCR recognizer, as a struct-of-
    numpy-arrays: each text_line's bbox/midline/center/score columns plus
    its char-cell x-grid and char array — all region-independent quantities
    that mock_ocr would otherwise rebuild for every region crop
    (~7 regions/page).  Callers build this once per page and pass it to
    every ``mock_ocr`` call; the columnar layout lets the per-region
    visibility test run as one vectorized mask instead of a Python loop
    over lines.  Identical double arithmetic to the per-dict path (int
    coordinates convert exactly to float64)."""
    lines = [raw for raw in raw_dets if raw["kind"] == "text_line"]
    x0 = [float(r["x0"]) for r in lines]
    y0 = [float(r["y0"]) for r in lines]
    x1 = [float(r["x1"]) for r in lines]
    y1 = [float(r["y1"]) for r in lines]
    # per-line char grid as SCALARS (origin + cell width + the text string):
    # the grid is uniform, so a quad's char capture is an O(1) index-range
    # computation (mock_ocr) — materializing per-char cx/char arrays here
    # cost more numpy dispatch than the whole capture does now.  Everything
    # is plain Python lists: a page's line count is BOUNDED (~tens,
    # independent of corpus size) and scalar loops beat small-array numpy
    # dispatch at that size (measured; the array variants are in git
    # history).
    lx0, cellw, texts = [], [], []
    for r in lines:
        text = r["text"]
        width = r["x1"] - r["x0"]
        if text and width > 0:
            cellw.append(width / len(text))
            lx0.append(float(r["x0"]))
            texts.append(text)
        else:
            cellw.append(None)
            lx0.append(0.0)
            texts.append("")
    return {"n": len(lines), "x0": x0, "y0": y0, "x1": x1, "y1": y1,
            "cy": [(a + b) / 2.0 for a, b in zip(y0, y1)],
            "cxc": [(a + b) / 2.0 for a, b in zip(x0, x1)],
            "score": [float(r["score"]) for r in lines],
            "lx0": lx0, "cellw": cellw, "text": texts}


def _visible_lines(ctx: dict, region: Tuple[float, float, float, float]):
    """Indices + clipped bboxes of the text_lines visible in an unpadded
    crop region (center inside the region, bbox clipped to it — a region
    crop only "sees" its pixels)."""
    idx_list, clip_list = batch_visible_lines(ctx, [region])
    return idx_list[0], clip_list[0]


def batch_visible_lines(ctx: dict, regions) -> Tuple[list, list]:
    """Visibility of a page's lines in each region crop (center inside the
    region, bbox clipped to it).  Plain scalar loops: both line count and
    region count per page are BOUNDED (~20 x ~7, independent of corpus
    size), where the loop beats the (R x L) numpy broadcast this replaced
    (in git history) on dispatch overhead alone.  Returns parallel lists
    of (line index list, clipped (x0,y0,x1,y1) tuple list) per region."""
    idx_list, clip_list = [], []
    n = ctx["n"]
    x0, y0, x1, y1 = ctx["x0"], ctx["y0"], ctx["x1"], ctx["y1"]
    cxc, cy = ctx["cxc"], ctx["cy"]
    for region in regions:
        rx0, ry0, rx1, ry1 = region
        idx, clips = [], []
        for i in range(n):
            c, m = cxc[i], cy[i]
            if not (rx0 <= c <= rx1 and ry0 <= m <= ry1):
                continue
            cx0 = x0[i] if x0[i] > rx0 else rx0
            cy0_ = y0[i] if y0[i] > ry0 else ry0
            cx1 = x1[i] if x1[i] < rx1 else rx1
            cy1_ = y1[i] if y1[i] < ry1 else ry1
            if cx1 > cx0 and cy1_ > cy0_:
                idx.append(i)
                clips.append((cx0, cy0_, cx1, cy1_))
        idx_list.append(idx)
        clip_list.append(clips)
    return idx_list, clip_list


def mock_ocr(raw_dets: Sequence[dict], frame: dict,
             formula_bboxes_crop: Sequence[Sequence[float]],
             drop_score: float = DROP_SCORE,
             line_ctx: Optional[dict] = None,
             visible=None,
             ) -> List[Tuple[list, Tuple[str, float]]]:
    """OCR a padded region crop.

    Emulates ModifiedPaddleOCR.ocr (paddle_ocr.py:388-450): detect line
    boxes -> ``sorted_boxes`` -> ``merge_det_boxes`` -> ``update_det_boxes``
    with the adjusted formula boxes -> recognize each final box -> drop
    low-score results.  Returns ``[(quad_in_crop_frame, (text, score)), ...]``.

    Recognition model: each visible text_line maps its characters onto a
    uniform x-grid over its bbox; a final det box captures the characters
    whose cell centers fall inside it (in page-frame coordinates).

    ``line_ctx``: the page's precomputed ``build_line_context`` — pass it
    when OCRing several regions of the same page so the char grids are
    built once, not per region.
    """
    if line_ctx is None:
        line_ctx = build_line_context(raw_dets)
    if visible is not None:
        vis_idx, vis_clip = visible       # precomputed page-level broadcast
    else:
        region = (frame["x0"], frame["y0"], frame["x1"], frame["y1"])
        vis_idx, vis_clip = _visible_lines(line_ctx, region)
    if len(vis_idx) == 0:
        return []

    # rect-native det chain (every box here is axis-aligned — the quad
    # layer of the reference API is pure allocation in this hot path;
    # the *_bboxes twins are equivalence-pinned against the quad
    # functions in tests/test_nms_visualize.py)
    boxes = []
    dxc = frame["pad_x"] - frame["x0"]      # bbox_page_to_crop, inlined
    dyc = frame["pad_y"] - frame["y0"]      # (30k regions x ~5 clips)
    fw, fh = frame["width"], frame["height"]
    for clip in vis_clip:
        bx0, by0 = clip[0] + dxc, clip[1] + dyc
        bx1, by1 = clip[2] + dxc, clip[3] + dyc
        if bx1 < 0 or by1 < 0 or bx0 > fw or by0 > fh:
            continue                        # reference drop rule
        boxes.append([bx0, by0, bx1, by1])

    boxes = sort_bboxes_reading_order(boxes)
    boxes = merge_det_bboxes(boxes)
    boxes = mask_bboxes_with_formulas(boxes, formula_bboxes_crop)

    # per-line capture state: the char grid is uniform (cx_i = x0+(i+0.5)*c,
    # strictly increasing), so "chars with lo <= cx <= hi" is an index
    # RANGE — computed arithmetically and boundary-adjusted with the exact
    # grid expression, reproducing the elementwise (cx >= lo) & (cx <= hi)
    # comparisons bit-for-bit.  The visible-index tiebreak is monotone in
    # raw emission order, same as the old position-in-visible-list key.
    import math as _math
    line_cache = []
    for li, clip in zip(vis_idx, vis_clip):
        cell = line_ctx["cellw"][li]
        if cell is None:
            continue
        line_cache.append((int(li), line_ctx["lx0"][li], cell,
                           line_ctx["text"][li],
                           float(clip[0]), float(clip[2]),
                           float(line_ctx["cy"][li]),
                           float(line_ctx["score"][li])))

    results = []
    dx = frame["x0"] - frame["pad_x"]       # quad_crop_to_page offsets
    dy = frame["y0"] - frame["pad_y"]
    for bb in boxes:
        qx0, qy0, qx1, qy1 = bb[0] + dx, bb[1] + dy, bb[2] + dx, bb[3] + dy
        segs = []                             # (x0l, cell, li, i0, i1, text)
        raw_score = None
        for li, x0l, cell, text, c0, c2, cy, score in line_cache:
            if not (qy0 <= cy <= qy1):
                continue
            lo = c0 if c0 > qx0 else qx0      # clip ∩ quad x-range
            hi = c2 if c2 < qx1 else qx1
            if lo > hi:
                continue
            n = len(text)
            # first index with cx >= lo (arith guess, exact-expr adjust)
            i0 = _math.ceil((lo - x0l) / cell - 0.5)
            if i0 < 0:
                i0 = 0
            while i0 > 0 and x0l + ((i0 - 1) + 0.5) * cell >= lo:
                i0 -= 1
            while i0 < n and x0l + (i0 + 0.5) * cell < lo:
                i0 += 1
            # last index with cx <= hi
            i1 = _math.floor((hi - x0l) / cell - 0.5)
            if i1 > n - 1:
                i1 = n - 1
            while i1 < n - 1 and x0l + ((i1 + 1) + 0.5) * cell <= hi:
                i1 += 1
            while i1 >= 0 and x0l + (i1 + 0.5) * cell > hi:
                i1 -= 1
            if i1 < i0:
                continue
            segs.append((x0l, cell, li, i0, i1, text))
            raw_score = score if raw_score is None else min(raw_score, score)
        if not segs:
            continue
        if raw_score < drop_score:  # drop BEFORE rounding (paddle_ocr.py:442-447)
            continue
        if len(segs) == 1:
            # dominant case: one line in the quad — the (cx, li) sort is
            # the identity on a single strictly-increasing grid, so the
            # capture is a plain slice (no per-char tuples)
            x0l, cell, _li, i0, i1, text = segs[0]
            text_out = text[i0:i1 + 1]
        else:
            # multi-line quad: interleave chars by (cx, li) — pairs are
            # unique (each line's grid is strictly increasing), so the
            # char element is never compared
            picked: List[tuple] = []
            for x0l, cell, li, i0, i1, text in segs:
                for i in range(i0, i1 + 1):
                    picked.append((x0l + (i + 0.5) * cell, li, text[i]))
            picked.sort()
            text_out = "".join(p[2] for p in picked)
        results.append((bbox_to_quad(bb), (text_out, round(raw_score, 2))))
    return results


def mock_table(crop_payload: Sequence[dict], det: dict,
               max_time_exceeded: bool = False) -> str:
    """Table parser: deterministic HTML from the crop's table element; an
    over-cap ("straggler") payload yields '' — the max_time analog."""
    if max_time_exceeded:
        return ""
    for raw in crop_payload:
        if raw["kind"] == "table":
            return "<table><tr><td>%s</td></tr></table>" % raw["media_ref"]
    return ""


def ocr_page_text_dets(page_raw_dets: Sequence[dict], dets: Sequence[dict],
                       drop_score: float = DROP_SCORE,
                       line_ctx: Optional[dict] = None) -> List[dict]:
    """Full OCR pass for one page, shared by OCRStage, the fused stage and
    the straight-line oracle: padded frames for every OCR-class region, ONE
    visibility broadcast across all regions (batch_visible_lines), then the
    per-region det->merge->mask->rec chain with coordinates restored to the
    page frame (P4).  Returns the text detections to append, in region
    order."""
    formula_dets = [d for d in dets if d["kind"] in ("inline", "isolated")]
    regions = [d for d in dets if d["kind"] in OCR_CLASSES]
    if not regions:
        return []
    if line_ctx is None:
        line_ctx = build_line_context(page_raw_dets)
    frames = [make_ocr_region_frame(r) for r in regions]
    idx_list, clip_list = batch_visible_lines(
        line_ctx, [(f["x0"], f["y0"], f["x1"], f["y1"]) for f in frames])
    out = []
    for frame, idx, clip in zip(frames, idx_list, clip_list):
        adjusted = adjusted_formula_bboxes(formula_dets, frame)
        for quad, (text, score) in mock_ocr(
                page_raw_dets, frame, adjusted, drop_score=drop_score,
                line_ctx=line_ctx, visible=(idx, clip)):
            bbox = quad_to_bbox(quad_crop_to_page(quad, frame))
            out.append({"kind": "text", "x0": bbox[0], "y0": bbox[1],
                        "x1": bbox[2], "y1": bbox[3],
                        "score": score, "text": text, "media_ref": ""})
    return out


def make_ocr_region_frame(det: dict) -> dict:
    """Padded crop frame for an OCR region (pad 25px both axes,
    pdf2markdown.py:217)."""
    from .schemas import det_to_poly
    return crop_frame(det_to_poly(det), pad_x=25, pad_y=25)


def adjusted_formula_bboxes(formula_dets: Sequence[dict], frame: dict) -> List[list]:
    """Translate page-frame formula boxes into an OCR crop's frame, dropping
    boxes fully outside the canvas (pdf2markdown.py:219-234)."""
    out = []
    for det in formula_dets:
        bbox = [int(det["x0"]), int(det["y0"]), int(det["x1"]), int(det["y1"])]
        adj = bbox_page_to_crop(bbox, frame)
        if adj is not None:
            out.append(adj)
    return out
