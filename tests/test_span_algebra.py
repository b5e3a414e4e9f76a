"""Unit tests pinning the span-algebra semantics (FIXTURES.md F3 families).

Each case encodes a boundary behavior of the reference implementation
(file:line cites in the library docstrings)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extract_kit_ray.functions import geometry as G
from pdf_extract_kit_ray.functions import spans as S
from pdf_extract_kit_ray.functions import textnorm as T


# --- intervals -------------------------------------------------------------

def test_merge_intervals_adjacent_and_nested():
    assert G.merge_intervals([[0, 5], [5, 9]]) == [[0, 9]]        # touching merge
    assert G.merge_intervals([[0, 10], [2, 3]]) == [[0, 10]]      # nested
    assert G.merge_intervals([[6, 8], [0, 2]]) == [[0, 2], [6, 8]]
    assert G.merge_intervals([]) == []


def test_remove_intervals_shrinks_by_one():
    # surviving pieces end at mask_start-1 / start at mask_end+1
    assert G.remove_intervals([0, 100], [[40, 60]]) == [[0, 39], [61, 100]]
    assert G.remove_intervals([0, 100], [[0, 100]]) == []          # full mask
    assert G.remove_intervals([10, 20], [[0, 5]]) == [[10, 20]]    # miss
    assert G.remove_intervals([10, 20], [[0, 10]]) == [[11, 20]]   # edge graze


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 100)), max_size=6),
       st.tuples(st.integers(0, 100), st.integers(0, 100)))
@settings(max_examples=200, deadline=None)
def test_remove_intervals_output_within_original(masks, orig):
    masks = [[min(a, b), max(a, b)] for a, b in masks]
    lo, hi = min(orig), max(orig)
    for p_lo, p_hi in G.remove_intervals([lo, hi], masks):
        assert lo <= p_lo <= p_hi <= hi


# --- y-overlap predicate ---------------------------------------------------

def test_y_overlap_exactly_threshold_is_false():
    # overlap/min_height == 0.8 exactly -> strict > -> False
    assert not G.y_overlap_exceeds([0, 0, 1, 10], [0, 2, 1, 12])   # 8/10
    assert G.y_overlap_exceeds([0, 0, 1, 10], [0, 1, 1, 11])       # 9/10
    assert not G.y_overlap_exceeds([0, 0, 1, 10], [0, 20, 1, 30])  # disjoint


# --- sorted_boxes ----------------------------------------------------------

def _quad(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_sorted_boxes_bubble_within_10px():
    a = _quad(300, 100, 400, 120)
    b = _quad(50, 105, 150, 125)     # 5px lower but further left -> swaps
    assert G.sort_quads_reading_order([a, b]) == [b, a]
    c = _quad(50, 115, 150, 135)     # 15px lower -> no swap
    assert G.sort_quads_reading_order([a, c]) == [a, c]


# --- det-box merge ---------------------------------------------------------

def test_merge_det_quads_joins_x_overlap_same_line():
    a = _quad(0, 0, 50, 20)
    b = _quad(45, 1, 90, 21)         # x-overlaps a, same line
    c = _quad(0, 100, 50, 120)       # different line
    merged = G.merge_det_quads([a, b, c])
    assert merged == [_quad(0, 0, 90, 21), c]


def test_merge_det_quads_keeps_gap():
    a = _quad(0, 0, 40, 20)
    b = _quad(60, 0, 90, 20)         # gap on x -> stays split
    assert G.merge_det_quads([a, b]) == [a, b]


# --- formula masking -------------------------------------------------------

def test_mask_quads_splits_text_around_formula():
    text = _quad(0, 0, 100, 20)
    out = G.mask_quads_with_formulas([text], [[40, 2, 60, 18]])
    assert out == [_quad(0, 0, 39, 20), _quad(61, 0, 100, 20)]


def test_mask_quads_ignores_non_overlapping_formula():
    text = _quad(0, 0, 100, 20)
    out = G.mask_quads_with_formulas([text], [[40, 100, 60, 120]])
    assert out == [text]


def test_mask_quads_full_mask_drops_box():
    text = _quad(10, 0, 90, 20)
    assert G.mask_quads_with_formulas([text], [[0, 0, 100, 20]]) == []


# --- crop frame transforms -------------------------------------------------

def test_crop_frame_pad25_roundtrip():
    poly = [100, 200, 400, 200, 400, 260, 100, 260]
    f = G.crop_frame(poly)
    assert (f["width"], f["height"]) == (350, 110)
    inside = G.bbox_page_to_crop([150, 210, 200, 230], f)
    assert inside == [75, 35, 125, 55]
    back = G.quad_crop_to_page(G.bbox_to_quad(inside), f)
    assert G.quad_to_bbox(back) == [150, 210, 200, 230]


def test_crop_frame_outside_dropped():
    f = G.crop_frame([100, 200, 400, 200, 400, 260, 100, 260])
    assert G.bbox_page_to_crop([0, 0, 40, 100], f) is None    # x1<0 after shift
    assert G.bbox_page_to_crop([500, 190, 600, 230], f) is None  # x0>width
    # the filter is deliberately weak: a box straddling the right edge stays
    assert G.bbox_page_to_crop([350, 210, 500, 230], f) is not None


# --- fill/consumption ------------------------------------------------------

def _block(kind, x0, y0, x1, y1):
    return {"kind": kind, "poly": [x0, y0, x1, y0, x1, y1, x0, y1], "score": 0.9}


def test_fill_spans_first_block_wins():
    b1 = _block("plain text", 0, 0, 100, 100)
    b2 = _block("plain text", 0, 0, 100, 100)   # identical box, later in order
    span = {"type": "text", "bbox": [10, 10, 90, 90], "content": "hi"}
    filled, left = S.fill_spans_in_blocks([b1, b2], [span], 0.6)
    assert len(filled[0]["spans"]) == 1 and filled[1]["spans"] == []
    assert left == []


def test_fill_spans_ratio_strictly_greater():
    b = _block("plain text", 0, 0, 50, 100)
    # span half-in: ratio exactly 0.5 < 0.6 -> unclaimed
    span = {"type": "text", "bbox": [0, 0, 100, 100], "content": "x"}
    filled, left = S.fill_spans_in_blocks([b], [span], 0.6)
    assert filled[0]["spans"] == [] and left == [span]


def test_isolated_span_forces_new_line_and_demotion():
    iso = {"type": "isolated", "bbox": [0, 0, 100, 20], "content": "E=mc^2"}
    txt = {"type": "text", "bbox": [0, 2, 100, 18], "content": "hello"}
    # in a text block the isolated span demotes to inline -> single line
    b = {"type": "plain text", "bbox": [0, 0, 100, 20], "saved_info": {},
         "spans": [dict(iso), dict(txt)]}
    fixed = S.fix_block_spans([b])[0]
    assert len(fixed["lines"]) == 1
    assert all(sp["type"] != "isolated" for sp in fixed["lines"][0]["spans"])
    # in an isolate_formula block it stays isolated -> forces line split
    b2 = {"type": "isolate_formula", "bbox": [0, 0, 100, 20], "saved_info": {},
          "spans": [dict(iso), dict(txt)]}
    fixed2 = S.fix_block_spans([b2])[0]
    assert len(fixed2["lines"]) == 2


# --- paragraph merge -------------------------------------------------------

def _line(*spans):
    return {"bbox": [0, 0, 10, 10], "spans": list(spans)}


def test_merge_para_en_spacing_and_wrapping():
    block = {"lines": [_line(
        {"type": "text", "bbox": [0, 0, 10, 10], "content": "a*b"},
        {"type": "inline", "bbox": [10, 0, 20, 10], "content": "$x+1$"},
        {"type": "footnote", "bbox": [20, 0, 30, 10], "content": "2"},
    )]}
    assert S.merge_para_with_text(block) == "a\\*b $x+1$ $^2$ "


def test_merge_para_zh_no_spaces():
    block = {"lines": [_line(
        {"type": "text", "bbox": [0, 0, 10, 10], "content": "你好"},
        {"type": "inline", "bbox": [10, 0, 20, 10], "content": "x"},
    )]}
    assert S.merge_para_with_text(block) == "你好$x$"


def test_merge_para_isolated_block():
    block = {"lines": [_line({"type": "isolated", "bbox": [0, 0, 10, 10],
                              "content": "\\sum x"})]}
    assert S.merge_para_with_text(block) == "$$\n\\sum x\n$$ "


# --- normalizers -----------------------------------------------------------

def test_latex_compact():
    assert T.latex_compact("x + y") == "x+y"
    assert T.latex_compact("\\alpha  \\beta") == "\\alpha\\beta"
    assert T.latex_compact("\\operatorname {foo bar} + 1") == "\\operatorname{foobar}+1"
    assert T.latex_compact("a ^ 2") == "a^2"


def test_escape_markdown():
    assert T.escape_markdown("a*b`c~d$e") == "a\\*b\\`c\\~d\\$e"


def test_detect_lang_boundary():
    assert T.detect_lang("abc") == "en"
    assert T.detect_lang("abc中") == "zh"
    assert T.detect_lang("") == "en"


# --- reading order ---------------------------------------------------------

def test_reading_order_key_row_major():
    top_right = [1000, 100, 1200, 100, 1200, 150, 1000, 150]
    below_left = [100, 101, 300, 101, 300, 150, 100, 150]
    assert G.reading_order_key(top_right) < G.reading_order_key(below_left)
    same_y_left = [100, 100, 300, 100, 300, 150, 100, 150]
    assert G.reading_order_key(same_y_left) < G.reading_order_key(top_right)


def test_column_split_detection_and_ordering():
    from pdf_extract_kit_ray.functions.assemble import (detect_column_split,
                                                        order_blocks_columns)
    def blk(x0, y0, x1, y1, kind="plain text"):
        return {"kind": kind, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                "score": 0.9, "text": "", "media_ref": ""}
    # two clean columns on a 1000-wide page
    left = [blk(50, y, 450, y + 80) for y in (100, 300, 500)]
    right = [blk(550, y, 950, y + 80) for y in (100, 300, 500)]
    blocks = [right[0], left[1], left[0], right[2], right[1], left[2]]
    split = detect_column_split(blocks, 1000)
    assert split is not None and 450 <= split <= 550
    ordered = order_blocks_columns(blocks, 1000)
    assert [(b["x0"], b["y0"]) for b in ordered] == \
        [(50, 100), (50, 300), (50, 500), (550, 100), (550, 300), (550, 500)]
    # a full-width block crossing the gutter kills the split
    assert detect_column_split(blocks + [blk(100, 700, 900, 780)], 1000) is None
    # single-column pages keep the reference order
    single = [blk(50, y, 950, y + 50) for y in (400, 100, 250)]
    assert [b["y0"] for b in order_blocks_columns(single, 1000)] == [100, 250, 400]


def test_reading_order_columns_mode_runs_and_differs(ray_session):
    """The optional mode must be plumbed end-to-end; default mode is pinned
    by the golden e2e tests elsewhere."""
    import ray.data
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents)
    from pdf_extract_kit_ray.schemas import DOC_SCHEMA
    from pdf_extract_kit_ray.sources.corpus import generate_raw_document
    import pyarrow as pa
    rows = [{"doc_id": "doc-%02d" % i,
             "spans": generate_raw_document("doc-%02d" % i, seed=4, n_pages=3)}
            for i in range(6)]
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    ref = extract_documents(ray.data.from_arrow(raw),
                            ExtractConfig.for_cpus(4)).take_all()
    cols = extract_documents(
        ray.data.from_arrow(raw),
        ExtractConfig.for_cpus(4, reading_order="columns")).take_all()
    # same docs, same span multiset per doc (ordering may differ)
    assert {r["doc_id"] for r in ref} == {r["doc_id"] for r in cols}
    for r_ref in ref:
        r_col = next(r for r in cols if r["doc_id"] == r_ref["doc_id"])
        key = lambda s: (s["kind"], s["text"], s["media_ref"])  # noqa: E731
        assert sorted(map(key, r_ref["spans"])) == \
            sorted(map(key, r_col["spans"]))
