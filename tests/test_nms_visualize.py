"""NMS re-filter (reference P14) and SVG debug sink unit coverage."""

from pdf_extract_kit_ray.functions.geometry import iou, nms_bboxes
from pdf_extract_kit_ray.stages.visualize import CLASS_COLORS, page_to_svg


def test_iou_basics():
    assert iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert iou([0, 0, 10, 10], [10, 0, 20, 10]) == 0.0   # touching edges
    assert abs(iou([0, 0, 10, 10], [5, 0, 15, 10]) - 1 / 3) < 1e-12


def test_nms_suppresses_overlaps_keeps_disjoint():
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]
    scores = [0.9, 0.8, 0.7]
    kept = nms_bboxes(boxes, scores, iou_threshold=0.5)
    assert kept == [0, 2]
    # threshold above the overlap keeps everything
    assert nms_bboxes(boxes, scores, iou_threshold=0.99) == [0, 1, 2]


def test_nms_deterministic_tiebreak():
    boxes = [[0, 0, 10, 10], [0, 0, 10, 10]]
    assert nms_bboxes(boxes, [0.5, 0.5], iou_threshold=0.9) == [0]


def test_page_to_svg_well_formed():
    dets = [{"kind": "title", "x0": 10.0, "y0": 20.0, "x1": 110.0,
             "y1": 40.0, "score": 0.93},
            {"kind": "unknown<kind>", "x0": 0.0, "y0": 5.0, "x1": 9.0,
             "y1": 9.0, "score": 0.5}]
    svg = page_to_svg(100, 200, dets)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert CLASS_COLORS["title"] in svg
    assert "unknown&lt;kind&gt; 0.50" in svg     # labels are escaped
    import xml.etree.ElementTree as ET
    ET.fromstring(svg)                            # parses as XML


def test_png_encoder_roundtrip():
    """encode_png emits a valid PNG (magic, IHDR dims, CRC-checked chunks,
    IDAT inflating to exactly the filtered scanline bytes)."""
    import struct
    import zlib

    import numpy as np

    from pdf_extract_kit_ray.stages.visualize import encode_png
    rgb = np.zeros((5, 7, 3), np.uint8)
    rgb[2, 3] = (10, 20, 30)
    png = encode_png(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR
    ln, tag = struct.unpack(">I4s", png[8:16])
    w, h = struct.unpack(">II", png[16:24])
    assert tag == b"IHDR" and (w, h) == (7, 5)
    # walk chunks, verify CRCs, inflate IDAT
    off, idat = 8, b""
    while off < len(png):
        ln, tag = struct.unpack(">I4s", png[off:off + 8])
        payload = png[off + 8:off + 8 + ln]
        crc = struct.unpack(">I", png[off + 8 + ln:off + 12 + ln])[0]
        assert crc == zlib.crc32(tag + payload)
        if tag == b"IDAT":
            idat += payload
        off += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 5 * (1 + 7 * 3)
    # row 2, pixel 3 carries the planted color (after the filter byte)
    row = raw[2 * (1 + 21):][:22]
    assert row[0] == 0 and tuple(row[1 + 9:1 + 12]) == (10, 20, 30)


def test_visualize_stage_png(tmp_path):
    import numpy as np
    import pyarrow as pa

    from pdf_extract_kit_ray.stages.visualize import VisualizeStage
    batch = pa.table({
        "doc_id": ["d1"], "page_no": [0], "width": [200], "height": [100],
        "dets": [[{"kind": "title", "x0": 40.0, "y0": 20.0,
                   "x1": 120.0, "y1": 60.0, "score": 0.9,
                   "text": "", "media_ref": ""}]],
    })
    out = VisualizeStage(str(tmp_path), fmt="png", png_scale=1.0)(batch)
    assert out.equals(batch)                      # passthrough
    png = (tmp_path / "d1_page_0001.png").read_bytes()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # deterministic: file bytes equal an in-memory re-render
    from pdf_extract_kit_ray.stages.visualize import page_to_png
    assert png == page_to_png(200, 100, batch.column("dets")[0].as_py(), 1.0)


def test_rect_native_det_chain_equals_quad_chain():
    """The *_bboxes hot-path twins must reproduce the quad chain exactly
    on axis-aligned inputs (randomized boxes + formula masks)."""
    import random

    from pdf_extract_kit_ray.functions.geometry import (
        bbox_to_quad, mask_bboxes_with_formulas, mask_quads_with_formulas,
        merge_det_bboxes, merge_det_quads, quad_to_bbox,
        sort_bboxes_reading_order, sort_quads_reading_order)

    rng = random.Random(42)
    for _ in range(50):
        boxes = []
        for _b in range(rng.randrange(0, 14)):
            x0 = rng.uniform(0, 900)
            y0 = rng.uniform(0, 1200)
            boxes.append([x0, y0, x0 + rng.uniform(5, 300),
                          y0 + rng.uniform(5, 28)])
        formulas = []
        for _f in range(rng.randrange(0, 4)):
            x0 = rng.uniform(0, 900)
            y0 = rng.uniform(0, 1200)
            formulas.append([x0, y0, x0 + rng.uniform(5, 120),
                             y0 + rng.uniform(5, 24)])
        quads = [bbox_to_quad(b) for b in boxes]
        q = mask_quads_with_formulas(
            merge_det_quads(sort_quads_reading_order(quads)), formulas)
        r = mask_bboxes_with_formulas(
            merge_det_bboxes(sort_bboxes_reading_order(boxes)), formulas)
        assert [quad_to_bbox(x) for x in q] == [list(b) for b in r]
