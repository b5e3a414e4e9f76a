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
