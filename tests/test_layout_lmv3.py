"""M2 LayoutLMv3-analog head: detectron2 ROI-heads post-processing semantics
(class-wise NMS + score-descending emission + threshold) that the corpus
cannot exercise (its generated blocks never overlap).  Reference:
tasks/layout_detection/models/layoutlmv3_util/model_init.py:71,119-141."""

from pdf_extract_kit_ray.mocks import (LAYOUT_BACKENDS, mock_layout,
                                       mock_layout_lmv3)


def raw(kind, x0, y0, x1, y1, score, text="", media_ref=""):
    return {"kind": kind, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
            "score": score, "text": text, "media_ref": media_ref}


def test_classwise_nms_suppresses_same_class_overlap():
    dets = mock_layout_lmv3([
        raw("plain_text", 0, 0, 100, 100, 0.90),
        raw("plain_text", 10, 10, 110, 110, 0.80),   # IoU ~0.68 with first
        raw("plain_text", 500, 500, 600, 600, 0.70),  # disjoint
    ])
    assert [(d["kind"], d["score"]) for d in dets] == [
        ("plain text", 0.90), ("plain text", 0.70)]


def test_cross_class_overlap_survives_nms():
    # class-wise NMS: a figure_caption fully inside a figure is kept
    dets = mock_layout_lmv3([
        raw("figure", 0, 0, 200, 200, 0.95, media_ref="m://1"),
        raw("figure_caption", 20, 150, 180, 195, 0.60),
    ])
    assert sorted(d["kind"] for d in dets) == ["figure", "figure_caption"]


def test_emission_is_score_descending_with_index_ties():
    dets = mock_layout_lmv3([
        raw("title", 0, 0, 50, 20, 0.66),
        raw("plain_text", 0, 30, 50, 60, 0.99),
        raw("abandon", 0, 70, 50, 90, 0.66),   # tie with title -> raw order
    ])
    assert [(d["kind"], d["score"]) for d in dets] == [
        ("plain text", 0.99), ("title", 0.66), ("abandon", 0.66)]
    # vs the YOLO mock's raw emission order on identical input
    yolo = mock_layout([
        raw("title", 0, 0, 50, 20, 0.66),
        raw("plain_text", 0, 30, 50, 60, 0.99),
        raw("abandon", 0, 70, 50, 90, 0.66),
    ])
    assert [d["kind"] for d in yolo] == ["title", "plain text", "abandon"]


def test_threshold_and_registry_alias():
    dets = mock_layout_lmv3([raw("title", 0, 0, 50, 20, 0.44)])
    assert dets == []                        # below the 0.5 analog threshold
    assert LAYOUT_BACKENDS["mock2"] is mock_layout_lmv3
    assert LAYOUT_BACKENDS["layoutlmv3-mock"] is mock_layout_lmv3


def test_no_isolate_formula_class_emission():
    # the MFD 'isolated' det becomes the isolate_formula block downstream;
    # the head must not emit a duplicate class-8 box (LAYOUT_KIND_MAP note)
    dets = mock_layout_lmv3([raw("isolated_formula", 0, 0, 90, 30, 0.93)])
    assert dets == []
