"""Real-weights adapter seam (stages/model_adapters.py, M1/M3-M6).

None of the real libraries (doclayout_yolo / ultralytics / unimernet /
paddleocr / struct_eqtable) ship in this sandbox, so construction tests
pin the ImportError gates; wiring tests drive the stage classes through
FAKE adapters injected into REAL_BACKENDS to prove the config-selectable
seam end-to-end (pixel crops, batched recognize, latex normalization)
without any weights.
"""

import base64

import numpy as np
import pyarrow as pa
import pytest

from pdf_extract_kit_ray.schemas import (DET_TYPE, PAGE_DETS_SCHEMA,
                                         RAW_DET_TYPE)
from pdf_extract_kit_ray.stages import model_adapters as ma
from pdf_extract_kit_ray.stages.extract_stages import (LayoutStage, MFDStage,
                                                       MFRStage, OCRStage,
                                                       TableStage)
from pdf_extract_kit_ray.stages.visualize import encode_png


def _page_image_det(w: int, h: int, img: np.ndarray) -> dict:
    payload = ma._B64PNG_PREFIX + base64.b64encode(
        encode_png(img)).decode("ascii")
    return {"kind": ma._PAGE_IMAGE_KIND, "x0": 0, "y0": 0, "x1": w, "y1": h,
            "score": 1.0, "text": "", "media_ref": payload}


def _gradient_img(h: int = 120, w: int = 160) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 255 // max(1, w - 1)).astype(np.uint8),
                     (y * 255 // max(1, h - 1)).astype(np.uint8),
                     np.full((h, w), 7, np.uint8)], axis=-1)


def _pages_batch(raw_dets, dets, w: int = 160, h: int = 120) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(["d1"], pa.string()), pa.array([0], pa.int32()),
         pa.array([w], pa.int32()), pa.array([h], pa.int32()),
         pa.array([raw_dets], pa.list_(RAW_DET_TYPE)),
         pa.array([dets], pa.list_(DET_TYPE))],
        schema=PAGE_DETS_SCHEMA)


# ---------------------------------------------------------------------------
# registry + import gates
# ---------------------------------------------------------------------------

def test_build_backend_unknown_name_lists_known():
    with pytest.raises(NotImplementedError, match="doclayout-yolo"):
        ma.build_backend("layout", "nonsense")
    with pytest.raises(NotImplementedError, match="unknown mfr backend"):
        ma.build_backend("mfr", "nonsense")
    with pytest.raises(NotImplementedError):
        ma.build_backend("no-such-role", "anything")


@pytest.mark.parametrize("role,name,options", [
    ("layout", "doclayout-yolo", {"model_path": "w.pt"}),
    ("mfd", "yolo-mfd", {"model_path": "w.pt"}),
    ("mfr", "unimernet", {"model_path": "w"}),
    ("ocr", "paddleocr", {}),
    ("table", "struct-eqtable", {}),
])
def test_real_backends_import_gated(role, name, options):
    """Every real adapter raises a clear ImportError at CONSTRUCTION (not
    module import) when its library is absent — the sandbox default."""
    with pytest.raises(ImportError, match="sandbox"):
        ma.build_backend(role, name, **options)


@pytest.mark.parametrize("stage_cls,name,options", [
    (LayoutStage, "doclayout-yolo", {"model_path": "w.pt"}),
    (MFDStage, "yolo-mfd", {"model_path": "w.pt"}),
    (MFRStage, "unimernet", {"model_path": "w"}),
    (OCRStage, "paddleocr", {}),
    (TableStage, "struct-eqtable", {}),
])
def test_stage_constructors_surface_the_gate(stage_cls, name, options):
    """The actor-pool classes resolve real backends in __init__ (once per
    actor) and surface the gate there, so a misconfigured pipeline fails at
    actor construction, not mid-corpus."""
    with pytest.raises(ImportError, match="sandbox"):
        stage_cls(backend=name, backend_options=options)
    with pytest.raises(NotImplementedError):
        stage_cls(backend="no-such-backend")


# ---------------------------------------------------------------------------
# pixel helpers
# ---------------------------------------------------------------------------

def test_page_image_round_trip_and_geometry_rejection():
    img = _gradient_img()
    det = _page_image_det(160, 120, img)
    out = ma.page_image_from_raw_dets([det])
    assert out.shape == (120, 160, 3)
    assert np.array_equal(out, img)
    # geometry-only payloads (the synthetic geom:// corpus) must refuse
    geom = {"kind": "title", "x0": 1, "y0": 2, "x1": 3, "y1": 4,
            "score": 1.0, "text": "t", "media_ref": "geom://x"}
    with pytest.raises(ValueError, match="real-PDF ingestion"):
        ma.page_image_from_raw_dets([geom])


def test_crop_image_pad25_white_canvas():
    """P2 crop_img (pdf2markdown.py:41-54): region pasted at (25,25) on a
    WHITE canvas — padding is background, not surrounding page pixels."""
    img = _gradient_img(200, 300)
    det = {"x0": 50, "y0": 60, "x1": 100, "y1": 90}
    crop = ma.crop_image(img, det)
    assert crop.shape == (90 - 60 + 50, 100 - 50 + 50, 3)  # +25 each side
    assert np.array_equal(crop[25:55, 25:75], img[60:90, 50:100])
    assert (crop[:25] == 255).all() and (crop[:, :25] == 255).all()
    assert (crop[55:] == 255).all() and (crop[:, 75:] == 255).all()
    # page-edge region: canvas stays full-size, out-of-page area white
    edge = ma.crop_image(img, {"x0": 5, "y0": 0, "x1": 295, "y1": 198})
    assert edge.shape == (198 + 50, 290 + 50, 3)
    assert np.array_equal(edge[25:223, 25:315], img[0:198, 5:295])
    assert (edge[:25] == 255).all()


def test_det_from_box_int_trunc_2dp():
    d = ma._det_from_box("title", (10.9, 20.1, 30.7, 40.99), 0.876)
    assert (d["x0"], d["y0"], d["x1"], d["y1"]) == (10.0, 20.0, 30.0, 40.0)
    assert d["score"] == 0.88
    assert d["text"] == "" and d["media_ref"] == ""


# ---------------------------------------------------------------------------
# stage wiring through fake adapters (no weights needed)
# ---------------------------------------------------------------------------

class _FakeLayout:
    def __init__(self, tag: str = "t"):
        self.tag = tag

    def __call__(self, raw_dets):
        img = ma.page_image_from_raw_dets(raw_dets)
        h, w = img.shape[:2]
        return [ma._det_from_box("title", (0.0, 0.0, w / 2, h / 2), 0.914)]


class _FakeMFR:
    needs_image = True
    calls = None

    def __init__(self):
        _FakeMFR.calls = []

    def recognize_batch(self, crops):
        _FakeMFR.calls.append([c.shape for c in crops])
        return [f"x ^ {i}  + y" for i in range(len(crops))]


def test_layout_stage_through_injected_real_backend(monkeypatch):
    monkeypatch.setitem(ma.REAL_BACKENDS["layout"], "fake", _FakeLayout)
    stage = LayoutStage(backend="fake", backend_options={"tag": "z"})
    assert stage._detect.tag == "z"          # backend_options reach __init__
    img = _gradient_img()
    batch = _pages_batch([_page_image_det(160, 120, img)], [])
    out = stage(batch).to_pylist()
    (row,) = out
    assert row["dets"] == [{"kind": "title", "x0": 0.0, "y0": 0.0,
                            "x1": 80.0, "y1": 60.0, "score": 0.91,
                            "text": "", "media_ref": ""}]


def test_mfr_stage_batched_pixel_path(monkeypatch):
    """needs_image adapters get pad-25 pixel crops, one recognize_batch call
    per map batch, and latex_compact applied to every result."""
    monkeypatch.setitem(ma.REAL_BACKENDS["mfr"], "fake", _FakeMFR)
    stage = MFRStage(backend="fake")
    img = _gradient_img()
    formula = {"kind": "isolated", "x0": 40.0, "y0": 30.0, "x1": 90.0,
               "y1": 50.0, "score": 0.9, "text": "", "media_ref": ""}
    text = {"kind": "plain text", "x0": 0.0, "y0": 0.0, "x1": 10.0,
            "y1": 10.0, "score": 0.9, "text": "", "media_ref": ""}
    batch = _pages_batch([_page_image_det(160, 120, img)], [text, formula])
    out = stage(batch).to_pylist()
    # exactly one batched call, crop = box + pad-25 clipped to the page
    assert _FakeMFR.calls == [[(50 - 30 + 50, 90 - 40 + 50, 3)]]
    dets = out[0]["dets"]
    assert dets[0]["text"] == ""                       # non-formula untouched
    assert dets[1]["text"] == "x^0+y"                  # latex_compact applied
