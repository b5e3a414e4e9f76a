"""Import-gated REAL model backends for the extraction actor pools
(M1, M3–M6).

The sandbox mandate keeps the default backends deterministic mocks
(mocks.py); this module is the production seam: one adapter per model
stage, loading the real weights inside ``__init__`` (once per actor, the
actor-pool contract) and exposing the SAME calling convention the stage
classes already use, so switching is a config string —

    ExtractConfig(layout_backend="doclayout-yolo")           # or
    stages: [{name: layout, options: {backend: doclayout-yolo,
                                      backend_options: {model_path: ...}}}]

Every adapter raises a clear ``ImportError`` at construction when its
library is absent (none are installed here), never at module import —
this file must import cleanly in the sandbox so the registry can list the
names.

Reference calling conventions replicated (file:line):
* M1 DocLayout-YOLO  — tasks/layout_detection/models/yolo.py:30-70
  (``YOLOv10(model_path)`` with an ``ultralytics.YOLO`` fallback;
  ``predict(img, imgsz, conf, iou, verbose=False, device)``; class ids
  0..9 -> title/plain text/abandon/figure/figure_caption/table/
  table_caption/table_footnote/isolate_formula/formula_caption).
* M3 YOLO MFD        — tasks/formula_detection/models/yolo.py:12-60
  (ids 0 -> inline, 1 -> isolated).
* M4 UniMERNet       — tasks/formula_recognition/models/unimernet.py:20-50
  (model + vis_processor pair, batched generate, batch 128 upstream).
* M5 ModifiedPaddleOCR — tasks/ocr/models/paddle_ocr.py:292-310
  (``ocr(img, mfd_res=...)`` masks formula regions during det).
* M6 StructEqTable   — tasks/table_parsing/models/struct_eqtable.py:9-52
  (``build_model(..., max_time=30)``; the stage's element cap is the
  distributed re-expression of that straggler cap).

Real adapters consume page PIXELS, not geometry: pages must come from the
real-PDF ingestion seam (sources/pdf_ingest.py), whose ``page_image`` det
carries a ``b64png://`` payload.  ``needs_image = True`` on an adapter
tells the stage to hand it decoded crops instead of geometry payloads.
"""

from __future__ import annotations

import base64
from typing import Dict, List, Optional, Sequence

import numpy as np

# kept in sync with sources/pdf_ingest.py (no import cycle: literals)
_B64PNG_PREFIX = "b64png://"
_PAGE_IMAGE_KIND = "page_image"

# M1 class map — tasks/layout_detection/models/yolo.py:18-29, verbatim
LAYOUT_ID_TO_NAMES = {
    0: "title",
    1: "plain text",
    2: "abandon",
    3: "figure",
    4: "figure_caption",
    5: "table",
    6: "table_caption",
    7: "table_footnote",
    8: "isolate_formula",
    9: "formula_caption",
}

# M3 class map — tasks/formula_detection/models/yolo.py:22-25
MFD_ID_TO_NAMES = {0: "inline", 1: "isolated"}


def page_image_from_raw_dets(raw_dets: Sequence[dict]) -> np.ndarray:
    """Decode the page raster from a real-ingestion page payload (the
    single ``page_image`` det's ``b64png://`` media_ref).  Raises on
    geometry-only payloads — synthetic geom:// corpora cannot feed real
    model backends."""
    from .visualize import decode_png

    for det in raw_dets:
        ref = det.get("media_ref", "")
        if det.get("kind") == _PAGE_IMAGE_KIND and \
                ref.startswith(_B64PNG_PREFIX):
            return decode_png(base64.b64decode(ref[len(_B64PNG_PREFIX):]))
    raise ValueError(
        "no page_image payload in raw_dets — real model backends need "
        "pages from the real-PDF ingestion seam (sources/pdf_ingest), "
        "not synthetic geom:// corpora")


def crop_image(img: np.ndarray, det: dict, pad: int = 25) -> np.ndarray:
    """P2 ``crop_img`` pad-25 on pixels (pdf2markdown.py:41-54): paste
    the int-truncated region onto a WHITE canvas of (w+2*pad, h+2*pad)
    at (pad, pad) — the padding is white background, never surrounding
    page pixels, so downstream quad restoration can subtract a constant
    (pad) offset.  Out-of-page extents clip at the source (the canvas
    stays full-size, extra area stays white)."""
    h, w = img.shape[:2]
    x0, y0 = int(det["x0"]), int(det["y0"])
    x1, y1 = int(det["x1"]), int(det["y1"])
    canvas = np.full((y1 - y0 + 2 * pad, x1 - x0 + 2 * pad)
                     + img.shape[2:], 255, img.dtype)
    sy0, sy1 = max(0, y0), max(0, min(h, y1))
    sx0, sx1 = max(0, x0), max(0, min(w, x1))
    if sy1 > sy0 and sx1 > sx0:
        canvas[pad + sy0 - y0: pad + sy1 - y0,
               pad + sx0 - x0: pad + sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return canvas


def _det_from_box(kind: str, box, score: float) -> dict:
    """P1 convert_format on a real model box: int-truncated coords, 2dp
    score (mocks.py:107 ``_det`` twin for float inputs)."""
    x0, y0, x1, y1 = (float(int(v)) for v in box)
    return {"kind": kind, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
            "score": round(float(score), 2), "text": "", "media_ref": ""}


class DocLayoutYOLOAdapter:
    """M1: real DocLayout-YOLO layout detector (ultralytics fallback)."""

    needs_image = True

    def __init__(self, model_path: str, img_size: int = 1280,
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 device: str = "cpu",
                 id_to_names: Optional[Dict[int, str]] = None):
        try:
            from doclayout_yolo import YOLOv10 as _Model
        except ImportError:
            try:
                from ultralytics import YOLO as _Model
            except ImportError:
                raise ImportError(
                    "layout backend 'doclayout-yolo' needs the "
                    "doclayout_yolo (or ultralytics) package + weights; "
                    "neither is installed in this sandbox — use the "
                    "'mock'/'mock2' backends here")
        self.model = _Model(model_path)
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.device = device
        self.id_to_names = id_to_names or LAYOUT_ID_TO_NAMES

    def __call__(self, raw_dets: Sequence[dict]) -> List[dict]:
        img = page_image_from_raw_dets(raw_dets)
        result = self.model.predict(
            img, imgsz=self.img_size, conf=self.conf_thres,
            iou=self.iou_thres, verbose=False, device=self.device)[0]
        boxes = result.boxes.xyxy.cpu().numpy()
        classes = result.boxes.cls.cpu().numpy()
        scores = result.boxes.conf.cpu().numpy()
        return [_det_from_box(self.id_to_names[int(c)], b, s)
                for b, c, s in zip(boxes, classes, scores)]


class YOLOMFDAdapter(DocLayoutYOLOAdapter):
    """M3: real YOLO formula detector — the layout adapter's predict loop
    with the 2-class formula map and ultralytics-only loading."""

    def __init__(self, model_path: str, img_size: int = 1280,
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 device: str = "cpu"):
        try:
            from ultralytics import YOLO as _Model
        except ImportError:
            raise ImportError(
                "mfd backend 'yolo-mfd' needs the ultralytics package + "
                "weights; not installed in this sandbox — use 'mock'")
        self.model = _Model(model_path)
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.device = device
        self.id_to_names = MFD_ID_TO_NAMES


class UniMERNetAdapter:
    """M4: real UniMERNet formula recognizer.  ``recognize_batch`` is the
    stage's preferred entry — true batched generation in ``batch_size``
    chunks (the reference's cross-page batch-128, pdf2markdown.py:176-190)."""

    needs_image = True

    def __init__(self, model_path: str, cfg_path: str = None,
                 batch_size: int = 128, device: str = "cpu"):
        try:
            import torch
            import unimernet.tasks as tasks
            from unimernet.common.config import Config
            from unimernet.processors import load_processor
        except ImportError:
            raise ImportError(
                "mfr backend 'unimernet' needs torch + unimernet + "
                "weights; not installed in this sandbox — use 'mock'")
        import argparse
        import os
        args = argparse.Namespace(cfg_path=cfg_path, options=None)
        cfg = Config(args)
        cfg.config.model.pretrained = os.path.join(
            model_path, "pytorch_model.pth")
        cfg.config.model.model_config.model_name = model_path
        cfg.config.model.tokenizer_config.path = model_path
        task = tasks.setup_task(cfg)
        self.device = torch.device(device)
        self.model = task.build_model(cfg).to(self.device)
        self.vis_processor = load_processor(
            "formula_image_eval",
            cfg.config.datasets.formula_rec_eval.vis_processor.eval)
        self.batch_size = batch_size
        self._torch = torch

    def recognize_batch(self, crop_images: Sequence[np.ndarray]) -> List[str]:
        out: List[str] = []
        torch = self._torch
        for lo in range(0, len(crop_images), self.batch_size):
            chunk = crop_images[lo:lo + self.batch_size]
            tensors = torch.stack([
                self.vis_processor(img).to(self.device) for img in chunk])
            with torch.no_grad():
                res = self.model.generate({"image": tensors})
            out.extend(res["pred_str"])
        return out

    def __call__(self, crop_image_arr: np.ndarray, det: dict) -> str:
        return self.recognize_batch([crop_image_arr])[0]


class PaddleOCRAdapter:
    """M5: real ModifiedPaddleOCR text-line det+rec over padded region
    crops, with formula boxes passed as ``mfd_res`` so the detector masks
    them (paddle_ocr.py:310, the update_det_boxes path).  Returns the text
    detections to append for one page, region order — the
    ``ocr_page_text_dets`` convention."""

    needs_image = True

    def __init__(self, drop_score: float = 0.5, **paddle_kwargs):
        try:
            from paddleocr import PaddleOCR  # noqa: F401
        except ImportError:
            raise ImportError(
                "ocr backend 'paddleocr' needs the paddleocr package + "
                "weights; not installed in this sandbox — use 'mock'")
        # the reference subclasses PaddleOCR (ModifiedPaddleOCR) to accept
        # mfd_res; recent paddleocr exposes the same through det kwargs —
        # keep the wrapper thin and version-tolerant
        from paddleocr import PaddleOCR as _P
        self.engine = _P(use_angle_cls=True, show_log=False,
                         **paddle_kwargs)
        self.drop_score = drop_score

    def __call__(self, page_raw_dets: Sequence[dict],
                 dets: Sequence[dict],
                 drop_score: Optional[float] = None) -> List[dict]:
        from ..functions.geometry import quad_crop_to_page, quad_to_bbox
        from ..mocks import (OCR_CLASSES, adjusted_formula_bboxes,
                             make_ocr_region_frame)

        ds = self.drop_score if drop_score is None else drop_score
        img = page_image_from_raw_dets(page_raw_dets)
        formula_dets = [d for d in dets
                        if d["kind"] in ("inline", "isolated")]
        out: List[dict] = []
        for region in dets:
            if region["kind"] not in OCR_CLASSES:
                continue
            frame = make_ocr_region_frame(region)
            # the engine sees the reference's padded WHITE canvas (same
            # geometry as `frame`), so its quads restore with the
            # constant pad offset in quad_crop_to_page
            crop = crop_image(img, region)
            mfd_res = adjusted_formula_bboxes(formula_dets, frame)
            res = self.engine.ocr(crop, cls=True, mfd_res=mfd_res or None)
            for line in (res[0] or []):
                quad, (text, score) = line
                if score < ds:           # drop BEFORE rounding
                    continue
                bbox = quad_to_bbox(quad_crop_to_page(quad, frame))
                out.append({"kind": "text",
                            "x0": bbox[0], "y0": bbox[1],
                            "x1": bbox[2], "y1": bbox[3],
                            "score": round(float(score), 2),
                            "text": text, "media_ref": ""})
        return out


class StructEqTableAdapter:
    """M6: real StructEqTable table-to-source parser; the model's own
    ``max_time`` straggler cap rides in ``build_model`` while the stage's
    element cap stays the distributed pre-filter."""

    needs_image = True

    def __init__(self, model_path: str = "U4R/StructTable-InternVL2-1B",
                 max_new_tokens: int = 1024, max_time: int = 30,
                 output_format: str = "html", **build_kwargs):
        try:
            from struct_eqtable import build_model
        except ImportError:
            raise ImportError(
                "table backend 'struct-eqtable' needs the struct_eqtable "
                "package + weights (CUDA); not installed in this sandbox "
                "— use 'mock'")
        self.model = build_model(model_ckpt=model_path,
                                 max_new_tokens=max_new_tokens,
                                 max_time=max_time, **build_kwargs)
        self.output_format = output_format

    def __call__(self, crop_image_arr: np.ndarray, det: dict,
                 max_time_exceeded: bool = False) -> str:
        if max_time_exceeded:
            return ""
        from PIL import Image
        img = Image.fromarray(crop_image_arr)
        return self.model([img], output_format=self.output_format)[0]


REAL_BACKENDS: Dict[str, Dict[str, type]] = {
    "layout": {"doclayout-yolo": DocLayoutYOLOAdapter},
    "mfd": {"yolo-mfd": YOLOMFDAdapter},
    "mfr": {"unimernet": UniMERNetAdapter},
    "ocr": {"paddleocr": PaddleOCRAdapter},
    "table": {"struct-eqtable": StructEqTableAdapter},
}


def build_backend(role: str, name: str, **options):
    """Resolve a REAL backend by (stage role, config name) and construct it
    (loads weights — call from an actor ``__init__`` only).  Unknown names
    raise NotImplementedError listing what exists; known names without the
    library installed raise ImportError from the adapter."""
    reg = REAL_BACKENDS.get(role, {})
    if name not in reg:
        raise NotImplementedError(
            f"unknown {role} backend {name!r}; real backends: "
            f"{sorted(reg)} (mock backends are resolved by the stage)")
    return reg[name](**options)
