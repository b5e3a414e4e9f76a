"""Real-image ingestion: the pure-stdlib PNG decoder and the media stage
chain over the reference's ACTUAL demo assets (read-only)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

DEMO = "/root/reference/assets/demo"


def test_png_roundtrip_random():
    from pdf_extract_kit_ray.stages.visualize import decode_png, encode_png
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (23, 41, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="reference assets absent")
def test_reference_demo_pngs_through_media_stage(ray_session):
    """Every demo PNG decodes through MediaDecodeStage with positive
    dimensions and a deterministic content crc — the real-image path of
    the otherwise-synthetic media chain."""
    import ray.data
    from pdf_extract_kit_ray.stages.media import MediaDecodeStage

    paths = sorted(glob.glob(os.path.join(DEMO, "*", "*.png")),
                   key=os.path.getsize)[:6]
    assert paths, "no demo PNGs found"
    tbl = pa.table({
        "media_id": pa.array(range(len(paths)), pa.int64()),
        "payload": pa.array([open(p, "rb").read() for p in paths],
                            pa.binary()),
    })
    ds = ray.data.from_arrow(tbl).map_batches(
        MediaDecodeStage, concurrency=1, batch_size=4,
        batch_format="pyarrow")
    df = ds.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(df) == len(paths)
    assert (df["kind"] == "image").all()
    assert (df["width"] > 0).all() and (df["height"] > 0).all()
    # determinism: second pass over the 3 smallest gives identical crcs
    small = tbl.slice(0, 3)
    df2 = ray.data.from_arrow(small).map_batches(
        MediaDecodeStage, concurrency=1, batch_size=4,
        batch_format="pyarrow").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert list(df.content_crc[:3]) == list(df2.content_crc)


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="reference assets absent")
def test_demo_png_ocr_preprocess(ray_session):
    """A real demo page image survives the P11 OCR preprocess chain
    (alpha composite -> Otsu binarize)."""
    import ray.data
    from pdf_extract_kit_ray.stages.media import ImagePreprocessStage

    p = os.path.join(DEMO, "formula_recognition", "sce.png")
    tbl = pa.table({"media_id": pa.array([0], pa.int64()),
                    "payload": pa.array([open(p, "rb").read()], pa.binary())})
    df = ray.data.from_arrow(tbl).map_batches(
        ImagePreprocessStage, concurrency=1, batch_size=1,
        batch_format="pyarrow").to_pandas()
    assert len(df) == 1


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="reference assets absent")
def test_overlay_on_real_page_image():
    """Detection boxes render ONTO a real decoded demo page (the
    reference's draw-on-page behavior), and the output PNG round-trips."""
    from pdf_extract_kit_ray.stages.visualize import (decode_png,
                                                      page_to_png)
    p = os.path.join(DEMO, "layout_detection", "exam_paper.png")
    page = decode_png(open(p, "rb").read())
    h, w = page.shape[:2]
    dets = [{"kind": "title", "x0": 10, "y0": 10, "x1": w // 2,
             "y1": h // 10, "score": 0.9}]
    png = page_to_png(w, h, dets, scale=0.1, background=page)
    out = decode_png(png)
    assert out.shape == (max(1, int(h * 0.1)), max(1, int(w * 0.1)), 3)
    # the canvas is the page, not white: plenty of non-255 pixels
    assert (out != 255).mean() > 0.05
