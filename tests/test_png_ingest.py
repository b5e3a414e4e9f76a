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

    paths = sorted(glob.glob(os.path.join(DEMO, "*", "*.png")))[:6]
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
    # determinism: second pass gives identical crcs
    df2 = ray.data.from_arrow(tbl).map_batches(
        MediaDecodeStage, concurrency=1, batch_size=4,
        batch_format="pyarrow").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert list(df.content_crc) == list(df2.content_crc)


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
