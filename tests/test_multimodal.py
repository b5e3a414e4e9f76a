"""Multimodal stage contracts: container round-trip, determinism, stage
schemas, stub gating, and pipeline composition."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_extract_kit_ray.sources.media import (encode_audio, encode_image,
                                               encode_video, media_row,
                                               write_media_table)
from pdf_extract_kit_ray.stages.media import (FrameSampleStage,
                                              ImageResizeStage,
                                              MediaDecodeStage,
                                              MediaFeatureStage,
                                              decode_payload)


def test_container_roundtrip_deterministic():
    p1, p2 = encode_image("media://x/1"), encode_image("media://x/1")
    assert p1 == p2
    assert encode_image("media://x/2") != p1
    d = decode_payload(p1)
    assert d["kind"] == "image" and d["array"].shape == (64, 96, 3)
    a = decode_payload(encode_audio("m"))
    assert a["kind"] == "audio" and a["array"].dtype == np.int16
    v = decode_payload(encode_video("m"))
    assert v["kind"] == "video" and v["array"].shape == (12, 32, 48)


def test_decode_payload_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_payload(b"NOPE" + b"\x00" * 16)


def test_real_backends_are_gated_stubs():
    for cls in (MediaDecodeStage, ImageResizeStage, FrameSampleStage,
                MediaFeatureStage):
        with pytest.raises(NotImplementedError):
            cls(backend="pil")


def _batch(rows):
    from pdf_extract_kit_ray.sources.media import MEDIA_SCHEMA
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def test_resize_nearest_neighbour_exact():
    """2x downscale of a known gradient must pick the exact source pixels."""
    payload = encode_image("media://t/0", width=8, height=8, channels=1)
    src = decode_payload(payload)["array"]
    stage = ImageResizeStage(out_width=4, out_height=4)
    out = stage(_batch([{"media_id": 1, "media_ref": "r", "kind": "image",
                         "payload": payload, "width": 8, "height": 8,
                         "n_frames": -1, "sample_rate": -1, "n_samples": -1}]))
    thumb = np.frombuffer(out.column("thumbnail")[0].as_py(),
                          np.uint8).reshape(4, 4, 1)
    expected = src[[0, 2, 4, 6]][:, [0, 2, 4, 6]]
    assert (thumb == expected).all()


def test_frame_sample_explodes_and_composes():
    payload = encode_video("media://t/v", n_frames=10)
    stage = FrameSampleStage(every_n=3)
    out = stage(_batch([{"media_id": 7, "media_ref": "r", "kind": "video",
                         "payload": payload, "width": 48, "height": 32,
                         "n_frames": 10, "sample_rate": -1, "n_samples": -1}]))
    assert out.column("frame_idx").to_pylist() == [0, 3, 6, 9]
    # frame payloads are valid image containers
    d = decode_payload(out.column("payload")[0].as_py())
    assert d["kind"] == "image" and (d["width"], d["height"]) == (48, 32)
    src = decode_payload(payload)["array"]
    assert (d["array"][:, :, 0] == src[0]).all()


def test_feature_stage_schema_and_range():
    rows = [media_row(i, f"media://t/{i}", k)
            for i, k in enumerate(["image", "audio", "video"])]
    out = MediaFeatureStage()(_batch(rows))
    assert out.schema.field("features").type == pa.list_(pa.float32())
    for feat in out.column("features").to_pylist():
        assert len(feat) == 8
        assert all(abs(x) <= 1.5 for x in feat)


def test_ocr_preprocess_functions():
    """P11 semantics (reference paddle_ocr.py:340-346 preprocess_image)."""
    from pdf_extract_kit_ray.stages.media import (alpha_to_color,
                                                  binarize_img, invert_img,
                                                  preprocess_image)
    # alpha composite: fully transparent -> background, opaque -> unchanged
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[:, :, :3] = 10
    rgba[0, 0, 3] = 255      # opaque
    rgba[1, 1, 3] = 0        # transparent
    out = alpha_to_color(rgba, (255, 255, 255))
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == 10).all() and (out[1, 1] == 255).all()
    # 3-channel passthrough
    rgb = np.full((2, 2, 3), 7, np.uint8)
    assert alpha_to_color(rgb) is rgb

    assert (invert_img(np.array([[0, 255]], np.uint8))
            == np.array([[255, 0]])).all()

    # Otsu separates a bimodal image at a threshold between the modes
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, 5:] = 200
    b = binarize_img(img)
    assert set(np.unique(b)) == {0, 255}
    assert (b[:, :5] == 0).all() and (b[:, 5:] == 255).all()

    # chain order: alpha -> invert -> binarize
    chained = preprocess_image(rgba, inv=True, binarize=True)
    assert set(np.unique(chained)) <= {0, 255}


def test_ocr_preprocess_stage(ray_session):
    from pdf_extract_kit_ray.stages.media import ImagePreprocessStage
    batch = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([encode_image("a"), encode_audio("b"),
                             encode_image("c")], pa.binary()),
    })
    out = ImagePreprocessStage(binarize=True)(batch)
    assert out.column("media_id").to_pylist() == [1, 3]   # audio skipped
    out2 = ImagePreprocessStage(binarize=True)(batch)
    assert out.equals(out2)                               # deterministic
    inv = ImagePreprocessStage(inv=True, binarize=False)(batch)
    assert inv.column("preprocessed_crc").to_pylist() != \
        out.column("preprocessed_crc").to_pylist()


def test_pipelines_end_to_end(ray_session, tmp_path):
    import pdf_extract_kit_ray.pipelines.multimodal as mm
    sf = "/root/testdata/sf0.001"
    dec = mm.media_decode_summary(sf).to_pandas()
    assert len(dec) == 120
    assert set(dec["kind"]) == {"image", "audio", "video"}
    # determinism: content crc stable across runs
    dec2 = mm.media_decode_summary(sf).to_pandas()
    pd_sorted = lambda d: d.sort_values("media_id").reset_index(drop=True)
    assert pd_sorted(dec).equals(pd_sorted(dec2))

    thumbs = mm.image_thumbnails(sf).to_pandas()
    assert len(thumbs) == 40  # every 3rd item is an image
    assert (thumbs["width"] == 64).all() and (thumbs["height"] == 64).all()

    frames = mm.video_frame_sample(sf).to_pandas()
    assert len(frames) == 40 * 3  # 40 videos x ceil(12/4) frames
    assert (frames["kind"] == "image").all()

    feats = mm.media_features(sf).to_pandas()
    assert len(feats) == 120

    # the generator plants a payload duplicate at every id % 20 == 19
    # (copied from id-3); near-dup must recover all of them at score 1.0
    nd = mm.media_feature_neardup(sf).to_pandas()
    exact = set(zip(nd[nd.score > 0.9999999].a, nd[nd.score > 0.9999999].b))
    planted = {(i - 3, i) for i in range(19, 120, 20)}
    assert planted <= exact

    prep = mm.ocr_preprocess_summary(sf).to_pandas()
    assert len(prep) == 40 and (prep["kind"] == "image").all()


def test_segment_candidates_capped():
    """The LSH population cap: oversized buckets can't go quadratic."""
    from pdf_extract_kit_ray.pipelines.multimodal import _segment_candidates

    # small segment -> exact all a<b pairs
    ids = np.arange(5, dtype=np.int64)
    a, b = _segment_candidates(ids, np.zeros(5, np.int64), cap=512)
    assert len(a) == 10 and (a < b).all()

    # oversized indistinguishable clique (identical refinement bits — the
    # exact-duplicate case, where no sign bit can split) -> linear
    # star + chain edges (2(n-1)-1), NOT n^2/2 pairs
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    a, b = _segment_candidates(ids, np.zeros(n, np.int64), cap=512)
    assert len(a) == 2 * (n - 1) - 1
    star = a == 0
    assert set(b[star]) == set(range(1, n))          # rep connectivity
    assert (b[~star] == a[~star] + 1).all()          # chain adjacency

    # oversized but refinement-splittable -> bounded far below quadratic,
    # every sub-segment scanned exactly (pairs subset of same-nibble-path)
    rng = np.random.RandomState(0)
    ids = np.arange(4096, dtype=np.int64)
    sub = rng.randint(0, 1 << 16, size=4096).astype(np.int64)
    a, b = _segment_candidates(ids, sub, cap=64)
    assert (a < b).all()
    assert len(a) < 4096 * 64          # << 8.4M all-pairs


def test_media_neardup_pair_set_matches_bruteforce(ray_session):
    """LSH pair set == exact all-pairs cosine at sf0.001 (recall check on
    top of the planted-dup subset assertion in the e2e test)."""
    import pdf_extract_kit_ray.pipelines.multimodal as mm
    sf = "/root/testdata/sf0.001"
    feats = mm.media_features(sf).to_pandas().sort_values("media_id")
    mat = np.asarray(feats["features"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    sims = mat @ mat.T
    ids = feats["media_id"].to_numpy()
    iu, ju = np.nonzero(np.triu(sims >= 0.999, k=1))
    expected = {(int(ids[i]), int(ids[j])) for i, j in zip(iu, ju)}

    nd = mm.media_feature_neardup(sf).to_pandas()
    got = set(zip(nd.a.astype(int), nd.b.astype(int)))
    assert got == expected


def test_resize_longest_side_geometry():
    """The dims rule is the reference's exactly (dataset.py:12-22):
    longest side -> size, other side int()-truncated, square takes the
    height branch."""
    from pdf_extract_kit_ray.stages.media import resize_longest_side_shape
    assert resize_longest_side_shape(100, 50, 64) == (64, 32)
    assert resize_longest_side_shape(50, 100, 64) == (32, 64)
    assert resize_longest_side_shape(101, 67, 64) == (64, int(67 * (64 / 101.0)))
    assert resize_longest_side_shape(64, 64, 64) == (64, 64)
    # square of a different size: else-branch (height -> size)
    assert resize_longest_side_shape(100, 100, 64) == (64, 64)
    # upscale path
    assert resize_longest_side_shape(10, 30, 64) == (int(10 * (64 / 30.0)), 64)


def test_ensure_bgr_channel_semantics():
    """P10 check_img/img_decode: gray promotes to 3 channels, RGBA
    composites over white, RGB flips to BGR."""
    import numpy as np
    from pdf_extract_kit_ray.stages.media import ensure_bgr
    gray = np.array([[7, 9]], np.uint8)
    out = ensure_bgr(gray)
    assert out.shape == (1, 2, 3) and (out[0, 0] == 7).all()
    rgb = np.zeros((1, 1, 3), np.uint8)
    rgb[0, 0] = (10, 20, 30)
    assert tuple(ensure_bgr(rgb)[0, 0]) == (30, 20, 10)
    rgba = np.zeros((1, 1, 4), np.uint8)
    rgba[0, 0] = (100, 0, 0, 0)          # fully transparent -> white bg
    assert tuple(ensure_bgr(rgba)[0, 0]) == (255, 255, 255)


def test_resize_longest_side_query(ray_session):
    import pyarrow.dataset as pads
    from pdf_extract_kit_ray.pipelines import multimodal
    from pdf_extract_kit_ray.stages.media import resize_longest_side_shape
    res = multimodal.resize_longest_side("/root/testdata/sf0.001", img_size=64).to_pandas()
    assert len(res) > 0
    for _, r in res.iterrows():
        assert (r["new_width"], r["new_height"]) == \
            resize_longest_side_shape(r["width"], r["height"], 64)
        assert max(r["new_width"], r["new_height"]) == 64
    # deterministic across runs
    res2 = multimodal.resize_longest_side("/root/testdata/sf0.001", img_size=64).to_pandas()
    a = res.sort_values("media_id").reset_index(drop=True)
    b = res2.sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)


def test_media_exact_dedup_planted(ray_session):
    import pdf_extract_kit_ray.pipelines.multimodal as mm
    res = mm.media_exact_dedup("/root/testdata/sf0.001").to_pandas()
    dups = res[res["n"] > 1]
    # the generator copies id-3's payload at every id % 20 == 19
    assert set(dups["keep_id"]) == {i - 3 for i in range(19, 120, 20)}
    assert (dups["n"] == 2).all()
    assert res["n"].sum() == 120          # every payload accounted for


def test_media_integrity_check_planted_corruption(ray_session, tmp_path):
    """Planted corruption classes land in the right counters: wrong
    magic, header/metadata contradiction, truncated payload, NULL
    payload, and an unknown kind."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extract_kit_ray.pipelines.multimodal import \
        media_integrity_check
    from pdf_extract_kit_ray.sources import media as m

    rows = []
    for i in range(4):
        rows.append(m.media_row(i, f"media://t/{i}", "image"))
    rows[1]["payload"] = b"XXXX" + rows[1]["payload"][4:]     # bad magic
    rows[2]["width"] = 640                                    # meta lie
    rows[3]["payload"] = rows[3]["payload"][:-7]              # truncated
    r4 = m.media_row(4, "media://t/4", "audio")
    r4["payload"] = None                                      # null
    rows.append(r4)
    r5 = m.media_row(5, "media://t/5", "video")
    r5["kind"] = "hologram"                                   # unknown kind
    rows.append(r5)

    media_dir = os.path.join(str(tmp_path), "media")
    os.makedirs(media_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=m.MEDIA_SCHEMA),
                   os.path.join(media_dir, "media.parquet"))
    # media_table_path synthesizes by sf-dir NAME; point the op at the
    # planted table instead
    import pdf_extract_kit_ray.pipelines.multimodal as mm
    orig = mm.media_table_path
    mm.media_table_path = lambda sf: media_dir
    try:
        df = media_integrity_check(str(tmp_path)).to_pandas() \
            .set_index("kind")
    finally:
        mm.media_table_path = orig
    img = df.loc["image"]
    assert img.n_items == 4
    assert img.n_bad_magic == 1
    assert img.n_meta_mismatch == 1
    assert img.n_size_mismatch == 1
    assert df.loc["audio"].n_null == 1
    assert df.loc["hologram"].n_bad_magic == 1
