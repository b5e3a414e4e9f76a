"""Multimodal pipelines over the binary media table.

Each pipeline is read_parquet -> actor-pool map_batches stages from
stages/media.py.  Payload bytes dominate block size, so every stage runs
with a small ``batch_size`` and drops the payload column as soon as it has
been consumed (the "never carry images past the stage that needs them" rule,
SURVEY.md §7).

These are non-SQL queries (payload synthesis/decoding has no DuckDB twin);
the driver records rows-only checks, and tests/test_multimodal.py pins the
determinism + schema contracts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.media import media_table_path
from ..stages.media import (FrameSampleStage, ImagePreprocessStage,
                            ImageResizeStage, MediaDecodeStage,
                            MediaFeatureStage)

_BATCH = 32          # payload rows per batch: binary-heavy, keep small


def _conc(chain: int = 1) -> int:
    """Actor-pool size per stage, leaving headroom for read/reduce tasks.
    Stacked pools RESERVE cpus; oversubscribing a small cluster stalls the
    streaming executor waiting for actors that can never schedule."""
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, (cpus - 1) // (2 * chain))


def _read_media(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(media_table_path(sf_dir),
                                 columns=["media_id", "payload"])


def media_decode_summary(sf_dir: str) -> "ray.data.Dataset":
    """Decode every payload -> (media_id, kind, dims, content_crc)."""
    return _read_media(sf_dir).map_batches(
        MediaDecodeStage, concurrency=_conc(), batch_size=_BATCH,
        batch_format="pyarrow")


def image_thumbnails(sf_dir: str) -> "ray.data.Dataset":
    """Images resized to 64x64 thumbnails -> (media_id, dims, thumb crc)."""
    ds = _read_media(sf_dir).map_batches(
        ImageResizeStage, concurrency=_conc(), batch_size=_BATCH,
        batch_format="pyarrow",
        fn_constructor_kwargs={"out_width": 64, "out_height": 64})

    def crc(batch: pa.Table) -> pa.Table:
        import zlib
        batch = batch.filter(batch.column("resized"))
        crcs = [zlib.crc32(t) for t in batch.column("thumbnail").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "thumb_crc": pa.array(crcs, pa.uint32()),
        })

    return ds.map_batches(crc, batch_format="pyarrow")


def video_frame_sample(sf_dir: str, every_n: int = 4) -> "ray.data.Dataset":
    """Videos exploded to every-Nth-frame rows, then decoded as images —
    demonstrates frame containers composing with the image stage chain."""
    conc = _conc(chain=2)
    frames = _read_media(sf_dir).map_batches(
        FrameSampleStage, concurrency=conc, batch_size=_BATCH,
        batch_format="pyarrow", fn_constructor_kwargs={"every_n": every_n})
    return frames.map_batches(
        MediaDecodeStage, concurrency=conc, batch_size=_BATCH,
        batch_format="pyarrow")


def ocr_preprocess_summary(sf_dir: str, inv: bool = False,
                           binarize: bool = True) -> "ray.data.Dataset":
    """P11: the reference's OCR image-preprocess chain (alpha-to-color,
    optional invert, Otsu binarize — paddle_ocr.py:340-346) over every image
    payload, emitting per-image preprocessed digests."""
    return _read_media(sf_dir).map_batches(
        ImagePreprocessStage, concurrency=_conc(), batch_size=_BATCH,
        batch_format="pyarrow",
        fn_constructor_kwargs={"inv": inv, "binarize": binarize})


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Feature vectors (list<float32>, dim 8) for every media item."""
    return _read_media(sf_dir).map_batches(
        MediaFeatureStage, concurrency=_conc(), batch_size=_BATCH,
        batch_format="pyarrow")


def media_feature_neardup(sf_dir: str, threshold: float = 0.999,
                          n_bands: int = 6, band_bits: int = 6) -> "ray.data.Dataset":
    """Embedding-cosine near-dup over extracted media features, distributed
    end-to-end via random-hyperplane LSH (SimHash for vectors): each feature
    row hashes to ``n_bands`` sign-bit bucket keys (seeded hyperplanes
    broadcast once), ONE shuffle groups each (band, bucket), a vectorized
    all-pairs cosine runs inside the bucket, and a candidate-sized
    groupby(a, b) dedupes pairs that collide in several bands.

    Recall: a pair at cosine >= 0.999 disagrees on a random hyperplane with
    p = acos(0.999)/π ≈ 0.0143, so P(miss all 6 six-bit bands) =
    (1-(1-0.0143)^6)^6 ≈ 3e-7 — near-exact, with flat driver memory as the
    corpus grows (nothing is materialized on the driver, unlike the round-1
    take_all version).  6x6 measured fastest at sf0.1 with the pair set
    identical to exact all-pairs; more/wider bands only multiply bucket
    groups and duplicate candidate rows."""
    import numpy as np
    from ray.data.aggregate import Max

    from ..stages.media import MediaFeatureStage

    rng = np.random.RandomState(17)
    planes = rng.randn(n_bands * band_bits, MediaFeatureStage.DIM)
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(band_bits, dtype=np.int64))

    def bucketize(batch: pa.Table) -> pa.Table:
        R = ray.get(planes_ref)
        ids = np.asarray(batch.column("media_id").to_pylist(), dtype=np.int64)
        mat = np.asarray(batch.column("features").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        bits = (mat @ R.T) > 0                    # (n, n_bands*band_bits)
        bits = bits.reshape(len(ids), n_bands, band_bits)
        buckets = (bits * weights[None, None, :]).sum(axis=2)  # (n, n_bands)
        band_ids = np.tile(np.arange(n_bands, dtype=np.int32), len(ids))
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "bucket": pa.array(buckets.ravel(), pa.int64()),
            "media_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "features": pa.array(np.repeat(mat, n_bands, axis=0).tolist(),
                                 pa.list_(pa.float64())),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "pair_score": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        ids = np.asarray(group.column("media_id").to_pylist(), dtype=np.int64)
        mat = np.asarray(group.column("features").to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        sims = mat @ mat.T
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        if len(iu) == 0:
            return empty
        return pa.table({"a": pa.array(ids[iu], pa.int64()),
                         "b": pa.array(ids[ju], pa.int64()),
                         "pair_score": pa.array(sims[iu, ju], pa.float64())})

    feats = media_features(sf_dir)
    return (feats.map_batches(bucketize, batch_format="pyarrow")
                 .groupby(["band", "bucket"])
                 .map_groups(bucket_pairs, batch_format="pyarrow")
                 .groupby(["a", "b"])
                 .aggregate(Max("pair_score", alias_name="score")))
