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
from ..stages.media import (FrameSampleStage, ImageResizeStage,
                            MediaDecodeStage, MediaFeatureStage)

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


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Feature vectors (list<float32>, dim 8) for every media item."""
    return _read_media(sf_dir).map_batches(
        MediaFeatureStage, concurrency=_conc(), batch_size=_BATCH,
        batch_format="pyarrow")


def media_feature_neardup(sf_dir: str, threshold: float = 0.999) -> "ray.data.Dataset":
    """Embedding-cosine near-dup over extracted media features — composes
    the multimodal feature stage with the similarity machinery: features are
    broadcast once (small side), each batch computes its blockwise cosine
    rows against all columns with larger media_id."""
    import numpy as np

    feats = media_features(sf_dir)
    rows = feats.take_all()
    ids = np.array([r["media_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["features"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    side = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(side)
        idx = {int(i): j for j, i in enumerate(all_ids)}
        a_out, b_out, s_out = [], [], []
        for mid in batch.column("media_id").to_pylist():
            j = idx[int(mid)]
            sims = all_mat @ all_mat[j]
            for kpos in np.nonzero((sims >= threshold) & (all_ids > mid))[0]:
                a_out.append(mid)
                b_out.append(int(all_ids[kpos]))
                s_out.append(float(sims[kpos]))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "score": pa.array(s_out, pa.float64())})

    return feats.select_columns(["media_id"]).map_batches(
        pairs, batch_format="pyarrow")
