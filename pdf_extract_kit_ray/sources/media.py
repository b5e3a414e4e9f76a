"""Deterministic synthetic media table (multimodal binary columns).

The engine treats image/audio/video as opaque ``binary`` payload columns with
typed metadata (SURVEY.md §1.4 — binary stays encoded between stages and is
decoded inside actors).  Real containers (PNG/WAV/MP4) need codec libraries
absent from this sandbox, so payloads use a versioned fake container the
decode stage parses for real — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is identical to what a PIL/libav backend
would use.

Container formats (little-endian):

* image: ``FIMG`` | u16 width | u16 height | u8 channels | pixels (w*h*c u8)
* audio: ``FAUD`` | u32 sample_rate | u32 n_samples | samples (n i16)
* video: ``FVID`` | u16 width | u16 height | u16 n_frames | frames
  (n*w*h u8, grayscale)

Payload bytes are a pure function of ``media_ref`` (crc32-seeded PRNG), so a
media table can be (re)derived for any corpus slice without shared state.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),          # images/video; -1 otherwise
    ("height", pa.int32()),
    ("n_frames", pa.int32()),       # video; -1 otherwise
    ("sample_rate", pa.int32()),    # audio; -1 otherwise
    ("n_samples", pa.int32()),
])

MAGIC_IMAGE, MAGIC_AUDIO, MAGIC_VIDEO = b"FIMG", b"FAUD", b"FVID"


def _rng_for(ref: str) -> np.random.RandomState:
    return np.random.RandomState(zlib.crc32(ref.encode("utf-8")) & 0x7FFFFFFF)


def encode_image(ref: str, width: int = 96, height: int = 64,
                 channels: int = 3) -> bytes:
    """Per-channel base levels vary per ref so summary features discriminate
    between items (uniform noise would make every feature vector collinear)."""
    rng = _rng_for(ref)
    base = rng.randint(30, 226, size=channels)
    noise = rng.randint(-30, 31, size=(width * height, channels))
    pixels = np.clip(base[None, :] + noise, 0, 255).astype(np.uint8)
    return (MAGIC_IMAGE + struct.pack("<HHB", width, height, channels)
            + pixels.tobytes())


def encode_audio(ref: str, sample_rate: int = 16000,
                 n_samples: int = 4000) -> bytes:
    rng = _rng_for(ref)
    amp = rng.uniform(0.05, 0.8)
    offset = rng.randint(-8000, 8001)
    width = rng.randint(1, 9)   # smoothing window: varies zero-crossing rate
    noise = rng.randint(-32768, 32768, size=n_samples).astype(np.float64)
    smooth = np.convolve(noise, np.ones(width) / width, mode="same")
    samples = np.clip(offset + amp * smooth, -32768, 32767).astype(np.int16)
    return (MAGIC_AUDIO + struct.pack("<II", sample_rate, n_samples)
            + samples.tobytes())


def encode_video(ref: str, width: int = 48, height: int = 32,
                 n_frames: int = 12) -> bytes:
    rng = _rng_for(ref)
    base = rng.randint(30, 226)
    drift = np.linspace(0, rng.randint(-60, 61), n_frames)
    noise = rng.randint(-25, 26, size=(n_frames, width * height))
    frames = np.clip(base + drift[:, None] + noise, 0, 255).astype(np.uint8)
    return (MAGIC_VIDEO + struct.pack("<HHH", width, height, n_frames)
            + frames.tobytes())


def media_row(media_id: int, ref: str, kind: str) -> dict:
    row = {"media_id": media_id, "media_ref": ref, "kind": kind,
           "width": -1, "height": -1, "n_frames": -1,
           "sample_rate": -1, "n_samples": -1}
    if kind == "image":
        row["payload"] = encode_image(ref)
        row["width"], row["height"] = 96, 64
    elif kind == "audio":
        row["payload"] = encode_audio(ref)
        row["sample_rate"], row["n_samples"] = 16000, 4000
    elif kind == "video":
        row["payload"] = encode_video(ref)
        row["width"], row["height"], row["n_frames"] = 48, 32, 12
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return row


def write_media_table(out_dir: str, num_items: int,
                      rows_per_file: int = 256) -> str:
    """Partitioned parquet media table (one file per shard — resumable
    layout, never one giant file)."""
    os.makedirs(out_dir, exist_ok=True)
    kinds = ["image", "audio", "video"]
    buf: List[dict] = []
    shard = 0
    for media_id in range(num_items):
        kind = kinds[media_id % 3]
        # every 20th item duplicates the payload of an earlier same-kind item
        # (ground truth for the near-dup operators)
        src_id = media_id - 3 if media_id % 20 == 19 else media_id
        buf.append(media_row(media_id, f"media://synth/{src_id}", kind))
        if len(buf) >= rows_per_file:
            pq.write_table(pa.Table.from_pylist(buf, schema=MEDIA_SCHEMA),
                           os.path.join(out_dir, f"part-{shard:05d}.parquet"))
            buf, shard = [], shard + 1
    if buf:
        pq.write_table(pa.Table.from_pylist(buf, schema=MEDIA_SCHEMA),
                       os.path.join(out_dir, f"part-{shard:05d}.parquet"))
    return out_dir


_MEDIA_ITEMS = {"sf0.001": 120, "sf0.01": 399, "sf0.1": 1998,
                "scale100k": 100_000}   # LSH headroom evidence corpus


def media_table_path(sf_dir: str) -> str:
    """Generate (once) and cache the media table for a test scale."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n = _MEDIA_ITEMS.get(name, 120)
    out = f"/tmp/pek_media/{name}-{n}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_media_table(out, n)
        with open(marker, "w") as f:
            f.write("ok")
    return out
