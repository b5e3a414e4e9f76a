"""Debug visualization sink (reference S9 analog).

The reference draws detection boxes onto page images and writes PNG/PDF
(pdf_extract_kit/utils/visualization.py:45-89); its docs advise disabling it
for large-scale runs.  This sandbox has no raster libraries, so the engine
renders each page's detections to an SVG string — same per-class color
palette idea (pdf2markdown.py:67-81), no pixel deps — as an optional
``map_batches`` stage writing side files under a debug directory.  Off in
production pipelines.
"""

from __future__ import annotations

import html
import os
from typing import Optional

import pyarrow as pa

from ..registry import STAGE_REGISTRY

# per-class colors mirroring the reference's palette keys
CLASS_COLORS = {
    "title": "#ff40ff", "plain text": "#ffff00", "abandon": "#00ffff",
    "figure": "#ffd787", "figure_caption": "#d7005f", "table": "#640030",
    "table_caption": "#00af00", "table_footnote": "#5f005f",
    "isolate_formula": "#af5f00", "formula_caption": "#5f5f00",
    "inline": "#0000ff", "isolated": "#00ff00", "text": "#ff0000",
}


def page_to_svg(width: int, height: int, dets) -> str:
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for det in dets:
        color = CLASS_COLORS.get(det["kind"], "#808080")
        x0, y0 = det["x0"], det["y0"]
        w, h = det["x1"] - x0, det["y1"] - y0
        parts.append(
            f'<rect x="{x0}" y="{y0}" width="{w}" height="{h}" '
            f'fill="none" stroke="{color}" stroke-width="2"/>')
        label = "%s %.2f" % (det["kind"], det.get("score", 0.0))
        parts.append(
            f'<text x="{x0}" y="{max(y0 - 3, 10)}" font-size="14" '
            f'fill="{color}">{html.escape(label)}</text>')
    parts.append("</svg>")
    return "".join(parts)


def _hex_rgb(color: str) -> tuple:
    return (int(color[1:3], 16), int(color[3:5], 16), int(color[5:7], 16))


def encode_png(rgb: "object") -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG — pure stdlib (zlib +
    struct), no raster libraries: filter-0 scanlines, one zlib-deflated
    IDAT, CRC-checked chunks.  This is the raster path the reference's
    visualization sink produces (utils/visualization.py:45-89) without
    needing PIL in this sandbox."""
    import struct
    import zlib

    import numpy as np
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def page_to_png(width: int, height: int, dets, scale: float = 0.25,
                background: "object" = None) -> bytes:
    """Rasterize a page's detection boxes (2px outlines, per-class colors)
    and return PNG bytes.  ``scale`` downsamples the page so debug dumps
    stay small.  ``background``: an (H, W[, C]) uint8 page image to draw
    ON (the reference overlays boxes on the real page,
    visualization.py:45-89 — pair with ``decode_png`` for real inputs);
    None draws on a white canvas (the synthetic-corpus default)."""
    import numpy as np
    w, h = max(1, int(width * scale)), max(1, int(height * scale))
    if background is not None:
        from ..stages.media import bilinear_resize, ensure_bgr
        canvas = np.ascontiguousarray(
            bilinear_resize(ensure_bgr(np.asarray(background)), w, h)[:, :, ::-1])
    else:
        canvas = np.full((h, w, 3), 255, dtype=np.uint8)
    for det in dets:
        color = np.array(_hex_rgb(CLASS_COLORS.get(det["kind"], "#808080")),
                         dtype=np.uint8)
        x0 = int(np.clip(det["x0"] * scale, 0, w - 1))
        x1 = int(np.clip(det["x1"] * scale, 0, w - 1))
        y0 = int(np.clip(det["y0"] * scale, 0, h - 1))
        y1 = int(np.clip(det["y1"] * scale, 0, h - 1))
        t = 2   # outline thickness
        canvas[y0:min(y0 + t, h), x0:x1 + 1] = color
        canvas[max(y1 - t + 1, 0):y1 + 1, x0:x1 + 1] = color
        canvas[y0:y1 + 1, x0:min(x0 + t, w)] = color
        canvas[y0:y1 + 1, max(x1 - t + 1, 0):x1 + 1] = color
    return encode_png(canvas)


@STAGE_REGISTRY.register("visualize")
class VisualizeStage:
    """Writes one SVG or PNG per page under ``out_dir`` and passes the batch
    through unchanged.  Side-effecting debug stage — keep off for
    production runs.  ``fmt="png"`` uses the stdlib raster encoder
    (encode_png) — the reference's pixel-overlay sink without PIL."""

    def __init__(self, out_dir: str, dets_column: str = "dets",
                 fmt: str = "svg", png_scale: float = 0.25):
        if fmt not in ("svg", "png"):
            raise ValueError(f"unknown visualize fmt {fmt!r}")
        self.out_dir = out_dir
        self.dets_column = dets_column
        self.fmt = fmt
        self.png_scale = png_scale
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        dets_col = batch.column(self.dets_column).to_pylist()
        for doc_id, page_no, w, h, dets in zip(doc_ids, page_nos, widths,
                                               heights, dets_col):
            path = os.path.join(self.out_dir, "%s_page_%04d.%s"
                                % (doc_id, page_no + 1, self.fmt))
            if self.fmt == "png":
                with open(path, "wb") as f:
                    f.write(page_to_png(w, h, dets, self.png_scale))
            else:
                with open(path, "w") as f:
                    f.write(page_to_svg(w, h, dets))
        return batch


def decode_png(data: bytes) -> "object":
    """Decode a PNG into a uint8 numpy array — pure stdlib (zlib + struct),
    the inverse of :func:`encode_png` and the REAL-image ingestion path for
    the reference's demo assets (assets/demo/**/*.png) in this
    raster-lib-free sandbox.

    Supports the PNG baseline the demo corpus uses: bit depth 8, color
    types 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
    interlace 0.  Returns (h, w) for gray, else (h, w, channels).

    Filters 0-2 (None/Sub/Up) unfilter fully vectorized (Sub is a
    cumulative sum mod 256 along the row); filters 3-4 (Average/Paeth)
    are inherently sequential per pixel and fall back to a per-pixel
    loop — fine for demo-sized images, and a real deployment swaps this
    whole function for libpng via PIL behind the same signature."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth}, ctype={ctype}, "
            f"interlace={interlace}) — baseline 8-bit non-interlaced only")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    bpp = channels
    for y in range(h):
        f, r = int(filters[y]), rows[y]
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            recon[y] = r
        elif f == 1:   # Sub: cumulative per channel-phase mod 256
            rr = r.reshape(w, bpp)
            recon[y] = (np.cumsum(rr, axis=0) % 256).reshape(stride)
        elif f == 2:   # Up
            recon[y] = (r + prev) % 256
        elif f == 3:   # Average (sequential in x; list loop — numpy
            rl = r.tolist()          # scalar indexing is ~5x slower here)
            pl = prev.tolist()
            out = [0] * stride
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                out[x] = (rl[x] + (a + pl[x]) // 2) % 256
            recon[y] = out
        elif f == 4:   # Paeth (sequential in x)
            rl = r.tolist()
            pl = prev.tolist()
            out = [0] * stride
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                b = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                out[x] = (rl[x] + pred) % 256
            recon[y] = out
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = recon.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[img.reshape(h, w)]
    if channels == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, channels)
