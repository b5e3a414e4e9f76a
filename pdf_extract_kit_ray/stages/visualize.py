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


@STAGE_REGISTRY.register("visualize")
class VisualizeStage:
    """Writes one SVG per page under ``out_dir`` and passes the batch through
    unchanged.  Side-effecting debug stage — keep off for production runs."""

    def __init__(self, out_dir: str, dets_column: str = "dets"):
        self.out_dir = out_dir
        self.dets_column = dets_column
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        dets_col = batch.column(self.dets_column).to_pylist()
        for doc_id, page_no, w, h, dets in zip(doc_ids, page_nos, widths,
                                               heights, dets_col):
            svg = page_to_svg(w, h, dets)
            path = os.path.join(self.out_dir,
                                "%s_page_%04d.svg" % (doc_id, page_no + 1))
            with open(path, "w") as f:
                f.write(svg)
        return batch
