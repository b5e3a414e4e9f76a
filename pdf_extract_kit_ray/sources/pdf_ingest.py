"""Real-PDF ingestion seam (import-gated on PyMuPDF / ``fitz``).

The first thing a real user feeds this engine is a PDF.  This module is
the byte-level render path that turns ``(doc_id, pdf_bytes)`` rows into
PAGE_SCHEMA page rows, replicating the reference's render semantics
exactly (/root/reference/pdf_extract_kit/utils/data_preprocess.py:5-19
``load_pdf_page``/``load_pdf``):

* pages render at **dpi 144** (``fitz.Matrix(dpi/72, dpi/72)`` — zoom 2.0
  over PDF user space);
* if EITHER side of the dpi-144 render exceeds **3000 px**, the page is
  **re-rendered** at ``Matrix(1, 1)`` (dpi 72, ``alpha=False``) — the same
  rule :func:`..sources.corpus.render_geometry` pins for the synthetic
  ``geom://`` twin, and the decision here is *delegated to that function*
  so the two paths cannot drift.

The sandbox has no ``fitz`` wheel, so every render entry point raises a
clear ``ImportError`` when PyMuPDF is absent; the plumbing (schemas, batch
signature, page-row layout, the deterministic in-repo PDF generator used
by the skipped-unless-fitz test) is real and tested either way.

Page payload: each rendered page emits ONE raw det of kind
``"page_image"`` covering the full page, whose ``media_ref`` carries the
rendered pixels as ``b64png://<base64 PNG>`` (encoded with the repo's
stdlib :func:`..stages.visualize.encode_png`, decodable with its
``decode_png`` twin) — the real-backend model adapters
(stages/model_adapters.py) decode that payload for inference.  Real
page images are ~100 KB-2 MB each; drop ``ExtractConfig.page_batch_size``
accordingly when ingesting real PDFs.
"""

from __future__ import annotations

import base64
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from ..schemas import PAGE_SCHEMA, RAW_DET_TYPE
from .corpus import PAGE_H, PAGE_W, render_geometry

try:                                     # import-gated: no wheel in sandbox
    import fitz as _fitz                 # PyMuPDF

    HAVE_FITZ = True
except ImportError:                      # pragma: no cover - sandbox default
    _fitz = None
    HAVE_FITZ = False

PAGE_IMAGE_KIND = "page_image"
B64PNG_PREFIX = "b64png://"


def _require_fitz():
    if not HAVE_FITZ:
        raise ImportError(
            "real-PDF ingestion needs PyMuPDF (`pip install pymupdf`); "
            "this environment has no fitz wheel — feed geom:// span "
            "corpora instead, or install PyMuPDF in production")
    return _fitz


def render_pdf_page(page, dpi: int = 144) -> Tuple[np.ndarray, int, int]:
    """One page -> (rgb array, width, height) under the reference rule:
    render at ``dpi``; if the result exceeds 3000 px on either side,
    re-render at dpi 72 (``Matrix(1,1)``).  The downshift DECISION is
    shared with :func:`render_geometry` (scale != 1.0 <=> re-render), the
    pixels come from the second real render — the reference re-renders
    rather than rescaling (data_preprocess.py:8-10)."""
    fitz = _require_fitz()
    zoom = dpi / 72.0
    pix = page.get_pixmap(matrix=fitz.Matrix(zoom, zoom))
    _, _, scale = render_geometry(pix.width, pix.height, backend="fitz")
    if scale != 1.0:
        pix = page.get_pixmap(matrix=fitz.Matrix(1, 1), alpha=False)
    rgb = np.frombuffer(pix.samples, np.uint8).reshape(
        pix.height, pix.width, pix.n)[:, :, :3]
    return rgb, pix.width, pix.height


def render_pdf_pages(batch: pa.Table, dpi: int = 144) -> pa.Table:
    """``(doc_id, pdf_bytes)`` batch -> PAGE_SCHEMA page rows via real
    PyMuPDF rendering (the fitz path of ``explode_pages``).  Zero-page
    documents keep a sentinel row (page_no -1, default dims, empty dets)
    exactly like the geom:// explode, so downstream reassembly sees the
    same contract from both ingestion paths."""
    _require_fitz()
    from ..stages.visualize import encode_png

    doc_ids: List[str] = []
    page_nos: List[int] = []
    widths: List[int] = []
    heights: List[int] = []
    dets: List[list] = []
    ids = batch.column("doc_id").to_pylist()
    blobs = batch.column("pdf_bytes").to_pylist()
    for doc_id, blob in zip(ids, blobs):
        n_pages = 0
        if blob:
            doc = _fitz.open(stream=blob, filetype="pdf")
            try:
                for i in range(len(doc)):
                    rgb, w, h = render_pdf_page(doc[i], dpi)
                    payload = B64PNG_PREFIX + base64.b64encode(
                        encode_png(rgb)).decode("ascii")
                    doc_ids.append(doc_id)
                    page_nos.append(i)
                    widths.append(w)
                    heights.append(h)
                    dets.append([{
                        "kind": PAGE_IMAGE_KIND,
                        "x0": 0, "y0": 0, "x1": w, "y1": h,
                        "score": 1.0, "text": "",
                        "media_ref": payload,
                    }])
                    n_pages += 1
            finally:
                doc.close()
        if n_pages == 0:                     # zero-page doc: sentinel row
            doc_ids.append(doc_id)
            page_nos.append(-1)
            widths.append(PAGE_W)
            heights.append(PAGE_H)
            dets.append([])
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()),
         pa.array(page_nos, pa.int32()),
         pa.array(widths, pa.int32()),
         pa.array(heights, pa.int32()),
         pa.array(dets, pa.list_(RAW_DET_TYPE))],
        schema=PAGE_SCHEMA)


def read_pdf_dir(path: str) -> "object":
    """Directory of ``*.pdf`` -> Dataset of ``(doc_id, pdf_bytes)`` rows
    (doc_id = file stem, the reference's img_id convention,
    tasks/base_task.py:42-80).  Reading needs no fitz — only rendering
    does — so the manifest of a 100 TB PDF lake can be built anywhere."""
    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True,
                                    file_extensions=["pdf"])

    def to_doc(batch: pa.Table) -> pa.Table:
        import os
        stems = [os.path.splitext(os.path.basename(p))[0]
                 for p in batch.column("path").to_pylist()]
        return pa.table({
            "doc_id": pa.array(stems, pa.string()),
            "pdf_bytes": batch.column("bytes"),
        })

    return ds.map_batches(to_doc, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic in-repo PDF generator (pure Python, no deps) — the test
# corpus for the skipped-unless-fitz render test, and a demo input for
# real deployments.  Minimal PDF 1.4: catalog / page tree / one content
# stream per page (a filled rectangle + Helvetica text so renders are
# non-blank), byte-exact xref offsets.
# ---------------------------------------------------------------------------

def make_minimal_pdf(page_sizes_pt: Sequence[Tuple[float, float]],
                     texts: Optional[Sequence[str]] = None) -> bytes:
    """Build a tiny valid PDF with the given per-page media boxes (in PDF
    points; 72 pt = 1 inch, so a (595, 842) page renders 1190x1684 at
    dpi 144).  Deterministic byte output for a given input."""
    n = len(page_sizes_pt)
    texts = list(texts) if texts is not None else [
        f"Page {i + 1}" for i in range(n)]
    objs: List[bytes] = []                  # 1-indexed object bodies
    # obj 1: catalog, obj 2: page tree, obj 3: font
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>"
                .encode("ascii"))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, (w, h) in enumerate(page_sizes_pt):
        content = (f"q 0.8 0.2 0.2 rg 50 50 {w / 3:.1f} {h / 6:.1f} re f Q "
                   f"BT /F1 24 Tf 72 {h - 100:.1f} Td ({texts[i]}) Tj ET"
                   ).encode("ascii")
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:g} {h:g}] "
             f"/Contents {5 + 2 * i} 0 R "
             f"/Resources << /Font << /F1 3 0 R >> >> >>").encode("ascii"))
        objs.append(b"<< /Length " + str(len(content)).encode("ascii")
                    + b" >>\nstream\n" + content + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]                            # object 0 is the free head
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += (f"{num} 0 obj\n".encode("ascii") + body
                + b"\nendobj\n")
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode("ascii")
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("ascii")
    return bytes(out)
