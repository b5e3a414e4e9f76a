"""Real-PDF ingestion seam (sources/pdf_ingest.py).

The render tests skip unless PyMuPDF is installed (no wheel in this
sandbox); the generator structure, schema plumbing, and the
geometry-path-unaffected guarantees run everywhere.
"""

import pyarrow as pa
import pytest

from pdf_extract_kit_ray.sources.pdf_ingest import (B64PNG_PREFIX,
                                                    HAVE_FITZ,
                                                    PAGE_IMAGE_KIND,
                                                    make_minimal_pdf,
                                                    render_pdf_pages)


def test_minimal_pdf_structure_and_determinism():
    """The in-repo generator emits a structurally valid PDF: header,
    byte-exact xref offsets, trailer — and identical bytes per input."""
    pdf = make_minimal_pdf([(595, 842), (1600, 1600)])
    assert pdf == make_minimal_pdf([(595, 842), (1600, 1600)])
    assert pdf.startswith(b"%PDF-1.4\n") and pdf.rstrip().endswith(b"%%EOF")
    # walk the xref: every offset must land exactly on "<num> 0 obj"
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    lines = pdf[xref_at:].split(b"\n")
    assert lines[0] == b"xref"
    n_objs = int(lines[1].split()[1]) - 1
    for i in range(n_objs):
        off = int(lines[3 + i].split()[0])
        assert pdf[off:].startswith(f"{i + 1} 0 obj".encode()), i + 1
    assert b"/MediaBox [0 0 595 842]" in pdf
    assert b"/MediaBox [0 0 1600 1600]" in pdf
    assert f"/Count 2".encode() in pdf


@pytest.mark.skipif(HAVE_FITZ, reason="fitz installed: gate not reachable")
def test_render_raises_without_fitz():
    batch = pa.table({"doc_id": ["d1"],
                      "pdf_bytes": [make_minimal_pdf([(595, 842)])]})
    with pytest.raises(ImportError, match="PyMuPDF"):
        render_pdf_pages(batch)
    # and the explode_pages seam surfaces the same gate
    from pdf_extract_kit_ray.stages.extract_stages import explode_pages
    with pytest.raises(ImportError, match="PyMuPDF"):
        explode_pages(batch)


def test_geom_path_unaffected_by_seam(ray_session):
    """A spans batch (no pdf_bytes column) must still route through the
    vectorized geom:// explode, byte-equal to the straight-line twin."""
    from pdf_extract_kit_ray.schemas import DOC_SCHEMA
    from pdf_extract_kit_ray.sources.corpus import (generate_raw_document,
                                                    split_pages_geom)
    from pdf_extract_kit_ray.stages.extract_stages import explode_pages

    rows = [{"doc_id": f"doc-{i}",
             "spans": generate_raw_document(f"doc-{i}", seed=5, n_pages=3)}
            for i in range(4)]
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    out = explode_pages(raw)
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["doc_id"], []).append(
            (r["page_no"], r["width"], r["height"], len(r["raw_dets"])))
    for row in rows:
        pages = split_pages_geom(row["spans"])
        exp = [(i, p["width"], p["height"], len(p["els"]))
               for i, p in enumerate(pages)]
        assert got[row["doc_id"]] == exp


@pytest.mark.skipif(not HAVE_FITZ, reason="PyMuPDF not installed")
def test_real_pdf_render_dims_and_downshift():
    """Hash-pins the render geometry on a real fitz render: an A4 page
    renders 1190x1684 at dpi-144; a 1600x1600pt page would be 3200x3200
    (>3000) and must come back re-rendered at dpi-72 (1600x1600).  The
    page_image payload must round-trip through the repo PNG decoder at
    the pinned dims.  (Pixel bytes are renderer-version-dependent, so the
    pin is dims + det structure + payload self-consistency, not a raw
    pixel hash.)"""
    import base64

    from pdf_extract_kit_ray.stages.visualize import decode_png

    pdf = make_minimal_pdf([(595, 842), (1600, 1600)])
    batch = pa.table({"doc_id": ["d1"], "pdf_bytes": [pdf]})
    out = render_pdf_pages(batch).to_pylist()
    assert [(r["page_no"], r["width"], r["height"]) for r in out] == [
        (0, 1190, 1684), (1, 1600, 1600)]
    for r in out:
        (det,) = r["raw_dets"]
        assert det["kind"] == PAGE_IMAGE_KIND
        assert (det["x0"], det["y0"], det["x1"], det["y1"]) == (
            0, 0, r["width"], r["height"])
        assert det["media_ref"].startswith(B64PNG_PREFIX)
        rgb = decode_png(base64.b64decode(
            det["media_ref"][len(B64PNG_PREFIX):]))
        assert rgb.shape == (r["height"], r["width"], 3)


@pytest.mark.skipif(not HAVE_FITZ, reason="PyMuPDF not installed")
def test_real_pdf_through_explode_pages_and_zero_page(ray_session):
    """The explode_pages seam accepts pdf_bytes batches; a zero-page /
    unparseable-empty doc keeps its sentinel row like the geom:// path."""
    from pdf_extract_kit_ray.stages.extract_stages import explode_pages

    pdf = make_minimal_pdf([(595, 842)])
    batch = pa.table({"doc_id": ["a", "b"],
                      "pdf_bytes": [pdf, None]})
    out = explode_pages(batch).to_pylist()
    assert [(r["doc_id"], r["page_no"]) for r in out] == [
        ("a", 0), ("b", -1)]
    assert out[1]["raw_dets"] == []
