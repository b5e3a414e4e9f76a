"""Corpus generator contracts + TableStage straggler-cap behavior."""

import pyarrow as pa
import pytest
import ray.data

from pdf_extract_kit_ray.schemas import DOC_SCHEMA
from pdf_extract_kit_ray.sources.corpus import (
    generate_corpus,
    generate_raw_document,
    parse_raw_span,
    split_pages,
)
from pdf_extract_kit_ray.stages.extract_stages import (
    LayoutStage,
    MFDStage,
    TableStage,
    explode_pages,
)


def test_generator_deterministic_and_schema():
    a, ga = generate_corpus(8, seed=11)
    b, gb = generate_corpus(8, seed=11)
    assert a.equals(b) and ga.equals(gb)
    assert a.schema.equals(DOC_SCHEMA) and ga.schema.equals(DOC_SCHEMA)
    c, _ = generate_corpus(8, seed=12, with_golden=False)
    assert not a.equals(c)


def test_raw_offsets_are_page_local():
    spans = generate_raw_document("doc-x", 1, n_pages=3)
    pages = split_pages(spans)
    assert len(pages) == 3
    # every page leads with its render-geometry pseudo-span
    assert sum(1 for s in spans if s["kind"] == "page_geom") == 3
    # every element span round-trips through the geom encoding
    for s in spans:
        det = parse_raw_span(s)
        if det["kind"] == "page_geom":
            continue
        assert det["x1"] > det["x0"] and det["y1"] > det["y0"]
        assert 0.0 < det["score"] < 1.0


def test_render_geometry_downshift():
    """S3 semantics (reference data_preprocess.py:5-11): a page whose
    dpi-144 render exceeds 3000px on a side re-renders at dpi-72 (half),
    and element coordinates land in the effective frame."""
    from pdf_extract_kit_ray.sources.corpus import (PAGE_H, PAGE_W,
                                                    encode_geom,
                                                    render_geometry,
                                                    split_pages_geom)

    assert render_geometry(1654, 2339) == (1654, 2339, 1.0)
    assert render_geometry(3308, 4678) == (1654, 2339, 0.5)
    assert render_geometry(3200, 1000) == (1600, 500, 0.5)

    def page(mult):
        return [
            {"kind": "page_geom", "text": "",
             "media_ref": encode_geom(0, 0, PAGE_W * mult, PAGE_H * mult, 1.0),
             "offset": 0},
            {"kind": "plain_text", "text": "",
             "media_ref": encode_geom(100 * mult, 200 * mult, 500 * mult,
                                      260 * mult, 0.9), "offset": 1},
        ]

    normal, oversized = split_pages_geom(page(1)), split_pages_geom(page(2))
    assert oversized[0]["width"] == normal[0]["width"] == PAGE_W
    assert oversized[0]["scale"] == 0.5 and normal[0]["scale"] == 1.0
    # the downshift brings the doubled coordinates back to the same frame
    for a, b in zip(normal[0]["els"], oversized[0]["els"]):
        assert (a["x0"], a["y0"], a["x1"], a["y1"]) == \
            (b["x0"], b["y0"], b["x1"], b["y1"])


def test_downshift_truncates_odd_coordinates():
    """Scaled coordinates land on the pixel grid (int-truncated), so the
    oracle and the int32 Arrow page schema compute on identical values."""
    from pdf_extract_kit_ray.sources.corpus import (PAGE_H, PAGE_W,
                                                    encode_geom,
                                                    split_pages_geom)
    spans = [
        {"kind": "page_geom", "text": "",
         "media_ref": encode_geom(0, 0, PAGE_W * 2, PAGE_H * 2, 1.0),
         "offset": 0},
        {"kind": "plain_text", "text": "",
         "media_ref": encode_geom(101, 203, 501, 261, 0.9), "offset": 1},
    ]
    els = split_pages_geom(spans)[0]["els"]
    assert (els[0]["x0"], els[0]["y0"], els[0]["x1"], els[0]["y1"]) == \
        (50, 101, 250, 130)
    assert all(isinstance(els[0][k], int) for k in ("x0", "y0", "x1", "y1"))


def test_oversized_page_odd_coords_pipeline_equals_oracle(ray_session):
    """An oversized page with odd element coordinates (truncating downshift)
    must extract identically through the Ray pipeline and the oracle — the
    int32 page schema must not diverge from the oracle's arithmetic."""
    import random
    from pdf_extract_kit_ray.oracle import extract_document
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents)
    import ray.data

    spans = generate_raw_document("doc-odd", 21, n_pages=2)
    from pdf_extract_kit_ray.sources.corpus import encode_geom
    rng = random.Random(3)

    def jitter(span):
        det = parse_raw_span(span)
        media = det["media_ref"] if span["kind"] != "page_geom" else ""
        j = 0 if span["kind"] == "page_geom" else rng.choice((0, 1))
        return {"kind": span["kind"], "text": span["text"],
                "media_ref": encode_geom(int(det["x0"]) * 2 + j,
                                         int(det["y0"]) * 2 + j,
                                         int(det["x1"]) * 2 + j,
                                         int(det["y1"]) * 2 + j,
                                         det["score"], media),
                "offset": span["offset"]}

    big = [jitter(s) for s in spans]
    golden = extract_document(big)
    raw = pa.Table.from_pylist([{"doc_id": "doc-odd", "spans": big}],
                               schema=DOC_SCHEMA)
    out = extract_documents(ray.data.from_arrow(raw),
                            ExtractConfig.for_cpus(4)).take_all()
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in out[0]["spans"]]
    exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in golden]
    assert got == exp and len(got) > 0


def test_oversized_page_extracts_identically():
    """A whole oversized document must extract byte-identically to its
    normal-size twin (the downshift restores the same effective frame), and
    the generated corpus does contain oversized pages."""
    from pdf_extract_kit_ray.oracle import extract_document
    from pdf_extract_kit_ray.sources.corpus import encode_geom, parse_raw_span

    spans = generate_raw_document("doc-big", 7, n_pages=4)
    # precondition: this seed's pages are all base-size (doubling once must
    # not stack on an already-oversized page, which downshifts only once)
    assert all("3308" not in s["media_ref"]
               for s in spans if s["kind"] == "page_geom")

    def doubled(span):
        det = parse_raw_span(span)
        media = det["media_ref"] if span["kind"] != "page_geom" else ""
        return {
            "kind": span["kind"], "text": span["text"],
            "media_ref": encode_geom(int(det["x0"]) * 2, int(det["y0"]) * 2,
                                     int(det["x1"]) * 2, int(det["y1"]) * 2,
                                     det["score"], media),
            "offset": span["offset"],
        }

    # force every page oversized by doubling all geometry (incl. page_geom)
    big = [doubled(s) for s in spans]
    a = extract_document(spans)
    b = extract_document(big)
    assert a == b and len(a) > 0


def test_pdf2image_render_backend_geometry():
    """S4 (reference pdf_extract_kit/utils/pdf_utils.py:3-5): the poppler
    variant renders at the pdf2image default 200 dpi with NO size cap — a
    uniform 200/144 upscale of the dpi-144 frame, applied to pages that
    carry render dims.  The vectorized explode must equal the straight-line
    twin element-for-element."""
    from pdf_extract_kit_ray.sources.corpus import (generate_corpus,
                                                    render_geometry,
                                                    split_pages_geom)

    s = 200.0 / 144.0
    assert render_geometry(1654, 2339, "pdf2image") == (
        int(1654 * s), int(2339 * s), s)
    # no >3000px downshift in the poppler path
    assert render_geometry(3308, 4678, "pdf2image") == (
        int(3308 * s), int(4678 * s), s)
    with pytest.raises(ValueError):
        render_geometry(100, 100, "nonsense")

    raw, _ = generate_corpus(14, seed=9, with_golden=False)
    pages_vec = explode_pages(raw, backend="pdf2image").to_pylist()
    i = 0
    diffs = 0
    for doc in raw.to_pylist():
        twin = split_pages_geom(doc["spans"], "pdf2image")
        fitz = split_pages_geom(doc["spans"], "fitz")
        for page, ref in zip(pages_vec[i:i + len(twin)], twin):
            assert page["doc_id"] == doc["doc_id"]
            assert (page["width"], page["height"]) == (ref["width"],
                                                       ref["height"])
            got = [(d["kind"], d["x0"], d["y0"], d["x1"], d["y1"],
                    d["text"], d["media_ref"]) for d in page["raw_dets"]]
            exp = [(d["kind"], d["x0"], d["y0"], d["x1"], d["y1"],
                    d["text"], d["media_ref"]) for d in ref["els"]]
            assert got == exp
        # discriminating: the 200-dpi frame really differs from fitz's
        if any(p["width"] != f["width"] for p, f in zip(twin, fitz)):
            diffs += 1
        i += len(twin)
    assert diffs > 0


def test_pdf2image_backend_pipeline_equals_oracle(ray_session):
    """Full pipeline with render_backend='pdf2image' must reproduce the
    straight-line oracle run with the same backend (span-sequence
    equality), and must NOT equal the fitz-backend goldens on a corpus
    with oversized pages."""
    from pdf_extract_kit_ray.oracle import extract_document
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents)
    from pdf_extract_kit_ray.sources.corpus import generate_corpus

    raw, _ = generate_corpus(10, seed=13, with_golden=False)
    golden = {d["doc_id"]: extract_document(d["spans"], "pdf2image")
              for d in raw.to_pylist()}
    fitz_golden = {d["doc_id"]: extract_document(d["spans"], "fitz")
                   for d in raw.to_pylist()}
    out = extract_documents(
        ray.data.from_arrow(raw),
        ExtractConfig.for_cpus(4, render_backend="pdf2image")).take_all()
    assert len(out) == len(golden)
    key = lambda s: (s["kind"], s["text"], s["media_ref"], s["offset"])
    for row in out:
        got = [key(s) for s in row["spans"]]
        exp = [key(s) for s in golden[row["doc_id"]]]
        assert got == exp and len(got) > 0
    # span output is scale-invariant on this corpus (uniform upscale keeps
    # reading order and crop content), so discriminate the backends at the
    # S7 JSON surface: page_info carries the render dims and det polys
    # carry render-frame coordinates.
    del fitz_golden
    from pdf_extract_kit_ray.pipelines.extract import extract_reference_json
    j_pdf = {r["doc_id"]: r["json"] for r in extract_reference_json(
        ray.data.from_arrow(raw),
        ExtractConfig.for_cpus(4, render_backend="pdf2image")).take_all()}
    j_fitz = {r["doc_id"]: r["json"] for r in extract_reference_json(
        ray.data.from_arrow(raw),
        ExtractConfig.for_cpus(4)).take_all()}
    assert any(j_pdf[d] != j_fitz[d] for d in j_pdf)


def test_golden_requires_reordering():
    """Raw order is a shuffle of reading order: the identity map must NOT
    reproduce the golden for most docs (FIXTURES.md F1)."""
    raw, golden = generate_corpus(10, seed=2)
    identical = 0
    for r, g in zip(raw.to_pylist(), golden.to_pylist()):
        raw_kinds = [s["kind"] for s in r["spans"]]
        gold_kinds = [s["kind"] for s in g["spans"]]
        if raw_kinds == gold_kinds:
            identical += 1
    assert identical < 3


def test_table_stage_parses_and_caps(ray_session):
    raw, _ = generate_corpus(6, seed=4, with_golden=False)
    pages = explode_pages(raw)
    pages = LayoutStage()(pages)
    pages = MFDStage()(pages)
    stage = TableStage()
    out = stage(pages)
    tables = [t for row in out.column("table_sources").to_pylist() for t in row]
    assert all(t.startswith("<table>") for t in tables)
    assert stage.timeouts == 0
    # straggler cap: a payload above the element budget yields '' + a metric
    capped = TableStage(max_elements=0)
    out2 = capped(pages)
    tables2 = [t for row in out2.column("table_sources").to_pylist() for t in row]
    assert len(tables2) == len(tables)
    if tables2:
        assert all(t == "" for t in tables2)
        assert capped.timeouts == len(tables2)


def test_distributed_corpus_equals_sequential(ray_session, tmp_path):
    import pyarrow.dataset as pads
    from pdf_extract_kit_ray.sources.corpus import (generate_raw_document,
                                                    write_corpus_distributed)
    out = str(tmp_path / "dist")
    write_corpus_distributed(out, 40, seed=5, docs_per_block=16)
    t = pads.dataset(out).to_table().sort_by("doc_id")
    assert t.num_rows == 40
    for row in (t.slice(0, 1).to_pylist() + t.slice(33, 1).to_pylist()):
        assert [dict(s) for s in row["spans"]] == \
            generate_raw_document(row["doc_id"], 5)


def test_read_corpus_jsonl_roundtrip(ray_session, tmp_path):
    """A corpus exported as JSON lines reads back through read_corpus and
    extracts byte-identically to the parquet-read pipeline."""
    import json

    import ray.data

    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents,
                                                       read_corpus)
    from pdf_extract_kit_ray.sources.corpus import generate_corpus

    raw, _ = generate_corpus(8, seed=21, with_golden=False)
    jdir = tmp_path / "jsonl"
    jdir.mkdir()
    with open(jdir / "part-00000.jsonl", "w") as f:
        for row in raw.to_pylist():
            f.write(json.dumps(row) + "\n")

    cfg = ExtractConfig.for_cpus(4)
    via_json = extract_documents(read_corpus(str(jdir)), cfg).take_all()
    via_arrow = extract_documents(ray.data.from_arrow(raw), cfg).take_all()
    key = lambda rows: {r["doc_id"]: r["spans"] for r in rows}
    assert key(via_json) == key(via_arrow)


def test_doc_chunks_semantics(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.text import doc_chunks
    toks = [f"t{i}" for i in range(100)]
    docs = [
        {"doc_id": 0, "text": ""},                       # no chunks
        {"doc_id": 1, "text": "   "},                    # whitespace-only
        {"doc_id": 2, "text": "a b c"},                  # one short chunk
        {"doc_id": 3, "text": " ".join(toks[:64])},      # exactly one window
        {"doc_id": 4, "text": " ".join(toks[:65])},      # window + 1
        {"doc_id": 5, "text": " ".join(toks)},           # 100 tokens
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    df = (doc_chunks(str(tmp_path), window=64, stride=48).to_pandas()
          .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    by_doc = {d: g for d, g in df.groupby("doc_id")}
    assert 0 not in by_doc and 1 not in by_doc
    assert list(by_doc[2]["chunk_text"]) == ["a b c"]
    assert list(by_doc[2]["n_tokens"]) == [3]
    assert list(by_doc[3]["n_tokens"]) == [64]      # window reached end
    # 65 tokens -> chunks at 0 (64 toks) and 48 (17 toks)
    assert list(by_doc[4]["n_tokens"]) == [64, 17]
    assert by_doc[4]["chunk_text"].iloc[1] == " ".join(toks[48:65])
    # 100 tokens -> starts 0 and 48 (the 48-window reaches the end;
    # a start at 96 would be fully contained in it and is not emitted)
    assert list(by_doc[5]["n_tokens"]) == [64, 52]
    assert by_doc[5]["chunk_text"].iloc[1] == " ".join(toks[48:100])
    # overlap region identical between consecutive chunks
    c0, c1 = by_doc[5]["chunk_text"].iloc[0], by_doc[5]["chunk_text"].iloc[1]
    assert c0.split()[48:] == c1.split()[:16]
