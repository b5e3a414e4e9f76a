"""End-to-end: the distributed Ray pipeline must produce span sequences
byte-identical to the straight-line oracle (span-sequence equality on
(kind, text, media_ref, order) — FIXTURES.md F2)."""

import pyarrow as pa
import pytest

from pdf_extract_kit_ray.oracle import span_sequence_equal
from pdf_extract_kit_ray.pipelines.extract import ExtractConfig, extract_documents
from pdf_extract_kit_ray.schemas import DOC_SCHEMA
from pdf_extract_kit_ray.sources.corpus import generate_corpus

import ray.data


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(30, seed=7)


import dataclasses


@pytest.mark.parametrize("stage_mode", ["fused_tasks", "fused_actors",
                                        "split_actors"])
def test_pipeline_matches_oracle(ray_session, corpus, stage_mode):
    raw, golden = corpus
    ds = ray.data.from_arrow(raw).repartition(6)
    cfg = dataclasses.replace(ExtractConfig.for_cpus(4),
                              stage_mode=stage_mode)
    out = extract_documents(ds, cfg)
    result = {r["doc_id"]: r["spans"] for r in out.take_all()}
    expected = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    assert set(result) == set(expected)
    mismatches = [d for d in expected
                  if not span_sequence_equal(result[d], expected[d])]
    assert mismatches == [], f"span-sequence mismatch for {mismatches[:3]}"


def test_output_schema(ray_session, corpus):
    raw, _ = corpus
    ds = ray.data.from_arrow(raw.slice(0, 4))
    out = extract_documents(ds, ExtractConfig.for_cpus(4))
    schema = out.schema()
    assert schema.names == ["doc_id", "spans"]
    table = pa.Table.from_pylist(out.take_all(), schema=DOC_SCHEMA)
    offs = [s["offset"] for row in table.column("spans").to_pylist() for s in row]
    assert all(isinstance(o, int) for o in offs)


def test_markdown_projection(ray_session, corpus):
    """S8 byte-golden: the distributed markdown sink must equal the
    straight-line oracle's per-page convert2md emission, byte for byte."""
    from pdf_extract_kit_ray.oracle import extract_markdown_document
    from pdf_extract_kit_ray.pipelines.extract import extract_markdown
    raw, _ = corpus
    ds = ray.data.from_arrow(raw.slice(0, 12)).repartition(4)
    out = extract_markdown(ds, ExtractConfig.for_cpus(4)).take_all()
    assert len(out) == 12
    md = {r["doc_id"]: r["markdown"] for r in out}
    golden = {r["doc_id"]: extract_markdown_document(r["spans"])
              for r in raw.slice(0, 12).to_pylist()}
    assert md == golden
    # titles render as markdown headings somewhere in the corpus slice
    assert any("\n# " in v for v in md.values())


def test_markdown_blank_page_byte_golden(ray_session):
    """A blank page (page_geom only — no elements) must still contribute its
    empty page to the markdown join, exactly like the oracle's per-page
    emission; and the span output must be unaffected by the page marker."""
    from pdf_extract_kit_ray.oracle import (extract_document,
                                            extract_markdown_document)
    from pdf_extract_kit_ray.pipelines.extract import extract_markdown
    from pdf_extract_kit_ray.sources.corpus import (PAGE_H, PAGE_W,
                                                    encode_geom,
                                                    generate_raw_document)

    def blank_page():
        return [{"kind": "page_geom", "text": "",
                 "media_ref": encode_geom(0, 0, PAGE_W, PAGE_H, 1.0),
                 "offset": 0}]

    p1 = generate_raw_document("doc-b", 19, n_pages=1)
    p3 = generate_raw_document("doc-b2", 23, n_pages=1)
    spans = p1 + blank_page() + p3
    raw = pa.Table.from_pylist([{"doc_id": "doc-b", "spans": spans}],
                               schema=DOC_SCHEMA)
    golden_md = extract_markdown_document(spans)
    assert "\n\n\n\n" in golden_md or golden_md.count("\n\n") >= 2
    out = extract_markdown(ray.data.from_arrow(raw),
                           ExtractConfig.for_cpus(4)).take_all()
    assert out[0]["markdown"] == golden_md

    golden_spans = extract_document(spans)
    docs = extract_documents(ray.data.from_arrow(raw),
                             ExtractConfig.for_cpus(4)).take_all()
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in docs[0]["spans"]]
    exp = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in golden_spans]
    assert got == exp


def test_pipeline_matches_oracle_lmv3(ray_session, corpus):
    """M2 byte-equality: the distributed pipeline under the LayoutLMv3-analog
    head (class-wise NMS + score-descending emission + SCORE_THRESH analog)
    must match the backend-parametrized straight-line oracle span-for-span —
    the same contract the flagship backend carries."""
    from pdf_extract_kit_ray.oracle import extract_document
    raw, _ = corpus
    sl = raw.slice(0, 12)
    cfg = dataclasses.replace(ExtractConfig.for_cpus(4),
                              layout_backend="mock2")
    out = extract_documents(ray.data.from_arrow(sl).repartition(4), cfg)
    result = {r["doc_id"]: r["spans"] for r in out.take_all()}
    expected = {r["doc_id"]: extract_document(r["spans"],
                                              layout_backend="mock2")
                for r in sl.to_pylist()}
    assert set(result) == set(expected)
    bad = [d for d in expected
           if not span_sequence_equal(result[d], expected[d])]
    assert bad == [], f"lmv3 span-sequence mismatch for {bad[:3]}"
    # and the head genuinely reorders blocks vs the default backend
    # somewhere in the slice (score-sorted vs raw emission order)
    base = {r["doc_id"]: extract_document(r["spans"])
            for r in sl.to_pylist()}
    assert any(
        [s["kind"] for s in expected[d]] != [s["kind"] for s in base[d]]
        for d in expected)


def test_backend_switch_mock2(ray_session, corpus, tmp_path):
    """M2: the config-selected layout backend switch.  'mock2' (higher score
    threshold, the LayoutLMv3-SCORE_THRESH analog) must produce a different,
    strictly smaller block-det set than 'mock', via BOTH the YAML spec path
    and ExtractConfig, and all stage modes must agree with each other under
    the alternate backend."""
    from pdf_extract_kit_ray.registry import (load_pipeline_yaml,
                                              build_pipeline)
    raw, _ = corpus
    sl = raw.slice(0, 6)

    def span_count(stage_mode, backend):
        cfg = dataclasses.replace(ExtractConfig.for_cpus(4),
                                  stage_mode=stage_mode,
                                  layout_backend=backend)
        out = extract_documents(ray.data.from_arrow(sl), cfg)
        return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"])
                              for s in r["spans"]] for r in out.take_all()}

    base = span_count("fused_tasks", "mock")
    alt_tasks = span_count("fused_tasks", "mock2")
    alt_split = span_count("split_actors", "mock2")
    assert alt_tasks == alt_split          # modes agree under mock2
    assert alt_tasks != base               # backends observably differ
    n_base = sum(len(v) for v in base.values())
    n_alt = sum(len(v) for v in alt_tasks.values())
    assert 0 < n_alt < n_base              # threshold drops blocks

    # YAML path: options: {backend: mock2} reaches the stage constructor
    spec_path = tmp_path / "pipeline.yaml"
    spec_path.write_text(
        "stages:\n"
        "  - name: explode_pages\n"
        "  - name: layout\n"
        "    concurrency: 1\n"
        "    num_cpus: 0.5\n"
        "    options: {backend: mock2}\n")
    built = build_pipeline(ray.data.from_arrow(sl),
                           load_pipeline_yaml(str(spec_path))).take_all()
    kinds = {d["kind"] for row in built for d in row["dets"]}
    assert kinds and all(k in ("title", "plain text", "abandon", "figure",
                               "figure_caption", "table", "table_caption",
                               "table_footnote", "formula_caption")
                         for k in kinds)
    # every surviving det cleared the mock2 threshold
    scores = [d["score"] for row in built for d in row["dets"]]
    assert scores and min(scores) >= 0.5


def test_registry_pipeline_builder(ray_session, corpus):
    """The config-driven plan builder composes the same stages as the
    hand-built pipeline and produces identical page-span rows."""
    from pdf_extract_kit_ray.registry import pipeline_from_config
    from pdf_extract_kit_ray.pipelines.extract import extract_page_spans
    raw, _ = corpus
    ds = ray.data.from_arrow(raw.slice(0, 5))
    spec = [
        {"name": "explode_pages"},
        {"name": "layout", "concurrency": 1, "num_cpus": 0.5, "batch_size": 32},
        {"name": "mfd", "concurrency": 1, "num_cpus": 0.5, "batch_size": 32},
        {"name": "mfr", "concurrency": 1, "num_cpus": 0.5, "batch_size": 32},
        {"name": "ocr", "concurrency": 1, "num_cpus": 0.5, "batch_size": 32},
        {"name": "assemble"},
    ]
    built = pipeline_from_config(ds, spec).take_all()
    ref = extract_page_spans(ray.data.from_arrow(raw.slice(0, 5)),
                             ExtractConfig.for_cpus(4)).take_all()
    key = lambda r: (r["doc_id"], r["page_no"], r["block_idx"])
    assert sorted(built, key=key) == sorted(ref, key=key)
