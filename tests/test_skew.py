"""Document-length skew: one 200-page doc among 2-page docs must extract
byte-identically to the straight-line oracle (page-level explode is the
skew mitigation — the unit of work is the page, SURVEY.md §4.2)."""

import pyarrow as pa
import ray.data

from pdf_extract_kit_ray.oracle import extract_document
from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                   extract_documents)
from pdf_extract_kit_ray.schemas import DOC_SCHEMA
from pdf_extract_kit_ray.sources.corpus import generate_raw_document


def test_one_giant_doc_among_small(ray_session):
    rows = [{"doc_id": "doc-whale",
             "spans": generate_raw_document("doc-whale", seed=9, n_pages=200)}]
    for i in range(15):
        rows.append({"doc_id": "doc-%04d" % i,
                     "spans": generate_raw_document("doc-%04d" % i, seed=9,
                                                    n_pages=2)})
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    golden = {r["doc_id"]: extract_document(r["spans"]) for r in rows}

    out = extract_documents(ray.data.from_arrow(raw),
                            ExtractConfig.for_cpus(4)).take_all()
    assert len(out) == 16
    for row in out:
        want = golden[row["doc_id"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in row["spans"]]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in want]
        assert got == exp, row["doc_id"]
    whale = next(r for r in out if r["doc_id"] == "doc-whale")
    assert len(whale["spans"]) > 1000   # genuinely big


def test_salted_reassembly_whale_byte_identical(ray_session):
    """SURVEY §7 stage 5: a page-count-outlier doc extracts byte-identically
    through the salted two-phase reassembly (doc_id+page-range salt groupby,
    then per-doc chunk merge), including zero-page docs and dense offsets."""
    import dataclasses
    rows = [{"doc_id": "doc-whale",
             "spans": generate_raw_document("doc-whale", seed=13, n_pages=600)},
            {"doc_id": "doc-empty", "spans": []}]
    for i in range(6):
        rows.append({"doc_id": "doc-%04d" % i,
                     "spans": generate_raw_document("doc-%04d" % i, seed=13,
                                                    n_pages=2)})
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    golden = {r["doc_id"]: extract_document(r["spans"]) for r in rows}

    cfg = dataclasses.replace(ExtractConfig.for_cpus(4), salt_pages=64)
    out = extract_documents(ray.data.from_arrow(raw), cfg).take_all()
    assert len(out) == len(rows)
    for row in out:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in row["spans"]]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in golden[row["doc_id"]]]
        assert got == exp, row["doc_id"]
    whale = next(r for r in out if r["doc_id"] == "doc-whale")
    assert len(whale["spans"]) > 3000         # ~10 salt groups did real work
    empty = next(r for r in out if r["doc_id"] == "doc-empty")
    assert empty["spans"] == []


def test_detect_salt_pages_probe(ray_session):
    """The skew probe salts only when a whale document is present."""
    from pdf_extract_kit_ray.pipelines.extract import detect_salt_pages
    small = [{"doc_id": "d%02d" % i,
              "spans": generate_raw_document("d%02d" % i, seed=3, n_pages=2)}
             for i in range(4)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(small, schema=DOC_SCHEMA))
    assert detect_salt_pages(ds, whale_pages=10) == 0
    whale = small + [{"doc_id": "whale",
                      "spans": generate_raw_document("whale", seed=3,
                                                     n_pages=12)}]
    ds2 = ray.data.from_arrow(pa.Table.from_pylist(whale, schema=DOC_SCHEMA))
    assert detect_salt_pages(ds2, whale_pages=10, salt_pages=64) == 64


def test_zero_page_doc_kept_with_empty_spans(ray_session):
    """The reference writes an empty result for an empty input doc
    (tasks/ocr/task.py:106-114) — the engine must not drop the doc_id."""
    rows = [{"doc_id": "doc-empty", "spans": []},
            {"doc_id": "doc-a",
             "spans": generate_raw_document("doc-a", seed=2, n_pages=1)}]
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    for mode in ("fused_tasks", "split_actors"):
        cfg = ExtractConfig.for_cpus(4, stage_mode=mode)
        out = {r["doc_id"]: r["spans"]
               for r in extract_documents(ray.data.from_arrow(raw),
                                          cfg).take_all()}
        assert set(out) == {"doc-empty", "doc-a"}, mode
        assert out["doc-empty"] == [], mode
        assert len(out["doc-a"]) > 0, mode


def test_whale_markdown_byte_identical(ray_session):
    """The Arrow-direct markdown assembly (dictionary-affix gather +
    per-page binary_join) must stay byte-equal to the row-wise oracle on a
    600-page whale plus small docs and an empty doc."""
    from pdf_extract_kit_ray.oracle import extract_markdown_document
    from pdf_extract_kit_ray.pipelines.extract import extract_markdown

    rows = [{"doc_id": "doc-whale",
             "spans": generate_raw_document("doc-whale", seed=21,
                                            n_pages=600)},
            {"doc_id": "doc-empty", "spans": []}]
    for i in range(4):
        rows.append({"doc_id": "doc-%04d" % i,
                     "spans": generate_raw_document("doc-%04d" % i, seed=21,
                                                    n_pages=2)})
    raw = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    out = extract_markdown(ray.data.from_arrow(raw),
                           ExtractConfig.for_cpus(4)).take_all()
    assert len(out) == len(rows)
    md = {r["doc_id"]: r["markdown"] for r in out}
    golden = {r["doc_id"]: extract_markdown_document(r["spans"])
              for r in rows}
    assert md == golden
    assert len(md["doc-whale"]) > 100_000     # genuinely big output
