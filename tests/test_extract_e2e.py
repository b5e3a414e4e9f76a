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


def test_pipeline_matches_oracle(ray_session, corpus):
    raw, golden = corpus
    ds = ray.data.from_arrow(raw).repartition(6)
    out = extract_documents(ds, ExtractConfig.for_cpus(4))
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
