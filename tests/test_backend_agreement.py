"""extraction_agreement: self-comparison is exact (rate 1.0, every doc
paired), and the mock-vs-mock2 report matches a driver-side
recomputation of the span-sequence equality on the tiny corpus."""

import __ray_entry__ as E
from pdf_extract_kit_ray.pipelines.extract import extraction_agreement

SF = "/root/testdata/sf0.001"


def _spans_key(row):
    return [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]


def test_self_agreement_is_exact(ray_session):
    rep = extraction_agreement(E._extract(SF, "mock"),
                               E._extract(SF, "mock")).to_pandas()
    assert len(rep) == 1
    r = rep.iloc[0]
    assert r["n_docs"] == r["n_both"] == r["n_identical"] > 0
    assert r["agreement_rate"] == 1.0
    assert r["total_spans_a"] == r["total_spans_b"]


def test_ab_report_matches_direct_compare(ray_session):
    rep = E.queries()["backend_agreement_report"](SF).to_pandas().iloc[0]
    a = {row["doc_id"]: _spans_key(row)
         for row in E._extract(SF, "mock").take_all()}
    b = {row["doc_id"]: _spans_key(row)
         for row in E._extract(SF, "mock2").take_all()}
    assert rep["n_docs"] == len(set(a) | set(b))
    assert rep["n_both"] == len(set(a) & set(b))
    n_eq = sum(1 for d in set(a) & set(b) if a[d] == b[d])
    assert rep["n_identical"] == n_eq
    assert rep["total_spans_a"] == sum(len(v) for v in a.values())
    assert rep["total_spans_b"] == sum(len(v) for v in b.values())
    assert abs(rep["agreement_rate"]
               - round(n_eq / rep["n_docs"], 6)) < 1e-9
