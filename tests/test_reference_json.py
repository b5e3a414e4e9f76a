"""S7 parity: the reference-format JSON projection (per-doc page-result
list) — structural contract + cross-consistency with the golden spans."""

import json

import ray.data

from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                   extract_reference_json)
from pdf_extract_kit_ray.sources.corpus import generate_corpus


def test_reference_json_structure_and_consistency(ray_session):
    import dataclasses

    raw, golden = generate_corpus(20, seed=9, with_golden=True)
    cfg = ExtractConfig.for_cpus(4)
    out = extract_reference_json(ray.data.from_arrow(raw), cfg).take_all()
    docs = {r["doc_id"]: json.loads(r["json"]) for r in out}

    # fused det pass == split actor pools, byte for byte
    split = extract_reference_json(
        ray.data.from_arrow(raw),
        dataclasses.replace(cfg, stage_mode="split_actors",
                            actor_num_cpus=0.5)).take_all()
    assert ({r["doc_id"]: r["json"] for r in out}
            == {r["doc_id"]: r["json"] for r in split})
    assert set(docs) == set(raw.column("doc_id").to_pylist())

    goldens = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    saw_formula = saw_text = False
    for doc_id, pages in docs.items():
        for i, page in enumerate(pages):
            assert set(page) == {"layout_dets", "page_info"}
            info = page["page_info"]
            assert info["page_no"] == i
            assert info["width"] > 0 and info["height"] > 0
            for det in page["layout_dets"]:
                poly = det["poly"]
                assert len(poly) == 8
                # rectangle: (x0,y0,x1,y0,x1,y1,x0,y1)
                assert poly[0] == poly[6] and poly[2] == poly[4]
                assert poly[1] == poly[3] and poly[5] == poly[7]
                assert 0.0 <= det["score"] <= 1.0
                if det["category_type"] in ("inline", "isolated"):
                    assert "latex" in det and "text" not in det
                    saw_formula = True
                elif det["category_type"] == "text":
                    assert "text" in det and "latex" not in det
                    saw_text = True
        # the isolated-formula latex multiset must match the golden span
        # stream's isolated_formula texts (same MFR + normalization path)
        got = sorted(det["latex"]
                     for page in pages for det in page["layout_dets"]
                     if det["category_type"] == "isolated")
        # golden isolated spans carry the markdown $$-wrapped form
        # (merge_para_with_text); the JSON dets carry the raw latex
        want = sorted(s["text"].removeprefix("$$\n").removesuffix("\n$$ ")
                      for s in goldens[doc_id]
                      if s["kind"] == "isolated_formula")
        assert got == want, doc_id
    assert saw_formula and saw_text
