"""Every YAML spec shipped under configs/ must load and run end-to-end
on the tiny corpus (the reference's config-driven task surface,
configs/*.yaml + utils/config_loader.py)."""

import glob
import os

import pytest
import ray

import __ray_entry__ as entrymod
from pdf_extract_kit_ray.pipelines.extract import read_corpus
from pdf_extract_kit_ray.registry import build_pipeline, load_pipeline_yaml
import pdf_extract_kit_ray.stages.curate  # noqa: F401 (registry)
import pdf_extract_kit_ray.stages.extract_stages  # noqa: F401 (registry)
import pdf_extract_kit_ray.stages.visualize  # noqa: F401 (registry)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
SPECS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_configs_shipped():
    assert len(SPECS) >= 3


@pytest.mark.parametrize("spec_path", SPECS, ids=os.path.basename)
def test_shipped_spec_runs(ray_session, spec_path):
    name = os.path.basename(spec_path)
    if name.startswith("curate_"):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet")
    else:
        raw = entrymod._corpus_path("/root/testdata/sf0.001")
        ds = read_corpus(raw).limit(8)
    out = build_pipeline(ds, load_pipeline_yaml(spec_path))
    rows = out.take_all()
    assert rows
    if name.startswith("curate_"):
        cols = set(rows[0].keys())
        assert {"doc_id", "text", "quality", "n_tokens", "fp"} <= cols
        assert all(r["quality"] >= 0.3 and r["n_tokens"] >= 5
                   and r["lang"] in ("en", "zh") for r in rows)
        assert all(r["fp"] is not None and len(r["fp"]) == 32
                   for r in rows)
    if name.startswith("extract_spans"):
        assert {"doc_id", "page_no", "block_idx", "kind", "text",
                "media_ref"} <= set(rows[0].keys())
        kinds = {r["kind"] for r in rows} - {"__doc__", "__page__"}
        assert kinds                              # real spans came through
    if name == "layout_visualize.yaml":
        assert glob.glob("/tmp/pek_layout_vis/*.svg")


def test_backend_variant_differs(ray_session):
    """The shipped lmv3 spec must produce a different span stream than the
    default spec on the same input (the M2 head reorders/filters)."""
    raw = entrymod._corpus_path("/root/testdata/sf0.001")

    def run(spec):
        ds = read_corpus(raw).limit(8)
        rows = build_pipeline(
            ds, load_pipeline_yaml(os.path.join(CONFIG_DIR, spec))).take_all()
        return [(r["doc_id"], r["page_no"], r["block_idx"], r["kind"])
                for r in rows]

    assert run("extract_spans.yaml") != run("extract_spans_layoutlmv3.yaml")
