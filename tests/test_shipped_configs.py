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
    if name.endswith("_gpu.yaml"):
        pytest.skip("GPU spec: plans everywhere, executes only on CUDA "
                    "clusters (plan asserted in test_gpu_spec_plan)")
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


def _walk_plan(ds):
    """All logical operators of a (lazy) Dataset, sink-to-source."""
    ops, stack = [], [ds._logical_plan.dag]
    while stack:
        op = stack.pop()
        ops.append(op)
        stack.extend(op.input_dependencies)
    return ops


def test_gpu_spec_plan(ray_session):
    """The GPU deployment spec must land num_gpus / accelerator_type in
    the map_batches ray_remote_args WITHOUT needing a GPU to plan (lazy
    Datasets defer resource acquisition to execution)."""
    raw = entrymod._corpus_path("/root/testdata/sf0.001")
    spec = load_pipeline_yaml(os.path.join(CONFIG_DIR,
                                           "extract_spans_gpu.yaml"))
    ds = build_pipeline(read_corpus(raw), spec)
    gpu_args = [op._ray_remote_args.get("num_gpus")
                for op in _walk_plan(ds)
                if getattr(op, "_ray_remote_args", None)
                and "num_gpus" in op._ray_remote_args]
    # layout/mfd/mfr at 1 GPU, ocr/table at 0.5 (order is sink-first)
    assert sorted(gpu_args) == [0.5, 0.5, 1, 1, 1]


def test_extract_config_gpu_passthrough(ray_session):
    """ExtractConfig's per-stage num_gpus/accelerator_type knobs must
    reach every model stage's ray_remote_args in split mode, and the
    fused knob in fused_actors mode; CPU-mode plans carry none."""
    import ray.data
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_page_spans)
    from pdf_extract_kit_ray.sources.corpus import generate_corpus
    raw, _ = generate_corpus(4, seed=1)
    base = ray.data.from_arrow(raw)

    cfg = ExtractConfig.for_cpus(4, stage_mode="split_actors")
    cfg.layout_num_gpus = 1.0
    cfg.mfd_num_gpus = 0.5
    cfg.mfr_num_gpus = 1.0
    cfg.ocr_num_gpus = 0.25
    cfg.accelerator_type = "A100"
    args = [op._ray_remote_args for op in _walk_plan(
        extract_page_spans(base, cfg))
        if getattr(op, "_ray_remote_args", None)
        and "num_gpus" in op._ray_remote_args]
    assert sorted(a["num_gpus"] for a in args) == [0.25, 0.5, 1.0, 1.0]
    assert all(a["accelerator_type"] == "A100" for a in args)

    fused = ExtractConfig.for_cpus(4, stage_mode="fused_actors")
    fused.fused_num_gpus = 2.0
    fargs = [op._ray_remote_args for op in _walk_plan(
        extract_page_spans(base, fused))
        if getattr(op, "_ray_remote_args", None)
        and "num_gpus" in op._ray_remote_args]
    assert [a["num_gpus"] for a in fargs] == [2.0]
    assert "accelerator_type" not in fargs[0]

    cpu = ExtractConfig.for_cpus(4, stage_mode="split_actors")
    cargs = [op for op in _walk_plan(extract_page_spans(base, cpu))
             if getattr(op, "_ray_remote_args", None)
             and "num_gpus" in op._ray_remote_args]
    assert cargs == []          # CPU plans identical to pre-GPU builds
