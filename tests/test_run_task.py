"""Per-task CLI surface (reference scripts/{layout_detection,...}.py
analogs): every named task builds and runs its stage chain; the CLI itself
round-trips via subprocess once."""

import json
import subprocess
import sys

import pytest

from pdf_extract_kit_ray.sources.corpus import write_corpus


@pytest.fixture(scope="module")
def raw_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("runtask")
    write_corpus(str(out), 6, seed=5, with_golden=False)
    return str(out / "raw")


@pytest.mark.parametrize("task", ["layout", "formula_detection",
                                  "formula_recognition", "ocr",
                                  "table_parsing"])
def test_task_chain_runs(ray_session, raw_corpus, task):
    sys.path.insert(0, "/root/repo/scripts")
    import run_task

    import pdf_extract_kit_ray.stages.extract_stages  # noqa: F401
    from pdf_extract_kit_ray.pipelines.extract import read_corpus
    from pdf_extract_kit_ray.registry import build_pipeline

    # fractional per-actor CPUs: the 4-CPU test cluster must fit up to 4
    # stacked pools AND the stateless read/explode tasks
    specs = run_task.build_specs(task, "mock", concurrency=1, batch_size=32,
                                 num_cpus=0.5)
    rows = build_pipeline(read_corpus(raw_corpus), specs).take_all()
    assert len(rows) > 0
    assert all("doc_id" in r and "page_no" in r for r in rows)
    if task == "table_parsing":
        assert any(r["table_sources"] for r in rows)
    if task in ("layout", "formula_detection", "formula_recognition", "ocr"):
        assert any(r["dets"] for r in rows)
    if task == "formula_recognition":
        recognized = [d for r in rows for d in r["dets"]
                      if d["kind"] in ("inline", "isolated") and d["text"]]
        assert recognized


def test_cli_subprocess(raw_corpus, tmp_path):
    out = subprocess.run(
        [sys.executable, "/root/repo/scripts/run_task.py", "--task", "layout",
         "--input", raw_corpus, "--output", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=180,
        env={"RAY_ADDRESS": "local", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["task"] == "layout" and rep["rows"] > 0
