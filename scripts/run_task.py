#!/usr/bin/env python
"""Single-task batch CLI — the analog of the reference's per-task scripts
(``scripts/{layout_detection,formula_detection,formula_recognition,ocr,
table_parsing}.py``, e.g. /root/reference/scripts/layout_detection.py:19-36):
run ONE stage chain over a raw corpus and write partitioned parquet.

Built on the same stage registry / YAML plumbing as the full pipeline::

    python scripts/run_task.py --task layout \
        --input /tmp/corpus/raw --output /tmp/out_layout

    python scripts/run_task.py --config my_pipeline.yaml \
        --input ... --output ...        # arbitrary registered-stage chain

Each named task expands to the minimal stage chain that produces its
output (OCR needs layout + formula masks first, exactly as the reference's
ocr.py runs det+rec end-to-end on raw images).  ``--config`` bypasses the
presets and builds any YAML spec via registry.load_pipeline_yaml.

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# task name -> ordered registered-stage chain (constructor options applied
# to the stage that accepts them; the chain before the final stage is its
# required input producer)
TASKS = {
    "layout": ["explode_pages", "layout"],
    "formula_detection": ["explode_pages", "mfd"],
    "formula_recognition": ["explode_pages", "mfd", "mfr"],
    "ocr": ["explode_pages", "layout", "mfd", "mfr", "ocr"],
    "table_parsing": ["explode_pages", "layout", "table"],
}

# stages that accept a backend= constructor arg
_BACKEND_STAGES = {"layout"}
# stages that run as actor pools (callable classes)
_CLASS_STAGES = {"layout", "mfd", "mfr", "ocr", "table"}


def build_specs(task: str, backend: str, concurrency: int, batch_size: int,
                num_cpus: float = None):
    """Stage specs for a named task.  ``num_cpus`` is the per-actor CPU
    reservation — stacked pools RESERVE sum(concurrency x num_cpus), so on
    small clusters pass a fraction to avoid starving the read tasks."""
    from pdf_extract_kit_ray.registry import StageSpec
    specs = []
    for name in TASKS[task]:
        opts = {"backend": backend} if name in _BACKEND_STAGES else {}
        if name in _CLASS_STAGES:
            specs.append(StageSpec(name=name, concurrency=concurrency,
                                   batch_size=batch_size, num_cpus=num_cpus,
                                   options=opts))
        else:
            specs.append(StageSpec(name=name))
    return specs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=sorted(TASKS),
                    help="named single-task chain (omit with --config)")
    ap.add_argument("--config", help="YAML pipeline spec (overrides --task)")
    ap.add_argument("--input", required=True,
                    help="parquet dir of raw interleaved docs (doc_id, spans)")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument("--backend", default="mock",
                    help="layout backend (mock | mock2)")
    ap.add_argument("--concurrency", type=int, default=0,
                    help="actor-pool size per model stage (0 = auto: "
                         "cpus // (2 * n_class_stages), the stacked-pool "
                         "reservation rule)")
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()
    if not args.task and not args.config:
        ap.error("one of --task / --config is required")

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    # importing the stage modules populates the registry
    import pdf_extract_kit_ray.stages.extract_stages  # noqa: F401
    import pdf_extract_kit_ray.stages.media  # noqa: F401
    import pdf_extract_kit_ray.stages.visualize  # noqa: F401
    from pdf_extract_kit_ray.pipelines.extract import read_corpus
    from pdf_extract_kit_ray.registry import (build_pipeline,
                                              load_pipeline_yaml)

    if args.config:
        specs = load_pipeline_yaml(args.config)
        task_name = os.path.basename(args.config)
    else:
        conc = args.concurrency
        if conc <= 0:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            n_pools = sum(1 for s in TASKS[args.task] if s in _CLASS_STAGES)
            conc = max(1, cpus // (2 * max(n_pools, 1)))
        specs = build_specs(args.task, args.backend, conc, args.batch_size)
        task_name = args.task

    t0 = time.time()
    ds = build_pipeline(read_corpus(args.input), specs)
    # detection columns are list<struct>; parquet holds them natively
    ds.write_parquet(args.output)
    n_rows = ray.data.read_parquet(args.output).count()
    print(json.dumps({
        "task": task_name,
        "stages": [s.name for s in specs],
        "rows": n_rows,
        "output": args.output,
        "elapsed_sec": round(time.time() - t0, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
