#!/usr/bin/env python
"""Cluster job entry point for the flagship extraction pipeline.

Designed for ``ray job submit`` against a running cluster::

    ray job submit --working-dir . -- \
        python scripts/submit_job.py --input /data/raw_docs \
        --output /data/extracted --num-partitions 512

and equally runnable standalone on one node (Ray auto-inits local).  The
run is RESUMABLE: output is partitioned parquet with one `_MANIFEST.json`
per partition (counts, checksum, doc range); a re-run anti-joins the
completed partition ids and processes only the remainder
(state/manifests.py).  Use ``--resume`` after a crash/preemption.

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir of raw interleaved docs (doc_id, spans)")
    ap.add_argument("--output", required=True,
                    help="output dir (partitioned parquet + manifests)")
    ap.add_argument("--num-partitions", type=int, default=64,
                    help="output partitions (doc_id-hashed; sizes resume "
                         "granularity and file count)")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions with a complete manifest")
    ap.add_argument("--emulate-ms", type=float, default=0.0)
    ap.add_argument("--salt-pages", default="0",
                    help=">0 enables salted two-phase reassembly (page "
                         "ranges of this many pages share a shuffle salt); "
                         "'auto' probes the corpus for page-count outliers "
                         "first (one extra scan of the spans column)")
    ap.add_argument("--layout-backend", default="mock",
                    help="config-selected layout backend (mock | mock2)")
    ap.add_argument("--output-format", default="parquet",
                    choices=["parquet", "reference-json"],
                    help="parquet = resumable partitioned output with "
                         "manifests (default); reference-json = the "
                         "reference's per-doc page-result JSON as JSONL "
                         "shards (debug/interchange sink)")
    ap.add_argument("--stage-mode", default="fused_tasks",
                    choices=["fused_tasks", "fused_actors", "split_actors"],
                    help="execution shape; split_actors = one actor pool "
                         "per model stage (heterogeneous-GPU deployments)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    import dataclasses
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents,
                                                       read_corpus)
    from pdf_extract_kit_ray.state.manifests import (completed_partitions,
                                                     filter_completed,
                                                     rollup_metrics,
                                                     write_partitioned)

    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = read_corpus(args.input)
    skipped = 0
    if args.resume:
        done = completed_partitions(args.output)
        skipped = len(done)
        ds = filter_completed(ds, args.output, args.num_partitions)

    # salt probe runs AFTER resume filtering: a resumed job probes (and
    # salts for) only the remaining work, not the whole corpus
    if args.salt_pages == "auto":
        from pdf_extract_kit_ray.pipelines.extract import detect_salt_pages
        salt = detect_salt_pages(ds)
    else:
        salt = int(args.salt_pages)

    cfg = dataclasses.replace(ExtractConfig.for_cpus(cpus),
                              emulate_inference_ms=args.emulate_ms,
                              salt_pages=salt,
                              layout_backend=args.layout_backend,
                              stage_mode=args.stage_mode)

    t0 = time.time()
    if args.output_format == "reference-json":
        # the reference's primary output shape: per-doc page-result JSON
        # (S7), written as JSONL shards — a debug/interchange sink without
        # the manifest/resume machinery of the parquet path
        from pdf_extract_kit_ray.pipelines.extract import \
            extract_reference_json
        out = extract_reference_json(ds, cfg).materialize()
        out.write_json(args.output)
        metrics = {"docs": out.count()}   # count from materialized blocks
        manifests = []
    else:
        docs = extract_documents(ds, cfg)
        manifests = write_partitioned(docs, args.output, args.num_partitions)
        metrics = rollup_metrics(manifests)
    elapsed = round(time.time() - t0, 2)

    # one JSON status line on stdout (the driver/skill contract)
    print(json.dumps({"status": "ok", "elapsed_sec": elapsed,
                      "skipped_partitions": skipped,
                      "salt_pages": salt,
                      "output": args.output, **metrics}))
    ray.shutdown()


if __name__ == "__main__":
    main()
