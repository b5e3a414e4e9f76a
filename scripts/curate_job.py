#!/usr/bin/env python
"""Cluster job entry point for the TRAINING-DATA CURATION pipeline — the
documents-table sibling of submit_job.py (extraction):

    ray job submit --working-dir . -- \
        python scripts/curate_job.py --input /data/documents.parquet \
        --output /data/curated --num-partitions 512

Pipeline: quality filter -> exact dedup (keep lowest doc_id, one
coarse-bucketed fingerprint shuffle) -> PII redact -> resumable
partitioned parquet with per-partition lineage manifests
(state/manifests.write_partitioned_table).  ``--resume`` skips completed
partitions.

Resume semantics note: dedup winners are recomputed over the FULL corpus
on every run (a fingerprint group's winner is min doc_id — deterministic
regardless of partitioning), and the completed-partition anti-join applies
at the WRITE side only, so a resumed run emits byte-identical partitions.

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
                    help="documents parquet file or dir "
                         "(doc_id, text, lang, source)")
    ap.add_argument("--output", required=True,
                    help="output dir (partitioned parquet + manifests)")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions with a complete manifest")
    ap.add_argument("--format", dest="data_format", default="parquet",
                    choices=("parquet", "lance"),
                    help="partition container format (lance needs the "
                         "pylance wheel; the north rule's production format)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    from pdf_extract_kit_ray.functions.joins import sized_read_parquet
    from pdf_extract_kit_ray.pipelines.curation import curate_corpus
    from pdf_extract_kit_ray.state.manifests import (
        completed_partitions, filter_completed_table,
        rollup_table_metrics, write_partitioned_table)

    docs = sized_read_parquet(args.input,
                              columns=["doc_id", "text", "lang", "source"])
    n_input = docs.count()   # parquet metadata only

    t0 = time.time()
    curated = curate_corpus(docs, min_quality=args.min_quality)

    skipped = 0
    if args.resume:
        skipped = len(completed_partitions(args.output))
        curated = filter_completed_table(curated, args.output,
                                         args.num_partitions)

    manifests = write_partitioned_table(curated, args.output,
                                        args.num_partitions,
                                        data_format=args.data_format)
    metrics = rollup_table_metrics(manifests)
    elapsed = round(time.time() - t0, 2)

    print(json.dumps({"status": "ok", "elapsed_sec": elapsed,
                      "n_input": n_input,
                      "skipped_partitions": skipped,
                      "min_quality": args.min_quality,
                      "output": args.output, **metrics}))
    ray.shutdown()


if __name__ == "__main__":
    main()
