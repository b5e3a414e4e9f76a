#!/usr/bin/env python
"""Quantify the automatic page-skew probe's cost (BASELINE.md evidence):
at the 10x corpus (40,000 docs), time ``detect_salt_pages`` (one pruned
scan of the spans column reduced to per-block maxima) against the full
extraction run it guards, so the "when to enable salt_pages" guidance has
numbers.

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().op_resource_reservation_enabled = False

    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       detect_salt_pages,
                                                       extract_documents,
                                                       read_corpus)
    from pdf_extract_kit_ray.sources.corpus import write_corpus_distributed

    out = "/tmp/pek_corpus_10x_probe"
    marker = os.path.join(out, "_DONE")
    t0 = time.time()
    if not os.path.exists(marker):
        write_corpus_distributed(out, 40_000, seed=11)
        with open(marker, "w") as f:
            f.write("ok")
    gen_s = round(time.time() - t0, 1)

    cpus = int(ray.cluster_resources().get("CPU", 32))
    ds = read_corpus(out, num_blocks=4 * cpus)

    t0 = time.time()
    salt = detect_salt_pages(ds)
    probe_s = round(time.time() - t0, 2)

    t0 = time.time()
    n = extract_documents(read_corpus(out, num_blocks=4 * cpus),
                          ExtractConfig.for_cpus(cpus)).count()
    extract_s = round(time.time() - t0, 1)

    print(json.dumps({
        "docs": 40_000,
        "generate_sec": gen_s,
        "probe_sec": probe_s,
        "probe_salt_result": salt,
        "extract_sec": extract_s,
        "extract_docs": n,
        "probe_pct_of_pipeline": round(100 * probe_s / extract_s, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
