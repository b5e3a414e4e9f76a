#!/usr/bin/env python
"""Scale-headroom evidence for the flagship extraction pipeline
(BASELINE.md): full extraction + resumable partitioned write + lineage
rollup over the 10x corpus (40,000 docs), reporting docs/s, pages/s,
span totals, and driver peak RSS (must stay flat — nothing corpus-sized
touches the driver).

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_DOCS = 40_000
CORPUS = "/tmp/pek_corpus_40k"
OUT = "/tmp/pek_extract_headroom_out"


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents,
                                                       read_corpus)
    from pdf_extract_kit_ray.sources.corpus import write_corpus_distributed
    from pdf_extract_kit_ray.state.manifests import (rollup_metrics,
                                                     write_partitioned)

    marker = os.path.join(CORPUS, "_DONE")
    t0 = time.time()
    if not os.path.exists(marker):
        write_corpus_distributed(CORPUS, N_DOCS, seed=11)
        with open(marker, "w") as f:
            f.write("ok")
    gen_s = round(time.time() - t0, 1)

    shutil.rmtree(OUT, ignore_errors=True)
    cpus = int(ray.cluster_resources().get("CPU", 32))

    t0 = time.time()
    docs = extract_documents(read_corpus(CORPUS, num_blocks=4 * cpus),
                             ExtractConfig.for_cpus(cpus))
    manifests = write_partitioned(docs, OUT, num_partitions=64)
    metrics = rollup_metrics(manifests)
    elapsed = time.time() - t0

    print(json.dumps({
        "docs": metrics["n_docs"],
        "spans": metrics["n_spans"],
        "partitions": metrics["n_partitions"],
        "generate_sec": gen_s,
        "extract_write_sec": round(elapsed, 1),
        "docs_per_sec": round(metrics["n_docs"] / elapsed, 1),
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20),
            2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
