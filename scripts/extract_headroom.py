#!/usr/bin/env python
"""Scale-headroom evidence for the flagship extraction pipeline
(BASELINE.md): full extraction + resumable partitioned write + lineage
rollup over the 10x corpus (40,000 docs), reporting docs/s, pages/s,
span totals, and driver peak RSS (must stay flat — nothing corpus-sized
touches the driver).

``--pressure`` additionally reruns the identical job under a CAPPED
object store (default 1 GiB) in a fresh Ray session and reports the
spill volume plus checksum equality vs the uncapped run — evidence the
one-shuffle assembly survives when blocks exceed memory and spill to
disk instead of OOMing or corrupting output (the 100 TB failure mode a
60k-row test can't see).

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import argparse
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


def _spilled_mib() -> float:
    """Session spill volume (MiB): total bytes in the current session's
    ray_spilled_objects dirs (memory_summary needs grpc, absent here)."""
    import glob

    import ray
    try:
        sess = ray._private.worker.global_worker.node.get_session_dir_path()
    except Exception:
        return 0.0
    tot = 0
    for f in glob.glob(os.path.join(sess, "ray_spilled_objects*", "*")):
        try:
            tot += os.path.getsize(f)
        except OSError:
            pass
    return round(tot / (1 << 20), 1)


def _run_once(object_store_bytes=None) -> dict:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR",
             object_store_memory=object_store_bytes)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents,
                                                       read_corpus)
    from pdf_extract_kit_ray.state.manifests import (rollup_metrics,
                                                     write_partitioned)

    shutil.rmtree(OUT, ignore_errors=True)
    cpus = int(ray.cluster_resources().get("CPU", 32))
    t0 = time.time()
    docs = extract_documents(read_corpus(CORPUS, num_blocks=4 * cpus),
                             ExtractConfig.for_cpus(cpus))
    manifests = write_partitioned(docs, OUT, num_partitions=64)
    metrics = rollup_metrics(manifests)
    elapsed = time.time() - t0
    out = {
        "docs": metrics["n_docs"],
        "spans": metrics["n_spans"],
        "partitions": metrics["n_partitions"],
        "checksum": metrics["checksum"],
        "extract_write_sec": round(elapsed, 1),
        "docs_per_sec": round(metrics["n_docs"] / elapsed, 1),
        "spilled_mib": _spilled_mib(),
        "object_store_gb": (round(object_store_bytes / (1 << 30), 2)
                            if object_store_bytes else None),
    }
    ray.shutdown()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pressure", action="store_true",
                    help="also rerun under a capped object store and "
                         "compare checksums + report spill bytes")
    ap.add_argument("--capped-gb", type=float, default=1.0)
    args = ap.parse_args()

    import ray
    marker = os.path.join(CORPUS, "_DONE")
    t0 = time.time()
    if not os.path.exists(marker):
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
        from pdf_extract_kit_ray.sources.corpus import \
            write_corpus_distributed
        write_corpus_distributed(CORPUS, N_DOCS, seed=11)
        with open(marker, "w") as f:
            f.write("ok")
        ray.shutdown()
    gen_s = round(time.time() - t0, 1)

    base = _run_once()
    report = {"generate_sec": gen_s, "uncapped": base,
              "driver_peak_rss_gb": round(
                  resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                  / (1 << 20), 2)}
    if args.pressure:
        capped = _run_once(int(args.capped_gb * (1 << 30)))
        report["capped"] = capped
        report["checksum_stable"] = \
            capped["checksum"] == base["checksum"] and \
            capped["spans"] == base["spans"]
        report["driver_peak_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20),
            2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
