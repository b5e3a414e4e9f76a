#!/usr/bin/env python
"""Scale-headroom evidence for media_feature_neardup (BASELINE.md): run the
capped random-hyperplane LSH near-dup over a 100,000-item media table and
report wall time, pair recall on the planted duplicates, and driver peak
RSS (which must stay flat — nothing corpus-sized touches the driver).

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import json
import os
import resource
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

    import pdf_extract_kit_ray.pipelines.multimodal as mm
    from pdf_extract_kit_ray.sources.media import media_table_path

    t0 = time.time()
    media_table_path("/tmp/scale100k")      # generate/cache outside timing
    gen_s = round(time.time() - t0, 1)

    import numpy as np

    t0 = time.time()
    ds = mm.media_feature_neardup("/tmp/scale100k")
    n_pairs = 0
    all_a, all_b = [], []
    # stream the pair table (never to_pandas the whole result): keep only
    # the (a, b) edge columns for the planted-connectivity check
    for b in ds.iter_batches(batch_format="pyarrow"):
        n_pairs += b.num_rows
        all_a.append(b.column("a").to_numpy())
        all_b.append(b.column("b").to_numpy())
    run_s = round(time.time() - t0, 1)

    # Planted ground truth: every id % 20 == 19 duplicates id-3's payload.
    # Inside an over-cap bucket (this corpus's features cluster heavily at
    # cosine >= 0.999) the LSH emits STAR pairs against the segment-min id
    # rather than all pairs, so a planted pair may be linked THROUGH its
    # cluster representative instead of directly — the documented contract
    # is duplicate-CLUSTER connectivity at the threshold, which is what
    # union-find over the emitted edges checks.
    a = np.concatenate(all_a) if all_a else np.array([], np.int64)
    b = np.concatenate(all_b) if all_b else np.array([], np.int64)
    parent: dict = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        parent[find(x)] = find(y)
    planted = [(i - 3, i) for i in range(19, 100_000, 20)]
    connected = sum(1 for x, y in planted
                    if x in parent and y in parent and find(x) == find(y))
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "items": 100_000,
        "generate_sec": gen_s,
        "neardup_sec": run_s,
        "pairs": n_pairs,
        "planted": len(planted),
        "planted_connected": connected,
        "driver_peak_rss_gb": round(rss_gb, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
