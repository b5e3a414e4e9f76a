#!/usr/bin/env python
"""Scale-headroom evidence for the graph suite (BASELINE.md):
part_triangles and part_coreness over a planted co-purchase graph ~20x
the sf0.1 edge count (power-law hubs -> real skew), reporting wall
time, result invariants, and driver peak RSS (must stay flat — degrees
and per-node rollups are the only driver-side tables, both
#parts-bounded).

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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

OUT = "/tmp/graph_headroom"


def _make_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    marker = os.path.join(OUT, "_DONE")
    if os.path.exists(marker):
        return
    rng = np.random.RandomState(42)
    n_parts, n_templates, width, repeats = 50_000, 20_000, 8, 2
    # power-law part popularity: hubs give high-degree nodes, triangles
    # and the skew a real catalog has
    pop = (1.0 / np.arange(1, n_parts + 1) ** 0.8)
    pop /= pop.sum()
    orders, parts = [], []
    ok = 0
    for t in range(n_templates):
        basket = rng.choice(n_parts, size=width, replace=False, p=pop)
        for _ in range(repeats):
            orders.append(np.full(width, ok, np.int64))
            parts.append(basket.astype(np.int64))
            ok += 1
    t = pa.table({
        "l_orderkey": pa.array(np.concatenate(orders), pa.int64()),
        "l_partkey": pa.array(np.concatenate(parts), pa.int64())})
    pq.write_table(t, os.path.join(OUT, "lineitem.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().op_resource_reservation_enabled = False

    t0 = time.time()
    _make_corpus()
    gen_s = round(time.time() - t0, 1)

    from pdf_extract_kit_ray.pipelines import relational as R

    t0 = time.time()
    edges = R.part_affinity_pairs(OUT).materialize()
    n_edges = edges.count()
    edges_s = round(time.time() - t0, 1)

    t0 = time.time()
    tri = R.part_triangles(OUT).materialize()
    tri_s = round(time.time() - t0, 1)
    import pyarrow as pa
    tri_total = 0
    n_nodes = 0
    for b in tri.iter_batches(batch_format="pyarrow"):
        import pyarrow.compute as pc
        tri_total += int(pc.sum(b.column("n_triangles")).as_py() or 0)
        n_nodes += b.num_rows
    tri_total //= 3                        # each triangle counted per node

    t0 = time.time()
    core = R.part_coreness(OUT).materialize()
    core_s = round(time.time() - t0, 1)
    import pyarrow.compute as pc
    max_core = 0
    bad = 0
    for b in core.iter_batches(batch_format="pyarrow"):
        max_core = max(max_core,
                       int(pc.max(b.column("coreness")).as_py() or 0))
        bad += int(pc.sum(pc.cast(pc.greater(
            b.column("coreness"), b.column("degree")), pa.int64()))
            .as_py() or 0)
    assert bad == 0, "coreness must be bounded by degree"

    rss_gb = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                   / 1e6, 2)
    print(json.dumps({
        "gen_s": gen_s, "n_edges": n_edges, "edges_s": edges_s,
        "n_nodes": n_nodes, "triangles": tri_total,
        "triangles_s": tri_s, "max_coreness": max_core,
        "coreness_s": core_s, "driver_peak_rss_gb": rss_gb}))
    ray.shutdown()


if __name__ == "__main__":
    main()
