#!/usr/bin/env python
"""Scale-headroom evidence for the similarity suite (BASELINE.md): run
brute-force ANN, IVF ANN, and distributed k-means over a 100,000 x 64-dim
embeddings table (20x the sf0.1 table) and report wall times, IVF-vs-exact
agreement, and driver peak RSS (must stay flat).

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

N_VECS = 100_000
DIM = 64
OUT = "/tmp/pek_sim100k"


def generate(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(23)
    mat = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array((np.arange(N_VECS) % 16).astype(np.int32),
                          pa.int32()),
    }), path)


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(OUT)
    gen_s = round(time.time() - t0, 1)

    from pdf_extract_kit_ray.pipelines import similarity

    res: dict = {"vectors": N_VECS, "dim": DIM, "generate_sec": gen_s}

    t0 = time.time()
    exact = similarity.ann_topk(OUT).to_pandas()
    res["ann_exact_sec"] = round(time.time() - t0, 1)

    # IVF at two nprobe settings: the recall/speed knob (isotropic
    # gaussian vectors are the worst case for cell pruning — real
    # clustered embeddings trade far better)
    e = {(int(q), int(n)) for q, n in zip(exact.query_id, exact.neighbor_id)}
    for nprobe in (4, 8):
        t0 = time.time()
        ivf = similarity.ivf_topk(OUT, nprobe=nprobe).to_pandas()
        res[f"ivf_nprobe{nprobe}_sec"] = round(time.time() - t0, 1)
        i = {(int(q), int(n)) for q, n in zip(ivf.query_id, ivf.neighbor_id)}
        res[f"ivf_nprobe{nprobe}_recall"] = round(len(e & i) / len(e), 3)

    # IVF-PQ: same pruning + int8 residual codes — recall gap vs ivf at the
    # same nprobe isolates the quantization error
    t0 = time.time()
    pq_res = similarity.ivfpq_topk(OUT, nprobe=8).to_pandas()
    res["ivfpq_nprobe8_sec"] = round(time.time() - t0, 1)
    p = {(int(q), int(n)) for q, n in zip(pq_res.query_id, pq_res.neighbor_id)}
    res["ivfpq_nprobe8_recall"] = round(len(e & p) / len(e), 3)

    t0 = time.time()
    km = similarity.embedding_kmeans(OUT).to_pandas()
    res["kmeans_sec"] = round(time.time() - t0, 1)
    res["kmeans_assigned"] = int(km.n.sum())

    t0 = time.time()
    q = similarity.embedding_quantize(OUT)
    import pyarrow.compute as _pc
    n_q = mse_max = 0
    for b in q.iter_batches(batch_format="pyarrow"):
        n_q += b.num_rows
        mse_max = max(mse_max, _pc.max(b.column("mse")).as_py() or 0)
    res["quantize_sec"] = round(time.time() - t0, 1)
    res["quantize_rows"] = n_q
    res["quantize_mse_max"] = round(mse_max, 6)

    res["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
