#!/usr/bin/env python
"""Scale-headroom evidence for the text dedup suite (BASELINE.md): run
exact / MinHash / SimHash / winnowing dedup over a 50,000-doc corpus
(10x the sf0.1 documents table) with planted duplicates, and report wall
times, planted-pair recall, and driver peak RSS (must stay flat).

Corpus: deterministic random token sequences (10k vocab, 50-70 tokens) —
random pairs sit at Jaccard ~0, so the ONLY pairs above threshold are the
planted ones: 10 near-dup pairs (one token replaced -> word-shingle
Jaccard ~0.9) and 5 exact-dup pairs.  Expectations:

* exact_dedup: exactly 5 groups of size 2;
* minhash_dedup: all 15 planted pairs (near + exact), nothing else;
* simhash_dedup: the 5 exact pairs (Hamming 0); the 1-of-60-token edits
  sit beyond Hamming 3 by design — simhash targets much nearer dups;
* winnow_neardup: the 15 planted pairs among its shared-substring pairs.

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

N_DOCS = 50_000
N_NEAR = 10
N_EXACT = 5
OUT = "/tmp/pek_dedup50k"


def generate(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i}" for i in range(10_000)])
    lens = rng.integers(50, 71, N_DOCS)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), n)])
             for n in lens]
    # planted pairs occupy the first ids: (2i, 2i+1) near-dup for
    # i < N_NEAR, then exact pairs
    for i in range(N_NEAR):
        toks = texts[2 * i].split()
        toks[len(toks) // 2] = "EDITED"
        texts[2 * i + 1] = " ".join(toks)
    for i in range(N_NEAR, N_NEAR + N_EXACT):
        texts[2 * i + 1] = texts[2 * i]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * N_DOCS, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), path)


N_PARA_DOCS = 100_000
PARA_OUT = "/tmp/pek_paradedup100k"


def generate_paragraph_corpus(out_dir: str) -> None:
    """100k docs x 8 paragraphs (~800k paragraph rows); a boilerplate
    paragraph ('sign up for our newsletter today') planted in 40% of the
    docs — the C4 motivation case.  Expected: the boilerplate survives
    only in the LOWEST doc_id containing it; random paragraphs (8 tokens
    of a 10k vocab) collide with probability ~0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(10_000)])
    boiler = "sign up for our newsletter today"
    texts = []
    for i in range(N_PARA_DOCS):
        paras = [" ".join(vocab[rng.integers(0, len(vocab), 8)])
                 for _ in range(8)]
        if rng.random() < 0.4:
            paras[int(rng.integers(0, 8))] = boiler
        texts.append("\n".join(paras))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(N_PARA_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
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

    from pdf_extract_kit_ray.pipelines import dedup

    near = {(2 * i, 2 * i + 1) for i in range(N_NEAR)}
    exact = {(2 * i, 2 * i + 1) for i in range(N_NEAR, N_NEAR + N_EXACT)}
    res: dict = {"docs": N_DOCS, "generate_sec": gen_s}

    t0 = time.time()
    groups = dedup.exact_dedup(OUT).to_pandas()
    res["exact_sec"] = round(time.time() - t0, 1)
    res["exact_dup_groups"] = int((groups["n"] > 1).sum())

    t0 = time.time()
    mh = dedup.minhash_dedup(OUT).to_pandas()
    res["minhash_sec"] = round(time.time() - t0, 1)
    pairs = {(int(a), int(b)) for a, b in zip(mh.keep_id, mh.dup_id)}
    res["minhash_pairs"] = len(pairs)
    res["minhash_planted_found"] = len(pairs & (near | exact))

    t0 = time.time()
    sh = dedup.simhash_dedup(OUT).to_pandas()
    res["simhash_sec"] = round(time.time() - t0, 1)
    spairs = {(int(a), int(b)) for a, b in zip(sh.keep_id, sh.dup_id)}
    res["simhash_pairs"] = len(spairs)
    res["simhash_exact_found"] = len(spairs & exact)

    t0 = time.time()
    pj = dedup.prefix_jaccard_pairs(OUT).to_pandas()
    res["prefix_jaccard_sec"] = round(time.time() - t0, 1)
    ppairs = {(int(a), int(b)) for a, b in zip(pj.doc_a, pj.doc_b)}
    res["prefix_jaccard_pairs"] = len(ppairs)
    # EXACT join: must find every planted pair AND nothing else (random
    # pairs sit at Jaccard ~0) — the completeness guarantee LSH lacks
    res["prefix_jaccard_planted_found"] = len(ppairs & (near | exact))
    res["prefix_jaccard_false_pairs"] = len(ppairs - (near | exact))

    t0 = time.time()
    wn = dedup.winnow_neardup(OUT).to_pandas()
    res["winnow_sec"] = round(time.time() - t0, 1)
    wpairs = {(int(a), int(b)) for a, b in zip(wn.a, wn.b)}
    res["winnow_pairs"] = len(wpairs)
    res["winnow_planted_found"] = len(wpairs & (near | exact))

    t0 = time.time()
    generate_paragraph_corpus(PARA_OUT)
    res["para_generate_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    pd_res = dedup.paragraph_dedup(PARA_OUT)
    import pyarrow.compute as _pc
    n_paras = n_kept = n_docs = 0
    for b in pd_res.iter_batches(batch_format="pyarrow"):
        n_docs += b.num_rows
        n_paras += _pc.sum(b.column("n_paras")).as_py() or 0
        n_kept += _pc.sum(b.column("n_kept")).as_py() or 0
    res["paragraph_sec"] = round(time.time() - t0, 1)
    res["para_docs"] = n_docs
    res["para_total"] = n_paras            # must be N_PARA_DOCS * 8
    # boilerplate removed everywhere but its first host; random paras
    # never collide, so removed == boilerplate hosts - 1
    res["para_removed"] = n_paras - n_kept

    res["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
