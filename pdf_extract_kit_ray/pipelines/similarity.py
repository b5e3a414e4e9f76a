"""Similarity search over an embedding column (list<float>).

* ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast once
  via ``ray.put`` (read inside every task, never re-shipped per batch), each
  batch computes a vectorized (batch × queries) matmul and emits only its
  PARTIAL top-k per query, and a final tiny ``groupby(query_id)`` reduces the
  partials.  Shuffle volume is O(num_queries · k · num_blocks), independent
  of corpus size.
* ``embedding_neardup`` — pair scan over an id-bounded subset with the
  normalized matrix broadcast; emits (a, b, cosine) for cosine > threshold.
* ``ivf_topk`` — the scale path: k-means-style coarse quantizer (deterministic
  seeded init, few Lloyd iterations on a sample), then probe only the nearest
  ``nprobe`` partitions per query.  Exactness is traded for touching
  nlist/nprobe-th of the data; falls back to exact ranking inside probed
  cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _matrix_from_lists(rows) -> np.ndarray:
    """list<float> column values -> (n, dim) float64 matrix; an EMPTY input
    yields shape (0, 0) instead of the 1-D array np.asarray would produce
    (which crashes every axis=1 consumer downstream)."""
    m = np.asarray([list(v) for v in rows], dtype=np.float64)
    return m.reshape(0, 0) if m.ndim == 1 else m


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def _load_queries(sf_dir: str, num_queries: int) -> pa.Table:
    import pyarrow.dataset as pads
    return pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < num_queries)


def ann_topk(sf_dir: str, k: int = 10, num_queries: int = 8) -> "ray.data.Dataset":
    """(query_id, neighbor_id, score): cosine top-k over the whole embedding
    table for each of the first ``num_queries`` vectors (self included).
    Deterministic tie-break: higher score first, then lower neighbor_id."""
    qt = _load_queries(sf_dir, num_queries)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if qt.num_rows == 0:                     # empty embeddings table
        return ray.data.from_arrow(empty)
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    q_mat = _normalize(_matrix_from_lists(
        qt.column("embedding").to_pylist()))
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:              # empty block
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "raw_score": pa.array([], pa.float64())})
        ids, qm = ray.get(q_ref)
        x = _normalize(_embedding_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = x @ qm.T                      # (batch, num_queries)
        out_q, out_n, out_s = [], [], []
        kk = min(k, len(vec_ids))
        for qi in range(len(ids)):
            s = sims[:, qi]
            # partial top-k with (score desc, neighbor_id asc) tie-break
            order = np.lexsort((vec_ids, -s))[:kk]
            out_q.extend([ids[qi]] * len(order))
            out_n.extend(vec_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "raw_score": pa.array(out_s, pa.float64())})

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        n = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        s = np.asarray(group.column("raw_score").to_pylist(), dtype=np.float64)
        order = np.lexsort((n, -s))[:k]
        return pa.table({"query_id": pa.array([qid] * len(order), pa.int64()),
                         "neighbor_id": pa.array(n[order], pa.int64()),
                         "score": pa.array(np.round(s[order], 4), pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return (ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pyarrow"))


def embedding_neardup(sf_dir: str, threshold: float = 0.2,
                      max_id: int = 1000) -> "ray.data.Dataset":
    """Pairs (a < b) of vectors with cosine similarity > threshold within the
    vec_id < max_id subset.  The subset matrix is broadcast once; each batch
    scans its rows against the full subset and keeps only b > a pairs."""
    sub = _load_queries(sf_dir, max_id)
    if sub.num_rows == 0:                    # empty embeddings table
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    all_ids = np.asarray(sub.column("vec_id").to_pylist(), dtype=np.int64)
    mat = _normalize(_matrix_from_lists(
        sub.column("embedding").to_pylist()))
    ref = ray.put((all_ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m = ray.get(ref)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        keep = vec_ids < max_id
        vec_ids = vec_ids[keep]
        if len(vec_ids) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        x = _normalize(_embedding_matrix(batch))[keep]
        sims = x @ m.T
        rows, cols = np.nonzero(sims > threshold)
        a = vec_ids[rows]; b = ids_all[cols]; s = sims[rows, cols]
        mask = a < b
        return pa.table({"a": pa.array(a[mask], pa.int64()),
                         "b": pa.array(b[mask], pa.int64()),
                         "score": pa.array(np.round(s[mask], 4), pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=4096)


def _train_coarse_centroids(sf_dir: str, nlist: int, sample_size: int = 2048,
                            iters: int = 5) -> np.ndarray:
    """Seeded sample-trained spherical k-means quantizer (driver-side on a
    few thousand vectors — small by construction).  Shared by ``ivf_topk``
    (cell pruning) and ``semantic_dedup`` (cluster partitioning)."""
    import pyarrow.dataset as pads
    sample = pads.dataset(f"{sf_dir}/embeddings.parquet").head(sample_size)
    smat = _normalize(_matrix_from_lists(
        sample.column("embedding").to_pylist()))
    if smat.shape[0] == 0:                   # empty embeddings table
        return smat
    rng = np.random.RandomState(0)
    cent = smat[rng.choice(len(smat), size=min(nlist, len(smat)), replace=False)]
    for _ in range(iters):
        assign = (smat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = smat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def semantic_dedup(sf_dir: str, threshold: float = 0.95,
                   nlist: int = 0, target_cluster: int = 2048,
                   sample_size: int = 2048, iters: int = 5,
                   tile: int = 1024) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with a sample-trained
    spherical-k-means quantizer, then WITHIN each cluster flag every vector
    whose cosine similarity to a lower-``vec_id`` cluster member reaches
    ``threshold`` — the keep-first-id rule, so the kept set is a pure
    function of the data (no RNG, no iteration order).

    Output: (vec_id, cluster, is_dup, max_prior_sim) for every vector;
    the downstream filter keeps ``NOT is_dup``.  ``max_prior_sim`` is the
    max cosine against earlier cluster members (-1.0 for a cluster's first
    member), the paper's per-item "semantic redundancy" diagnostic.

    Scale shape: centroids broadcast once via ``ray.put`` (nlist × dim
    floats — the broadcast ceiling is ~10^6 centroids); assignment is a
    vectorized per-batch matmul; ONE hash shuffle on cluster id moves each
    (vec_id, embedding) row exactly once.  The within-cluster scan is the
    paper's O(m²) pairwise pass — ``nlist`` auto-scales to keep expected
    cluster occupancy at ``target_cluster`` (m ≈ 2048 → ~2M dot products
    per cluster), and the scan is TILED (``tile`` × m blocks) so per-task
    memory stays flat even on a skewed cluster.  Like the paper, a cluster
    far above target (quantizer skew) costs quadratic time in its own size
    only; the dedup-vs-LSH tradeoff is intentional — SemDeDup's contract
    is ALL within-cluster pairs, not banded recall."""
    import pyarrow.dataset as pads

    path = f"{sf_dir}/embeddings.parquet"
    if nlist <= 0:
        n_total = pads.dataset(path).count_rows()   # parquet metadata only
        nlist = max(8, min(1 << 16,
                           (n_total + target_cluster - 1) // target_cluster))
    cent = _train_coarse_centroids(sf_dir, nlist, sample_size, iters)
    if cent.shape[0] == 0:                   # empty embeddings table
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "is_dup": pa.array([], pa.bool_()),
            "max_prior_sim": pa.array([], pa.float64())}))
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))})
        x = _normalize(_embedding_matrix(batch))
        cell = (x @ ray.get(cent_ref).T).argmax(axis=1)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(cell.astype(np.int64), pa.int64()),
                         "embedding": batch.column("embedding")})

    def prune(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        g = group.take(pa.array(order))
        ids = ids[order]
        x = _normalize(_embedding_matrix(g))
        n = len(ids)
        best = np.full(n, -np.inf)
        for s in range(1, n, tile):
            e = min(s + tile, n)
            sims = x[s:e] @ x.T                      # (tile, n)
            mask = np.arange(n)[None, :] < np.arange(s, e)[:, None]
            best[s:e] = np.where(mask, sims, -np.inf).max(axis=1)
        finite = np.isfinite(best)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": g.column("cluster"),
            "is_dup": pa.array(finite & (best >= threshold), pa.bool_()),
            "max_prior_sim": pa.array(
                np.round(np.where(finite, best, -1.0), 6), pa.float64()),
        })

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return (ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)
              .groupby("cluster")
              .map_groups(prune, batch_format="pyarrow"))


def ivf_topk(sf_dir: str, k: int = 10, num_queries: int = 8,
             nlist: int = 16, nprobe: int = 8,
             sample_size: int = 2048, iters: int = 5) -> "ray.data.Dataset":
    """IVF-style approximate top-k: coarse centroids from a seeded sample
    (driver-side k-means on a few thousand vectors — small by construction),
    then each batch ranks only rows whose nearest centroid is among the
    query's ``nprobe`` probed cells.

    ``nprobe`` is the recall/speed knob: at 100k isotropic-gaussian
    vectors (the worst case for cell pruning), nprobe=4 gives 0.575 top-k
    agreement with exact and nprobe=8 gives 0.838 at the SAME wall time
    (the mask cost dominates the saved distance math until nlist is much
    larger), both ~3.5x faster than brute force — so 8 is the default
    (scripts/similarity_headroom.py measures both)."""
    cent = _train_coarse_centroids(sf_dir, nlist, sample_size, iters)

    qt = _load_queries(sf_dir, num_queries)
    if cent.shape[0] == 0 or qt.num_rows == 0:   # empty embeddings table
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    q_mat = _normalize(_matrix_from_lists(
        qt.column("embedding").to_pylist()))
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, cent, probes))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qm, c, pr = ray.get(ref)
        x = _normalize(_embedding_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        cell = (x @ c.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(ids)):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            s = x[mask] @ qm[qi]
            sub_ids = vec_ids[mask]
            order = np.lexsort((sub_ids, -s))[:k]
            out_q.extend([ids[qi]] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "raw_score": pa.array(out_s, pa.float64())})

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        n = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        s = np.asarray(group.column("raw_score").to_pylist(), dtype=np.float64)
        order = np.lexsort((n, -s))[:k]
        return pa.table({"query_id": pa.array([qid] * len(order), pa.int64()),
                         "neighbor_id": pa.array(n[order], pa.int64()),
                         "score": pa.array(np.round(s[order], 4), pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pyarrow"))


def ivfpq_topk(sf_dir: str, k: int = 10, num_queries: int = 8,
               nlist: int = 16, nprobe: int = 8,
               sample_size: int = 2048, iters: int = 5) -> "ray.data.Dataset":
    """IVF + int8 residual quantization — the 100 TB ANN *serving* shape:
    coarse cells prune the scan (as ``ivf_topk``) and the scanned payload is
    the COMPRESSED residual codes, not the raw float vectors.

    Composition of the two existing primitives (VERDICT r3 item 7):
    ``_train_coarse_centroids`` supplies the coarse quantizer and the
    ``embedding_quantize`` int8 scheme encodes the RESIDUAL
    ``r = normalize(x) - centroid[cell]`` against a global per-dim range.

    Pipeline shape (three streaming passes, no shuffle of raw vectors):

    1. *Range pass* — per-batch per-dim (lo, hi) of the residuals; bounded
       driver pull of two dim-length rows per BLOCK (the
       ``embedding_quantize`` sufficient-statistics pattern).
    2. *Encode stage* — pure map emitting ``(vec_id, cell, codes: binary)``;
       this is the stored index: 1 byte/dim + 1 cell id per vector, so the
       object-store (and at 100 TB, the disk) traffic downstream of this
       stage is ~4x smaller than the float column.
    3. *Scan stage* — consumes ONLY the codes table: reconstructs
       ``centroid[cell] + dequant(codes)`` for rows whose cell is among the
       query's ``nprobe`` probes, dots against the broadcast query matrix,
       and emits per-block partial top-k.  A final tiny
       ``groupby(query_id)`` merges partials.

    Scores are computed from the RECONSTRUCTED vectors, so quantization
    error shows up honestly in recall (measured vs exact in
    tests/test_dedup_similarity.py and scripts/similarity_headroom.py)
    rather than being hidden by re-reading the floats."""
    cent = _train_coarse_centroids(sf_dir, nlist, sample_size, iters)
    qt = _load_queries(sf_dir, num_queries)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if cent.shape[0] == 0 or qt.num_rows == 0:   # empty embeddings table
        return ray.data.from_arrow(empty)
    cent_ref = ray.put(cent)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    # ---- pass 1: global per-dim residual range (KB-sized partials) ----
    def range_partial(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        c = ray.get(cent_ref)
        x = _normalize(mat)
        resid = x - c[(x @ c.T).argmax(axis=1)]
        return pa.table({
            "lo": pa.array([resid.min(axis=0).tolist()], pa.list_(pa.float64())),
            "hi": pa.array([resid.max(axis=0).tolist()], pa.list_(pa.float64()))})

    rows = [r for r in ds.map_batches(range_partial,
                                      batch_format="pyarrow").take_all()
            if len(r["lo"])]                 # bounded: 2*dim doubles per block
    if not rows:
        return ray.data.from_arrow(empty)
    lo = np.min([r["lo"] for r in rows], axis=0)
    hi = np.max([r["hi"] for r in rows], axis=0)
    scale = (hi - lo) / 255.0
    scale[scale == 0] = 1.0

    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    q_mat = _normalize(_matrix_from_lists(qt.column("embedding").to_pylist()))
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, cent, probes, lo, scale))

    # ---- pass 2: encode to (vec_id, cell, int8 residual codes) ----
    empty_codes = pa.table({"vec_id": pa.array([], pa.int64()),
                            "cell": pa.array([], pa.int32()),
                            "codes": pa.array([], pa.binary())})

    def encode(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        if mat.size == 0:
            return empty_codes
        _, _, c, _, qlo, qscale = ray.get(ref)
        x = _normalize(mat)
        cell = (x @ c.T).argmax(axis=1)
        codes = np.clip(np.rint((x - c[cell] - qlo) / qscale),
                        0, 255).astype(np.uint8)
        d = codes.shape[1]
        offs = pa.array(np.arange(codes.shape[0] + 1, dtype=np.int32) * d,
                        pa.int32())
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cell": pa.array(cell.astype(np.int32), pa.int32()),
            "codes": pa.BinaryArray.from_buffers(
                pa.binary(), codes.shape[0],
                [None, offs.buffers()[1], pa.py_buffer(codes.tobytes())]),
        })

    # ---- pass 3: scan the codes only ----
    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "raw_score": pa.array([], pa.float64())})
        ids, qm, c, pr, qlo, qscale = ray.get(ref)
        col = batch.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = c.shape[1]
        # fixed-width values (dim bytes each): slice the data buffer by the
        # first value offset so sliced/offset views decode correctly
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)
        start = int(offs[col.offset])
        codes = np.frombuffer(col.buffers()[2], dtype=np.uint8,
                              count=start + batch.num_rows * dim) \
            [start:].reshape(batch.num_rows, dim)
        cell = np.asarray(batch.column("cell").to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)
        recon = codes.astype(np.float64) * qscale + qlo + c[cell]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(ids)):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            s = recon[mask] @ qm[qi]
            sub_ids = vec_ids[mask]
            order = np.lexsort((sub_ids, -s))[:k]
            out_q.extend([ids[qi]] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "raw_score": pa.array(out_s, pa.float64())})

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        n = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        s = np.asarray(group.column("raw_score").to_pylist(), dtype=np.float64)
        order = np.lexsort((n, -s))[:k]
        return pa.table({"query_id": pa.array([qid] * len(order), pa.int64()),
                         "neighbor_id": pa.array(n[order], pa.int64()),
                         "score": pa.array(np.round(s[order], 4), pa.float64())})

    return (ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)
              .map_batches(scan, batch_format="pyarrow", batch_size=4096)
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pyarrow"))


def label_centroids(sf_dir: str) -> "ray.data.Dataset":
    """Per-label centroid (prototype) vectors over the embedding column —
    the class-prototype computation behind nearest-centroid labeling and
    dataset cartography.  Emits one row per (label, dim): count and the
    mean element value.

    Scale shape: each batch reduces to one (label, dim-sums, n) partial
    row per label present (a k x dim int64 matrix — kilobytes), ONE tiny
    groupby on the low-cardinality label merges partials, and the result
    explodes to (label, dim) rows.  Shuffle volume is labels x blocks
    partial rows, never the vector stream.

    Bit-parity: elements snap to integer micro-units before summation
    (round6 arithmetic), so partial sums merge in any order and both
    engines divide the same exact integers."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    empty_partial = pa.table({
        "label": pa.array([], pa.int32()),
        "sums": pa.array([], pa.list_(pa.int64())),
        "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_partial
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb)
        dim = len(flat) // batch.num_rows
        vm = pc.cast(pc.round(
            pc.multiply(pc.cast(flat, pa.float64()), 1_000_000.0),
            ndigits=0, round_mode="half_towards_infinity"),
            pa.int64()).to_numpy().reshape(batch.num_rows, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, codes, vm)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq, pa.int32()),
            "sums": pa.array([row.tolist() for row in sums],
                             pa.list_(pa.int64())),
            "n": pa.array(counts, pa.int64())})

    def merge(group: pa.Table) -> pa.Table:
        from ..functions.num import round6
        label = group.column("label")[0].as_py()
        sums = np.asarray(group.column("sums").to_pylist(),
                          dtype=np.int64).sum(axis=0)
        n = int(np.asarray(group.column("n").to_pylist()).sum())
        dim = len(sums)
        return pa.table({
            "label": pa.array([label] * dim, pa.int32()),
            "dim": pa.array(range(1, dim + 1), pa.int64()),
            "n": pa.array([n] * dim, pa.int64()),
            "centroid": round6(pa.array(
                sums.astype(np.float64) / (n * 1_000_000.0))),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("label")
              .map_groups(merge, batch_format="pyarrow"))


def _kmeans_seed(sf_dir: str, k: int) -> "np.ndarray":
    """Deterministic k-means init shared by embedding_kmeans /
    kmeans_silhouette / cluster_purity: the vectors with vec_id < k, in
    vec_id order, via a pushed-down parquet metadata filter (never a
    full-scan Python row filter).  Empty array when the table is empty."""
    import numpy as np
    import pyarrow.dataset as pads
    init = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < k).sort_by("vec_id")
    return np.array(init.column("embedding").to_pylist(), dtype=np.float64)


def _lloyd_assign_partial(cref):
    """Per-batch Lloyd partial: assign rows to the broadcast centroids,
    emit ONE row of (k x dim sums, k counts, inertia) keyed by the
    block's first vec_id — kilobyte-sized regardless of batch size."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"block_key": pa.array([], pa.int64()),
                             "sums": pa.array([], pa.list_(pa.float64())),
                             "counts": pa.array([], pa.list_(pa.int64())),
                             "inertia": pa.array([], pa.float64())})
        cents = ray.get(cref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = pc.list_flatten(emb).to_numpy() \
            .reshape(batch.num_rows, -1).astype(np.float64)
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=len(cents))
        inertia = d2[np.arange(len(x)), assign].sum()
        return pa.table({
            "block_key": pa.array(
                [int(batch.column("vec_id")[0].as_py())], pa.int64()),
            "sums": pa.array([sums.ravel().tolist()],
                             pa.list_(pa.float64())),
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            "inertia": pa.array([float(inertia)], pa.float64()),
        })
    return partial


def _lloyd_iterations(ds, centroids, iters: int):
    """THE deterministic Lloyd loop — the single implementation behind
    embedding_kmeans, kmeans_silhouette and cluster_purity (the import
    graph enforces the "identical loop" contract those queries claim).

    Centroids broadcast per iteration (``ray.put``); each pass streams
    the full dataset through ``_lloyd_assign_partial``; the KB-sized
    partials merge on the driver in block_key order because float sums
    are order-sensitive at the ulp level — enough to flip boundary
    points between clusters across otherwise-identical runs.  Mutates
    and returns ``centroids``; also returns the last pass's cluster
    counts and total inertia."""
    import numpy as np
    k, dim = centroids.shape
    counts = np.zeros(k, dtype=np.int64)
    inertia = float("nan")
    for _ in range(iters):
        cref = ray.put(centroids)
        partials = []
        for b in ds.map_batches(_lloyd_assign_partial(cref),
                                batch_format="pyarrow").iter_batches(
                                    batch_format="pyarrow"):
            for kb, s, c, i in zip(b.column("block_key").to_pylist(),
                                   b.column("sums").to_pylist(),
                                   b.column("counts").to_pylist(),
                                   b.column("inertia").to_pylist()):
                partials.append((kb, s, c, i))
        partials.sort(key=lambda p: p[0])
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for _kb, s, c, i in partials:
            sums += np.array(s).reshape(k, dim)
            counts += np.array(c, dtype=np.int64)
            inertia += i
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
    return centroids, counts, inertia


def embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 5) -> pa.Table:
    """Distributed k-means over the embedding column (Lloyd's algorithm):
    centroids are broadcast per iteration (``ray.put``), each batch reduces
    to (k x dim sums, k counts) — one small row per block — and the driver
    merges the kilobyte-sized partials.  Deterministic init (vec_id < k).
    Returns per-cluster (cluster, n, inertia) after ``iters`` passes.

    Iterative algorithms don't fit a single Dataset DAG; the loop lives on
    the driver but every pass streams the full dataset through map_batches.
    The pruned (vec_id, embedding) input is materialized ONCE into the
    object store — the standard shape for iterative workloads (it saves
    iters-1 re-reads; blocks spill under pressure, nothing touches the
    driver)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_seed(sf_dir, k)
    if centroids.size == 0:                  # empty embeddings table
        return pa.table({"cluster": pa.array([], pa.int32()),
                         "n": pa.array([], pa.int64()),
                         "inertia_total": pa.array([], pa.float64())})
    _, counts, inertia = _lloyd_iterations(ds, centroids, iters)

    return pa.table({
        "cluster": pa.array(range(k), pa.int32()),
        "n": pa.array(counts.tolist(), pa.int64()),
        "inertia_total": pa.array([float(inertia)] * k, pa.float64()),
    })


def knn_classify(sf_dir: str, k: int = 10,
                 num_queries: int = 64) -> "ray.data.Dataset":
    """Majority-label k-NN classification: each held-out query vector
    (vec_id < ``num_queries`` — bounded by contract, the `ann_topk`
    convention) is assigned the majority label of its ``k`` nearest
    neighbors by cosine among the REMAINING corpus (vec_id >=
    ``num_queries``) — the label-propagation / embedding-quality-eval op
    of a training-data pipeline.

    Scale shape: the query matrix (+ true labels) broadcasts once via
    ``ray.put``; each candidate batch emits only its partial top-k per
    query (vote rows, never vectors), and a final tiny
    ``groupby(query_id)`` reduces partials and takes the vote.
    Tie-breaks are deterministic end-to-end: neighbors by (score desc,
    vec_id asc), votes by (count desc, label asc)."""
    import pyarrow.dataset as pads

    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < num_queries)
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "true_label": pa.array([], pa.int32()),
                      "pred_label": pa.array([], pa.int32()),
                      "n_votes": pa.array([], pa.int64())})
    if qt.num_rows == 0:                     # empty embeddings table
        return ray.data.from_arrow(empty)
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    q_true = np.asarray(qt.column("label").to_pylist(), dtype=np.int32)
    q_mat = _normalize(_matrix_from_lists(qt.column("embedding").to_pylist()))
    q_ref = ray.put((q_ids, q_true, q_mat))

    def partial_votes(batch: pa.Table) -> pa.Table:
        out = pa.table({"query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "nlabel": pa.array([], pa.int32()),
                        "raw_score": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return out
        ids, _, qm = ray.get(q_ref)
        x = _normalize(_embedding_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)
        labels = np.asarray(batch.column("label").to_pylist(),
                            dtype=np.int32)
        sims = x @ qm.T                      # (batch, num_queries)
        kk = min(k, len(vec_ids))
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi in range(len(ids)):
            s = sims[:, qi]
            order = np.lexsort((vec_ids, -s))[:kk]
            out_q.extend([ids[qi]] * len(order))
            out_n.extend(vec_ids[order].tolist())
            out_l.extend(labels[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "nlabel": pa.array(out_l, pa.int32()),
                         "raw_score": pa.array(out_s, pa.float64())})

    true_ref = ray.put(dict(zip(q_ids.tolist(), q_true.tolist())))

    def vote(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        n = np.asarray(group.column("neighbor_id").to_pylist(),
                       dtype=np.int64)
        lab = np.asarray(group.column("nlabel").to_pylist(), dtype=np.int32)
        s = np.asarray(group.column("raw_score").to_pylist(),
                       dtype=np.float64)
        order = np.lexsort((n, -s))[:k]      # global top-k from partials
        winners, counts = np.unique(lab[order], return_counts=True)
        best = np.lexsort((winners, -counts))[0]  # votes desc, label asc
        return pa.table({
            "vec_id": pa.array([qid], pa.int64()),
            "true_label": pa.array([ray.get(true_ref)[qid]], pa.int32()),
            "pred_label": pa.array([int(winners[best])], pa.int32()),
            "n_votes": pa.array([int(counts[best])], pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"],
                               filter=pads.field("vec_id") >= num_queries)
    return (ds.map_batches(partial_votes, batch_format="pyarrow",
                           batch_size=4096)
              .groupby("query_id")
              .map_groups(vote, batch_format="pyarrow"))


def embedding_pca(sf_dir: str, k: int = 4) -> "ray.data.Dataset":
    """Distributed PCA over the embedding column: top-``k`` principal
    components + explained-variance ratios — the dimensionality/collapse
    diagnostic a curation pipeline runs before clustering or semantic
    dedup (embeddings whose variance concentrates in 1-2 directions are
    degenerate).

    Scale shape: the covariance SUFFICIENT STATISTICS (X^T X, sum(X), n)
    are a KB-sized per-batch partial — (dim x dim) doubles — summed in a
    tiny global aggregate; eigendecomposition happens once on the driver
    over the (dim x dim) matrix, never on row data.  One pass, no
    shuffle of row-sized data, driver state O(dim^2).  Sign convention:
    each component is flipped so its largest-|coeff| entry is positive
    (eigenvectors are sign-ambiguous; this pins a deterministic output).
    Rows: (component, dim_index, coeff, explained_var_ratio)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partials(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table({"xtx": pa.array([], pa.list_(pa.float64())),
                             "xsum": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        xtx = mat.T @ mat                       # (dim, dim) — KBs
        return pa.table({
            "xtx": pa.array([xtx.ravel().tolist()],
                            pa.list_(pa.float64())),
            "xsum": pa.array([mat.sum(axis=0).tolist()],
                             pa.list_(pa.float64())),
            "n": pa.array([mat.shape[0]], pa.int64()),
        })

    # bounded driver pull: one (dim^2 + dim + 1)-double row per BLOCK
    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    rows = [r for r in rows if r["n"]]
    if not rows:
        return ray.data.from_arrow(pa.table({
            "component": pa.array([], pa.int64()),
            "dim_index": pa.array([], pa.int64()),
            "coeff": pa.array([], pa.float64()),
            "explained_var_ratio": pa.array([], pa.float64())}))
    n = sum(r["n"] for r in rows)
    dim = int(np.sqrt(len(rows[0]["xtx"])))
    xtx = np.zeros((dim, dim))
    xsum = np.zeros(dim)
    for r in rows:
        xtx += np.asarray(r["xtx"]).reshape(dim, dim)
        xsum += np.asarray(r["xsum"])
    mean = xsum / n
    denom = max(n - 1, 1)
    cov = (xtx - n * np.outer(mean, mean)) / denom
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][:k]
    total_var = float(evals.sum()) or 1.0
    comp_ids, dims, coeffs, ratios = [], [], [], []
    for ci, ei in enumerate(order):
        v = evecs[:, ei]
        if v[np.argmax(np.abs(v))] < 0:      # deterministic sign
            v = -v
        comp_ids.extend([ci] * dim)
        dims.extend(range(dim))
        coeffs.extend(v.tolist())
        ratios.extend([float(evals[ei]) / total_var] * dim)
    return ray.data.from_arrow(pa.table({
        "component": pa.array(comp_ids, pa.int64()),
        "dim_index": pa.array(dims, pa.int64()),
        "coeff": pa.array(coeffs, pa.float64()),
        "explained_var_ratio": pa.array(ratios, pa.float64())}))


def embedding_quantize(sf_dir: str) -> "ray.data.Dataset":
    """Int8 scalar quantization of the embedding column — the vector-
    compression step an ANN-serving pipeline runs before indexing (4x
    smaller vectors, recall within noise for cosine retrieval at typical
    dims).  Per dimension, a global [min, max] range maps values to
    uint8 codes q = round((x - lo)/scale); the per-vector reconstruction
    MSE quantifies the quality loss.

    Scale shape: pass 1 reduces to per-dim (min, max) via KB-sized
    per-batch partials (two dim-length rows per BLOCK — the
    embedding_pca sufficient-statistics pattern; driver state O(dim));
    the ranges broadcast via ``ray.put``; pass 2 is a pure map emitting
    (vec_id, codes, mse).  Codes are serialized as a hex STRING column
    (two chars per dim, dim order) — informationally identical to the
    raw byte layout an index builder would mmap (unhex once at build
    time), and value-hashable by the engine-vs-oracle gate, which
    cannot canonicalize raw binary.  The mse sums exact pico-int
    residual terms, so it is summation-order-free in both engines."""
    from ..functions.num import round6

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def range_partial(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "lo": pa.array([mat.min(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "hi": pa.array([mat.max(axis=0).tolist()],
                           pa.list_(pa.float64()))})

    # bounded driver pull: two dim-length doubles per block
    rows = [r for r in ds.map_batches(range_partial,
                                      batch_format="pyarrow").take_all()
            if len(r["lo"])]
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "codes": pa.array([], pa.string()),
                      "mse": pa.array([], pa.float64())})
    if not rows:
        return ray.data.from_arrow(empty)
    lo = np.min([r["lo"] for r in rows], axis=0)
    hi = np.max([r["hi"] for r in rows], axis=0)
    scale = (hi - lo) / 255.0
    scale[scale == 0] = 1.0          # constant dims quantize to code 0
    ref = ray.put((lo, scale))

    def quantize(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        if mat.size == 0:
            return empty
        qlo, qscale = ray.get(ref)
        codes = np.clip(np.rint((mat - qlo) / qscale), 0, 255) \
            .astype(np.uint8)
        recon = codes.astype(np.float64) * qscale + qlo
        # order-free mse: each squared residual snaps to pico-units
        # (x1e12, rint) and sums as exact int64 — numpy's 8-accumulator
        # axis reduction is otherwise unreproducible in SQL, and the
        # snap costs <1e-12 absolute on a 6dp-reported metric.  Residual
        # headroom: |residual| <= ~6e2 per dim keeps every term under
        # 2^62/dims; beyond that fail loudly.
        term = np.rint((mat - recon) ** 2 * 1e12)
        if term.max(initial=0.0) > float(2 ** 62) / mat.shape[1]:
            raise OverflowError(
                "embedding_quantize: squared residual exceeds the exact "
                "pico-unit budget; rescale the embedding column first")
        msum = term.astype(np.int64).sum(axis=1)
        mse = msum.astype(np.float64) / (mat.shape[1] * 1e12)
        # vectorized hex encoding straight into an Arrow string buffer
        hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
        chars = np.empty((codes.shape[0], codes.shape[1] * 2), np.uint8)
        chars[:, 0::2] = hexd[codes >> 4]
        chars[:, 1::2] = hexd[codes & 15]
        d2 = codes.shape[1] * 2
        offs = pa.array(np.arange(codes.shape[0] + 1,
                                  dtype=np.int32) * d2, pa.int32())
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "codes": pa.StringArray.from_buffers(
                codes.shape[0], offs.buffers()[1],
                pa.py_buffer(chars.tobytes())),
            "mse": round6(pa.array(mse)),
        })

    return ds.map_batches(quantize, batch_format="pyarrow")


def ann_recall_report(sf_dir: str, k: int = 10,
                      num_queries: int = 8) -> "ray.data.Dataset":
    """Self-measuring ANN quality: recall@k of the IVF approximate path
    (``ivf_topk``) against the exact brute-force oracle (``ann_topk``)
    per query — the "measure, don't guess" gauge that tells an operator
    whether the nprobe/nlist trade-off is safe BEFORE deduplicating or
    retrieving with it at scale.  Output (query_id, k, n_hits, recall).

    Both inputs are the existing distributed pipelines; their outputs are
    num_queries x k rows (bounded by construction — the only driver pull
    here), so the comparison is a kilobyte-sized set intersection."""
    import numpy as np

    from ..functions.num import round6

    exact = ann_topk(sf_dir, k=k, num_queries=num_queries).to_pandas()
    approx = ivf_topk(sf_dir, k=k, num_queries=num_queries).to_pandas()
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "k": pa.array([], pa.int64()),
                      "n_hits": pa.array([], pa.int64()),
                      "recall": pa.array([], pa.float64())})
    if len(exact) == 0:
        return ray.data.from_arrow(empty)
    gold = exact.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    got = approx.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    qids = sorted(gold)
    hits = np.array([len(gold[q] & got.get(q, set())) for q in qids],
                    dtype=np.int64)
    kk = np.array([len(gold[q]) for q in qids], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "k": pa.array(kk, pa.int64()),
        "n_hits": pa.array(hits, pa.int64()),
        "recall": round6(pa.array(hits / kk, pa.float64())),
    }))


def embedding_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Per-label embedding outliers by distance to the label centroid —
    the dataset-cartography signal that surfaces mislabeled or
    out-of-distribution vectors before they poison a retrieval index or
    a classifier.  Output one row per vector: (vec_id, label, dist,
    is_outlier) with is_outlier = 1 when the squared distance exceeds
    4x the label's mean squared distance (i.e. dist > 2 x RMS-distance),
    decided by the EXACT integer comparison ``d2 * n > 4 * sum_d2`` so
    both engines flag identically (no float threshold to drift).

    Exact-integer construction: elements snap to micro-units (the
    label_centroids convention), centroids are the per-dim integer mean
    (one float division of exact ints, half-away snap — the twin's
    expression), squared distances are pure int64 sums (headroom
    asserted), and the single double appears in the reported ``dist`` =
    round6(sqrt(d2)/1e6).

    Scale shape: pass 1 reduces to (label, dim-sums, n) KB partials
    (label_centroids shape); pass 2 is a pure map emitting the int-only
    (vec_id, label, d2) table, materialized (16 B/row); the label
    moment rollup and the flag pass read THAT table, never the vector
    stream again.  At 10^12 rows the per-label d2 sums would need a
    hierarchical (int128/sharded) accumulator — the assert fails loudly
    there by design."""
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label", "embedding"])

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(
            pc.is_valid(batch.column("label")),
            pc.is_valid(batch.column("embedding"))))

    empty_partial = pa.table({
        "label": pa.array([], pa.int32()),
        "sums": pa.array([], pa.list_(pa.int64())),
        "n": pa.array([], pa.int64())})

    def cent_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return empty_partial
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb)
        dim = len(flat) // batch.num_rows
        vm = pc.cast(pc.round(
            pc.multiply(pc.cast(flat, pa.float64()), 1_000_000.0),
            ndigits=0, round_mode="half_towards_infinity"),
            pa.int64()).to_numpy().reshape(batch.num_rows, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, codes, vm)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq.astype(np.int32), pa.int32()),
            "sums": pa.array(list(sums), pa.list_(pa.int64())),
            "n": pa.array(counts, pa.int64())})

    parts = pa.concat_tables(
        [empty_partial]
        + list(ds.map_batches(cent_partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")))
    empty_out = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "label": pa.array([], pa.int32()),
        "dist": pa.array([], pa.float64()),
        "is_outlier": pa.array([], pa.int64())})
    if parts.num_rows == 0:
        return ray.data.from_arrow(empty_out)
    # merge the KB partials driver-side (labels x dim ints)
    lab = parts.column("label").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    smat = np.stack(
        [np.asarray(x, dtype=np.int64) for x in
         parts.column("sums").to_pylist()])
    nvec = parts.column("n").to_numpy().astype(np.int64)
    uniq, codes = np.unique(lab, return_inverse=True)
    S = np.zeros((len(uniq), smat.shape[1]), dtype=np.int64)
    np.add.at(S, codes, smat)
    N = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(N, codes, nvec)
    # per-dim integer mean, half-away snap — the twin's expression
    C = np.where(S >= 0, np.floor(S.astype(np.float64) / N[:, None] + 0.5),
                 np.ceil(S.astype(np.float64) / N[:, None] - 0.5)) \
        .astype(np.int64)
    cent_ref = ray.put((uniq, C))

    def d2_map(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int32()),
                             "d2": pa.array([], pa.int64())})
        keys, cm = ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb)
        dim = cm.shape[1]
        vm = pc.cast(pc.round(
            pc.multiply(pc.cast(flat, pa.float64()), 1_000_000.0),
            ndigits=0, round_mode="half_towards_infinity"),
            pa.int64()).to_numpy().reshape(batch.num_rows, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        crows = cm[np.searchsorted(keys, labels)]
        diff = vm - crows
        d2 = np.einsum("ij,ij->i", diff, diff)
        assert d2.max(initial=0) < 2**60, \
            "embedding_outliers: d2 exceeds int64 headroom"
        return pa.table({
            "vec_id": pc.cast(batch.column("vec_id"), pa.int64()),
            "label": batch.column("label"),
            "d2": pa.array(d2, pa.int64())})

    d2_ds = ds.map_batches(d2_map, batch_format="pyarrow").materialize()

    def moment_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"label": batch.column("label"),
                      "sd2": batch.column("d2")})
        g = t.group_by("label").aggregate([("sd2", "sum")])
        return g.rename_columns(["label", "psd2"])

    mom = pa.concat_tables(
        [pa.table({"label": pa.array([], pa.int32()),
                   "psd2": pa.array([], pa.int64())})]
        + list(d2_ds.map_batches(moment_partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")))
    mlab = mom.column("label").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    msum = mom.column("psd2").to_numpy().astype(np.int64)
    SD2 = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(SD2, np.searchsorted(uniq, mlab), msum)
    thr_ref = ray.put((uniq, SD2, N))

    def flag(batch: pa.Table) -> pa.Table:
        keys, sd2, nn = ray.get(thr_ref)
        labels = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = np.searchsorted(keys, labels)
        d2 = batch.column("d2").to_numpy().astype(np.int64)
        # exact integer threshold: d2 * n > 4 * sum_d2
        lhs = d2.astype(object) * nn[idx].astype(object)
        rhs = 4 * sd2[idx].astype(object)
        out = (lhs > rhs).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "label": batch.column("label"),
            "dist": round6(pa.array(
                np.sqrt(d2.astype(np.float64)) / 1e6, pa.float64())),
            "is_outlier": pa.array(out, pa.int64())})

    return d2_ds.map_batches(flag, batch_format="pyarrow")


def contrastive_pairs(sf_dir: str, num_anchors: int = 8
                      ) -> "ray.data.Dataset":
    """Contrastive training-pair mining over the labeled embedding table:
    for each anchor (vec_id < ``num_anchors``) emit its POSITIVE (nearest
    same-label neighbor, self excluded) and its HARD NEGATIVE (nearest
    different-label neighbor) by cosine — the (anchor, positive, hard
    negative) triplet miner behind triplet/InfoNCE fine-tuning (hard
    negatives from the top of the wrong-label ranking are the
    highest-signal examples).  Long output, one row per pair:
    (anchor_id, pair_kind, pair_id, score), scores rounded to 4dp with
    the ann_topk tie-break (score desc, id asc).

    Scale shape: the ann_topk template — anchors (ids, labels, unit
    matrix) broadcast once via ``ray.put``; each batch emits its local
    top-1 per (anchor, kind); the final reduce is a
    (num_anchors x 2)-group top-1.  Anchors or candidates with NULL
    labels drop (the SQL equality/inequality join does the same)."""
    import pyarrow.dataset as pads

    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < num_anchors)
    qt = qt.filter(pc.is_valid(qt.column("label")))
    empty = pa.table({"anchor_id": pa.array([], pa.int64()),
                      "pair_kind": pa.array([], pa.string()),
                      "pair_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if qt.num_rows == 0:
        return ray.data.from_arrow(empty)
    a_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    a_lab = np.asarray(qt.column("label").to_pylist(), dtype=np.int64)
    a_mat = _normalize(_matrix_from_lists(
        qt.column("embedding").to_pylist()))
    ref = ray.put((a_ids, a_lab, a_mat))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("label")))
        if batch.num_rows == 0:
            return empty
        ids, labs, qm = ray.get(ref)
        x = _normalize(_embedding_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)
        v_lab = np.asarray(batch.column("label").to_pylist(),
                           dtype=np.int64)
        sims = x @ qm.T                      # (batch, anchors)
        out_a, out_k, out_p, out_s = [], [], [], []
        for qi in range(len(ids)):
            s = sims[:, qi]
            same = (v_lab == labs[qi]) & (vec_ids != ids[qi])
            diff = v_lab != labs[qi]
            for kind, m in (("positive", same), ("hard_negative", diff)):
                if not m.any():
                    continue
                cand = np.flatnonzero(m)
                best = cand[np.lexsort((vec_ids[cand], -s[cand]))[0]]
                out_a.append(ids[qi])
                out_k.append(kind)
                out_p.append(int(vec_ids[best]))
                out_s.append(float(s[best]))
        return pa.table({"anchor_id": pa.array(out_a, pa.int64()),
                         "pair_kind": pa.array(out_k, pa.string()),
                         "pair_id": pa.array(out_p, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    def final(group: pa.Table) -> pa.Table:
        n = np.asarray(group.column("pair_id").to_pylist(),
                       dtype=np.int64)
        s = np.asarray(group.column("score").to_pylist(),
                       dtype=np.float64)
        best = np.lexsort((n, -s))[0]
        return pa.table({
            "anchor_id": group.column("anchor_id").slice(best, 1),
            "pair_kind": group.column("pair_kind").slice(best, 1),
            "pair_id": pa.array([n[best]], pa.int64()),
            "score": pa.array([float(np.round(s[best], 4))],
                              pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096)
              .groupby(["anchor_id", "pair_kind"])
              .map_groups(final, batch_format="pyarrow"))


def embedding_dim_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-DIMENSION profile of the embedding column (n, mean, population
    variance, min, max) — the feature-health report that catches dead
    dimensions, scale drift between encoder versions, and saturated
    components before vectors hit an index.

    Exact-integer construction: every component snaps once to micro-units
    (round6 micro convention, half-away); per-dim sums accumulate EXACTLY
    at any corpus size via limb-split partials — the per-batch sum of
    squares is computed as a Python bigint (squares decomposed a,b-wise
    so no int64 product ever wraps) and shipped as three base-2^40 int64
    limb columns whose tree-sums reconstruct the exact 128-bit total in
    the finish (a naive int64 sumsq wraps silently at ~10^7 rows of
    unit-scale embeddings; the fuzz suite's huge-magnitude vector caught
    exactly that).  Components beyond |v| ~ 8.8e6 (2^43 micro) raise
    OverflowError loudly, mirroring the user_value_twap convention.  The
    only doubles are the final division chains — mean = S/(n*1e6),
    var = (n*SS - S^2)/n/n/1e12 (Python bigints here, HUGEINT in the
    twin) — round6.

    Scale shape: pure map over the vector stream (the flat list values
    buffer is touched once, zero-copy, with vectorized position algebra
    that tolerates ragged lists), then ONE #dims-sized shuffle; the
    finish loop is dims-bounded on the driver-side map."""
    from ray.data.aggregate import Max, Min, Sum
    from ..functions.num import round6

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    _L = 1 << 40                     # limb base for the partial sums

    empty = pa.table({
        "dim": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "s1l0": pa.array([], pa.int64()),
        "s1l1": pa.array([], pa.int64()),
        "q0": pa.array([], pa.int64()),
        "q1": pa.array([], pa.int64()),
        "q2": pa.array([], pa.int64()),
        "mn": pa.array([], pa.int64()),
        "mx": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) == 0:
            return empty
        flat = col.flatten()
        micro = pc.cast(pc.round(pc.multiply(pc.cast(flat, pa.float64()),
                                             1e6),
                                 ndigits=0,
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        if len(col) > 1 << 18:       # keeps every limb sum below int64
            raise OverflowError(
                "embedding_dim_stats: batch too large for the exact "
                "limb accumulator — lower batch_size")
        am = np.abs(micro)
        if am.max(initial=0) > 1 << 43:
            raise OverflowError(
                "embedding_dim_stats: |component| > ~8.8e6 exceeds the "
                "exact-integer budget (2^43 micro-units); rescale the "
                "embedding column first")
        # per-value dim index from the list offsets (ragged-safe)
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        starts = np.repeat(np.r_[0, np.cumsum(lens)[:-1]], lens)
        dim = np.arange(len(micro), dtype=np.int64) - starts
        nd = int(dim.max()) + 1
        # exact sum of squares with NO int64 wrap: m^2 = a^2*2^44
        # + 2ab*2^23/2 ... split m = a*2^22 + b, accumulate the three
        # int64-safe terms per dim, recombine as Python bigints
        a, b = am >> 22, am & ((1 << 22) - 1)
        acc = np.zeros((5, nd), np.int64)    # cnt, s1, t2, t1, t0
        np.add.at(acc[0], dim, 1)
        np.add.at(acc[1], dim, micro)
        np.add.at(acc[2], dim, a * a)
        np.add.at(acc[3], dim, a * b)
        np.add.at(acc[4], dim, b * b)
        mn = np.full(nd, np.iinfo(np.int64).max, np.int64)
        mx = np.full(nd, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, dim, micro)
        np.maximum.at(mx, dim, micro)
        s2b = [(int(t2) << 44) + (int(t1) << 23) + int(t0)
               for t2, t1, t0 in zip(acc[2], acc[3], acc[4])]
        return pa.table({
            "dim": pa.array(np.arange(nd, dtype=np.int64)),
            "n": pa.array(acc[0]),
            "s1l0": pa.array([int(s) % _L for s in acc[1]], pa.int64()),
            "s1l1": pa.array([int(s) // _L for s in acc[1]], pa.int64()),
            "q0": pa.array([s % _L for s in s2b], pa.int64()),
            "q1": pa.array([(s >> 40) % _L for s in s2b], pa.int64()),
            "q2": pa.array([s >> 80 for s in s2b], pa.int64()),
            "mn": pa.array(mn),
            "mx": pa.array(mx),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("dim")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s1l0", alias_name="s1l0"),
                      Sum("s1l1", alias_name="s1l1"),
                      Sum("q0", alias_name="q0"),
                      Sum("q1", alias_name="q1"),
                      Sum("q2", alias_name="q2"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx")))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.int64)
        # exact 128-bit reconstructions from the limb tree-sums
        s1 = [int(l0) + _L * int(l1)
              for l0, l1 in zip(batch.column("s1l0").to_numpy(),
                                batch.column("s1l1").to_numpy())]
        s2 = [int(a0) + (int(a1) << 40) + (int(a2) << 80)
              for a0, a1, a2 in zip(batch.column("q0").to_numpy(),
                                    batch.column("q1").to_numpy(),
                                    batch.column("q2").to_numpy())]
        mean = np.array([float(s) / (int(c) * 1e6)
                         for s, c in zip(s1, n)])
        # n*SS - S^2 exceeds int64 — exact Python bigints (dims-bounded)
        var = np.array([float(int(c) * int(ss) - int(s) * int(s))
                        / int(c) / int(c) / 1e12
                        for c, ss, s in zip(n, s2, s1)])
        return pa.table({
            "dim": batch.column("dim"),
            "n": batch.column("n"),
            "mean_v": round6(pa.array(mean)),
            "var_v": round6(pa.array(var)),
            "min_v": round6(pc.divide(
                pc.cast(batch.column("mn"), pa.float64()), 1e6)),
            "max_v": round6(pc.divide(
                pc.cast(batch.column("mx"), pa.float64()), 1e6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def kmeans_silhouette(sf_dir: str, k: int = 8,
                      iters: int = 5) -> "ray.data.Dataset":
    """Cluster-quality evaluation for the k-means path: the simplified
    (centroid-based) silhouette — per point, a = distance to its own
    centroid, b = distance to the nearest OTHER centroid, s = (b-a) /
    max(a,b) — rolled up per cluster as (n, mean silhouette).  The
    medoid-free variant is the standard large-scale silhouette (pairwise
    distances are quadratic; centroid distances stream), and the number
    every embedding-clustering report needs next to inertia.

    Runs the SAME deterministic Lloyd loop as ``embedding_kmeans``
    (identical init, identical block-key-ordered partial merge), then ONE
    extra scoring pass.  Per-point scores snap to 6dp micro-ints before
    the per-cluster integer sum, so the rollup is order-independent and
    the result deterministic end-to-end.

    Non-SQL (iterative); correctness is pinned by planted-cluster
    tolerance tests and the determinism of the shared loop."""
    from ..functions.num import round6

    empty = pa.table({"cluster": pa.array([], pa.int32()),
                      "n": pa.array([], pa.int64()),
                      "mean_silhouette": pa.array([], pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_seed(sf_dir, k)
    if centroids.size == 0:
        return ray.data.from_arrow(empty)
    centroids, _, _ = _lloyd_iterations(ds, centroids, iters)

    # --- scoring pass: micro-int silhouette partials per cluster ---
    final_ref = ray.put(centroids)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cluster": pa.array([], pa.int32()),
                             "s_micro": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        cents = ray.get(final_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = pc.list_flatten(emb).to_numpy() \
            .reshape(batch.num_rows, -1).astype(np.float64)
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")
        own = order[:, 0]
        a = np.sqrt(d2[np.arange(len(x)), own])
        bdist = np.sqrt(d2[np.arange(len(x)), order[:, 1]]) \
            if d2.shape[1] > 1 else np.full(len(x), np.nan)
        denom = np.maximum(a, bdist)
        s = np.where(denom > 0, (bdist - a) / np.where(denom > 0, denom, 1),
                     0.0)                       # coincident point: s = 0
        s_micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        t = pa.table({"cluster": pa.array(own.astype(np.int32), pa.int32()),
                      "s_micro": pa.array(s_micro, pa.int64())})
        g = t.group_by("cluster").aggregate(
            [("s_micro", "sum"), ([], "count_all")])
        return g.rename_columns(["cluster", "s_micro", "n_p"])

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(score, batch_format="pyarrow")
           .groupby("cluster")
           .aggregate(Sum("s_micro", alias_name="s_sum"),
                      Sum("n_p", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        s = batch.column("s_sum").to_numpy().astype(np.float64)
        return pa.table({
            "cluster": batch.column("cluster").cast(pa.int32()),
            "n": batch.column("n").cast(pa.int64()),
            "mean_silhouette": round6(pa.array(
                np.where(n > 0, s / (1e6 * np.maximum(n, 1)), np.nan),
                pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
              .map_batches(lambda b: b if b.num_rows else empty,
                           batch_format="pyarrow")


def cluster_purity(sf_dir: str, k: int = 8,
                   iters: int = 5) -> "ray.data.Dataset":
    """External cluster validation: after the deterministic Lloyd loop,
    each cluster's PURITY (majority-label share) against the embedding
    table's ``label`` column — the supervised complement to
    ``kmeans_silhouette`` (internal geometry) that tells you whether the
    unsupervised clusters recover the known classes.

    Scale shape: the Lloyd loop is the embedding_kmeans shape (broadcast
    centroids, KB partials); the validation pass reduces batches to
    (cluster, label, count) partials over the bounded k x #labels
    domain; the purity closed form runs on that bounded table.  Ties on
    the majority label break toward the smaller label id
    (deterministic).  Non-SQL (iterative); pinned by planted-label
    tests."""
    from ..functions.num import round6

    empty = pa.table({"cluster": pa.array([], pa.int32()),
                      "n": pa.array([], pa.int64()),
                      "majority_label": pa.array([], pa.int32()),
                      "purity": pa.array([], pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding",
                                        "label"]).materialize()
    centroids = _kmeans_seed(sf_dir, k)
    if centroids.size == 0:
        return ray.data.from_arrow(empty)
    centroids, _, _ = _lloyd_iterations(ds, centroids, iters)

    final_ref = ray.put(centroids)

    def label_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cluster": pa.array([], pa.int32()),
                             "label": pa.array([], pa.int32()),
                             "n_p": pa.array([], pa.int64())})
        cents = ray.get(final_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = pc.list_flatten(emb).to_numpy() \
            .reshape(batch.num_rows, -1).astype(np.float64)
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1).astype(np.int32)
        t = pa.table({"cluster": pa.array(assign, pa.int32()),
                      "label": batch.column("label").cast(pa.int32())})
        g = t.group_by(["cluster", "label"]).aggregate([([], "count_all")])
        return g.rename_columns(["cluster", "label", "n_p"])

    from ray.data.aggregate import Sum
    rows = (ds.map_batches(label_counts, batch_format="pyarrow")
            .groupby(["cluster", "label"])
            .aggregate(Sum("n_p", alias_name="n"))
            .take_all())              # bounded: k x #labels cells
    if not rows:
        return ray.data.from_arrow(empty)
    from collections import defaultdict
    per = defaultdict(dict)
    for r in rows:
        per[int(r["cluster"])][int(r["label"])] = int(r["n"])
    out_c, out_n, out_m, out_p = [], [], [], []
    for c in sorted(per):
        lab = per[c]
        n = sum(lab.values())
        # majority: max count, ties toward the smaller label id
        m = sorted(lab.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out_c.append(c); out_n.append(n)
        out_m.append(m[0]); out_p.append(m[1] / n)
    return ray.data.from_arrow(pa.table({
        "cluster": pa.array(out_c, pa.int32()),
        "n": pa.array(out_n, pa.int64()),
        "majority_label": pa.array(out_m, pa.int32()),
        "purity": round6(pa.array(out_p, pa.float64())),
    }))


def embedding_intrinsic_dim(sf_dir: str,
                            n_sample: int = 512) -> "ray.data.Dataset":
    """TWO-NN intrinsic-dimension estimate of the embedding manifold
    (Facco et al. 2017, "Estimating the intrinsic dimension of datasets
    by a minimal neighborhood information"): for each sampled point, the
    ratio mu = r2/r1 of its two nearest EUCLIDEAN neighbors follows
    P(mu) = d * mu^(-d-1); the MLE is d_hat = n / sum(ln mu).  The
    diagnostic that says whether a 128-dim embedding really spans 128
    dims or collapsed onto a low-dim cone (a training failure ANN-recall
    numbers alone don't explain).

    Scale shape: the sample (vec_id < ``n_sample``, the ann_topk bounded
    contract) broadcasts once via ``ray.put``; every corpus batch emits
    its LOCAL two best distances per query (2 rows/query/batch — never
    vectors); a #sample-sized groupby merge keeps the global two, and
    the MLE closed form runs on the bounded ratio table.  Points with
    r1 = 0 (exact duplicates) drop, per the paper.  Non-SQL (argmin
    chains); pinned by a planted-dimension tolerance test."""
    import pyarrow.dataset as pads

    from ..functions.num import round6_scalar

    empty = pa.table({"n_used": pa.array([], pa.int64()),
                      "n_dropped_dup": pa.array([], pa.int64()),
                      "intrinsic_dim": pa.array([], pa.float64()),
                      "ambient_dim": pa.array([], pa.int64())})
    qt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n_sample)
    if qt.num_rows == 0:
        return ray.data.from_arrow(empty)
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    q_mat = _matrix_from_lists(qt.column("embedding").to_pylist())
    ambient = q_mat.shape[1]
    q_ref = ray.put((q_ids, q_mat))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def partial_two_nn(batch: pa.Table) -> pa.Table:
        out_empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "dist": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return out_empty
        ids, qm = ray.get(q_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = pc.list_flatten(emb).to_numpy() \
            .reshape(batch.num_rows, -1).astype(np.float64)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        # squared euclidean (monotone in distance; ratios take a sqrt at
        # the end): ||q||^2 - 2 q.x + ||x||^2
        d2 = (qm * qm).sum(1)[:, None] - 2.0 * (qm @ x.T) \
            + (x * x).sum(1)[None, :]
        d2[np.maximum(d2, 0) != d2] = 0.0          # clamp fp negatives
        d2[np.equal.outer(ids, bids)] = np.inf     # exclude self
        k = min(2, d2.shape[1])
        part = np.partition(d2, k - 1, axis=1)[:, :k]
        rows = np.repeat(ids, k)
        return pa.table({"query_id": pa.array(rows, pa.int64()),
                         "dist": pa.array(part.ravel(), pa.float64())})

    def merge(group: pa.Table) -> pa.Table:
        d = np.sort(group.column("dist").to_numpy())
        d = d[np.isfinite(d)]
        if len(d) < 2:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "r1": pa.array([], pa.float64()),
                             "r2": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(
                [group.column("query_id")[0].as_py()], pa.int64()),
            "r1": pa.array([float(np.sqrt(d[0]))], pa.float64()),
            "r2": pa.array([float(np.sqrt(d[1]))], pa.float64()),
        })

    rows = (ds.map_batches(partial_two_nn, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(merge, batch_format="pyarrow")
            .take_all())               # bounded: <= n_sample ratio rows
    if not rows:
        return ray.data.from_arrow(empty)
    r1 = np.array([r["r1"] for r in rows])
    r2 = np.array([r["r2"] for r in rows])
    ok = r1 > 0
    n_used = int(ok.sum())
    if n_used == 0:
        return ray.data.from_arrow(pa.table({
            "n_used": pa.array([0], pa.int64()),
            "n_dropped_dup": pa.array([len(rows)], pa.int64()),
            "intrinsic_dim": pa.array([float("nan")], pa.float64()),
            "ambient_dim": pa.array([ambient], pa.int64())}))
    lnmu = np.log(r2[ok] / r1[ok])
    d_hat = n_used / float(lnmu.sum()) if lnmu.sum() > 0 else float("nan")
    return ray.data.from_arrow(pa.table({
        "n_used": pa.array([n_used], pa.int64()),
        "n_dropped_dup": pa.array([len(rows) - n_used], pa.int64()),
        "intrinsic_dim": pa.array(
            [round6_scalar(d_hat) if np.isfinite(d_hat) else float("nan")],
            pa.float64()),
        "ambient_dim": pa.array([ambient], pa.int64()),
    }))
