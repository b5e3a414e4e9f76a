"""Correctness of dedup and similarity operators on corpora with PLANTED
structure (the testdata documents are near-dup-free, so queries() on them is
exercised separately by the oracle tests)."""

import os
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extract_kit_ray.pipelines import dedup, similarity

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _make_docs_table(tmpdir: str, with_dups: bool = True) -> str:
    rng = random.Random(5)
    rows = []
    for i in range(80):
        text = " ".join(rng.choice(WORDS) for _ in range(60))
        rows.append({"doc_id": i, "text": text})
    if with_dups:
        # exact dup
        rows.append({"doc_id": 100, "text": rows[0]["text"]})
        # near dup: change 3 of 60 words
        toks = rows[1]["text"].split()
        for j in (5, 20, 40):
            toks[j] = "CHANGED%d" % j
        rows.append({"doc_id": 101, "text": " ".join(toks)})
        # whitespace-variant dup (same fingerprint after normalization)
        rows.append({"doc_id": 102, "text": "  " + rows[2]["text"].replace(" ", "  ")})
    os.makedirs(tmpdir, exist_ok=True)
    path = os.path.join(tmpdir, "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return tmpdir


def test_exact_dedup_finds_planted(ray_session, tmp_path):
    sf_dir = _make_docs_table(str(tmp_path))
    res = dedup.exact_dedup(sf_dir).to_pandas()
    dups = res[res["n"] > 1]
    # doc 100 == doc 0 exactly; doc 102 == doc 2 modulo whitespace
    assert set(dups["keep_id"]) == {0, 2}
    assert (dups["n"] == 2).all()


def test_curated_docs_filters_and_dedups(ray_session, tmp_path):
    """The quality filter must actually fire (planted digit-only docs score
    0.4*tokens_norm <= 0.4 < 0.5) and dedup keeps the min doc_id among the
    quality-passing survivors only."""
    rows = [
        {"doc_id": 0, "text": "good alpha text with many proper words here"},
        {"doc_id": 1, "text": "good alpha text with many proper words here"},
        {"doc_id": 2, "text": "12345 67890 11111 22222 33333 44444"},   # low q
        {"doc_id": 3, "text": "another perfectly fine alpha document body"},
        {"doc_id": 4, "text": "999 888 777"},                           # low q
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = dedup.curated_docs(str(tmp_path)).to_pandas()
    kept = set(res["doc_id"])
    assert kept == {0, 3}          # 1 deduped away; 2 and 4 quality-dropped
    assert (res["quality"] >= 0.5).all()
    # DuckDB twin agrees on this adversarial corpus
    import duckdb
    import __ray_entry__ as em
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(em.oracle_sql()["curated_docs"]).df()
    assert sorted(o["doc_id"]) == sorted(res["doc_id"])
    a = res.sort_values("doc_id").reset_index(drop=True)
    b = o.sort_values("doc_id").reset_index(drop=True)
    assert (a["quality"].values == b["quality"].values).all()


def test_minhash_dedup_finds_near_dup(ray_session, tmp_path):
    sf_dir = _make_docs_table(str(tmp_path))
    res = dedup.minhash_dedup(sf_dir, threshold=0.5).to_pandas()
    pairs = set(zip(res["keep_id"], res["dup_id"]))
    assert (1, 101) in pairs          # planted near dup
    assert (0, 100) in pairs          # exact dup is trivially near
    # verified jaccard is real (not just bucket collision)
    assert (res["jaccard"] >= 0.5).all()


def test_minhash_dedup_distributed_10x_corpus(ray_session, tmp_path):
    """10x corpus with planted near-dups across blocks — exercises the
    distributed verification path (membership-union semi-join; no take_all
    anywhere in dedup.py)."""
    rng = random.Random(11)
    rows = []
    for i in range(800):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(WORDS) for _ in range(60))})
    planted = set()
    for base in (3, 150, 400, 777):
        toks = rows[base]["text"].split()
        toks[7] = "EDITED"
        rows.append({"doc_id": 1000 + base, "text": " ".join(toks)})
        planted.add((base, 1000 + base))
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = dedup.minhash_dedup(str(tmp_path), threshold=0.5).to_pandas()
    pairs = set(zip(res["keep_id"], res["dup_id"]))
    assert planted <= pairs
    assert (res["jaccard"] >= 0.5).all()
    # guard: the verification path must stay distributed
    import inspect
    src = inspect.getsource(dedup)
    assert "take_all" not in src


def test_minhash_no_false_pairs_without_dups(ray_session, tmp_path):
    sf_dir = _make_docs_table(str(tmp_path / "nodup"), with_dups=False)
    res = dedup.minhash_dedup(sf_dir, threshold=0.5).to_pandas()
    assert len(res) == 0


def test_simhash_dedup_finds_near_dup(ray_session, tmp_path):
    sf_dir = _make_docs_table(str(tmp_path))
    res = dedup.simhash_dedup(sf_dir, max_hamming=3).to_pandas()
    pairs = set(zip(res["keep_id"], res["dup_id"]))
    assert (0, 100) in pairs          # identical text -> hamming 0
    zero = res[(res["keep_id"] == 0) & (res["dup_id"] == 100)]
    assert (zero["hamming"] == 0).all()


def test_hamming_pairs_vectorized_matches_bruteforce():
    rng = np.random.RandomState(3)
    sigs = rng.randint(0, 1 << 63, size=300, dtype=np.uint64)
    sigs[37] = sigs[5] ^ np.uint64(0b101)          # planted hamming-2 pair
    ids = np.arange(300, dtype=np.int64)
    k, d, h = dedup._hamming_pairs_vectorized(ids, sigs, 3, tile=64)
    got = {(int(a), int(b), int(x)) for a, b, x in zip(k, d, h)}
    expect = set()
    for i in range(300):
        for j in range(i + 1, 300):
            dist = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
            if dist <= 3:
                expect.add((i, j, dist))
    assert got == expect and (5, 37, 2) in got


def test_simhash_oversized_bucket_subbanding():
    """A bucket past the cap takes the prefix-extended sub-banding path and
    still finds every planted pair without going all-pairs quadratic."""
    import time
    rng = np.random.RandomState(4)
    n = 5000
    assert n > dedup._SIMHASH_BUCKET_CAP
    # all sigs share band 0 (low 16 bits) but vary the remaining 48 bits
    base = np.uint64(0xBEEF)
    sigs = (rng.randint(0, 1 << 48, size=n, dtype=np.uint64)
            << np.uint64(16)) | base
    planted = [(11, 2300, 0), (40, 4900, 3)]
    sigs[2300] = sigs[11]
    sigs[4900] = sigs[40] ^ (np.uint64(1) << np.uint64(20)) \
        ^ (np.uint64(1) << np.uint64(33)) ^ (np.uint64(1) << np.uint64(60))
    ids = np.arange(n, dtype=np.int64)
    t0 = time.time()
    k, d, h = dedup._simhash_bucket_pairs(ids, sigs, 0, 3)
    elapsed = time.time() - t0
    got = {(int(a), int(b), int(x)) for a, b, x in zip(k, d, h)}
    for pair in planted:
        assert pair in got
    assert elapsed < 5.0      # sub-banding, not 12.5M-pair all-pairs Python


def test_jaccard_function():
    assert dedup.jaccard("a b c d", "a b c d") == 1.0
    assert dedup.jaccard("a b c d", "x y z w") == 0.0
    assert dedup.jaccard("", "") == 1.0


def _make_embeddings(tmpdir: str, n: int = 200, dim: int = 16) -> str:
    rng = np.random.RandomState(9)
    mat = rng.randn(n, dim).astype(np.float32)
    mat[50] = mat[3] + 0.01 * rng.randn(dim).astype(np.float32)  # planted neighbor
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }), os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


def test_ann_topk_exact_vs_numpy(ray_session, tmp_path):
    sf_dir = _make_embeddings(str(tmp_path))
    res = similarity.ann_topk(sf_dir, k=5, num_queries=4).to_pandas()
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    mat = np.asarray([list(v) for v in t.column("embedding").to_pylist()],
                     dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in range(4):
        sims = mat @ mat[qid]
        expect = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = res[res["query_id"] == qid].sort_values(
            ["score", "neighbor_id"], ascending=[False, True])
        assert got["neighbor_id"].tolist() == expect.tolist()


def test_ann_finds_planted_neighbor(ray_session, tmp_path):
    sf_dir = _make_embeddings(str(tmp_path))
    res = similarity.ann_topk(sf_dir, k=2, num_queries=4).to_pandas()
    q3 = res[res["query_id"] == 3].sort_values("score", ascending=False)
    assert q3["neighbor_id"].tolist()[:2] == [3, 50]


def test_ivf_recall_on_planted(ray_session, tmp_path):
    sf_dir = _make_embeddings(str(tmp_path))
    res = similarity.ivf_topk(sf_dir, k=2, num_queries=4, nlist=8,
                              nprobe=4).to_pandas()
    q3 = res[res["query_id"] == 3].sort_values("score", ascending=False)
    # a near-identical vector lands in the same/adjacent cell -> recalled
    assert 50 in q3["neighbor_id"].tolist()


def test_ivfpq_recall_vs_exact(ray_session, tmp_path):
    """IVF-PQ (coarse cells + int8 residual codes) must agree with exact
    brute-force top-k within tolerance: the residual-quantization error is
    small (codes span the residual range at 1/255 resolution) so at full
    probe coverage recall should be near-perfect, and planted near-dups
    must always be recalled."""
    sf_dir = _make_embeddings(str(tmp_path))
    k = 5
    exact = similarity.ann_topk(sf_dir, k=k, num_queries=4).to_pandas()
    apx = similarity.ivfpq_topk(sf_dir, k=k, num_queries=4, nlist=8,
                                nprobe=8).to_pandas()
    e = {(int(q), int(n)) for q, n in zip(exact.query_id, exact.neighbor_id)}
    a = {(int(q), int(n)) for q, n in zip(apx.query_id, apx.neighbor_id)}
    assert len(e & a) / len(e) >= 0.9        # full-probe: only PQ error left
    # planted neighbor (50 ~ 3) must survive compression
    q3 = apx[apx["query_id"] == 3].sort_values("score", ascending=False)
    assert 50 in q3["neighbor_id"].tolist()[:2]
    # reconstructed scores stay close to true cosines
    merged = exact.merge(apx, on=["query_id", "neighbor_id"],
                         suffixes=("_e", "_a"))
    assert (merged["score_e"] - merged["score_a"]).abs().max() < 0.05


def test_ivfpq_pruning_drops_unprobed_cells(ray_session, tmp_path):
    """With nprobe=1 the scan must only surface same-cell rows — evidence
    the codes table's cell column actually prunes."""
    sf_dir = _make_embeddings(str(tmp_path))
    res = similarity.ivfpq_topk(sf_dir, k=200, num_queries=2, nlist=8,
                                nprobe=1).to_pandas()
    full = similarity.ivfpq_topk(sf_dir, k=200, num_queries=2, nlist=8,
                                 nprobe=8).to_pandas()
    n1 = res.groupby("query_id").size()
    n8 = full.groupby("query_id").size()
    assert (n1 <= n8).all() and (n1 < 200).all()   # pruned strictly below n


def test_winnow_fingerprints_substring_guarantee():
    import numpy as np
    from pdf_extract_kit_ray.pipelines.dedup import winnow_fingerprints
    base = "the quick brown fox jumps over the lazy dog and keeps running"
    a = winnow_fingerprints(base * 3)
    b = winnow_fingerprints("PREFIX xyz " + base * 3 + " SUFFIX qq")
    c = winnow_fingerprints("totally unrelated words everywhere zebra quartz")
    # shared long substring => shared fingerprints; disjoint text => none
    assert len(np.intersect1d(a, b)) >= len(a) // 2
    assert len(np.intersect1d(a, c)) == 0
    assert winnow_fingerprints("") .size == 0
    assert (winnow_fingerprints(base) == winnow_fingerprints(base)).all()


def test_winnow_neardup_finds_planted_pair(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.dedup import winnow_neardup
    body = "ray data streaming executor moves arrow blocks with backpressure "
    docs = [
        {"doc_id": 0, "text": body * 8},
        {"doc_id": 1, "text": body * 8 + " trailing edit"},      # near-dup of 0
        {"doc_id": 2, "text": "unrelated words " * 40},
        {"doc_id": 3, "text": "other disjoint content " * 40},
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    pairs = winnow_neardup(str(tmp_path), min_shared=10).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got                      # the planted near-dup
    assert not any(2 in p or 3 in p for p in got)   # disjoint docs stay out


def test_simhash_rejects_large_radius():
    import pytest

    from pdf_extract_kit_ray.pipelines.dedup import simhash_dedup
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_dedup("/root/testdata/sf0.001", max_hamming=4)


def test_fingerprint_batch_null_text():
    """Null docs fingerprint to NULL, never md5('') — they must not merge
    with genuinely-empty docs in a dedup group."""
    import pyarrow as pa

    from pdf_extract_kit_ray.pipelines.text import fingerprint_batch
    batch = pa.table({"text": pa.array(["a b", None, "", "a  b"], pa.string())})
    fp = fingerprint_batch(batch)
    assert fp[1].as_py() is None
    assert fp[0].as_py() == fp[3].as_py()        # whitespace-collapsed equal
    assert fp[2].as_py() is not None and fp[2].as_py() != fp[1].as_py()


def _uf_clusters(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return sorted((d, min(ms), len(ms)) for ms in comp.values() for d in ms)


def _cc_of(edges, **kw):
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([a for a, _ in edges], pa.int64()),
        "b": pa.array([b for _, b in edges], pa.int64())}))
    got = dedup.connected_components(ds, **kw).take_all()
    return sorted((r["doc_id"], r["cluster_id"], r["cluster_size"])
                  for r in got)


def test_connected_components_multihop():
    """Transitivity: a 12-node path (worst-case diameter), a star, a clique,
    and an isolated pair — labels must equal union-find's."""
    path = [(i, i + 1) for i in range(11)]
    star = [(100, x) for x in (101, 102, 103, 104)]
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    pair = [(300, 301)]
    edges = path + star + clique + pair
    assert _cc_of(edges) == _uf_clusters(edges)


def test_connected_components_bridged_and_duplicate_edges():
    """Two clusters merged by one bridge edge, duplicate + reversed edges
    in the input (LSH pair lists emit both), high node ids."""
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (10, 11), (11, 12),
             (3, 10),                        # bridge
             (10**9, 10**9 + 7), (10**9 + 7, 10**9)]
    assert _cc_of(edges) == _uf_clusters(edges)


def test_connected_components_empty():
    ds = ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    assert dedup.connected_components(ds).take_all() == []


def test_dup_clusters_planted(ray_session, tmp_path):
    """dup_clusters over a planted corpus: exact dup (doc 100 = doc 0),
    whitespace-variant (102 = 2), near dup (101 ~ 1) — each must land in
    the right cluster with its source doc as the representative."""
    sf_dir = _make_docs_table(str(tmp_path))
    res = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in dedup.dup_clusters(sf_dir, max_doc=200).take_all()}
    assert res[100] == (0, 2) and res[0] == (0, 2)
    assert res[102] == (2, 2) and res[2] == (2, 2)
    assert res[101][0] == 1 and res[1][0] == 1


def test_contamination_check_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.dedup import contamination_check
    bench_gram = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = [
        # doc 0: bench member (0 & 7 == 0) holding the distinctive 8-gram
        {"doc_id": 0, "text": f"intro {bench_gram} outro"},
        # doc 3: contaminated, contains the gram TWICE (occurrence count)
        {"doc_id": 3, "text": f"x {bench_gram} y {bench_gram} z"},
        # doc 5: clean
        {"doc_id": 5, "text": "totally disjoint filler words " * 10},
        # doc 8: another bench member (8 & 7 == 0) — never reported
        {"doc_id": 8, "text": f"pre {bench_gram} post"},
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    out = contamination_check(str(tmp_path)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {3: 2}


def test_contamination_check_case_insensitive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.dedup import contamination_check
    gram = "one two three four five six seven eight"
    docs = [
        {"doc_id": 0, "text": gram.upper()},
        {"doc_id": 1, "text": f"lead {gram} tail"},
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    out = contamination_check(str(tmp_path)).to_pandas()
    assert dict(zip(out["doc_id"], out["n_hits"])) == {1: 1}


def test_semantic_dedup_planted_and_bruteforce(ray_session, tmp_path):
    """Planted near-identical vectors are flagged (the later vec_id of each
    pair), and the full flag set equals a brute-force recomputation under
    the operator's OWN cluster assignment — pinning the keep-first-id
    within-cluster semantics exactly."""
    sf_dir = _make_embeddings(str(tmp_path))   # vec 50 ~ vec 3 planted
    res = similarity.semantic_dedup(sf_dir, threshold=0.99,
                                    nlist=8).to_pandas()
    assert len(res) == 200
    flags = dict(zip(res["vec_id"], res["is_dup"]))
    assert flags[50] and not flags[3]          # later id pruned, first kept

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    mat = np.asarray([list(v) for v in t.column("embedding").to_pylist()],
                     dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cluster = dict(zip(res["vec_id"], res["cluster"]))
    for _, row in res.iterrows():
        vid, c = int(row["vec_id"]), row["cluster"]
        earlier = [i for i in range(vid) if cluster[i] == c]
        expect = bool(earlier) and \
            float((mat[earlier] @ mat[vid]).max()) >= 0.99
        assert bool(row["is_dup"]) == expect, vid
        if earlier:
            assert abs(row["max_prior_sim"]
                       - round(float((mat[earlier] @ mat[vid]).max()), 6)) \
                < 1e-9
        else:
            assert row["max_prior_sim"] == -1.0


def test_semantic_dedup_tiled_matches_untiled(ray_session, tmp_path):
    """A tile smaller than any cluster exercises the tiled scan path; the
    result must be identical to the one-shot (huge-tile) scan."""
    sf_dir = _make_embeddings(str(tmp_path), n=120)
    a = similarity.semantic_dedup(sf_dir, threshold=0.9, nlist=4,
                                  tile=7).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = similarity.semantic_dedup(sf_dir, threshold=0.9, nlist=4,
                                  tile=10_000).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_dup_spans_planted_extents(ray_session, tmp_path):
    """Two docs share a 12-token run and a separate 8-token run; a third
    doc is clean.  dup_spans must emit exactly the maximal extents (merged
    overlapping 8-grams), nothing for the clean doc."""
    shared_a = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"        # 12 tokens
    shared_b = "u0 u1 u2 u3 u4 u5 u6 u7"                      # 8 tokens
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"{shared_a} filler1 filler2 {shared_b}",
            f"lead1 lead2 {shared_a} mid1 mid2 mid3 {shared_b} tail1",
            "clean words only here nothing shared at all nine ten",
        ], pa.string()),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    res = dedup.dup_spans(str(tmp_path)).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    got = list(res.itertuples(index=False, name=None))
    # doc 1: tokens 0-11 (shared_a), 14-21 (shared_b)
    # doc 2: tokens 2-13 (shared_a), 17-24 (shared_b)
    assert got == [(1, 0, 12), (1, 14, 22), (2, 2, 14), (2, 17, 25)]


def test_string_coarse_hash_equal_strings_cobucket():
    from pdf_extract_kit_ray.pipelines.dedup import _string_coarse_hash
    vals = ["alpha beta gamma", "alpha beta gamma", "", "x", "alpha beta gammb"]
    arr = pa.array(vals, pa.string())
    h = _string_coarse_hash(arr, 1 << 20)
    assert h[0] == h[1]
    assert h[0] != h[4]          # last-byte difference spreads
    # sliced array (non-zero offset) must hash identically
    h2 = _string_coarse_hash(arr.slice(1), 1 << 20)
    assert list(h2) == list(h[1:])


def test_embedding_pca_matches_numpy(ray_session):
    """Distributed sufficient-statistics PCA must agree with a single-node
    numpy PCA: same explained-variance ratios, same component directions
    (up to the pinned sign, compared by |cosine| to dodge near-degenerate
    eigenvalue wobble)."""
    import numpy as np
    import pyarrow.dataset as pads
    from pdf_extract_kit_ray.pipelines.similarity import embedding_pca

    sf = "/root/testdata/sf0.01"
    df = embedding_pca(sf, k=3).to_pandas()
    t = pads.dataset(f"{sf}/embeddings.parquet").to_table(
        columns=["embedding"])
    X = np.asarray([list(v) for v in t.column("embedding").to_pylist()],
                   dtype=np.float64)
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (len(X) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    total = evals.sum()

    dim = X.shape[1]
    assert len(df) == 3 * dim
    for ci in range(3):
        sub = df[df["component"] == ci].sort_values("dim_index")
        got = sub["coeff"].to_numpy()
        ref = evecs[:, order[ci]]
        cos = abs(float(got @ ref) /
                  (np.linalg.norm(got) * np.linalg.norm(ref)))
        assert cos > 0.999, f"component {ci} direction off (|cos|={cos})"
        assert np.isclose(sub["explained_var_ratio"].iloc[0],
                          evals[order[ci]] / total, atol=1e-9)
        # pinned sign: largest-|coeff| entry is positive
        assert got[np.argmax(np.abs(got))] > 0


def test_paragraph_dedup_planted(ray_session, tmp_path):
    """Planted paragraph-level semantics: cross-doc duplicate paragraph
    removed from the later doc, within-doc repeat removed, an all-duplicate
    doc keeps its row with NULL text, a null-text doc vanishes."""
    rows = [
        {"doc_id": 0, "text": "alpha\nshared para\nbeta"},
        {"doc_id": 1, "text": "shared para\ngamma\ngamma"},   # cross + self dup
        {"doc_id": 2, "text": "alpha"},                        # all-dup doc
        {"doc_id": 3, "text": None},                           # vanishes
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (dedup.paragraph_dedup(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(res.index) == [0, 1, 2]
    assert res.loc[0, "text_dedup"] == "alpha\nshared para\nbeta"
    assert (res.loc[0, "n_paras"], res.loc[0, "n_kept"]) == (3, 3)
    # doc 1: 'shared para' lost to doc 0; second 'gamma' lost to the first
    assert res.loc[1, "text_dedup"] == "gamma"
    assert (res.loc[1, "n_paras"], res.loc[1, "n_kept"]) == (3, 1)
    # doc 2: its only paragraph already appeared in doc 0 -> NULL text
    assert res.loc[2, "n_kept"] == 0 and pd.isna(res.loc[2, "text_dedup"])


def test_embedding_quantize_bounds_and_roundtrip(ray_session):
    """Quantization error per dimension is bounded by scale/2 (hence MSE
    by mean (scale_d/2)^2), codes are deterministic, constant dims code
    to 0 with zero error."""
    import pyarrow.parquet as pq
    import tempfile
    from pdf_extract_kit_ray.pipelines import similarity

    rng = np.random.default_rng(5)
    n, d = 200, 16
    mat = rng.normal(size=(n, d)) * np.linspace(0.5, 4.0, d)
    mat[:, 3] = 7.25                                # constant dim
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }), f"{td}/embeddings.parquet")
        res = similarity.embedding_quantize(td).to_pandas() \
            .sort_values("vec_id", ignore_index=True)
        res2 = similarity.embedding_quantize(td).to_pandas() \
            .sort_values("vec_id", ignore_index=True)
    assert len(res) == n
    assert (res["codes"] == res2["codes"]).all()    # deterministic
    # reconstruct and check the per-dim bound on the float32-rounded input
    m32 = mat.astype(np.float32).astype(np.float64)
    lo, hi = m32.min(axis=0), m32.max(axis=0)
    scale = (hi - lo) / 255.0
    scale[scale == 0] = 1.0
    codes = np.frombuffer(
        b"".join(bytes.fromhex(c) for c in res["codes"]),
        dtype=np.uint8).reshape(n, d).astype(np.float64)
    recon = codes * scale + lo
    err = np.abs(recon - m32)
    assert (err <= scale / 2 + 1e-12).all()
    assert np.allclose(res["mse"].to_numpy(),
                       np.round(((m32 - recon) ** 2).mean(axis=1), 6),
                       atol=1.5e-6)
    assert (codes[:, 3] == 0).all() and (err[:, 3] == 0).all()


def test_string_coarse_hash_large_string_parity():
    """Equal strings MUST co-bucket regardless of string/large_string
    storage (large_string offsets are int64 — reading them as int32
    produced garbage buckets and silently lost downstream merges)."""
    vals = ["click", "view>purchase", "", "x" * 300, "click"]
    small = pa.array(vals, pa.string())
    large = pa.array(vals, pa.large_string())
    hs = dedup._string_coarse_hash(small, 1 << 62)
    hl = dedup._string_coarse_hash(large, 1 << 62)
    assert (hs == hl).all()
    assert hs[0] == hs[4]            # equal strings, same bucket
    # sliced arrays (non-zero offset) must agree too
    assert (dedup._string_coarse_hash(large.slice(1), 1 << 62)
            == hl[1:]).all()


def test_doc_novelty_planted(ray_session, tmp_path):
    """A doc sharing a full 8-gram block with another is penalized per
    INSTANCE; a wholly original doc scores 1.0; short docs vanish."""
    shared = "one two three four five six seven eight"
    rows = [
        {"doc_id": 0, "text": shared + " tail0 tail1"},
        # doc 1 contains the shared 8 tokens twice
        {"doc_id": 1, "text": shared + " mid " + shared},
        {"doc_id": 2, "text": "all fresh words nine ten eleven twelve "
                              "thirteen fourteen"},
        {"doc_id": 3, "text": "too short"},
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (dedup.doc_novelty(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(res.index) == [0, 1, 2]
    assert res.loc[2, "novelty"] == 1.0
    # doc 0: grams = 3 (10 tokens); gram[0] == the shared 8-gram
    assert res.loc[0, "n_grams"] == 3 and res.loc[0, "n_dup_grams"] == 1
    # doc 1: 17 tokens -> 10 grams; the shared gram occurs at pos 0 and 9
    assert res.loc[1, "n_grams"] == 10 and res.loc[1, "n_dup_grams"] == 2
    assert res.loc[1, "novelty"] == round(1 - 2 / 10, 6)


def test_dedup_cascade_report_planted(ray_session, tmp_path):
    """Each tier counts its planted docs: one exact duplicate, one doc
    losing a shared paragraph, and the exact pair also being a (trivial)
    near-duplicate."""
    base = " ".join(WORDS * 4)                     # 80 tokens
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},               # exact dup of 0
        {"doc_id": 2, "text": "unique one\nshared paragraph here"},
        {"doc_id": 3, "text": "another body\nshared paragraph here"},
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (dedup.dedup_cascade_report(str(tmp_path)).to_pandas()
           .set_index("tier"))
    assert (res["corpus_docs"] == 4).all()
    assert res.loc["exact_duplicate", "n_docs"] == 1       # doc 1
    assert res.loc["paragraph_affected", "n_docs"] >= 2    # doc 1 (whole) + doc 3
    assert res.loc["minhash_near_dup", "n_docs"] >= 1      # doc 1 vs 0


def test_ann_recall_report(ray_session):
    """IVF self-eval: every query finds itself (score 1 in both paths),
    recalls land in [0,1], and k matches the requested depth."""
    import __ray_entry__ as E
    df = E.queries()["ann_recall_report"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("query_id").reset_index(drop=True)
    assert len(df) == 8
    assert (df["k"] == 10).all()
    assert df["recall"].between(0.0, 1.0).all()
    # the query vector itself scores 1.0 in both exact and IVF paths
    assert (df["n_hits"] >= 1).all()


def test_embedding_outliers_planted(ray_session, tmp_path):
    """A planted far-away vector is flagged; the tight cluster is not;
    and the exact integer threshold agrees with the DuckDB twin."""
    import os
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    rng = np.random.RandomState(3)
    base = rng.randn(64).astype(np.float32)
    vecs = [list(base + rng.randn(64).astype(np.float32) * 0.01)
            for _ in range(30)]
    vecs.append(list(base + 50.0))          # the planted outlier
    d = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(31), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([1] * 31, pa.int32())}),
        os.path.join(d, "embeddings.parquet"))
    got = E.queries()["embedding_outliers"](d).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got.loc[30, "is_outlier"] == 1
    assert got.loc[:29, "is_outlier"].sum() == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    orc = con.execute(E.oracle_sql()["embedding_outliers"]).df() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orc, check_dtype=False)


def _brute_jaccard_pairs(rows, threshold, k=3):
    """Straight-line exact oracle for the prefix-filter join."""
    out = set()
    sets = {r["doc_id"]: dedup.word_shingles(r["text"], k) for r in rows}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= threshold:
                out.add((a, b))
    return out


def test_prefix_jaccard_pairs_completeness_vs_bruteforce(ray_session,
                                                         tmp_path):
    """The prefix filter must find EVERY pair brute force finds (the
    completeness theorem), at several thresholds — the property that
    distinguishes it from LSH."""
    rng = random.Random(23)
    rows = []
    for i in range(120):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(WORDS) for _ in range(40))})
    # planted: exact dup, one-word edit, half-overlap splice
    rows.append({"doc_id": 500, "text": rows[0]["text"]})
    toks = rows[1]["text"].split(); toks[3] = "EDIT"
    rows.append({"doc_id": 501, "text": " ".join(toks)})
    half = rows[2]["text"].split()[:20] + rows[3]["text"].split()[:20]
    rows.append({"doc_id": 502, "text": " ".join(half)})
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    for thr in (0.3, 0.5, 0.8):
        res = dedup.prefix_jaccard_pairs(str(tmp_path),
                                         threshold=thr).to_pandas()
        got = set(zip(res["doc_a"], res["doc_b"]))
        expect = _brute_jaccard_pairs(rows, thr)
        assert got == expect, f"thr={thr}: {got ^ expect}"
        assert (res["jaccard"] >= thr).all()
    # at 0.5 the planted pairs are all present
    assert {(0, 500), (1, 501)} <= _brute_jaccard_pairs(rows, 0.5)


def test_prefix_jaccard_short_and_null_docs(ray_session, tmp_path):
    """Sub-k-token docs collapse to one whole-text shingle (the
    word_shingles edge); NULL/empty docs never join."""
    rows = [{"doc_id": 0, "text": "aa bb"},          # < k tokens
            {"doc_id": 1, "text": "aa bb"},          # identical short doc
            {"doc_id": 2, "text": "aa cc"},
            {"doc_id": 3, "text": None},
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": None}]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows).set_column(
            1, "text", pa.array([r["text"] for r in rows], pa.string())),
        os.path.join(str(tmp_path), "documents.parquet"))
    res = dedup.prefix_jaccard_pairs(str(tmp_path),
                                     threshold=0.5).to_pandas()
    assert set(zip(res["doc_a"], res["doc_b"])) == {(0, 1)}
    assert res["jaccard"].tolist() == [1.0]


def test_minhash_estimation_error_planted(ray_session, tmp_path):
    """Exact dup pins (est=1, exact=1, err=0); the near-dup pair's exact
    Jaccard is the known shingle ratio and the 64-perm estimate stays
    within 5 binomial sds of it; pair rows are distinct."""
    sf_dir = _make_docs_table(str(tmp_path))
    res = dedup.minhash_estimation_error(sf_dir).to_pandas()
    assert not res.duplicated(["keep_id", "dup_id"]).any()
    assert ((0.0 <= res["est_jaccard"]) & (res["est_jaccard"] <= 1.0)).all()
    exact_pair = res[(res["keep_id"] == 0) & (res["dup_id"] == 100)]
    assert len(exact_pair) == 1
    assert (exact_pair.iloc[0][["est_jaccard", "exact_jaccard",
                                "abs_err"]] == [1.0, 1.0, 0.0]).all()
    near = res[(res["keep_id"] == 1) & (res["dup_id"] == 101)]
    assert len(near) == 1
    j = near.iloc[0]["exact_jaccard"]
    # 3 changed words of 60, k=3 shingles: exact overlap from the texts
    from pdf_extract_kit_ray.pipelines.dedup import jaccard, word_shingles
    ta = pq.read_table(os.path.join(str(tmp_path), "documents.parquet"))
    texts = dict(zip(ta.column("doc_id").to_pylist(),
                     ta.column("text").to_pylist()))
    assert j == round(jaccard(texts[1], texts[101], 3), 6)
    sd = (j * (1 - j) / 64) ** 0.5
    assert near.iloc[0]["abs_err"] <= 5 * sd
    # abs_err is consistent by construction everywhere
    assert np.allclose(res["abs_err"],
                       (res["est_jaccard"] - res["exact_jaccard"]).abs()
                       .round(6))


def test_sorted_neighborhood_pairs_edges(ray_session, tmp_path):
    """SNM discriminating edges: pairs slide within the 4-char block only
    (no cross-block pair even for adjacent sort positions), the window-3
    run pairs offsets 1 AND 2, same_key compares the 12-char key, and
    whitespace normalization (lower + collapse + trim) shapes the key."""
    rows = [
        # block 'aaaa': three docs -> 3 pairs (1-2, 2-3, 1-3)
        {"doc_id": 1, "text": "AAAA  bbbb cccc one"},     # norm: aaaa bbbb...
        {"doc_id": 2, "text": "aaaa bbbb cccc two"},      # same 12-key as 1
        {"doc_id": 3, "text": "aaaa zzzz different"},     # same block, diff key
        # block 'bbbb': single doc -> no pairs
        {"doc_id": 4, "text": "bbbb lonely"},
        # NULL text drops
        {"doc_id": 5, "text": None},
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = dedup.sorted_neighborhood_pairs(str(tmp_path)).to_pandas()
    got = set(map(tuple, res[["doc_a", "doc_b"]].values.tolist()))
    assert got == {(1, 2), (2, 3), (1, 3)}
    assert set(res["block"]) == {"aaaa"}
    by_pair = {(a, b): s for a, b, s in
               res[["doc_a", "doc_b", "same_key"]].values.tolist()}
    # docs 1/2 share the full 12-char key ('aaaa bbbb cc'); 3 does not
    assert by_pair[(1, 2)] and not by_pair[(2, 3)] and not by_pair[(1, 3)]


def test_kmeans_silhouette_planted_clusters(ray_session, tmp_path):
    """Two tight, well-separated planted clusters -> mean silhouette near
    1 in both; smeared single blob -> near 0.  Also pins the simplified
    (centroid-based) definition: s = (b - a)/max(a, b)."""
    rng = np.random.default_rng(3)
    dim = 8
    c0, c1 = np.zeros(dim), np.full(dim, 10.0)
    pts = np.vstack([c0 + 0.01 * rng.standard_normal((100, dim)),
                     c1 + 0.01 * rng.standard_normal((100, dim))])
    # vec_id 0 lands in cluster 0, vec_id 1 in cluster 1 -> k=2 init picks
    # one seed from each planted blob
    pts[0], pts[1] = c0, c1
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in pts],
                              pa.list_(pa.float64())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    df = similarity.kmeans_silhouette(str(tmp_path), k=2).to_pandas()
    assert len(df) == 2
    assert int(df.n.sum()) == 200
    assert (df.mean_silhouette > 0.99).all()

    # single diffuse blob split into 2 clusters -> silhouette much lower
    blob = rng.standard_normal((200, dim))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(blob)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in blob],
                              pa.list_(pa.float64())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    df2 = similarity.kmeans_silhouette(str(tmp_path), k=2).to_pandas()
    assert (df2.mean_silhouette < 0.6).all()


def test_cluster_purity_planted_labels(ray_session, tmp_path):
    """Two separated blobs with consistent labels -> purity 1.0 per
    cluster and the majority labels are the planted ones."""
    rng = np.random.default_rng(5)
    dim = 8
    pts = np.vstack([0.01 * rng.standard_normal((80, dim)),
                     10.0 + 0.01 * rng.standard_normal((80, dim))])
    pts[0] = 0.0
    pts[1] = 10.0
    labels = np.r_[np.full(80, 3, np.int32), np.full(80, 7, np.int32)]
    labels[1] = 7        # point 1 was moved into blob B as the k=2 seed
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in pts],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int32()),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    df = similarity.cluster_purity(str(tmp_path), k=2).to_pandas()
    assert len(df) == 2 and int(df.n.sum()) == 160
    assert (df.purity == 1.0).all()
    assert set(df.majority_label) == {3, 7}


def test_intrinsic_dim_planted_manifold(ray_session, tmp_path):
    """Points on a 4-dim Gaussian embedded in 16 ambient dims estimate
    d_hat near 4; full-rank 16-dim Gaussian estimates well above it.
    (TWO-NN is biased slightly low at finite n — accept a band.)"""
    rng = np.random.default_rng(9)
    n, amb, d = 1500, 16, 4

    def write(pts):
        pq.write_table(pa.table({
            "vec_id": pa.array(range(len(pts)), pa.int64()),
            "embedding": pa.array([r.tolist() for r in pts],
                                  pa.list_(pa.float64())),
        }), os.path.join(str(tmp_path), "embeddings.parquet"))

    low = np.zeros((n, amb))
    low[:, :d] = rng.standard_normal((n, d))
    os.makedirs(str(tmp_path), exist_ok=True)
    write(low)
    r = similarity.embedding_intrinsic_dim(str(tmp_path)).to_pandas().iloc[0]
    assert r.ambient_dim == amb and r.n_used > 400
    assert 2.5 < r.intrinsic_dim < 6.0

    full = rng.standard_normal((n, amb))
    write(full)
    r2 = similarity.embedding_intrinsic_dim(str(tmp_path)).to_pandas().iloc[0]
    assert r2.intrinsic_dim > 9.0
    assert r2.intrinsic_dim > r.intrinsic_dim + 3
