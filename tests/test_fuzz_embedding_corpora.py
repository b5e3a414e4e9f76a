"""Deterministic fuzz of the embedding-query twins.

Seeded generators build embedding tables full of the shapes that break
vector math — an all-ZERO vector (cosine denominator 0), exact
duplicates, 1e-7 near-duplicates (cosine ties at rounding boundaries),
constant dimensions, one huge-magnitude vector, negative components —
and every SQL-twinned embedding query must hash-match its DuckDB
oracle.  hybrid_rrf_topk additionally reads documents, so the corpus
ships an aligned documents table.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

QUERIES = ["ann_topk", "contrastive_pairs", "embedding_dim_stats",
           "embedding_neardup", "embedding_outliers", "embedding_quantize",
           "hybrid_rrf_topk", "knn_classify", "label_centroids"]

_DIM = 64


def _make_corpus(tmpdir: str, seed: int, magnitude: float = 10.0) -> str:
    d = os.path.join(tmpdir, f"vfuzz{seed}-{magnitude:g}")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    n = 80
    mat = rng.randn(n, _DIM).astype(np.float32)
    mat[0] = 0.0                       # the all-zero vector
    mat[1] = mat[2]                    # exact duplicate pair
    mat[3] = mat[4] + 1e-7             # near-duplicate (cosine ~ 1)
    mat[:, 7] = 1.0                    # constant dimension
    # outlier magnitude: 10x for the shared corpus — the LARGEST scale
    # inside embedding_outliers' documented exact-int d2 headroom (both
    # engines fail loudly beyond it: the engine's assert, DuckDB's
    # BIGINT multiply); the dim_stats-only extreme test below goes to
    # 1e6 to exercise the limb accumulator against the HUGEINT twin
    mat[5] *= magnitude
    mat[6] = -mat[2]                   # exact antipode (cosine -1)
    emb = pa.array([row.tolist() for row in mat],
                   pa.list_(pa.float32()))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": emb,
        "label": pa.array((np.arange(n) % 10).astype(np.int32),
                          pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    # aligned documents table for the hybrid lexical+vector query
    texts = [f"term{i % 5} shared word filler text {i}" for i in range(n)]
    texts[0] = ""                      # empty doc for the zero vector
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    return d


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          ignore_index=True)


@pytest.mark.parametrize("seed", [7, 19])
@pytest.mark.parametrize("name", QUERIES)
def test_fuzz_embeddings_match_oracle(ray_session, tmp_path, seed, name):
    import ray.data
    sf = _make_corpus(str(tmp_path), seed)
    res = entrymod.queries()[name](sf)
    if isinstance(res, ray.data.Dataset):
        schema = res.schema()
        res = res.to_pandas()
        if len(res) == 0 and len(res.columns) == 0 \
                and schema is not None and schema.names:
            res = pa.schema(list(zip(schema.names, schema.types))) \
                .empty_table().to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracle = con.execute(entrymod.oracle_sql()[name]).df()
    a, b = _canon(pd.DataFrame(res)), _canon(oracle)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  obj=f"{name} seed={seed}")


def test_dim_stats_extreme_magnitude(ray_session, tmp_path):
    """1e6-magnitude components: the limb-split sum-of-squares must
    match the HUGEINT twin exactly where a naive int64 sumsq wraps to
    NEGATIVE variances (the bug this corpus originally caught)."""
    sf = _make_corpus(str(tmp_path), 7, magnitude=1e6)
    res = entrymod.queries()["embedding_dim_stats"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    oracle = con.execute(
        entrymod.oracle_sql()["embedding_dim_stats"]).df()
    a, b = _canon(res), _canon(oracle)
    assert (a["var_v"].astype(float) >= 0).all()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
