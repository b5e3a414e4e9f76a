"""The distributed ordered-prefix-scan primitive (functions/scan.py):
property-checked against a serial numpy cumsum under adversarial bucket
layouts (skew, empty buckets, single bucket, one-row buckets), plus the
sequence_pack / training_order edge semantics the SQL-twin test can't see
(empty docs, bucket-boundary straddle, max_buckets guard)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extract_kit_ray.functions.scan import (hex_prefix_buckets,
                                                int_range_buckets,
                                                ordered_prefix_scan)


def _scan_table(tbl: pa.Table, bucket_fn, value_col, n_blocks=5):
    ds = ray.data.from_arrow(tbl)
    if tbl.num_rows >= n_blocks:
        ds = ds.repartition(n_blocks)
    out = ordered_prefix_scan(ds, ["k"], bucket_fn, value_col=value_col,
                              out_col="pfx")
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    return df


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sum_scan_matches_serial(ray_session, seed):
    rng = np.random.RandomState(seed)
    n = 500
    # non-contiguous, shuffled keys with gaps: buckets get skewed loads
    keys = rng.choice(np.arange(0, 5000), size=n, replace=False)
    vals = rng.randint(0, 1000, size=n).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    df = _scan_table(tbl, int_range_buckets("k", 0, 4999, 16), "v")
    order = np.argsort(keys)
    expect = np.cumsum(vals[order]) - vals[order]
    assert (df["pfx"].to_numpy() == expect).all()
    assert (df["k"].to_numpy() == keys[order]).all()


def test_count_scan_is_global_rank(ray_session):
    rng = np.random.RandomState(7)
    keys = rng.permutation(np.arange(100, 400))
    tbl = pa.table({"k": pa.array(keys, pa.int64())})
    df = _scan_table(tbl, int_range_buckets("k", 100, 399, 8), None)
    assert (df["pfx"].to_numpy() == np.arange(len(keys))).all()


def test_single_and_degenerate_buckets(ray_session):
    # all rows hash to ONE bucket (lo == hi) and n=1
    tbl = pa.table({"k": pa.array([5, 3, 9], pa.int64()),
                    "v": pa.array([10, 20, 30], pa.int64())})
    df = _scan_table(tbl, int_range_buckets("k", 3, 9, 1), "v", n_blocks=2)
    assert df["pfx"].tolist() == [0, 20, 30]  # order 3,5,9 -> 0,20,20+10
    one = pa.table({"k": pa.array([42], pa.int64()),
                    "v": pa.array([7], pa.int64())})
    df1 = _scan_table(one, int_range_buckets("k", 42, 42, 4), "v",
                      n_blocks=1)
    assert df1["pfx"].tolist() == [0]


def test_max_buckets_guard(ray_session):
    tbl = pa.table({"k": pa.array(list(range(10)), pa.int64())})
    with pytest.raises(ValueError, match="max_buckets"):
        ordered_prefix_scan(
            ray.data.from_arrow(tbl), ["k"],
            int_range_buckets("k", 0, 9, 10), out_col="pfx",
            max_buckets=4).materialize()


def test_hex_prefix_buckets_vectorized_decode(ray_session):
    import hashlib
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(64)]
    tbl = pa.table({"k": pa.array(keys, pa.string())})
    got = hex_prefix_buckets("k", 4)(tbl)
    expect = np.array([int(k[:4], 16) for k in keys], dtype=np.int64)
    assert (got == expect).all()
    # bucket order must agree with bytewise string order
    order = np.argsort(np.array(keys))
    assert (np.diff(got[order]) >= 0).all()


@pytest.fixture()
def pack_dir(tmp_path):
    texts = ["a b c", "", "   ", "one two three four five", "x"]
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["src0"] * 5, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_sequence_pack_empty_docs_and_boundaries(ray_session, pack_dir):
    from pdf_extract_kit_ray.pipelines.curation import sequence_pack
    df = sequence_pack(pack_dir, budget=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # tokens: 3, 0, 0, 5, 1 -> starts 0, 3, 3, 3, 8
    assert df["n_tokens"].tolist() == [3, 0, 0, 5, 1]
    assert df["token_start"].tolist() == [0, 3, 3, 3, 8]
    assert df["seq_id"].tolist() == [0, 0, 0, 0, 2]
    assert df["seq_off"].tolist() == [0, 3, 3, 3, 0]


def test_training_order_is_seeded_permutation(ray_session, pack_dir):
    from pdf_extract_kit_ray.pipelines.curation import training_order
    df = training_order(pack_dir).to_pandas()
    assert sorted(df["train_rank"].tolist()) == [0, 1, 2, 3, 4]
    # rank order == (shuffle_key, doc_id) order
    by_rank = df.sort_values("train_rank")
    assert by_rank["shuffle_key"].is_monotonic_increasing
    # a different seed permutes differently but deterministically
    df2 = training_order(pack_dir, seed="7").to_pandas()
    df3 = training_order(pack_dir, seed="7").to_pandas()
    m2 = dict(zip(df2["doc_id"], df2["train_rank"]))
    m3 = dict(zip(df3["doc_id"], df3["train_rank"]))
    assert m2 == m3


@pytest.mark.parametrize("seed", [3, 9])
def test_max_scan_matches_serial(ray_session, seed):
    """op='max': exclusive running max over key order — the watermark
    primitive.  First row NULL (matching SQL's 1-PRECEDING window)."""
    rng = np.random.RandomState(seed)
    n = 400
    keys = rng.choice(np.arange(0, 3000), size=n, replace=False)
    vals = rng.randint(-500, 500, size=n).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = ordered_prefix_scan(ds, ["k"],
                              int_range_buckets("k", 0, 2999, 16),
                              value_col="v", out_col="wm", op="max")
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    order = np.argsort(keys)
    v_sorted = vals[order]
    expect = np.maximum.accumulate(v_sorted).astype(float)
    expect = np.r_[np.nan, expect[:-1]]          # exclusive, first NULL
    got = df["wm"].to_numpy(dtype=float)
    assert np.isnan(got[0])
    assert np.array_equal(got[1:], expect[1:])


def test_max_scan_rejects_unknown_op(ray_session):
    tbl = pa.table({"k": pa.array([1, 2], pa.int64()),
                    "v": pa.array([1, 2], pa.int64())})
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError):
        ordered_prefix_scan(ds, ["k"], int_range_buckets("k", 1, 2, 2),
                            value_col="v", op="median")
