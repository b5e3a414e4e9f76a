"""Sketch accuracy bounds + sessionization window semantics."""

import numpy as np
import pytest

from pdf_extract_kit_ray.functions.sketches import DDSketch, HLL, splitmix64


def test_splitmix64_deterministic_and_mixed():
    x = np.arange(1000, dtype=np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 1000
    # top bits must be spread (they pick the HLL register)
    # birthday expectation: 4096*(1-(1-1/4096)^1000) ~ 890 distinct buckets
    top = (h1 >> np.uint64(52)).astype(np.int64)
    assert len(np.unique(top)) > 800


def test_hll_small_range_near_exact():
    h = HLL(p=12)
    h.add_ints(np.arange(150, dtype=np.uint64))
    assert abs(h.estimate() - 150) / 150 < 0.03


def test_hll_large_range_and_merge_associativity():
    n = 200_000
    full = HLL(p=12)
    full.add_ints(np.arange(n, dtype=np.uint64))
    # split into 8 partials merged in a different order
    merged = HLL(p=12)
    for i in range(7, -1, -1):
        part = HLL(p=12)
        part.add_ints(np.arange(i * n // 8, (i + 1) * n // 8, dtype=np.uint64))
        merged.merge_registers(part.registers)
    assert (merged.registers == full.registers).all()
    assert abs(full.estimate() - n) / n < 0.05  # ~1.04/sqrt(4096) = 1.6% typ


def test_hll_duplicates_dont_inflate():
    h = HLL(p=12)
    vals = np.arange(500, dtype=np.uint64)
    for _ in range(5):
        h.add_ints(vals)
    assert abs(h.estimate() - 500) / 500 < 0.03


def test_ddsketch_relative_error_bound():
    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.5, size=50_000)
    sk = DDSketch(alpha=0.01)
    # feed in chunks, merging sketch partials like the pipeline does
    merged = DDSketch(alpha=0.01)
    for chunk in np.array_split(vals, 17):
        part = DDSketch(alpha=0.01)
        part.add(chunk)
        merged.merge(part.bins, part.n_underflow)
    s = np.sort(vals)
    for q in (0.5, 0.9, 0.99):
        exact = s[max(1, int(np.ceil(q * len(s)))) - 1]
        approx = merged.quantile(q)
        assert abs(approx - exact) / exact < 0.012, (q, exact, approx)


def test_ddsketch_underflow_bin():
    sk = DDSketch()
    sk.add(np.array([0.0, -5.0, 1.0, 2.0]))
    assert sk.n_underflow == 2 and sk.count == 4
    assert sk.quantile(0.25) == 0.0


def test_sketch_pipelines(ray_session):
    import duckdb
    from pdf_extract_kit_ray.pipelines import streaming
    sf = "/root/testdata/sf0.001"
    exact_users, exact_p50 = duckdb.sql(
        f"""SELECT count(DISTINCT user_id),
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
            FROM read_parquet('{sf}/events.parquet')""").fetchone()
    est = streaming.hll_distinct_users(sf).column("distinct_users_est")[0].as_py()
    assert abs(est - exact_users) / exact_users < 0.05
    qt = streaming.ddsketch_value_quantiles(sf)
    assert abs(qt.column("p50")[0].as_py() - exact_p50) / exact_p50 < 0.02


def test_embedding_kmeans_properties(ray_session):
    from pdf_extract_kit_ray.pipelines.similarity import embedding_kmeans
    sf = "/root/testdata/sf0.001"
    k1 = embedding_kmeans(sf, k=4, iters=3).to_pandas()
    k2 = embedding_kmeans(sf, k=4, iters=3).to_pandas()
    assert k1.equals(k2)                       # deterministic across runs
    import duckdb
    total = duckdb.sql(f"SELECT count(*) FROM "
                       f"read_parquet('{sf}/embeddings.parquet')").fetchone()[0]
    assert k1.n.sum() == total                 # every vector assigned
    one = embedding_kmeans(sf, k=4, iters=1).to_pandas()
    assert k1.inertia_total[0] <= one.inertia_total[0]   # Lloyd's monotone


def test_hll_aggregator_v2_groupby(ray_session):
    import duckdb
    from pdf_extract_kit_ray.pipelines.streaming import hll_distinct_by_type
    sf = "/root/testdata/sf0.001"
    df = hll_distinct_by_type(sf).to_pandas()
    exact = dict(duckdb.sql(
        f"""SELECT event_type, count(DISTINCT user_id)
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1""").fetchall())
    assert set(df["event_type"]) == set(exact)
    for _, r in df.iterrows():
        e = exact[r["event_type"]]
        assert abs(r["distinct_users_est"] - e) / e < 0.05


def test_ddsketch_aggregator_v2_groupby(ray_session):
    import duckdb
    from pdf_extract_kit_ray.pipelines.streaming import ddsketch_quantiles_by_type
    sf = "/root/testdata/sf0.001"
    df = ddsketch_quantiles_by_type(sf).to_pandas()
    ex = duckdb.sql(
        f"""SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1""").df() \
        .set_index("event_type")
    assert len(df) == len(ex)
    for _, r in df.iterrows():
        e = ex.loc[r["event_type"], "p50"]
        assert abs(r["p50"] - e) / e < 0.011


def test_misra_gries_guarantees():
    """Heavy hitters survive, estimates undercount by at most err, and the
    merge rule preserves both — driven far into the eviction regime
    (distinct keys >> k)."""
    import numpy as np
    from pdf_extract_kit_ray.functions.sketches import MisraGries

    rng = np.random.RandomState(7)
    # zipf-ish stream: 10 planted whales + 50k tail keys
    whales = np.repeat(np.arange(10), 5000)              # 5000 each
    tail = rng.randint(1000, 51000, size=50000)
    stream = np.concatenate([whales, tail])
    rng.shuffle(stream)
    n = len(stream)
    k = 64

    exact: dict = {}
    for v in stream.tolist():
        exact[v] = exact.get(v, 0) + 1

    # single-summary pass
    sk = MisraGries(k)
    for i in range(0, n, 1000):
        sk.add_block(stream[i:i + 1000])
    assert len(sk.counters) <= k
    assert sk.err <= n // (k + 1)
    for key, est in sk.counters.items():
        assert est <= exact[key] <= est + sk.err
    for w in range(10):                      # freq 5000 > n/(k+1) ≈ 1538
        assert w in sk.counters

    # merged summaries agree with the same guarantees
    a, b = MisraGries(k), MisraGries(k)
    half = n // 2
    for i in range(0, half, 1000):
        a.add_block(stream[i:i + 1000])
    for i in range(half, n, 1000):
        b.add_block(stream[i:i + 1000])
    a.merge(b)
    assert len(a.counters) <= k
    assert a.err <= n // (k + 1)
    for key, est in a.counters.items():
        assert est <= exact[key] <= est + a.err
    for w in range(10):
        assert w in a.counters


def test_misra_gries_lossless_regime():
    """distinct <= k -> err 0 and exact counts (the oracle-valid regime)."""
    import numpy as np
    from pdf_extract_kit_ray.functions.sketches import MisraGries

    sk = MisraGries(100)
    sk.add_block(np.repeat(np.arange(50), 7))
    sk.add_block(np.repeat(np.arange(30), 3))
    assert sk.err == 0
    assert sk.counters[10] == 10 and sk.counters[40] == 7


def test_heavy_hitter_users_pipeline(ray_session):
    import duckdb
    from pdf_extract_kit_ray.pipelines.streaming import heavy_hitter_users
    sf = "/root/testdata/sf0.001"
    df = heavy_hitter_users(sf).to_pandas()
    ex = duckdb.sql(
        f"""SELECT user_id, count(*) AS c
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1 ORDER BY c DESC, user_id ASC LIMIT 20""").df()
    assert (df["max_undercount"] == 0).all()          # lossless at test scale
    assert df["user_id"].tolist() == ex["user_id"].tolist()
    assert df["est_count"].tolist() == ex["c"].tolist()


def test_bloom_positions_deterministic_and_uniform():
    import pyarrow as pa
    from pdf_extract_kit_ray.functions.sketches import bloom_positions
    import hashlib
    fps = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                    for i in range(5000)], pa.string())
    p1 = bloom_positions(fps, 1 << 20)
    p2 = bloom_positions(fps, 1 << 20)
    assert (p1 == p2).all() and p1.shape == (5000, 4)
    assert p1.min() >= 0 and p1.max() < (1 << 20)
    # positions spread: no bucket grossly hot
    _, counts = np.unique(p1.ravel(), return_counts=True)
    assert counts.max() <= 8
    # large_string parity (the coarse-hash regression class)
    assert (bloom_positions(fps.cast(pa.large_string()), 1 << 20)
            == p1).all()
    # the md5 digest yields exactly 4 independent words: k > 4 must fail
    # loudly instead of silently running a worse filter
    import pytest
    with pytest.raises(ValueError, match="1 <= k <= 4"):
        bloom_positions(fps, 1 << 20, k=8)
    with pytest.raises(ValueError, match="1 <= k <= 4"):
        bloom_positions(fps, 1 << 20, k=0)


def test_bloom_incremental_dedup_no_false_negatives(ray_session, tmp_path):
    """Every true duplicate of the established subset must flag; the
    false-positive rate on a clean corpus stays near the analytic bound."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import curation

    rows = []
    for i in range(800):
        rows.append({"doc_id": i, "text": f"unique body number {i} xyz"})
    # doc_id % 8 == 0 is established; plant new docs duplicating them
    for j, base in enumerate((0, 8, 16, 24, 32)):
        rows.append({"doc_id": 1001 + j * 2,   # odd -> NEW shard
                     "text": f"unique body number {base} xyz"})
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "documents.parquet"))
    res = (curation.bloom_incremental_dedup(str(tmp_path))
           .to_pandas().set_index("doc_id"))
    planted = [1001 + j * 2 for j in range(5)]
    assert res.loc[planted, "maybe_dup"].all()          # no false negatives
    clean = res.drop(index=planted)
    # m=2^20, k=4, n=100 members -> FP rate ~ (kn/m)^k ~ 1e-14; allow
    # a generous absolute budget for the tiny corpus
    assert clean["maybe_dup"].sum() <= 1


def test_table_profile_tolerance(ray_session):
    """Null counts exact; HLL distinct within 5% of exact per column."""
    import duckdb
    from pdf_extract_kit_ray.pipelines import streaming
    sf = "/root/testdata/sf0.01"
    prof = (streaming.table_profile(sf, "events").to_pandas()
            .set_index("column"))
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT count(*) AS n,
               count(DISTINCT user_id) AS du,
               count(DISTINCT event_type) AS d_types,
               sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS np
        FROM read_parquet('{sf}/events.parquet')""").df().iloc[0]
    assert set(prof.index) == {"event_id", "ts", "user_id", "event_type",
                               "value", "props"}
    assert (prof["n_rows"] == int(exact["n"])).all()
    assert prof.loc["props", "n_nulls"] == int(exact["np"])
    for col, ex in (("user_id", int(exact.du)),
                    ("event_type", int(exact.d_types))):
        est = prof.loc[col, "approx_distinct"]
        assert abs(est - ex) <= max(2, 0.05 * ex), (col, est, ex)


def test_cms_overcount_only_and_exact_in_sparse_regime():
    from pdf_extract_kit_ray.functions.sketches import CountMin
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 500, size=20_000).astype(np.int64)
    sk = CountMin(w=4096, d=4)
    sk.add_ints(keys)
    probe = np.arange(500, dtype=np.int64)
    exact = np.bincount(keys, minlength=500)
    est = sk.estimate_ints(probe)
    # CMS never undercounts
    assert (est >= exact).all()
    # and the error obeys the e*N/w bound with wide margin
    assert (est - exact).max() <= np.e * len(keys) / 4096 * 3
    assert sk.n == len(keys)


def test_cms_linearity_split_invariance():
    from pdf_extract_kit_ray.functions.sketches import CountMin
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 10_000, size=30_000).astype(np.int64)
    full = CountMin(w=2048, d=4)
    full.add_ints(keys)
    merged = CountMin(w=2048, d=4)
    for part in np.array_split(keys, 7):
        p = CountMin(w=2048, d=4)
        p.add_ints(part)
        merged.merge(p)
    assert (merged.counts == full.counts).all()
    assert merged.n == full.n


def test_cms_invalid_depth_fails_loudly():
    from pdf_extract_kit_ray.functions.sketches import CountMin
    with pytest.raises(ValueError):
        CountMin(w=64, d=9)
    with pytest.raises(ValueError):
        CountMin(w=64, d=0)


def test_cms_user_counts_query_vs_exact(ray_session):
    import duckdb

    from pdf_extract_kit_ray.pipelines.streaming import cms_user_counts

    sf = "/root/testdata/sf0.001"
    out = cms_user_counts(sf).to_pandas().set_index("user_id")
    exact = dict(duckdb.sql(
        f"SELECT user_id, count(*) FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").fetchall())
    n_total = sum(exact.values())
    assert (out["n_events"] == n_total).all()
    for uid, row in out.iterrows():
        ex = exact.get(uid, 0)
        assert row["est_count"] >= ex            # overcount-only
        assert row["est_count"] - ex <= np.e * n_total / 2048 * 3
    # deterministic across runs
    out2 = cms_user_counts(sf).to_pandas().set_index("user_id")
    assert (out["est_count"] == out2["est_count"]).all()
