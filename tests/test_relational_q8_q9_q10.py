"""Discriminating edges for the Q8/Q9/Q10-shaped queries that the corpus
hash-match may not exercise: absent target nation, negative profit rows,
and an empty order-date window."""

import pandas as pd

from pdf_extract_kit_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_market_share_absent_target_is_zero(ray_session):
    df = relational.market_share(SF, target_nation="NO_SUCH_NATION") \
        .to_pandas()
    assert len(df) > 0
    assert (df["mkt_share"] == 0.0).all()
    assert (df["total_revenue"] > 0).all()


def test_negative_profit_floor_matches_duckdb(ray_session):
    # the corpus' profits happen to be non-negative at small SF, so pin
    # the discriminating edge directly: floor toward -inf on a negative
    # amount must agree between the engine kernel and DuckDB's floor()
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    amounts = [-123.456, -0.005, -1e-9, 0.0, 0.005, 99.999]
    engine = pc.cast(pc.floor(pc.multiply(pa.array(amounts, pa.float64()),
                                          100.0)), pa.int64()).to_pylist()
    duck = [duckdb.sql(
        f"SELECT CAST(floor(({a!r})*100.0) AS BIGINT)").fetchone()[0]
        for a in amounts]
    assert engine == duck == [-12346, -1, -1, 0, 0, 9999]


def test_returned_item_revenue_empty_window(ray_session):
    ds = relational.returned_item_revenue(
        SF, lo="1990-01-01", hi="1990-01-01")
    assert ds.schema().names == ["c_custkey", "c_name", "c_acctbal",
                                 "nation", "revenue"]
    assert ds.count() == 0


def test_returned_item_revenue_ordering(ray_session):
    df = relational.returned_item_revenue(SF, n=10).to_pandas()
    assert len(df) <= 10
    rev = df["revenue"].tolist()
    assert rev == sorted(rev, reverse=True)
    # ties (if any) break ascending by custkey
    for i in range(1, len(df)):
        if rev[i] == rev[i - 1]:
            assert df["c_custkey"].iloc[i] > df["c_custkey"].iloc[i - 1]


def test_top_supplier_empty_window(ray_session):
    ds = relational.top_supplier(SF, lo="1990-01-01", hi="1990-01-01")
    assert ds.schema().names == ["s_suppkey", "s_name", "total_revenue"]
    assert ds.count() == 0


def test_small_quantity_revenue_unknown_brand(ray_session):
    df = relational.small_quantity_revenue(SF, brand="Brand#999") \
        .to_pandas()
    assert len(df) == 1
    assert df["avg_yearly"].iloc[0] == 0.0
    assert df["n_rows"].iloc[0] == 0


def test_order_count_distribution_covers_all_customers(ray_session):
    import pyarrow.dataset as pads
    df = relational.order_count_distribution(SF).to_pandas()
    n_total = pads.dataset(f"{SF}/customer.parquet").count_rows()
    assert df["n_customers"].sum() == n_total
    assert (df["n_orders"] >= 0).all()


def test_sole_late_supplier_planted(ray_session, tmp_path):
    """Planted multi-supplier orders pin the predicate edges: two late
    suppliers on one order -> excluded; single-supplier late order ->
    excluded; exactly-one-late multi-supplier order -> counted."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    base = pd.Timestamp("2024-01-01")
    late = base + pd.Timedelta(days=90)
    ok_ship = base + pd.Timedelta(days=10)
    # order 1: supp 1 late, supp 2 on time  -> supp 1 counted
    # order 2: supp 1 and 2 both late       -> excluded (nlate=2)
    # order 3: only supp 3, late            -> excluded (nsupp=1)
    # order 4: supp 2 late twice (two lineitems), supp 3 on time
    #                                        -> supp 2 counted (dedup pairs)
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4, 4], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 3, 2, 2, 3], pa.int64()),
        "l_shipdate": pa.array(
            [late, ok_ship, late, late, late, late, late, ok_ship],
            pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([base] * 4, pa.timestamp("us")),
    })
    supp = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
    })
    pq.write_table(li, d / "lineitem.parquet")
    pq.write_table(orders, d / "orders.parquet")
    pq.write_table(supp, d / "supplier.parquet")

    df = relational.sole_late_supplier(str(d)).to_pandas()
    got = dict(zip(df["s_suppkey"], df["numwait"]))
    assert got == {1: 1, 2: 1}


def test_cross_source_overlap_fp_mode_matches_duckdb(ray_session):
    """fp mode (exact-content contamination) against a direct DuckDB twin
    at sf0.1 — the only bundled SF with planted cross-source duplicates."""
    import duckdb
    from pdf_extract_kit_ray.pipelines.dedup import cross_source_overlap

    sf = "/root/testdata/sf0.1"
    df = cross_source_overlap(sf, key="fp").to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    orc = duckdb.sql(f"""
        WITH fps AS (
            SELECT DISTINCT
                md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
                source
            FROM '{sf}/documents.parquet' WHERE text IS NOT NULL
        )
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_shared
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert len(df) == len(orc) > 0
    assert (df["source_a"].values == orc["source_a"].values).all()
    assert (df["source_b"].values == orc["source_b"].values).all()
    assert (df["n_shared"].values == orc["n_shared"].values).all()


def test_event_order_audit_single_and_sorted(ray_session, tmp_path):
    """Boundary-stitch edges: a perfectly ts-sorted stream has rate 0; a
    single-event stream has 0 pairs; an inversion exactly AT a bucket
    boundary is still counted (ids spread wide so range buckets split)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.streaming import event_order_audit

    base = pd.Timestamp("2024-01-01").value // 1000

    def mk(dirname, ids, ts_us):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }), d / "events.parquet")
        return str(d)

    # sorted: 0 inversions over a wide id range (many buckets)
    ids = list(range(0, 100000, 1000))
    df = event_order_audit(mk("sorted", ids,
                              [base + i for i in range(len(ids))])) \
        .to_pandas()
    assert df["n_pairs"].iloc[0] == len(ids) - 1
    assert df["n_inversions"].iloc[0] == 0
    assert df["inversion_rate"].iloc[0] == 0.0

    # single event: no pairs
    df = event_order_audit(mk("single", [7], [base])).to_pandas()
    assert df["n_pairs"].iloc[0] == 0
    assert df["n_inversions"].iloc[0] == 0

    # one inversion, ids far apart (guaranteed different range buckets)
    df = event_order_audit(mk("boundary", [0, 99999],
                              [base + 10, base])).to_pandas()
    assert df["n_pairs"].iloc[0] == 1
    assert df["n_inversions"].iloc[0] == 1
    assert df["inversion_rate"].iloc[0] == 1.0


def test_user_cohort_values_multi_month(ray_session, tmp_path):
    """Planted three-month stream: cohorts and ages must follow each
    user's FIRST event; value cells sum exact cents."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.streaming import user_cohort_values

    d = tmp_path / "sf"
    d.mkdir()
    rows = [
        # user 1: cohort Jan, active Jan + Mar (age 0 and 2)
        (1, 1, "2024-01-05", 10.10),
        (2, 1, "2024-03-09", 5.05),
        # user 2: cohort Feb, active Feb twice (age 0)
        (3, 2, "2024-02-01", 1.00),
        (4, 2, "2024-02-20", 2.00),
        # user 3: cohort Jan, active Feb (ages 0, 1)
        (5, 3, "2024-01-31", 0.50),
        (6, 3, "2024-02-01", 0.25),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[2]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), d / "events.parquet")

    df = user_cohort_values(str(d)).to_pandas()
    df["cohort_month"] = df["cohort_month"].astype(str).str[:7]
    got = {(r.cohort_month, r.age_months): (r.n_users, r.total_value)
           for r in df.itertuples()}
    # u2 is ONE distinct user with two events in its cohort month
    assert got == {
        ("2024-01", 0): (2, 10.60),   # u1 Jan + u3 Jan
        ("2024-01", 1): (1, 0.25),    # u3 Feb
        ("2024-01", 2): (1, 5.05),    # u1 Mar
        ("2024-02", 0): (1, 3.00),    # u2 (two events, one user)
    }
