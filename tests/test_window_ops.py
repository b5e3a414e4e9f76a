"""Unit semantics for the partitioned-window operators.

The oracle tests pin these against their SQL twins on the generated
corpora; the micro-tables here pin the DISCRIMINATING edges the corpora
may not exercise: ntile's uneven-decile split, single-row partitions,
acctbal ties broken by custkey, cross-block event ordering for sequence
extraction, NULL event_type drops, and the Q22 threshold boundary
(cents == threshold excluded) + recent-order anti-join.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines import relational, streaming


def _write(tmpdir, name, table):
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(table, os.path.join(tmpdir, f"{name}.parquet"))


def _customers(tmpdir, rows):
    """rows: (custkey, nationkey, acctbal)."""
    _write(tmpdir, "customer", pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
        "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
        "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
        "c_mktsegment": pa.array(["SEG"] * len(rows), pa.string()),
    }))


def test_nation_balance_ranks_edges(ray_session, tmp_path):
    d = str(tmp_path / "ranks")
    # nation 0: 12 rows (ntile(10): first 2 deciles get 2 rows), with an
    # acctbal TIE between custkey 5 and 6 (tie-break on custkey);
    # nation 1: a single row (pct_rank must be 0.0, decile 1).
    rows = [(i, 0, float(100 + 10 * i)) for i in range(5)]
    rows += [(5, 0, 150.0), (6, 0, 150.0)]          # tie with row i=5
    rows += [(i, 0, float(300 + i)) for i in range(7, 12)]
    rows += [(99, 1, 42.0)]
    _customers(d, rows)
    out = {r["c_custkey"]: r
           for r in relational.nation_balance_ranks(d).take_all()}
    assert len(out) == 13
    # single-row partition
    assert out[99]["rank_in_nation"] == 1
    assert out[99]["pct_rank"] == 0.0
    assert out[99]["decile"] == 1
    # tie: equal acctbal 150.0 -> custkey ascending decides
    assert out[5]["rank_in_nation"] + 1 == out[6]["rank_in_nation"]
    # ntile(10) over n=12: deciles 1 and 2 have 2 rows, the rest 1
    n0 = [r for r in out.values() if r["c_nationkey"] == 0]
    sizes = {}
    for r in n0:
        sizes[r["decile"]] = sizes.get(r["decile"], 0) + 1
    assert sizes == {1: 2, 2: 2, **{k: 1 for k in range(3, 11)}}
    # pct_rank of the max row is exactly 1.0
    assert max(r["pct_rank"] for r in n0) == 1.0


def test_order_spend_share_edges(ray_session, tmp_path):
    d = str(tmp_path / "share")
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, 10, 20], pa.int64()),
        # 0.01-cent values exercise the exact-cents rounding
        "o_totalprice": pa.array([10.00, 20.00, 10.005, 5.55],
                                 pa.float64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_orderdate": pa.array([1_700_000_000_000_000] * 4,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
    }))
    out = {r["o_orderkey"]: r
           for r in relational.order_spend_share(d).take_all()}
    # single-order customer: share exactly 1.0
    assert out[4]["share"] == 1.0
    # 10.005 rounds half-away to 1001 cents; total = 1000+2000+1001
    assert out[3]["share"] == round(1001 / 4001, 6)
    assert out[1]["share"] == round(1000 / 4001, 6)


def _events(tmpdir, rows):
    """rows: (event_id, ts_us, user_id, event_type)."""
    _write(tmpdir, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }))


def test_user_event_sequences_ordering_and_nulls(ray_session, tmp_path):
    d = str(tmp_path / "seq")
    t0 = 1_700_000_000_000_000
    _events(d, [
        # user 1 written OUT of time order (and with an event_id tie-break
        # at equal ts: ids 3 then 4 at t0+2 -> "d" before "c", matching the
        # SQL twin's ORDER BY ts, event_id)
        (9, t0 + 5, 1, "e"),
        (4, t0 + 2, 1, "c"),
        (1, t0 + 0, 1, "a"),
        (3, t0 + 2, 1, "d"),
        (2, t0 + 1, 1, "b"),
        # user 2: a NULL type row that must be dropped, not nulled through
        (5, t0 + 0, 2, "x"),
        (6, t0 + 1, 2, None),
        (7, t0 + 2, 2, "y"),
    ])
    out = {r["user_id"]: r
           for r in streaming.user_event_sequences(d).take_all()}
    assert out[1]["seq"] == "a>b>d>c>e"
    assert out[1]["n_events"] == 5
    assert out[2]["seq"] == "x>y"
    assert out[2]["n_events"] == 2


def test_global_sales_opportunity_boundary(ray_session, tmp_path):
    d = str(tmp_path / "q22")
    # positive balances: 100.00 and 200.00 -> avg 150.00 (15000 cents,
    # exact).  cents == threshold must be EXCLUDED (strict >).
    _customers(d, [(1, 0, 100.0), (2, 0, 200.0), (3, 0, 150.0),
                   (4, 1, 180.0), (5, 1, -50.0)])
    _write(d, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }))
    # cutoff 2001-01-01 = 978307200e6 us; "old" ~1998-07, "new" ~2027
    old, new = 900_000_000_000_000, 1_800_000_000_000_000
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        # cust 2 has only an OLD order (stays); cust 4 a RECENT one (drops)
        "o_custkey": pa.array([2, 4], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([old, new], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"], pa.string()),
    }))
    out = {r["nation"]: r
           for r in relational.global_sales_opportunity(d).take_all()}
    # avg positive = (100+200+150+180)/4 = 157.50 -> thr 15750 cents.
    # qualifying: cust 2 (20000 > 15750, old order only),
    #             cust 4 (18000 > 15750) is dropped by its recent order.
    assert set(out) == {"ALPHA"}
    assert out["ALPHA"]["n_customers"] == 1
    assert out["ALPHA"]["total_bal_cents"] == 20000


def test_inter_event_gaps_edges(ray_session, tmp_path):
    d = str(tmp_path / "gaps")
    t0 = 1_700_000_000_000_000
    _events(d, [
        # user 1: gaps 2s then 3s; second gap lands on a NULL-type event
        # (the "(null)" sentinel class), third event closes a typed gap
        (1, t0 + 0, 1, "a"),
        (2, t0 + 2_000_000, 1, "b"),
        (3, t0 + 5_000_000, 1, None),
        # user 2: single event -> contributes NO gap anywhere
        (4, t0 + 0, 2, "a"),
    ])
    out = {r["event_type"]: r
           for r in streaming.inter_event_gaps(d).take_all()}
    assert set(out) == {"b", "(null)"}
    assert out["b"]["n_gaps"] == 1
    assert out["b"]["sum_gap_us"] == 2_000_000
    assert out["b"]["max_gap_us"] == 2_000_000
    assert out["b"]["mean_gap_sec"] == 2.0
    assert out["(null)"]["sum_gap_us"] == 3_000_000


def test_dedup_keep_best_edges(ray_session, tmp_path):
    import pyarrow as pa

    from pdf_extract_kit_ray.pipelines import dedup

    d = str(tmp_path / "keepbest")
    # docs 1/2/3 share one normalized fingerprint ("hello world") but the
    # raw texts differ in whitespace, so their quality scores differ:
    # doc 2 (no padding) scores highest and must win despite doc 1 being
    # the lower doc_id; docs 4/5 are the all-NULL sentinel cluster.
    _write(d, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["Hello   World      ", "hello world",
                          "  HELLO WORLD          ", None, None],
                         pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["s"] * 5, pa.string()),
        "n_chars": pa.array([19, 11, 23, 0, 0], pa.int64()),
    }))
    out = {r["doc_id"]: r for r in dedup.dedup_keep_best(d).take_all()}
    assert set(out) == {2, 4}
    assert out[2]["n_copies"] == 3
    assert out[2]["quality"] > 0.5
    # null cluster: quality pinned 0.0, min doc_id kept
    assert out[4]["n_copies"] == 2
    assert out[4]["quality"] == 0.0


def test_order_spend_share_zero_total(ray_session, tmp_path):
    """A customer whose order cents sum to zero (free order, or offsetting
    positive/negative prices) divides by zero: the SQL twin returns NULL
    for every such share, never nan/inf/crash."""
    import pyarrow as pa

    d = str(tmp_path / "share0")
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 20, 20, 30], pa.int64()),
        # cust 10: single free order (0/0); cust 20: offsetting +/- 100
        # (100/0 and -100/0); cust 30: normal control row
        "o_totalprice": pa.array([0.0, 100.0, -100.0, 50.0], pa.float64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_orderdate": pa.array([1_700_000_000_000_000] * 4,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
    }))
    out = {r["o_orderkey"]: r
           for r in relational.order_spend_share(d).take_all()}
    assert len(out) == 4
    assert out[1]["share"] is None
    assert out[2]["share"] is None
    assert out[3]["share"] is None
    assert out[4]["share"] == 1.0


def test_daily_revenue_ma7_rampup(ray_session, tmp_path):
    """Ramp-up days average over the actual window size; steady state
    averages exactly 7 days."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines import relational

    days = pd.date_range("1997-03-01", periods=10, freq="D")
    rows = []
    for i, d in enumerate(days):
        # two lines per day, revenue = (i+1) dollars total
        rows.append({"l_shipdate": d, "l_extendedprice": (i + 1) * 0.75,
                     "l_discount": 0.0})
        rows.append({"l_shipdate": d + pd.Timedelta(hours=5),
                     "l_extendedprice": (i + 1) * 0.25, "l_discount": 0.0})
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    res = (relational.daily_revenue_ma7(str(tmp_path)).to_pandas()
           .sort_values("day", ignore_index=True))
    assert len(res) == 10
    assert res.loc[0, "ma7"] == 1.0                   # window of 1
    assert res.loc[3, "ma7"] == round((1+2+3+4)/4, 6)  # ramp-up window of 4
    assert res.loc[9, "ma7"] == round(sum(range(4, 11))/7, 6)  # steady 7
    assert (res["revenue"].to_numpy()
            == np.arange(1, 11, dtype=float)).all()


def test_user_growth_curve_planted(ray_session, tmp_path):
    """New-user attribution goes to each user's FIRST day only; the
    running total is cumulative distinct users."""
    import pandas as pd
    rows = []
    eid = 0
    # user 1: days 1,2,3; user 2: days 2,3; user 3: day 3
    for uid, days in [(1, [1, 2, 3]), (2, [2, 3]), (3, [3])]:
        for d in days:
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": pd.Timestamp(f"2024-01-0{d} 12:00:00"),
                         "event_type": "click", "value": 1.0,
                         "props": "{}"})
            eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "events.parquet"))
    res = (streaming.user_growth_curve(str(tmp_path)).to_pandas()
           .sort_values("day", ignore_index=True))
    assert list(res["new_users"]) == [1, 1, 1]
    assert list(res["cum_users"]) == [1, 2, 3]


def test_customer_spend_gini_known_values(ray_session, tmp_path):
    """Closed-form checks: equal spends -> Gini 0; a 3-value case against
    the hand-computed coefficient (ties in the histogram path)."""
    d = str(tmp_path / "gini")

    def orders(prices):
        _write(d, "orders", pa.table({
            "o_orderkey": pa.array(range(len(prices)), pa.int64()),
            "o_custkey": pa.array(range(len(prices)), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(prices), pa.string()),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array([1_700_000_000_000_000] * len(prices),
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(prices),
                                        pa.string()),
        }))

    from pdf_extract_kit_ray.pipelines import relational
    orders([10.0, 10.0, 10.0, 10.0])
    res = relational.customer_spend_gini(d).to_pandas()
    assert res.loc[0, "gini"] == 0.0 and res.loc[0, "n_customers"] == 4
    # spends 1,2,3 (sorted): G = 2*(1*1+2*2+3*3)/(3*6) - 4/3 = 2/9
    orders([2.0, 1.0, 3.0])
    res = relational.customer_spend_gini(d).to_pandas()
    assert res.loc[0, "gini"] == round(2 / 9, 6)
    assert res.loc[0, "total_spend"] == 6.0
