"""The shared broadcast-join primitive (functions/joins.py)."""

import pyarrow as pa
import pytest
import ray.data

from pdf_extract_kit_ray.functions.joins import broadcast_join


@pytest.fixture()
def left_ds(ray_session):
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 21.0]),
    })).repartition(2)


DIM = pa.table({"key": pa.array([1, 2, 5], pa.int64()),
                "name": pa.array(["a", "b", "e"])})


def test_broadcast_inner_join(left_ds):
    out = broadcast_join(left_ds, DIM, on="k", right_on="key").to_pandas()
    got = sorted(zip(out["k"], out["name"], out["v"]))
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (2, "b", 21.0)]


def test_broadcast_left_outer_join(left_ds):
    out = broadcast_join(left_ds, DIM, on="k", right_on="key",
                         join_type="left outer").to_pandas()
    assert len(out) == 5
    assert out[out.k == 3]["name"].isna().all()


def test_broadcast_anti_and_semi(left_ds):
    anti = broadcast_join(left_ds, DIM, on="k", right_on="key",
                          join_type="left anti").to_pandas()
    assert sorted(anti["k"]) == [3, 4]
    semi = broadcast_join(left_ds, DIM, on="k", right_on="key",
                          join_type="left semi").to_pandas()
    assert sorted(semi["k"]) == [1, 2, 2]


def test_broadcast_join_rejects_right_joins(left_ds):
    with pytest.raises(ValueError):
        broadcast_join(left_ds, DIM, on="k", join_type="right outer")


def test_promo_revenue_empty_window(ray_session):
    """A ship-date window matching no rows must return a zero row, not
    crash on Ray's None aggregate results."""
    from pdf_extract_kit_ray.pipelines.relational import promo_revenue
    df = promo_revenue("/root/testdata/sf0.001",
                       lo="2020-01-01", hi="2020-02-01").to_pandas()
    assert len(df) == 1
    assert df["promo_pct"].iloc[0] == 0.0
    assert df["total_revenue"].iloc[0] == 0.0


def test_select_prunes_columns(left_ds):
    out = broadcast_join(left_ds, DIM, on="k", right_on="key",
                         select=["name", "v"]).to_pandas()
    assert list(out.columns) == ["name", "v"]


def test_verify_candidate_pairs_primitive(ray_session):
    """Direct contract test for the shared membership-union verifier:
    payloads attach to every candidate pair exactly once (duplicate
    candidate rows across bands dedupe), pairs missing a side's payload
    are dropped, and the verify kernel sees pair-aligned a/b sides."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdf_extract_kit_ray.functions.pairs import verify_candidate_pairs

    items = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 5, 6], pa.int64()),
        "text": pa.array(["one", "two", "three", "five", None],
                         pa.string()),
    }))
    # (1,2) twice (band duplicate), (2,3) once, (3,4): 4 has no payload,
    # (5,6): 6 has a NULL payload -> missing side, pair dropped
    cand = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, 3, 5], pa.int64()),
        "b": pa.array([2, 2, 3, 4, 6], pa.int64()),
    }))

    def verify(a_ids, b_ids, pa_a, pa_b):
        ta, tb = pa_a.to_pylist(), pa_b.to_pylist()
        return pa.table({
            "a": pa.array(a_ids, pa.int64()),
            "b": pa.array(b_ids, pa.int64()),
            "combined": pa.array([f"{x}|{y}" for x, y in zip(ta, tb)],
                                 pa.string())})

    out = verify_candidate_pairs(
        items, cand, id_col="id", payload_col="text",
        payload_type=pa.string(), num_coarse=4,
        verify=verify).to_pandas().sort_values(["a", "b"]) \
        .reset_index(drop=True)
    assert list(out["a"]) == [1, 2]   # (3,4): no payload; (5,6): NULL payload
    assert list(out["b"]) == [2, 3]
    assert list(out["combined"]) == ["one|two", "two|three"]


def test_customers_without_orders_filter_to_empty(ray_session):
    """A min_price above every order empties the join's right side AFTER
    the filter — the case the raw-file row-count guard cannot see (Ray's
    hash-shuffle join loses the key schema on an all-empty side).  Every
    customer must come back unmatched."""
    from pdf_extract_kit_ray.pipelines.relational import (
        customers_without_orders)
    import pyarrow.dataset as pads

    res = customers_without_orders("/root/testdata/sf0.001",
                                   min_price=1e12).to_pandas()
    n_cust = pads.dataset(
        "/root/testdata/sf0.001/customer.parquet").count_rows()
    assert res["n_customers"].sum() == n_cust


def test_lookup_np_arrow_native_broadcast_map():
    """lookup_np is the Arrow-native replacement for pd.Series.map(dict):
    hash probe via pc.index_in, gather in numpy, loud failure on missing
    keys when no default is given."""
    import numpy as np
    from pdf_extract_kit_ray.functions.joins import make_lookup, lookup_np

    tab = make_lookup(["a", "b", "c"], [10, 20, 30])
    keys = pa.array(["b", "a", "c", "b"])
    assert lookup_np(keys, tab).tolist() == [20, 10, 30, 20]
    # chunked input
    ch = pa.chunked_array([["a"], ["c", "b"]])
    assert lookup_np(ch, tab).tolist() == [10, 30, 20]
    # missing key with a default fills; without one it raises
    assert lookup_np(pa.array(["a", "zz"]), tab,
                     default=-1).tolist() == [10, -1]
    with pytest.raises(KeyError, match="zz"):
        lookup_np(pa.array(["a", "zz"]), tab)
    # Arrow-column construction preserves the key type even when empty
    empty = make_lookup(pa.array([], pa.string()),
                        pa.array([], pa.int64()))
    assert lookup_np(pa.array(["x"]), empty, default=7).tolist() == [7]
    # integer keys
    itab = make_lookup(pa.array([5, 9], pa.int64()),
                       np.array([1.5, 2.5]))
    got = lookup_np(pa.array([9, 5, 9], pa.int64()), itab)
    assert got.tolist() == [2.5, 1.5, 2.5]


def test_events_type_overlap_rejects_wide_type_vocab(ray_session, tmp_path):
    """The int64 bitmask caps at 63 distinct event types — a wider
    vocabulary must error instead of silently corrupting counts."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extract_kit_ray.pipelines.streaming import events_type_overlap

    n = 200
    pq.write_table(pa.table({
        "user_id": pa.array(np.arange(n) % 10, pa.int64()),
        "event_type": pa.array([f"t{i % 64}" for i in range(n)],
                               pa.string()),
    }), str(tmp_path / "events.parquet"))
    with pytest.raises(ValueError, match="63-bit"):
        events_type_overlap(str(tmp_path))
