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
