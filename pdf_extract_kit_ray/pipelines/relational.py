"""Relational operators with exact DuckDB-SQL twins (driver correctness gate).

Patterns demonstrated (the 100 TB shapes):
* pruned reads (``columns=`` on every ``read_parquet``),
* vectorized per-batch kernels (pyarrow.compute only — no row loops),
* partial/combiner aggregation inside ``map_batches`` before the shuffle, so
  the groupby moves pre-reduced rows,
* broadcast hash join: the small side is put in the object store ONCE and
  looked up inside every task — never a two-sided shuffle for a dimension
  table.

Float discipline: double sums are NOT associative, so a parallel engine and
DuckDB would disagree in the last bits (and a 6dp round can then flip).  All
monetary/value sums therefore go through exact integer cents —
``floor(x*100)::int64`` per row (floor of the identical input double is
bit-deterministic in every engine), summed exactly, divided by 100.0 once at
the end.  The SQL twins use the same expression shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _cents(col) -> pa.Array:
    return pc.cast(pc.floor(pc.multiply(col, 100.0)), pa.int64())


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> "ray.data.Dataset":
    """TPC-H Q1-shaped: filter on ship date, group by flag+status,
    exact-cents sums and average."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff_ts = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))

    def prep(batch: pa.Table) -> pa.Table:
        """Filter + cents projection + PARTIAL per-batch aggregation: the
        shuffle then moves ~|groups| rows per block, not the row stream."""
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff_ts))
        disc_price = pc.multiply(batch.column("l_extendedprice"),
                                 pc.subtract(1.0, batch.column("l_discount")))
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": _cents(batch.column("l_quantity")),
            "price_c": _cents(batch.column("l_extendedprice")),
            "disc_c": _cents(disc_price),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_c", "sum"),
             ("qty_c", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "qty_c", "price_c", "disc_c", "partial_n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("qty_c", alias_name="qty_c"),
                        Sum("price_c", alias_name="price_c"),
                        Sum("disc_c", alias_name="disc_c"),
                        Sum("partial_n", alias_name="count_order")))

    def finish(batch: pa.Table) -> pa.Table:
        qty = pc.divide(pc.cast(batch.column("qty_c"), pa.float64()), 100.0)
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": qty,
            "sum_base_price": pc.divide(
                pc.cast(batch.column("price_c"), pa.float64()), 100.0),
            "sum_disc_price": pc.divide(
                pc.cast(batch.column("disc_c"), pa.float64()), 100.0),
            "avg_qty": pc.divide(
                qty, pc.cast(batch.column("count_order"), pa.float64())),
            "count_order": batch.column("count_order"),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def orders_per_nation(sf_dir: str) -> "ray.data.Dataset":
    """orders ⨝ customer ⨝ nation rolled up to (nation, n_orders, total_price).

    customer (small) and nation (tiny) are broadcast via ``ray.put``; each
    orders batch maps o_custkey -> nation with a vectorized array take,
    pre-reduces per batch, and only (nation, partials) rows enter the final
    groupby."""
    import pyarrow.dataset as pads
    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_nationkey"])
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"])
    c_keys = cust.column("c_custkey").to_numpy()
    c_nat = cust.column("c_nationkey").to_numpy()
    cust_lookup = np.full(int(c_keys.max()) + 1, -1, dtype=np.int64)
    cust_lookup[c_keys] = c_nat
    max_nat = int(nation.column("n_nationkey").to_numpy().max())
    nat_names = np.empty(max_nat + 1, dtype=object)
    for k, v in zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_name").to_pylist()):
        nat_names[k] = v
    side = ray.put((cust_lookup, nat_names))

    def partial(batch: pa.Table) -> pa.Table:
        lookup, names = ray.get(side)
        natkeys = lookup[batch.column("o_custkey").to_numpy()]
        t = pa.table({"nation": pa.array(names[natkeys], pa.string()),
                      "price_c": _cents(batch.column("o_totalprice"))})
        g = t.group_by("nation").aggregate([("price_c", "sum"),
                                            ("price_c", "count")])
        return g.rename_columns(["nation", "partial_price_c", "partial_n"])

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("nation")
             .aggregate(Sum("partial_n", alias_name="n_orders"),
                        Sum("partial_price_c", alias_name="price_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation": batch.column("nation"),
            "n_orders": batch.column("n_orders"),
            "total_price": pc.divide(
                pc.cast(batch.column("price_c"), pa.float64()), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window aggregate over the event stream table, with
    per-batch partial combine before the shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table({"hour": hour,
                      "event_type": batch.column("event_type"),
                      "value_c": _cents(batch.column("value"))})
        g = t.group_by(["hour", "event_type"]).aggregate(
            [("value_c", "sum"), ("value_c", "count")])
        return g.rename_columns(["hour", "event_type", "partial_sum_c", "partial_n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["hour", "event_type"])
             .aggregate(Sum("partial_n", alias_name="n_events"),
                        Sum("partial_sum_c", alias_name="sum_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "hour": batch.column("hour"),
            "event_type": batch.column("event_type"),
            "n_events": batch.column("n_events"),
            "sum_value": pc.divide(
                pc.cast(batch.column("sum_c"), pa.float64()), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def top_users(sf_dir: str, n: int = 20) -> "ray.data.Dataset":
    """Top-n users by total event value: partial combine -> groupby -> sort
    (with user_id tiebreak) -> limit; the sort sees only pre-reduced
    per-user rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "value_c": _cents(batch.column("value"))})
        g = t.group_by("user_id").aggregate([("value_c", "sum")])
        return g.rename_columns(["user_id", "partial_c"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Sum("partial_c", alias_name="total_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "total_value": pc.divide(
                pc.cast(batch.column("total_c"), pa.float64()), 100.0),
        })
    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(["total_value", "user_id"], descending=[True, False])
               .limit(n))


def distinct_event_types(sf_dir: str) -> "ray.data.Dataset":
    """Distinct values via per-batch dedup then a global unique pass — the
    shuffle sees only each block's distinct set."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type":
                         pc.unique(batch.column("event_type"))})

    return (ds.map_batches(local_distinct, batch_format="pyarrow")
              .groupby("event_type")
              .aggregate(Count(alias_name="_n"))
              .select_columns(["event_type"]))


def user_running_totals(sf_dir: str, max_user: int = 50) -> "ray.data.Dataset":
    """Windowed running sum per user (ORDER BY ts, event_id) — a window
    function expressed as groupby(user).map_groups with an in-group sort.
    Exact-cents cumsum so the running values hash-match the SQL window."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("user_id"), max_user))

    def running(group: pa.Table) -> pa.Table:
        group = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        cents = _cents(group.column("value"))
        run = pc.cumulative_sum(cents)
        return pa.table({
            "user_id": group.column("user_id"),
            "event_id": group.column("event_id"),
            "running_value": pc.divide(pc.cast(run, pa.float64()), 100.0),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(running, batch_format="pyarrow"))
