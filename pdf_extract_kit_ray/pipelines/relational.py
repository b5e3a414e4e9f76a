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

from ..functions.joins import sized_read_parquet
from ray.data.aggregate import Count, Sum


def _cents(col) -> pa.Array:
    return pc.cast(pc.floor(pc.multiply(col, 100.0)), pa.int64())


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> "ray.data.Dataset":
    """TPC-H Q1-shaped: filter on ship date, group by flag+status,
    exact-cents sums and average."""
    ds = sized_read_parquet(
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
        qty = pc.divide(pc.cast(batch.column("qty_c"), pa.float64(), safe=False), 100.0)
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": qty,
            "sum_base_price": pc.divide(
                pc.cast(batch.column("price_c"), pa.float64(), safe=False), 100.0),
            "sum_disc_price": pc.divide(
                pc.cast(batch.column("disc_c"), pa.float64(), safe=False), 100.0),
            "avg_qty": pc.divide(
                qty, pc.cast(batch.column("count_order"), pa.float64(), safe=False)),
            "count_order": batch.column("count_order"),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def orders_per_nation(sf_dir: str) -> "ray.data.Dataset":
    """orders ⨝ customer ⨝ nation rolled up to (nation, n_orders, total_price).

    The dimension side (customer ⨝ nation, pre-joined on the driver — a few
    MB) is broadcast ONCE through the shared ``broadcast_join`` primitive;
    each orders batch hash-joins against it in Arrow's native kernel,
    pre-reduces per batch, and only (nation, partials) rows enter the final
    groupby.  Inner-join semantics drop unknown custkeys, like the SQL twin."""
    from ..functions.joins import broadcast_join, read_small_table

    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey", right_keys="n_nationkey") \
              .select(["c_custkey", "n_name"])

    ds = sized_read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, dim, on="o_custkey", right_on="c_custkey",
                            select=["n_name", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"nation": batch.column("n_name"),
                      "price_c": _cents(batch.column("o_totalprice"))})
        g = t.group_by("nation").aggregate([("price_c", "sum"),
                                            ("price_c", "count")])
        return g.rename_columns(["nation", "partial_price_c", "partial_n"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
             .groupby("nation")
             .aggregate(Sum("partial_n", alias_name="n_orders"),
                        Sum("partial_price_c", alias_name="price_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation": batch.column("nation"),
            "n_orders": batch.column("n_orders"),
            "total_price": pc.divide(
                pc.cast(batch.column("price_c"), pa.float64(), safe=False), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def nation_year_rollup(sf_dir: str) -> "ray.data.Dataset":
    """GROUPING SETS / ROLLUP(nation, year) over order revenue — the OLAP
    subtotal shape Ray Data lacks natively: one pass emits partials for
    ALL THREE grouping levels ((nation, year), (nation), ()) from each
    batch, so a single small groupby produces detail rows, per-nation
    subtotals and the grand total together.

    Rolled-up key positions travel through the shuffle as sentinels
    ("" / -1 — values the data cannot contain) because Ray's sort-based
    group partitioning cannot order NULL keys; the finish map restores
    SQL ROLLUP's NULLs.  Exact-cents arithmetic as everywhere."""
    from ..functions.joins import broadcast_join, read_small_table

    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey", right_keys="n_nationkey") \
              .select(["c_custkey", "n_name"])

    ds = sized_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"])
    joined = broadcast_join(ds, dim, on="o_custkey", right_on="c_custkey",
                            select=["n_name", "o_totalprice", "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        nat = batch.column("n_name")
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        cents = _cents(batch.column("o_totalprice"))
        blank = pa.array([""] * batch.num_rows, pa.string())
        none_y = pa.array([-1] * batch.num_rows, pa.int64())
        t = pa.table({
            "nation_s": pa.concat_arrays(
                [nat.combine_chunks(), nat.combine_chunks(), blank]),
            "year_s": pa.concat_arrays(
                [year.combine_chunks()
                 if isinstance(year, pa.ChunkedArray) else year,
                 none_y, none_y]),
            "cents": pa.concat_arrays([cents.combine_chunks()
                                       if isinstance(cents, pa.ChunkedArray)
                                       else cents] * 3),
        })
        g = t.group_by(["nation_s", "year_s"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["nation_s", "year_s",
                                 "partial_cents", "partial_n"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby(["nation_s", "year_s"])
                 .aggregate(Sum("partial_n", alias_name="n_orders"),
                            Sum("partial_cents", alias_name="cents")))

    def finish(batch: pa.Table) -> pa.Table:
        nat = batch.column("nation_s")
        year = batch.column("year_s")
        return pa.table({
            "nation": pc.if_else(pc.equal(nat, ""),
                                 pa.scalar(None, pa.string()), nat),
            "o_year": pc.if_else(pc.equal(year, -1),
                                 pa.scalar(None, pa.int64()), year),
            "n_orders": batch.column("n_orders"),
            "total_price": pc.divide(
                pc.cast(batch.column("cents"), pa.float64(), safe=False), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window aggregate over the event stream table, with
    per-batch partial combine before the shuffle."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
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
                pc.cast(batch.column("sum_c"), pa.float64(), safe=False), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def top_users(sf_dir: str, n: int = 20) -> "ray.data.Dataset":
    """Top-n users by total event value: partial combine -> groupby -> sort
    (with user_id tiebreak) -> limit; the sort sees only pre-reduced
    per-user rows."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
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
                pc.cast(batch.column("total_c"), pa.float64(), safe=False), 100.0),
        })
    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(["total_value", "user_id"], descending=[True, False])
               .limit(n))


def distinct_event_types(sf_dir: str) -> "ray.data.Dataset":
    """Distinct values via per-batch dedup then a global unique pass — the
    shuffle sees only each block's distinct set."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
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

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
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
            "running_value": pc.divide(pc.cast(run, pa.float64(), safe=False), 100.0),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(running, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# joins (Dataset.join: hash-shuffle partitioned join, ray 2.49)
# ---------------------------------------------------------------------------

# the join-plan rule lives in functions/joins.py (shared, so the
# threshold/partition-count policy cannot drift between queries)
from ..functions.joins import (BROADCAST_BYTES as _BROADCAST_BYTES,
                               join_partitions as _join_partitions,
                               sized_join)


def order_priority_revenue(sf_dir: str,
                           num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """lineitem ⨝ orders on orderkey rolled up to order priority, with the
    engine's size-based join rule applied at plan time: the orders side
    pruned to (o_orderkey, o_orderpriority) is a few MB at bench scale —
    metadata-estimated via ``pruned_parquet_bytes`` — so it broadcasts
    (no shuffle at all); past ``_BROADCAST_BYTES`` the query falls back to
    the partitioned hash join (the 100 TB shape, where orders is itself a
    fact table).  Either way each post-join batch pre-reduces to
    (priority, partials) so the final groupby is over ~|priorities| rows."""
    line = sized_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderpriority"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(batch.column("l_extendedprice"),
                              pc.subtract(1.0, batch.column("l_discount")))
        t = pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "rev_c": _cents(revenue)})
        g = t.group_by("o_orderpriority").aggregate(
            [("rev_c", "sum"), ("rev_c", "count")])
        return g.rename_columns(["o_orderpriority", "partial_c", "partial_n"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby("o_orderpriority")
                 .aggregate(Sum("partial_n", alias_name="n_items"),
                            Sum("partial_c", alias_name="rev_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "n_items": batch.column("n_items"),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", n: int = 10,
                         num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """TPC-H Q3-shaped: top-n unshipped orders of one market segment by
    revenue.  Mix of join strategies: the filtered customer key set is a
    broadcast SEMI join on orders; orders ⨝ lineitem is a two-large-sides
    hash-shuffle join; per-batch partial combine before the group rollup;
    deterministic (revenue desc, date asc, orderkey asc) top-n."""
    from ..functions.joins import broadcast_join, read_small_table
    import pyarrow.dataset as pads

    cutoff_ts = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"],
                            filter=pads.field("c_mktsegment") == segment)

    orders_cols = ["o_orderkey", "o_custkey", "o_orderdate"]
    orders_path = f"{sf_dir}/orders.parquet"

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey", "l_extendedprice",
                                          "l_discount", "l_shipdate"])

    def line_filter(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("l_shipdate"), cutoff_ts)
        batch = batch.filter(keep)
        return batch.select(["l_orderkey", "l_extendedprice", "l_discount"])

    line = line.map_batches(line_filter, batch_format="pyarrow")

    from ..functions.joins import pruned_parquet_bytes
    if pruned_parquet_bytes(orders_path, orders_cols) <= _BROADCAST_BYTES:
        # size-based rule: filtered+semi-joined orders built in memory
        # (bounded above by the metadata-estimated pruned size), then ONE
        # broadcast join — the whole query becomes shuffle-free up to the
        # final small rollup
        o_tbl = pads.dataset(orders_path).to_table(
            columns=orders_cols,
            filter=pads.field("o_orderdate") < pd.Timestamp(cutoff))
        o_tbl = o_tbl.join(cust, keys="o_custkey", right_keys="c_custkey",
                           join_type="left semi") \
            .select(["o_orderkey", "o_orderdate"])
        joined = broadcast_join(line, o_tbl, on="l_orderkey",
                                right_on="o_orderkey", join_type="inner")
    else:
        orders = sized_read_parquet(orders_path, columns=orders_cols)

        def order_filter(batch: pa.Table) -> pa.Table:
            keep = pc.less(batch.column("o_orderdate"), cutoff_ts)
            return batch.filter(keep)

        orders = broadcast_join(orders.map_batches(order_filter,
                                                   batch_format="pyarrow"),
                                cust, on="o_custkey", right_on="c_custkey",
                                join_type="left semi",
                                select=["o_orderkey", "o_orderdate"])
        joined = line.join(
            orders, join_type="inner",
            num_partitions=_join_partitions(num_partitions),
            on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(1.0, batch.column("l_discount")))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "o_orderdate": batch.column("o_orderdate"),
                      "rev_c": _cents(rev)})
        g = t.group_by(["l_orderkey", "o_orderdate"]).aggregate(
            [("rev_c", "sum")])
        return g.rename_columns(["l_orderkey", "o_orderdate", "partial_c"])

    # high-cardinality key (one group per qualifying order): the coarse
    # Arrow aggregate avoids per-group reduce dispatch; o_orderdate is
    # functionally dependent on l_orderkey so it rides the same bucket
    from ..functions.agg import coarse_grouped_aggregate
    agg = coarse_grouped_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate"], [("partial_c", "sum", "rev_c")])

    def finish(batch: pa.Table) -> pa.Table:
        # keep the us precision through the sort (Ray's sort round-trips
        # keys through numpy, which otherwise downgrades to 's'/'D')
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "o_orderdate": batch.column("o_orderdate").cast(pa.timestamp("us")),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
        })

    def recast(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("o_orderdate"), "o_orderdate",
            batch.column("o_orderdate").cast(pa.timestamp("us")))

    # typed empty seed: a window with no qualifying rows yields ZERO
    # aggregate rows and Ray drops the schema entirely; the union pins it
    seed = pa.table({"l_orderkey": pa.array([], pa.int64()),
                     "o_orderdate": pa.array([], pa.timestamp("us")),
                     "revenue": pa.array([], pa.float64())})
    return ray.data.from_arrow(seed).union(
        agg.map_batches(finish, batch_format="pyarrow")
           .sort(["revenue", "o_orderdate", "l_orderkey"],
                 descending=[True, False, False])
           .limit(n)
           .map_batches(recast, batch_format="pyarrow"))


def promo_revenue(sf_dir: str, lo: str = "1997-01-01",
                  hi: str = "1997-04-01") -> "ray.data.Dataset":
    """TPC-H Q14-shaped: percentage of revenue from PROMO-type parts in a
    ship-date window.  part (small) is broadcast; the ratio is computed on
    exact integer cents with the identical double expression as the SQL
    twin."""
    from ..functions.joins import broadcast_join, read_small_table

    part = read_small_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type"])
    lo_ts = pa.scalar(pd.Timestamp(lo), pa.timestamp("us"))
    hi_ts = pa.scalar(pd.Timestamp(hi), pa.timestamp("us"))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_partkey", "l_extendedprice",
                                          "l_discount", "l_shipdate"])

    def window(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(sd, lo_ts), pc.less(sd, hi_ts))
        return batch.filter(keep).select(
            ["l_partkey", "l_extendedprice", "l_discount"])

    joined = broadcast_join(line.map_batches(window, batch_format="pyarrow"),
                            part, on="l_partkey", right_on="p_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0, batch.column("l_discount"))))
        promo = pc.equal(batch.column("p_type"), "PROMO")
        promo_c = pc.if_else(promo, rev_c, pa.scalar(0, pa.int64()))
        return pa.table({
            "promo_c": pa.array([pc.sum(promo_c).as_py() or 0], pa.int64()),
            "total_c": pa.array([pc.sum(rev_c).as_py() or 0], pa.int64()),
        })

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .aggregate(Sum("promo_c", alias_name="promo_c"),
                            Sum("total_c", alias_name="total_c")))
    # Ray's aggregate returns None sums on an empty dataset (e.g. a window
    # outside the data range)
    promo_c = agg["promo_c"] or 0
    total_c = agg["total_c"] or 0
    # THE shared DuckDB-bit-identical rounding (Python's round() is
    # half-to-even and can land one ulp away, which the driver's
    # bit-exact value hash would flag)
    from ..functions.num import round6_scalar
    pct = round6_scalar((100.0 * promo_c) / total_c) if total_c else 0.0
    return ray.data.from_arrow(pa.table({
        "promo_pct": pa.array([pct], pa.float64()),
        "total_revenue": pa.array([total_c / 100.0], pa.float64()),
    }))


def supplier_region_volume(sf_dir: str,
                           num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """TPC-H Q5-shaped: revenue per region where the supplier and the
    ordering customer share a nation.  One large×large hash join
    (lineitem ⨝ orders), then a CHAIN of broadcast joins (customer nation,
    supplier nation, nation ⨝ region pre-joined on the driver), an
    equality filter, and a partial-combined rollup — the multi-join shape
    where only one exchange ever touches the big table."""
    from ..functions.joins import broadcast_join, read_small_table

    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"]) \
        .rename_columns(["c_custkey", "cust_nat"])
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]) \
        .rename_columns(["s_suppkey", "supp_nat"])
    nation = read_small_table(f"{sf_dir}/nation.parquet")
    region = read_small_table(f"{sf_dir}/region.parquet")
    nat_region = nation.join(region, keys="n_regionkey",
                             right_keys="r_regionkey") \
        .select(["n_nationkey", "r_name"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey", "l_suppkey",
                                          "l_extendedprice", "l_discount"])
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_custkey"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    joined = broadcast_join(joined, cust, on="o_custkey",
                            right_on="c_custkey")
    joined = broadcast_join(joined, supp, on="l_suppkey",
                            right_on="s_suppkey")

    def partial(batch: pa.Table) -> pa.Table:
        # no empty-batch special case: group_by on a zero-row table returns
        # a correctly-TYPED empty result, whereas a hand-built empty with
        # int64 keys would mix block schemas (supp_nat is int32)
        batch = batch.filter(pc.equal(batch.column("cust_nat"),
                                      batch.column("supp_nat")))
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0, batch.column("l_discount"))))
        t = pa.table({"supp_nat": batch.column("supp_nat"),
                      "rev_c": rev_c})
        g = t.group_by("supp_nat").aggregate([("rev_c", "sum"),
                                              ("rev_c", "count")])
        return g.rename_columns(["supp_nat", "partial_c", "partial_n"])

    partials = joined.map_batches(partial, batch_format="pyarrow")
    partials = broadcast_join(partials, nat_region, on="supp_nat",
                              right_on="n_nationkey")
    agg = (partials.groupby("r_name")
                   .aggregate(Sum("partial_c", alias_name="rev_c"),
                              Sum("partial_n", alias_name="n_items")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "region": batch.column("r_name"),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
            "n_items": batch.column("n_items"),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def customers_without_orders(sf_dir: str, min_price: float = 300000.0,
                             num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Anti-join (customers with no order above ``min_price``) rolled up per
    market segment — the right side is filtered at the read, then
    ``join_type='left_anti'`` hash-shuffles both sides so neither needs to
    fit in memory (vs. the broadcast pattern of orders_per_nation)."""
    import pyarrow.dataset as pads
    # Ray's hash-shuffle join loses the key schema when a side is entirely
    # empty (FieldRef.Name(c_custkey) ArrowInvalid); both guards below are
    # parquet-metadata row counts, not scans.
    if pads.dataset(f"{sf_dir}/customer.parquet").count_rows() == 0:
        return ray.data.from_arrow(pa.table({
            "c_mktsegment": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64())}))
    cust = sized_read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])

    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def big_orders(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("o_totalprice"), min_price)
        return pa.table(
            {"o_custkey": batch.column("o_custkey").filter(keep)})

    # The emptiness probe must run on the FILTERED side (an empty filter
    # result crashes the join the same way an empty file does), so
    # materialize the projected key column — it is the join's shuffle
    # payload anyway — and branch on its metadata count.
    big = orders.map_batches(big_orders, batch_format="pyarrow") \
                .materialize()
    if big.count() == 0:
        anti = cust                          # anti-join vs empty = identity
    else:
        anti = cust.join(big, join_type="left_anti",
                         num_partitions=_join_partitions(num_partitions),
                         on=("c_custkey",), right_on=("o_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        g = (pa.table({"c_mktsegment": batch.column("c_mktsegment")})
               .group_by("c_mktsegment").aggregate([([], "count_all")]))
        return g.rename_columns(["c_mktsegment", "partial_n"])

    return (anti.map_batches(partial, batch_format="pyarrow")
                .groupby("c_mktsegment")
                .aggregate(Sum("partial_n", alias_name="n_customers")))


# ---------------------------------------------------------------------------
# window / set / sampling / quantile operators
# ---------------------------------------------------------------------------

def top_events_per_user(sf_dir: str, k: int = 3, max_user: int = 30) -> "ray.data.Dataset":
    """Top-k rows per group (row_number window): groupby(user).map_groups
    with an in-group (value desc, event_id asc) sort and head(k)."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("user_id"), max_user))

    def topk(group: pa.Table) -> pa.Table:
        group = group.sort_by([("value", "descending"),
                               ("event_id", "ascending")]).slice(0, k)
        return group.append_column(
            "rank", pa.array(np.arange(1, group.num_rows + 1), pa.int64()))

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(topk, batch_format="pyarrow"))


def users_active_both_halves(sf_dir: str, split: str = "2024-01-16") -> "ray.data.Dataset":
    """INTERSECT of the active-user sets of two time ranges, without
    materializing either set: per-batch partial (user, seen_before,
    seen_after) flags -> groupby Max -> filter both."""
    from ray.data.aggregate import Max

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    split_ts = pa.scalar(pd.Timestamp(split), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        before = pc.cast(pc.less(batch.column("ts"), split_ts), pa.int8())
        t = pa.table({"user_id": batch.column("user_id"),
                      "before": before,
                      "after": pc.subtract(pa.scalar(1, pa.int8()), before)})
        g = t.group_by("user_id").aggregate([("before", "max"),
                                             ("after", "max")])
        return g.rename_columns(["user_id", "before", "after"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Max("before", alias_name="before"),
                        Max("after", alias_name="after")))

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch.column("before"), 1),
                       pc.equal(batch.column("after"), 1))
        return pa.table({"user_id": batch.column("user_id").filter(keep)})

    return agg.map_batches(finish, batch_format="pyarrow")


def doc_hash_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic 1/16 hash sample: keep docs whose md5(doc_id) starts
    with '0'.  Content-hash sampling is reproducible across engines and
    cluster sizes (unlike random_sample), so the SQL twin matches exactly."""
    import hashlib

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = pa.array([hashlib.md5(str(d).encode()).hexdigest()[0] == "0"
                         for d in ids], pa.bool_())
        batch = batch.filter(keep)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": pc.utf8_length(batch.column("text"))})

    return ds.map_batches(sample, batch_format="pyarrow")


def value_percentiles_by_type(sf_dir: str,
                              qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> "ray.data.Dataset":
    """Exact discrete percentiles per event_type WITHOUT a global sort:
    per-batch histogram over integer cents (bounded domain) -> groupby
    (type, cent) Sum -> per-type cumulative walk.  Scales because the
    shuffle carries only |types|×|distinct cents| rows regardless of row
    count; the ANSI twin is percentile_disc (sorted[ceil(q*n)-1])."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "value_c": _cents(batch.column("value"))})
        g = t.group_by(["event_type", "value_c"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "value_c", "partial_n"])

    # ONE shuffle: per-block histogram partials go straight to the
    # per-type group, which merges them during its cumulative walk (a
    # value_c repeated across blocks contributes multiple rows — the
    # value-ordered cumsum absorbs duplicates without an extra
    # (type, cent) pre-aggregation exchange).  Shuffle volume stays
    # |blocks| x |types| x |distinct cents per block|.
    agg = ds.map_batches(hist, batch_format="pyarrow")

    def percentiles(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("value_c"))
        vals = group.column("value_c").take(order).to_numpy()
        counts = group.column("partial_n").take(order).to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        out = {"event_type": [group.column("event_type")[0].as_py()]}
        for q in qs:
            target = int(np.ceil(q * total))  # percentile_disc rank
            idx = int(np.searchsorted(cum, target))
            out[f"p{int(q*100)}"] = [float(vals[idx]) / 100.0]
        return pa.Table.from_pydict(out)

    return agg.groupby("event_type").map_groups(percentiles,
                                                batch_format="pyarrow")


def purchase_prev_click_asof(sf_dir: str) -> "ray.data.Dataset":
    """AS-OF join: for every 'purchase' event, the most recent prior
    'click' by the same user — an operator Ray Data lacks, expressed as
    one shuffle: tag both sides in-batch, groupby(user), per-group sort +
    np.searchsorted.  Inner semantics (purchases with no prior click drop).
    Gap is exact integer microseconds so the DuckDB ASOF twin hash-matches.

    Partitioning assumption: one user's rows fit in one group (true for
    event streams keyed by actor; salt the key if a single user exceeds a
    worker's heap)."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["purchase", "click"]))
        batch = batch.filter(keep)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "is_left": pc.equal(batch.column("event_type"), "purchase"),
        })

    def asof(group: pa.Table) -> pa.Table:
        left = group.filter(group.column("is_left"))
        right = group.filter(pc.invert(group.column("is_left")))
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "prev_click_id": pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        # event_id tiebreak: two clicks at the same ts must resolve the same
        # way regardless of shuffle arrival order into the group
        right = right.sort_by([("ts_us", "ascending"),
                               ("event_id", "ascending")])
        r_ts = right.column("ts_us").to_numpy()
        r_id = right.column("event_id").to_numpy()
        l_ts = left.column("ts_us").to_numpy()
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        hit = idx >= 0
        if not hit.any():
            return empty
        return pa.table({
            "event_id": pa.array(left.column("event_id").to_numpy()[hit]),
            "user_id": pa.array(left.column("user_id").to_numpy()[hit]),
            "prev_click_id": pa.array(r_id[idx[hit]]),
            "gap_us": pa.array(l_ts[hit] - r_ts[idx[hit]]),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(asof, batch_format="pyarrow"))


def events_value_bands(sf_dir: str, band_width: float = 100.0) -> "ray.data.Dataset":
    """Range join: events matched to value bands [lo, hi) — a non-equi
    join expressed as a broadcast range lookup (np.searchsorted against the
    sorted band edges inside every task; the band table is tiny and never
    shuffled), then the usual partial-combine groupby."""
    edges = np.arange(0.0, 500.0 + band_width, band_width)
    labels = ["[%d,%d)" % (edges[i], edges[i + 1])
              for i in range(len(edges) - 1)]
    side = ray.put((edges, np.array(labels, dtype=object)))

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        ed, lab = ray.get(side)
        v = batch.column("value").to_numpy()
        idx = np.searchsorted(ed, v, side="right") - 1
        keep = (idx >= 0) & (idx < len(lab))
        t = pa.table({"band": pa.array(lab[idx[keep]], pa.string()),
                      "value_c": _cents(pa.array(v[keep]))})
        g = t.group_by("band").aggregate([("value_c", "sum"),
                                          ("value_c", "count")])
        return g.rename_columns(["band", "partial_c", "partial_n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("band")
             .aggregate(Sum("partial_n", alias_name="n_events"),
                        Sum("partial_c", alias_name="sum_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "band": batch.column("band"),
            "n_events": batch.column("n_events"),
            "sum_value": pc.divide(
                pc.cast(batch.column("sum_c"), pa.float64(), safe=False), 100.0),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def engaged_users_union(sf_dir: str, min_value: float = 400.0) -> "ray.data.Dataset":
    """Set UNION via ``Dataset.union``: users who purchased OR generated a
    high-value event — two filtered streams concatenated (union in Ray Data
    is a plan-level concat, no shuffle), deduplicated by one groupby."""
    base = sized_read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["user_id", "event_type", "value"])

    def purchasers(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("event_type"), "purchase")
        return pa.table({"user_id":
                         pc.unique(batch.column("user_id").filter(keep))})

    def high_value(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("value"), min_value)
        return pa.table({"user_id":
                         pc.unique(batch.column("user_id").filter(keep))})

    a = base.map_batches(purchasers, batch_format="pyarrow")
    b = base.map_batches(high_value, batch_format="pyarrow")
    return (a.union(b)
             .groupby("user_id")
             .aggregate(Count(alias_name="_n"))
             .select_columns(["user_id"]))


def big_orders(sf_dir: str, qty_threshold: int = 300,
               ) -> "ray.data.Dataset":
    """TPC-H Q18-shaped (large-volume orders): aggregate lineitem per
    order, keep orders whose total quantity exceeds the threshold (the
    HAVING filter), then join the surviving keys back to orders +
    customer — the aggregate-filter -> semi-join-back shape the suite
    didn't cover elsewhere.

    Scale shape: the per-order quantity sum is partial-combined per batch
    before its ONE shuffle; the post-HAVING key set is heavy-hitters-only
    (bounded by construction — at any corpus size only orders with > 
    threshold total quantity survive), so it broadcasts and the join back
    to orders/customer is shuffle-free.  Quantities sum in exact cents."""
    from ray.data.aggregate import Sum

    from ..functions.joins import broadcast_join, read_small_table

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "qty_c": _cents(batch.column("l_quantity"))})
        g = t.group_by("l_orderkey").aggregate([("qty_c", "sum")])
        return g.rename_columns(["l_orderkey", "partial_qty_c"])

    # coarse-grouped Arrow aggregate: ~150k distinct orders at sf0.1 made
    # Dataset.aggregate's per-group reduce the whole query's cost (10.6 s
    # measured; 1.5 s after the switch, identical rows)
    from ..functions.agg import coarse_grouped_aggregate
    totals = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        "l_orderkey", [("partial_qty_c", "sum", "qty_c")])

    def having(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch.column("qty_c"), qty_threshold * 100))

    # bounded by the HAVING contract: only heavy-hitter orders survive.
    # dataset_to_table (NOT to_pandas): an empty HAVING result must keep
    # its schema or the broadcast join KeyErrors on l_orderkey
    from ..functions.joins import dataset_to_table
    big = dataset_to_table(
        totals.map_batches(having, batch_format="pyarrow"))

    orders = sized_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    joined = broadcast_join(orders, big, on="o_orderkey",
                            right_on="l_orderkey", join_type="inner")
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])
    joined = broadcast_join(joined, cust, on="o_custkey",
                            right_on="c_custkey", join_type="inner")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": batch.column("c_name"),
            "c_custkey": batch.column("o_custkey"),
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "o_totalprice": batch.column("o_totalprice"),
            "total_qty": pc.divide(
                pc.cast(batch.column("qty_c"), pa.float64(), safe=False), 100.0),
        })

    # typed empty seed: no order past the HAVING threshold yields zero
    # rows and Ray drops the schema; the union pins it
    seed = pa.table({"c_name": pa.array([], pa.string()),
                     "c_custkey": pa.array([], pa.int64()),
                     "o_orderkey": pa.array([], pa.int64()),
                     "o_orderdate": pa.array([], pa.timestamp("us")),
                     "o_totalprice": pa.array([], pa.float64()),
                     "total_qty": pa.array([], pa.float64())})
    return ray.data.from_arrow(seed).union(
        joined.map_batches(project, batch_format="pyarrow"))


def nation_trade_volume(sf_dir: str,
                        nation_pair: "tuple | None" = None,
                        num_partitions: "int | None" = None,
                        ) -> "ray.data.Dataset":
    """TPC-H Q7-shaped (volume shipping between nations): lineitem ⨝
    orders (the size-ruled join), then broadcast supplier-nation and
    customer-nation dimensions, keep cross-nation rows only, and roll up
    revenue per (supp_nation, cust_nation, year) — temporal extraction
    (``pc.year``) inside a join rollup, partial-combined per batch.

    ``nation_pair``: restrict to two named nations (the literal Q7 form);
    None computes the full cross-nation trade matrix (the synthetic
    corpus is too small for any single pair to trade at every scale)."""
    import pyarrow.dataset as pads

    from ..functions.joins import broadcast_join, read_small_table

    nfilter = (pads.field("n_name").isin(list(nation_pair))
               if nation_pair else None)
    nations = read_small_table(f"{sf_dir}/nation.parquet",
                               columns=["n_nationkey", "n_name"],
                               filter=nfilter)
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]) \
        .join(nations, keys="s_nationkey", right_keys="n_nationkey") \
        .select(["s_suppkey", "n_name"]).rename_columns(
            ["s_suppkey", "supp_nation"])
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"]) \
        .join(nations, keys="c_nationkey", right_keys="n_nationkey") \
        .select(["c_custkey", "n_name"]).rename_columns(
            ["c_custkey", "cust_nation"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_suppkey",
                                       "l_extendedprice", "l_discount"])
    # suppliers of the two nations first: shrinks the big side before the
    # orderkey join
    line = broadcast_join(line, supp, on="l_suppkey", right_on="s_suppkey",
                          join_type="inner")
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_custkey", "o_orderdate"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    joined = broadcast_join(joined, cust, on="o_custkey",
                            right_on="c_custkey", join_type="inner")

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("supp_nation"),
                            batch.column("cust_nation"))
        batch = batch.filter(keep)
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        t = pa.table({
            "supp_nation": batch.column("supp_nation"),
            "cust_nation": batch.column("cust_nation"),
            "yr": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64()),
            "rev_c": rev_c,
        })
        g = t.group_by(["supp_nation", "cust_nation", "yr"]).aggregate(
            [("rev_c", "sum"), ("rev_c", "count")])
        return g.rename_columns(["supp_nation", "cust_nation", "yr",
                                 "partial_rev_c", "partial_n"])

    # coarse-grouped final rollup hashing the full key tuple: no single key
    # is high-cardinality (25 nations, ~7 years), but the tuple space is
    # 4200 groups — the native Aggregate spent ~1.9 s on these tiny
    # partials where the Arrow-kernel bucket reduce spends ~0.4 s
    from ..functions.agg import coarse_grouped_aggregate
    agg = coarse_grouped_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "yr"],
        [("partial_rev_c", "sum", "rev_c"), ("partial_n", "sum", "n_items")],
        hash_cols=["supp_nation", "cust_nation", "yr"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": batch.column("supp_nation"),
            "cust_nation": batch.column("cust_nation"),
            "yr": batch.column("yr"),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
            "n_items": batch.column("n_items"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# TPC-H Q19's three disjuncts, re-expressed on this schema's columns
# (p_brand, p_size, l_quantity); shared by engine and SQL twin.
Q19_DISJUNCTS = (
    ("Brand#12", 1, 15, 1.0, 11.0),
    ("Brand#23", 1, 25, 10.0, 20.0),
    ("Brand#3", 1, 50, 20.0, 30.0),
)


def brand_disjunction_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q19-shaped: revenue under an OR-of-ANDs multi-attribute
    predicate spanning both join sides (brand x size-band x quantity-band).

    The disjunction's part-side prefix (the brand set) is pushed into the
    BROADCAST read, so only candidate parts ship to workers and the inner
    broadcast probe discards every non-candidate lineitem row before the
    quantity bands evaluate; the OR-of-ANDs itself is three vectorized
    AND-chains per batch.  One tiny brand groupby finishes — the big table
    is scanned once and never shuffled."""
    import pyarrow.dataset as pads

    from ..functions.joins import broadcast_join, read_small_table

    brands = [d[0] for d in Q19_DISJUNCTS]
    part = read_small_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"],
        filter=pads.field("p_brand").isin(brands))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_quantity",
                                       "l_extendedprice", "l_discount"])
    joined = broadcast_join(line, part, on="l_partkey", right_on="p_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"p_brand": pa.array([], pa.string()),
                          "n_p": pa.array([], pa.int64()),
                          "rev_p": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        brand = batch.column("p_brand")
        size = batch.column("p_size")
        qty = batch.column("l_quantity")
        keep = pa.array(np.zeros(batch.num_rows, bool))
        for b, s_lo, s_hi, q_lo, q_hi in Q19_DISJUNCTS:
            d = pc.and_(
                pc.and_(pc.equal(brand, b),
                        pc.and_(pc.greater_equal(size, s_lo),
                                pc.less_equal(size, s_hi))),
                pc.and_(pc.greater_equal(qty, q_lo),
                        pc.less_equal(qty, q_hi)))
            keep = pc.or_(keep, d)
        hit = batch.filter(keep)
        if hit.num_rows == 0:
            return empty
        rev_c = _cents(pc.multiply(hit.column("l_extendedprice"),
                                   pc.subtract(1.0, hit.column("l_discount"))))
        g = (pa.table({"p_brand": hit.column("p_brand"), "rev_c": rev_c})
             .group_by("p_brand")
             .aggregate([("rev_c", "sum"), ([], "count_all")]))
        return g.rename_columns(["p_brand", "rev_p", "n_p"]) \
                .select(["p_brand", "n_p", "rev_p"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": batch.column("p_brand"),
            "n_items": batch.column("n_items"),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
        })

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("p_brand")
                  .aggregate(Sum("n_p", alias_name="n_items"),
                             Sum("rev_p", alias_name="rev_c"))
                  .map_batches(finish, batch_format="pyarrow"))


def ship_latency_percentiles(sf_dir: str,
                             qs: tuple = (0.5, 0.9, 0.99),
                             num_partitions: "int | None" = None
                             ) -> "ray.data.Dataset":
    """Order-to-ship latency percentiles per order priority — the SLA
    dashboard shape: a join-derived metric (ship date minus order date in
    days) reduced to exact discrete percentiles WITHOUT a global sort.

    lineitem joins orders via the size-based join rule (broadcast at bench
    scale, hash-partitioned past the byte ceiling), each post-join batch
    collapses to a (priority, latency_day) histogram, and the per-priority
    cumulative walk finds percentile_disc ranks.  The day domain is
    bounded (~thousands of distinct values), so the shuffle carries
    |priorities| x |days| rows per block regardless of corpus size.
    Timestamps are midnight-aligned, so integer-us division IS
    date_diff('day', ...) exactly — negative latencies included."""
    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"])
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    day_us = 86_400_000_000

    def hist(batch: pa.Table) -> pa.Table:
        lat = pc.divide(
            pc.subtract(batch.column("l_shipdate").cast(pa.int64()),
                        batch.column("o_orderdate").cast(pa.int64())),
            day_us)
        t = pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "lat_d": lat})
        g = t.group_by(["o_orderpriority", "lat_d"]) \
             .aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "lat_d", "partial_n"])

    def percentiles(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("lat_d"))
        vals = group.column("lat_d").take(order).to_numpy()
        counts = group.column("partial_n").take(order).to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        out = {"o_orderpriority":
               [group.column("o_orderpriority")[0].as_py()]}
        for q in qs:
            target = int(np.ceil(q * total))       # percentile_disc rank
            idx = int(np.searchsorted(cum, target))
            out[f"p{int(q * 100)}_days"] = pa.array([int(vals[idx])],
                                                    pa.int64())
        return pa.Table.from_pydict(out)

    return (joined.map_batches(hist, batch_format="pyarrow")
                  .groupby("o_orderpriority")
                  .map_groups(percentiles, batch_format="pyarrow"))


def customer_value_deciles(sf_dir: str) -> "ray.data.Dataset":
    """Quantile binning — every customer assigned a global spend decile
    (the ML feature-bucketing shape): per-customer exact-cents order
    totals, global percentile_disc(0.1..0.9) thresholds, then a pure
    broadcast-threshold map.  Equal totals always land in the same decile
    (unlike ntile's row-split).

    Scale shape: the high-cardinality per-customer rollup goes through
    ``coarse_grouped_aggregate``; thresholds come from a value-count
    histogram whose driver pull is bounded by |distinct totals| (<=
    customers — for a truly unbounded value domain quantize the histogram
    key first, the documented trade of quality_percentile_filter); the
    decile assignment is a vectorized searchsorted against 9 broadcast
    ints."""
    from ..functions.agg import coarse_grouped_aggregate

    ds = sized_read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"custkey": batch.column("o_custkey"),
                      "total_c": _cents(batch.column("o_totalprice"))})
        g = t.group_by("custkey").aggregate([("total_c", "sum")])
        return g.rename_columns(["custkey", "partial_c"])

    totals = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "custkey", [("partial_c", "sum", "total_c")]).materialize()

    def hist(batch: pa.Table) -> pa.Table:
        g = batch.select(["total_c"]).group_by("total_c") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["total_c", "partial_n"])

    counts = coarse_grouped_aggregate(
        totals.map_batches(hist, batch_format="pyarrow"),
        "total_c", [("partial_n", "sum", "n")]).take_all()
    if not counts:
        return ray.data.from_arrow(pa.table({
            "custkey": pa.array([], pa.int64()),
            "total_value": pa.array([], pa.float64()),
            "decile": pa.array([], pa.int64())}))
    counts.sort(key=lambda r: r["total_c"])
    vals = np.array([r["total_c"] for r in counts], dtype=np.int64)
    cum = np.cumsum(np.array([r["n"] for r in counts], dtype=np.int64))
    total = int(cum[-1])
    thr = np.array(
        [vals[int(np.searchsorted(cum, int(np.ceil(q / 10.0 * total))))]
         for q in range(1, 10)], dtype=np.int64)   # percentile_disc ranks

    def assign(batch: pa.Table) -> pa.Table:
        tc = batch.column("total_c").to_numpy(zero_copy_only=False)
        decile = 1 + np.searchsorted(thr, tc, side="left")
        return pa.table({
            "custkey": batch.column("custkey"),
            "total_value": pc.divide(
                pc.cast(batch.column("total_c"), pa.float64(), safe=False), 100.0),
            "decile": pa.array(decile.astype(np.int64), pa.int64()),
        })

    return totals.map_batches(assign, batch_format="pyarrow")


def market_share(sf_dir: str, region: str = "ASIA",
                 part_type: str = "STANDARD",
                 target_nation: str = "NATION_3",
                 num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """TPC-H Q8-shaped (national market share): the target nation's share
    of revenue per year, within one region's market for one part type.

    Scale shape: the selective part-type filter broadcasts FIRST so the
    only large exchange (lineitem ⨝ orders) moves a pre-shrunk fact side;
    the region restriction is a broadcast semi join on the customer key
    set; supplier nation names ride a broadcast dimension.  The share is
    a conditional-sum / total-sum ratio on exact integer cents, rounded
    with the shared DuckDB-bit-identical ``round6``."""
    import pyarrow.dataset as pads

    from ..functions.joins import broadcast_join, read_small_table
    from ..functions.num import round6

    part = read_small_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"],
                            filter=pads.field("p_type") == part_type)
    nation = read_small_table(f"{sf_dir}/nation.parquet")
    region_t = read_small_table(f"{sf_dir}/region.parquet",
                                filter=pads.field("r_name") == region)
    # pyarrow Table.join defaults to LEFT OUTER — the region restriction
    # must be an inner join or every nation passes with a null region
    nat_in_region = nation.join(region_t, keys="n_regionkey",
                                right_keys="r_regionkey",
                                join_type="inner") \
        .select(["n_nationkey"])
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"]) \
        .join(nat_in_region, keys="c_nationkey", right_keys="n_nationkey",
              join_type="left semi").select(["c_custkey"])
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]) \
        .join(nation.select(["n_nationkey", "n_name"]),
              keys="s_nationkey", right_keys="n_nationkey") \
        .select(["s_suppkey", "n_name"]) \
        .rename_columns(["s_suppkey", "supp_nation"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey",
                                       "l_orderkey", "l_extendedprice",
                                       "l_discount"])
    line = broadcast_join(line, part, on="l_partkey", right_on="p_partkey",
                          join_type="left semi")
    from ..functions.joins import sized_join
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_custkey", "o_orderdate"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    joined = broadcast_join(joined, cust, on="o_custkey",
                            right_on="c_custkey", join_type="left semi")
    joined = broadcast_join(joined, supp, on="l_suppkey",
                            right_on="s_suppkey")

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        tgt = pc.equal(batch.column("supp_nation"), target_nation)
        tgt_c = pc.if_else(tgt, rev_c, pa.scalar(0, pa.int64()))
        t = pa.table({
            "yr": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64()),
            "rev_c": rev_c, "tgt_c": tgt_c})
        g = t.group_by("yr").aggregate([("rev_c", "sum"), ("tgt_c", "sum")])
        return g.rename_columns(["yr", "partial_rev", "partial_tgt"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby("yr")
                 .aggregate(Sum("partial_rev", alias_name="rev_c"),
                            Sum("partial_tgt", alias_name="tgt_c")))

    def finish(batch: pa.Table) -> pa.Table:
        rev = pc.cast(batch.column("rev_c"), pa.float64(), safe=False)
        tgt = pc.cast(batch.column("tgt_c"), pa.float64(), safe=False)
        return pa.table({
            "yr": batch.column("yr"),
            "mkt_share": round6(pc.divide(tgt, rev)),
            "total_revenue": pc.divide(rev, 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def product_type_profit(sf_dir: str, name_token: str = "red",
                        num_partitions: "int | None" = None
                        ) -> "ray.data.Dataset":
    """TPC-H Q9-shaped (product type profit): per (supplier nation, year)
    profit over parts whose name contains ``name_token``, with
    ``p_retailprice * quantity`` standing in for the reference schema's
    ``ps_supplycost`` (this corpus has no partsupp table).

    Profit per row is computed as ONE double expression —
    ``extprice*(1-disc) - retailprice*qty`` — then floored to integer
    cents, so the parallel sum is exact and bit-identical to the SQL
    twin's identically-shaped expression."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import (broadcast_join, read_small_table,
                                   sized_join)

    part = read_small_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name",
                                     "p_retailprice"])
    part = part.filter(pc.match_substring(part.column("p_name"),
                                          name_token)) \
        .select(["p_partkey", "p_retailprice"])
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]) \
        .join(nation, keys="s_nationkey", right_keys="n_nationkey") \
        .select(["s_suppkey", "n_name"]) \
        .rename_columns(["s_suppkey", "supp_nation"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey",
                                       "l_orderkey", "l_quantity",
                                       "l_extendedprice", "l_discount"])
    line = broadcast_join(line, part, on="l_partkey", right_on="p_partkey")
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderdate"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    joined = broadcast_join(joined, supp, on="l_suppkey",
                            right_on="s_suppkey")

    def partial(batch: pa.Table) -> pa.Table:
        amount = pc.subtract(
            pc.multiply(batch.column("l_extendedprice"),
                        pc.subtract(1.0, batch.column("l_discount"))),
            pc.multiply(batch.column("p_retailprice"),
                        batch.column("l_quantity")))
        profit_c = pc.cast(pc.floor(pc.multiply(amount, 100.0)), pa.int64())
        t = pa.table({
            "supp_nation": batch.column("supp_nation"),
            "yr": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64()),
            "profit_c": profit_c})
        g = t.group_by(["supp_nation", "yr"]).aggregate(
            [("profit_c", "sum"), ("profit_c", "count")])
        return g.rename_columns(["supp_nation", "yr",
                                 "partial_c", "partial_n"])

    # ~25 nations x ~7 years: hash the full key tuple so the coarse
    # buckets spread over the combined cardinality (nation_trade_volume's
    # measured rationale)
    agg = coarse_grouped_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["supp_nation", "yr"],
        [("partial_c", "sum", "profit_c"), ("partial_n", "sum", "n_items")],
        hash_cols=["supp_nation", "yr"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": batch.column("supp_nation"),
            "yr": batch.column("yr"),
            "profit": pc.divide(
                pc.cast(batch.column("profit_c"), pa.float64(), safe=False), 100.0),
            "n_items": batch.column("n_items"),
        })

    # typed empty seed: a name filter matching no parts yields zero rows
    # and Ray drops the schema; the union pins it
    seed = pa.table({"supp_nation": pa.array([], pa.string()),
                     "yr": pa.array([], pa.int64()),
                     "profit": pa.array([], pa.float64()),
                     "n_items": pa.array([], pa.int64())})
    return ray.data.from_arrow(seed).union(
        agg.map_batches(finish, batch_format="pyarrow"))


def returned_item_revenue(sf_dir: str, lo: str = "1997-07-01",
                          hi: str = "1997-10-01", n: int = 20,
                          num_partitions: "int | None" = None
                          ) -> "ray.data.Dataset":
    """TPC-H Q10-shaped (returned item reporting): top-n customers by
    revenue lost to returned items ('R' lineitems against orders placed in
    one quarter).

    Both fact sides are filtered per batch BEFORE the single
    large×large join (return flag on lineitem, the quarter window on
    orders); revenue rolls up per customer through the coarse Arrow
    aggregate (one group per qualifying customer — high cardinality),
    then customer name + nation attach by broadcast and a deterministic
    (revenue desc, custkey asc) top-n closes the query."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table

    lo_ts = pa.scalar(pd.Timestamp(lo), pa.timestamp("us"))
    hi_ts = pa.scalar(pd.Timestamp(hi), pa.timestamp("us"))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_extendedprice",
                                       "l_discount", "l_returnflag"])

    def returned(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("l_returnflag"), "R")
        return batch.filter(keep).select(
            ["l_orderkey", "l_extendedprice", "l_discount"])

    line = line.map_batches(returned, batch_format="pyarrow")

    orders_path = f"{sf_dir}/orders.parquet"
    orders_cols = ["o_orderkey", "o_custkey", "o_orderdate"]
    empty_out = pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "c_acctbal": pa.array([], pa.float64()),
        "nation": pa.array([], pa.string()),
        "revenue": pa.array([], pa.float64())})

    from ..functions.joins import pruned_parquet_bytes
    if pruned_parquet_bytes(orders_path, orders_cols) <= _BROADCAST_BYTES:
        # q3's size rule: the quarter window is a pushed-down read of a
        # side that fits in memory — ONE broadcast join, no shuffle (the
        # shuffle-join path below was also bench-fragile: 15-22 s inside
        # the full 94-query suite vs 2-4 s standalone, some interaction
        # with object-store pressure from the media queries)
        import pyarrow.dataset as pads
        o_tbl = pads.dataset(orders_path).to_table(
            columns=["o_orderkey", "o_custkey"],
            filter=(pads.field("o_orderdate") >= pd.Timestamp(lo))
                 & (pads.field("o_orderdate") < pd.Timestamp(hi)))
        if o_tbl.num_rows == 0:
            return ray.data.from_arrow(empty_out)
        joined = broadcast_join(line, o_tbl, on="l_orderkey",
                                right_on="o_orderkey")
    else:
        orders = sized_read_parquet(orders_path, columns=orders_cols)

        def window(batch: pa.Table) -> pa.Table:
            od = batch.column("o_orderdate")
            keep = pc.and_(pc.greater_equal(od, lo_ts), pc.less(od, hi_ts))
            return batch.filter(keep).select(["o_orderkey", "o_custkey"])

        # Ray's hash-shuffle join loses the key schema when a side is
        # entirely empty (the customers_without_orders guard); the
        # quarter-window side is this branch's smaller side, so
        # materializing it for the emptiness probe is bounded — it is the
        # join's shuffle payload anyway.
        orders = orders.map_batches(window,
                                    batch_format="pyarrow").materialize()
        if orders.count() == 0:
            return ray.data.from_arrow(empty_out)
        joined = line.join(orders, join_type="inner",
                           num_partitions=_join_partitions(num_partitions),
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "rev_c": rev_c})
        g = t.group_by("o_custkey").aggregate([("rev_c", "sum")])
        return g.rename_columns(["o_custkey", "partial_c"])

    agg = coarse_grouped_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], [("partial_c", "sum", "rev_c")])

    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name",
                                     "c_nationkey", "c_acctbal"]) \
        .join(nation, keys="c_nationkey", right_keys="n_nationkey") \
        .select(["c_custkey", "c_name", "c_acctbal", "n_name"])
    agg = broadcast_join(agg, cust, on="o_custkey", right_on="c_custkey")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("o_custkey"),
            "c_name": batch.column("c_name"),
            "c_acctbal": batch.column("c_acctbal"),
            "nation": batch.column("n_name"),
            "revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
        })

    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(["revenue", "c_custkey"], descending=[True, False])
               .limit(n))


def order_count_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13-shaped (customer distribution): how many customers placed
    exactly N orders, INCLUDING the zero-order bucket.

    Scale shape: the distribution never joins customer x orders — orders
    alone rolls up per custkey (partial combine + coarse aggregate), the
    per-customer counts roll up again into the tiny (n_orders ->
    n_customers) histogram, and the zero bucket is closed-form:
    ``count(customer) - count(custkeys seen in orders)``, both bounded
    scalars (the first is parquet metadata, the second sums the
    histogram itself).  Relies on FK integrity (every o_custkey exists in
    customer — verified on this corpus), which the SQL twin's LEFT JOIN
    enforces structurally."""
    import pyarrow.dataset as pads

    from ..functions.agg import coarse_grouped_aggregate

    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([([], "count_all")])
        return g.rename_columns(["o_custkey", "partial_n"])

    per_cust = coarse_grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], [("partial_n", "sum", "n_orders")])

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"n_orders": batch.column("n_orders")}) \
            .group_by("n_orders").aggregate([([], "count_all")])
        return g.rename_columns(["n_orders", "partial_c"])

    hist = (per_cust.map_batches(hist_partial, batch_format="pyarrow")
                    .groupby("n_orders")
                    .aggregate(Sum("partial_c", alias_name="n_customers")))

    # the histogram is tiny (one row per distinct order COUNT); the driver
    # pull is bounded by max orders-per-customer, not by data size
    rows = hist.take_all()
    n_with = sum(r["n_customers"] for r in rows)
    n_total = pads.dataset(f"{sf_dir}/customer.parquet").count_rows()
    out = {"n_orders": [int(r["n_orders"]) for r in rows],
           "n_customers": [int(r["n_customers"]) for r in rows]}
    if n_total - n_with > 0:
        out["n_orders"].append(0)
        out["n_customers"].append(int(n_total - n_with))
    return ray.data.from_arrow(pa.table({
        "n_orders": pa.array(out["n_orders"], pa.int64()),
        "n_customers": pa.array(out["n_customers"], pa.int64())}))


def top_supplier(sf_dir: str, lo: str = "1997-01-01",
                 hi: str = "1997-04-01") -> "ray.data.Dataset":
    """TPC-H Q15-shaped (top supplier): the supplier(s) with maximum
    revenue over one quarter of ship dates (ties all returned, like the
    reference's view + subquery-max form).

    Scale shape: lineitem is read once (pruned, window-filtered per
    batch), partial-combines per suppkey, coarse-aggregates into one row
    per active supplier, and that bounded per-supplier table is
    MATERIALIZED once so the scalar max and the equality filter reuse it
    without recompute; names attach by broadcast."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table

    lo_ts = pa.scalar(pd.Timestamp(lo), pa.timestamp("us"))
    hi_ts = pa.scalar(pd.Timestamp(hi), pa.timestamp("us"))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_suppkey", "l_extendedprice",
                                       "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(sd, lo_ts), pc.less(sd, hi_ts))
        batch = batch.filter(keep)
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        g = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "rev_c": rev_c}) \
            .group_by("l_suppkey").aggregate([("rev_c", "sum")])
        return g.rename_columns(["l_suppkey", "partial_c"])

    per_supp = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"], [("partial_c", "sum", "rev_c")]).materialize()

    from ray.data.aggregate import Max
    mx = per_supp.aggregate(Max("rev_c", alias_name="mx"))
    mx_c = (mx or {}).get("mx")
    if mx_c is None:                          # empty window / empty table
        return ray.data.from_arrow(pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue": pa.array([], pa.float64())}))

    winners = per_supp.filter(
        expr=f"rev_c == {int(mx_c)}")
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"])
    winners = broadcast_join(winners, supp, on="l_suppkey",
                             right_on="s_suppkey")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": batch.column("l_suppkey"),
            "s_name": batch.column("s_name"),
            "total_revenue": pc.divide(
                pc.cast(batch.column("rev_c"), pa.float64(), safe=False), 100.0),
        })

    return winners.map_batches(finish, batch_format="pyarrow")


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#12",
                           frac: float = 0.2) -> "ray.data.Dataset":
    """TPC-H Q17-shaped (small-quantity-order revenue): average yearly
    revenue lost if orders below ``frac`` x the part's average quantity
    were not filled, over one brand's parts.

    The aggregate-then-rejoin-to-fact shape: pass 1 computes per-part
    average quantity for the brand's parts (semi-joined at the batch
    level, partial-combined, coarse-aggregated — bounded by the brand's
    part count); the thresholds BROADCAST back over pass 2's scan, which
    keeps below-threshold rows and sums exact cents.  The threshold
    double is computed with the identical operation order as the SQL twin
    (sum_cents -> /100.0 -> /count -> *frac), so the comparison is
    bit-deterministic."""
    import numpy as np

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table

    part = read_small_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand"])
    part = part.filter(pc.equal(part.column("p_brand"), brand)) \
               .select(["p_partkey"])

    line_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=line_cols)
    branded = broadcast_join(line, part, on="l_partkey",
                             right_on="p_partkey", join_type="left semi")

    def qty_partial(batch: pa.Table) -> pa.Table:
        qty_c = _cents(batch.column("l_quantity"))
        g = pa.table({"l_partkey": batch.column("l_partkey"),
                      "qty_c": qty_c}) \
            .group_by("l_partkey").aggregate([("qty_c", "sum"),
                                              ("qty_c", "count")])
        return g.rename_columns(["l_partkey", "partial_q", "partial_n"])

    per_part = coarse_grouped_aggregate(
        branded.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_partkey"], [("partial_q", "sum", "sum_q"),
                        ("partial_n", "sum", "n")])

    # threshold doubles compute DISTRIBUTED (same op order as the twin:
    # sum_cents -> /100.0 -> /count -> *frac, elementwise); the driver
    # then pulls only the aggregated 2-column Arrow table — one row per
    # part OF ONE BRAND, the broadcast side of the rejoin (at 100 TB this
    # is the small side by contract; even a million-part brand is ~16 MB
    # of Arrow, never Python row objects)
    def thr_map(batch: pa.Table) -> pa.Table:
        sum_q = batch.column("sum_q").to_numpy().astype(np.float64)
        n = batch.column("n").to_numpy().astype(np.float64)
        return pa.table({
            "l_partkey": batch.column("l_partkey"),
            "thr": pa.array(frac * (sum_q / 100.0 / n), pa.float64())})

    thr_tab = pa.concat_tables(
        [pa.table({"l_partkey": pa.array([], pa.int64()),
                   "thr": pa.array([], pa.float64())})]
        + list(per_part.map_batches(thr_map, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")))
    pk = thr_tab.column("l_partkey").to_numpy().astype(np.int64)
    thr = thr_tab.column("thr").to_numpy()
    order = np.argsort(pk)
    pk, thr = pk[order], thr[order]
    pk_ref = ray.put(pk)
    thr_ref = ray.put(thr)

    def below(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)               # sorted partkeys (broadcast)
        ths = ray.get(thr_ref)
        lp = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            mask = np.zeros(len(lp), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(keys, lp), len(keys) - 1)
            qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
            mask = (keys[pos] == lp) & (qty < ths[pos])
        kept = batch.filter(pa.array(mask))
        rev_c = _cents(kept.column("l_extendedprice"))
        return pa.table({
            "partial_c": pa.array([pc.sum(rev_c).as_py() or 0], pa.int64()),
            "partial_n": pa.array([kept.num_rows], pa.int64())})

    agg = (line.map_batches(below, batch_format="pyarrow")
               .aggregate(Sum("partial_c", alias_name="rev_c"),
                          Sum("partial_n", alias_name="n_rows")))
    rev_c = (agg or {}).get("rev_c") or 0
    n_rows = (agg or {}).get("n_rows") or 0
    return ray.data.from_arrow(pa.table({
        "avg_yearly": pa.array([rev_c / 100.0 / 7.0], pa.float64()),
        "n_rows": pa.array([int(n_rows)], pa.int64())}))


def sole_late_supplier(sf_dir: str, late_days: int = 60, n: int = 20,
                       num_partitions: "int | None" = None
                       ) -> "ray.data.Dataset":
    """TPC-H Q21-shaped (suppliers who kept orders waiting): count, per
    supplier, the multi-supplier orders on which that supplier was the
    ONLY late shipper (ship date > order date + ``late_days``; this
    corpus has no receipt/commit dates, so lateness is relative to the
    order date).

    Scale shape — the per-ORDER multi-entity predicate without
    per-order dispatch: lineitem ⨝ orders is the one large exchange;
    each batch combines to distinct (orderkey, suppkey, any_late) rows
    (bounded by pairs per batch, not lineitems); ONE coarse
    orderkey-hash shuffle; inside each bucket a vectorized segment scan
    computes per-order distinct-supplier and late-supplier counts and
    picks the sole late supplier via sum(suppkey x late) — exact when
    the late count is 1.  Winners then roll up per supplier (tiny),
    names attach by broadcast."""
    from datetime import timedelta

    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.joins import broadcast_join, read_small_table, \
        sized_join

    nc = _default_num_coarse()
    late_delta = pa.scalar(timedelta(days=late_days))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_suppkey",
                                       "l_shipdate"])
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderdate"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)

    def pair_partial(batch: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(batch.column("l_shipdate"),
                                  pc.add(batch.column("o_orderdate"),
                                         late_delta)), pa.int64())
        t = pa.table({"ok": batch.column("l_orderkey"),
                      "sk": batch.column("l_suppkey"),
                      "late": late})
        g = t.group_by(["ok", "sk"]).aggregate([("late", "max")])
        g = g.rename_columns(["ok", "sk", "late"])
        okv = g.column("ok").to_numpy(zero_copy_only=False)
        return g.append_column(
            "__coarse", pa.array((okv * _GOLDEN) % nc, pa.int64()))

    empty_w = pa.table({"sk": pa.array([], pa.int64()),
                        "partial_w": pa.array([], pa.int64())})

    def finish(group: pa.Table) -> pa.Table:
        # re-combine pairs split across batches, then segment-scan orders
        g = group.select(["ok", "sk", "late"]) \
            .group_by(["ok", "sk"]).aggregate([("late", "max")]) \
            .rename_columns(["ok", "sk", "late"])
        g = g.take(pc.sort_indices(g, sort_keys=[("ok", "ascending"),
                                                 ("sk", "ascending")]))
        ok = g.column("ok").to_numpy(zero_copy_only=False)
        sk = g.column("sk").to_numpy(zero_copy_only=False)
        late = g.column("late").to_numpy(zero_copy_only=False)
        if len(ok) == 0:
            return empty_w
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        nsupp = np.diff(np.r_[starts, len(ok)]).astype(np.int64)
        nlate = np.add.reduceat(late, starts).astype(np.int64)
        late_sk_sum = np.add.reduceat(sk * late, starts).astype(np.int64)
        win = (nsupp >= 2) & (nlate == 1)
        if not win.any():
            return empty_w
        winners = late_sk_sum[win]           # == the sole late suppkey
        t = pa.table({"sk": pa.array(winners, pa.int64())})
        g2 = t.group_by("sk").aggregate([([], "count_all")])
        return g2.rename_columns(["sk", "partial_w"])

    winners = (joined.map_batches(pair_partial, batch_format="pyarrow")
                     .groupby("__coarse")
                     .map_groups(finish, batch_format="pyarrow"))
    agg = (winners.map_batches(lambda b: b if b.num_rows else empty_w,
                               batch_format="pyarrow")
                  .groupby("sk")
                  .aggregate(Sum("partial_w", alias_name="numwait")))

    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"])
    agg = broadcast_join(agg, supp, on="sk", right_on="s_suppkey")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch.column("sk"),
                         "s_name": batch.column("s_name"),
                         "numwait": batch.column("numwait")})

    # typed empty seed (pin_schema): zero qualifying suppliers must keep
    # the schema; identity map between limit and union (planner quirk)
    from ..functions.joins import pin_schema
    seed = pa.table({"s_suppkey": pa.array([], pa.int64()),
                     "s_name": pa.array([], pa.string()),
                     "numwait": pa.array([], pa.int64())})
    return pin_schema(
        seed,
        agg.map_batches(project, batch_format="pyarrow")
           .sort(["numwait", "s_suppkey"], descending=[True, False])
           .limit(n)
           .map_batches(lambda b: b, batch_format="pyarrow"))


def nation_balance_ranks(sf_dir: str) -> "ray.data.Dataset":
    """Partitioned window ranking — per customer, its rank / percent_rank /
    ntile(10) decile among its NATION's customers by account balance (the
    `rank() OVER (PARTITION BY ... ORDER BY ...)` shape Ray Data has no
    native operator for).

    Scale shape: ONE coarse nation-hash shuffle of the pruned customer
    rows; each bucket sorts once on (nation, acctbal, custkey) and computes
    all three window functions with numpy segment arithmetic (repeat /
    reduceat off the nation boundaries) — no per-nation dispatch.  The
    ordering key (acctbal, custkey) is a total order, so rank() equals
    row_number() and every output is deterministic.  A window partition
    (one nation) must fit one reduce task — the inherent contract of
    partitioned ranking; for heavier partition keys use the histogram/
    broadcast-threshold shape of customer_value_deciles instead.

    ntile follows SQL semantics: with n rows in the partition, the first
    n % 10 deciles get floor(n/10)+1 rows, the rest floor(n/10)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey",
                                     "c_acctbal"])

    empty = pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_nationkey": pa.array([], pa.int32()),
        "c_acctbal": pa.array([], pa.float64()),
        "rank_in_nation": pa.array([], pa.int64()),
        "pct_rank": pa.array([], pa.float64()),
        "decile": pa.array([], pa.int64()),
    })

    def tag(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((nk * _GOLDEN) % nc, pa.int64()))

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[
            ("c_nationkey", "ascending"), ("c_acctbal", "ascending"),
            ("c_custkey", "ascending")])
        g = group.take(idx)
        nk = g.column("c_nationkey").to_numpy()
        starts = np.flatnonzero(np.r_[True, nk[1:] != nk[:-1]])
        counts = np.diff(np.r_[starts, len(nk)])
        i = np.arange(len(nk), dtype=np.int64) - np.repeat(starts, counts)
        n = np.repeat(counts, counts).astype(np.int64)
        pct = np.where(n > 1, i / np.maximum(n - 1, 1), 0.0)
        base, rem = n // 10, n % 10
        head = rem * (base + 1)                     # rows in the fat deciles
        decile = np.where(
            i < head,
            i // (base + 1),
            rem + (i - head) // np.maximum(base, 1)) + 1
        return pa.table({
            "c_custkey": g.column("c_custkey"),
            "c_nationkey": g.column("c_nationkey"),
            "c_acctbal": g.column("c_acctbal"),
            "rank_in_nation": pa.array(i + 1, pa.int64()),
            "pct_rank": round6(pa.array(pct, pa.float64())),
            "decile": pa.array(decile, pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(finish, batch_format="pyarrow"))


def order_spend_share(sf_dir: str) -> "ray.data.Dataset":
    """Per-order share of its customer's lifetime spend — the
    `x / sum(x) OVER (PARTITION BY key)` per-group normalization shape
    (ubiquitous in feature engineering), expressed WITHOUT a self-join:
    ONE coarse customer-hash shuffle, then each bucket sorts by customer
    once, computes per-customer totals with ``np.add.reduceat`` over the
    segment boundaries, and broadcasts them back to rows with
    ``np.repeat`` — totals and shares in the same pass that would
    otherwise be an aggregate + join-back.

    Money moves as exact cents; the share divides the two int64s as
    doubles and rounds to 6dp, bit-identical to the SQL twin."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])

    empty = pa.table({
        "o_orderkey": pa.array([], pa.int64()),
        "o_custkey": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64()),
        "share": pa.array([], pa.float64()),
    })

    def tag(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((ck * _GOLDEN) % nc, pa.int64()))

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[("o_custkey", "ascending")])
        g = group.take(idx)
        ck = g.column("o_custkey").to_numpy()
        cents = pc.cast(pc.round(pc.multiply(g.column("o_totalprice"),
                                             100.0), ndigits=0,
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        counts = np.diff(np.r_[starts, len(ck)])
        totals = np.repeat(np.add.reduceat(cents, starts), counts)
        # a zero-cent customer total (free or offsetting orders) divides by
        # zero: SQL yields NULL, so mask those rows null instead of letting
        # nan/inf blow up round6's int64 snap
        zero = totals == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.where(zero, 0.0, cents / np.where(zero, 1, totals))
        share = round6(pa.array(raw, pa.float64(), mask=zero))
        return pa.table({
            "o_orderkey": g.column("o_orderkey"),
            "o_custkey": g.column("o_custkey"),
            "o_totalprice": g.column("o_totalprice"),
            "share": share,
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(finish, batch_format="pyarrow"))


def global_sales_opportunity(sf_dir: str,
                             cutoff: str = "2001-01-01"
                             ) -> "ray.data.Dataset":
    """TPC-H Q22-shaped (global sales opportunity): customers whose account
    balance is above the average POSITIVE balance and who have placed no
    order since ``cutoff``, rolled up per nation — the scalar-subquery-as-
    broadcast-threshold + anti-join + rollup composition.

    Scale shape: pass 1 reduces the balance column to TWO integers (exact
    cent sum + count of positive balances — a global aggregate whose
    driver pull is one row); the threshold comparison is the cross-
    multiplied integer form ``cents > total // cnt`` so no engine ever
    compares against a lossy double average.  Pass 2 filters customers per
    batch against those broadcast scalars, anti-joins the survivors
    against the order keys (hash-shuffle ``left_anti`` — both sides stay
    distributed), partial-combines per nation, and attaches nation names
    by broadcast."""
    import pyarrow.dataset as pads
    from ..functions.joins import broadcast_join, read_small_table, \
        join_partitions

    empty = pa.table({
        "nation": pa.array([], pa.string()),
        "n_customers": pa.array([], pa.int64()),
        "total_bal_cents": pa.array([], pa.int64())})
    if pads.dataset(f"{sf_dir}/customer.parquet").count_rows() == 0:
        return ray.data.from_arrow(empty)

    def cents_of(col) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(col, 100.0), ndigits=0,
                                round_mode="half_towards_infinity"),
                       pa.int64())

    bal = sized_read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_acctbal"])

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = cents_of(batch.column("c_acctbal"))
        pos = cents.filter(pc.greater(batch.column("c_acctbal"), 0.0))
        return pa.table({"s": pa.array([pc.sum(pos).as_py() or 0],
                                       pa.int64()),
                         "c": pa.array([len(pos)], pa.int64())})

    agg = bal.map_batches(pos_partial, batch_format="pyarrow") \
             .aggregate(Sum("s", alias_name="total"),
                        Sum("c", alias_name="cnt"))
    total, cnt = int(agg["total"] or 0), int(agg["cnt"] or 0)
    if cnt == 0:       # SQL: cross join against an empty scalar row set
        return ray.data.from_arrow(empty)
    thr = total // cnt         # cents > thr  <=>  cents * cnt > total

    cust = sized_read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey",
                                       "c_acctbal"])

    def rich(batch: pa.Table) -> pa.Table:
        cents = cents_of(batch.column("c_acctbal"))
        keep = pc.greater(cents, thr)
        return pa.table({
            "c_custkey": batch.column("c_custkey").filter(keep),
            "c_nationkey": batch.column("c_nationkey").filter(keep),
            "bal_cents": cents.filter(keep)})

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")

    cutoff_ts = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))

    def recent(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("o_orderdate"), cutoff_ts)
        # per-batch unique: the anti-join only needs the key SET, so the
        # shuffle/broadcast payload shrinks to distinct-keys-per-batch
        return pa.table({"o_custkey": pc.unique(
            batch.column("o_custkey").filter(keep))})

    # materialize the filtered key projection (it is the join's shuffle
    # payload anyway) so the emptiness probe and the size rule don't
    # re-run the read
    okeys = sized_read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate"]) \
        .map_batches(recent, batch_format="pyarrow").materialize()
    if okeys.count() == 0:
        pass                            # anti-join vs empty = identity
    elif okeys.size_bytes() <= _BROADCAST_BYTES:
        # the filtered key set fits every worker: broadcast anti-join
        keys_tbl = pa.concat_tables(ray.get(okeys.to_arrow_refs()))
        keys_tbl = pa.table({"o_custkey":
                             pc.unique(keys_tbl.column("o_custkey"))})
        rich_ds = broadcast_join(rich_ds, keys_tbl, on="c_custkey",
                                 right_on="o_custkey",
                                 join_type="left anti")
    else:
        rich_ds = rich_ds.join(okeys, join_type="left_anti",
                               num_partitions=join_partitions(None),
                               on=("c_custkey",), right_on=("o_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int32()),
                             "partial_n": pa.array([], pa.int64()),
                             "partial_c": pa.array([], pa.int64())})
        g = (batch.select(["c_nationkey", "bal_cents"])
                  .group_by("c_nationkey")
                  .aggregate([([], "count_all"), ("bal_cents", "sum")]))
        return g.rename_columns(["c_nationkey", "partial_n", "partial_c"])

    per_nation = (rich_ds.map_batches(partial, batch_format="pyarrow")
                         .groupby("c_nationkey")
                         .aggregate(Sum("partial_n",
                                        alias_name="n_customers"),
                                    Sum("partial_c",
                                        alias_name="total_bal_cents")))
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    out = broadcast_join(per_nation, nation, on="c_nationkey",
                         right_on="n_nationkey")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation": batch.column("n_name"),
            "n_customers": batch.column("n_customers"),
            "total_bal_cents": batch.column("total_bal_cents")})

    return out.map_batches(finish, batch_format="pyarrow")


def forecast_revenue(sf_dir: str, lo: str = "1997-01-01",
                     hi: str = "1998-01-01") -> "ray.data.Dataset":
    """TPC-H Q6-shaped: revenue uplift from dropping small discounts — one
    pruned scan of lineitem, every predicate vectorized per batch, a
    scalar global aggregate.  The discount window is compared on exact
    integer cents (floor(x*100)) in BOTH engines so float representation
    of 0.05/0.07 cannot flip a row.  Revenue = sum(extendedprice *
    discount) in exact cents (see module float discipline)."""
    lo_ts = pa.scalar(pd.Timestamp(lo), pa.timestamp("us"))
    hi_ts = pa.scalar(pd.Timestamp(hi), pa.timestamp("us"))

    line = sized_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        disc_c = _cents(batch.column("l_discount"))
        keep = pc.and_(
            pc.and_(pc.greater_equal(sd, lo_ts), pc.less(sd, hi_ts)),
            pc.and_(
                pc.and_(pc.greater_equal(disc_c, 5), pc.less_equal(disc_c, 7)),
                pc.less(batch.column("l_quantity"), 24.0)))
        kept = batch.filter(pc.fill_null(keep, False))
        rev_c = _cents(pc.multiply(kept.column("l_extendedprice"),
                                   kept.column("l_discount")))
        return pa.table({
            "rev_c": pa.array([pc.sum(rev_c).as_py() or 0], pa.int64()),
            "n": pa.array([kept.num_rows], pa.int64())})

    agg = (line.map_batches(partial, batch_format="pyarrow")
               .aggregate(Sum("rev_c", alias_name="rev_c"),
                          Sum("n", alias_name="n")))
    rev_c = agg["rev_c"] or 0
    n = agg["n"] or 0
    return ray.data.from_arrow(pa.table({
        "revenue": pa.array([rev_c / 100.0], pa.float64()),
        "n_lines": pa.array([n], pa.int64())}))


def late_shipment_priority(sf_dir: str, grace_days: int = 90,
                           num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """TPC-H Q4-shaped: orders with at least one lineitem shipped more
    than ``grace_days`` after the order date, counted per order priority.
    The EXISTS subquery never joins the raw lineitem table: per-batch
    (orderkey, max shipdate) partials reduce it to one row per orderkey
    BEFORE the one coarse shuffle (max(l_shipdate) > o_orderdate + g  ⇔
    ∃ line: l_shipdate > o_orderdate + g), then the size-based join rule
    attaches orders, and the priority rollup is a tiny groupby."""
    from ..functions.agg import coarse_grouped_aggregate

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "max_ship"])

    max_ship = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        "l_orderkey", [("max_ship", "max", "max_ship")])

    joined = sized_join(max_ship, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    grace = pa.scalar(grace_days * 86_400_000_000, pa.duration("us"))

    def late_partial(batch: pa.Table) -> pa.Table:
        late = pc.greater(batch.column("max_ship"),
                          pc.add(batch.column("o_orderdate"), grace))
        t = pa.table({"o_orderpriority":
                      batch.column("o_orderpriority").filter(late)})
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "partial_n"])

    # typed empty seed: no late orders -> zero aggregate rows and Ray
    # drops the schema; the union pins it
    seed = pa.table({"o_orderpriority": pa.array([], pa.string()),
                     "n_orders": pa.array([], pa.int64())})
    return ray.data.from_arrow(seed).union(
        joined.map_batches(late_partial, batch_format="pyarrow")
              .groupby("o_orderpriority")
              .aggregate(Sum("partial_n", alias_name="n_orders")))


def users_only_first_half(sf_dir: str,
                          split: str = "2024-01-30") -> "ray.data.Dataset":
    """EXCEPT of the active-user sets of two time ranges (churn set:
    active before the split, silent after), completing the set-op family
    (union = engaged_users_union, intersect = users_active_both_halves).
    Same shape: per-batch (user, seen_before, seen_after) flag partials,
    one coarse user shuffle with native Max, filter before AND NOT
    after — neither side's user set is ever materialized."""
    from ..functions.agg import coarse_grouped_aggregate

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    split_ts = pa.scalar(pd.Timestamp(split), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        before = pc.cast(pc.less(batch.column("ts"), split_ts), pa.int8())
        t = pa.table({"user_id": batch.column("user_id"),
                      "before": before,
                      "after": pc.subtract(pa.scalar(1, pa.int8()), before)})
        g = t.group_by("user_id").aggregate([("before", "max"),
                                             ("after", "max")])
        return g.rename_columns(["user_id", "before", "after"])

    agg = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("before", "max", "before"), ("after", "max", "after")])

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch.column("before"), 1),
                       pc.equal(batch.column("after"), 0))
        return pa.table({"user_id": batch.column("user_id").filter(keep)})

    return agg.map_batches(finish, batch_format="pyarrow")


def daily_revenue_ma7(sf_dir: str) -> "ray.data.Dataset":
    """7-day moving average of daily lineitem revenue — the trend-
    smoothing window a reporting pipeline runs over a fact table.
    Revenue = extendedprice*(1-discount) in exact cents; the MA divides
    a 7-day cents sum by the actual window size (ramp-up days average
    over fewer days), rounded to 6dp identically in both engines.

    Scale shape: the corpus-sized scan pre-reduces to per-DAY cents
    partials inside map_batches; the day rollup is bounded by the date
    domain (~thousands of rows at any corpus size), so the window scan
    runs in one finish map over a repartition(1) of the tiny rollup."""
    from ..functions.num import round6

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("l_shipdate"), unit="day")
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0, batch.column("l_discount"))))
        g = pa.table({"day": day, "rev_c": rev_c}).group_by("day") \
            .aggregate([("rev_c", "sum")])
        return g.rename_columns(["day", "rev_c"])

    agg = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("rev_c", alias_name="rev_c")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"day": pa.array([], pa.timestamp("us")),
                             "revenue": pa.array([], pa.float64()),
                             "ma7": pa.array([], pa.float64())})
        idx = pc.sort_indices(batch, sort_keys=[("day", "ascending")])
        g = batch.take(idx)
        c = g.column("rev_c").to_numpy()
        cum = np.r_[0, np.cumsum(c)]
        n = len(c)
        lo = np.maximum(np.arange(n) - 6, 0)
        wsum = cum[1 + np.arange(n)] - cum[lo]
        wlen = np.arange(n) - lo + 1
        ma = round6(pa.array(
            (wsum.astype(np.float64) / 100.0) / wlen.astype(np.float64)))
        return pa.table({
            "day": g.column("day"),
            "revenue": pc.divide(pc.cast(g.column("rev_c"), pa.float64(),
                                         safe=False), 100.0),
            "ma7": ma,
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def customer_repeat_rate(sf_dir: str) -> "ray.data.Dataset":
    """Repeat-purchase rate per market segment (share of ordering
    customers with >= 2 orders) — the aggregate-then-attach-dimension
    shape: the fact table reduces to per-customer order counts through
    one coarse shuffle, the customer dimension broadcast-attaches the
    segment, and a #segments-sized rollup finishes.  Customers with no
    orders are excluded (inner join), matching the SQL twin."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    from ..functions.num import round6

    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([([], "count_all")])
        return g.rename_columns(["o_custkey", "n_orders"])

    per_cust = coarse_grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", [("n_orders", "sum", "n_orders")])

    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(per_cust, cust, on="o_custkey",
                            right_on="c_custkey")

    def seg_partial(batch: pa.Table) -> pa.Table:
        rep = pc.cast(pc.greater_equal(batch.column("n_orders"), 2),
                      pa.int64())
        t = pa.table({"segment": batch.column("c_mktsegment"),
                      "one": pa.array(np.ones(batch.num_rows, np.int64)),
                      "rep": rep})
        g = t.group_by("segment").aggregate([("one", "sum"),
                                             ("rep", "sum")])
        return g.rename_columns(["segment", "n_customers", "n_repeat"])

    agg = (joined.map_batches(seg_partial, batch_format="pyarrow")
           .groupby("segment")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("n_repeat", alias_name="n_repeat")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "segment": batch.column("segment"),
            "n_customers": batch.column("n_customers"),
            "n_repeat": batch.column("n_repeat"),
            "repeat_rate": round6(pc.divide(
                pc.cast(batch.column("n_repeat"), pa.float64(), safe=False),
                pc.cast(batch.column("n_customers"), pa.float64(),
                        safe=False))),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def customer_spend_gini(sf_dir: str) -> "ray.data.Dataset":
    """Gini coefficient of per-customer spend — the concentration /
    inequality summary a marketplace-health or data-skew report carries
    (0 = uniform, →1 = one whale).  G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n
    over spends sorted ascending, 1-based ranks.

    Scale shape: orders reduce to per-customer cents through one coarse
    shuffle, then to a (cents, n_customers) VALUE HISTOGRAM through a
    second — the finish walks the histogram sorted by value, computing
    Σ i·x for each tie-run in closed form (v·(c·m + c(c+1)/2)) with
    exact Python integers (no overflow at any scale), and divides once
    with the SQL twin's operation order.  The histogram is bounded by
    DISTINCT spend values; the documented bound is the same
    distinct-totals pull customer_value_deciles carries."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6_scalar

    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "cents": _cents(batch.column("o_totalprice"))})
        g = t.group_by("o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    per_cust = coarse_grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", [("cents", "sum", "cents")])

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["cents"]).group_by("cents") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["cents", "n"])

    hist = coarse_grouped_aggregate(
        per_cust.map_batches(hist_partial, batch_format="pyarrow"),
        "cents", [("n", "sum", "n")])

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gini": pa.array([], pa.float64()),
                          "n_customers": pa.array([], pa.int64()),
                          "total_spend": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[("cents", "ascending")])
        g = batch.take(idx)
        v = g.column("cents").to_pylist()     # exact Python ints
        c = g.column("n").to_pylist()
        n = s0 = s1 = 0
        for vi, ci in zip(v, c):              # histogram-sized loop
            s1 += vi * (ci * n + ci * (ci + 1) // 2)
            s0 += vi * ci
            n += ci
        gini = round6_scalar((2.0 * s1) / (float(n) * float(s0))
                             - (n + 1.0) / n) if s0 else 0.0
        return pa.table({
            "gini": pa.array([gini], pa.float64()),
            "n_customers": pa.array([n], pa.int64()),
            "total_spend": pa.array([s0 / 100.0], pa.float64())})

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow")


def _affinity_exchange(sf_dir: str) -> "ray.data.Dataset":
    """THE one order-keyed exchange behind the market-basket family:
    distinct (order, part) pairs combine per batch, a coarse orderkey
    shuffle co-locates each basket, and the bucket kernel emits THREE
    kind-tagged row families from one pass — pair partials (kind 0:
    a < b, count), per-part marginal partials (kind 1: distinct orders
    containing the part — exact, orders never span buckets), and the
    bucket's distinct-order count (kind 2).  Consumers filter by kind,
    so lift never re-reads or re-shuffles the fact table."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        g = batch.select(["l_orderkey", "l_partkey"]) \
            .group_by(["l_orderkey", "l_partkey"]).aggregate([])
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return g.append_column("__coarse",
                               pa.array((ok * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"kind": pa.array([], pa.int8()),
                      "a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def bucket_rows(group: pa.Table) -> pa.Table:
        t = group.select(["l_orderkey", "l_partkey"]) \
            .group_by(["l_orderkey", "l_partkey"]).aggregate([])
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            ("l_orderkey", "ascending"), ("l_partkey", "ascending")])
        t = t.take(idx)
        ok = t.column("l_orderkey").to_numpy()
        pk = t.column("l_partkey").to_numpy()
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        sizes = np.diff(np.r_[starts, len(ok)])
        a_parts, b_parts = [], []
        for basket in np.unique(sizes[sizes >= 2]):
            segs = starts[sizes == basket]
            ii, jj = np.triu_indices(int(basket), k=1)
            a_parts.append(pk[(segs[:, None] + ii[None, :]).ravel()])
            b_parts.append(pk[(segs[:, None] + jj[None, :]).ravel()])
        out = []
        if a_parts:
            p = pa.table({"a": pa.array(np.concatenate(a_parts), pa.int64()),
                          "b": pa.array(np.concatenate(b_parts), pa.int64())})
            g = p.group_by(["a", "b"]).aggregate([([], "count_all")])
            out.append(pa.table({
                "kind": pa.array(np.zeros(g.num_rows, np.int8)),
                "a": g.column("a"), "b": g.column("b"),
                "n": pc.cast(g.column("count_all"), pa.int64())}))
        m = pa.table({"a": pa.array(pk, pa.int64())}).group_by("a") \
            .aggregate([([], "count_all")])
        out.append(pa.table({
            "kind": pa.array(np.ones(m.num_rows, np.int8)),
            "a": m.column("a"),
            "b": pa.array(np.zeros(m.num_rows, np.int64)),
            "n": pc.cast(m.column("count_all"), pa.int64())}))
        out.append(pa.table({
            "kind": pa.array([2], pa.int8()),
            "a": pa.array([0], pa.int64()),
            "b": pa.array([0], pa.int64()),
            "n": pa.array([len(starts)], pa.int64())}))
        return pa.concat_tables(out)

    return (ds.map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket_rows, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))


def _affinity_pair_counts(rows: "ray.data.Dataset",
                          min_count: int) -> "ray.data.Dataset":
    from ..functions.agg import coarse_grouped_aggregate

    def pair_rows(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.equal(batch.column("kind"), 0))
        return pa.table({"part_a": k.column("a"), "part_b": k.column("b"),
                         "partial_n": k.column("n")})

    agg = coarse_grouped_aggregate(
        rows.map_batches(pair_rows, batch_format="pyarrow"),
        ["part_a", "part_b"], [("partial_n", "sum", "n_orders")],
        hash_cols=["part_a", "part_b"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_orders"),
                                             min_count))

    return agg.map_batches(keep, batch_format="pyarrow")


def part_affinity_pairs(sf_dir: str, min_count: int = 2) -> "ray.data.Dataset":
    """Market-basket part affinity: pairs of parts appearing in at least
    ``min_count`` common orders — the association-rule / co-purchase
    building block.  Returns (part_a < part_b, n_orders).

    Scale shape: ONE coarse orderkey shuffle (`_affinity_exchange`)
    co-locates each basket and emits size-grouped triu pair partials
    (per-order cost quadratic in BASKET width, never corpus size); the
    final rollup is coarse-keyed on the combined pair."""
    # typed empty seed (pin_schema): an order book with no repeated
    # co-purchases yields a legitimately EMPTY graph — keep the schema
    from ..functions.joins import pin_schema
    seed = pa.table({"part_a": pa.array([], pa.int64()),
                     "part_b": pa.array([], pa.int64()),
                     "n_orders": pa.array([], pa.int64())})
    return pin_schema(
        seed, _affinity_pair_counts(_affinity_exchange(sf_dir), min_count))


def part_affinity_lift(sf_dir: str, min_count: int = 2) -> "ray.data.Dataset":
    """Association-rule lift for the co-purchase pairs: lift(a,b) =
    P(a,b) / (P(a)·P(b)) over order baskets — >1 means the parts attract
    (the recommender/planogram signal), computed exactly as
    (n_ab · total_orders) / (n_a · n_b) on integers with one final
    double division identical in both engines.

    Scale shape: ONE order-keyed exchange (`_affinity_exchange`,
    MATERIALIZED once — its output is bucket-pre-reduced partials, far
    smaller than the fact table) feeds all three consumers: the pair
    rollup, the #parts-bounded marginal rollup (exact per bucket since
    orders never split, broadcast once — parts are a bounded catalog
    domain), and the distinct-order scalar.  The fact table is read and
    shuffled exactly once; lift is a pure map over the pair stream."""
    import ray as _ray
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    rows = _affinity_exchange(sf_dir).materialize()
    pairs = _affinity_pair_counts(rows, min_count)

    def marg_rows(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.table({"part": k.column("a"), "n": k.column("n")})

    marg = (rows.map_batches(marg_rows, batch_format="pyarrow")
            .groupby("part").aggregate(Sum("n", alias_name="n_orders"))
            .to_pandas())
    if "part" not in marg:          # empty table: Ray drops the columns
        import pandas as pd
        marg = pd.DataFrame({"part": [], "n_orders": []})

    def total_rows(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.equal(batch.column("kind"), 2))
        return pa.table({"n": k.column("n")})

    total_orders = (rows.map_batches(total_rows, batch_format="pyarrow")
                    .sum("n") or 0)
    from ..functions.joins import make_lookup, lookup_np
    ref = _ray.put(make_lookup(marg["part"].to_numpy(),
                               marg["n_orders"].to_numpy()))

    empty = pa.table({"part_a": pa.array([], pa.int64()),
                      "part_b": pa.array([], pa.int64()),
                      "n_orders": pa.array([], pa.int64()),
                      "lift": pa.array([], pa.float64())})

    def lift(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        md = _ray.get(ref)
        na = lookup_np(batch.column("part_a"), md).astype(np.int64)
        nb = lookup_np(batch.column("part_b"), md).astype(np.int64)
        nab = batch.column("n_orders").to_numpy()
        val = (nab * total_orders).astype(np.float64) \
            / (na * nb).astype(np.float64)
        return pa.table({
            "part_a": batch.column("part_a"),
            "part_b": batch.column("part_b"),
            "n_orders": batch.column("n_orders"),
            "lift": round6(pa.array(val)),
        })

    from ..functions.joins import pin_schema
    seed = pa.table({"part_a": pa.array([], pa.int64()),
                     "part_b": pa.array([], pa.int64()),
                     "n_orders": pa.array([], pa.int64()),
                     "lift": pa.array([], pa.float64())})
    return pin_schema(seed,
                      pairs.map_batches(lift, batch_format="pyarrow"))


def monthly_revenue_growth(sf_dir: str) -> "ray.data.Dataset":
    """Month-over-month revenue growth — the lag-over-aggregate report
    shape: the corpus-sized scan pre-reduces to per-month exact-cents
    partials, and the growth rates compute in one finish map over the
    date-domain-bounded month table (growth = (cur − prev)/prev on the
    cents ints, NULL for the first month, 6dp in both engines)."""
    from ..functions.num import round6

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch.column("l_shipdate"), unit="month")
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0, batch.column("l_discount"))))
        g = pa.table({"month": month, "rev_c": rev_c}).group_by("month") \
            .aggregate([("rev_c", "sum")])
        return g.rename_columns(["month", "rev_c"])

    agg = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("month").aggregate(Sum("rev_c", alias_name="rev_c")))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"month": pa.array([], pa.timestamp("us")),
                          "revenue": pa.array([], pa.float64()),
                          "growth": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[("month", "ascending")])
        g = batch.take(idx)
        c = g.column("rev_c").to_numpy().astype(np.float64)
        growth = np.full(len(c), np.nan)
        if len(c) > 1:
            prev = c[:-1]
            with np.errstate(divide="ignore", invalid="ignore"):
                growth[1:] = np.where(prev != 0, (c[1:] - prev) / prev,
                                      np.nan)
        return pa.table({
            "month": g.column("month"),
            "revenue": pa.array(c / 100.0),
            "growth": round6(pa.array(growth, from_pandas=True)),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def customer_rfm(sf_dir: str, ref_date: str = "1998-12-31") -> "ray.data.Dataset":
    """RFM feature table — recency (days from last order to the reference
    date), frequency (order count), monetary (exact-cents total spend)
    per customer: the canonical marketing/feature-store per-entity
    rollup.  One coarse customer shuffle with native Max/Sum aggregates;
    the finish is a pure map (no per-customer dispatch)."""
    from ..functions.agg import coarse_grouped_aggregate

    ref_us = int(pd.Timestamp(ref_date).value // 1000)
    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate",
                                         "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch.column("o_custkey"),
            "last_us": batch.column("o_orderdate").cast(pa.int64()),
            "cents": _cents(batch.column("o_totalprice")),
        })
        g = t.group_by("o_custkey").aggregate(
            [("last_us", "max"), ([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["o_custkey", "last_us", "partial_n",
                                 "cents"])

    agg = coarse_grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", [("last_us", "max", "last_us"),
                      ("partial_n", "sum", "frequency"),
                      ("cents", "sum", "cents")])

    def finish(batch: pa.Table) -> pa.Table:
        last = batch.column("last_us").to_numpy()
        recency = (ref_us - last) // 86_400_000_000
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "recency_days": pa.array(recency, pa.int64()),
            "frequency": batch.column("frequency"),
            "monetary": pc.divide(pc.cast(batch.column("cents"),
                                          pa.float64(), safe=False), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def orders_star(sf_dir: str) -> "ray.data.Dataset":
    """Denormalized star snapshot: orders widened with customer, nation
    and region attributes — the ETL step that builds the analyst-facing
    wide table so downstream queries stop paying the joins.

    Scale shape: the fact table streams once through a chain of
    BROADCAST joins (customer/nation/region are dimensions — shipped via
    ``ray.put`` once, no shuffle anywhere); the output is a pure
    projection.  At 100 TB the orders scan parallelizes per block and
    the pipeline stays map-only."""
    from ..functions.joins import broadcast_join, read_small_table

    orders = sized_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate", "o_orderpriority"])
    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name",
                                     "c_mktsegment", "c_nationkey"])
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name",
                                       "n_regionkey"])
    region = read_small_table(f"{sf_dir}/region.parquet",
                              columns=["r_regionkey", "r_name"])

    wide = broadcast_join(orders, cust, on="o_custkey",
                          right_on="c_custkey")
    wide = broadcast_join(wide, nation, on="c_nationkey",
                          right_on="n_nationkey")
    wide = broadcast_join(wide, region, on="n_regionkey",
                          right_on="r_regionkey")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "o_totalprice": batch.column("o_totalprice"),
            "customer": batch.column("c_name"),
            "segment": batch.column("c_mktsegment"),
            "nation": batch.column("n_name"),
            "region": batch.column("r_name"),
        })

    return wide.map_batches(project, batch_format="pyarrow")


def part_communities(sf_dir: str, min_count: int = 2) -> "ray.data.Dataset":
    """Co-purchase communities: connected components over the
    ``part_affinity_pairs`` graph (parts linked when they share >=
    ``min_count`` orders) — the category-discovery / substitutability
    grouping built on the shared Hash-to-Min primitive
    (dedup.connected_components: one coarse groupby per round, no joins,
    no driver state).  Output (part_id, community_id, community_size)
    with community_id = the component-minimum part key."""
    from ..pipelines.dedup import connected_components

    pairs = part_affinity_pairs(sf_dir, min_count=min_count)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("part_a"),
                         "b": batch.column("part_b")})

    comp = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"part_id": batch.column("doc_id"),
                         "community_id": batch.column("cluster_id"),
                         "community_size": batch.column("cluster_size")})

    from ..functions.joins import pin_schema
    seed = pa.table({"part_id": pa.array([], pa.int64()),
                     "community_id": pa.array([], pa.int64()),
                     "community_size": pa.array([], pa.int64())})
    return pin_schema(seed,
                      comp.map_batches(rename, batch_format="pyarrow"))


def value_mad_outliers(sf_dir: str, k: float = 5.0) -> "ray.data.Dataset":
    """Robust outlier counts per event type using MEDIAN / MAD instead of
    mean / sigma (value_zscore_outliers' non-robust twin): an event is an
    outlier when |value − median| > k·MAD.  Median-based detection
    survives the heavy tails that inflate a z-score's sigma — the robust
    variant a data-quality monitor actually deploys.

    Scale shape: the value_percentiles_by_type histogram shape — ONE
    shuffle of per-batch (type, cent, count) histogram partials; each
    type's kernel computes median, MAD, and the outlier count with two
    cumulative walks over its distinct-cents rows (exact integer
    comparisons throughout; percentile_disc rank convention in both
    engines)."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        # NULL event_type breaks Ray's sort-based group partitioning and a
        # NULL value would NaN-poison the median/MAD — drop both up front,
        # matching the sibling event ops (the SQL twin's WHERE pins this).
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("value"))))
        t = pa.table({"event_type": batch.column("event_type"),
                      "value_c": _cents(batch.column("value"))})
        g = t.group_by(["event_type", "value_c"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "value_c", "partial_n"])

    def mad_kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("value_c"))
        vals = group.column("value_c").take(order).to_numpy()
        counts = group.column("partial_n").take(order).to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        med = int(vals[int(np.searchsorted(cum, int(np.ceil(0.5 * total))))])
        dev = np.abs(vals - med)
        dorder = np.argsort(dev, kind="stable")
        dcum = np.cumsum(counts[dorder])
        mad = int(dev[dorder][int(np.searchsorted(
            dcum, int(np.ceil(0.5 * total))))])
        n_out = int(counts[dev > k * mad].sum())
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()], pa.string()),
            "median": pa.array([med / 100.0], pa.float64()),
            "mad": pa.array([mad / 100.0], pa.float64()),
            "n_outliers": pa.array([n_out], pa.int64()),
            "n": pa.array([total], pa.int64()),
        })

    return (ds.map_batches(hist, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(mad_kernel, batch_format="pyarrow"))


def supplier_scorecard(sf_dir: str) -> "ray.data.Dataset":
    """Per-supplier scorecard: line count, exact-cents revenue, distinct
    parts supplied, and the supplier name — the entity-rollup report
    (vendor review / anomaly triage).  One coarse supplier shuffle; the
    distinct-part count rides as per-batch distinct (supp, part) pairs
    pre-reduced in the same exchange; names broadcast-attach."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_suppkey", "l_partkey",
                                       "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0, batch.column("l_discount"))))
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "l_partkey": batch.column("l_partkey"),
                      "rev_c": rev_c})
        # one group_by carries both the revenue partials and the distinct
        # (supp, part) pairs
        g = t.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [("rev_c", "sum"), ([], "count_all")])
        return g.rename_columns(["l_suppkey", "l_partkey", "rev_c", "n"])

    pairs = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"],
        [("rev_c", "sum", "rev_c"), ("n", "sum", "n")])

    def per_supp(batch: pa.Table) -> pa.Table:
        g = batch.select(["l_suppkey", "rev_c", "n"]) \
            .group_by("l_suppkey").aggregate(
            [("rev_c", "sum"), ("n", "sum"), ([], "count_all")])
        return g.rename_columns(["l_suppkey", "rev_c", "n_lines",
                                 "n_parts"])

    agg = coarse_grouped_aggregate(
        pairs.map_batches(per_supp, batch_format="pyarrow"),
        "l_suppkey", [("rev_c", "sum", "rev_c"),
                      ("n_lines", "sum", "n_lines"),
                      ("n_parts", "sum", "n_parts")])

    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"])
    out = broadcast_join(agg, supp, on="l_suppkey", right_on="s_suppkey")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_name": batch.column("s_name"),
            "n_lines": batch.column("n_lines"),
            "n_parts": batch.column("n_parts"),
            "revenue": pc.divide(pc.cast(batch.column("rev_c"),
                                         pa.float64(), safe=False), 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def order_lines_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Basket-size distribution: how many orders have k lineitems — the
    evidence behind every "per-order cost is bounded by basket width"
    claim (the affinity kernels rely on it).  Per-order counts reduce
    through one coarse shuffle; the histogram is a second tiny rollup
    over the bounded width domain."""
    from ..functions.agg import coarse_grouped_aggregate
    from ray.data.aggregate import Sum

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([([], "count_all")])
        return g.rename_columns(["l_orderkey", "n_lines"])

    per_order = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        "l_orderkey", [("n_lines", "sum", "n_lines")])

    def hist(batch: pa.Table) -> pa.Table:
        g = batch.select(["n_lines"]).group_by("n_lines") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["n_lines", "partial_n"])

    return (per_order.map_batches(hist, batch_format="pyarrow")
            .groupby("n_lines").aggregate(Sum("partial_n",
                                              alias_name="n_orders")))


def peak_window_revenue(sf_dir: str, k: int = 5,
                        pad_days: int = 1) -> "ray.data.Dataset":
    """Revenue concentrated around the top-k peak shipping days — each
    peak day expands to a ±``pad_days`` window and every DAY whose
    revenue falls in a window joins it via the range-join primitive
    (``functions.joins.broadcast_range_join``; windows from adjacent
    peaks genuinely overlap, so a day can count toward two windows —
    real interval-join semantics, not binning).

    Scale shape: the corpus-sized scan pre-reduces to per-day cents
    partials (ONE bounded shuffle, date-domain-sized result); the top-k
    peak pull is k rows; the interval table broadcasts; the final
    rollup is over k windows.  Nothing corpus-sized reaches the driver
    or the range probe."""
    from ..functions.joins import broadcast_range_join
    from ..functions.num import round6  # noqa: F401  (convention import)

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("l_shipdate"), unit="day")
        rev_c = _cents(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount"))))
        g = pa.table({"day": day, "rev_c": rev_c}).group_by("day") \
            .aggregate([("rev_c", "sum")])
        return g.rename_columns(["day", "rev_c"])

    daily = (line.map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("rev_c", alias_name="rev_c"))
             .materialize())                 # date-domain-sized, reused twice

    # bounded pull: exactly k peak rows (timestamp unit follows whatever
    # the engine's rollup emitted — don't pin it in a seed)
    peak_batches = list(daily.sort(["rev_c", "day"],
                                   descending=[True, False])
                        .limit(k).iter_batches(batch_format="pyarrow"))
    peaks = pa.concat_tables(peak_batches) if peak_batches else \
        pa.table({"day": pa.array([], pa.timestamp("us")),
                  "rev_c": pa.array([], pa.int64())})
    pad = np.timedelta64(pad_days, "D")
    days = peaks.column("day").to_numpy()
    day_t = peaks.column("day").type    # match the fact column's unit
    windows = pa.table({
        "window_id": pa.array(np.arange(len(days), dtype=np.int64)),
        "w_start": pa.array(days - pad).cast(day_t),
        "w_end": pa.array(days + pad).cast(day_t),
    })

    joined = broadcast_range_join(daily, windows, on="day",
                                  start_col="w_start", end_col="w_end")

    def rollup(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["window_id", "w_start", "w_end"]).aggregate(
            [("rev_c", "sum"), ([], "count_all")])
        return g.rename_columns(["window_id", "w_start", "w_end",
                                 "p_rev", "p_days"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_id": batch.column("window_id"),
            "w_start": batch.column("w_start"),
            "w_end": batch.column("w_end"),
            "n_days": batch.column("n_days"),
            "revenue": pc.divide(pc.cast(batch.column("rev_c"),
                                         pa.float64()), 100.0),
        })

    seed = pa.table({"window_id": pa.array([], pa.int64()),
                     "w_start": pa.array([], day_t),
                     "w_end": pa.array([], day_t),
                     "n_days": pa.array([], pa.int64()),
                     "revenue": pa.array([], pa.float64())})
    agg = (joined.map_batches(rollup, batch_format="pyarrow")
           .groupby(["window_id", "w_start", "w_end"])
           .aggregate(Sum("p_rev", alias_name="rev_c"),
                      Sum("p_days", alias_name="n_days"))
           .map_batches(finish, batch_format="pyarrow"))
    return ray.data.from_arrow(seed).union(agg)


def key_skew_report(sf_dir: str, top_n: int = 10) -> "ray.data.Dataset":
    """Hot-key skew diagnosis for the shuffle keys this engine groups on —
    the report you read BEFORE picking a salting strategy: per (table,
    key): row count, distinct keys, top-1/top-N key shares, and
    skew = top1 * n_keys / n_rows (1.0 = perfectly uniform).

    Scale shape, per key: per-batch key histograms feed ONE coarse
    shuffle; the per-key table then reduces via streaming aggregates
    (count/sum/max) plus a bounded ``top_n``-row sort+limit pull.  NULL
    keys are excluded in both engines (a NULL group key also breaks
    Ray's sort-based partitioning — the CLAUDE.md sentinel rule)."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6

    specs = [("events.user_id", "events", "user_id"),
             ("events.event_type", "events", "event_type"),
             ("lineitem.l_partkey", "lineitem", "l_partkey"),
             ("orders.o_custkey", "orders", "o_custkey")]
    rows = []
    for key_name, table, col in specs:
        ds = sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(batch: pa.Table, col=col) -> pa.Table:
            t = batch.filter(pc.is_valid(batch.column(col)))
            g = t.group_by(col).aggregate([([], "count_all")])
            return g.rename_columns(["k", "partial_n"])

        per_key = coarse_grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            "k", [("partial_n", "sum", "c")]).materialize()
        agg = per_key.aggregate(Count(alias_name="n_keys"),
                                Sum("c", alias_name="n_rows"),
                                Max("c", alias_name="top1")) or {}
        n_keys = int(agg.get("n_keys") or 0)
        n_rows = int(agg.get("n_rows") or 0)
        top1 = int(agg.get("top1") or 0)
        topn = sum(r["c"] for r in per_key.sort(
            ["c", "k"], descending=[True, False]).limit(top_n).take_all())
        rows.append({
            "key_name": key_name,
            "n_rows": n_rows,
            "n_keys": n_keys,
            # float() each integer BEFORE dividing — the twin's
            # CAST(x AS DOUBLE)/CAST(y AS DOUBLE) order (Python int/int
            # true division rounds the exact rational instead, which can
            # differ past 2^53)
            "top1_share": (round6(pa.array(
                [float(top1) / float(n_rows)]))[0].as_py()
                if n_rows else None),
            "topn_share": (round6(pa.array(
                [float(topn) / float(n_rows)]))[0].as_py()
                if n_rows else None),
            "skew": (round6(pa.array(
                [float(top1 * n_keys) / float(n_rows)]))[0].as_py()
                if n_rows else None),
        })
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=pa.schema([
        ("key_name", pa.string()), ("n_rows", pa.int64()),
        ("n_keys", pa.int64()), ("top1_share", pa.float64()),
        ("topn_share", pa.float64()), ("skew", pa.float64())])))


def min_cost_supplier(sf_dir: str, size: int = 13,
                      ptype: str = "STANDARD",
                      region: str = "ASIA") -> "ray.data.Dataset":
    """TPC-H Q2-shaped (minimum-cost supplier): for every part of one size
    and type, the cheapest supplier in one region — this corpus has no
    partsupp table, so supply cost is the shipped unit price
    ``sum(extendedprice) / sum(quantity)`` per (part, supplier) pair from
    lineitem (reference shape: TPC-H Q2's correlated min-subquery).

    Scale shape: both dimension sides (filtered parts; region suppliers ⨝
    nation ⨝ region, pre-joined on the driver) broadcast as SEMI joins, so
    lineitem is pruned and filtered in one pass; per-(part,supp) partials
    combine per batch, ONE coarse pair shuffle, then the per-part argmin is
    a packed-int64 ``min`` (cost_micro * 2^22 + suppkey — ties break to the
    smallest suppkey) so no per-key Python dispatch.  Exact-cents / exact-
    quantity integer sums keep float parity with the SQL twin; the one
    division is performed identically (int64 -> float64) on both sides.

    Packed-argmin contract (asserted per batch): cost_micro < 2^41
    (unit price below ~$2.2M) and suppkey < 2^22 (~4.2M suppliers)."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    import pyarrow.dataset as pads

    parts = read_small_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"],
        filter=(pads.field("p_size") == size)
               & (pads.field("p_type") == ptype))
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name", "s_acctbal",
                                     "s_nationkey"])
    nation = read_small_table(f"{sf_dir}/nation.parquet")
    reg = read_small_table(f"{sf_dir}/region.parquet",
                           filter=pads.field("r_name") == region)
    nat = nation.join(reg, keys="n_regionkey", right_keys="r_regionkey",
                      join_type="inner").select(["n_nationkey", "n_name"])
    supp = supp.join(nat, keys="s_nationkey", right_keys="n_nationkey",
                     join_type="inner") \
        .select(["s_suppkey", "s_name", "s_acctbal", "n_name"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey",
                                       "l_extendedprice", "l_quantity"])
    line = broadcast_join(line, parts.select(["p_partkey"]),
                          on="l_partkey", right_on="p_partkey",
                          join_type="left semi")
    line = broadcast_join(line, supp.select(["s_suppkey"]),
                          on="l_suppkey", right_on="s_suppkey",
                          join_type="left semi")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_partkey": batch.column("l_partkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "price_c": _cents(batch.column("l_extendedprice")),
            "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
        })
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("price_c", "sum"), ("qty", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey",
                                 "price_c", "qty"])

    pairs = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        [("price_c", "sum", "price_c"), ("qty", "sum", "qty")])

    def pack(batch: pa.Table) -> pa.Table:
        # cost_micro = round_half_away(price_c * 10000.0 / qty): the same
        # int64 -> float64 promotion, division and rounding DuckDB performs
        cost_micro = pc.cast(
            pc.round(pc.divide(
                pc.multiply(pc.cast(batch.column("price_c"), pa.float64()),
                            10000.0),
                pc.cast(batch.column("qty"), pa.float64())),
                ndigits=0, round_mode="half_towards_infinity"),
            pa.int64())
        sk = batch.column("l_suppkey")
        if len(batch) and (
                pc.max(cost_micro).as_py() >= (1 << 41)
                or pc.max(sk).as_py() >= (1 << 22)):
            raise ValueError(
                "min_cost_supplier packed-argmin contract violated: "
                "cost_micro must be < 2^41 and suppkey < 2^22")
        packed = pc.add(pc.multiply(cost_micro, pa.scalar(1 << 22,
                                                          pa.int64())),
                        pc.cast(sk, pa.int64()))
        return pa.table({"l_partkey": batch.column("l_partkey"),
                         "packed": packed})

    best = coarse_grouped_aggregate(
        pairs.map_batches(pack, batch_format="pyarrow"),
        "l_partkey", [("packed", "min", "packed")])

    def unpack(batch: pa.Table) -> pa.Table:
        packed = batch.column("packed")
        return pa.table({
            "p_partkey": batch.column("l_partkey"),
            "s_suppkey": pc.bit_wise_and(packed,
                                         pa.scalar((1 << 22) - 1,
                                                   pa.int64())),
            "cost_micro": pc.shift_right(packed, 22),
        })

    out = broadcast_join(best.map_batches(unpack, batch_format="pyarrow"),
                         supp, on="s_suppkey")
    out = broadcast_join(out, parts, on="p_partkey")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_acctbal": batch.column("s_acctbal"),
            "s_name": batch.column("s_name"),
            "n_name": batch.column("n_name"),
            "p_partkey": batch.column("p_partkey"),
            "p_name": batch.column("p_name"),
            "supply_cost": pc.divide(
                pc.cast(batch.column("cost_micro"), pa.float64(),
                        safe=False), 1000000.0),
        })

    # typed empty seed: a region/size filter matching nothing yields zero
    # rows and Ray's sort drops the schema entirely; the union pins it.
    # The seed must wrap AFTER sort/limit (sort on an empty dataset
    # loses the schema), and Ray's planner asserts on a union whose
    # direct child is a Limit operator — the identity map in between
    # sidesteps both quirks (the q3_shipping_priority shape).
    seed = pa.table({"s_acctbal": pa.array([], pa.float64()),
                     "s_name": pa.array([], pa.string()),
                     "n_name": pa.array([], pa.string()),
                     "p_partkey": pa.array([], pa.int64()),
                     "p_name": pa.array([], pa.string()),
                     "supply_cost": pa.array([], pa.float64())})
    return ray.data.from_arrow(seed).union(
        out.map_batches(finish, batch_format="pyarrow")
           .sort(["s_acctbal", "n_name", "s_name", "p_partkey"],
                 descending=[True, False, False, False])
           .limit(100)
           .map_batches(lambda b: b, batch_format="pyarrow"))


def important_parts(sf_dir: str, nation: str = "NATION_7",
                    mult: float = 2.0) -> "ray.data.Dataset":
    """TPC-H Q11-shaped (important stock): parts whose shipped value from
    one nation's suppliers exceeds ``mult`` x the AVERAGE per-part value
    (no partsupp table — value is discounted lineitem revenue, the Q11
    group-HAVING-over-global-scalar shape; Q11's own ``fraction/SF``
    threshold is scale-dependent, so the mean-relative form keeps the
    query's selectivity — and its test corpus output — scale-invariant).

    Scale shape: the nation's supplier keys broadcast as a semi join;
    per-part exact-cents partials combine per batch into ONE coarse part
    shuffle; the global total/count is an aggregation-tree Sum over the
    bounded per-part table (materialized once so threshold + filter reuse
    it); the comparison ``value_c > total*mult/n`` uses the same int64 ->
    float64 promotion and operation order as the SQL twin."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    import pyarrow.dataset as pads

    nat = read_small_table(f"{sf_dir}/nation.parquet",
                           filter=pads.field("n_name") == nation)
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
    supp = supp.join(nat, keys="s_nationkey", right_keys="n_nationkey",
                     join_type="left semi").select(["s_suppkey"])

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey",
                                       "l_extendedprice", "l_discount"])
    line = broadcast_join(line, supp, on="l_suppkey", right_on="s_suppkey",
                          join_type="left semi")

    def partial(batch: pa.Table) -> pa.Table:
        val_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "val_c": val_c})
        g = t.group_by("l_partkey").aggregate([("val_c", "sum")])
        return g.rename_columns(["l_partkey", "val_c"])

    per_part = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        "l_partkey", [("val_c", "sum", "val_c")]).materialize()

    stats = per_part.aggregate(Sum("val_c", alias_name="t"),
                               Count(alias_name="n")) or {}
    total, n = stats.get("t"), stats.get("n", 0)
    seed = pa.table({"p_partkey": pa.array([], pa.int64()),
                     "value": pa.array([], pa.float64())})
    if total is None or not n:
        return ray.data.from_arrow(seed)
    # same operation order as the SQL twin: sum*mult first, then /count
    threshold = float(total) * mult / float(n)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(
            pc.cast(batch.column("val_c"), pa.float64()), threshold))
        return pa.table({
            "p_partkey": batch.column("l_partkey"),
            "value": pc.divide(pc.cast(batch.column("val_c"), pa.float64(),
                                       safe=False), 100.0),
        })

    # the typed 0-row seed UNION'd after the sort keeps the output schema
    # when the filter removes every row (Ray's sort returns schema=None on
    # fully-empty data; appending 0 rows cannot perturb the sorted order)
    return (per_part.map_batches(finish, batch_format="pyarrow")
            .sort(["value", "p_partkey"], descending=[True, False])
            .union(ray.data.from_arrow(seed)))


def supplier_part_variety(sf_dir: str, brand: str = "Brand#45",
                          ptype: str = "MEDIUM",
                          sizes: "tuple[int, ...]" = (1, 4, 9, 14, 19, 23,
                                                      36, 49)
                          ) -> "ray.data.Dataset":
    """TPC-H Q16-shaped (parts/supplier relationship): how many DISTINCT
    suppliers ship parts of each (brand, type, size) bucket, excluding one
    brand, one type, sizes outside a list, and "complaint" suppliers (no
    comment column — negative account balance is the complaint analog;
    no partsupp — the shipped lineitem pair is the relationship).

    Scale shape: the filtered part attributes broadcast once (inner
    broadcast join attaches brand/type/size and drops non-qualifying
    parts); the excluded-supplier key set broadcasts as an ANTI join;
    per-batch distinct (brand, type, size, suppkey) quads pre-reduce the
    pair stream, ONE coarse shuffle on suppkey dedupes them globally, and
    the per-bucket distinct count is a second, tiny coarse aggregate —
    count(DISTINCT) without ever shipping raw pairs."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    import pyarrow.dataset as pads

    parts = read_small_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=(pads.field("p_brand") != brand)
               & (pads.field("p_type") != ptype)
               & (pads.field("p_size").isin(list(sizes))))
    bad_supp = read_small_table(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey"],
                                filter=pads.field("s_acctbal") < 0.0)

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey"])
    line = broadcast_join(line, bad_supp, on="l_suppkey",
                          right_on="s_suppkey", join_type="left anti")
    line = broadcast_join(line, parts, on="l_partkey",
                          right_on="p_partkey", join_type="inner")

    def quads(batch: pa.Table) -> pa.Table:
        g = batch.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .group_by(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["p_brand", "p_type", "p_size",
                                 "l_suppkey", "n"])

    distinct = coarse_grouped_aggregate(
        line.map_batches(quads, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        [("n", "sum", "n")], hash_cols=["l_suppkey"])

    def per_bucket(batch: pa.Table) -> pa.Table:
        g = batch.select(["p_brand", "p_type", "p_size"]) \
            .group_by(["p_brand", "p_type", "p_size"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["p_brand", "p_type", "p_size",
                                 "supplier_cnt"])

    counts = coarse_grouped_aggregate(
        distinct.map_batches(per_bucket, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"],
        [("supplier_cnt", "sum", "supplier_cnt")],
        hash_cols=["p_brand", "p_type", "p_size"])

    return counts.map_batches(
        lambda b: b.rename_columns(["p_brand", "p_type", "p_size",
                                    "supplier_cnt"]),
        batch_format="pyarrow") \
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
              descending=[True, False, False, False])


def excess_shipped_suppliers(sf_dir: str, prefix: str = "red ",
                             nation: str = "NATION_3",
                             year_lo: str = "1997-01-01",
                             year_hi: str = "1998-01-01"
                             ) -> "ray.data.Dataset":
    """TPC-H Q20-shaped (excess-concentration suppliers): suppliers in one
    nation that, for SOME part whose name starts with ``prefix``, shipped
    more than half of that (part, supplier) pair's all-time quantity
    inside one window — Q20's nested semi-join over a per-pair aggregate
    threshold, with the window-share predicate standing in for the
    partsupp availqty comparison this corpus cannot express.

    Scale shape: the prefix-filtered part keys broadcast as a semi join;
    the window sum and all-time sum ride the SAME per-(part,supp) partial
    (a conditional sum, exact integer quantities), combined by ONE coarse
    pair shuffle; qualifying pairs reduce to distinct suppliers in a
    second tiny coarse aggregate, and the nation's supplier names attach
    by broadcast inner join (which applies the nation filter)."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    import pyarrow.dataset as pads

    # pyarrow dataset filters have no LIKE: prefix-filter on the driver
    # (part is a dimension table; the filtered keys broadcast)
    pname = read_small_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_name"])
    parts = pname.filter(pc.starts_with(pname.column("p_name"), prefix)) \
        .select(["p_partkey"])

    nat = read_small_table(f"{sf_dir}/nation.parquet",
                           filter=pads.field("n_name") == nation)
    supp = read_small_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name", "s_nationkey"])
    supp = supp.join(nat, keys="s_nationkey", right_keys="n_nationkey",
                     join_type="left semi").select(["s_suppkey", "s_name"])

    lo_ts = pa.scalar(pd.Timestamp(year_lo), pa.timestamp("us"))
    hi_ts = pa.scalar(pd.Timestamp(year_hi), pa.timestamp("us"))

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_suppkey",
                                       "l_quantity", "l_shipdate"])
    line = broadcast_join(line, parts, on="l_partkey",
                          right_on="p_partkey", join_type="left semi")

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64())
        sd = batch.column("l_shipdate")
        in_win = pc.and_(pc.greater_equal(sd, lo_ts), pc.less(sd, hi_ts))
        win_qty = pc.if_else(in_win, qty, pa.scalar(0, pa.int64()))
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "l_suppkey": batch.column("l_suppkey"),
                      "win_qty": win_qty, "qty": qty})
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("win_qty", "sum"), ("qty", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey",
                                 "win_qty", "qty"])

    pairs = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        [("win_qty", "sum", "win_qty"), ("qty", "sum", "qty")],
        hash_cols=["l_suppkey"])

    def qualify(batch: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(batch.column("win_qty"),
                                      pa.scalar(2, pa.int64())),
                          batch.column("qty"))
        batch = batch.filter(keep)
        g = batch.select(["l_suppkey"]).group_by("l_suppkey") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["l_suppkey", "n"])

    distinct = coarse_grouped_aggregate(
        pairs.map_batches(qualify, batch_format="pyarrow"),
        "l_suppkey", [("n", "sum", "n")])

    out = broadcast_join(distinct, supp, on="l_suppkey",
                         right_on="s_suppkey", join_type="inner")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch.column("l_suppkey"),
                         "s_name": batch.column("s_name")})

    # typed empty seed: no supplier past the excess threshold yields zero
    # rows and Ray drops the schema; the union pins it
    seed = pa.table({"s_suppkey": pa.array([], pa.int64()),
                     "s_name": pa.array([], pa.string())})
    return ray.data.from_arrow(seed).union(
        out.map_batches(finish, batch_format="pyarrow").sort("s_suppkey"))


def part_pagerank(sf_dir: str, min_count: int = 2, iters: int = 3,
                  d_num: int = 85, d_den: int = 100,
                  top_k: int = 100) -> "ray.data.Dataset":
    """PageRank over the co-purchase part graph — the iterative-
    linear-algebra operator class (power method), run for a FIXED
    ``iters`` rounds with damping ``d_num/d_den`` on the undirected
    part-affinity edges (both orientations, unweighted):

        r_{k+1}(v) = (1-d)·1e6  +  Σ_{(u,v)∈E} (r_k(u)·d_num) // (d_den·deg(u))

    in integer micro-units with floor division, so every iteration is
    EXACT integer arithmetic — bit-identical between the engine and the
    SQL twin's chained CTEs regardless of summation order (the classic
    float power iteration could never hash-match across engines).

    Scale shape: the edge list comes from the ONE order-keyed affinity
    exchange (`part_affinity_pairs`) and is materialized once; each
    iteration is a pure map over the directed edges (rank/degree
    lookups broadcast via ``ray.put``) followed by ONE coarse dst-keyed
    shuffle; the per-part rank vector is a #parts-bounded catalog
    domain (the `part_affinity_lift` marginals contract), so pulling it
    between iterations is a bounded driver pull, never corpus-sized.
    At a billion-part catalog, swap the pull for a broadcast-join of
    the materialized rank Dataset — the iteration structure is
    unchanged."""
    import numpy as np

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import lookup_np, make_lookup

    out_empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "pagerank": pa.array([], pa.float64())})

    edges = part_affinity_pairs(sf_dir, min_count)

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([
                batch.column("part_a").combine_chunks().cast(pa.int64()),
                batch.column("part_b").combine_chunks().cast(pa.int64())]),
            "dst": pa.concat_arrays([
                batch.column("part_b").combine_chunks().cast(pa.int64()),
                batch.column("part_a").combine_chunks().cast(pa.int64())]),
        })

    e = edges.map_batches(directed, batch_format="pyarrow").materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["src"]).group_by("src") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["src", "n"])

    deg = coarse_grouped_aggregate(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        "src", [("n", "sum", "deg")]).to_pandas()   # #parts-bounded pull
    if len(deg) == 0:
        return ray.data.from_arrow(out_empty)

    parts_np = deg["src"].to_numpy().astype(np.int64)
    deg_tab = make_lookup(deg["src"], deg["deg"])
    base = (1_000_000 * (d_den - d_num)) // d_den   # (1-d) in micro-units
    # r0 = 1.0 per node (micro): uniform start, unnormalized — rankings
    # are scale-free in the start vector
    r_tab = make_lookup(deg["src"],
                        np.full(len(deg), 1_000_000, dtype=np.int64))

    for _ in range(iters):
        ref = ray.put((r_tab, deg_tab))

        def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
            rt, dt = ray.get(_ref)
            src = batch.column("src")
            r_u = lookup_np(src, rt, default=0).astype(np.int64)
            deg_u = lookup_np(src, dt, default=1).astype(np.int64)
            c = (r_u * d_num) // (d_den * deg_u)    # exact floor division
            g = pa.table({"dst": batch.column("dst"),
                          "c": pa.array(c, pa.int64())}) \
                .group_by("dst").aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        nxt = coarse_grouped_aggregate(
            e.map_batches(contrib, batch_format="pyarrow"),
            "dst", [("c", "sum", "c")]).to_pandas()  # #parts-bounded pull
        sums = lookup_np(pa.array(parts_np, pa.int64()),
                         make_lookup(nxt["dst"], nxt["c"]),
                         default=0).astype(np.int64)
        r_tab = make_lookup(deg["src"], base + sums)

    r_final = lookup_np(pa.array(parts_np, pa.int64()), r_tab,
                        default=0).astype(np.int64)
    order = np.lexsort((parts_np, -r_final))[:top_k]
    return ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(parts_np[order], pa.int64()),
        "pagerank": pa.array(r_final[order].astype(np.float64) / 1e6,
                             pa.float64())}))


def part_skyline(sf_dir: str) -> "ray.data.Dataset":
    """Pareto frontier (skyline) of parts over two maximize dimensions —
    total discounted revenue and total shipped quantity: a part survives
    iff NO other part is >= in both and > in at least one (the classic
    multi-objective catalog-triage query; e.g. "which parts are
    undominated on volume x revenue").

    Scale shape: per-part exact-integer metrics from ONE coarse part
    shuffle; then the textbook distributed skyline — each block reduces
    to its LOCAL skyline in a pure map (local dominance implies global
    dominance, so no survivor is ever lost), and only the local
    survivors merge for the final sweep.  On random data a 2-d skyline
    is O(log n) expected, so the merged set is tiny; fully
    anti-correlated data degrades toward O(n) — if that bound bites,
    apply the same local-skyline map recursively (the merge step IS the
    map), which this implementation notes but does not need at any
    bundled scale.

    Dominance on exact integers (cents / unit counts) — ties on BOTH
    dimensions survive together on both engines; output is sorted
    (revenue desc, partkey asc)."""
    import numpy as np

    from ..functions.agg import coarse_grouped_aggregate

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_extendedprice",
                                       "l_discount", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "rev_c": rev_c,
                      "qty": pc.cast(batch.column("l_quantity"),
                                     pa.int64())})
        g = t.group_by("l_partkey").aggregate([("rev_c", "sum"),
                                               ("qty", "sum")])
        return g.rename_columns(["l_partkey", "rev_c", "qty"])

    per_part = coarse_grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        "l_partkey", [("rev_c", "sum", "rev_c"), ("qty", "sum", "qty")])

    def local_skyline(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        rev = batch.column("rev_c").to_numpy(zero_copy_only=False)
        qty = batch.column("qty").to_numpy(zero_copy_only=False)
        # sort rev desc, qty desc; survivor iff qty == max(qty | same rev)
        # AND qty > max(qty | rev strictly greater)
        order = np.lexsort((-qty, -rev))
        r, q = rev[order], qty[order]
        new_rev = np.r_[True, r[1:] != r[:-1]]
        gid = np.cumsum(new_rev) - 1                 # rev-group id per row
        # per-group max qty = the group's FIRST row (qty sorted desc)
        gmax = q[new_rev]
        # exclusive running max of gmax over STRICTLY-higher-rev groups
        hmax = np.r_[np.int64(np.iinfo(np.int64).min),
                     np.maximum.accumulate(gmax)[:-1]]
        keep = (q == gmax[gid]) & (gmax[gid] > hmax[gid])
        sel = order[keep]
        return pa.table({"l_partkey": pa.array(pk[sel], pa.int64()),
                         "rev_c": pa.array(rev[sel], pa.int64()),
                         "qty": pa.array(qty[sel], pa.int64())})

    survivors = per_part.map_batches(local_skyline,
                                     batch_format="pyarrow").to_pandas()
    out_empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64()),
                          "quantity": pa.array([], pa.int64())})
    if len(survivors) == 0:
        return ray.data.from_arrow(out_empty)
    merged = local_skyline(pa.table({
        "l_partkey": pa.array(survivors["l_partkey"].to_numpy(),
                              pa.int64()),
        "rev_c": pa.array(survivors["rev_c"].to_numpy(), pa.int64()),
        "qty": pa.array(survivors["qty"].to_numpy(), pa.int64())}))
    import pandas as pd_  # noqa: F401 (sorted output built Arrow-side)
    order = np.lexsort((merged.column("l_partkey").to_numpy(),
                        -merged.column("rev_c").to_numpy()))
    idx = pa.array(order, pa.int64())
    return ray.data.from_arrow(pa.table({
        "p_partkey": merged.column("l_partkey").take(idx),
        "revenue": pc.divide(pc.cast(merged.column("rev_c").take(idx),
                                     pa.float64(), safe=False), 100.0),
        "quantity": merged.column("qty").take(idx)}))


def join_key_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Join-key overlap discovery across the schema's candidate join
    pairs: for each (fact.key -> dim.key) pair, the distinct-key counts
    of both sides, the intersection size, both containment ratios and
    the Jaccard — the data-discovery profile (LSH-Ensemble / Aurum
    family) that tells a pipeline author whether a join is total,
    partial, or bogus BEFORE paying the shuffle, and the referential-
    integrity number (containment_a < 1.0 = dangling foreign keys).

    Scale shape: each table scans ONCE and emits per-batch DISTINCT
    (pair, key, in_fact, in_dim) rows for every role the table plays;
    one coarse shuffle hashed on the key co-locates a key's occurrences
    across both sides (max-combine the flags), then per-batch count
    partials reduce through a #pairs-sized groupby.  A zero-row seed
    per pair keeps all pairs present (and the schema typed) on empty
    input.  NULL keys drop on both engines (NULLs never join)."""
    from ray.data.aggregate import Sum
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6

    PAIR_NAMES = [
        "orders.o_custkey->customer.c_custkey",
        "lineitem.l_partkey->part.p_partkey",
        "lineitem.l_suppkey->supplier.s_suppkey",
        "lineitem.l_orderkey->orders.o_orderkey",
        "events.user_id->customer.c_custkey",
    ]
    # table -> [(pair_id, column, is_fact)]
    ROLES = {
        "lineitem": [(1, "l_partkey", True), (2, "l_suppkey", True),
                     (3, "l_orderkey", True)],
        "orders": [(0, "o_custkey", True), (3, "o_orderkey", False)],
        "customer": [(0, "c_custkey", False), (4, "c_custkey", False)],
        "part": [(1, "p_partkey", False)],
        "supplier": [(2, "s_suppkey", False)],
        "events": [(4, "user_id", True)],
    }

    def make_emit(roles):
        def emit(batch: pa.Table) -> pa.Table:
            parts = []
            for pid, col, is_fact in roles:
                keys = pc.unique(pc.drop_null(batch.column(col)))
                n = len(keys)
                parts.append(pa.table({
                    "pair_id": pa.array(np.full(n, pid, np.int64)),
                    "key": pc.cast(keys, pa.int64()),
                    "fa": pa.array(
                        np.full(n, 1 if is_fact else 0, np.int64)),
                    "fb": pa.array(
                        np.full(n, 0 if is_fact else 1, np.int64)),
                }))
            return pa.concat_tables(parts)
        return emit

    scans = []
    for table, roles in ROLES.items():
        cols = sorted({c for _, c, _ in roles})
        scans.append(sized_read_parquet(f"{sf_dir}/{table}.parquet",
                                        columns=cols)
                     .map_batches(make_emit(roles),
                                  batch_format="pyarrow"))
    tagged = scans[0].union(*scans[1:])

    per_key = coarse_grouped_aggregate(
        tagged, ["pair_id", "key"],
        [("fa", "max", "fa"), ("fb", "max", "fb")],
        hash_cols=["key"])

    def count_partial(batch: pa.Table) -> pa.Table:
        fa = batch.column("fa")
        fb = batch.column("fb")
        t = pa.table({
            "pair_id": batch.column("pair_id"),
            "pa_": fa,
            "pb_": fb,
            "pc_": pc.multiply(fa, fb),
        })
        g = t.group_by("pair_id").aggregate(
            [("pa_", "sum"), ("pb_", "sum"), ("pc_", "sum")])
        return g.rename_columns(["pair_id", "pa_", "pb_", "pc_"])

    seed = pa.table({
        "pair_id": pa.array(np.arange(len(PAIR_NAMES), dtype=np.int64)),
        "pa_": pa.array(np.zeros(len(PAIR_NAMES), np.int64)),
        "pb_": pa.array(np.zeros(len(PAIR_NAMES), np.int64)),
        "pc_": pa.array(np.zeros(len(PAIR_NAMES), np.int64)),
    })
    agg = (per_key.map_batches(count_partial, batch_format="pyarrow")
           .union(ray.data.from_arrow(seed))
           .groupby("pair_id")
           .aggregate(Sum("pa_", alias_name="n_a"),
                      Sum("pb_", alias_name="n_b"),
                      Sum("pc_", alias_name="n_common")))

    names = pa.array(PAIR_NAMES, pa.string())

    def finish(batch: pa.Table) -> pa.Table:
        pid = batch.column("pair_id").to_numpy().astype(np.int64)
        na = batch.column("n_a").to_numpy().astype(np.int64)
        nb = batch.column("n_b").to_numpy().astype(np.int64)
        ncm = batch.column("n_common").to_numpy().astype(np.int64)
        uni = na + nb - ncm
        with np.errstate(divide="ignore", invalid="ignore"):
            ca = np.where(na > 0, ncm.astype(np.float64) / na, np.nan)
            cb = np.where(nb > 0, ncm.astype(np.float64) / nb, np.nan)
            jc = np.where(uni > 0, ncm.astype(np.float64) / uni, np.nan)
        def _opt(v):
            arr = pa.array(v, pa.float64())
            return round6(pc.if_else(pa.array(np.isnan(v)),
                                     pa.scalar(None, pa.float64()), arr))
        return pa.table({
            "pair": names.take(pa.array(pid, pa.int64())),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "n_common": pa.array(ncm, pa.int64()),
            "containment_a": _opt(ca),
            "containment_b": _opt(cb),
            "jaccard": _opt(jc),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def part_triangles(sf_dir: str, min_count: int = 2) -> "ray.data.Dataset":
    """Exact triangle counting + local clustering coefficient over the
    co-purchase part graph (parts linked when they share >= ``min_count``
    orders) — the graph-density / community-cohesion measure the
    affinity family lacks (pagerank ranks hubs, components find groups;
    triangles say how CLIQUISH a neighborhood is).  Output one row per
    graph node: (p_partkey, degree, n_triangles, clustering) with
    clustering = 2T/(d(d-1)), pinned 0.0 for degree < 2.

    Distributed shape — the classic degree-oriented wedge-join (Cohen's
    MapReduce triangle algorithm, Suri-Vassilvitskii's orientation
    bound): each undirected edge orients from its (degree, id)-smaller
    endpoint, bounding out-degree by O(sqrt(m)); a src-keyed coarse
    shuffle emits each apex's out-neighbor pairs size-grouped (the
    _affinity_exchange triu idiom — per-apex cost quadratic in OUT
    degree, never corpus size); wedges and oriented edges co-shuffle on
    the packed (v<<32 | w) closing-key and a segment scan marks closed
    wedges, pre-reducing per-part increments inside the bucket.  Degrees
    and the final per-part rollup are #parts-bounded (catalog domain,
    the part_affinity_lift marginal-broadcast rationale) so they
    broadcast / assemble driver-side; every corpus-sized exchange is
    coarse-bucketed.

    The triangle SET is orientation-invariant, so the SQL twin counts
    the same triangles with plain key-order enumeration."""
    from ray.data.aggregate import Sum
    from ..functions.agg import (_GOLDEN, _default_num_coarse,
                                 coarse_grouped_aggregate)

    nc = _default_num_coarse()
    pairs = part_affinity_pairs(sf_dir, min_count=min_count) \
        .map_batches(lambda b: b.select(["part_a", "part_b"]),
                     batch_format="pyarrow").materialize()

    # --- degree rollup (#parts-bounded) -> sorted-array broadcast ---
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column("part_a").to_numpy(zero_copy_only=False),
            batch.column("part_b").to_numpy(zero_copy_only=False),
        ]).astype(np.int64)
        u, c = np.unique(both, return_counts=True)
        return pa.table({"part": pa.array(u, pa.int64()),
                         "pd": pa.array(c, pa.int64())})

    deg_ds = coarse_grouped_aggregate(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        "part", [("pd", "sum", "degree")])
    deg_tab = pa.concat_tables(
        [pa.table({"part": pa.array([], pa.int64()),
                   "degree": pa.array([], pa.int64())})]
        + list(deg_ds.iter_batches(batch_format="pyarrow")))
    parts_np = deg_tab.column("part").to_numpy().astype(np.int64)
    deg_np = deg_tab.column("degree").to_numpy().astype(np.int64)
    order = np.argsort(parts_np)
    parts_np, deg_np = parts_np[order], deg_np[order]
    pk_ref, dg_ref = ray.put(parts_np), ray.put(deg_np)

    empty_final = pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "degree": pa.array([], pa.int64()),
        "n_triangles": pa.array([], pa.int64()),
        "clustering": pa.array([], pa.float64()),
    })
    if len(parts_np) == 0:
        return ray.data.from_arrow(empty_final)

    def orient(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        degs = ray.get(dg_ref)
        a = batch.column("part_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("part_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        da = degs[np.searchsorted(keys, a)]
        db = degs[np.searchsorted(keys, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddeg = np.where(a_first, db, da)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ddeg": pa.array(ddeg, pa.int64()),
            "ekey": pa.array((src << 32) | dst, pa.int64()),
            "__coarse": pa.array((src * _GOLDEN) % nc, pa.int64()),
        })

    oriented = pairs.map_batches(orient, batch_format="pyarrow") \
        .materialize()

    empty_m = pa.table({"mkey": pa.array([], pa.int64()),
                        "apex": pa.array([], pa.int64()),
                        "is_edge": pa.array([], pa.int8()),
                        "__mcoarse": pa.array([], pa.int64())})

    def wedge_gen(group: pa.Table) -> pa.Table:
        """One src bucket: out-neighbor pairs per apex, neighbors sorted
        by the SAME (deg, id) total order as the edge orientation so the
        packed wedge key equals the closing edge's key when it exists."""
        if group.num_rows == 0:
            return empty_m
        idx = pc.sort_indices(group, sort_keys=[
            ("src", "ascending"), ("ddeg", "ascending"),
            ("dst", "ascending")])
        g = group.take(idx)
        src = g.column("src").to_numpy()
        dst = g.column("dst").to_numpy()
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        vs, ws, aps = [], [], []
        for out_deg in np.unique(sizes[sizes >= 2]):
            segs = starts[sizes == out_deg]
            ii, jj = np.triu_indices(int(out_deg), k=1)
            vs.append(dst[(segs[:, None] + ii[None, :]).ravel()])
            ws.append(dst[(segs[:, None] + jj[None, :]).ravel()])
            aps.append(np.repeat(src[segs], len(ii)))
        if not vs:
            return empty_m
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        apex = np.concatenate(aps)
        mkey = (v << 32) | w
        return pa.table({
            "mkey": pa.array(mkey, pa.int64()),
            "apex": pa.array(apex, pa.int64()),
            "is_edge": pa.array(np.zeros(len(mkey), np.int8)),
            "__mcoarse": pa.array((mkey * _GOLDEN) % nc, pa.int64()),
        })

    wedges = oriented.groupby("__coarse") \
        .map_groups(wedge_gen, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        ek = batch.column("ekey").to_numpy().astype(np.int64)
        return pa.table({
            "mkey": pa.array(ek, pa.int64()),
            "apex": pa.array(np.zeros(len(ek), np.int64)),
            "is_edge": pa.array(np.ones(len(ek), np.int8)),
            "__mcoarse": pa.array((ek * _GOLDEN) % nc, pa.int64()),
        })

    edge_stream = oriented.map_batches(edge_rows, batch_format="pyarrow")

    empty_cnt = pa.table({"part": pa.array([], pa.int64()),
                          "pn": pa.array([], pa.int64())})

    def match_kernel(group: pa.Table) -> pa.Table:
        """One closing-key bucket: wedges whose key is an edge key close a
        triangle; emit per-part increment partials (apex + both endpoints
        unpacked from the key), pre-reduced inside the bucket."""
        if group.num_rows == 0:
            return empty_cnt
        k = group.column("mkey").to_numpy().astype(np.int64)
        is_e = group.column("is_edge").to_numpy().astype(bool)
        ek = np.unique(k[is_e])
        wk = k[~is_e]
        if len(ek) == 0 or len(wk) == 0:
            return empty_cnt
        pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        closed = ek[pos] == wk
        if not closed.any():
            return empty_cnt
        ck = wk[closed]
        apex = group.column("apex").to_numpy().astype(np.int64)[
            ~is_e][closed]
        tri_parts = np.concatenate([apex, ck >> 32, ck & 0xFFFFFFFF])
        u, c = np.unique(tri_parts, return_counts=True)
        return pa.table({"part": pa.array(u, pa.int64()),
                         "pn": pa.array(c, pa.int64())})

    tri = coarse_grouped_aggregate(
        wedges.union(edge_stream).groupby("__mcoarse")
        .map_groups(match_kernel, batch_format="pyarrow"),
        "part", [("pn", "sum", "n_triangles")])
    tri_tab = pa.concat_tables(
        [empty_cnt.rename_columns(["part", "n_triangles"])]
        + list(tri.iter_batches(batch_format="pyarrow")))

    # final assembly over the #parts-bounded node table (driver-side by
    # the same catalog-domain bound as the degree broadcast)
    tparts = tri_tab.column("part").to_numpy().astype(np.int64)
    tcnt = tri_tab.column("n_triangles").to_numpy().astype(np.int64)
    torder = np.argsort(tparts)
    tparts, tcnt = tparts[torder], tcnt[torder]
    nt = np.zeros(len(parts_np), np.int64)
    if len(tparts):
        pos = np.minimum(np.searchsorted(tparts, parts_np),
                         len(tparts) - 1)
        hit = tparts[pos] == parts_np
        nt[hit] = tcnt[pos[hit]]
    from ..functions.num import round6
    with np.errstate(divide="ignore", invalid="ignore"):
        cl = np.where(deg_np >= 2,
                      nt.astype(np.float64) * 2.0
                      / (deg_np * (deg_np - 1)), 0.0)
    return ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(parts_np, pa.int64()),
        "degree": pa.array(deg_np, pa.int64()),
        "n_triangles": pa.array(nt, pa.int64()),
        "clustering": round6(pa.array(cl, pa.float64())),
    }))


def part_coreness(sf_dir: str, min_count: int = 2,
                  max_rounds: int = 64) -> "ray.data.Dataset":
    """k-core decomposition of the co-purchase part graph: every node's
    CORENESS (the largest k such that the node survives in the k-core) —
    the degeneracy-ordering signal that separates structurally-embedded
    products from incidentally-popular ones, completing the graph suite
    (pagerank = centrality, components = membership, triangles =
    cohesion, coreness = depth).  Output (p_partkey, degree, coreness).

    Algorithm — iterated neighborhood H-index (Lu, Zhou, Zhang, Stanley
    2016, "The H-index of a network node and its relation to degree and
    coreness"): start h = degree and repeatedly set h(v) to the H-index
    of its neighbors' h values; the sequence is monotone non-increasing
    and converges EXACTLY to coreness — peeling with no sequential
    dependency, so each round is one data-parallel pass.

    Scale shape: the edge list shuffles ONCE into an adjacency-list
    table (one row per node, dsts as a list column — a row is atomic, so
    later block splits can never cut a neighborhood); every round is
    then a PURE MAP over that materialized table (flatten + broadcast
    gather + segmented rank count, fully vectorized) with the
    #parts-bounded node->h array pulled and re-broadcast per round (the
    part_affinity_lift marginal rationale).  Convergence = exact integer
    checksum (sum of h, monotone), ``max_rounds`` a loud upper bound.

    SQL twin: the same H-index iteration unrolled as a generated
    64-round (max_rounds) chained CTE (idempotent past the fixpoint, so SQL
    rounds equal the engine's early-exit result);
    tests/test_part_coreness.py additionally pins exact equality
    against a single-node Batagelj-Zaversnik peeling reference and a
    hand-computed clique+pendant graph."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    pairs = part_affinity_pairs(sf_dir, min_count=min_count) \
        .map_batches(lambda b: b.select(["part_a", "part_b"]),
                     batch_format="pyarrow")

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("part_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("part_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "__coarse": pa.array((src * _GOLDEN) % nc, pa.int64()),
        })

    empty_adj = pa.table({
        "part": pa.array([], pa.int64()),
        "dsts": pa.array([], pa.list_(pa.int64()))})

    def build_adj(group: pa.Table) -> pa.Table:
        """One src bucket -> one adjacency row per node (row-atomic)."""
        if group.num_rows == 0:
            return empty_adj
        s = group.column("src").to_numpy().astype(np.int64)
        d = group.column("dst").to_numpy().astype(np.int64)
        o = np.argsort(s, kind="stable")
        s, d = s[o], d[o]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        bounds = np.r_[starts, len(s)].astype(np.int64)
        return pa.table({
            "part": pa.array(s[starts], pa.int64()),
            "dsts": pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()) if len(s) < 2**31
                else pa.array(bounds, pa.int64()),
                pa.array(d, pa.int64())),
        })

    adj = pairs.map_batches(both_dirs, batch_format="pyarrow") \
        .groupby("__coarse") \
        .map_groups(build_adj, batch_format="pyarrow").materialize()

    def pull_nodes(ds) -> "tuple[np.ndarray, np.ndarray]":
        t = pa.concat_tables(
            [pa.table({"part": pa.array([], pa.int64()),
                       "h": pa.array([], pa.int64())})]
            + [b.select(["part", "h"])
               for b in ds.iter_batches(batch_format="pyarrow")])
        p = t.column("part").to_numpy().astype(np.int64)
        h = t.column("h").to_numpy().astype(np.int64)
        o = np.argsort(p)
        return p[o], h[o]

    def deg_map(batch: pa.Table) -> pa.Table:
        return pa.table({
            "part": batch.column("part"),
            "h": pc.cast(pc.list_value_length(batch.column("dsts")),
                         pa.int64())})

    parts_np, deg_np = pull_nodes(
        adj.map_batches(deg_map, batch_format="pyarrow"))
    empty_out = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "degree": pa.array([], pa.int64()),
                          "coreness": pa.array([], pa.int64())})
    if len(parts_np) == 0:
        return ray.data.from_arrow(empty_out)

    h_np = deg_np.copy()
    checksum = int(h_np.sum())
    for _ in range(max_rounds):
        pk_ref = ray.put(parts_np)
        h_ref = ray.put(h_np)

        def hindex_map(batch: pa.Table) -> pa.Table:
            """Pure map: H-index of each row's neighbor-h multiset."""
            keys = ray.get(pk_ref)
            hv = ray.get(h_ref)
            dsts = batch.column("dsts")
            if isinstance(dsts, pa.ChunkedArray):
                dsts = dsts.combine_chunks()
            flat = pc.list_flatten(dsts).to_numpy().astype(np.int64)
            par = pc.list_parent_indices(dsts).to_numpy() \
                .astype(np.int64)
            nh = hv[np.searchsorted(keys, flat)]
            o = np.lexsort((-nh, par))
            par_s, nh_s = par[o], nh[o]
            starts = np.flatnonzero(np.r_[True, par_s[1:] != par_s[:-1]])
            sizes = np.diff(np.r_[starts, len(par_s)])
            rank = np.arange(len(par_s), dtype=np.int64) \
                - np.repeat(starts, sizes) + 1
            ok = (nh_s >= rank).astype(np.int64)
            csum = np.r_[0, np.cumsum(ok)]
            bounds = np.r_[starts, len(par_s)]
            hnew = np.diff(csum[bounds])
            return pa.table({"part": batch.column("part"),
                             "h": pa.array(hnew, pa.int64())})

        parts_new, h_new = pull_nodes(
            adj.map_batches(hindex_map, batch_format="pyarrow"))
        assert np.array_equal(parts_new, parts_np)
        h_np = h_new
        new_sum = int(h_np.sum())
        if new_sum == checksum:
            break
        checksum = new_sum
    else:
        raise RuntimeError(
            f"part_coreness did not converge in {max_rounds} rounds")

    return ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(parts_np, pa.int64()),
        "degree": pa.array(deg_np, pa.int64()),
        "coreness": pa.array(h_np, pa.int64()),
    }))


def join_overlap_hll(sf_dir: str, p: int = 12) -> "ray.data.Dataset":
    """Sketch twin of ``join_key_overlap``: the same five candidate join
    pairs profiled with HyperLogLog SET ALGEBRA instead of an exact
    distinct-key shuffle — |A| and |B| from each side's registers,
    |A∪B| from their elementwise max, |A∩B| by inclusion-exclusion —
    so the whole discovery pass is SHUFFLE-FREE: one aggregation tree
    per table scan, 4 KB of registers per (pair, side) to the driver,
    nothing keyed ever moves.  At 100 TB this is the affordable first
    pass; the exact operator confirms the pairs the sketch shortlists.

    Output mirrors the exact op (est_* columns, 6dp): (pair, est_n_a,
    est_n_b, est_common, containment_a, containment_b, jaccard).
    Deterministic (splitmix64 hashing — no RNG state), so the driver's
    rows-only check is stable; tests/test_join_key_overlap.py bounds the
    estimates against the exact operator."""
    from ..functions.num import round6
    from ..functions.sketches import HLL, make_hll_aggregator

    PAIR_NAMES = [
        "orders.o_custkey->customer.c_custkey",
        "lineitem.l_partkey->part.p_partkey",
        "lineitem.l_suppkey->supplier.s_suppkey",
        "lineitem.l_orderkey->orders.o_orderkey",
        "events.user_id->customer.c_custkey",
    ]
    ROLES = {
        "lineitem": [(1, "l_partkey", "a"), (2, "l_suppkey", "a"),
                     (3, "l_orderkey", "a")],
        "orders": [(0, "o_custkey", "a"), (3, "o_orderkey", "b")],
        "customer": [(0, "c_custkey", "b"), (4, "c_custkey", "b")],
        "part": [(1, "p_partkey", "b")],
        "supplier": [(2, "s_suppkey", "b")],
        "events": [(4, "user_id", "a")],
    }
    regs = {}
    for table, roles in ROLES.items():
        cols = sorted({c for _, c, _ in roles})
        ds = sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)
        aggs = [make_hll_aggregator(c, p=p, name=f"{pid}_{side}",
                                    raw_registers=True)
                for pid, c, side in roles]
        res = ds.aggregate(*aggs) or {}
        for pid, c, side in roles:
            acc = res.get(f"{pid}_{side}")
            regs[(pid, side)] = (np.frombuffer(acc, np.uint8)
                                 if acc is not None
                                 else np.zeros(1 << p, np.uint8))

    def est(r: np.ndarray) -> float:
        h = HLL(p)
        h.merge_registers(r)
        return h.estimate()

    rows = {"pair": [], "est_n_a": [], "est_n_b": [], "est_common": [],
            "containment_a": [], "containment_b": [], "jaccard": []}
    for pid, pname in enumerate(PAIR_NAMES):
        ra, rb = regs[(pid, "a")], regs[(pid, "b")]
        ea, eb = est(ra), est(rb)
        eu = est(np.maximum(ra, rb))
        ei = max(ea + eb - eu, 0.0)
        rows["pair"].append(pname)
        rows["est_n_a"].append(ea)
        rows["est_n_b"].append(eb)
        rows["est_common"].append(ei)
        rows["containment_a"].append(ei / ea if ea > 0 else None)
        rows["containment_b"].append(ei / eb if eb > 0 else None)
        rows["jaccard"].append(ei / eu if eu > 0 else None)
    return ray.data.from_arrow(pa.table({
        "pair": pa.array(rows["pair"], pa.string()),
        "est_n_a": round6(pa.array(rows["est_n_a"], pa.float64())),
        "est_n_b": round6(pa.array(rows["est_n_b"], pa.float64())),
        "est_common": round6(pa.array(rows["est_common"], pa.float64())),
        "containment_a": round6(pa.array(rows["containment_a"],
                                         pa.float64())),
        "containment_b": round6(pa.array(rows["containment_b"],
                                         pa.float64())),
        "jaccard": round6(pa.array(rows["jaccard"], pa.float64())),
    }))


def supplier_latency_trend(sf_dir: str,
                           num_partitions: "int | None" = None
                           ) -> "ray.data.Dataset":
    """Per-GROUP ordinary-least-squares trend — the operator class the
    suite lacked (forecast_revenue regresses globally): for every
    supplier, the OLS slope of order-to-ship latency (days) over order
    date (days since 1992-01-01, the TPC-H epoch — recentring keeps the
    integer moments small), plus the mean latency.  A positive slope is
    a supplier whose fulfillment is DEGRADING — the procurement-alarm
    query.  Output (l_suppkey, n, latency_slope, mean_latency);
    single-point or zero-variance suppliers get NULL slope.

    Exactness: both engines accumulate the five integer sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) — per-batch Arrow partials, ONE
    coarse supplier shuffle — and compute slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) as a single double division of exact int64 moments
    (midnight-aligned timestamps make integer-µs division exact days).
    lineitem joins orders through the size-ruled join, same as
    ship_latency_percentiles."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import sized_join
    from ..functions.num import round6

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_suppkey",
                                       "l_shipdate"])
    joined = sized_join(line, f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderdate"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    day_us = 86_400_000_000
    epoch_1992 = 8035                     # days 1970-01-01 -> 1992-01-01

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("o_orderdate")),
            pc.is_valid(batch.column("l_shipdate"))))
        od = pc.divide(batch.column("o_orderdate").cast(pa.int64()),
                       day_us)
        x = pc.subtract(od, epoch_1992).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = pc.divide(pc.subtract(
            batch.column("l_shipdate").cast(pa.int64()),
            batch.column("o_orderdate").cast(pa.int64())), day_us) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            "l_suppkey": batch.column("l_suppkey"),
            "pn": pa.array(np.ones(len(x), np.int64)),
            "psx": pa.array(x, pa.int64()),
            "psy": pa.array(y, pa.int64()),
            "psxy": pa.array(x * y, pa.int64()),
            "psxx": pa.array(x * x, pa.int64()),
        })
        g = t.group_by("l_suppkey").aggregate(
            [("pn", "sum"), ("psx", "sum"), ("psy", "sum"),
             ("psxy", "sum"), ("psxx", "sum")])
        return g.rename_columns(["l_suppkey", "pn", "psx", "psy",
                                 "psxy", "psxx"])

    per_supp = coarse_grouped_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        "l_suppkey", [("pn", "sum", "n"), ("psx", "sum", "sx"),
                      ("psy", "sum", "sy"), ("psxy", "sum", "sxy"),
                      ("psxx", "sum", "sxx")])

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "latency_slope": pa.array([], pa.float64()),
                          "mean_latency": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        n = batch.column("n").to_numpy().astype(np.int64)
        sx = batch.column("sx").to_numpy().astype(np.int64)
        sy = batch.column("sy").to_numpy().astype(np.int64)
        sxy = batch.column("sxy").to_numpy().astype(np.int64)
        sxx = batch.column("sxx").to_numpy().astype(np.int64)
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = num.astype(np.float64) / den
        slope_arr = round6(pa.array(
            np.where(den > 0, slope, 0.0), pa.float64(),
            mask=(den <= 0)))
        return pa.table({
            "l_suppkey": batch.column("l_suppkey"),
            "n": batch.column("n"),
            "latency_slope": slope_arr,
            "mean_latency": round6(pa.array(
                sy.astype(np.float64) / n, pa.float64())),
        })

    return per_supp.map_batches(finish, batch_format="pyarrow")


def open_orders_timeline(sf_dir: str) -> "ray.data.Dataset":
    """Sweep-line interval stabbing — the operator class the suite
    lacked: how many orders are OPEN (placed but not fully shipped) on
    each day the count changes.  An order's interval runs from its
    order date to its LAST lineitem ship date; the timeline is the
    classic delta trick (+1 at start, -1 past the end, running sum) —
    no per-day explosion, no interval self-join.  Output one row per
    change day: (day, open_orders, net_change), day = epoch days.

    Scale shape: the two fact scans reduce per batch to (orderkey,
    order-day / max-ship-day) partials and meet in ONE coarse orderkey
    shuffle (inner-join semantics: either side missing drops, matching
    the twin's JOIN); each bucket emits per-DAY delta partials, which
    reduce through a date-domain-bounded day groupby (~2,500 distinct
    days at any corpus size — that bound is what makes the final
    single-partition cumulative walk safe).  Integer day arithmetic
    throughout (midnight-aligned timestamps)."""
    from ray.data.aggregate import Sum
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    day_us = 86_400_000_000
    SENT = np.int64(np.iinfo(np.int64).min)

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"])
    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])

    def ship_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("l_shipdate")))
        d1 = pc.divide(batch.column("l_shipdate").cast(pa.int64()),
                       day_us)
        g = pa.table({"okey": batch.column("l_orderkey"), "d1": d1}) \
            .group_by("okey").aggregate([("d1", "max")])
        okey = g.column("okey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "okey": pa.array(okey, pa.int64()),
            "d0": pa.array(np.full(len(okey), SENT), pa.int64()),
            "d1": g.column("d1_max"),
            "__coarse": pa.array((okey * _GOLDEN) % nc, pa.int64())})

    def order_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("o_orderdate")))
        okey = batch.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "okey": pa.array(okey, pa.int64()),
            "d0": pc.divide(batch.column("o_orderdate").cast(pa.int64()),
                            day_us),
            "d1": pa.array(np.full(len(okey), SENT), pa.int64()),
            "__coarse": pa.array((okey * _GOLDEN) % nc, pa.int64())})

    tagged = line.map_batches(ship_partial, batch_format="pyarrow") \
        .union(orders.map_batches(order_partial, batch_format="pyarrow"))

    empty_d = pa.table({"day": pa.array([], pa.int64()),
                        "pdelta": pa.array([], pa.int64())})

    def deltas(group: pa.Table) -> pa.Table:
        """One orderkey bucket: per-order (d0, max d1), inner-join drop,
        then per-day delta partials."""
        if group.num_rows == 0:
            return empty_d
        g = group.group_by("okey").aggregate([("d0", "max"),
                                              ("d1", "max")])
        d0 = g.column("d0_max").to_numpy().astype(np.int64)
        d1 = g.column("d1_max").to_numpy().astype(np.int64)
        keep = (d0 != SENT) & (d1 != SENT)
        d0, d1 = d0[keep], d1[keep]
        days = np.concatenate([d0, d1 + 1])
        dl = np.concatenate([np.ones(len(d0), np.int64),
                             np.full(len(d1), -1, np.int64)])
        u, inv = np.unique(days, return_inverse=True)
        net = np.zeros(len(u), np.int64)
        np.add.at(net, inv, dl)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "pdelta": pa.array(net, pa.int64())})

    per_day = (tagged.groupby("__coarse")
               .map_groups(deltas, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("pdelta", alias_name="net_change")))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "open_orders": pa.array([], pa.int64()),
                          "net_change": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch.column("day"))
        b = batch.take(idx)
        net = b.column("net_change").to_numpy().astype(np.int64)
        return pa.table({
            "day": b.column("day"),
            "open_orders": pa.array(np.cumsum(net), pa.int64()),
            "net_change": b.column("net_change"),
        })

    # date-domain-bounded (~2,500 rows) -> single-partition walk
    return per_day.repartition(1).map_batches(finish,
                                              batch_format="pyarrow")


def parquet_storage_profile(sf_dir: str,
                            table: str = "lineitem") -> "ray.data.Dataset":
    """Storage-planning profile from parquet FOOTERS ONLY — zero data
    scan: per column, row-group count, value count, compressed /
    uncompressed bytes and the compression ratio.  The numbers that
    decide column pruning, row-group sizing and codec choices BEFORE any
    pipeline reads a byte — and the demonstration that metadata
    pushdown, not scanning, answers layout questions at 100 TB.

    Scale shape: the work unit is a FILE, not a row — a Dataset of file
    paths maps to footer summaries (pyarrow reads only the footer;
    O(KB) per file regardless of file size), and per-column partials
    reduce through a #columns-bounded groupby.  DuckDB twin reads the
    same footers via ``parquet_metadata()``."""
    import glob as _glob
    import os
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    path = f"{sf_dir}/{table}.parquet"
    files = sorted(_glob.glob(path)) if "*" in path else (
        [path] if os.path.exists(path) else sorted(
            _glob.glob(os.path.join(path, "*.parquet"))))
    empty_out = pa.table({
        "column_name": pa.array([], pa.string()),
        "n_row_groups": pa.array([], pa.int64()),
        "n_values": pa.array([], pa.int64()),
        "compressed_bytes": pa.array([], pa.int64()),
        "uncompressed_bytes": pa.array([], pa.int64()),
        "compression_ratio": pa.array([], pa.float64()),
    })
    if not files:
        return ray.data.from_arrow(empty_out)

    def footer(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        names, nrg, nv, cb, ub = [], [], [], [], []
        for f in batch.column("path").to_pylist():   # files, not rows
            md = pq.read_metadata(f)
            agg = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    a = agg.setdefault(c.path_in_schema, [0, 0, 0, 0])
                    a[0] += 1
                    a[1] += c.num_values
                    a[2] += c.total_compressed_size
                    a[3] += c.total_uncompressed_size
            for k, v in agg.items():
                names.append(k)
                nrg.append(v[0])
                nv.append(v[1])
                cb.append(v[2])
                ub.append(v[3])
        return pa.table({
            "column_name": pa.array(names, pa.string()),
            "pn": pa.array(nrg, pa.int64()),
            "pv": pa.array(nv, pa.int64()),
            "pc_": pa.array(cb, pa.int64()),
            "pu": pa.array(ub, pa.int64())})

    agg = (ray.data.from_arrow(pa.table({"path": pa.array(files,
                                                          pa.string())}))
           .map_batches(footer, batch_format="pyarrow")
           .groupby("column_name")
           .aggregate(Sum("pn", alias_name="n_row_groups"),
                      Sum("pv", alias_name="n_values"),
                      Sum("pc_", alias_name="compressed_bytes"),
                      Sum("pu", alias_name="uncompressed_bytes")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_out
        cb = batch.column("compressed_bytes").to_numpy() \
            .astype(np.float64)
        ub = batch.column("uncompressed_bytes").to_numpy() \
            .astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(cb > 0, ub / cb, 0.0)
        return pa.table({
            "column_name": batch.column("column_name"),
            "n_row_groups": batch.column("n_row_groups"),
            "n_values": batch.column("n_values"),
            "compressed_bytes": batch.column("compressed_bytes"),
            "uncompressed_bytes": batch.column("uncompressed_bytes"),
            "compression_ratio": round6(pa.array(ratio, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """Full CUBE(nation, o_orderpriority) over order revenue — ALL FOUR
    grouping sets ((nation, priority), (nation), (priority), ()) from
    one pass, completing the OLAP-subtotal family (nation_year_rollup
    covers ROLLUP's three): detail cells, both one-dimensional margins
    and the grand total land in a single result, the cross-tab a BI
    layer pivots without re-querying.

    Same machinery as the ROLLUP: each batch emits partials for every
    grouping set (4x the rows of a plain group, all pre-combined), the
    rolled-up key positions travel as sentinels ("" — Ray's sort-based
    group partitioning cannot order NULL keys) and the finish map
    restores SQL CUBE's NULLs.  Exact cents throughout."""
    from ray.data.aggregate import Sum
    from ..functions.joins import broadcast_join, read_small_table

    cust = read_small_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
    nation = read_small_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey",
                    right_keys="n_nationkey") \
              .select(["c_custkey", "n_name"])

    ds = sized_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"])
    joined = broadcast_join(ds, dim, on="o_custkey",
                            right_on="c_custkey",
                            select=["n_name", "o_totalprice",
                                    "o_orderpriority"])

    def partial(batch: pa.Table) -> pa.Table:
        nat = batch.column("n_name").combine_chunks() \
            if isinstance(batch.column("n_name"), pa.ChunkedArray) \
            else batch.column("n_name")
        pri = batch.column("o_orderpriority").combine_chunks() \
            if isinstance(batch.column("o_orderpriority"),
                          pa.ChunkedArray) \
            else batch.column("o_orderpriority")
        cents = _cents(batch.column("o_totalprice"))
        cents = cents.combine_chunks() \
            if isinstance(cents, pa.ChunkedArray) else cents
        blank = pa.array([""] * batch.num_rows, pa.string())
        t = pa.table({
            "nation_s": pa.concat_arrays([nat, nat, blank, blank]),
            "priority_s": pa.concat_arrays([pri, blank, pri, blank]),
            "cents": pa.concat_arrays([cents] * 4),
        })
        g = t.group_by(["nation_s", "priority_s"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["nation_s", "priority_s",
                                 "partial_cents", "partial_n"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby(["nation_s", "priority_s"])
           .aggregate(Sum("partial_n", alias_name="n_orders"),
                      Sum("partial_cents", alias_name="cents")))

    def finish(batch: pa.Table) -> pa.Table:
        nat = batch.column("nation_s")
        pri = batch.column("priority_s")
        return pa.table({
            "nation": pc.if_else(pc.equal(nat, ""),
                                 pa.scalar(None, pa.string()), nat),
            "priority": pc.if_else(pc.equal(pri, ""),
                                   pa.scalar(None, pa.string()), pri),
            "n_orders": batch.column("n_orders"),
            "total_price": pc.divide(
                pc.cast(batch.column("cents"), pa.float64(), safe=False),
                100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def shipmode_priority_counts(sf_dir: str, date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01",
                             num_partitions: "int | None" = None
                             ) -> "ray.data.Dataset":
    """TPC-H Q12 shape — the last of the 22 query shapes (this corpus's
    lineitem carries no l_shipmode/l_receiptdate, so the category is
    ``l_linestatus`` and the window predicate is on ``l_shipdate``): per
    line-status, how many line items in the window belong to
    high-priority orders (1-URGENT / 2-HIGH) vs everything else — the
    dual conditional count over a fact→fact join that Q12 exercises.

    Scale shape: the fact scan prunes to three columns and applies the
    date window per batch BEFORE the join; the size-based join rule
    attaches (o_orderkey, o_orderpriority) (broadcast under the 128 MB
    metadata estimate, partitioned hash join above it); per-batch
    conditional partials reduce every block to ≤ |linestatus| rows, so
    the final groupby moves a handful of rows."""
    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_linestatus",
                                       "l_shipdate"])
    lo = pa.scalar(pd.Timestamp(date_from), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_to), pa.timestamp("us"))

    def window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch.column("l_shipdate"), lo),
                       pc.less(batch.column("l_shipdate"), hi))
        return batch.filter(keep).select(["l_orderkey", "l_linestatus"])

    joined = sized_join(line.map_batches(window, batch_format="pyarrow"),
                        f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderpriority"],
                        on="l_orderkey", right_on="o_orderkey",
                        num_partitions=num_partitions)
    high_set = pa.array(["1-URGENT", "2-HIGH"], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        high = pc.cast(pc.is_in(batch.column("o_orderpriority"),
                                value_set=high_set), pa.int64())
        t = pa.table({"linestatus": batch.column("l_linestatus"),
                      "high": high,
                      "low": pc.subtract(pa.scalar(1, pa.int64()), high)})
        g = t.group_by("linestatus").aggregate([("high", "sum"),
                                                ("low", "sum")])
        return g.rename_columns(["linestatus", "high", "low"])

    # typed empty seed: a ship window outside the data range yields zero
    # rows and Ray drops the schema; the union pins it
    seed = pa.table({"linestatus": pa.array([], pa.string()),
                     "high_line_count": pa.array([], pa.int64()),
                     "low_line_count": pa.array([], pa.int64())})
    return ray.data.from_arrow(seed).union(
        joined.map_batches(partial, batch_format="pyarrow")
              .groupby("linestatus")
              .aggregate(Sum("high", alias_name="high_line_count"),
                         Sum("low", alias_name="low_line_count")))


def target_encode_priority(sf_dir: str, m: float = 20.0) -> "ray.data.Dataset":
    """Smoothed target encoding (the m-estimate) of ``o_orderpriority``
    against order value — the categorical→numeric feature transform a
    tabular-ML training pipeline runs before export:
    ``te = (sum_cat + m·global_mean) / (n_cat + m)`` shrinks small
    categories toward the global mean.

    Scale shape: the aggregate-then-rejoin-to-fact pattern
    (small_quantity_revenue's shape) — pass 1 reduces the fact scan to
    per-category exact-cents partials (≤ |priorities| rows per block,
    tiny rollup, driver pull bounded by the category vocabulary);
    the encodings are computed once, broadcast, and pass 2 is a PURE MAP
    attaching the feature by dictionary index — no shuffle anywhere.

    Bit-parity: category sums are exact int64 cents; the m-estimate is
    evaluated in the twin's exact operation order (cents/100.0, the
    global mean's two divisions, one final division) and rounded to
    6dp."""
    from ..functions.num import round6

    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]

    def partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                       "cents": _cents(batch.column("o_totalprice"))})
             .group_by("o_orderpriority")
             .aggregate([("cents", "sum"), ([], "count_all")]))
        return g.rename_columns(["o_orderpriority", "pc", "pn"])

    agg = (sized_read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderpriority", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("pc", alias_name="cents"),
                      Sum("pn", alias_name="n")))
    # bounded driver pull: one row per category (5 here; a categorical
    # vocabulary by definition — never corpus-sized)
    rows = agg.take_all()
    cats = [r["o_orderpriority"] for r in rows]
    if cats:
        tc = sum(int(r["cents"]) for r in rows)
        tn = sum(int(r["n"]) for r in rows)
        gm = (tc / 100.0) / tn
        te = round6(pa.array(
            [((int(r["cents"]) / 100.0) + m * gm) / (int(r["n"]) + m)
             for r in rows], pa.float64()))
    else:
        te = pa.array([], pa.float64())
    cat_arr = pa.array(cats, pa.string())

    def encode(batch: pa.Table) -> pa.Table:
        pri = batch.column("o_orderpriority")
        idx = pc.index_in(pri, value_set=cat_arr)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "o_orderpriority": pri,
                         "te_priority": te.take(idx)})

    return (sized_read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
            .map_batches(encode, batch_format="pyarrow"))


def part_adamic_adar(sf_dir: str, min_count: int = 2, k: int = 50,
                     max_center_degree: int = 256) -> "ray.data.Dataset":
    """Adamic-Adar link prediction over the co-purchase part graph: for
    every NON-adjacent pair (x, y), score = Σ over common neighbors u of
    1/ln(deg(u)) — the classic "which parts will be bought together
    next" candidate ranker; top-k pairs by score.

    Scale shape: wedge generation is inherently Σ deg² (every wedge has
    to be seen, unlike triangles' one-apex orientation trick), so apexes
    above ``max_center_degree`` are EXCLUDED from scoring — part of the
    operator's contract, mirrored in the twin (standard practice: a
    super-hub's 1/ln(deg) weight is negligible and its wedge set is
    quadratic).  Degrees are #parts-bounded (catalog domain) and
    broadcast; adjacency shuffles ONCE on a coarse apex key; wedges
    carry a nano-int apex weight (floor(1e9/ln(deg)+0.5) — half-up like
    DuckDB round, ONE value per distinct degree, so per-pair sums are
    exact int64 and order-independent); wedge rows + edge rows co-
    shuffle on the packed pair key, the bucket kernel sums weights and
    drops already-adjacent pairs; per-bucket lossless top-k candidates
    merge in a final k-bounded sort.  Ties break on (score desc,
    part_a, part_b) in both engines."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    pairs = part_affinity_pairs(sf_dir, min_count=min_count) \
        .map_batches(lambda b: b.select(["part_a", "part_b"]),
                     batch_format="pyarrow").materialize()

    # --- degree rollup (#parts-bounded) -> sorted-array broadcast ---
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column("part_a").to_numpy(zero_copy_only=False),
            batch.column("part_b").to_numpy(zero_copy_only=False),
        ]).astype(np.int64)
        u, c = np.unique(both, return_counts=True)
        return pa.table({"part": pa.array(u, pa.int64()),
                         "pd": pa.array(c, pa.int64())})

    from ..functions.agg import coarse_grouped_aggregate
    deg_ds = coarse_grouped_aggregate(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        "part", [("pd", "sum", "degree")])
    deg_tab = pa.concat_tables(
        [pa.table({"part": pa.array([], pa.int64()),
                   "degree": pa.array([], pa.int64())})]
        + list(deg_ds.iter_batches(batch_format="pyarrow")))
    parts_np = deg_tab.column("part").to_numpy().astype(np.int64)
    deg_np = deg_tab.column("degree").to_numpy().astype(np.int64)
    order = np.argsort(parts_np)
    parts_np, deg_np = parts_np[order], deg_np[order]
    # nano-int apex weight per distinct degree (identical in the twin)
    w_nano_np = np.zeros_like(deg_np)
    ok = (deg_np >= 2) & (deg_np <= max_center_degree)
    w_nano_np[ok] = np.floor(
        1e9 / np.log(deg_np[ok].astype(np.float64)) + 0.5).astype(np.int64)
    pk_ref, wn_ref = ray.put(parts_np), ray.put(w_nano_np)

    empty_final = pa.table({"part_a": pa.array([], pa.int64()),
                            "part_b": pa.array([], pa.int64()),
                            "aa_score": pa.array([], pa.float64())})
    if len(parts_np) == 0:
        return ray.data.from_arrow(empty_final)

    empty_m = pa.table({"mkey": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64()),
                        "is_edge": pa.array([], pa.int8()),
                        "__mcoarse": pa.array([], pa.int64())})

    def adjacency(batch: pa.Table) -> pa.Table:
        a = batch.column("part_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("part_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "__coarse": pa.array((src * _GOLDEN) % nc, pa.int64()),
        })

    def wedge_gen(group: pa.Table) -> pa.Table:
        """One apex bucket: neighbor pairs per apex (id-sorted so the
        packed key is canonical lo<<32|hi), weighted by the apex's
        nano weight; zero-weight apexes (deg > cap) skipped."""
        if group.num_rows == 0:
            return empty_m
        keys = ray.get(pk_ref)
        wn = ray.get(wn_ref)
        idx = pc.sort_indices(group, sort_keys=[("src", "ascending"),
                                                ("dst", "ascending")])
        g = group.take(idx)
        src = g.column("src").to_numpy()
        dst = g.column("dst").to_numpy()
        w_apex = wn[np.searchsorted(keys, src)]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        live = (sizes >= 2) & (w_apex[starts] > 0)
        vs, ws, wts = [], [], []
        for out_deg in np.unique(sizes[live]):
            segs = starts[live & (sizes == out_deg)]
            ii, jj = np.triu_indices(int(out_deg), k=1)
            vs.append(dst[(segs[:, None] + ii[None, :]).ravel()])
            ws.append(dst[(segs[:, None] + jj[None, :]).ravel()])
            wts.append(np.repeat(w_apex[segs], len(ii)))
        if not vs:
            return empty_m
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        mkey = (v << 32) | w                    # v < w: id-sorted segment
        return pa.table({
            "mkey": pa.array(mkey, pa.int64()),
            "w": pa.array(np.concatenate(wts), pa.int64()),
            "is_edge": pa.array(np.zeros(len(v), np.int8())),
            "__mcoarse": pa.array((mkey * _GOLDEN) % nc, pa.int64()),
        })

    wedges = (pairs.map_batches(adjacency, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(wedge_gen, batch_format="pyarrow"))

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("part_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("part_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mkey = (a << 32) | b                     # a < b by construction
        return pa.table({
            "mkey": pa.array(mkey, pa.int64()),
            "w": pa.array(np.zeros(len(a), np.int64())),
            "is_edge": pa.array(np.ones(len(a), np.int8())),
            "__mcoarse": pa.array((mkey * _GOLDEN) % nc, pa.int64()),
        })

    def score_bucket(group: pa.Table) -> pa.Table:
        """Per-pair weight sum, adjacent pairs dropped, then a LOSSLESS
        per-bucket top-k candidate cut (every pair key is complete in
        its bucket, so the global top-k is within the union of bucket
        top-ks)."""
        empty = pa.table({"mkey": pa.array([], pa.int64()),
                          "nano": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        g = (group.select(["mkey", "w", "is_edge"])
             .group_by("mkey")
             .aggregate([("w", "sum"), ("is_edge", "max")]))
        keep = pc.and_(pc.equal(g.column("is_edge_max"), 0),
                       pc.greater(g.column("w_sum"), 0))
        g = g.filter(keep)
        t = pa.table({"mkey": g.column("mkey"), "nano": g.column("w_sum")})
        if t.num_rows > k:
            idx = pc.sort_indices(t, sort_keys=[("nano", "descending"),
                                                ("mkey", "ascending")])
            t = t.take(idx.slice(0, k))
        return t

    cand = (wedges.union(ray.data.from_arrow(empty_m),
                         pairs.map_batches(edge_rows,
                                           batch_format="pyarrow"))
            .groupby("__mcoarse")
            .map_groups(score_bucket, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_final
        idx = pc.sort_indices(batch, sort_keys=[("nano", "descending"),
                                                ("mkey", "ascending")])
        t = batch.take(idx.slice(0, k))
        mkey = t.column("mkey").to_numpy()
        from ..functions.num import round6
        return pa.table({
            "part_a": pa.array(mkey >> 32, pa.int64()),
            "part_b": pa.array(mkey & 0xFFFFFFFF, pa.int64()),
            "aa_score": round6(pc.divide(
                pc.cast(t.column("nano"), pa.float64(), safe=False), 1e9)),
        })

    # typed empty seed keeps the schema on legit-empty output (the
    # documented Ray empty-Dataset quirk)
    return ray.data.from_arrow(empty_final).union(
        cand.repartition(1).map_batches(finish, batch_format="pyarrow"))


def daily_order_ship_coverage(sf_dir: str,
                              num_partitions: "int | None" = None
                              ) -> "ray.data.Dataset":
    """FULL OUTER join shape — the one join type the registry lacked:
    per-day order placements vs per-day line shipments, keeping days
    where only one side has activity (the tail after the last order
    date ships for months — a reconciliation/coverage report would
    miss it with an inner join).  Zero-filled counts + a coverage tag.

    Scale shape: both fact scans pre-reduce to date-domain-bounded
    per-day partials (the daily_revenue_ma7 rationale) BEFORE the
    native ``Dataset.join(join_type="full_outer")`` — the exchange
    moves ~thousands of rows at any corpus size.  Fully-empty sides
    branch on parquet METADATA counts (the customers_without_orders
    idiom: Ray's hash join loses key schemas on an empty side), since
    FULL OUTER vs an empty side is the other side zero-filled."""
    import pyarrow.dataset as pads

    n_ord = pads.dataset(f"{sf_dir}/orders.parquet").count_rows()
    n_line = pads.dataset(f"{sf_dir}/lineitem.parquet").count_rows()
    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderdate"])
    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate"])

    def day_partial(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            g = (pa.table({"day": pc.floor_temporal(batch.column(col),
                                                    unit="day")})
                 .group_by("day").aggregate([([], "count_all")]))
            return g.rename_columns(["day", "pn"])
        return fn

    # schema-normalizing maps: an EMPTY side's aggregate emits 0-column
    # blocks (the documented Ray empty-Dataset quirk) that Acero's join
    # rejects ("no match for key field") — rebuild every block with the
    # declared schema, including legit-empty ones
    def norm(key_name: str, val_name: str):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_columns < 2:         # schema-less empty block
                return pa.table({key_name: pa.array([], pa.timestamp("us")),
                                 val_name: pa.array([], pa.int64())})
            return pa.table({key_name: batch.column(0),
                             val_name: batch.column(1)})
        return fn

    od = (orders.map_batches(day_partial("o_orderdate"),
                             batch_format="pyarrow")
          .groupby("day").aggregate(Sum("pn", alias_name="n_orders"))
          .map_batches(norm("day", "n_orders"), batch_format="pyarrow"))
    sd = (line.map_batches(day_partial("l_shipdate"),
                           batch_format="pyarrow")
          .groupby("day").aggregate(Sum("pn", alias_name="n_shipped"))
          .map_batches(norm("sday", "n_shipped"), batch_format="pyarrow"))
    if n_ord == 0 and n_line == 0:
        joined = ray.data.from_arrow(pa.table({
            "day": pa.array([], pa.timestamp("us")),
            "n_orders": pa.array([], pa.int64()),
            "n_shipped": pa.array([], pa.int64())}))
    elif n_line == 0:        # full outer vs empty = left, null-extended
        joined = od.map_batches(
            lambda b: b.append_column(
                "n_shipped", pa.nulls(b.num_rows, pa.int64())),
            batch_format="pyarrow")
    elif n_ord == 0:
        joined = sd.map_batches(
            lambda b: pa.table({
                "day": b.column("sday"),
                "n_orders": pa.nulls(b.num_rows, pa.int64()),
                "n_shipped": b.column("n_shipped")}),
            batch_format="pyarrow")
    else:
        joined = od.join(sd, join_type="full_outer", on=("day",),
                         right_on=("sday",),
                         num_partitions=_join_partitions(num_partitions))

    def finish(batch: pa.Table) -> pa.Table:
        n_o = pc.fill_null(pc.cast(batch.column("n_orders"), pa.int64(),
                                   safe=False), 0)
        n_s = pc.fill_null(pc.cast(batch.column("n_shipped"), pa.int64(),
                                   safe=False), 0)
        tag = pc.if_else(
            pc.equal(n_o, 0), "ship_only",
            pc.if_else(pc.equal(n_s, 0), "order_only", "both"))
        return pa.table({"day": batch.column("day"),
                         "n_orders": n_o, "n_shipped": n_s,
                         "coverage": tag})

    return joined.map_batches(finish, batch_format="pyarrow")


def part_random_walks(sf_dir: str, min_count: int = 2,
                      walk_len: int = 4) -> "ray.data.Dataset":
    """Deterministic random walks over the co-purchase graph (the
    node2vec/DeepWalk corpus generator): one ``walk_len``-step walk per
    node, the next hop chosen by an md5 hash of (current node, step)
    modulo the sorted neighbor list — no RNG state, byte-identical
    across runs, workers and cluster sizes, and exactly replayable in
    SQL (the twin's recursive CTE).

    Scale shape: the adjacency is #parts-bounded (catalog domain, the
    affinity-family broadcast rationale), built once as (sorted keys,
    offsets, sorted neighbor array) and ``ray.put`` — then every walk
    runs ALL its steps inside ONE pure map over the node table: no
    per-round shuffle (contrast part_pagerank's per-round exchange —
    walks don't aggregate, so the loop vectorizes per node batch)."""
    import hashlib

    from ..functions.agg import coarse_grouped_aggregate

    pairs = part_affinity_pairs(sf_dir, min_count=min_count) \
        .map_batches(lambda b: b.select(["part_a", "part_b"]),
                     batch_format="pyarrow").materialize()

    def adj_partial(batch: pa.Table) -> pa.Table:
        a = batch.column("part_a").to_numpy(zero_copy_only=False)
        b = batch.column("part_b").to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.concatenate([a, b]), pa.int64()),
                         "v": pa.array(np.concatenate([b, a]), pa.int64())})

    # #parts-bounded adjacency assembled driver-side (the same bound the
    # degree broadcasts rely on), neighbors sorted per node
    adj = pa.concat_tables(
        [pa.table({"u": pa.array([], pa.int64()),
                   "v": pa.array([], pa.int64())})]
        + list(pairs.map_batches(adj_partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")))
    empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                      "walk": pa.array([], pa.string())})
    if adj.num_rows == 0:
        return ray.data.from_arrow(empty)
    u = adj.column("u").to_numpy().astype(np.int64)
    v = adj.column("v").to_numpy().astype(np.int64)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keys = np.unique(u)
    offsets = np.searchsorted(u, keys)
    offsets = np.r_[offsets, len(u)]
    keys_ref = ray.put(keys)
    off_ref = ray.put(offsets)
    nbr_ref = ray.put(v)

    nodes = ray.data.from_arrow(pa.table({"p_partkey":
                                          pa.array(keys, pa.int64())}))

    def walk(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        off = ray.get(off_ref)
        nbr = ray.get(nbr_ref)
        cur = batch.column("p_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64).copy()
        paths = [str(c) for c in cur]
        for step in range(walk_len):
            # md5(cur-step) % degree picks the hop — same digest the
            # twin computes; per-item hashing is #parts x walk_len
            # bounded, never corpus-sized
            h = np.fromiter(
                (int(hashlib.md5(f"{c}-{step}".encode())
                     .hexdigest()[:8], 16) for c in cur),
                dtype=np.int64, count=len(cur))
            pos = np.searchsorted(ks, cur)
            deg = off[pos + 1] - off[pos]
            cur = nbr[off[pos] + (h % deg)]
            for i, c in enumerate(cur):
                paths[i] += f"->{c}"
        return pa.table({"p_partkey": batch.column("p_partkey"),
                         "walk": pa.array(paths, pa.string())})

    return nodes.map_batches(walk, batch_format="pyarrow")


def part_frequent_triples(sf_dir: str, min_count: int = 2
                          ) -> "ray.data.Dataset":
    """Frequent 3-itemsets over order baskets (the Apriori step after
    part_affinity_pairs' 2-itemsets): triples of parts appearing
    together in >= ``min_count`` distinct orders — the next-order
    association-rule input (bundle discovery).  Output
    (part_a < part_b < part_c, n_orders).

    Scale shape: ONE coarse orderkey shuffle co-locates each basket
    (distinct (order, part) combiner first); the bucket kernel emits
    C(width, 3) triple partials per basket with precomputed per-width
    combination index tables — cost is cubic in BASKET width (bounded
    by the order_lines_histogram evidence, ~7 here), never corpus
    size — then one coarse shuffle over the (a, b, c) key finishes the
    counts and applies the support threshold."""
    from itertools import combinations

    from ..functions.agg import (_GOLDEN, _default_num_coarse,
                                 coarse_grouped_aggregate)

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        g = batch.select(["l_orderkey", "l_partkey"]) \
            .group_by(["l_orderkey", "l_partkey"]).aggregate([])
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return g.append_column("__coarse",
                               pa.array((ok * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"part_a": pa.array([], pa.int64()),
                      "part_b": pa.array([], pa.int64()),
                      "part_c": pa.array([], pa.int64()),
                      "pn": pa.array([], pa.int64())})

    def triple_rows(group: pa.Table) -> pa.Table:
        t = group.select(["l_orderkey", "l_partkey"]) \
            .group_by(["l_orderkey", "l_partkey"]).aggregate([])
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            ("l_orderkey", "ascending"), ("l_partkey", "ascending")])
        t = t.take(idx)
        ok = t.column("l_orderkey").to_numpy()
        pk = t.column("l_partkey").to_numpy()
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        sizes = np.diff(np.r_[starts, len(ok)])
        outs = []
        for w in np.unique(sizes[sizes >= 3]):
            segs = starts[sizes == w]
            combo = np.array(list(combinations(range(int(w)), 3)),
                             dtype=np.int64)          # (C(w,3), 3)
            base = segs[:, None, None] + combo[None, :, :]
            flat = base.reshape(-1, 3)
            outs.append(np.stack([pk[flat[:, 0]], pk[flat[:, 1]],
                                  pk[flat[:, 2]]], axis=1))
        if not outs:
            return empty
        tri = np.concatenate(outs)
        return pa.table({"part_a": pa.array(tri[:, 0], pa.int64()),
                         "part_b": pa.array(tri[:, 1], pa.int64()),
                         "part_c": pa.array(tri[:, 2], pa.int64()),
                         "pn": pa.array(np.ones(len(tri), np.int64))})

    rows = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(triple_rows, batch_format="pyarrow"))
    agg = coarse_grouped_aggregate(
        rows, ["part_a", "part_b", "part_c"],
        [("pn", "sum", "n_orders")],
        hash_cols=["part_a", "part_b", "part_c"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_orders"),
                                             min_count))

    # a typed 0-row block rides along so the schema survives the
    # no-qualifying-triples case (a groupby over 0 rows emits no blocks
    # and the dataset would otherwise report schema None)
    typed = ray.data.from_arrow(pa.table({
        "part_a": pa.array([], pa.int64()),
        "part_b": pa.array([], pa.int64()),
        "part_c": pa.array([], pa.int64()),
        "n_orders": pa.array([], pa.int64())}))
    return typed.union(agg.map_batches(keep, batch_format="pyarrow"))


def customer_order_cadence(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer ordering cadence: for every customer with >= 2 orders,
    the number of orders and the count / mean / min / max of the day gaps
    between consecutive orders (ordered by date) — the inter-purchase
    interval features behind churn and replenishment models.  The
    ``lag() OVER (PARTITION BY customer ORDER BY date)`` shape applied to
    the orders fact table.

    Determinism: gaps come from the SORTED sequence of order days, so
    same-day ties cannot perturb the gap multiset regardless of tie-break
    order; mean = round6(exact int day-sum / exact int gap-count) computed
    identically in both engines.  Contract: rows with NULL o_custkey or
    NULL o_orderdate are dropped in both engines (lag over a NULL date is
    order-undefined; a NULL key cannot ride Ray's sort-based group
    partitioning).

    Scale shape: ONE coarse customer-hash shuffle of pruned
    (o_custkey, day) pairs; each bucket sorts once, diffs day numbers
    within customer segments (numpy), and finishes with a per-bucket Arrow
    group_by — every customer's orders land in exactly one bucket, so the
    bucket output is final (no second shuffle)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("o_custkey")),
            pc.is_valid(batch.column("o_orderdate"))))
        day = pc.cast(pc.divide(
            pc.cast(batch.column("o_orderdate"), pa.int64()),
            86400000000), pa.int64())
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        coarse = (cust.astype(np.int64) * _GOLDEN) % nc
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "day": day,
            "__coarse": pa.array(coarse, pa.int64()),
        })

    empty_out = pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "n_orders": pa.array([], pa.int64()),
        "n_gaps": pa.array([], pa.int64()),
        "mean_gap_days": pa.array([], pa.float64()),
        "min_gap_days": pa.array([], pa.int64()),
        "max_gap_days": pa.array([], pa.int64()),
    })

    def cadence(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("o_custkey", "ascending"), ("day", "ascending")])
        g = group.take(idx)
        cust = g.column("o_custkey").to_numpy()
        day = g.column("day").to_numpy()
        gap = np.diff(day, prepend=np.int64(0))
        has_gap = np.r_[False, cust[1:] == cust[:-1]]  # first order: no gap
        t = pa.table({
            "o_custkey": g.column("o_custkey"),
            "gap": pa.array(np.where(has_gap, gap, 0), pa.int64(),
                            mask=~has_gap),
        })
        agg = (t.group_by("o_custkey")
                .aggregate([([], "count_all"), ("gap", "count"),
                            ("gap", "sum"), ("gap", "min"),
                            ("gap", "max")]))
        agg = agg.rename_columns(
            ["o_custkey", "n_orders", "n_gaps", "sum_gap",
             "min_gap_days", "max_gap_days"])
        agg = agg.filter(pc.greater_equal(agg.column("n_orders"), 2))
        mean = round6(pc.divide(
            pc.cast(agg.column("sum_gap"), pa.float64()),
            pc.cast(agg.column("n_gaps"), pa.float64())))
        return pa.table({
            "o_custkey": agg.column("o_custkey"),
            "n_orders": agg.column("n_orders"),
            "n_gaps": agg.column("n_gaps"),
            "mean_gap_days": mean,
            "min_gap_days": agg.column("min_gap_days"),
            "max_gap_days": agg.column("max_gap_days"),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(cadence, batch_format="pyarrow"))


def supplier_hhi_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Supply-concentration report: per part type, the Herfindahl-
    Hirschman index of supplier concentration over shipped quantity —
    HHI = sum over suppliers of (supplier share)^2 — plus the top
    supplier's share, supplier count, and total quantity.  The
    market-concentration screen run over a supply-chain fact table.

    Exactness: quantities are floor-cast to exact int64 units; HHI is
    computed as round6(sum(q^2) / sum(q)^2) where both sums are exact
    integers converted to double ONCE, so float summation order cannot
    perturb it (a naive sum of per-supplier share^2 doubles would be
    order-dependent).  int64 q^2 overflows at q > ~3e9 units per
    (type, supplier) cell — asserted loudly; the 100 TB path swaps the
    finish partial to python-int / HUGEINT accumulation.

    Scale shape: part's (p_partkey -> p_type) is a broadcast lookup (no
    shuffle); per-batch partials reduce to (p_type, l_suppkey, q) cells;
    ONE coarse shuffle keyed on the combined (type, supplier) hash; the
    per-type finish re-aggregates #types x #suppliers pre-reduced rows
    through a second #types-sized coarse aggregate of (sum q, sum q^2,
    max q, count) partials.  Contract: NULL l_quantity rows drop in both
    engines; parts absent from the part table drop (inner join)."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import broadcast_join, read_small_table
    from ..functions.num import round6

    part = read_small_table(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type"])
    ds = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey", "l_quantity"])
    joined = broadcast_join(ds, part, on="l_partkey", right_on="p_partkey",
                            select=["p_type", "l_suppkey", "l_quantity"])

    def cell_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("l_quantity")))
        q = pc.cast(pc.floor(batch.column("l_quantity")), pa.int64())
        t = pa.table({"p_type": batch.column("p_type"),
                      "l_suppkey": batch.column("l_suppkey"), "q": q})
        g = t.group_by(["p_type", "l_suppkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["p_type", "l_suppkey", "q"])

    cells = coarse_grouped_aggregate(
        joined.map_batches(cell_partial, batch_format="pyarrow"),
        ["p_type", "l_suppkey"], [("q", "sum", "q")],
        hash_cols=["p_type", "l_suppkey"])

    def type_partial(batch: pa.Table) -> pa.Table:
        q = batch.column("q").to_numpy()
        assert q.size == 0 or q.max() < 3_000_000_000, \
            "q^2 would overflow int64; switch the finish to python-int"
        t = pa.table({"p_type": batch.column("p_type"), "q": batch.column("q"),
                      "q2": pa.array(q * q, pa.int64())})
        g = t.group_by("p_type").aggregate([
            ([], "count_all"), ("q", "sum"), ("q2", "sum"), ("q", "max")])
        return g.rename_columns(
            ["p_type", "n_suppliers", "sum_q", "sum_q2", "max_q"])

    agg = coarse_grouped_aggregate(
        cells.map_batches(type_partial, batch_format="pyarrow"),
        "p_type", [("n_suppliers", "sum", "n_suppliers"),
                   ("sum_q", "sum", "sum_q"), ("sum_q2", "sum", "sum_q2"),
                   ("max_q", "max", "max_q")])

    def finish(batch: pa.Table) -> pa.Table:
        sq = pc.cast(batch.column("sum_q"), pa.float64())
        hhi = round6(pc.divide(
            pc.cast(batch.column("sum_q2"), pa.float64()),
            pc.multiply(sq, sq)))
        top = round6(pc.divide(
            pc.cast(batch.column("max_q"), pa.float64()), sq))
        return pa.table({
            "p_type": batch.column("p_type"),
            "n_suppliers": batch.column("n_suppliers"),
            "total_qty": batch.column("sum_q"),
            "hhi": hhi,
            "top_share": top,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def seasonal_decompose(sf_dir: str) -> "ray.data.Dataset":
    """Classical additive decomposition of daily lineitem revenue into
    trend + weekday seasonality + residual — the STL-lite monitor a
    revenue dashboard runs before alerting on the residual.

    Exact arithmetic: daily revenue in int cents; trend is the CENTERED
    7-day cents sum (full windows only — edge days get NULL trend);
    the detrended series is kept as the INTEGER ``7*rev_c - sum7``
    (units cents*7, exact), weekday effects are integer sums divided
    once, and every emitted double is a single division chain off
    integers, round6-snapped — bit-identical to the SQL twin.
    Weekday is ISO Monday=0 in both engines.

    Scale shape: the corpus-sized scan pre-reduces to per-day cents
    partials inside map_batches (the daily_revenue_ma7 shape); the day
    rollup is bounded by the date domain, so the window + weekday-mean
    finish runs in one map over a repartition(1) of the tiny rollup."""
    from ..functions.num import round6

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("l_shipdate"), unit="day")
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        g = pa.table({"day": day, "rev_c": rev_c}).group_by("day") \
            .aggregate([("rev_c", "sum")])
        return g.rename_columns(["day", "rev_c"])

    agg = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("rev_c", alias_name="rev_c")))

    empty = pa.table({
        "day": pa.array([], pa.timestamp("us")),
        "weekday": pa.array([], pa.int64()),
        "revenue": pa.array([], pa.float64()),
        "trend": pa.array([], pa.float64()),
        "seasonal": pa.array([], pa.float64()),
        "residual": pa.array([], pa.float64()),
    })

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        g = batch.take(pc.sort_indices(batch,
                                       sort_keys=[("day", "ascending")]))
        c = g.column("rev_c").to_numpy().astype(np.int64)
        n = len(c)
        days = g.column("day").to_numpy()
        epoch_day = days.astype("datetime64[D]").astype(np.int64)
        weekday = (epoch_day + 3) % 7          # 1970-01-01 = Thursday = 3
        # centered 7-day window sum; full windows only
        cum = np.r_[0, np.cumsum(c)]
        full = np.zeros(n, bool)
        sum7 = np.zeros(n, np.int64)
        if n >= 7:
            full[3:n - 3] = True
            i = np.arange(3, n - 3)
            sum7[i] = cum[i + 4] - cum[i - 3]
        det7 = 7 * c - sum7                    # exact, cents*7, full only
        s_sum = np.zeros(7, np.int64)
        s_cnt = np.zeros(7, np.int64)
        np.add.at(s_sum, weekday[full], det7[full])
        np.add.at(s_cnt, weekday[full], 1)
        has_season = s_cnt[weekday] > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            trend = sum7.astype(np.float64) / 700.0
            smean = s_sum.astype(np.float64) / s_cnt   # per-weekday double
            seasonal = smean[weekday] / 700.0
            residual = (det7.astype(np.float64) - smean[weekday]) / 700.0
        return pa.table({
            "day": g.column("day"),
            "weekday": pa.array(weekday, pa.int64()),
            "revenue": pc.divide(pc.cast(g.column("rev_c"), pa.float64(),
                                         safe=False), 100.0),
            "trend": round6(pa.array(trend, pa.float64(), mask=~full)),
            "seasonal": round6(pa.array(seasonal, pa.float64(),
                                        mask=~has_season)),
            "residual": round6(pa.array(residual, pa.float64(),
                                        mask=~(full & has_season))),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


# candidate functional dependencies profiled by fd_violations: each row is
# (name, table, lhs column, rhs column).  Mixed holds/violates on purpose —
# the report is the discovery artifact, not an assertion.
_FD_CANDIDATES = [
    ("orders.o_orderkey->o_orderstatus", "orders", "o_orderkey",
     "o_orderstatus"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("lineitem.l_orderkey->l_returnflag", "lineitem", "l_orderkey",
     "l_returnflag"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("documents.source->lang", "documents", "source", "lang"),
]


def fd_violations(sf_dir: str) -> "ray.data.Dataset":
    """Functional-dependency discovery report (Deequ/Metanome-style
    profiling): for each candidate FD ``A -> B`` in ``_FD_CANDIDATES``,
    the number of distinct LHS values, how many of them map to MORE than
    one distinct RHS (violating determinism), the worst fan-out, and
    whether the dependency holds exactly.  Contract: NULL LHS/RHS rows
    drop in both engines; LHS/RHS compare as strings.

    Scale shape: each candidate's two columns pre-reduce to distinct
    (fd, lhs, rhs) string pairs per batch, the tagged union moves
    through ONE coarse shuffle on hash(fd, lhs) (every lhs's pairs
    co-locate, so distinct-rhs counts finish in-bucket), and per-bucket
    per-fd partials reduce in a #candidates-sized final groupby."""
    from ..functions.agg import _GOLDEN, _coarse_of, _default_num_coarse
    from ray.data.aggregate import Max, Sum

    nc = _default_num_coarse()

    def make_partial(fd: str, lhs: str, rhs: str):
        import hashlib
        # process-stable fd salt (Python's str hash is per-process seeded)
        fd_salt = np.int64(int(hashlib.md5(fd.encode()).hexdigest()[:8],
                               16) & 0x7FFFFFFF)

        def partial(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.and_(pc.is_valid(batch.column(lhs)),
                                         pc.is_valid(batch.column(rhs))))
            empty = pa.table({"fd": pa.array([], pa.string()),
                              "lhs": pa.array([], pa.string()),
                              "rhs": pa.array([], pa.string()),
                              "__coarse": pa.array([], pa.int64())})
            if batch.num_rows == 0:
                return empty
            t = pa.table({
                "lhs": pc.cast(batch.column(lhs), pa.string()),
                "rhs": pc.cast(batch.column(rhs), pa.string()),
            })
            g = t.group_by(["lhs", "rhs"]).aggregate([])
            fd_col = pa.array(np.full(g.num_rows, fd, dtype=object),
                              pa.string())
            coarse = (_coarse_of(g.column("lhs"), 1 << 62)
                      * _GOLDEN + fd_salt) % nc
            return pa.table({
                "fd": fd_col,
                "lhs": g.column("lhs"),
                "rhs": g.column("rhs"),
                "__coarse": pa.array(coarse, pa.int64()),
            })
        return partial

    parts = []
    for fd, table, lhs, rhs in _FD_CANDIDATES:
        ds = sized_read_parquet(f"{sf_dir}/{table}.parquet",
                                columns=[lhs, rhs])
        parts.append(ds.map_batches(make_partial(fd, lhs, rhs),
                                    batch_format="pyarrow"))
    union = parts[0].union(*parts[1:])

    empty = pa.table({"fd": pa.array([], pa.string()),
                      "lhs_n": pa.array([], pa.int64()),
                      "viol": pa.array([], pa.int64()),
                      "maxk": pa.array([], pa.int64()),
                      "pairs": pa.array([], pa.int64())})

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        dp = group.select(["fd", "lhs", "rhs"]) \
            .group_by(["fd", "lhs", "rhs"]).aggregate([])
        per = dp.group_by(["fd", "lhs"]).aggregate([([], "count_all")])
        k = per.column("count_all")
        t = pa.table({
            "fd": per.column("fd"),
            "one": pa.array(np.ones(per.num_rows, np.int64)),
            "v": pc.cast(pc.greater(k, 1), pa.int64()),
            "k": pc.cast(k, pa.int64()),
        })
        g = t.group_by("fd").aggregate([("one", "sum"), ("v", "sum"),
                                        ("k", "max"), ("k", "sum")])
        return g.rename_columns(["fd", "lhs_n", "viol", "maxk", "pairs"])

    agg = (union.groupby("__coarse")
           .map_groups(bucket, batch_format="pyarrow")
           .groupby("fd")
           .aggregate(Sum("lhs_n", alias_name="n_lhs"),
                      Sum("viol", alias_name="n_violating_lhs"),
                      Max("maxk", alias_name="max_rhs_per_lhs"),
                      Sum("pairs", alias_name="n_distinct_pairs")))

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "holds", pc.equal(batch.column("max_rhs_per_lhs"), 1))

    return agg.map_batches(finish, batch_format="pyarrow")


def holt_linear_forecast(sf_dir: str, horizon: int = 3) -> "ray.data.Dataset":
    """Holt double-exponential smoothing of MONTHLY revenue (level +
    trend, alpha = beta = 0.5) with a ``horizon``-month forecast — the
    classical short-horizon revenue projection a planning dashboard
    runs off the sales rollup.

    Recurrence (init l1 = y1, b1 = y2 - y1, or 0 for a 1-point series):
    ``l_t = 0.5*y_t + 0.5*(l_{t-1} + b_{t-1})``;
    ``b_t = 0.5*(l_t - l_{t-1}) + 0.5*b_{t-1}``; one-step-ahead
    ``fitted_t = l_{t-1} + b_{t-1}`` (NULL at t=1); forecast rows carry
    ``fitted = l_T + h*b_T`` and NULL revenue/level/trend.  y is the
    month's EXACT cents total cast to double, and both engines evaluate
    the IDENTICAL expression tree (0.5 multiplies are exact halvings),
    so the doubles agree bit-for-bit with the recursive-CTE twin;
    outputs are /100-to-dollars, round6.

    Scale shape: the corpus scan pre-reduces to per-month cents
    partials inside map_batches; the recurrence is inherently
    sequential but runs over the date-domain-bounded month table
    (<= ~84 rows) in one finish map over a repartition(1)."""
    from ..functions.num import round6

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch.column("l_shipdate"), unit="month")
        rev_c = _cents(pc.multiply(batch.column("l_extendedprice"),
                                   pc.subtract(1.0,
                                               batch.column("l_discount"))))
        g = pa.table({"month": month, "rev_c": rev_c}).group_by("month") \
            .aggregate([("rev_c", "sum")])
        return g.rename_columns(["month", "rev_c"])

    agg = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("month").aggregate(Sum("rev_c", alias_name="rev_c")))

    empty = pa.table({
        "month": pa.array([], pa.timestamp("us")),
        "revenue": pa.array([], pa.float64()),
        "level": pa.array([], pa.float64()),
        "trend": pa.array([], pa.float64()),
        "fitted": pa.array([], pa.float64()),
        "is_forecast": pa.array([], pa.bool_()),
    })

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        g = batch.take(pc.sort_indices(batch,
                                       sort_keys=[("month", "ascending")]))
        months = g.column("month").to_numpy().astype("datetime64[M]")
        y = g.column("rev_c").to_numpy().astype(np.float64)
        n = len(y)
        lev = np.empty(n)
        tr = np.empty(n)
        fit = np.full(n, np.nan)
        lev[0] = y[0]
        tr[0] = (y[1] - y[0]) if n >= 2 else 0.0
        # bounded sequential recurrence (month-domain-sized, documented)
        for t in range(1, n):
            fit[t] = lev[t - 1] + tr[t - 1]
            l_new = 0.5 * y[t] + 0.5 * (lev[t - 1] + tr[t - 1])
            tr[t] = 0.5 * (l_new - lev[t - 1]) + 0.5 * tr[t - 1]
            lev[t] = l_new
        h = np.arange(1, horizon + 1, dtype=np.int64)
        f_months = months[-1] + h
        f_fit = lev[-1] + h.astype(np.float64) * tr[-1]
        out_month = pa.array(
            np.concatenate([months, f_months]).astype("datetime64[us]"),
            pa.timestamp("us"))
        nan = np.full(horizon, np.nan)
        mask_obs = np.r_[np.zeros(n, bool), np.ones(horizon, bool)]
        return pa.table({
            "month": out_month,
            "revenue": round6(pa.array(np.r_[y / 100.0, nan],
                                       pa.float64(), mask=mask_obs)),
            "level": round6(pa.array(np.r_[lev / 100.0, nan],
                                     pa.float64(), mask=mask_obs)),
            "trend": round6(pa.array(np.r_[tr / 100.0, nan],
                                     pa.float64(), mask=mask_obs)),
            "fitted": round6(pa.array(
                np.r_[fit, f_fit] / 100.0, pa.float64(),
                mask=np.r_[np.isnan(fit), np.zeros(horizon, bool)])),
            "is_forecast": pa.array(mask_obs),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def seasonal_anomalies(sf_dir: str) -> "ray.data.Dataset":
    """Anomalous revenue days: the seasonal_decompose residual compared
    against 2x its population standard deviation — the alerting step an
    STL-style monitor runs after decomposition.

    Exactness: the residual doubles are bit-identical across engines
    (pinned by seasonal_decompose's own hash equality), so both sides
    snap them to MICRO-INTS once (half-away, the shared convention) and
    evaluate the flag as a pure integer inequality
    ``(n*r - S)^2 > 4*(n*SS - S^2)`` (|r - mean| > 2*sd without any
    float sqrt/mean), with Python bigints here and HUGEINT in DuckDB —
    no accumulation-order drift can flip a boundary flag.

    Scale shape: composes the decompose pipeline (per-day partials +
    one date-domain-bounded rollup); the flag pass is a single map over
    the same bounded table."""

    ds = seasonal_decompose(sf_dir)

    empty = pa.table({
        "day": pa.array([], pa.timestamp("us")),
        "revenue": pa.array([], pa.float64()),
        "residual": pa.array([], pa.float64()),
        "is_anomaly": pa.array([], pa.bool_()),
    })

    def flag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("residual")))
        if batch.num_rows == 0:
            return empty
        r = pc.cast(pc.round(pc.multiply(batch.column("residual"), 1e6),
                             ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        n = int(len(r))
        s1 = int(r.sum())
        ss = sum(int(v) * int(v) for v in r)      # bounded (date domain)
        rhs = 4 * (n * ss - s1 * s1)
        d = (n * r.astype(object) - s1)
        anom = np.array([int(x) * int(x) > rhs for x in d], bool)
        return pa.table({
            "day": batch.column("day"),
            "revenue": batch.column("revenue"),
            "residual": batch.column("residual"),
            "is_anomaly": pa.array(anom),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def _levenshtein(a: str, b: str, cap: int) -> int:
    """Banded unit-cost Levenshtein with early abandon at ``cap`` + 1
    (Ukkonen cutoff): rows whose running minimum exceeds the cap abort.
    Matches DuckDB's ``levenshtein()`` (no transpositions) exactly for
    distances <= cap; returns cap + 1 otherwise."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = i                       # row head seeds the band minimum
                                     # (len(b) == 0 must not early-abandon)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            lo = min(lo, cur[j])
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def part_name_typo_pairs(sf_dir: str, max_dist: int = 3) -> "ray.data.Dataset":
    """Catalog-canonicalization candidates: pairs of DISTINCT part names
    within Levenshtein distance ``max_dist``, restricted to the same
    blocking key (the name's last whitespace token — the product-family
    noun), each name carrying its catalog usage count — the fuzzy
    self-join every entity-resolution pipeline runs before merging
    near-identical SKU names.

    Contract (pinned in the twin): blocking is PART OF THE OPERATOR —
    cross-block pairs are out of scope by definition (standard blocked
    string-similarity-join semantics); pairs order name_a < name_b.

    Scale shape: the corpus-sized work is ONE coarse name-hash shuffle
    that reduces rows to (distinct name, count) — vocabulary-sized by
    construction; the pairwise DP then runs per block over the tiny
    name vocabulary (guarded: a >5k-name block raises rather than going
    quadratic — at that size use minhash_dedup's banding instead)."""
    from ..functions.agg import _default_num_coarse
    from .dedup import _string_coarse_hash

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"])

    def name_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("p_name")))
        g = pa.table({"p_name": batch.column("p_name")}) \
            .group_by("p_name").aggregate([([], "count_all")]) \
            .rename_columns(["p_name", "partial_n"])
        names = g.column("p_name").combine_chunks() \
            if isinstance(g.column("p_name"), pa.ChunkedArray) \
            else g.column("p_name")
        return g.append_column("__coarse", pa.array(
            _string_coarse_hash(names, nc), pa.int64()))

    def name_counts(group: pa.Table) -> pa.Table:
        g = group.group_by("p_name").aggregate([("partial_n", "sum")]) \
            .rename_columns(["p_name", "n_uses"])
        names = g.column("p_name").combine_chunks() \
            if isinstance(g.column("p_name"), pa.ChunkedArray) \
            else g.column("p_name")
        block = pc.replace_substring_regex(names, r"^.*\s", "")
        return g.append_column("block", block)

    empty = pa.table({
        "name_a": pa.array([], pa.string()),
        "name_b": pa.array([], pa.string()),
        "dist": pa.array([], pa.int64()),
        "n_uses_a": pa.array([], pa.int64()),
        "n_uses_b": pa.array([], pa.int64()),
    })

    def block_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return empty
        if group.num_rows > 5000:
            raise ValueError(
                f"part_name_typo_pairs: block of {group.num_rows} distinct "
                "names exceeds the quadratic-scan guard (5000); use a "
                "banded similarity join (minhash_dedup) for this corpus")
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("p_name", "ascending")]))
        names = g.column("p_name").to_pylist()
        uses = g.column("n_uses").to_numpy()
        out_a, out_b, out_d, out_na, out_nb = [], [], [], [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = _levenshtein(names[i], names[j], max_dist)
                if d <= max_dist:
                    out_a.append(names[i]); out_b.append(names[j])
                    out_d.append(d)
                    out_na.append(int(uses[i])); out_nb.append(int(uses[j]))
        if not out_a:
            return empty
        return pa.table({
            "name_a": pa.array(out_a, pa.string()),
            "name_b": pa.array(out_b, pa.string()),
            "dist": pa.array(out_d, pa.int64()),
            "n_uses_a": pa.array(out_na, pa.int64()),
            "n_uses_b": pa.array(out_nb, pa.int64()),
        })

    return (ds.map_batches(name_partial, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(name_counts, batch_format="pyarrow")
            .groupby("block")
            .map_groups(block_pairs, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))


def expectation_report(sf_dir: str) -> "ray.data.Dataset":
    """Great-Expectations-style data-quality suite over the warehouse
    tables: referential integrity (FK orphans), key uniqueness, non-null
    and range/ordering expectations — one row per check with the checked
    row count, violation count, and pass flag.  This is the contract
    gate a 100 TB ingest runs before a corpus is admitted.

    Semantics (pinned in the twin): FK checks use standard SQL
    semantics — NULL child keys are NOT violations, a non-null child key
    with no parent is; uniqueness violations = count(*) -
    count(DISTINCT key) (NULL keys therefore count as violations);
    range/order checks count NULLs as violations (the field is expected
    present AND valid).

    Scale shape: every check reduces to streaming aggregates — scan
    checks are per-batch counter partials; each FK pair shares ONE
    coarse key-hash union shuffle that yields BOTH the orphan count and
    the parent's exact distinct-key count (uniqueness) from the same
    pass; only O(#checks) scalars ever reach the driver.  Table row
    counts come from parquet metadata (no scan)."""
    import pyarrow.dataset as pads

    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()

    def table_rows(name: str) -> int:
        return pads.dataset(f"{sf_dir}/{name}.parquet").count_rows()

    def fk_and_unique(child: str, child_key: str,
                      parent: str, parent_key: str) -> "tuple[int, int]":
        """(orphan child rows, parent distinct non-null keys) in one
        coarse union shuffle."""
        par = sized_read_parquet(f"{sf_dir}/{parent}.parquet",
                                 columns=[parent_key])
        chi = sized_read_parquet(f"{sf_dir}/{child}.parquet",
                                 columns=[child_key])

        def par_partial(batch: pa.Table) -> pa.Table:
            k = pc.unique(pc.drop_null(batch.column(parent_key)))
            kn = k.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "k": pa.array(kn, pa.int64()),
                "cnt": pa.array(np.zeros(len(kn), np.int64)),
                "is_parent": pa.array(np.ones(len(kn), np.int64)),
                "__coarse": pa.array((kn * _GOLDEN) % nc, pa.int64()),
            })

        def chi_partial(batch: pa.Table) -> pa.Table:
            t = pa.table({"k": pc.drop_null(batch.column(child_key))})
            g = t.group_by("k").aggregate([([], "count_all")]) \
                 .rename_columns(["k", "cnt"])
            kn = g.column("k").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "k": pa.array(kn, pa.int64()),
                "cnt": g.column("cnt").cast(pa.int64()),
                "is_parent": pa.array(np.zeros(len(kn), np.int64)),
                "__coarse": pa.array((kn * _GOLDEN) % nc, pa.int64()),
            })

        def bucket(group: pa.Table) -> pa.Table:
            k = group.column("k").to_numpy()
            is_par = group.column("is_parent").to_numpy().astype(bool)
            cnt = group.column("cnt").to_numpy()
            pk = np.unique(k[is_par])
            orphans = int(cnt[~is_par][~np.isin(k[~is_par], pk)].sum())
            return pa.table({"orphans": pa.array([orphans], pa.int64()),
                             "n_distinct": pa.array([len(pk)], pa.int64())})

        row = (par.map_batches(par_partial, batch_format="pyarrow")
               .union(chi.map_batches(chi_partial,
                                      batch_format="pyarrow"))
               .groupby("__coarse")
               .map_groups(bucket, batch_format="pyarrow")
               .aggregate(Sum("orphans"),      # bounded: one rollup row
                          Sum("n_distinct")))
        return int(row["sum(orphans)"] or 0), int(row["sum(n_distinct)"] or 0)

    def scan_counters(table: str, columns: list, fns: dict) -> dict:
        """Sum named per-batch violation counters in one pruned scan."""
        ds = sized_read_parquet(f"{sf_dir}/{table}.parquet",
                                columns=columns)

        def partial(batch: pa.Table) -> pa.Table:
            return pa.table({name: pa.array([int(fn(batch))], pa.int64())
                             for name, fn in fns.items()})

        aggs = [Sum(name, alias_name=name) for name in fns]
        row = ds.map_batches(partial, batch_format="pyarrow") \
                .aggregate(*aggs)                 # bounded: one rollup row
        return {k: int(v or 0) for k, v in row.items()}

    def n_invalid(col) -> "pa.ChunkedArray":
        return pc.sum(pc.cast(pc.is_null(col), pa.int64())).as_py() or 0

    orders_rows = table_rows("orders")
    lineitem_rows = table_rows("lineitem")
    customer_rows = table_rows("customer")
    events_rows = table_rows("events")
    documents_rows = table_rows("documents")

    cust_orphans, cust_distinct = fk_and_unique(
        "orders", "o_custkey", "customer", "c_custkey")
    ord_orphans, ord_distinct = fk_and_unique(
        "lineitem", "l_orderkey", "orders", "o_orderkey")

    o_scan = scan_counters("orders", ["o_totalprice", "o_orderdate"], {
        "price_bad": lambda b: pc.sum(pc.cast(pc.fill_null(
            pc.less_equal(b.column("o_totalprice"), 0.0), True),
            pa.int64())).as_py() or 0,
        "date_null": lambda b: n_invalid(b.column("o_orderdate")),
    })
    l_scan = scan_counters(
        "lineitem", ["l_quantity", "l_discount"], {
            "qty_bad": lambda b: pc.sum(pc.cast(pc.fill_null(pc.or_(
                pc.less(b.column("l_quantity"), 1.0),
                pc.greater(b.column("l_quantity"), 50.0)), True),
                pa.int64())).as_py() or 0,
            "disc_bad": lambda b: pc.sum(pc.cast(pc.fill_null(pc.or_(
                pc.less(b.column("l_discount"), 0.0),
                pc.greater(b.column("l_discount"), 1.0)), True),
                pa.int64())).as_py() or 0,
        })
    e_scan = scan_counters("events", ["user_id", "ts"], {
        "uid_null": lambda b: n_invalid(b.column("user_id")),
        "ts_null": lambda b: n_invalid(b.column("ts")),
    })
    d_scan = scan_counters("documents", ["text"], {
        "text_null": lambda b: n_invalid(b.column("text")),
    })

    checks = [
        ("orders", "o_custkey_fk_customer", orders_rows, cust_orphans),
        ("lineitem", "l_orderkey_fk_orders", lineitem_rows, ord_orphans),
        ("customer", "c_custkey_unique", customer_rows,
         customer_rows - cust_distinct),
        ("orders", "o_orderkey_unique", orders_rows,
         orders_rows - ord_distinct),
        ("orders", "o_totalprice_positive", orders_rows,
         o_scan["price_bad"]),
        ("orders", "o_orderdate_not_null", orders_rows,
         o_scan["date_null"]),
        ("lineitem", "l_quantity_range_1_50", lineitem_rows,
         l_scan["qty_bad"]),
        ("lineitem", "l_discount_range_0_1", lineitem_rows,
         l_scan["disc_bad"]),
        ("events", "user_id_not_null", events_rows, e_scan["uid_null"]),
        ("events", "ts_not_null", events_rows, e_scan["ts_null"]),
        ("documents", "text_not_null", documents_rows,
         d_scan["text_null"]),
    ]
    return ray.data.from_arrow(pa.table({
        "table_name": pa.array([c[0] for c in checks], pa.string()),
        "expectation": pa.array([c[1] for c in checks], pa.string()),
        "n_rows": pa.array([c[2] for c in checks], pa.int64()),
        "n_violations": pa.array([c[3] for c in checks], pa.int64()),
        "passed": pa.array([c[3] == 0 for c in checks], pa.bool_()),
    }))


def value_hour_mahalanobis(sf_dir: str,
                           threshold: float = 9.21034) -> "ray.data.Dataset":
    """Bivariate outlier detection per event type: Mahalanobis distance of
    (value, hour-of-day) against the type's own 2D mean/covariance, with
    outliers = md² > ``threshold`` (chi²₂ at 0.99) — the multivariate
    data-quality monitor that catches (value, time) combinations a
    univariate z-score misses (a normal value at an abnormal hour).

    Exact parity with the twin: x = floor(value·100) cents, y = hour —
    both INTEGER, so the sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy)
    are exact int64 sums and order-independent; md² then evaluates the
    SAME double expression tree in both engines, rounded to 6dp before
    the threshold compare.  Degenerate covariance (det = 0) ⇒ 0 outliers
    (NULL md² in the twin).  NULL type/ts/value rows drop.

    Scale shape: pass 1 reduces batches to per-type integer partials
    (#types-sized shuffle); the tiny stats table broadcasts via
    ``ray.put`` (bounded driver pull — #types rows); pass 2 is a pure
    map counting outliers per batch plus a #types-sized rollup."""
    from ..functions.joins import lookup_np, make_lookup
    from ..functions.num import round6

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.and_(pc.is_valid(batch.column("event_type")),
                    pc.is_valid(batch.column("value"))),
            pc.is_valid(batch.column("ts"))))
        return pa.table({
            "event_type": batch.column("event_type"),
            "x": _cents(batch.column("value")),
            "y": pc.cast(pc.hour(batch.column("ts")), pa.int64()),
        })

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow")

    def stat_partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        t = pa.table({
            "event_type": batch.column("event_type"),
            "n_p": pa.array(np.ones(len(x), np.int64)),
            "sx": batch.column("x"),
            "sy": batch.column("y"),
            "sxx": pa.array(x * x, pa.int64()),
            "syy": pa.array(y * y, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
        })
        g = t.group_by("event_type").aggregate(
            [("n_p", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(
            ["event_type", "n_p", "sx", "sy", "sxx", "syy", "sxy"])

    stats = (ds.map_batches(stat_partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n_p", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxx", alias_name="sxx"),
                        Sum("syy", alias_name="syy"),
                        Sum("sxy", alias_name="sxy"))
             .take_all())                 # bounded: one row per event type
    if not stats:
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "n_outliers": pa.array([], pa.int64())}))

    types = [r["event_type"] for r in stats]
    arr = np.array([[float(r["n"]), float(r["sx"]), float(r["sy"]),
                     float(r["sxx"]), float(r["syy"]), float(r["sxy"])]
                    for r in stats])
    tab = make_lookup(types, np.arange(len(types), dtype=np.int64))
    sref = ray.put((tab, arr))

    def count_outliers(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "out_p": pa.array([], pa.int64())})
        tab_, arr_ = ray.get(sref)
        idx = lookup_np(batch.column("event_type"), tab_)
        n, sx, sy = arr_[idx, 0], arr_[idx, 1], arr_[idx, 2]
        sxx, syy, sxy = arr_[idx, 3], arr_[idx, 4], arr_[idx, 5]
        x = batch.column("x").to_numpy().astype(np.float64)
        y = batch.column("y").to_numpy().astype(np.float64)
        # the EXACT expression tree of the SQL twin (left-to-right)
        dx = x - sx / n
        dy = y - sy / n
        vxx = sxx / n - (sx / n) * (sx / n)
        vyy = syy / n - (sy / n) * (sy / n)
        vxy = sxy / n - (sx / n) * (sy / n)
        det = vxx * vyy - vxy * vxy
        num = ((dx * dx) * vyy - ((2.0 * dx) * dy) * vxy) \
            + (dy * dy) * vxx
        with np.errstate(divide="ignore", invalid="ignore"):
            md2 = np.where(det != 0, num / np.where(det != 0, det, 1),
                           np.nan)
        nan_mask = np.isnan(md2)
        md2r = np.asarray(round6(pa.array(
            np.where(nan_mask, 0.0, md2), pa.float64()))
            .to_numpy(zero_copy_only=False))   # round6 int-snap rejects NaN
        is_out = (~nan_mask) & (md2r > threshold)
        t = pa.table({"event_type": batch.column("event_type"),
                      "out_p": pa.array(is_out.astype(np.int64))})
        g = t.group_by("event_type").aggregate([("out_p", "sum")])
        return g.rename_columns(["event_type", "out_p"])

    counts = (ds.map_batches(count_outliers, batch_format="pyarrow")
              .groupby("event_type")
              .aggregate(Sum("out_p", alias_name="n_outliers")))

    nref = ray.put((tab, arr[:, 0].astype(np.int64)))

    def finish(batch: pa.Table) -> pa.Table:
        tab_, nvals = ray.get(nref)
        idx = lookup_np(batch.column("event_type"), tab_)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(nvals[idx], pa.int64()),
            "n_outliers": batch.column("n_outliers").cast(pa.int64()),
        })

    return counts.map_batches(finish, batch_format="pyarrow")


def _k_anon_rollup(batch: "pa.Table", k: int) -> "pa.Table":
    """Per-block rollup for ``k_anonymity_report``.  An EMPTY block must
    yield a ZERO-ROW table (not a sentinel row): a min_class_size=0
    sentinel would win the downstream global Min whenever Ray's layout
    hands any stage an empty block (real class sizes are always >= 1) —
    a CPU-count-dependent wrong answer.  The all-empty case is coalesced
    by the final ``or 0`` in the caller."""
    n = batch.column("class_n").to_numpy() if batch.num_rows else \
        np.array([], dtype=np.int64)
    if not len(n):
        return pa.table({
            "n_classes": pa.array([], pa.int64()),
            "n_small_classes": pa.array([], pa.int64()),
            "n_rows_at_risk": pa.array([], pa.int64()),
            "min_class_size": pa.array([], pa.int64()),
        })
    small = n < k
    return pa.table({
        "n_classes": pa.array([len(n)], pa.int64()),
        "n_small_classes": pa.array([int(small.sum())], pa.int64()),
        "n_rows_at_risk": pa.array([int(n[small].sum())], pa.int64()),
        "min_class_size": pa.array([int(n.min())], pa.int64()),
    })


def k_anonymity_report(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """k-anonymity audit over the customer quasi-identifier tuple
    (c_nationkey, c_mktsegment): how many equivalence classes exist, how
    many are smaller than ``k``, and how many ROWS sit in those
    re-identifiable classes — the privacy gate a curation pipeline runs
    before releasing joined demographic slices.  NULL quasi-identifier
    values form their own class (SQL GROUP BY semantics, pinned in the
    twin).

    Scale shape: per-batch (qi-tuple, count) partials, ONE shuffle over
    the bounded qi domain (#nations x #segments), and a single-row
    rollup — class counts never leave the aggregation tree."""
    ds = sized_read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["c_nationkey", "c_mktsegment",
                                 "partial_n"])

    # Ray's sort-based groupby cannot order NULL keys: sentinel-shuffle
    # (-1 / '(null)' are outside both domains), classes stay distinct.
    def sentinel(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nk": pc.fill_null(batch.column("c_nationkey"), -1),
            "seg": pc.fill_null(batch.column("c_mktsegment"), "(null)"),
            "partial_n": batch.column("partial_n"),
        })

    classes = (ds.map_batches(partial, batch_format="pyarrow")
               .map_batches(sentinel, batch_format="pyarrow")
               .groupby(["nk", "seg"])
               .aggregate(Sum("partial_n", alias_name="class_n")))

    def rollup(batch: pa.Table) -> pa.Table:
        return _k_anon_rollup(batch, k)

    from ray.data.aggregate import Max, Min
    out = (classes.map_batches(rollup, batch_format="pyarrow")
           .aggregate(Sum("n_classes", alias_name="c"),
                      Sum("n_small_classes", alias_name="s"),
                      Sum("n_rows_at_risk", alias_name="r"),
                      Min("min_class_size", alias_name="m"))) or {}
    return ray.data.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "n_classes": pa.array([int(out.get("c") or 0)], pa.int64()),
        "n_small_classes": pa.array([int(out.get("s") or 0)], pa.int64()),
        "n_rows_at_risk": pa.array([int(out.get("r") or 0)], pa.int64()),
        "min_class_size": pa.array([int(out.get("m") or 0)], pa.int64()),
    }))


def chi2_independence(sf_dir: str) -> "ray.data.Dataset":
    """Chi-square test of independence between l_returnflag and
    l_linestatus — the categorical-association check a feature-selection
    pass runs before one-hot-encoding correlated columns.  Emits the
    contingency dimensions, N, the chi² statistic and degrees of
    freedom.

    Exact parity: observed counts are integers; expected counts and the
    chi² sum evaluate the same double expression tree in both engines
    over the SORTED (flag, status) cell order, rounded once at the end.
    NULL categories form their own row/column (GROUP BY semantics).
    The statistic is the FULL-GRID Pearson chi²: a structurally-absent
    cell (observed 0 for a flag×status combination both marginals
    support) contributes its full expected count E to the sum — the twin
    expands the observed table over the flag×status cross join so both
    engines agree on structural zeros (classic TPC-H lineitem has empty
    A/O and R/O cells).

    Scale shape: per-batch cell-count partials over the bounded
    #flags x #statuses domain, one tiny shuffle, driver-side closed form
    on the vocabulary-sized contingency table (bounded pull)."""
    ds = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_linestatus"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["flag", "status", "partial_n"])

    def sentinel(batch: pa.Table) -> pa.Table:
        return pa.table({
            "flag": pc.fill_null(batch.column("flag"), "(null)"),
            "status": pc.fill_null(batch.column("status"), "(null)"),
            "partial_n": batch.column("partial_n")})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(sentinel, batch_format="pyarrow")
             .groupby(["flag", "status"])
             .aggregate(Sum("partial_n", alias_name="n"))
             .take_all())              # bounded: #flags x #statuses cells
    if not cells:
        return ray.data.from_arrow(pa.table({
            "n_flags": pa.array([0], pa.int64()),
            "n_statuses": pa.array([0], pa.int64()),
            "n_rows": pa.array([0], pa.int64()),
            "dof": pa.array([0], pa.int64()),
            "chi2": pa.array([0.0], pa.float64())}))

    cells.sort(key=lambda r: (r["flag"], r["status"]))
    flags = sorted({r["flag"] for r in cells})
    stats = sorted({r["status"] for r in cells})
    fi = {f: i for i, f in enumerate(flags)}
    si = {s: i for i, s in enumerate(stats)}
    obs = np.zeros((len(flags), len(stats)), dtype=np.float64)
    for r in cells:
        obs[fi[r["flag"]], si[r["status"]]] = float(r["n"])
    total = obs.sum()
    rowm = obs.sum(axis=1)
    colm = obs.sum(axis=0)
    # per-cell terms snap to 6dp micro-ints BEFORE the sum (half away
    # from zero; terms are >= 0 so floor(x*1e6 + 0.5)), making the chi2
    # reduction an exact integer sum — order-independent in both engines
    chi2_micro = 0
    for i in range(len(flags)):
        for j in range(len(stats)):
            exp = (rowm[i] * colm[j]) / total
            if exp > 0:
                d = obs[i, j] - exp
                term = (d * d) / exp
                chi2_micro += int(np.floor(term * 1000000.0 + 0.5))
    return ray.data.from_arrow(pa.table({
        "n_flags": pa.array([len(flags)], pa.int64()),
        "n_statuses": pa.array([len(stats)], pa.int64()),
        "n_rows": pa.array([int(total)], pa.int64()),
        "dof": pa.array([(len(flags) - 1) * (len(stats) - 1)], pa.int64()),
        "chi2": pa.array([float(chi2_micro) / 1000000.0], pa.float64()),
    }))


def woe_priority_returns(sf_dir: str) -> "ray.data.Dataset":
    """Weight-of-evidence encoding of order priority against the binary
    label "order had a returned line item" (l_returnflag = 'R') — the
    scorecard-style categorical encoder (credit-risk lineage) that,
    unlike mean target encoding (``target_encode_priority``), is
    symmetric in the odds and robust to rare categories via 0.5
    smoothing:

        woe_i = ln( ((good_i + 0.5) / (G + 0.5K))
                    / ((bad_i + 0.5) / (B + 0.5K)) )

    with good = not-returned, bad = returned, K = #categories; orders
    with no line items count as not-returned (pinned in the twin).
    NULL priority is the '(null)' category.

    Scale shape: lineitem reduces per batch to (orderkey, any-R)
    partials; ONE coarse orderkey-hash union shuffle co-locates each
    order's flag with its priority row (per-bucket numpy lookup, no
    hash-join machinery); per-priority counts roll up through the
    bounded category domain and the WOE closed form runs on the
    #categories-sized table (bounded pull)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderpriority"])
    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_returnflag"])

    def order_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "prio": pc.fill_null(batch.column("o_orderpriority"),
                                 "(null)"),
            "r": pa.array(np.zeros(len(k), np.int64)),
            "is_order": pa.array(np.ones(len(k), np.int64)),
            "__coarse": pa.array((k * _GOLDEN) % nc, pa.int64()),
        })

    def line_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "k": batch.column("l_orderkey"),
            "r": pc.cast(pc.equal(pc.fill_null(
                batch.column("l_returnflag"), ""), "R"), pa.int64()),
        })
        g = t.group_by("k").aggregate([("r", "max")]) \
             .rename_columns(["k", "r"])
        k = g.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "prio": pa.array([""] * len(k), pa.string()),
            "r": g.column("r").cast(pa.int64()),
            "is_order": pa.array(np.zeros(len(k), np.int64)),
            "__coarse": pa.array((k * _GOLDEN) % nc, pa.int64()),
        })

    empty_p = pa.table({"prio": pa.array([], pa.string()),
                        "n_p": pa.array([], pa.int64()),
                        "ret_p": pa.array([], pa.int64())})

    def bucket(group: pa.Table) -> pa.Table:
        is_ord = group.column("is_order").to_numpy().astype(bool)
        if not is_ord.any():
            return empty_p
        k = group.column("k").to_numpy()
        r = group.column("r").to_numpy()
        # flag lookup: order of lineitem partials is irrelevant (max of
        # 0/1 flags); np.maximum.reduceat over the sorted flag rows
        fk = k[~is_ord]
        fr = r[~is_ord]
        order_k = k[is_ord]
        if len(fk):
            s = np.argsort(fk, kind="stable")
            fk, fr = fk[s], fr[s]
            starts = np.flatnonzero(np.r_[True, fk[1:] != fk[:-1]])
            uk = fk[starts]
            uv = np.maximum.reduceat(fr, starts)
            pos = np.searchsorted(uk, order_k)
            pos_c = np.clip(pos, 0, len(uk) - 1)
            hit = uk[pos_c] == order_k
            ret = np.where(hit, uv[pos_c], 0).astype(np.int64)
        else:
            ret = np.zeros(len(order_k), np.int64)
        t = pa.table({
            "prio": group.column("prio").filter(pa.array(is_ord)),
            "n_p": pa.array(np.ones(len(order_k), np.int64)),
            "ret_p": pa.array(ret, pa.int64()),
        })
        g = t.group_by("prio").aggregate([("n_p", "sum"), ("ret_p", "sum")])
        return g.rename_columns(["prio", "n_p", "ret_p"])

    rows = (orders.map_batches(order_partial, batch_format="pyarrow")
            .union(line.map_batches(line_partial, batch_format="pyarrow"))
            .groupby("__coarse")
            .map_groups(bucket, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty_p,
                         batch_format="pyarrow")
            .groupby("prio")
            .aggregate(Sum("n_p", alias_name="n_orders"),
                       Sum("ret_p", alias_name="n_returned"))
            .take_all())            # bounded: one row per priority class
    if not rows:
        return ray.data.from_arrow(pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "n_returned": pa.array([], pa.int64()),
            "woe": pa.array([], pa.float64())}))

    rows.sort(key=lambda x: x["prio"])
    n = np.array([float(x["n_orders"]) for x in rows])
    bad = np.array([float(x["n_returned"]) for x in rows])
    good = n - bad
    kcat = float(len(rows))
    g_tot, b_tot = good.sum(), bad.sum()
    woe = np.log(((good + 0.5) / (g_tot + 0.5 * kcat))
                 / ((bad + 0.5) / (b_tot + 0.5 * kcat)))
    return ray.data.from_arrow(pa.table({
        "o_orderpriority": pa.array([x["prio"] for x in rows], pa.string()),
        "n_orders": pa.array(n.astype(np.int64), pa.int64()),
        "n_returned": pa.array(bad.astype(np.int64), pa.int64()),
        "woe": round6(pa.array(woe, pa.float64())),
    }))


def part_abc_classes(sf_dir: str) -> "ray.data.Dataset":
    """ABC (Pareto) inventory classification of parts by revenue: parts
    sort by revenue descending and classify by the EXCLUSIVE running
    revenue share — A while the prefix share is < 80%, B while < 95%,
    else C (the boundary item that crosses a threshold stays in the
    better class; pinned as the contract).  Emits one row per part with
    its revenue, inclusive cumulative share, and class.

    Exact parity: revenues are exact cents; the class predicates are
    pure integer inequalities (prefix·5 < total·4, prefix·20 < total·19)
    so no float boundary exists; shares round once at the end.

    Scale shape: ONE partkey shuffle reduces lineitem to per-part cents;
    the global descending scan is the two-phase distributed prefix scan
    (``ordered_prefix_scan`` — O(buckets) driver state, no global sort);
    the classifier is a pure map."""
    from ray.data.aggregate import Max, Min

    from ..functions.num import round6
    from ..functions.scan import int_range_buckets, ordered_prefix_scan

    line = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_extendedprice",
                                       "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.cast(pc.floor(pc.multiply(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount"))), 100.0)),
            pa.int64())
        t = pa.table({"l_partkey": batch.column("l_partkey"), "rev_c": rev})
        g = t.group_by("l_partkey").aggregate([("rev_c", "sum")])
        return g.rename_columns(["l_partkey", "rev_c"])

    per_part = (line.map_batches(partial, batch_format="pyarrow")
                .groupby("l_partkey")
                .aggregate(Sum("rev_c", alias_name="rev_c")))

    def add_neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg", pc.negate_checked(batch.column("rev_c").cast(pa.int64())))

    tbl = per_part.map_batches(add_neg, batch_format="pyarrow").materialize()
    empty = pa.table({"l_partkey": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64()),
                      "cum_share": pa.array([], pa.float64()),
                      "abc_class": pa.array([], pa.string())})
    bounds = tbl.aggregate(Min("neg"), Max("neg"))
    if not bounds or bounds.get("min(neg)") is None:
        return ray.data.from_arrow(empty)
    lo, hi = int(bounds["min(neg)"]), int(bounds["max(neg)"])
    total = int(tbl.sum("rev_c"))

    scanned = ordered_prefix_scan(
        tbl, ["neg", "l_partkey"], int_range_buckets("neg", lo, hi),
        value_col="rev_c", out_col="prefix_c")

    def classify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        rev = batch.column("rev_c").to_numpy().astype(np.int64)
        pre = batch.column("prefix_c").to_numpy().astype(np.int64)
        cls = np.where(pre * 5 < total * 4, "A",
                       np.where(pre * 20 < total * 19, "B", "C"))
        return pa.table({
            "l_partkey": batch.column("l_partkey"),
            "revenue": round6(pa.array(rev / 100.0, pa.float64())),
            "cum_share": round6(pa.array(
                (pre + rev).astype(np.float64) / float(total),
                pa.float64())),
            "abc_class": pa.array(cls.tolist(), pa.string()),
        })

    return scanned.map_batches(classify, batch_format="pyarrow")
