"""Event-stream operators: sessionization, approximate sketches.

The reference has no streaming semantics (SURVEY.md §2.5) — these are the
engine additions a training-data pipeline needs over an events table.

Scale shapes:
* sessionization — ONE shuffle on user_id, per-group vectorized gap scan;
* sketches — per-block partials of a few KB merged associatively, so
  distinct-count/quantiles over 10^12 rows move kilobytes per block through
  the object store instead of the key stream.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.joins import sized_read_parquet



def sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user (gap > ``gap_minutes`` starts a new
    session): groupby(user).map_groups with an in-group (ts, event_id) sort
    and a vectorized diff — the classic window-function shape re-expressed
    as a keyed group scan.  Emits (user_id, n_sessions, n_events)."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        group = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum()) if len(ts) else 0
        return pa.table({
            "user_id": pa.array([group.column("user_id")[0].as_py()], pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def hll_distinct_users(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT user_id) via HyperLogLog, run as the same
    ``AggregateFnV2`` the by-type variant uses — ``Dataset.aggregate`` is
    the global (keyless) groupby, so register merging happens inside the
    aggregation tree with NO driver-side merge loop.  Returns a one-row
    table (estimate, precision p)."""
    from ..functions.sketches import make_hll_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    res = ds.aggregate(make_hll_aggregator("user_id", p=p,
                                           name="distinct_users_est"))
    est = (res or {}).get("distinct_users_est")
    if est is None:                          # empty events table
        return pa.table({"distinct_users_est": pa.array([], pa.float64()),
                         "precision_p": pa.array([], pa.int32())})
    return pa.table({"distinct_users_est": pa.array([est], pa.float64()),
                     "precision_p": pa.array([p], pa.int32())})


def cms_user_counts(sf_dir: str, probe_users: tuple = tuple(range(20)),
                    w: int = 2048, d: int = 4) -> pa.Table:
    """Point-frequency estimates for a probe set of user ids via a
    Count-Min sketch ``AggregateFnV2`` — the constant-size answer to
    "how many events did THESE keys have" when the key space is too
    large to rollup exactly (the Bloom-broadcast idea applied to
    counts).  The d*w counter matrix is LINEAR (merge = elementwise
    add), so per-block partials combine associatively in the
    aggregation tree and only one ~64 KB buffer reaches the driver.
    Guarantees (tested): estimate >= exact ALWAYS; overcount bounded by
    e*N/w w.h.p. per key.  Returns (user_id, est_count, n_events)."""
    import numpy as np

    from ..functions.sketches import cms_estimate, make_cms_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    res = ds.aggregate(make_cms_aggregator("user_id", w=w, d=d,
                                           name="cms_users"))
    packed = (res or {}).get("cms_users")
    probes = np.asarray(probe_users, dtype=np.int64)
    if packed is None:                        # empty events table
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "est_count": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    ests, n = cms_estimate(packed, probes, w=w, d=d)
    return pa.table({"user_id": pa.array(probes, pa.int64()),
                     "est_count": pa.array(ests, pa.int64()),
                     "n_events": pa.array([n] * len(probes), pa.int64())})


def ddsketch_value_quantiles(sf_dir: str, alpha: float = 0.01,
                             qs: tuple = (0.5, 0.9, 0.99)) -> pa.Table:
    """Approximate quantiles of events.value via the DDSketch
    ``AggregateFnV2`` as a global ``Dataset.aggregate`` (relative error
    <= alpha; sparse log-bin partials combine associatively in the
    aggregation tree, no driver merge).  Returns one row with the
    requested quantiles and the exact count."""
    from ..functions.sketches import make_ddsketch_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    res = ds.aggregate(make_ddsketch_aggregator(
        "value", alpha=alpha, qs=qs, name="q", include_count=True))
    vals = res["q"] if res else None
    if vals is None:                         # empty events table
        cols = {f"p{int(q * 100)}": pa.array([], pa.float64()) for q in qs}
        cols["n"] = pa.array([], pa.int64())
        return pa.table(cols)
    cols = {f"p{int(q * 100)}": pa.array([vals[i]], pa.float64())
            for i, q in enumerate(qs)}
    cols["n"] = pa.array([int(vals[len(qs)])], pa.int64())
    return pa.table(cols)


def heavy_hitter_users(sf_dir: str, k: int = 4096, top: int = 20) -> pa.Table:
    """Top event producers via a Misra-Gries heavy-hitters summary run as an
    ``AggregateFnV2`` global aggregate — the bounded-memory alternative to
    the exact ``top_users`` groupby: each block reduces to <= k counters
    (~16 KB), partials merge associatively in the aggregation tree, and no
    key stream is ever shuffled.  Guarantees: every user with frequency
    > n/(k+1) is present, each count undercounts by at most the reported
    ``max_undercount`` (0 whenever the true distinct-key count never
    exceeded k — the regime of the test corpora INCLUDING sf0.1's 1,500
    users, hence k=4096 / ~64 KB summaries, which makes the exact SQL
    twin a valid oracle; the eviction/merge path is pinned by unit tests
    with distinct >> k).  Output ordered (est_count desc, user_id asc)."""
    from ..functions.sketches import make_mg_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    res = ds.aggregate(make_mg_aggregator("user_id", k=k, name="hh"))
    flat = (res or {}).get("hh") or [0]      # empty events table -> err 0
    err, pairs = int(flat[0]), flat[1:]
    users = [int(pairs[i]) for i in range(0, min(len(pairs), 2 * top), 2)]
    counts = [int(pairs[i + 1]) for i in range(0, min(len(pairs), 2 * top), 2)]
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "est_count": pa.array(counts, pa.int64()),
        "max_undercount": pa.array([err] * len(users), pa.int64()),
    })


def events_sliding_window(sf_dir: str, window_min: int = 60,
                          slide_min: int = 15) -> "ray.data.Dataset":
    """Hopping/sliding-window aggregate over the event stream: count and
    value sum per [start, start+window) window hopping every ``slide``
    (window divisible by slide) — the windowed-aggregate shape Ray Data
    lacks natively, expressed as explode-to-window-ids + partial combine.

    Each event belongs to exactly window/slide consecutive windows; the
    per-batch map emits (window_id, partial count, partial cent-sum)
    ALREADY COMBINED per window id, so the one shuffle moves tiny partial
    rows regardless of event volume — the same combiner-before-groupby
    rule every other aggregate here follows."""
    from ray.data.aggregate import Sum

    assert window_min % slide_min == 0
    k = window_min // slide_min
    slide_us = slide_min * 60 * 1_000_000
    window_us = window_min * 60 * 1_000_000

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64()).to_numpy()
        w0 = ts // slide_us
        wins, cts, sums = [], [], []
        for off in range(k):
            w = w0 - off
            ok = ts < w * slide_us + window_us   # guards the stream's head
            wins.append(w[ok])
            cts.append(np.ones(ok.sum(), dtype=np.int64))
            sums.append(cents[ok])
        t = pa.table({"w": pa.array(np.concatenate(wins), pa.int64()),
                      "n": pa.array(np.concatenate(cts), pa.int64()),
                      "cents": pa.array(np.concatenate(sums), pa.int64())})
        g = t.group_by("w").aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["w", "partial_n", "partial_cents"])

    agg = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("w")
             .aggregate(Sum("partial_n", alias_name="n_events"),
                        Sum("partial_cents", alias_name="cents")))

    def finish(batch: pa.Table) -> pa.Table:
        w = batch.column("w")
        return pa.table({
            "window_start": pc.cast(pc.multiply(w, slide_us),
                                    pa.timestamp("us")),
            "n_events": batch.column("n_events"),
            "sum_value": pc.divide(pc.cast(batch.column("cents"),
                                           pa.float64()), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def event_funnel(sf_dir: str,
                 stages: tuple = ("signup", "click", "purchase"),
                 window_hours: int = 24) -> pa.Table:
    """Ordered conversion funnel with a per-step conversion window: a user
    reaches stage i+1 when an event of that type occurs STRICTLY after the
    timestamp at which they reached stage i and within ``window_hours`` of
    it (stage times are the earliest qualifying event, computed greedily
    stage by stage — the standard funnel semantics).

    Scale shape: events are pre-filtered to funnel types at the map (the
    only rows that shuffle), ONE groupby on a COARSE user-hash key
    co-locates each user's rows while keeping Python dispatch per BUCKET
    (the coarse_grouped_aggregate rule — not per user), the per-bucket
    kernel computes every user's depth with segmented numpy mins (one
    ``minimum.reduceat`` per stage), and each bucket emits its own depth
    HISTOGRAM, so the final groupby sees <= buckets x stages rows."""
    from ray.data.aggregate import Sum
    from ..functions.agg import _default_num_coarse, _GOLDEN

    stage_list = [str(s) for s in stages]
    win_us = window_hours * 3600 * 1_000_000
    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(stage_list))
        batch = batch.filter(keep).select(["user_id", "ts", "event_type"])
        coarse = (batch.column("user_id").to_numpy(zero_copy_only=False)
                  .astype(np.int64) * _GOLDEN) % nc
        return batch.append_column("coarse", pa.array(coarse, pa.int64()))

    def depth_hist(group: pa.Table) -> pa.Table:
        group = group.sort_by([("user_id", "ascending"),
                               ("ts", "ascending")])
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        uid = group.column("user_id").to_numpy()
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        big = np.iinfo(np.int64).max
        t_prev = np.zeros(len(starts), dtype=np.int64)
        reached = np.ones(len(starts), dtype=bool)
        depth = np.zeros(len(starts), dtype=np.int64)
        for i, s in enumerate(stage_list):
            cond = et == s
            if i > 0:
                tp = t_prev[seg_id]
                cond &= reached[seg_id] & (ts > tp) & (ts <= tp + win_us)
            tmin = np.minimum.reduceat(np.where(cond, ts, big), starts)
            ok = reached & (tmin < big)
            t_prev = np.where(ok, tmin, t_prev)
            depth += ok
            reached = ok
        d, n = np.unique(depth, return_counts=True)
        return pa.table({"depth": pa.array(d, pa.int64()),
                         "partial_n": pa.array(n, pa.int64())})

    agg = (ds.map_batches(prefilter, batch_format="pyarrow")
             .groupby("coarse")
             .map_groups(depth_hist, batch_format="pyarrow")
             .groupby("depth").aggregate(Sum("partial_n", alias_name="n"))
             .take_all())                         # <= len(stages)+1 rows
    by_depth = {int(r["depth"]): int(r["n"]) for r in agg}
    reached = [sum(n for d, n in by_depth.items() if d >= i + 1)
               for i in range(len(stage_list))]
    return pa.table({
        "stage": pa.array(stage_list, pa.string()),
        "stage_idx": pa.array(range(1, len(stage_list) + 1), pa.int32()),
        "n_users": pa.array(reached, pa.int64())})


def user_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly cohort retention: users are cohorted by the ISO week (Monday
    start) of their first event; for every (cohort_week, week_offset) the
    count of cohort users active in that week.

    Scale shape: each batch reduces to DISTINCT (user_id, week) pairs (the
    combiner — shuffle volume is bounded by users x weeks, not events),
    ONE groupby on a coarse user-hash key co-locates each user's pairs
    with per-BUCKET Python dispatch, and the bucket kernel derives every
    user's cohort/offsets with segmented numpy and emits its own
    (cohort, offset) histogram for the tiny final groupby."""
    from ray.data.aggregate import Sum
    from ..functions.agg import _default_num_coarse, _GOLDEN

    us_per_day = 86_400_000_000
    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def week_pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        d = ts // us_per_day
        week_day = d - ((d + 3) % 7)      # epoch day of the week's Monday
        t = pa.table({"user_id": batch.column("user_id"),
                      "week_day": pa.array(week_day, pa.int64())})
        t = (t.group_by(["user_id", "week_day"])
              .aggregate([([], "count_all")])
              .select(["user_id", "week_day"]))
        coarse = (t.column("user_id").to_numpy(zero_copy_only=False)
                  .astype(np.int64) * _GOLDEN) % nc
        return t.append_column("coarse", pa.array(coarse, pa.int64()))

    def bucket_hist(group: pa.Table) -> pa.Table:
        group = group.sort_by([("user_id", "ascending"),
                               ("week_day", "ascending")])
        uid = group.column("user_id").to_numpy()
        wd = group.column("week_day").to_numpy()
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        # per-batch distinct still leaves cross-batch repeats of the same
        # (user, week): drop consecutive duplicates after the sort
        keep = new_seg | np.r_[True, wd[1:] != wd[:-1]]
        uid, wd, new_seg = uid[keep], wd[keep], new_seg[keep]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        cohort = wd[starts][seg_id]       # first (min) week per user
        t = pa.table({
            "cohort_day": pa.array(cohort, pa.int64()),
            "week_offset": pa.array((wd - cohort) // 7, pa.int64())})
        g = (t.group_by(["cohort_day", "week_offset"])
              .aggregate([([], "count_all")]))
        return g.rename_columns(["cohort_day", "week_offset", "partial_n"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": pc.cast(
                pc.multiply(batch.column("cohort_day"), us_per_day),
                pa.timestamp("us")),
            "week_offset": batch.column("week_offset"),
            "n_users": batch.column("n_users")})

    return (ds.map_batches(week_pairs, batch_format="pyarrow")
              .groupby("coarse").map_groups(bucket_hist,
                                            batch_format="pyarrow")
              .groupby(["cohort_day", "week_offset"])
              .aggregate(Sum("partial_n", alias_name="n_users"))
              .map_batches(finish, batch_format="pyarrow"))


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def events_daily_pivot(sf_dir: str,
                       types: tuple = _PIVOT_TYPES) -> "ray.data.Dataset":
    """Long-to-wide PIVOT: one row per day with a count column per event
    type plus the total — the reporting-matrix shape.  Each batch reduces
    to one row per (day) with conditional-count partials (the combiner),
    so the single small groupby sums tiny wide rows; column set is the
    fixed type vocabulary (a pivot over an unbounded vocabulary is a
    different operator — use groupby rows instead)."""
    from ray.data.aggregate import Sum

    us_per_day = 86_400_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(batch.column("ts").cast(pa.int64()),
                                us_per_day), pa.int64())
        cols = {"day": day}
        et = batch.column("event_type")
        for t in types:
            cols[f"p_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        cols["p_total"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t2 = pa.table(cols)
        g = t2.group_by("day").aggregate(
            [(c, "sum") for c in cols if c != "day"])
        return g.rename_columns(["day"] + [c for c in cols if c != "day"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("day")
             .aggregate(*[Sum(f"p_{t}", alias_name=f"n_{t}")
                          for t in types],
                        Sum("p_total", alias_name="n_total")))

    def finish(batch: pa.Table) -> pa.Table:
        out = {"day": pc.cast(pc.multiply(batch.column("day"), us_per_day),
                              pa.timestamp("us"))}
        for t in types:
            out[f"n_{t}"] = batch.column(f"n_{t}")
        out["n_total"] = batch.column("n_total")
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def value_zscore_outliers(sf_dir: str, k_sigma: float = 3.0) -> pa.Table:
    """Per-event-type z-score outlier counts — the two-pass standardize
    pattern: pass 1 reduces each batch to integer moment partials
    (n, sum cents, sum cents^2) per type, a tiny groupby merges them, the
    per-type moments broadcast, and pass 2 is a pure map counting events
    with (v - mu)^2 > k^2 * var.

    Exactness: moments are integer cents (floor(value*100), the suite's
    cents convention), so mu/var derive from exact integers with one
    float op each — the SQL twin computes the identical doubles in the
    identical order, immune to summation-order drift.  The int64 cents^2
    sum bounds each (type, batch) partial at ~3.7e9 rows per type for
    values <= $500 — beyond that, widen to per-batch float partials or
    split the key."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "cents": cents,
                      "cents2": pc.multiply(cents, cents)})
        g = t.group_by("event_type").aggregate(
            [([], "count_all"), ("cents", "sum"), ("cents2", "sum")])
        return g.rename_columns(["event_type", "pn", "ps", "pss"])

    agg = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("pn", alias_name="n"),
                        Sum("ps", alias_name="s"),
                        Sum("pss", alias_name="ss")).take_all())
    if not agg:                               # empty events table
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_outliers": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    stats = {}
    for r in agg:
        n = int(r["n"])
        mu = float(r["s"]) / n
        var = float(r["ss"]) / n - mu * mu
        stats[r["event_type"]] = (n, mu, var)
    ref = ray.put((stats, k_sigma * k_sigma))

    def count_outliers(batch: pa.Table) -> pa.Table:
        st, k2 = ray.get(ref)
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64()).to_numpy().astype(np.float64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        types, counts = [], []
        for t in np.unique(et):
            _, mu, var = st[t]
            d = cents[et == t] - mu
            types.append(t)
            counts.append(int((d * d > k2 * var).sum()))
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "partial_n": pa.array(counts, pa.int64())})

    out = (ds.map_batches(count_outliers, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("partial_n", alias_name="n_outliers")).take_all())
    n_out = {r["event_type"]: int(r["n_outliers"]) for r in out}
    keys = sorted(stats)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "n_outliers": pa.array([n_out.get(t, 0) for t in keys], pa.int64()),
        "n_events": pa.array([stats[t][0] for t in keys], pa.int64())})


def distinct_users_by_type(sf_dir: str) -> "ray.data.Dataset":
    """EXACT COUNT(DISTINCT user_id) per event type — the ground-truth
    companion of the HLL variant: per-batch (type, user) distinct partials
    (the combiner collapses repeats before anything moves), ONE groupby on
    the pair key to finish deduplication, then an in-batch count per type
    rolled up with a Sum.  Shuffle volume is |distinct pairs|, not rows."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"event_type": batch.column("event_type"),
                       "user_id": batch.column("user_id")})
             .group_by(["event_type", "user_id"])
             .aggregate([([], "count_all")]))
        return g.select(["event_type", "user_id"])

    from ray.data.aggregate import Count
    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
               .groupby(["event_type", "user_id"])
               .aggregate(Count(alias_name="_c")))   # native, one row/pair

    def count_per_type(batch: pa.Table) -> pa.Table:
        g = (pa.table({"event_type": batch.column("event_type")})
             .group_by("event_type").aggregate([([], "count_all")]))
        return g.rename_columns(["event_type", "partial_n"])

    return (pairs.map_batches(count_per_type, batch_format="pyarrow")
                 .groupby("event_type")
                 .aggregate(Sum("partial_n", alias_name="distinct_users")))


def user_event_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity quality signal (bots/scrapers show near-zero
    entropy: one event type repeated; engaged users spread across types).

    Scale shape (the `user_retention` shape): each batch reduces to
    (user_id, event_type) partial counts (the combiner — shuffle volume is
    bounded by users x types, not events), ONE groupby on a coarse
    user-hash key co-locates each user's counts, and the bucket kernel
    finishes the counts with Arrow group_by then computes every user's
    entropy with segmented numpy — no per-user dispatch anywhere.

    Bit-parity with the SQL twin: each type's -ln(c/n) is snapped to
    integer micro-units (half away from zero; one value per distinct
    (c, n) pair), the per-user sum of c_i * m_i is exact integer math,
    and only the final division is floating (rounded to 6dp) — the same
    convention as `unigram_logprob`."""
    from ..functions.agg import _default_num_coarse, _GOLDEN
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def type_counts(batch: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": batch.column("user_id"),
                       "event_type": batch.column("event_type")})
             .group_by(["user_id", "event_type"])
             .aggregate([([], "count_all")]))
        g = g.rename_columns(["user_id", "event_type", "partial_c"])
        coarse = (g.column("user_id").to_numpy(zero_copy_only=False)
                  .astype(np.int64) * _GOLDEN) % nc
        return g.append_column("coarse", pa.array(coarse, pa.int64()))

    def bucket_entropy(group: pa.Table) -> pa.Table:
        g = (group.select(["user_id", "event_type", "partial_c"])
             .group_by(["user_id", "event_type"])
             .aggregate([("partial_c", "sum")])
             .sort_by([("user_id", "ascending")]))
        uid = g.column("user_id").to_numpy()
        c = g.column("partial_c_sum").to_numpy().astype(np.int64)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        n = np.add.reduceat(c, starts)[seg_id]      # per-user total, per row
        # micro-int snap of -ln(c/n), half away from zero (values are >= 0,
        # so floor(x + 0.5) IS half-away; np.round would be half-to-even)
        m = np.floor(-np.log(c / n) * 1e6 + 0.5).astype(np.int64)
        ent_sum = np.add.reduceat(c * m, starts)
        n_user = np.add.reduceat(c, starts)
        n_types = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(n_user, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "entropy": round6(pa.array(
                ent_sum.astype(np.float64) / (n_user * 1e6), pa.float64())),
        })

    return (ds.map_batches(type_counts, batch_format="pyarrow")
              .groupby("coarse")
              .map_groups(bucket_entropy, batch_format="pyarrow"))


def hll_distinct_by_type(sf_dir: str, p: int = 12) -> "ray.data.Dataset":
    """Approximate distinct users PER EVENT TYPE via the custom
    AggregateFnV2 HLL aggregator — the sketch as a first-class groupby
    aggregate (no driver-side merge): each block contributes one 4 KB
    register array per group, combined associatively by the shuffle."""
    from ..functions.sketches import make_hll_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return (ds.groupby("event_type")
              .aggregate(make_hll_aggregator("user_id", p=p,
                                             name="distinct_users_est")))


def ddsketch_quantiles_by_type(sf_dir: str, alpha: float = 0.01) -> "ray.data.Dataset":
    """Approximate (p50, p90, p99) of value PER EVENT TYPE via the DDSketch
    AggregateFnV2 — per-group quantiles without sorting any group."""
    from ..functions.sketches import make_ddsketch_aggregator

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    agg = (ds.groupby("event_type")
             .aggregate(make_ddsketch_aggregator("value", alpha=alpha,
                                                 name="q")))

    def unpack(batch: pa.Table) -> pa.Table:
        qlists = batch.column("q").to_pylist()
        return pa.table({
            "event_type": batch.column("event_type"),
            "p50": pa.array([q[0] for q in qlists], pa.float64()),
            "p90": pa.array([q[1] for q in qlists], pa.float64()),
            "p99": pa.array([q[2] for q in qlists], pa.float64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def user_first_last(sf_dir: str) -> "ray.data.Dataset":
    """Per-user first/last event — argmin/argmax of (ts, event_id) with the
    event's type, plus event count and active span (the profile row a
    feature store derives per entity).

    Scale shape: each batch SORTS ONCE on (user_id, ts, event_id) and
    reduces to at most two rows per user (its first and last inside the
    batch — the associative combiner, so shuffle volume is bounded by
    users x blocks, not events) -> ONE coarse user-hash shuffle -> the
    bucket kernel finishes the extremes with two vectorized segment scans.
    No per-user dispatch anywhere; ties at equal ts break on event_id in
    both engines."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "first_ts": pa.array([], pa.timestamp("us")),
        "first_type": pa.array([], pa.string()),
        "last_ts": pa.array([], pa.timestamp("us")),
        "last_type": pa.array([], pa.string()),
        "n_events": pa.array([], pa.int64()),
        "span_us": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "f_ts": pa.array([], pa.int64()),
                "f_id": pa.array([], pa.int64()),
                "f_type": pa.array([], pa.string()),
                "l_ts": pa.array([], pa.int64()),
                "l_id": pa.array([], pa.int64()),
                "l_type": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
                "__coarse": pa.array([], pa.int64()),
            })
        idx = pc.sort_indices(batch, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        b = batch.take(idx)
        uid = b.column("user_id").to_numpy()
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        eid = b.column("event_id").to_numpy()
        types = b.column("event_type")
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)] - 1
        n_p = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        s_i, e_i = pa.array(starts, pa.int64()), pa.array(ends, pa.int64())
        users = uid[starts].astype(np.int64)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "f_ts": pa.array(ts[starts], pa.int64()),
            "f_id": pa.array(eid[starts], pa.int64()),
            "f_type": types.take(s_i),
            "l_ts": pa.array(ts[ends], pa.int64()),
            "l_id": pa.array(eid[ends], pa.int64()),
            "l_type": types.take(e_i),
            "n_p": pa.array(n_p, pa.int64()),
            "__coarse": pa.array((users * _GOLDEN) % nc, pa.int64()),
        })

    def finish(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "f_ts", "f_id", "f_type",
                          "l_ts", "l_id", "l_type", "n_p"])
        tf = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("f_ts", "ascending"),
            ("f_id", "ascending")]))
        uid = tf.column("user_id").to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        tl = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("l_ts", "descending"),
            ("l_id", "descending")]))
        s_i = pa.array(starts, pa.int64())
        firsts, lasts = tf.take(s_i), tl.take(s_i)
        n = np.add.reduceat(tf.column("n_p").to_numpy(), starts) \
            .astype(np.int64)
        f_ts = firsts.column("f_ts")
        l_ts = lasts.column("l_ts")
        return pa.table({
            "user_id": firsts.column("user_id"),
            "first_ts": f_ts.cast(pa.timestamp("us")),
            "first_type": firsts.column("f_type"),
            "last_ts": l_ts.cast(pa.timestamp("us")),
            "last_type": lasts.column("l_type"),
            "n_events": pa.array(n, pa.int64()),
            "span_us": pc.subtract(
                l_ts.combine_chunks() if isinstance(l_ts, pa.ChunkedArray)
                else l_ts,
                f_ts.combine_chunks() if isinstance(f_ts, pa.ChunkedArray)
                else f_ts),
        })

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("__coarse")
             .map_groups(finish, batch_format="pyarrow"))
    # pin the output schema for 0-row inputs (map_groups on an empty
    # grouped dataset yields no blocks)
    return out.map_batches(
        lambda b: b if b.num_rows else empty, batch_format="pyarrow")


def session_stats(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """One row PER SESSION (not per user): user_id, 1-based session index,
    start/end timestamps, event count, duration — the sessionize output a
    downstream feature pipeline actually consumes.

    Scale shape: session boundaries need each user's full ordered stream,
    so raw (user_id, ts, event_id) rows take ONE coarse user-hash shuffle
    (users never split across buckets); the bucket kernel sorts once and
    derives every session of every user in the bucket with segmented
    numpy — breaks at user changes or gaps > ``gap_minutes``, reduceat
    aggregates — no per-user dispatch.  SQL twin: lag-window break flag +
    running-sum session ids + group aggregate."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    gap_us = gap_minutes * 60 * 1_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    def sessions(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "ts", "event_id"])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[False, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.flatnonzero(brk)
        n_ev = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        ends = np.r_[starts[1:], len(uid)] - 1
        # 1-based session ordinal within each user: session seq number
        # minus the seq number of the user's first session
        sess_user_start = np.cumsum(new_user[starts]) - 1
        first_sess_of_user = np.r_[
            0, np.flatnonzero(np.r_[False, np.diff(sess_user_start) > 0])]
        idx = np.arange(len(starts)) - first_sess_of_user[sess_user_start] + 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_idx": pa.array(idx, pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64())
                .cast(pa.timestamp("us")),
            "session_end": pa.array(ts[ends], pa.int64())
                .cast(pa.timestamp("us")),
            "n_events": pa.array(n_ev, pa.int64()),
            "duration_us": pa.array(ts[ends] - ts[starts], pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(sessions, batch_format="pyarrow"))


def events_anomalous_hours(sf_dir: str,
                           k_sigma: float = 3.0) -> "ray.data.Dataset":
    """Hours whose event count exceeds mean + k·sigma of the hourly series
    — anomaly detection over an AGGREGATED series: the raw stream reduces
    to per-hour counts first (tiny: bounded by the time range), global
    moments come from one scalar aggregate over that series, and the
    flagged hours are a filter.  Exact integer moments derive the same
    doubles as the SQL twin (the value_zscore_outliers convention)."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def hour_partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        g = pa.table({"hour": hour}).group_by("hour") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["hour", "partial_n"])

    hours = (ds.map_batches(hour_partial, batch_format="pyarrow")
               .groupby("hour")
               .aggregate(Sum("partial_n", alias_name="n_events"))) \
        .materialize()   # tiny (one row per hour); reused twice below

    def moments(batch: pa.Table) -> pa.Table:
        n = batch.column("n_events")
        return pa.table({
            "k": pa.array([batch.num_rows], pa.int64()),
            "s": pa.array([pc.sum(n).as_py() or 0], pa.int64()),
            "ss": pa.array([pc.sum(pc.multiply(n, n)).as_py() or 0],
                           pa.int64()),
        })

    agg = (hours.map_batches(moments, batch_format="pyarrow")
                .aggregate(Sum("k", alias_name="k"),
                           Sum("s", alias_name="s"),
                           Sum("ss", alias_name="ss")))
    k = (agg or {}).get("k") or 0
    if not k:
        return ray.data.from_arrow(pa.table({
            "hour": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64())}))
    mu = float(agg["s"]) / k
    var = float(agg["ss"]) / k - mu * mu
    thr = (k_sigma * k_sigma) * var

    def flag(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_events"), pa.float64(), safe=False)
        d = pc.subtract(n, mu)
        return batch.filter(pc.greater(pc.multiply(d, d), thr))

    return hours.map_batches(flag, batch_format="pyarrow")


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Event-type transition matrix (the Markov-chain / next-event-model
    input): count, over every user's time-ordered stream, each
    (from_type, to_type) consecutive pair.

    Scale shape: consecutive pairs need each user's full ordered stream,
    so this is the session_stats template — ONE coarse user-hash shuffle
    (a user never splits across buckets), then the bucket kernel sorts
    once on (user, ts, event_id), pairs adjacent rows where the user is
    unchanged (vectorized slice compare), and pre-reduces the bucket's
    pairs with an Arrow group_by before the tiny final rollup.  SQL twin:
    lead() window."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"from_type": pa.array([], pa.string()),
                      "to_type": pa.array([], pa.string()),
                      "partial_n": pa.array([], pa.int64())})

    def pairs(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "ts", "event_id", "event_type"])
        if t.num_rows < 2:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        types = t.column("event_type").combine_chunks()
        sel = pa.array(np.flatnonzero(same), pa.int64())
        sel_next = pa.array(np.flatnonzero(same) + 1, pa.int64())
        p = pa.table({"from_type": types.take(sel),
                      "to_type": types.take(sel_next)})
        g = p.group_by(["from_type", "to_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["from_type", "to_type", "partial_n"])

    partials = (ds.map_batches(tag, batch_format="pyarrow")
                  .groupby("__coarse")
                  .map_groups(pairs, batch_format="pyarrow")
                  .map_batches(lambda b: b if b.num_rows else empty,
                               batch_format="pyarrow"))
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("partial_n", alias_name="n"))


def event_order_audit(sf_dir: str) -> "ray.data.Dataset":
    """Out-of-order ingestion audit: over the stream in ingest order
    (``event_id`` ascending), count adjacent pairs whose event time goes
    BACKWARDS — the late-arrival metric that sizes a streaming pipeline's
    watermark/allowed-lateness.

    Scale shape: a global lag() needs global order, but adjacency is
    local — rows hash to event_id RANGE buckets (parquet metadata min/max,
    no scan), each bucket sorts its own id range once and counts its
    internal inversions, and the driver stitches only the O(buckets)
    boundary pairs from per-bucket (first, last) rows.  No global sort,
    driver state = one row per bucket."""
    import pyarrow.parquet as pq

    from ..functions.agg import _default_num_coarse

    path = f"{sf_dir}/events.parquet"
    ds = sized_read_parquet(path, columns=["event_id", "ts"])

    # id range from parquet row-group stats (metadata only)
    md = pq.ParquetFile(path).metadata
    lo, hi = None, None
    idx = None
    for rg in range(md.num_row_groups):
        for c in range(md.row_group(rg).num_columns):
            col = md.row_group(rg).column(c)
            if col.path_in_schema == "event_id" and col.statistics:
                st = col.statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    empty = pa.table({"n_pairs": pa.array([], pa.int64()),
                      "n_inversions": pa.array([], pa.int64()),
                      "inversion_rate": pa.array([], pa.float64())})
    if lo is None or md.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "n_pairs": pa.array([0], pa.int64()),
            "n_inversions": pa.array([0], pa.int64()),
            "inversion_rate": pa.array([0.0], pa.float64())}))
    nc = _default_num_coarse()
    width = max(1, (hi - lo + nc) // nc)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array((eid - lo) // width, pa.int64()))

    def bucket_stats(group: pa.Table) -> pa.Table:
        t = group.select(["event_id", "ts"])
        t = t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy()
        inv = int(np.count_nonzero(ts[1:] < ts[:-1]))
        return pa.table({
            "bucket": pa.array([int((eid[0] - lo) // width)], pa.int64()),
            "inv": pa.array([inv], pa.int64()),
            "pairs": pa.array([len(ts) - 1], pa.int64()),
            "first_ts": pa.array([int(ts[0])], pa.int64()),
            "last_ts": pa.array([int(ts[-1])], pa.int64()),
        })

    # O(buckets) driver pull: one summary row per range bucket
    rows = (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(bucket_stats, batch_format="pyarrow")
              .take_all())
    rows.sort(key=lambda r: r["bucket"])
    n_inv = sum(r["inv"] for r in rows)
    n_pairs = sum(r["pairs"] for r in rows)
    for prev, cur in zip(rows, rows[1:]):    # stitch bucket boundaries
        n_pairs += 1
        if cur["first_ts"] < prev["last_ts"]:
            n_inv += 1
    from ..functions.num import round6_scalar
    rate = round6_scalar(n_inv / n_pairs) if n_pairs else 0.0
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "n_inversions": pa.array([n_inv], pa.int64()),
        "inversion_rate": pa.array([rate], pa.float64())}))


def user_cohort_values(sf_dir: str) -> "ray.data.Dataset":
    """Cohort value matrix (the LTV/retention-revenue triangle): users
    cohort by the month of their FIRST event; each (cohort_month,
    months_since) cell reports active users and total event value.

    Scale shape: cohort assignment needs each user's first event, so raw
    (user_id, ts, value) rows take ONE coarse user-hash shuffle (users
    never split across buckets — which also makes per-bucket DISTINCT
    user counts exactly additive); the bucket kernel sorts once, derives
    every user's cohort via segment starts, and pre-reduces to
    (cohort, age) partial cells before the tiny final rollup.  Value sums
    ride exact integer cents."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"cohort_month": pa.array([], pa.timestamp("us")),
                      "age_months": pa.array([], pa.int64()),
                      "users_p": pa.array([], pa.int64()),
                      "v_p": pa.array([], pa.int64())})

    def cells(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "ts", "event_id", "value"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sizes = np.diff(np.r_[starts, len(uid)])
        first_of_row = np.repeat(starts, sizes)
        ts = t.column("ts")
        yr = pc.year(ts).to_numpy(zero_copy_only=False)
        mo = pc.month(ts).to_numpy(zero_copy_only=False)
        cohort_us = pc.floor_temporal(ts, unit="month") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        age = ((yr - yr[first_of_row]) * 12
               + (mo - mo[first_of_row])).astype(np.int64)
        v_c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)),
                      pa.int64())
        cell = pa.table({
            "cohort": pa.array(cohort_us[first_of_row], pa.int64()),
            "age_months": pa.array(age, pa.int64()),
            "user_id": t.column("user_id"),
            "v_c": v_c,
        })
        vals = (cell.group_by(["cohort", "age_months"])
                    .aggregate([("v_c", "sum")])
                    .rename_columns(["cohort", "age_months", "v_p"]))
        users = (cell.group_by(["cohort", "age_months", "user_id"])
                     .aggregate([])
                     .group_by(["cohort", "age_months"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["cohort", "age_months", "users_p"]))
        out = vals.join(users, keys=["cohort", "age_months"],
                        join_type="inner")
        return pa.table({
            "cohort_month": out.column("cohort").cast(pa.timestamp("us")),
            "age_months": out.column("age_months"),
            "users_p": out.column("users_p"),
            "v_p": out.column("v_p"),
        })

    partials = (ds.map_batches(tag, batch_format="pyarrow")
                  .groupby("__coarse")
                  .map_groups(cells, batch_format="pyarrow")
                  .map_batches(lambda b: b if b.num_rows else empty,
                               batch_format="pyarrow"))
    agg = partials.groupby(["cohort_month", "age_months"]).aggregate(
        Sum("users_p", alias_name="n_users"),
        Sum("v_p", alias_name="v_c"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_month": batch.column("cohort_month")
                .cast(pa.timestamp("us")),
            "age_months": batch.column("age_months"),
            "n_users": batch.column("n_users"),
            "total_value": pc.divide(
                pc.cast(batch.column("v_c"), pa.float64(), safe=False), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_event_sequences(sf_dir: str) -> "ray.data.Dataset":
    """Per-user ordered event-type path — the behavioral-sequence
    extraction a sequence-model training pipeline runs over an event log
    (user journeys as `click>view>purchase` strings).

    Scale shape: ONE coarse user-hash shuffle of the pruned
    (user_id, ts, event_id, event_type) rows; each bucket sorts once,
    finds user segment boundaries with numpy, and joins every user's
    types in a single ``pc.binary_join`` over a zero-copy LargeListArray
    built from the segment offsets — no per-user dispatch anywhere.  The
    output row is one string proportional to the user's event count:
    inherently a per-key gather (the same contract as SQL ``string_agg``),
    so a whale user costs its own event count, linear not quadratic.

    Rows with NULL event_type are dropped in both engines (SQL
    ``string_agg`` would skip them while a join would null the whole
    sequence; the explicit filter pins one behavior).
    """
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "seq": pa.array([], pa.large_string()),
    })

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("event_type")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        coarse = (uid.astype(np.int64) * _GOLDEN) % nc
        return batch.append_column("__coarse", pa.array(coarse, pa.int64()))

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        types = pc.cast(g.column("event_type").combine_chunks(),
                        pa.large_string())
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        offsets = np.r_[starts, len(uid)].astype(np.int64)
        seq_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), types)
        return pa.table({
            "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
            "n_events": pa.array(np.diff(offsets), pa.int64()),
            "seq": pc.binary_join(seq_list,
                                  pa.scalar(">", pa.large_string())),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(finish, batch_format="pyarrow"))


def inter_event_gaps(sf_dir: str) -> "ray.data.Dataset":
    """Per-event-type inter-arrival statistics — for every event, the gap
    since the SAME user's previous event (any type), attributed to the
    later event's type; rolled up per type as (n_gaps, sum/max gap μs,
    mean gap seconds).  The `lag() OVER (PARTITION BY user ORDER BY ts)`
    shape — the canonical feature-engineering window Ray Data has no
    native operator for — plus the tiny rollup.

    Scale shape: ONE coarse user-hash shuffle of the pruned
    (user_id, ts, event_id, event_type) rows; each bucket sorts once,
    diffs timestamps within user segments (numpy), masks each user's
    first event, partial-combines per type, and a #types-sized groupby
    finishes.  Mean = round6(sum_us / (n * 1e6)) computed identically in
    both engines off exact int64 sums, so ordering cannot perturb it.

    Contracts: rows with NULL ts are dropped in both engines (lag over
    NULL timestamps is order-undefined); NULL event_type is the
    "(null)" sentinel class (COALESCE in the twin) since Ray's
    sort-based group partitioning cannot order NULL keys."""
    from ray.data.aggregate import Max, Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        coarse = (uid.astype(np.int64) * _GOLDEN) % nc
        return batch.append_column("__coarse", pa.array(coarse, pa.int64()))

    empty_p = pa.table({
        "event_type": pa.array([], pa.string()),
        "n_p": pa.array([], pa.int64()),
        "sum_p": pa.array([], pa.int64()),
        "max_p": pa.array([], pa.int64()),
    })

    def bucket_partials(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_p
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        gap = np.diff(ts, prepend=np.int64(0))
        has_gap = np.r_[False, uid[1:] == uid[:-1]]   # user's first: no gap
        etype = pc.fill_null(g.column("event_type"), "(null)")
        t = pa.table({
            "event_type": etype.combine_chunks().filter(
                pa.array(has_gap)),
            "gap": pa.array(gap[has_gap], pa.int64()),
        })
        return (t.group_by("event_type")
                 .aggregate([([], "count_all"), ("gap", "sum"),
                             ("gap", "max")])
                 .rename_columns(["event_type", "n_p", "sum_p", "max_p"]))

    agg = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__coarse")
             .map_groups(bucket_partials, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n_p", alias_name="n_gaps"),
                        Sum("sum_p", alias_name="sum_gap_us"),
                        Max("max_p", alias_name="max_gap_us")))

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_gaps"), pa.int64())
        s = pc.cast(batch.column("sum_gap_us"), pa.int64())
        # a corpus-scale μs sum exceeds 2^53, where Arrow's CHECKED
        # int64->float64 cast raises; SQL's CAST(... AS DOUBLE) is lossy-
        # permissive, so mirror it (both engines then do the same double
        # division on the same rounded operand)
        mean = round6(pc.divide(
            pc.cast(s, pa.float64(), safe=False),
            pc.multiply(pc.cast(n, pa.float64()), 1000000.0)))
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_gaps": n,
            "sum_gap_us": s,
            "max_gap_us": pc.cast(batch.column("max_gap_us"), pa.int64()),
            "mean_gap_sec": mean,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def events_locf_grid(sf_dir: str, start: str = "2024-01-01",
                     end: str = "2024-01-31",
                     step_hours: int = 6) -> "ray.data.Dataset":
    """Time-series gap-fill: resample each event type onto a regular grid
    with last-observation-carried-forward (the ASOF/LOCF feature-
    engineering step — turn an irregular event stream into fixed-step
    model inputs).  For every (event_type, grid_ts), the value of the
    latest event at-or-before the grid point; NULL before a type's first
    event.

    Determinism: events sharing (type, ts) are reduced to the max
    event_id's value BEFORE the as-of lookup (a raw ASOF join would pick
    an arbitrary winner among ties) — pinned identically in the SQL twin
    via a row_number dedup.  NULL type/ts rows are dropped in both
    engines.

    Scale shape: per-batch (type, ts) -> (max event_id, its value)
    partials, ONE type-keyed shuffle (the grid is parameter-sized; per
    type the kernel is a single searchsorted over the type's sorted
    distinct timestamps).  At corpus scale a whale type would salt by
    time range with an O(grid) boundary stitch, the event_order_audit
    pattern."""
    grid = pd.date_range(start, end, freq=f"{step_hours}h")
    grid_us = grid.values.astype("datetime64[us]").astype(np.int64)

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id",
                                     "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))))
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "event_id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        # keep the max event_id per (type, ts); its value rides along by
        # re-taking the argmax row (Arrow max gives the id, take gives
        # the row)
        idx = pc.sort_indices(batch, sort_keys=[
            ("event_type", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = batch.take(idx)
        et = g.column("event_type").combine_chunks()
        ts = g.column("ts").to_numpy()
        last = np.r_[
            (ts[1:] != ts[:-1]) | pc.not_equal(
                et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
                zero_copy_only=False),
            True]
        return g.filter(pa.array(last)).select(
            ["event_type", "ts", "event_id", "value"])

    empty_out = pa.table({"event_type": pa.array([], pa.string()),
                          "grid_ts": pa.array([], pa.timestamp("us")),
                          "last_value": pa.array([], pa.float64())})

    def locf(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("event_type", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = group.take(idx)
        et = g.column("event_type").combine_chunks()
        ts = g.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        val = g.column("value").to_numpy(zero_copy_only=False)
        # cross-batch dedup of (type, ts): keep the last (max event_id)
        neq = np.r_[(ts[1:] != ts[:-1]) | pc.not_equal(
            et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
            zero_copy_only=False), True]
        keep = np.flatnonzero(neq)
        ts, val = ts[keep], val[keep]
        et = et.take(pa.array(keep, pa.int64()))
        starts = np.flatnonzero(np.r_[True, pc.not_equal(
            et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
            zero_copy_only=False)])
        bounds = np.r_[starts, len(ts)]
        types, gts, vals, valid = [], [], [], []
        for si, ei in zip(bounds[:-1], bounds[1:]):
            pos = np.searchsorted(ts[si:ei], grid_us, side="right") - 1
            ok = pos >= 0
            v = np.where(ok, val[si:ei][np.maximum(pos, 0)], np.nan)
            types.append(pa.repeat(et[int(si)], len(grid_us)))
            gts.append(grid_us)
            vals.append(v)
            valid.append(ok)
        v = np.concatenate(vals)
        ok = np.concatenate(valid)
        return pa.table({
            "event_type": pa.concat_arrays(types),
            "grid_ts": pa.array(np.concatenate(gts).astype(
                "datetime64[us]")),
            "last_value": pa.array(np.where(ok, v, np.nan),
                                   from_pandas=True),
        })

    # the per-type loop above is over the handful of types in a bucket;
    # all row-level work inside it is numpy
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(locf, batch_format="pyarrow"))


def user_growth_curve(sf_dir: str) -> "ray.data.Dataset":
    """Cumulative-distinct growth curve: per day, how many users were
    seen for the first time and the running total of distinct users —
    the DAU-growth / corpus-growth chart, i.e. a cumulative
    COUNT(DISTINCT) window no engine computes naively at scale.

    Scale shape: distinct-by-first-occurrence reduces to a per-user MIN
    (first day) — per-batch (user, min day) partials, ONE coarse user
    shuffle with native Min — then a date-domain-bounded per-day rollup
    and a single running-sum finish over the tiny day table.  Rows with
    NULL ts are dropped in both engines (SQL min() skips them; a user
    with only NULL ts has no first day)."""
    from ..functions.agg import coarse_grouped_aggregate
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        g = pa.table({"user_id": batch.column("user_id"), "day": day}) \
            .group_by("user_id").aggregate([("day", "min")])
        return g.rename_columns(["user_id", "first_day"])

    first = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("first_day", "min", "first_day")])

    def day_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["first_day"]).group_by("first_day") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["day", "new_users"])

    per_day = (first.map_batches(day_partial, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("new_users",
                                             alias_name="new_users")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"day": pa.array([], pa.timestamp("us")),
                             "new_users": pa.array([], pa.int64()),
                             "cum_users": pa.array([], pa.int64())})
        idx = pc.sort_indices(batch, sort_keys=[("day", "ascending")])
        g = batch.take(idx)
        nu = g.column("new_users").to_numpy()
        return pa.table({"day": g.column("day"),
                         "new_users": pa.array(nu, pa.int64()),
                         "cum_users": pa.array(np.cumsum(nu), pa.int64())})

    # the day rollup is bounded by the date domain: one-batch finish
    return per_day.repartition(1).map_batches(finish,
                                              batch_format="pyarrow")


def events_type_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Event-type co-occurrence matrix: for every unordered type pair
    (a <= b), how many distinct users did BOTH — the audience-overlap /
    feature-co-occurrence matrix behind funnel design and embedding
    co-training.  Diagonal rows (a = b) count each type's distinct
    users.

    Scale shape: distinct (user, type) pairs combine per batch, ONE
    coarse user shuffle reduces each user to a TYPE BITMASK (types are
    a small vocabulary; the mask is one int64), per-bucket mask
    histograms shrink to <= 2^|types| partial rows, and the pair matrix
    unpacks from mask counts in a finish map — pair counting never
    touches row-level data twice.  NULL types are dropped in both
    engines."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ray.data.aggregate import Sum

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    # pass 0: the type vocabulary (tiny, deterministic order)
    def type_partial(batch: pa.Table) -> pa.Table:
        t = batch.column("event_type")
        return pa.table({"event_type": pc.unique(pc.drop_null(t))})

    tdf = ds.map_batches(type_partial, batch_format="pyarrow").to_pandas()
    types = sorted(set(tdf["event_type"])) if "event_type" in tdf else []
    if not types:
        return ray.data.from_arrow(pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64())}))
    if len(types) > 63:
        raise ValueError(
            f"events_type_overlap packs types into one int64 bitmask; "
            f"{len(types)} distinct event types exceed the 63-bit "
            "capacity — use a pair-explosion path for large vocabularies")
    from ..functions.joins import make_lookup, lookup_np
    ttab = make_lookup(types, np.arange(len(types), dtype=np.int64))
    k = len(types)

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("event_type")))
        bit = lookup_np(batch.column("event_type"), ttab) \
            .astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = pa.table({"user_id": pa.array(uid, pa.int64()),
                      "mask": pa.array(1 << bit, pa.int64()),
                      "__coarse": pa.array((uid * _GOLDEN) % nc,
                                           pa.int64())})
        # per-batch partial: OR the masks per user (sum of distinct
        # powers != OR, so use Arrow max per (user, bit) — simpler: group
        # by user with bit_wise_or via numpy after a sort is overkill;
        # emit distinct (user, mask-bit) rows instead
        return t.group_by(["user_id", "mask", "__coarse"]) \
            .aggregate([]).rename_columns(["user_id", "mask", "__coarse"])

    def bucket_masks(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"mask": pa.array([], pa.int64()),
                             "partial_n": pa.array([], pa.int64())})
        uid = group.column("user_id").to_numpy()
        mask = group.column("mask").to_numpy()
        order = np.argsort(uid, kind="stable")
        uid, mask = uid[order], mask[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        full = np.bitwise_or.reduceat(mask, starts)
        u, c = np.unique(full, return_counts=True)
        return pa.table({"mask": pa.array(u, pa.int64()),
                         "partial_n": pa.array(c, pa.int64())})

    hist = (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse").map_groups(bucket_masks,
                                            batch_format="pyarrow")
            .groupby("mask").aggregate(Sum("partial_n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        masks = batch.column("mask").to_numpy()
        counts = batch.column("n").to_numpy()
        ta, tb, nu = [], [], []
        for i in range(k):
            for j in range(i, k):
                both = (1 << i) | (1 << j)
                sel = (masks & both) == both
                n = int(counts[sel].sum())
                if n:
                    ta.append(types[i])
                    tb.append(types[j])
                    nu.append(n)
        return pa.table({"type_a": pa.array(ta, pa.string()),
                         "type_b": pa.array(tb, pa.string()),
                         "n_users": pa.array(nu, pa.int64())})

    # the mask histogram is <= 2^|types| rows: one-batch finish
    return hist.repartition(1).map_batches(finish, batch_format="pyarrow")


def top_session_paths(sf_dir: str, gap_minutes: int = 30,
                      k: int = 20) -> "ray.data.Dataset":
    """Most common session journeys: per session, the ordered event-type
    path string ("click>view>purchase"), counted corpus-wide, top-``k``
    by frequency (ties broken by path ascending) — the funnel-design /
    UX-analysis table.  NULL-type events are excluded from both the
    paths and the session derivation (pinned in both engines).

    Scale shape: ONE coarse user shuffle derives every session with
    segmented numpy (the session_stats kernel) and joins each session's
    types with a zero-copy list join, pre-reducing to (path, count)
    partials per bucket; a second path-coarse shuffle owns each path's
    total, and per-bucket LOSSLESS top-k candidates (a path's whole
    count lives in one bucket) reduce to k rows in a final limit."""
    from ..functions.agg import (_GOLDEN, _default_num_coarse,
                                 coarse_grouped_aggregate)

    nc = _default_num_coarse()
    gap_us = gap_minutes * 60 * 1_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("event_type")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"path": pa.array([], pa.large_string()),
                      "partial_n": pa.array([], pa.int64())})

    def paths(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        t = group.select(["user_id", "ts", "event_id", "event_type"])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        brk = np.r_[True, (uid[1:] != uid[:-1])
                    | ((ts[1:] - ts[:-1]) > gap_us)]
        starts = np.flatnonzero(brk)
        offsets = np.r_[starts, len(uid)].astype(np.int64)
        types = pc.cast(t.column("event_type").combine_chunks(),
                        pa.large_string())
        path = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                          types),
            pa.scalar(">", pa.large_string()))
        g = pa.table({"path": path}).group_by("path") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["path", "partial_n"])

    counts = coarse_grouped_aggregate(
        ds.map_batches(tag, batch_format="pyarrow")
          .groupby("__coarse").map_groups(paths, batch_format="pyarrow"),
        "path", [("partial_n", "sum", "n_sessions")])

    def topk_partial(batch: pa.Table) -> pa.Table:
        # lossless: each path's TOTAL count is in exactly one bucket row
        idx = pc.sort_indices(batch, sort_keys=[
            ("n_sessions", "descending"), ("path", "ascending")])
        return batch.take(idx[:k])

    return (counts.map_batches(topk_partial, batch_format="pyarrow")
            .sort(["n_sessions", "path"], descending=[True, False])
            .limit(k))


def rolling_active_users(sf_dir: str, window_days: int = 7) -> "ray.data.Dataset":
    """Rolling weekly-active-users: for every calendar day, the distinct
    users active in the trailing ``window_days`` window — the WAU/DAU
    family metric, i.e. a rolling COUNT(DISTINCT) no engine computes by
    windowing (distinct doesn't decompose over sliding frames).

    Scale shape: rows reduce to distinct (user, day) pairs per batch
    (the combiner — volume bounded by users x days, not events), each
    pair explodes to the ``window_days`` window-end days it supports,
    and ONE coarse (day, user)-pair shuffle dedups users who were active
    on several days of the same window before a tiny per-day rollup.
    Output days cover every window end that intersects the data (SQL
    twin: a day grid joined on the trailing range)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ray.data.aggregate import Sum

    nc = _default_num_coarse()
    day_us = 86_400_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        pairs = pa.table({"user_id": batch.column("user_id"),
                          "day": day}).group_by(
            ["user_id", "day"]).aggregate([])
        uid = pairs.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d_us = pairs.column("day").cast(pa.int64()).to_numpy()
        n = len(uid)
        w = np.arange(window_days, dtype=np.int64)
        wday = (np.repeat(d_us, window_days)
                + np.tile(w * day_us, n))
        wuid = np.repeat(uid, window_days)
        coarse = ((wday // day_us) * _GOLDEN + wuid * _GOLDEN) % nc
        return pa.table({
            "user_id": pa.array(wuid, pa.int64()),
            "wday": pa.array(wday, pa.int64()),
            "__coarse": pa.array(coarse, pa.int64()),
        })

    def bucket_count(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"wday": pa.array([], pa.int64()),
                             "partial_n": pa.array([], pa.int64())})
        dd = group.select(["user_id", "wday"]).group_by(
            ["user_id", "wday"]).aggregate([])
        g = dd.select(["wday"]).group_by("wday") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["wday", "partial_n"])

    agg = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("__coarse")
           .map_groups(bucket_count, batch_format="pyarrow")
           .groupby("wday").aggregate(Sum("partial_n",
                                          alias_name="active_users")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch.column("wday").cast(pa.timestamp("us")),
            "active_users": batch.column("active_users"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def events_seasonality(sf_dir: str) -> "ray.data.Dataset":
    """Activity seasonality matrix: event count and exact-cents value sum
    per (ISO weekday, hour-of-day) cell — the 7x24 heatmap behind load
    forecasting and anomaly baselines.  Pure partial-combine: each batch
    reduces to <=168 cells before the one tiny shuffle."""
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        t = pa.table({
            "weekday": pc.cast(pc.day_of_week(batch.column("ts"),
                                              count_from_zero=False,
                                              week_start=1), pa.int64()),
            "hour": pc.cast(pc.hour(batch.column("ts")), pa.int64()),
            "value_c": pc.cast(pc.floor(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
        })
        g = t.group_by(["weekday", "hour"]).aggregate(
            [([], "count_all"), ("value_c", "sum")])
        return g.rename_columns(["weekday", "hour", "partial_n",
                                 "partial_c"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["weekday", "hour"])
           .aggregate(Sum("partial_n", alias_name="n_events"),
                      Sum("partial_c", alias_name="value_c")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "weekday": batch.column("weekday"),
            "hour": batch.column("hour"),
            "n_events": batch.column("n_events"),
            "total_value": pc.divide(pc.cast(
                batch.column("value_c"), pa.float64(), safe=False), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def event_type_drift(sf_dir: str) -> "ray.data.Dataset":
    """Daily distribution-drift monitor: per day, the L1 distance between
    that day's event-type share vector and the corpus-wide shares —
    the data-drift alarm input (rollout bugs and logging regressions
    show up as share shifts long before volume anomalies).

    Scale shape: per-batch (day, type, count) partials -> one tiny
    (days x types)-bounded shuffle -> the corpus share vector derives
    from the same rollup (a second pass over the FINISHED tiny table,
    not the corpus) and the drift is a segmented numpy reduction in one
    finish map.  Each per-type share divides once (cnt/day_total,
    cnt_total/grand) with the twin's operation order and 6dp snap, and
    the L1 sum runs over the snapped micro-ints — exact integer math
    across engines."""
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("event_type"))))
        t = pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "event_type": batch.column("event_type"),
        })
        g = t.group_by(["day", "event_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "event_type", "partial_n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["day", "event_type"])
           .aggregate(Sum("partial_n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                          "n_events": pa.array([], pa.int64()),
                          "l1_drift": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("day", "ascending"), ("event_type", "ascending")])
        g = batch.take(idx)
        # normalize the timestamp unit BEFORE the int round-trip (the
        # shuffle can hand back second-precision days)
        day = g.column("day").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy()
        et = g.column("event_type").to_pandas().to_numpy()
        n = g.column("n").to_numpy().astype(np.int64)
        # corpus share per type (6dp micro-ints, one division per type)
        types, tinv = np.unique(et, return_inverse=True)
        tot_by_type = np.bincount(tinv, weights=n).astype(np.int64)
        grand = int(n.sum())
        corpus_micro = np.asarray(pc.round(
            pa.array(tot_by_type / grand * 1e6), ndigits=0,
            round_mode="half_towards_infinity").cast(pa.int64()))
        starts = np.flatnonzero(np.r_[True, day[1:] != day[:-1]])
        bounds = np.r_[starts, len(day)]
        day_tot = np.add.reduceat(n, starts)
        day_of_row = np.repeat(np.arange(len(starts)), np.diff(bounds))
        share_micro = np.asarray(pc.round(
            pa.array(n / day_tot[day_of_row] * 1e6), ndigits=0,
            round_mode="half_towards_infinity").cast(pa.int64()))
        # L1 over present types + corpus share of ABSENT types (they
        # contribute |0 - corpus_share|)
        diff = np.abs(share_micro - corpus_micro[tinv])
        l1_present = np.add.reduceat(diff, starts)
        corpus_sum = int(corpus_micro.sum())
        present_corpus = np.zeros(len(starts), np.int64)
        np.add.at(present_corpus, day_of_row, corpus_micro[tinv])
        l1 = l1_present + (corpus_sum - present_corpus)
        return pa.table({
            "day": pa.array(day[starts], pa.int64())
                .cast(pa.timestamp("us")),
            "n_events": pa.array(day_tot, pa.int64()),
            "l1_drift": round6(pa.array(l1 / 1e6)),
        })

    # the (days x types) rollup is tiny at any corpus size
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def user_activity_cv(sf_dir: str) -> "ray.data.Dataset":
    """Per-user activity regularity: the coefficient of variation of the
    user's DAILY event counts over their active days — the bot/burst
    detector's core feature (schedulers show cv ~ 0; bursty humans and
    incident spikes push it up).  Emits (user_id, n_days, total_events,
    cv) for users with >= 2 active days.

    Scale shape: per-batch (user, day, count) partials, ONE coarse user
    shuffle; each bucket finishes the (user, day) counts with an Arrow
    group_by and derives every user's moments with segmented numpy.
    Exactness: cv = sqrt((n·Σc² − (Σc)²)/n²)/(Σc/n) is computed from
    EXACT integer moments (daily counts are small; the squares cannot
    overflow) with the identical expression in the SQL twin, so the one
    sqrt/division chain is bit-identical."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        g = pa.table({"user_id": batch.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "day", "c"])
        uid = g.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return g.append_column("__coarse",
                               pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_days": pa.array([], pa.int64()),
                      "total_events": pa.array([], pa.int64()),
                      "cv": pa.array([], pa.float64())})

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "day", "c"]) \
            .group_by(["user_id", "day"]).aggregate([("c", "sum")]) \
            .rename_columns(["user_id", "day", "c"])
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending")])
        t = t.take(idx)
        uid = t.column("user_id").to_numpy()
        c = t.column("c").to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        n = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        s1 = np.add.reduceat(c, starts)
        s2 = np.add.reduceat(c * c, starts)
        keep = n >= 2
        n, s1, s2 = n[keep], s1[keep], s2[keep]
        var = (n * s2 - s1 * s1).astype(np.float64) \
            / (n * n).astype(np.float64)
        mean = s1.astype(np.float64) / n.astype(np.float64)
        cv = round6(pa.array(np.sqrt(var) / mean))
        return pa.table({
            "user_id": pa.array(uid[starts][keep], pa.int64()),
            "n_days": pa.array(n, pa.int64()),
            "total_events": pa.array(s1, pa.int64()),
            "cv": cv,
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__coarse").map_groups(kernel,
                                            batch_format="pyarrow"))


def first_purchase_latency(sf_dir: str) -> "ray.data.Dataset":
    """Per-user conversion latency: time from the user's FIRST event of
    any kind to their FIRST 'purchase' (NULL for users who never
    convert) — the activation-funnel latency feature.  Exact integer
    microseconds; emits (user_id, first_ts, first_purchase_ts,
    latency_sec).

    Scale shape: per-batch partials keep TWO candidate rows per user
    (min ts overall, min purchase ts) via one Arrow group_by with
    conditional min; one coarse user shuffle merges candidates with
    native Min aggregates — no per-user dispatch, nothing row-sized
    past the first map."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    _MAX = (1 << 62)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        ts_us = batch.column("ts").cast(pa.int64())
        is_p = pc.equal(batch.column("event_type"), "purchase")
        # sentinel-max for non-purchases so the min survives NULL-free
        p_us = pc.if_else(pc.fill_null(is_p, False), ts_us,
                          pa.scalar(_MAX, pa.int64()))
        t = pa.table({"user_id": batch.column("user_id"),
                      "first_us": ts_us, "first_p_us": p_us})
        g = t.group_by("user_id").aggregate([("first_us", "min"),
                                             ("first_p_us", "min")])
        return g.rename_columns(["user_id", "first_us", "first_p_us"])

    agg = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("first_us", "min", "first_us"),
                    ("first_p_us", "min", "first_p_us")])

    def finish(batch: pa.Table) -> pa.Table:
        first = batch.column("first_us").to_numpy()
        firstp = batch.column("first_p_us").to_numpy()
        converted = firstp < _MAX
        lat = np.where(converted, (firstp - first) / 1e6, np.nan)
        return pa.table({
            "user_id": batch.column("user_id"),
            "first_ts": batch.column("first_us").cast(pa.timestamp("us")),
            "first_purchase_ts": pc.if_else(
                pa.array(converted),
                batch.column("first_p_us").cast(pa.timestamp("us")),
                pa.scalar(None, pa.timestamp("us"))),
            "latency_sec": round6(pa.array(lat, from_pandas=True)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def table_profile(sf_dir: str, table: str = "events") -> "ray.data.Dataset":
    """Generic column profiler (the Deequ/data-quality-report shape): for
    every column of a table — row count, null count, and an approximate
    distinct count (HyperLogLog p=12) — computed in ONE pass with
    KB-sized per-column partials merged associatively (registers are
    elementwise-max mergeable), never a per-column shuffle of values.

    Distinct counts hash the column's STRING rendering via md5 (stable
    across engines/workers — never Python hash()); tolerance-tested
    against exact distinct counts in the unit suite, and replayed
    bit-exactly by the DuckDB twin (per-type rendering mirrored:
    %f-padded timestamps, bare integral doubles)."""
    from ..functions.sketches import HLL
    from .text import md5_hex

    ds = sized_read_parquet(f"{sf_dir}/{table}.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        cols, nrows, nnulls, regs = [], [], [], []
        for name in batch.column_names:
            col = batch.column(name)
            h = HLL(12)
            valid = pc.drop_null(col)
            if len(valid):
                s = pc.cast(valid, pa.string())
                hx = md5_hex(s.combine_chunks()
                             if isinstance(s, pa.ChunkedArray) else s)
                ints = np.array([int(x[:16], 16) for x in hx.to_pylist()],
                                dtype=np.uint64)
                h.add_hashes(ints)
            cols.append(name)
            nrows.append(batch.num_rows)
            nnulls.append(batch.num_rows - len(valid))
            regs.append(h.registers.tobytes())
        return pa.table({"column": pa.array(cols, pa.string()),
                         "partial_rows": pa.array(nrows, pa.int64()),
                         "partial_nulls": pa.array(nnulls, pa.int64()),
                         "regs": pa.array(regs, pa.binary())})

    def merge(group: pa.Table) -> pa.Table:
        h = HLL(12)
        for blob in group.column("regs").to_pylist():
            h.merge_registers(np.frombuffer(blob, np.uint8))
        return pa.table({
            "column": pa.array([group.column("column")[0].as_py()],
                               pa.string()),
            "n_rows": pa.array([int(pc.sum(
                group.column("partial_rows")).as_py() or 0)], pa.int64()),
            "n_nulls": pa.array([int(pc.sum(
                group.column("partial_nulls")).as_py() or 0)], pa.int64()),
            # floor(est + 0.5), NOT Python round(): the estimate is
            # non-negative, so this is the same half-up convention the
            # SQL twin's floor(est + 0.5) uses — bare round() is
            # banker's and would diverge on an exact .5 estimate
            "approx_distinct": pa.array([math.floor(h.estimate() + 0.5)],
                                        pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("column").map_groups(merge, batch_format="pyarrow"))


def events_pareto_share(sf_dir: str, p: float = 0.9) -> "ray.data.Dataset":
    """Whale concentration: the share of all events produced by the most
    active users at or above the ``p``-quantile activity level — the
    80/20 report behind partition-skew and abuse planning.  "Top users"
    = everyone whose event count >= the percentile_disc(p) count (ties
    all included, deterministic in both engines).

    Scale shape: per-user counts through one coarse shuffle, then a
    (count, n_users) HISTOGRAM (bounded by the distinct-count domain)
    for both the threshold walk and the share sums — user rows never
    reach the driver."""
    from ..functions.agg import coarse_grouped_aggregate
    from ray.data.aggregate import Sum
    from ..functions.num import round6_scalar

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "c"])

    per_user = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("c", "sum", "c")])

    def hist(batch: pa.Table) -> pa.Table:
        g = batch.select(["c"]).group_by("c").aggregate([([], "count_all")])
        return g.rename_columns(["c", "n_users"])

    agg = (per_user.map_batches(hist, batch_format="pyarrow")
           .groupby("c").aggregate(Sum("n_users", alias_name="n_users")))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"n_users": pa.array([], pa.int64()),
                          "top_users": pa.array([], pa.int64()),
                          "total_events": pa.array([], pa.int64()),
                          "top_share": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[("c", "ascending")])
        g = batch.take(idx)
        c = g.column("c").to_numpy().astype(np.int64)
        n = g.column("n_users").to_numpy().astype(np.int64)
        cum = np.cumsum(n)
        total_users = int(cum[-1])
        # percentile_disc(p) over per-user counts: value at rank ceil(p*n)
        thr = int(c[int(np.searchsorted(
            cum, int(np.ceil(p * total_users))))])
        top_mask = c >= thr
        top_users = int(n[top_mask].sum())
        total_events = int((c * n).sum())
        top_events = int((c[top_mask] * n[top_mask]).sum())
        share = round6_scalar(top_events / float(total_events)) \
            if total_events else 0.0
        return pa.table({
            "n_users": pa.array([total_users], pa.int64()),
            "top_users": pa.array([top_users], pa.int64()),
            "total_events": pa.array([total_events], pa.int64()),
            "top_share": pa.array([share], pa.float64()),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


_CORR_COLS = (("l_quantity", 1.0), ("l_extendedprice", 1.0),
              ("l_discount", 100.0), ("l_tax", 100.0))


def numeric_correlations(sf_dir: str, table: str = "lineitem",
                         cols: tuple = _CORR_COLS) -> "ray.data.Dataset":
    """Pairwise Pearson correlation matrix over a table's numeric columns
    — the cross-column companion to `table_profile` (the Deequ-style
    profiling report a pipeline runs before trusting a new data drop).

    Scale shape: the textbook ONE-pass sufficient-statistics reduction —
    each batch ships a single row of exact integer sums (n, Σx, Σx², Σxy
    for every pair), the aggregation tree merges them associatively, and
    the k(k-1)/2-row correlation table is assembled on the driver from
    that constant-size statistic (the `embedding_pca` shape; nothing
    corpus-sized moves, no shuffle at all).

    Bit-parity with the SQL twin: inputs snap to exact integers FIRST
    (``floor(x * scale)``: quantity 1x, price 1x = whole dollars,
    discount/tax 100x = percent points — dollars not cents because
    Σ(price_cents²) already exceeds int64 at sf0.1), so the integer sums
    are order-independent; the final expression casts each sum to DOUBLE
    and evaluates ``(n·Σxy − ΣxΣy) / (√(n·Σx²−Σx²̄)·√(n·Σy²−Σȳ²))`` in
    the identical operation order on both engines (IEEE sqrt is
    correctly-rounded, so it cannot diverge), snapped to round6.

    Integer-overflow contract (guarded per batch): |snapped| < 2^21 and
    batch rows < 2^20, so per-batch sums stay < 2^62; the GLOBAL sums
    must stay < 2^63 — at dollars-scale that holds to ~40x the sf0.1
    corpus per statistic; beyond that, shard the pass and combine the
    per-shard statistics in Python ints (the partial rows are exact)."""
    names = [c for c, _ in cols]
    scales = {c: s for c, s in cols}
    out_empty = pa.table({
        "x_col": pa.array([], pa.string()),
        "y_col": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "corr": pa.array([], pa.float64())})

    pairs = [(names[i], names[j]) for i in range(len(names))
             for j in range(i + 1, len(names))]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows >= (1 << 20):
            raise ValueError("numeric_correlations: batch too large for "
                             "the int64 partial-sum contract")
        # drop rows where ANY selected column is null (pinned contract,
        # mirrored by the twin's WHERE — one shared n for every pair)
        mask = None
        for c in names:
            v = pc.is_valid(batch.column(c))
            mask = v if mask is None else pc.and_(mask, v)
        batch = batch.filter(mask)
        snapped = {}
        for c in names:
            x = pc.cast(pc.floor(pc.multiply(
                pc.cast(batch.column(c), pa.float64()), scales[c])),
                pa.int64()).to_numpy(zero_copy_only=False)
            if len(x) and int(np.abs(x).max()) >= (1 << 21):
                raise ValueError(
                    f"numeric_correlations: |{c}| snap exceeds the 2^21 "
                    "int64 partial-sum contract")
            snapped[c] = x
        out = {"n": [batch.num_rows]}
        for c in names:
            out[f"s_{c}"] = [int(snapped[c].sum())]
            out[f"ss_{c}"] = [int((snapped[c] * snapped[c]).sum())]
        for a, b in pairs:
            out[f"sx_{a}_{b}"] = [int((snapped[a] * snapped[b]).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in out.items()})

    ds = sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=names)
    stat_cols = (["n"] + [f"s_{c}" for c in names]
                 + [f"ss_{c}" for c in names]
                 + [f"sx_{a}_{b}" for a, b in pairs])
    tot = ds.map_batches(partial, batch_format="pyarrow").sum(stat_cols)
    if not tot or not int(tot.get("sum(n)") or 0):
        return ray.data.from_arrow(out_empty)

    import math

    from ..functions.num import round6_scalar
    g = {k: int(tot.get(f"sum({k})") or 0) for k in stat_cols}
    n_f = float(g["n"])
    rows = {"x_col": [], "y_col": [], "n": [], "corr": []}
    for a, b in pairs:
        # identical operation order to the SQL twin, all doubles
        num = n_f * float(g[f"sx_{a}_{b}"]) \
            - float(g[f"s_{a}"]) * float(g[f"s_{b}"])
        dx = n_f * float(g[f"ss_{a}"]) \
            - float(g[f"s_{a}"]) * float(g[f"s_{a}"])
        dy = n_f * float(g[f"ss_{b}"]) \
            - float(g[f"s_{b}"]) * float(g[f"s_{b}"])
        den = math.sqrt(dx) * math.sqrt(dy)
        rows["x_col"].append(a)
        rows["y_col"].append(b)
        rows["n"].append(g["n"])
        rows["corr"].append(round6_scalar(num / den) if den > 0.0
                            else None)
    return ray.data.from_arrow(pa.table({
        "x_col": pa.array(rows["x_col"], pa.string()),
        "y_col": pa.array(rows["y_col"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "corr": pa.array(rows["corr"], pa.float64())}))


def integrity_report(sf_dir: str) -> "ray.data.Dataset":
    """Declarative data-quality constraint suite (the Deequ `check`
    shape): referential integrity, key uniqueness, and range/null checks
    over the warehouse tables — the gate a pipeline runs on every new
    data drop before trusting it downstream.

    Scale shape: every constraint is a LAZY branch emitting per-batch
    (constraint_name, n) partial rows, and all branches UNION into ONE
    execution finished by a single tiny rollup — the streaming executor
    runs the branches concurrently instead of paying per-check pipeline
    latency (the first sequential version took 39 s at sf0.01; this one
    ~4 s).  Per branch:
    - range / not-null / dimension-fk checks FUSE into one map over each
      fact read (dimension key sets broadcast via the shared lookup, so
      orphan counting is an is_in inside the same pass);
    - key uniqueness = metadata row count (no scan) minus distinct keys,
      distinct via the coarse-keyed aggregate (pre-reduced key rows,
      never the driver);
    - the one fact-to-fact reference (lineitem -> orders) is a
      hash-shuffle ``left_anti`` join, both sides key-pruned at the read.

    All counts are exact integers; the DuckDB twin is a UNION ALL of the
    same constraints (NOT EXISTS spelling, so NULL foreign keys count as
    orphans on both engines).  On the bundled corpora every count is 0 —
    tests/test_integrity_report.py plants each violation class."""
    import pyarrow.dataset as pads

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.joins import (BROADCAST_BYTES, join_partitions,
                                   lookup_np, make_lookup,
                                   pruned_parquet_bytes)

    def _tag(name: str, n) -> "tuple[pa.Array, pa.Array]":
        return (pa.array([name], pa.string()), pa.array([int(n)],
                                                        pa.int64()))

    def _count_rows_branch(ds, name):
        def partial(batch: pa.Table) -> pa.Table:
            return pa.table({"constraint_name": pa.array([name],
                                                         pa.string()),
                             "n": pa.array([batch.num_rows], pa.int64())})
        return ds.map_batches(partial, batch_format="pyarrow")

    # --- dimension key sets (broadcast once; bounded catalog domains) --
    part_keys = ray.put(make_lookup(
        pads.dataset(f"{sf_dir}/part.parquet").to_table(
            columns=["p_partkey"]).column("p_partkey"),
        np.zeros(pads.dataset(f"{sf_dir}/part.parquet").count_rows(),
                 dtype=np.int8)))
    supp_keys = ray.put(make_lookup(
        pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
            columns=["s_suppkey"]).column("s_suppkey"),
        np.zeros(pads.dataset(f"{sf_dir}/supplier.parquet").count_rows(),
                 dtype=np.int8)))
    cust_keys = ray.put(make_lookup(
        pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey"]).column("c_custkey"),
        np.zeros(pads.dataset(f"{sf_dir}/customer.parquet").count_rows(),
                 dtype=np.int8)))

    # size rule: when the PRUNED orders key column fits the broadcast
    # budget, the fact->fact fk check also fuses into branch A as an
    # is_in probe (one fewer hash-shuffle join); past the budget it
    # falls back to the left_anti hash join below
    order_keys = None
    if pruned_parquet_bytes(f"{sf_dir}/orders.parquet",
                            ["o_orderkey"]) <= BROADCAST_BYTES:
        order_keys = ray.put(make_lookup(
            pads.dataset(f"{sf_dir}/orders.parquet").to_table(
                columns=["o_orderkey"]).column("o_orderkey"),
            np.zeros(pads.dataset(
                f"{sf_dir}/orders.parquet").count_rows(),
                dtype=np.int8)))

    # --- branch A: all lineitem map checks fused into one pass --------
    def li_checks(batch: pa.Table) -> pa.Table:
        d = batch.column("l_discount")
        bad_disc = int(pc.sum(pc.cast(pc.fill_null(pc.or_(
            pc.less(d, 0.0), pc.greater(d, 1.0)), True),
            pa.int64())).as_py() or 0)
        null_ship = batch.num_rows - int(pc.sum(pc.cast(
            pc.is_valid(batch.column("l_shipdate")),
            pa.int64())).as_py() or 0)
        pk_orphan = int((lookup_np(batch.column("l_partkey"),
                                   ray.get(part_keys),
                                   default=-1) < 0).sum())
        sk_orphan = int((lookup_np(batch.column("l_suppkey"),
                                   ray.get(supp_keys),
                                   default=-1) < 0).sum())
        tags = [_tag("chk_lineitem_discount_range", bad_disc),
                _tag("chk_lineitem_shipdate_notnull", null_ship),
                _tag("fk_lineitem_partkey", pk_orphan),
                _tag("fk_lineitem_suppkey", sk_orphan)]
        if order_keys is not None:
            ok_orphan = int((lookup_np(batch.column("l_orderkey"),
                                       ray.get(order_keys),
                                       default=-1) < 0).sum())
            tags.append(_tag("fk_lineitem_orderkey", ok_orphan))
        names, counts = zip(*tags)
        return pa.table({"constraint_name": pa.concat_arrays(list(names)),
                         "n": pa.concat_arrays(list(counts))})

    li_cols = ["l_partkey", "l_suppkey", "l_discount", "l_shipdate"]
    if order_keys is not None:
        li_cols.append("l_orderkey")
    li = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=li_cols)
    branches = [li.map_batches(li_checks, batch_format="pyarrow")]

    # --- branch B: orders map checks ----------------------------------
    def o_checks(batch: pa.Table) -> pa.Table:
        bad_price = int(pc.sum(pc.cast(pc.fill_null(
            pc.less_equal(batch.column("o_totalprice"), 0.0), True),
            pa.int64())).as_py() or 0)
        ck_orphan = int((lookup_np(batch.column("o_custkey"),
                                   ray.get(cust_keys),
                                   default=-1) < 0).sum())
        names, counts = zip(
            _tag("chk_orders_totalprice_positive", bad_price),
            _tag("fk_orders_custkey", ck_orphan))
        return pa.table({"constraint_name": pa.concat_arrays(names),
                         "n": pa.concat_arrays(counts)})

    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    branches.append(orders.map_batches(o_checks, batch_format="pyarrow"))

    # --- uniqueness branches: distinct-key counts (totals come free
    # from parquet metadata) ------------------------------------------
    totals = {}

    def _distinct_branch(path, key_cols, name):
        totals[name] = pads.dataset(path).count_rows()
        ds = sized_read_parquet(path, columns=key_cols)

        def partial(batch: pa.Table) -> pa.Table:
            g = batch.select(key_cols).group_by(key_cols).aggregate(
                [([], "count_all")])
            return g.rename_columns(key_cols + ["n"])

        agg = coarse_grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            key_cols, [("n", "sum", "n")], hash_cols=[key_cols[0]])
        return _count_rows_branch(agg, name)

    branches.append(_distinct_branch(f"{sf_dir}/customer.parquet",
                                     ["c_custkey"], "pk_customer"))
    branches.append(_distinct_branch(f"{sf_dir}/orders.parquet",
                                     ["o_orderkey"], "pk_orders"))
    branches.append(_distinct_branch(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_linenumber"],
        "pk_lineitem"))

    # --- fact -> fact fk fallback: hash left_anti, key-pruned ---------
    if order_keys is not None:
        pass                         # fused into branch A (size rule)
    elif (pads.dataset(f"{sf_dir}/lineitem.parquet").count_rows() == 0
            or pads.dataset(f"{sf_dir}/orders.parquet").count_rows() == 0):
        # Ray's hash join loses key schemas on fully-empty sides; with an
        # empty orders side every lineitem row is an orphan
        n = pads.dataset(f"{sf_dir}/lineitem.parquet").count_rows()
        branches.append(ray.data.from_arrow(pa.table({
            "constraint_name": pa.array(["fk_lineitem_orderkey"],
                                        pa.string()),
            "n": pa.array([n], pa.int64())})))
    else:
        lk = sized_read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey"])
        ok = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey"])
        orphans = lk.join(ok, join_type="left_anti",
                          num_partitions=join_partitions(None),
                          on=("l_orderkey",), right_on=("o_orderkey",))
        branches.append(_count_rows_branch(orphans,
                                           "fk_lineitem_orderkey"))

    # --- ONE execution: union all branches, one tiny rollup -----------
    from ray.data.aggregate import Sum
    u = branches[0]
    for b in branches[1:]:
        u = u.union(b)
    rolled = {r["constraint_name"]: int(r["n"]) for r in
              u.groupby("constraint_name")
               .aggregate(Sum("n", alias_name="n")).take_all()}

    all_names = ["chk_lineitem_discount_range",
                 "chk_lineitem_shipdate_notnull",
                 "chk_orders_totalprice_positive",
                 "fk_lineitem_orderkey", "fk_lineitem_partkey",
                 "fk_lineitem_suppkey", "fk_orders_custkey",
                 "pk_customer", "pk_lineitem", "pk_orders"]
    out = []
    for name in sorted(all_names):
        if name.startswith("pk_"):
            out.append((name, totals[name] - rolled.get(name, 0)))
        else:
            out.append((name, rolled.get(name, 0)))
    return ray.data.from_arrow(pa.table({
        "constraint_name": pa.array([r[0] for r in out], pa.string()),
        "n_violations": pa.array([r[1] for r in out], pa.int64())}))


def ks_value_drift(sf_dir: str) -> "ray.data.Dataset":
    """Two-sample Kolmogorov-Smirnov drift per event type: split the
    event stream at the midpoint of its time range and report, for each
    type present in BOTH halves, the KS statistic between the two value
    distributions — max over distinct values of |CDF_first - CDF_second|.
    The exact-distribution drift alarm that catches shape changes (new
    price tiers, unit bugs) a mean/sigma monitor misses.

    Scale shape: pass 0 reduces the scan to a 2-int (min, max) epoch
    rollup; the midpoint broadcasts by closure.  Pass 1 is the
    value_percentiles_by_type histogram shape — per-batch
    (type, cent, n_first, n_second) partials, ONE #types x #distinct-cents
    bounded shuffle, then a per-type kernel re-aggregates, sorts once and
    takes the max CDF gap with two cumulative walks.  Both CDFs divide
    exact int64 counts as doubles in the twin's operation order, so the
    6dp-snapped statistic is bit-identical across engines.

    Contract: rows with NULL ts/event_type/value drop (the sibling event
    ops' contract); a type whose rows all land in one half is omitted
    (no defined two-sample statistic)."""
    from ray.data.aggregate import Max, Min

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("event_type"))),
            pc.is_valid(batch.column("value"))))

    def span_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        tus = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({"mn": pa.array([pc.min(tus).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(tus).as_py()], pa.int64())})

    span = ds.map_batches(span_partial, batch_format="pyarrow") \
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx")) \
        or {}
    empty_out = pa.table({
        "event_type": pa.array([], pa.string()),
        "n_first": pa.array([], pa.int64()),
        "n_second": pa.array([], pa.int64()),
        "ks_stat": pa.array([], pa.float64()),
    })
    if span.get("mn") is None:
        return ray.data.from_arrow(empty_out)
    mid = (int(span["mn"]) + int(span["mx"])) // 2   # tiny; closure-broadcast

    def hist_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        tus = pc.cast(batch.column("ts"), pa.int64())
        na = pc.cast(pc.less_equal(tus, mid), pa.int64())
        t = pa.table({
            "event_type": batch.column("event_type"),
            "vc": pc.cast(pc.floor(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
            "na": na,
            "nb": pc.subtract(1, na),
        })
        g = t.group_by(["event_type", "vc"]).aggregate(
            [("na", "sum"), ("nb", "sum")])
        return g.rename_columns(["event_type", "vc", "pna", "pnb"])

    def ks_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        h = group.group_by("vc").aggregate([("pna", "sum"),
                                            ("pnb", "sum")])
        h = h.take(pc.sort_indices(h.column("vc")))
        na = h.column("pna_sum").to_numpy().astype(np.int64)
        nb = h.column("pnb_sum").to_numpy().astype(np.int64)
        ta, tb = int(na.sum()), int(nb.sum())
        if ta == 0 or tb == 0:
            return empty_out
        gap = np.abs(np.cumsum(na).astype(np.float64) / ta
                     - np.cumsum(nb).astype(np.float64) / tb)
        from ..functions.num import round6
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()], pa.string()),
            "n_first": pa.array([ta], pa.int64()),
            "n_second": pa.array([tb], pa.int64()),
            "ks_stat": round6(pa.array([float(gap.max())], pa.float64())),
        })

    return (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(ks_kernel, batch_format="pyarrow"))


def value_cusum_changepoint(sf_dir: str,
                            n_ts_buckets: int = 64) -> "ray.data.Dataset":
    """CUSUM changepoint per event type: over the type's events in
    (ts, event_id) order, the cumulative sum of deviations from the type
    mean peaks at the most likely level-shift point — Page's classic
    changepoint statistic.  Reports, per type, the argmax row (1-based
    index and its timestamp) and the normalized peak |CUSUM| in value
    units.

    Exact-integer form (why this hash-matches across engines): instead of
    the float mean, both engines maximize |S_i| where

        S_i = n_t * prefix_cents_i  -  i * total_cents_t

    (= n_t * CUSUM_i, all int64 — the assert guards the n*total head-
    room), tie broken to the EARLIEST i; the one double division
    |S|/n/100 happens once at the end, in the twin's operation order.

    Scale shape: per-type ordering never sits in one kernel — a pass-0
    rollup (#types rows) fixes the type order, per-type totals and the
    ts range; the shared distributed prefix scan (functions/scan.py)
    then assigns GLOBAL exclusive value- and row-prefixes over the
    (type, ts, event_id) total order in two int-row shuffles, and the
    driver-side per-type offsets (prefix of the pass-0 totals) convert
    global prefixes to per-type ones inside a pure map.  Per-batch
    argmax partials reduce through a #types groupby.  NULL
    ts/type/value rows drop (sibling contract)."""
    from ray.data.aggregate import Max, Min, Sum
    from ..functions.joins import lookup_np, make_lookup
    from ..functions.num import round6
    from ..functions.scan import ordered_prefix_scan

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("event_type"))),
            pc.is_valid(batch.column("value"))))

    # pass 0: per-type (n, total_cents) + ts range, one tiny rollup
    def tot_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "pc_": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        tus = pc.cast(batch.column("ts"), pa.int64())
        vc = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                     pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "pn": pa.array(np.ones(batch.num_rows, np.int64)),
                      "pc_": vc, "mn": tus, "mx": tus})
        g = t.group_by("event_type").aggregate(
            [("pn", "sum"), ("pc_", "sum"), ("mn", "min"), ("mx", "max")])
        return g.rename_columns(["event_type", "pn", "pc_", "mn", "mx"])

    tot = (ds.map_batches(tot_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("pn", alias_name="n"),
                      Sum("pc_", alias_name="tc"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx")))
    tot_tab = pa.concat_tables(
        [pa.table({"event_type": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "tc": pa.array([], pa.int64()),
                   "mn": pa.array([], pa.int64()),
                   "mx": pa.array([], pa.int64())})]
        + [b.select(["event_type", "n", "tc", "mn", "mx"])
           for b in tot.iter_batches(batch_format="pyarrow")])
    empty_out = pa.table({
        "event_type": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "change_idx": pa.array([], pa.int64()),
        "change_ts": pa.array([], pa.timestamp("us")),
        "cusum_max": pa.array([], pa.float64()),
    })
    if tot_tab.num_rows == 0:
        return ray.data.from_arrow(empty_out)
    order = pc.sort_indices(tot_tab.column("event_type"))
    tot_tab = tot_tab.take(order)
    types = tot_tab.column("event_type").to_pylist()
    n_t = tot_tab.column("n").to_numpy().astype(np.int64)
    tc_t = tot_tab.column("tc").to_numpy().astype(np.int64)
    # int64 headroom for n_t * prefix_c and i * tc_t (fail loudly at the
    # scale where the packed statistic would need int128)
    assert (n_t.astype(np.float64)
            * np.abs(tc_t).astype(np.float64)).max() < 2**62, \
        "value_cusum_changepoint: n*total_cents exceeds int64 headroom"
    off_n = np.r_[0, np.cumsum(n_t)[:-1]]
    off_c = np.r_[0, np.cumsum(tc_t)[:-1]]
    ts_lo = int(pc.min(tot_tab.column("mn")).as_py())
    ts_hi = int(pc.max(tot_tab.column("mx")).as_py())
    width = max(1, (ts_hi - ts_lo + n_ts_buckets) // n_ts_buckets)
    tmap = {t: i for i, t in enumerate(types)}
    ttab = make_lookup(types, np.arange(len(types), dtype=np.int64))
    n_ref = ray.put(n_t)
    tc_ref = ray.put(tc_t)
    offn_ref = ray.put(off_n)
    offc_ref = ray.put(off_c)

    def keyed(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        tus = pc.cast(batch.column("ts"), pa.int64())
        tidx = pa.array(lookup_np(batch.column("event_type"), ttab)
                        .astype(np.int64), pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "tidx": tidx,
            "tus": tus,
            "event_id": batch.column("event_id"),
            "vc": pc.cast(pc.floor(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
        })

    def bucket_fn(batch: pa.Table) -> np.ndarray:
        ti = batch.column("tidx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tu = batch.column("tus").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return ti * n_ts_buckets + (tu - ts_lo) // width

    sort_cols = ["tidx", "tus", "event_id"]
    scanned = ordered_prefix_scan(
        ds.map_batches(keyed, batch_format="pyarrow"),
        sort_cols, bucket_fn, value_col="vc", out_col="gpc")
    scanned = ordered_prefix_scan(
        scanned, sort_cols, bucket_fn, value_col=None, out_col="grn")

    def cand_partial(batch: pa.Table) -> pa.Table:
        """Per-batch argmax partial: |S_i| max with earliest-i tie."""
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "i": pa.array([], pa.int64()),
                          "tus": pa.array([], pa.int64()),
                          "abss": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ti = batch.column("tidx").to_numpy().astype(np.int64)
        nn = ray.get(n_ref)
        tc = ray.get(tc_ref)
        on = ray.get(offn_ref)
        oc = ray.get(offc_ref)
        pci = batch.column("gpc").to_numpy().astype(np.int64) \
            - oc[ti] + batch.column("vc").to_numpy().astype(np.int64)
        i = batch.column("grn").to_numpy().astype(np.int64) - on[ti] + 1
        s = nn[ti] * pci - i * tc[ti]
        abss = np.abs(s)
        # per-type best within the batch: lexsort (type, -abss, i)
        o = np.lexsort((i, -abss, ti))
        ti_s = ti[o]
        first = np.r_[True, ti_s[1:] != ti_s[:-1]]
        sel = o[first]
        return pa.table({
            "event_type": batch.column("event_type").take(
                pa.array(sel, pa.int64())),
            "i": pa.array(i[sel], pa.int64()),
            "tus": batch.column("tus").take(pa.array(sel, pa.int64())),
            "abss": pa.array(abss[sel], pa.int64()),
        })

    def best(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("abss", "descending"), ("i", "ascending")])
        g = group.take(idx).slice(0, 1)
        t = g.column("event_type")[0].as_py()
        k = tmap[t]
        nval = int(n_t[k])
        s_abs = float(g.column("abss")[0].as_py())
        return pa.table({
            "event_type": pa.array([t], pa.string()),
            "n": pa.array([nval], pa.int64()),
            "change_idx": g.column("i"),
            "change_ts": pc.cast(g.column("tus"), pa.timestamp("us")),
            "cusum_max": round6(pa.array([s_abs / nval / 100.0],
                                         pa.float64())),
        })

    return (scanned.map_batches(cand_partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(best, batch_format="pyarrow"))


def late_event_report(sf_dir: str,
                      allowed_lateness_sec: int = 3600,
                      n_buckets: int = 256) -> "ray.data.Dataset":
    """Watermark / late-data audit over the event stream: treating
    ``event_id`` as ARRIVAL order, the watermark at each arrival is the
    running max of event time over everything that arrived before; an
    event is out-of-order when its own time sits behind the watermark
    and LATE when it sits more than ``allowed_lateness_sec`` behind —
    the numbers that size a streaming pipeline's window-retention /
    allowed-lateness knobs.  Output per event type: n_events,
    n_out_of_order, n_late, max_lag_sec (6dp).

    Scale shape: the watermark is an exclusive PREFIX MAX over the
    global arrival order — the ``op="max"`` mode of the shared
    distributed prefix scan (one int-row hash shuffle, O(buckets) driver
    state; NULL for the globally-first arrival, matching the twin's
    ``max() OVER (... 1 PRECEDING)``); lag and the per-type rollup are
    pure maps reduced through a #types groupby, all exact int64
    microseconds until the single final division."""
    from ray.data.aggregate import Max, Min, Sum
    from ..functions.num import round6
    from ..functions.scan import int_range_buckets, ordered_prefix_scan

    L = int(allowed_lateness_sec) * 1_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type"])

    def keyed(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("event_type"))),
            pc.is_valid(batch.column("event_id"))))
        return pa.table({
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "tus": pc.cast(batch.column("ts"), pa.int64()),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    bounds = keyed_ds.aggregate(Min("event_id"), Max("event_id")) or {}
    empty_out = pa.table({
        "event_type": pa.array([], pa.string()),
        "n_events": pa.array([], pa.int64()),
        "n_out_of_order": pa.array([], pa.int64()),
        "n_late": pa.array([], pa.int64()),
        "max_lag_sec": pa.array([], pa.float64()),
    })
    if bounds.get("min(event_id)") is None:
        return ray.data.from_arrow(empty_out)
    lo, hi = int(bounds["min(event_id)"]), int(bounds["max(event_id)"])

    scanned = ordered_prefix_scan(
        keyed_ds, ["event_id"],
        int_range_buckets("event_id", lo, hi, n_buckets),
        value_col="tus", out_col="wm", op="max")

    def lag_partial(batch: pa.Table) -> pa.Table:
        wm = batch.column("wm")
        tus = batch.column("tus")
        lag = pc.if_else(pc.is_valid(wm),
                         pc.max_element_wise(pc.subtract(wm, tus),
                                             pa.scalar(0, pa.int64())),
                         pa.scalar(0, pa.int64()))
        t = pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
            "ooo": pc.cast(pc.greater(lag, 0), pa.int64()),
            "late": pc.cast(pc.greater(lag, L), pa.int64()),
            "lag": lag,
        })
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("ooo", "sum"), ("late", "sum"),
             ("lag", "max")])
        return g.rename_columns(["event_type", "pn", "pooo", "plate",
                                 "plag"])

    agg = (scanned.map_batches(lag_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("pooo", alias_name="n_out_of_order"),
                      Sum("plate", alias_name="n_late"),
                      Max("plag", alias_name="max_lag")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_out
        lag = batch.column("max_lag").to_numpy().astype(np.float64)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": batch.column("n_events"),
            "n_out_of_order": batch.column("n_out_of_order"),
            "n_late": batch.column("n_late"),
            "max_lag_sec": round6(pa.array(lag / 1e6, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_churn_labels(sf_dir: str,
                      horizon_days: int = 14) -> "ray.data.Dataset":
    """Churn-label generation — the supervised-dataset builder: split
    the stream at ``max(ts) - horizon_days``; every user active in the
    FEATURE window (before the cutoff) gets one labeled row with
    leakage-safe features computed only from that window:

        (user_id, n_events_before, n_purchases_before,
         days_since_last_seen, churned)

    churned = 1 iff the user has NO event in the label window — exactly
    the (features, label) table a churn model trains on, built without a
    self-join: one pass of per-batch per-user partials (counts, max
    feature-window ts, any-label-window flag), ONE coarse user shuffle,
    and an integer finish (days as exact floor((cutoff - last_ts) /
    86400e6); the cutoff derives from a 1-int max rollup).

    Contract: rows with NULL ts/user_id drop; users who appear ONLY in
    the label window emit no row (no feature support — the twin's WHERE
    pins this)."""
    from ray.data.aggregate import Max
    from ..functions.agg import coarse_grouped_aggregate

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("user_id"))))

    def mx_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        tus = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({"mx": pa.array([pc.max(tus).as_py()],
                                        pa.int64())})

    span = ds.map_batches(mx_partial, batch_format="pyarrow") \
        .aggregate(Max("mx", alias_name="mx")) or {}
    empty_out = pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_events_before": pa.array([], pa.int64()),
        "n_purchases_before": pa.array([], pa.int64()),
        "days_since_last_seen": pa.array([], pa.int64()),
        "churned": pa.array([], pa.int64()),
    })
    if span.get("mx") is None:
        return ray.data.from_arrow(empty_out)
    cutoff = int(span["mx"]) - horizon_days * 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        tus = pc.cast(batch.column("ts"), pa.int64())
        before = pc.less_equal(tus, cutoff)
        nb = pc.cast(before, pa.int64())
        t = pa.table({
            "user_id": batch.column("user_id"),
            "nb": nb,
            "np_": pc.cast(pc.and_(before, pc.equal(
                pc.fill_null(batch.column("event_type"), ""),
                "purchase")), pa.int64()),
            # max feature-window ts (sentinel min when none in window)
            "mt": pc.if_else(before, tus,
                             pa.scalar(np.iinfo(np.int64).min,
                                       pa.int64())),
            "na": pc.subtract(1, nb),        # label-window activity
        })
        g = t.group_by("user_id").aggregate(
            [("nb", "sum"), ("np_", "sum"), ("mt", "max"), ("na", "sum")])
        return g.rename_columns(["user_id", "pnb", "pnp", "pmt", "pna"])

    per_user = coarse_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("pnb", "sum", "n_before"),
                    ("pnp", "sum", "n_purch"),
                    ("pmt", "max", "last_ts"),
                    ("pna", "sum", "n_after")])

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_out
        nb = batch.column("n_before").to_numpy().astype(np.int64)
        keep = nb > 0                       # feature-window support only
        t = batch.filter(pa.array(keep))
        last = t.column("last_ts").to_numpy().astype(np.int64)
        days = (cutoff - last) // 86_400_000_000
        churn = (t.column("n_after").to_numpy().astype(np.int64) == 0) \
            .astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "n_events_before": t.column("n_before"),
            "n_purchases_before": t.column("n_purch"),
            "days_since_last_seen": pa.array(days, pa.int64()),
            "churned": pa.array(churn, pa.int64()),
        })

    return per_user.map_batches(finish, batch_format="pyarrow")


def decayed_user_value(sf_dir: str, halflife_days: float = 7.0
                       ) -> "ray.data.Dataset":
    """Exponentially time-decayed per-user value (the recency-weighted
    engagement feature recommender/churn models consume): each event
    contributes ``value · 2^(−age_days / halflife)`` where age is whole
    days before the corpus's newest event — yesterday's purchase counts
    ~0.9x, last month's ~0.05x.

    Bit-parity discipline: a per-event float decay sum would be
    order-dependent, so the decay factor snaps to integer MICRO-units
    per distinct day-age (floor(pow·1e6 + 0.5) — half-up, matching
    DuckDB round), the contribution is the exact int64 product
    cents·micro, and per-user sums are exact integer math through one
    coarse user shuffle; a single final division (1e8) is rounded to
    6dp.  The anchor T = max(ts) is a 1-value driver pull (documented;
    the twin's scalar subquery).

    Scale shape: per-batch (user, Σ cents·micro, n) partials — the
    combiner — then one coarse user shuffle with native Sums."""
    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6

    day_us = 86_400_000_000
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    t_max = ds.max("ts")          # 1 scalar to the driver (the anchor)
    if t_max is None:             # empty events table: typed empty result
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "decayed_value": pa.array([], pa.float64())}))
    t_max_us = pa.scalar(t_max, pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch.column("ts")),
                                     pc.is_valid(batch.column("value"))))
        ts_us = pc.cast(batch.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        age_d = (t_max_us - ts_us) // day_us
        # decay micro-units per event; libm pow in BOTH engines, half-up
        # snap (positive domain: half-up == DuckDB's half-away round)
        micro = np.floor(np.power(2.0, -(age_d / halflife_days)) * 1e6
                         + 0.5).astype(np.int64)
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        g = (pa.table({"user_id": batch.column("user_id"),
                       "wc": pa.array(cents * micro, pa.int64()),
                       "one": pa.array(np.ones(len(ts_us), np.int64))})
             .group_by("user_id")
             .aggregate([("wc", "sum"), ("one", "sum")]))
        return g.rename_columns(["user_id", "wc", "n"])

    agg = coarse_grouped_aggregate(
        sized_read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        "user_id", [("wc", "sum", "wc"), ("n", "sum", "n_events")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_events": batch.column("n_events"),
            "decayed_value": round6(pc.divide(
                pc.cast(batch.column("wc"), pa.float64(), safe=False),
                1e8)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_modal_event(sf_dir: str) -> "ray.data.Dataset":
    """MODE per group — the most frequent event type per user (with its
    count and the user's total), the grouped-argmax aggregate the
    window/rollup family lacked.  Ties break on the smaller event_type
    string in both engines; NULL event types are dropped (the sibling
    event ops' contract).

    Scale shape: per-batch (user, type) count partials — the combiner,
    shuffle volume bounded by users x types — then ONE coarse user-hash
    shuffle; the bucket kernel finishes counts with Arrow group_by
    (every user is complete in its bucket) and picks each user's modal
    row via one multi-key sort + first-row-per-segment mask."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("event_type")))
        g = (pa.table({"user_id": batch.column("user_id"),
                       "event_type": batch.column("event_type")})
             .group_by(["user_id", "event_type"])
             .aggregate([([], "count_all")]))
        g = g.rename_columns(["user_id", "event_type", "pn"])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "modal_type": pa.array([], pa.string()),
                      "n_modal": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64())})

    def bucket_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = (group.select(["user_id", "event_type", "pn"])
             .group_by(["user_id", "event_type"])
             .aggregate([("pn", "sum")]))
        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("pn_sum", "descending"),
            ("event_type", "ascending")])
        g = g.take(idx)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("pn_sum").to_numpy(zero_copy_only=False)
        first = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(first) - 1
        tot = np.bincount(seg, weights=n).astype(np.int64)
        return pa.table({
            "user_id": g.column("user_id").filter(pa.array(first)),
            "modal_type": g.column("event_type").filter(pa.array(first)),
            "n_modal": g.column("pn_sum").filter(pa.array(first)),
            "n_events": pa.array(tot, pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(bucket_kernel, batch_format="pyarrow"))


def events_debounce_report(sf_dir: str, window_s: int = 3600
                           ) -> "ray.data.Dataset":
    """Debounce/throttle audit — per event type, how many events arrive
    within ``window_s`` seconds of the PREVIOUS event of the same
    (user, type) stream (duplicate-click / retry noise a stream cleaner
    would suppress; lag-based, so each event compares to its immediate
    predecessor).  Ties on ts order by event_id (the inter_event_gaps
    contract).

    Scale shape: one coarse user-hash shuffle; the bucket kernel sorts
    (user, type, ts, id) once and marks suppressed events with a
    numpy segment diff; per-type partials pre-reduce in the bucket so
    the final rollup moves ≤ |types| rows per bucket."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6
    from ray.data.aggregate import Sum

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts",
                                     "event_id"])
    win_us = window_s * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "pn": pa.array([], pa.int64()),
                      "ps": pa.array([], pa.int64())})

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("event_type", "ascending"),
            ("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        typ = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        same = np.r_[False, (uid[1:] == uid[:-1]) & (typ[1:] == typ[:-1])]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        suppressed = same & (gap < win_us)
        t = (pa.table({"event_type": g.column("event_type"),
                       "s": pa.array(suppressed.astype(np.int64))})
             .group_by("event_type")
             .aggregate([([], "count_all"), ("s", "sum")]))
        return t.rename_columns(["event_type", "pn", "ps"])

    agg = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("__coarse")
           .map_groups(bucket, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("ps", alias_name="n_suppressed")))

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_events"), pa.float64(), safe=False)
        s = pc.cast(batch.column("n_suppressed"), pa.float64(), safe=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": batch.column("n_events"),
            "n_suppressed": batch.column("n_suppressed"),
            "suppressed_frac": round6(pc.divide(s, n)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def value_benford_deviation(sf_dir: str) -> "ray.data.Dataset":
    """Benford's-law first-digit audit per event type — the classic
    fabricated/synthetic-number detector: L1 distance between the
    observed first-significant-digit distribution of value (in exact
    cents) and Benford's log10(1 + 1/d).  NULL/non-positive values are
    dropped (no first digit).

    Bit-parity discipline: the first digit comes from the DECIMAL
    STRING of the int64 cents (Arrow and DuckDB format integers
    identically — no float log10 edge cases at powers of ten); observed
    shares and the Benford expectation both snap to integer micro-units
    (floor(c·1e6 / n) and floor(p·1e6 + 0.5)), so the L1 sum is exact
    integer math with one rounded division at the end.

    Scale shape: per-batch (type, digit) count partials — ≤ 9·|types|
    rows per block — one tiny groupby, digits-domain finish map."""
    from ..functions.num import round6
    from ray.data.aggregate import Sum

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.fill_null(pc.greater(batch.column("value"), 0.0), False)))
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        keep = pc.greater(cents, 0)           # value in (0, 0.01) has no cents digit
        t = pa.table({"event_type":
                      batch.column("event_type").filter(keep),
                      "digit": pc.cast(pc.utf8_slice_codeunits(
                          pc.cast(cents.filter(keep), pa.string()), 0, 1),
                          pa.int64())})
        g = t.group_by(["event_type", "digit"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "digit", "pn"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "digit"])
           .aggregate(Sum("pn", alias_name="n")))

    # Benford micro-int expectation per digit (identical in the twin)
    p_micro = np.floor(np.log10(1.0 + 1.0 / np.arange(1, 10)) * 1e6
                       + 0.5).astype(np.int64)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n_values": pa.array([], pa.int64()),
                          "benford_l1": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("event_type", "ascending"), ("digit", "ascending")])
        g = batch.take(idx)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        dg = g.column("digit").to_numpy()
        n = g.column("n").to_numpy()
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        seg = np.cumsum(np.r_[True, et[1:] != et[:-1]]) - 1
        tot = np.bincount(seg, weights=n).astype(np.int64)
        # dense 9-digit share table per type (missing digits share 0)
        share = np.zeros((len(starts), 9), dtype=np.int64)
        share[seg, dg - 1] = n * 1_000_000 // tot[seg]
        l1 = np.abs(share - p_micro[None, :]).sum(axis=1)
        return pa.table({
            "event_type": g.column("event_type").take(
                pa.array(starts, pa.int64())),
            "n_values": pa.array(tot, pa.int64()),
            "benford_l1": round6(pa.array(l1 / 1e6, pa.float64())),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def event_trigrams(sf_dir: str) -> "ray.data.Dataset":
    """Event-type TRIGRAM counts — three consecutive events of the same
    user's time-ordered stream (the order-3 Markov / next-event-model
    input that `event_transitions`' bigrams feed at order 2).  NULL-type
    events are excluded before adjacency (the top_session_paths
    contract), so a NULL never splits a trigram.

    Scale shape: the event_transitions template — ONE coarse user-hash
    shuffle (a user never splits across buckets), bucket kernel sorts
    once on (user, ts, event_id), emits rows where positions i, i+1,
    i+2 share a user (vectorized slice compare), pre-reduces with an
    Arrow group_by, tiny (|types|^3-bounded) final rollup."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("event_type")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"type_1": pa.array([], pa.string()),
                      "type_2": pa.array([], pa.string()),
                      "type_3": pa.array([], pa.string()),
                      "partial_n": pa.array([], pa.int64())})

    def trigrams(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "ts", "event_id", "event_type"])
        if t.num_rows < 3:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = t.column("user_id").to_numpy()
        same3 = (uid[2:] == uid[:-2])          # uid sorted: ends equal
        if not same3.any():                    # => the middle is equal too
            return empty
        types = t.column("event_type").combine_chunks()
        base = np.flatnonzero(same3)
        p = pa.table({
            "type_1": types.take(pa.array(base, pa.int64())),
            "type_2": types.take(pa.array(base + 1, pa.int64())),
            "type_3": types.take(pa.array(base + 2, pa.int64()))})
        g = p.group_by(["type_1", "type_2", "type_3"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["type_1", "type_2", "type_3",
                                 "partial_n"])

    partials = (ds.map_batches(tag, batch_format="pyarrow")
                  .groupby("__coarse")
                  .map_groups(trigrams, batch_format="pyarrow")
                  .map_batches(lambda b: b if b.num_rows else empty,
                               batch_format="pyarrow"))
    return partials.groupby(["type_1", "type_2", "type_3"]).aggregate(
        Sum("partial_n", alias_name="n"))


def user_value_median(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-user discrete median of event value — the
    high-cardinality grouped-median shape (``value_percentiles_by_type``
    covers the |types|-group case; this one has a group per USER, so the
    selection must happen inside the shuffle buckets, never per-group
    dispatch).  percentile_disc semantics: the smallest element with
    cumulative fraction >= 0.5 (0-based index floor((n-1)/2)) — a PICKED
    element, bit-identical in both engines, no interpolation.  NULL
    values drop first; all-null users vanish (the SQL GROUP BY does the
    same).

    Scale shape: ONE coarse user shuffle; the bucket kernel sorts
    (user, value) once and gathers each segment's median by index —
    numpy segment math, per-BUCKET dispatch only."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("value")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_values": pa.array([], pa.int64()),
                      "median_value": pa.array([], pa.float64())})

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("value", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        val = g.column("value").to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sizes = np.diff(np.r_[starts, len(uid)])
        med_idx = starts + (sizes - 1) // 2
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_values": pa.array(sizes, pa.int64()),
            "median_value": pa.array(val[med_idx], pa.float64())})

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(bucket, batch_format="pyarrow"))


def rolling_median_value(sf_dir: str, window_days: int = 7
                         ) -> "ray.data.Dataset":
    """Trailing-window DISCRETE median of event value per (type, day) —
    a WINDOWED HOLISTIC aggregate (order statistics over a sliding
    frame), the one windowed shape `events_sliding_window`'s sums can't
    express and Ray Data has no native operator for.  percentile_disc
    semantics (smallest element with cumulative count >= ceil(n/2)),
    window = the 7 calendar days ending at each observed day; NULL
    type/ts/value rows drop (sibling contract).

    Scale shape: per-batch (type, day, value) count partials collapse
    the stream to its VALUE HISTOGRAM rows — bounded by distinct
    (day, value) pairs per type (a time-grid x price-grid product),
    never event count — then one |types|-group shuffle; the kernel
    sorts by day once and answers every day's window from searchsorted
    slice bounds + a weighted-median gather.  SQL twin: quantile_disc
    OVER (... RANGE 6 PRECEDING)."""
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))),
            pc.is_valid(batch.column("value"))))
        day = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                        day_us)
        t = pa.table({"event_type": batch.column("event_type"),
                      "day_no": day, "value": batch.column("value")})
        g = t.group_by(["event_type", "day_no", "value"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "day_no", "value", "pn"])

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "day_no": pa.array([], pa.int64()),
                      "median_7d": pa.array([], pa.float64())})

    def kernel(group: pa.Table) -> pa.Table:
        g = group.select(["event_type", "day_no", "value", "pn"]) \
            .group_by(["event_type", "day_no", "value"]) \
            .aggregate([("pn", "sum")])
        if g.num_rows == 0:
            return empty
        idx = pc.sort_indices(g, sort_keys=[("day_no", "ascending"),
                                            ("value", "ascending")])
        g = g.take(idx)
        day = g.column("day_no").to_numpy()
        val = g.column("value").to_numpy()
        cnt = g.column("pn_sum").to_numpy()
        days_u = np.unique(day)
        lo = np.searchsorted(day, days_u - (window_days - 1), "left")
        hi = np.searchsorted(day, days_u, "right")
        meds = np.empty(len(days_u), dtype=np.float64)
        for i in range(len(days_u)):
            v = val[lo[i]:hi[i]]
            c = cnt[lo[i]:hi[i]]
            o = np.argsort(v, kind="stable")
            cum = np.cumsum(c[o])
            need = (cum[-1] + 1) // 2        # ceil(total/2)
            meds[i] = v[o][np.searchsorted(cum, need, "left")]
        et = g.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(days_u), pa.string()),
            "day_no": pa.array(days_u, pa.int64()),
            "median_7d": pa.array(meds, pa.float64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("event_type")
              .map_groups(kernel, batch_format="pyarrow"))


def events_interpolate_grid(sf_dir: str, start: str = "2024-01-01",
                            end: str = "2024-01-31",
                            step_hours: int = 6) -> "ray.data.Dataset":
    """Time-series gap-fill by LINEAR INTERPOLATION: resample each event
    type onto a regular grid, each grid point getting the straight-line
    blend of the surrounding two events — the smooth-feature complement
    of ``events_locf_grid`` (LOCF holds the last value; this one slopes
    between neighbors).  NULL outside a type's observed range (pure
    interpolation, no extrapolation) and NULL when the winning event's
    value is NULL.

    Determinism: (type, ts) duplicates reduce to the max event_id's value
    BEFORE the neighbor lookups (pinned by a row_number dedup in the SQL
    twin); the blend ``prev + (next - prev) * (dt_prev / dt_span)`` is
    evaluated with the identical double expression tree in both engines
    and round6-snapped, so operation order cannot perturb the hash.

    Scale shape: the events_locf_grid shape exactly — per-batch
    (type, ts) -> (max event_id, value) partials, ONE type-keyed shuffle,
    per-type kernel = two searchsorteds over the type's sorted distinct
    timestamps (the grid is parameter-sized).  A whale type would salt by
    time range with an O(grid) boundary stitch."""
    from ..functions.num import round6

    grid = pd.date_range(start, end, freq=f"{step_hours}h")
    grid_us = grid.values.astype("datetime64[us]").astype(np.int64)

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id",
                                     "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))))
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "event_id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        idx = pc.sort_indices(batch, sort_keys=[
            ("event_type", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = batch.take(idx)
        et = g.column("event_type").combine_chunks()
        ts = g.column("ts").to_numpy()
        last = np.r_[
            (ts[1:] != ts[:-1]) | pc.not_equal(
                et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
                zero_copy_only=False),
            True]
        return g.filter(pa.array(last)).select(
            ["event_type", "ts", "event_id", "value"])

    empty_out = pa.table({"event_type": pa.array([], pa.string()),
                          "grid_ts": pa.array([], pa.timestamp("us")),
                          "interp_value": pa.array([], pa.float64())})

    def interp(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("event_type", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = group.take(idx)
        et = g.column("event_type").combine_chunks()
        ts = g.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        val = g.column("value").to_numpy(zero_copy_only=False)
        # cross-batch dedup of (type, ts): keep the last (max event_id)
        neq = np.r_[(ts[1:] != ts[:-1]) | pc.not_equal(
            et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
            zero_copy_only=False), True]
        keep = np.flatnonzero(neq)
        ts, val = ts[keep], val[keep]
        et = et.take(pa.array(keep, pa.int64()))
        starts = np.flatnonzero(np.r_[True, pc.not_equal(
            et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
            zero_copy_only=False)])
        bounds = np.r_[starts, len(ts)]
        types, gts, vals = [], [], []
        # per-type loop over the handful of types in a bucket; row-level
        # work inside is numpy
        for si, ei in zip(bounds[:-1], bounds[1:]):
            t, v = ts[si:ei], val[si:ei]
            pos_p = np.searchsorted(t, grid_us, side="right") - 1
            pos_n = np.searchsorted(t, grid_us, side="left")
            ok = (pos_p >= 0) & (pos_n < len(t))
            pts = t[np.maximum(pos_p, 0)]
            nts = t[np.minimum(pos_n, len(t) - 1)]
            pv = v[np.maximum(pos_p, 0)]
            nv = v[np.minimum(pos_n, len(t) - 1)]
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = (grid_us - pts).astype(np.float64) \
                    / (nts - pts).astype(np.float64)
                blend = pv + (nv - pv) * frac
            out = np.where(nts == pts, pv, blend)
            types.append(pa.repeat(et[int(si)], len(grid_us)))
            gts.append(grid_us)
            vals.append(np.where(ok, out, np.nan))
        return pa.table({
            "event_type": pa.concat_arrays(types),
            "grid_ts": pa.array(np.concatenate(gts).astype(
                "datetime64[us]")),
            "interp_value": round6(pa.array(np.concatenate(vals),
                                            from_pandas=True)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(interp, batch_format="pyarrow"))


def event_cooccurrence_pairs(sf_dir: str,
                             window_minutes: int = 30) -> "ray.data.Dataset":
    """Temporal co-occurrence matrix: for every ordered pair of events by
    the SAME user where the later event falls within ``window_minutes``
    strictly after the earlier one, count pairs per (earlier type, later
    type) — the bounded-interval self-join behind "what happens within 30
    minutes of a click" market-basket / causal-precursor features.  Ray
    Data has no interval join; a naive self-join explodes quadratically.

    Determinism: the pair count depends only on the (user, ts, type)
    multiset — equal-timestamp events never pair (strict >), so tie order
    cannot perturb counts.  Contract: NULL user_id/ts/event_type rows drop
    in both engines.

    Scale shape: ONE coarse user-hash shuffle; each bucket sorts once by
    (user, ts) and counts pairs WITHOUT materializing them — per-type
    cumulative counts + two segment-clamped searchsorteds give each row
    its in-window later-type counts, reduced to a T x T partial matrix per
    bucket (T = #types); a #types^2-sized groupby finishes.  Memory is
    O(T x bucket_rows), never O(pairs)."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse

    window_us = np.int64(window_minutes) * 60 * 1_000_000
    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("user_id")),
            pc.is_valid(batch.column("ts"))),
            pc.is_valid(batch.column("event_type"))))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        coarse = (uid.astype(np.int64) * _GOLDEN) % nc
        return batch.append_column("__coarse",
                                   pa.array(coarse, pa.int64()))

    empty_p = pa.table({"type_earlier": pa.array([], pa.string()),
                        "type_later": pa.array([], pa.string()),
                        "n_pairs": pa.array([], pa.int64())})

    def bucket_matrix(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_p
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        denc = pc.dictionary_encode(
            g.column("event_type").combine_chunks())
        vocab = denc.dictionary.to_pylist()              # tiny (T types)
        codes = denc.indices.to_numpy().astype(np.int64)
        n, T = len(ts), len(vocab)
        # segment-clamped searchsorted: shift each user's timestamps into
        # a disjoint numeric band so a global searchsorted cannot cross a
        # user boundary (band width > time range + window)
        seg_id = np.cumsum(np.r_[0, uid[1:] != uid[:-1]])
        t0 = ts.min()
        span = np.int64(ts.max() - t0) + window_us + 2
        assert int(seg_id[-1] + 1) * int(span) < 2**62, \
            "banded searchsorted would overflow; shrink the bucket"
        t_band = (ts - t0) + seg_id * span
        lo = np.searchsorted(t_band, t_band, side="right")
        hi = np.searchsorted(t_band, t_band + window_us, side="right")
        # per-type cumulative counts over the sorted bucket
        out_e, out_l, out_n = [], [], []
        for c in range(T):
            cum = np.r_[0, np.cumsum(codes == c)]
            cnt = cum[hi] - cum[lo]
            per_earlier = np.bincount(codes, weights=cnt, minlength=T)
            for e in range(T):
                if per_earlier[e]:
                    out_e.append(vocab[e])
                    out_l.append(vocab[c])
                    out_n.append(int(per_earlier[e]))
        return pa.table({"type_earlier": pa.array(out_e, pa.string()),
                         "type_later": pa.array(out_l, pa.string()),
                         "n_pairs": pa.array(out_n, pa.int64())})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket_matrix, batch_format="pyarrow")
            .groupby(["type_earlier", "type_later"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs")))


def value_psi_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Population Stability Index drift per event type: split the stream
    at the midpoint of its time range (the ks_value_drift convention),
    derive QUINTILE bucket edges from the FIRST half, and report, per
    (type, bucket), both halves' counts, Laplace-smoothed shares and the
    PSI term (p2-p1)*ln(p2/p1) — the binned-share drift monitor model
    risk teams run alongside KS (KS catches shape moves; PSI quantifies
    mass migration per bucket; rule of thumb: total PSI > 0.2 = action).

    Determinism: edge k is the value at exact integer rank
    ceil(k*n/5) = (k*n+4)//5 of the sorted first-half multiset (pinned
    with a row_number twin, NOT percentile_disc, so no float-rank
    ambiguity); per-BUCKET rows avoid the order-dependent 5-term float
    sum (total PSI = trivial client sum); shares and the ln expression
    use the identical double tree in both engines, round6-snapped.
    Contract: NULL ts/type/value rows drop; a type present in only one
    half is omitted (no defined comparison).

    Scale shape: identical to ks_value_drift — a 2-int span rollup, then
    per-batch (type, cent, n_first, n_second) partials, ONE
    #types x #distinct-cents bounded shuffle, per-type kernel =
    cumulative walk + searchsorted bucketing, 5 rows out per type."""
    from ray.data.aggregate import Max, Min

    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch.column("ts")),
            pc.is_valid(batch.column("event_type"))),
            pc.is_valid(batch.column("value"))))

    def span_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        if batch.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        tus = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({"mn": pa.array([pc.min(tus).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(tus).as_py()], pa.int64())})

    span = ds.map_batches(span_partial, batch_format="pyarrow") \
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx")) \
        or {}
    empty_out = pa.table({
        "event_type": pa.array([], pa.string()),
        "bucket": pa.array([], pa.int64()),
        "n_first": pa.array([], pa.int64()),
        "n_second": pa.array([], pa.int64()),
        "share_first": pa.array([], pa.float64()),
        "share_second": pa.array([], pa.float64()),
        "psi_term": pa.array([], pa.float64()),
    })
    if span.get("mn") is None:
        return ray.data.from_arrow(empty_out)
    mid = (int(span["mn"]) + int(span["mx"])) // 2   # tiny; closure-broadcast

    def hist_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        tus = pc.cast(batch.column("ts"), pa.int64())
        na = pc.cast(pc.less_equal(tus, mid), pa.int64())
        t = pa.table({
            "event_type": batch.column("event_type"),
            "vc": pc.cast(pc.floor(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
            "na": na,
            "nb": pc.subtract(1, na),
        })
        g = t.group_by(["event_type", "vc"]).aggregate(
            [("na", "sum"), ("nb", "sum")])
        return g.rename_columns(["event_type", "vc", "pna", "pnb"])

    def psi_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        h = group.group_by("vc").aggregate([("pna", "sum"),
                                            ("pnb", "sum")])
        h = h.take(pc.sort_indices(h.column("vc")))
        vc = h.column("vc").to_numpy()
        na = h.column("pna_sum").to_numpy().astype(np.int64)
        nb = h.column("pnb_sum").to_numpy().astype(np.int64)
        ta, tb = int(na.sum()), int(nb.sum())
        if ta == 0 or tb == 0:
            return empty_out
        cum = np.cumsum(na)
        ranks = np.array([(k * ta + 4) // 5 for k in (1, 2, 3, 4)],
                         np.int64)
        edges = vc[np.searchsorted(cum, ranks, side="left")]
        bucket = np.searchsorted(edges, vc, side="left")  # #edges < vc
        n1 = np.bincount(bucket, weights=na, minlength=5).astype(np.int64)
        n2 = np.bincount(bucket, weights=nb, minlength=5).astype(np.int64)
        p1 = (n1 + 1.0) / (ta + 5.0)
        p2 = (n2 + 1.0) / (tb + 5.0)
        term = (p2 - p1) * np.log(p2 / p1)
        et = group.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * 5, pa.string()),
            "bucket": pa.array(np.arange(5), pa.int64()),
            "n_first": pa.array(n1, pa.int64()),
            "n_second": pa.array(n2, pa.int64()),
            "share_first": round6(pa.array(p1, pa.float64())),
            "share_second": round6(pa.array(p2, pa.float64())),
            "psi_term": round6(pa.array(term, pa.float64())),
        })

    return (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(psi_kernel, batch_format="pyarrow"))


def value_trimmed_stats(sf_dir: str) -> "ray.data.Dataset":
    """Robust location stats per event type: decile-trimmed mean (drop
    values outside [P10, P90]) and winsorized mean (clamp them to the
    bounds) — the outlier-resistant aggregates feature pipelines use when
    MAD flags heavy tails.  Bounds are DISCRETE percentiles at exact
    integer ranks ceil(0.1*n) / ceil(0.9*n) of the sorted multiset (the
    value_psi_by_type rank convention — no float-rank ambiguity).

    Exactness: values snap to int cents; trimmed/winsorized sums are
    exact int64 (asserted headroom); each mean is ONE double division
    chain ((sum/n)/100) in the twin's operation order, round6-snapped.
    Contract: NULL event_type/value rows drop in both engines.

    Scale shape: per-batch (type, cent, count) histogram partials, ONE
    #types x #distinct-cents bounded shuffle, per-type kernel = one
    sorted cumulative walk (range mask for the trim, two clamp terms for
    winsorizing)."""
    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("value"))))
        t = pa.table({
            "event_type": batch.column("event_type"),
            "vc": pc.cast(pc.floor(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()),
        })
        g = t.group_by(["event_type", "vc"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "vc", "pn"])

    empty_out = pa.table({
        "event_type": pa.array([], pa.string()),
        "n_values": pa.array([], pa.int64()),
        "lo_value": pa.array([], pa.float64()),
        "hi_value": pa.array([], pa.float64()),
        "n_trimmed": pa.array([], pa.int64()),
        "mean_trimmed": pa.array([], pa.float64()),
        "mean_winsorized": pa.array([], pa.float64()),
    })

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        h = group.group_by("vc").aggregate([("pn", "sum")])
        h = h.take(pc.sort_indices(h.column("vc")))
        vc = h.column("vc").to_numpy()
        cnt = h.column("pn_sum").to_numpy().astype(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        lo = int(vc[np.searchsorted(cum, (n + 9) // 10, side="left")])
        hi = int(vc[np.searchsorted(cum, (9 * n + 9) // 10, side="left")])
        assert np.abs(vc).max() < 2**40 and n < 2**22, \
            "cents*count sum would overflow int64; widen the kernel"
        inside = (vc >= lo) & (vc <= hi)
        n_trim = int(cnt[inside].sum())
        sum_trim = int((vc[inside] * cnt[inside]).sum())
        below = int(cnt[vc < lo].sum())
        above = int(cnt[vc > hi].sum())
        sum_wins = sum_trim + lo * below + hi * above
        et = group.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et], pa.string()),
            "n_values": pa.array([n], pa.int64()),
            "lo_value": pa.array([lo / 100.0], pa.float64()),
            "hi_value": pa.array([hi / 100.0], pa.float64()),
            "n_trimmed": pa.array([n_trim], pa.int64()),
            # float(sum) FIRST, then the two divisions — the twin's
            # CAST(sum AS DOUBLE) / n / 100.0 operation order exactly
            "mean_trimmed": round6(pa.array(
                [float(sum_trim) / n_trim / 100.0], pa.float64())),
            "mean_winsorized": round6(pa.array(
                [float(sum_wins) / n / 100.0], pa.float64())),
        })

    return (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(kernel, batch_format="pyarrow"))


def user_bursts(sf_dir: str, window_minutes: int = 60) -> "ray.data.Dataset":
    """Burst detection per user: the maximum number of events falling in
    ANY ``window_minutes`` window anchored at an event ([t, t+W], both
    ends inclusive), plus the earliest anchor timestamp achieving it —
    the rate-spike feature behind abuse/bot screens and hot-user
    throttling.

    Determinism: the count at an anchor depends only on the user's
    timestamp multiset (equal-ts anchors share a count); ties on the max
    break to the EARLIEST anchor, so the (count, ts) argmax is unique.
    Contract: NULL user_id/ts rows drop in both engines.

    Scale shape: ONE coarse user-hash shuffle; each bucket sorts once by
    (user, ts), the event_cooccurrence_pairs banded searchsorted gives
    every anchor its in-window count without materializing windows, and a
    packed-int (count, -ts) argmax per user finishes inside the bucket
    (every user's events land in one bucket — no second shuffle)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    window_us = np.int64(window_minutes) * 60 * 1_000_000
    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("user_id")),
            pc.is_valid(batch.column("ts"))))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        coarse = (uid.astype(np.int64) * _GOLDEN) % nc
        return batch.append_column("__coarse",
                                   pa.array(coarse, pa.int64()))

    empty_out = pa.table({"user_id": pa.array([], pa.int64()),
                          "burst_events": pa.array([], pa.int64()),
                          "burst_start": pa.array([], pa.timestamp("us"))})

    def bursts(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending")])
        g = group.take(idx)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        seg_id = np.cumsum(np.r_[0, uid[1:] != uid[:-1]])
        t0 = ts.min()
        trel = ts - t0
        span = np.int64(trel.max()) + window_us + 2
        assert int(seg_id[-1] + 1) * int(span) < 2**62, \
            "banded searchsorted would overflow; shrink the bucket"
        t_band = trel + seg_id * span
        cnt = (np.searchsorted(t_band, t_band + window_us, side="right")
               - np.searchsorted(t_band, t_band, side="left"))
        # packed (count, earliest-ts) argmax: count major, -trel minor
        assert int(cnt.max()) * int(span) < 2**62, \
            "burst count x band span would overflow the packed argmax"
        pack = cnt * span + (span - 1 - trel)
        t = pa.table({"user_id": g.column("user_id"),
                      "pack": pa.array(pack, pa.int64())})
        agg = t.group_by("user_id").aggregate([("pack", "max")])
        best = agg.column("pack_max").to_numpy()
        return pa.table({
            "user_id": agg.column("user_id"),
            "burst_events": pa.array(best // span, pa.int64()),
            "burst_start": pa.array(
                ((span - 1 - best % span) + t0).astype("datetime64[us]")),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bursts, batch_format="pyarrow"))


def events_autocorrelation(sf_dir: str,
                           lags=(1, 7)) -> "ray.data.Dataset":
    """Lag-k autocorrelation of the DAILY event-count series per event
    type, at lag 1 (day-over-day persistence) and lag 7 (weekly
    seasonality) — the stationarity probe a forecasting pipeline runs
    before picking model order.

    Pairs are calendar-aligned: a day pairs with the day exactly ``k``
    days later when BOTH exist in the type's series (gap days pair with
    nothing).  Pearson r is computed from exact int64 sufficient stats
    (n, Sx, Sy, Sxx, Syy, Sxy) in one fixed double expression —
    ``(n*Sxy - Sx*Sy) / sqrt(n*Sxx - Sx^2) / sqrt(n*Syy - Sy^2)`` —
    round6-snapped, NULL when either variance term is 0 or n < 2.
    Contract: NULL event_type/ts rows drop in both engines.

    Scale shape: the corpus-sized scan pre-reduces to per-(type, day)
    count partials inside map_batches; the rollup is bounded by
    #types x date domain, so lag alignment (searchsorted on a packed
    type/day key) finishes in one map over a repartition(1)."""
    from ray.data.aggregate import Sum
    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))))
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        g = pa.table({"event_type": batch.column("event_type"),
                      "day": day}).group_by(["event_type", "day"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "c"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "day"])
           .aggregate(Sum("c", alias_name="c")))

    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "lag": pa.array([], pa.int64()),
        "n_pairs": pa.array([], pa.int64()),
        "autocorr": pa.array([], pa.float64()),
    })

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        g = batch.take(pc.sort_indices(batch, sort_keys=[
            ("event_type", "ascending"), ("day", "ascending")]))
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        eday = g.column("day").to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        c = g.column("c").to_numpy().astype(np.int64)
        # dense per-type codes in sorted order
        new_t = np.r_[True, types[1:] != types[:-1]]
        tcode = np.cumsum(new_t) - 1
        span = np.int64(eday.max() - eday.min() + 366)
        key = tcode * span + (eday - eday.min())
        uniq_types = types[new_t]
        out_t, out_lag, out_n, out_r = [], [], [], []
        for k in lags:
            pos = np.searchsorted(key, key + k)
            ok = (pos < len(key)) & (key[np.minimum(pos, len(key) - 1)]
                                     == key + k)
            x = c[ok]
            y = c[np.minimum(pos, len(key) - 1)[ok]]
            tc = tcode[ok]
            nt = len(uniq_types)
            n = np.bincount(tc, minlength=nt).astype(np.int64)

            def isum(v):
                s = np.zeros(nt, np.int64)
                np.add.at(s, tc, v)
                return s

            sx, sy = isum(x), isum(y)
            sxx, syy, sxy = isum(x * x), isum(y * y), isum(x * y)
            num = (n * sxy - sx * sy).astype(np.float64)
            dx = (n * sxx - sx * sx).astype(np.float64)
            dy = (n * syy - sy * sy).astype(np.float64)
            valid = (n >= 2) & (dx > 0) & (dy > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                r = num / np.sqrt(dx) / np.sqrt(dy)
            out_t.append(uniq_types)
            out_lag.append(np.full(nt, k, np.int64))
            out_n.append(n)
            out_r.append(round6(pa.array(np.where(valid, r, np.nan),
                                         pa.float64(), mask=~valid)))
        return pa.table({
            "event_type": pa.array(np.concatenate(out_t), pa.string()),
            "lag": pa.array(np.concatenate(out_lag), pa.int64()),
            "n_pairs": pa.array(np.concatenate(out_n), pa.int64()),
            "autocorr": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_r]),
        })

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def events_scd2_intervals(sf_dir: str) -> "ray.data.Dataset":
    """SCD-Type-2 compaction of the event stream: per user, consecutive
    runs of the SAME event_type collapse to one validity interval
    (valid_from = run's first ts, valid_to = next run's first ts, NULL
    for the open current run) with the run's event count — the
    change-data-capture → dimension-table shape every warehouse ETL
    needs and Ray Data has no native operator for.

    Contracts: NULL ts rows drop in both engines (interval endpoints are
    order-defined); NULL event_type is a legitimate run value (compared
    via the '(null)' sentinel, emitted back as NULL); ties on ts break
    by event_id.

    Scale shape: ONE coarse user-hash shuffle of the pruned rows; each
    bucket sorts once and detects run boundaries with a vectorized
    dictionary-code diff; intervals never materialize on the driver."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "valid_from": pa.array([], pa.timestamp("us")),
        "valid_to": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
    })

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("ts")))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__coarse", pa.array((uid.astype(np.int64) * _GOLDEN) % nc,
                                 pa.int64()))

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        et = g.column("event_type").combine_chunks() \
            if isinstance(g.column("event_type"), pa.ChunkedArray) \
            else g.column("event_type")
        codes = pc.fill_null(et, "(null)").dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        new_run = np.r_[True, (uid[1:] != uid[:-1])
                        | (codes[1:] != codes[:-1])]
        starts = np.flatnonzero(new_run)
        n_ev = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        run_uid = uid[starts]
        vfrom = ts[starts]
        # valid_to = next run's valid_from when it belongs to the same user
        vto = np.r_[vfrom[1:], np.int64(0)]
        open_run = np.r_[run_uid[1:] != run_uid[:-1], True]
        return pa.table({
            "user_id": pa.array(run_uid, pa.int64()),
            "event_type": et.take(pa.array(starts, pa.int64())),
            "valid_from": pa.array(vfrom, pa.int64()).cast(
                pa.timestamp("us")),
            "valid_to": pa.array(vto, pa.int64(), mask=open_run).cast(
                pa.timestamp("us")),
            "n_events": pa.array(n_ev, pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))


def user_value_twap(sf_dir: str) -> "ray.data.Dataset":
    """Per-user time-weighted average value (TWAP): each event's value
    holds (LOCF) until the user's next event; the average weights every
    held value by its holding duration — the metric that de-biases
    burst-heavy users whose plain mean is dominated by rapid-fire
    events.

    Contracts (pinned in the SQL twin): NULL ts / NULL value rows drop;
    single-event users emit nothing (no holding interval); users whose
    events all share one timestamp drop too (zero total duration).
    Values snap to exact cents (floor(value*100), the repo's money
    convention) BEFORE the weighted sum, so both engines sum identical
    integers in any order.

    Scale shape: ONE coarse user-hash shuffle; per-bucket sort + numpy
    segment diffs; int64 cent-microsecond products reduce per user
    (~1e13 per gap typical).  Near the int64 budget the engines stay in
    lockstep rather than silently diverging: a per-gap product that
    exceeds BIGINT raises OverflowError (DuckDB's multiply does the
    same), and per-user sums approaching int64 re-reduce with exact
    Python bigints (DuckDB's SUM widens to HUGEINT)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id", "value"])

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_gaps": pa.array([], pa.int64()),
        "total_dur_s": pa.array([], pa.float64()),
        "twap": pa.array([], pa.float64()),
    })

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch.column("ts")),
                                     pc.is_valid(batch.column("value"))))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__coarse", pa.array((uid.astype(np.int64) * _GOLDEN) % nc,
                                 pa.int64()))

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        vc = np.floor(g.column("value").to_numpy() * 100.0).astype(np.int64)
        # gap i belongs to row i (value holds until the next event)
        same = uid[1:] == uid[:-1]
        diffs = ts[1:] - ts[:-1]
        # overflow guard: the per-gap cent-microsecond product must fit
        # BIGINT, matching the SQL twin (DuckDB raises on BIGINT multiply
        # overflow; numpy would wrap silently).  Float bound first (53-bit
        # mantissa, 2**62 leaves 2x margin), exact Python-int re-check on
        # the flagged gaps only.
        prod_f = np.abs(vc[:-1].astype(np.float64)) * \
            diffs.astype(np.float64)
        risky = (prod_f > float(2 ** 62)) & same
        if risky.any():
            for v, d in zip(vc[:-1][risky].tolist(),
                            diffs[risky].tolist()):
                if abs(v * d) > 2 ** 63 - 1:
                    raise OverflowError(
                        "user_value_twap: value_cents*duration_us = "
                        f"{v}*{d} exceeds BIGINT — same overflow the SQL "
                        "twin raises; split the holding interval or "
                        "clamp the value upstream")
        dur = diffs[same]
        w = (vc[:-1] * diffs)[same]
        gap_uid = uid[:-1][same]
        starts = np.flatnonzero(np.r_[True, gap_uid[1:] != gap_uid[:-1]]) \
            if len(gap_uid) else np.array([], np.int64)
        if not len(starts):
            return empty
        users = gap_uid[starts]
        dsum = np.add.reduceat(dur, starts)
        wsum = np.add.reduceat(w, starts)
        n = np.diff(np.r_[starts, len(gap_uid)]).astype(np.int64)
        # per-user ACCUMULATION parity: DuckDB's SUM(BIGINT) widens to
        # HUGEINT, numpy's reduceat wraps.  Segments whose |w| float-sum
        # nears int64 re-sum with exact Python bigints (each element is
        # already proven to fit int64 above, so .tolist() is exact).
        twap_f = np.zeros(len(starts), np.float64)
        np.divide(wsum, 100.0 * dsum, out=twap_f, where=dsum > 0)
        abs_sum_f = np.add.reduceat(np.abs(w).astype(np.float64), starts)
        big = np.flatnonzero(abs_sum_f > float(2 ** 62))
        if len(big):
            bounds = np.r_[starts, len(gap_uid)]
            for si in big.tolist():
                exact = sum(w[bounds[si]:bounds[si + 1]].tolist())
                twap_f[si] = float(exact) / (100.0 * float(dsum[si]))
        keep = dsum > 0
        return pa.table({
            "user_id": pa.array(users[keep], pa.int64()),
            "n_gaps": pa.array(n[keep], pa.int64()),
            "total_dur_s": round6(pa.array(dsum[keep] / 1e6, pa.float64())),
            "twap": round6(pa.array(twap_f[keep], pa.float64())),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))


def event_markov_stationary(sf_dir: str, iters: int = 100) -> "ray.data.Dataset":
    """Stationary distribution of the per-user event-type Markov chain:
    the row-normalized transition matrix from ``event_transitions``,
    power-iterated to its fixpoint — "where does a user's session settle
    long-run", the summary number next-event models and funnel designers
    read off the transition matrix.

    Types with no outgoing transitions (absorbing by data, not by
    design) get a uniform outgoing row — the standard dangling-node fix
    (same as PageRank's), pinned here as the operator contract.  Init is
    uniform; 100 iterations on a #types x #types matrix is driver-side
    math on a vocabulary-bounded object.

    The iteration runs in EXACT integer pico-units (pi starts at 1e12
    per type; each step is sum((pi_i * n_ij) // rowsum_i), dangling rows
    contribute pi_i // k to every type; no per-step renormalization —
    power iteration is scale-invariant and the floor loss is ~1e-10
    relative), so the DuckDB twin replays it verbatim as a chained CTE
    (the part_pagerank pattern) and the final probabilities
    pi_j / sum(pi) round to identical 6dp doubles in both engines.

    Scale shape: all corpus-sized work is event_transitions' ONE coarse
    user shuffle; the matrix itself is #types^2 (bounded) and the power
    iteration never touches row-level data.  Pinned by a hand-computed
    two-state-chain test, a row-sum invariant, and the SQL twin."""
    trans = event_transitions(sf_dir).take_all()   # bounded: #types^2 rows
    # NULL-typed transitions carry no chain semantics — drop them (the
    # event_transitions output itself preserves them for auditing)
    trans = [r for r in trans
             if r["from_type"] is not None and r["to_type"] is not None]
    if not trans:
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "stationary_prob": pa.array([], pa.float64())}))
    from ..functions.num import round6

    types = sorted({r["from_type"] for r in trans}
                   | {r["to_type"] for r in trans})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    n = [[0] * k for _ in range(k)]
    for r in trans:
        n[idx[r["from_type"]]][idx[r["to_type"]]] += int(r["n"])
    rs = [sum(row) for row in n]
    # exact integer pico-unit power iteration (Python bigints; the SQL
    # twin replays the identical floor-division tree)
    pi = [10 ** 12] * k
    for _ in range(iters):
        dsum = sum(pi[i] // k for i in range(k) if rs[i] == 0)
        pi = [dsum + sum((pi[i] * n[i][j]) // rs[i]
                         for i in range(k) if rs[i] > 0 and n[i][j] > 0)
              for j in range(k)]
    total = float(sum(pi))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary_prob": round6(pa.array(
            [p / total for p in pi], pa.float64())),
    }))


def events_burstiness(sf_dir: str) -> "ray.data.Dataset":
    """Per-type burstiness via the Fano factor of hourly arrival counts:
    variance / mean of events-per-hour over the type's OBSERVED hour
    buckets — ~1 for Poisson arrivals, >>1 for bursty types (the
    dispersion diagnostic behind rate-limiter and capacity sizing).

    Exact parity: hourly counts are integers, so (n_buckets, Σc, Σc²)
    are exact int64 sums; mean, ML variance (/n) and fano evaluate the
    same double expression tree in both engines, rounded to 6dp once.
    NULL ts / NULL type rows drop (hour buckets are order-defined).

    Scale shape: per-batch (type, hour, count) partials over the bounded
    type x hour-bucket domain, ONE shuffle, then a #types-sized moment
    rollup — row-level data never moves."""
    from ray.data.aggregate import Sum

    from ..functions.num import round6

    ds = sized_read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("event_type")),
            pc.is_valid(batch.column("ts"))))
        t = pa.table({
            "event_type": batch.column("event_type"),
            "bucket": pc.cast(pc.floor(pc.divide(
                pc.cast(batch.column("ts"), pa.int64()), 3600000000.0)),
                pa.int64()),
        })
        g = t.group_by(["event_type", "bucket"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "bucket", "partial_n"])

    hourly = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .aggregate(Sum("partial_n", alias_name="c")))

    def moments(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy()
        t = pa.table({
            "event_type": batch.column("event_type"),
            "b_p": pa.array(np.ones(len(c), np.int64)),
            "s_p": pa.array(c.astype(np.int64), pa.int64()),
            "ss_p": pa.array((c * c).astype(np.int64), pa.int64()),
        })
        g = t.group_by("event_type").aggregate(
            [("b_p", "sum"), ("s_p", "sum"), ("ss_p", "sum")])
        return g.rename_columns(["event_type", "b_p", "s_p", "ss_p"])

    agg = (hourly.map_batches(moments, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("b_p", alias_name="n_buckets"),
                      Sum("s_p", alias_name="s"),
                      Sum("ss_p", alias_name="ss")))

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("n_buckets").to_numpy().astype(np.float64)
        s = batch.column("s").to_numpy().astype(np.float64)
        ss = batch.column("ss").to_numpy().astype(np.float64)
        mean = s / b
        var = ss / b - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            fano = np.where(mean > 0, var / np.where(mean > 0, mean, 1),
                            np.nan)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_buckets": batch.column("n_buckets").cast(pa.int64()),
            "n_events": batch.column("s").cast(pa.int64()),
            "mean_per_hour": round6(pa.array(mean, pa.float64())),
            "fano": round6(pa.array(np.where(np.isnan(fano), 0.0, fano),
                                    pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def session_survival_curve(sf_dir: str, gap_minutes: int = 30,
                           max_minute: int = 30) -> "ray.data.Dataset":
    """Session-duration survival function S(m) = share of sessions lasting
    at least m whole minutes, for m = 0..``max_minute`` — the engagement
    curve (discrete Kaplan-Meier with no censoring) product teams read
    off the sessionization output.

    Builds ON the ``session_stats`` pipeline (one coarse user shuffle);
    durations floor to whole minutes, clamp into a ``max_minute + 1``
    overflow bucket, and reduce to a bounded histogram whose reverse
    cumulative IS the curve — a #minutes-sized pull, never session rows.
    Empty corpus emits an empty curve (matching the twin's empty cross
    join)."""
    from ray.data.aggregate import Sum

    from ..functions.num import round6

    sess = session_stats(sf_dir, gap_minutes)

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"fl": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        dur = batch.column("duration_us").to_numpy()
        fl = np.minimum(dur // 60000000, max_minute + 1).astype(np.int64)
        t = pa.table({"fl": pa.array(fl, pa.int64())})
        g = t.group_by("fl").aggregate([([], "count_all")])
        return g.rename_columns(["fl", "n_p"])

    rows = (sess.map_batches(hist, batch_format="pyarrow")
            .groupby("fl").aggregate(Sum("n_p", alias_name="n"))
            .take_all())              # bounded: <= max_minute + 2 buckets
    empty = pa.table({"minute": pa.array([], pa.int64()),
                      "n_sessions_ge": pa.array([], pa.int64()),
                      "frac": pa.array([], pa.float64())})
    if not rows:
        return ray.data.from_arrow(empty)
    counts = np.zeros(max_minute + 2, np.int64)
    for r in rows:
        counts[int(r["fl"])] = int(r["n"])
    total = int(counts.sum())
    ge = np.cumsum(counts[::-1])[::-1]     # ge[m] = sessions with fl >= m
    minutes = np.arange(max_minute + 1, dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "minute": pa.array(minutes, pa.int64()),
        "n_sessions_ge": pa.array(ge[:max_minute + 1], pa.int64()),
        "frac": round6(pa.array(ge[:max_minute + 1] / float(total),
                                pa.float64())),
    }))


def events_entropy_rate(sf_dir: str) -> "ray.data.Dataset":
    """Entropy rate of the event-type chain: conditional entropy
    H(next | current) over the transition counts, next to the marginal
    next-type entropy H(next) — the pair that quantifies how much the
    current event type actually predicts the next one (H(next) -
    H(next|current) = the chain's mutual information).  Log base 2.

    Exact parity: counts are integers; each cell's term (n/N) ·
    log2(row_n / n) snaps to a 6dp micro-int before an exact integer
    sum (the chi2_independence convention), so the reduction is
    order-independent in both engines.  NULL-typed transitions drop.

    Scale shape: all corpus-sized work is event_transitions' ONE coarse
    user shuffle; entropy runs on the bounded #types² count table
    (bounded pull)."""
    trans = event_transitions(sf_dir).take_all()   # bounded: #types^2
    trans = [r for r in trans
             if r["from_type"] is not None and r["to_type"] is not None]
    empty = pa.table({"n_transitions": pa.array([0], pa.int64()),
                      "n_types": pa.array([0], pa.int64()),
                      "cond_entropy_bits": pa.array([0.0], pa.float64()),
                      "marginal_entropy_bits": pa.array([0.0],
                                                        pa.float64())})
    if not trans:
        return ray.data.from_arrow(empty)
    total = float(sum(r["n"] for r in trans))
    row_n = {}
    col_n = {}
    for r in trans:
        row_n[r["from_type"]] = row_n.get(r["from_type"], 0) + r["n"]
        col_n[r["to_type"]] = col_n.get(r["to_type"], 0) + r["n"]
    cond_micro = 0
    for r in trans:
        n = float(r["n"])
        term = (n / total) * np.log2(float(row_n[r["from_type"]]) / n)
        cond_micro += int(np.floor(term * 1000000.0 + 0.5))
    marg_micro = 0
    for t in col_n:
        n = float(col_n[t])
        term = (n / total) * np.log2(total / n)
        marg_micro += int(np.floor(term * 1000000.0 + 0.5))
    types = sorted(set(row_n) | set(col_n))
    return ray.data.from_arrow(pa.table({
        "n_transitions": pa.array([int(total)], pa.int64()),
        "n_types": pa.array([len(types)], pa.int64()),
        "cond_entropy_bits": pa.array([cond_micro / 1000000.0],
                                      pa.float64()),
        "marginal_entropy_bits": pa.array([marg_micro / 1000000.0],
                                          pa.float64()),
    }))


def user_intersession_gaps(sf_dir: str,
                           gap_minutes: int = 30) -> "ray.data.Dataset":
    """Per-user session cadence: gaps between consecutive SESSIONS (this
    session's end → next session's start), as exact integer aggregates —
    the return-frequency feature behind churn models that per-event
    gaps (``inter_event_gaps``) and within-session stats miss.

    Builds on the ``session_stats`` pipeline (one coarse user shuffle);
    consecutive-session pairing is a per-batch numpy shift AFTER a
    per-user re-sort of the session rows — sessions of one user always
    land in one bucket, so the pairing is bucket-local.  Users with a
    single session emit nothing.  Exact microsecond integer sums; means
    round once.

    SQL twin: the session islands CTE + lag(session_end) over the
    per-user session order."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _GOLDEN, _default_num_coarse
    from ..functions.num import round6

    nc = _default_num_coarse()
    sess = session_stats(sf_dir, gap_minutes)

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_gaps": pa.array([], pa.int64()),
                      "mean_gap_s": pa.array([], pa.float64()),
                      "max_gap_s": pa.array([], pa.float64())})

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "__coarse", pa.array((uid * _GOLDEN) % nc, pa.int64()))

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("session_idx", "ascending")]))
        uid = g.column("user_id").to_numpy()
        start = g.column("session_start").cast(pa.int64()).to_numpy()
        end = g.column("session_end").cast(pa.int64()).to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        gap = (start[1:] - end[:-1])[same]
        gu = uid[1:][same]
        starts = np.flatnonzero(np.r_[True, gu[1:] != gu[:-1]])
        users = gu[starts]
        n = np.diff(np.r_[starts, len(gu)]).astype(np.int64)
        gsum = np.add.reduceat(gap, starts)
        gmax = np.maximum.reduceat(gap, starts)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_gaps": pa.array(n, pa.int64()),
            "mean_gap_s": round6(pa.array(
                gsum.astype(np.float64) / (n * 1e6), pa.float64())),
            "max_gap_s": round6(pa.array(gmax / 1e6, pa.float64())),
        })

    return (sess.map_batches(tag, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))
