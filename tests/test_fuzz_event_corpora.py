"""Deterministic fuzz of the event-stream query twins.

Seeded generators build event tables full of the shapes that break
window/as-of logic — duplicated timestamps (coarse clock), events exactly
on window boundaries, unordered arrival, single-event users, values on
cent boundaries — and every SQL-twinned event query must hash-match its
DuckDB oracle.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

QUERIES = [
    "sessionize", "event_funnel", "user_retention", "events_hourly",
    "events_sliding_window", "value_percentiles_by_type",
    "purchase_prev_click_asof", "top_events_per_user",
    "user_running_totals", "events_value_bands", "distinct_users_by_type",
    "value_zscore_outliers", "value_mad_outliers", "ks_value_drift",
    "value_cusum_changepoint", "late_event_report",
    "user_churn_labels",
    "user_activity_cv",
    "first_purchase_latency", "events_pareto_share", "events_daily_pivot", "top_users",
    "users_active_both_halves", "users_only_first_half",
    "events_locf_grid", "user_growth_curve", "events_type_overlap",
    "top_session_paths", "rolling_active_users", "events_seasonality", "event_type_drift",
    "distinct_event_types",
    "engaged_users_union", "hll_distinct_by_type", "user_first_last",
    "session_stats", "event_transitions", "event_order_audit",
    "user_cohort_values", "user_event_sequences", "inter_event_gaps",
    # round-5 expansion: every remaining events-only twin
    "cms_user_counts", "ddsketch_quantiles_by_type",
    "ddsketch_value_quantiles", "decayed_user_value",
    "event_cooccurrence_pairs", "event_markov_stationary",
    "event_trigrams", "events_anomalous_hours", "events_autocorrelation",
    "events_burstiness", "events_debounce_report", "events_entropy_rate",
    "events_interpolate_grid", "events_scd2_intervals",
    "heavy_hitter_users", "hll_distinct_users", "props_value_stats",
    "rolling_median_value", "session_survival_curve", "table_profile",
    "user_bursts", "user_event_entropy", "user_intersession_gaps",
    "user_modal_event", "user_value_median", "user_value_twap",
    "value_benford_deviation", "value_hour_mahalanobis",
    "value_psi_by_type", "value_trimmed_stats",
]
TYPES = ["click", "view", "purchase", "signup", "error"]


def _make_events(tmpdir: str, seed: int) -> str:
    d = os.path.join(tmpdir, f"efuzz{seed}")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    n, n_users = 600, 17
    base = 1_704_067_200_000_000          # 2024-01-01T00:00:00 in us
    # coarse 15-minute clock -> MANY exact-duplicate timestamps, with
    # events landing exactly on hour / window boundaries
    ts = base + rng.randint(0, 30 * 96, size=n) * 900_000_000
    order = rng.permutation(n)            # unordered arrival
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)[order]),
        "ts": pa.array(ts[order], pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, size=n)[order],
                            pa.int64()),
        "event_type": pa.array(
            [TYPES[i] for i in rng.randint(0, len(TYPES), size=n)[order]],
            pa.string()),
        # cent-boundary values (k/100 doubles) plus a few exact zeros
        "value": pa.array(
            np.where(rng.rand(n) < 0.05, 0.0,
                     rng.randint(0, 50_000, size=n) / 100.0)[order],
            pa.float64()),
        "props": pa.array(['{"k":1}'] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
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


@pytest.mark.parametrize("seed", [5, 41])
@pytest.mark.parametrize("name", QUERIES)
def test_fuzz_events_match_oracle(ray_session, tmp_path, seed, name):
    import ray.data
    sf = _make_events(str(tmp_path), seed)
    res = entrymod.queries()[name](sf)
    if isinstance(res, (ray.data.Dataset, pa.Table)):
        if isinstance(res, ray.data.Dataset):
            schema = res.schema()
            res = res.to_pandas()
            if len(res) == 0 and len(res.columns) == 0 \
                    and schema is not None and schema.names:
                # Ray drops columns from an empty Dataset's to_pandas
                res = pa.schema(list(zip(schema.names, schema.types))) \
                    .empty_table().to_pandas()
        else:
            res = res.to_pandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:                        # sketch queries: run-only
        assert len(pd.DataFrame(res).columns) > 0
        return
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    oracle = con.execute(sql).df()
    a, b = _canon(pd.DataFrame(res)), _canon(oracle)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  obj=f"{name} seed={seed}")
