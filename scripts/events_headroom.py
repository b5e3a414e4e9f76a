#!/usr/bin/env python
"""Scale-headroom evidence for the event-stream suite (BASELINE.md): run
the per-user operators over a 2,000,000-event / 30,000-user table (20x
the sf0.1 events table in rows and users) and report wall times, planted
invariants, and driver peak RSS (must stay flat).

Planted structure (user 0): exactly 5 sessions of 4 events each, gaps of
2 hours between sessions and 1 minute inside them, first event 'signup',
last event 'purchase'.  All other events are random within a 30-day
range.  Expectations:

* session_stats: user 0 has exactly 5 sessions, 4 events each, ordinals
  1..5; the corpus-wide sum of n_events equals the event count;
* sessionize: its (n_sessions, n_events) per user equals the rollup of
  session_stats — the two operators cannot drift;
* user_first_last: user 0's first_type == 'signup', last_type ==
  'purchase', n_events == 20.

This script OWNS its Ray session; the library never calls ray.init.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_EVENTS = 2_000_000
N_USERS = 30_000
OUT = "/tmp/pek_events2m"
BASE_US = 1_704_067_200_000_000          # 2024-01-01T00:00:00 in us
TYPES = ["click", "view", "purchase", "signup", "error"]


def generate(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(23)
    n_rand = N_EVENTS - 20
    ts = BASE_US + rng.integers(0, 30 * 86_400_000_000, n_rand)
    user = rng.integers(1, N_USERS, n_rand)          # user 0 reserved
    etype = rng.integers(0, len(TYPES), n_rand)
    value = rng.integers(0, 50_000, n_rand) / 100.0

    # user 0: 5 sessions x 4 events, 2h between sessions, 1min inside;
    # each session runs signup -> click -> view -> purchase
    p_ts, p_type = [], []
    t = BASE_US
    for _s in range(5):
        for k, ty in enumerate(["signup", "click", "view", "purchase"]):
            p_ts.append(t + k * 60_000_000)
            p_type.append(ty)
        t += 2 * 3_600_000_000

    all_ts = np.concatenate([ts, np.array(p_ts, np.int64)])
    all_user = np.concatenate([user, np.zeros(20, np.int64)])
    all_type = np.array([TYPES[i] for i in etype] + p_type)
    all_value = np.concatenate([value, np.ones(20)])
    order = rng.permutation(N_EVENTS)                # unordered arrival
    t = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
        "ts": pa.array(all_ts[order].view("datetime64[us]")),
        "user_id": pa.array(all_user[order], pa.int64()),
        "event_type": pa.array(all_type[order], pa.string()),
        "value": pa.array(all_value[order], pa.float64()),
        "props": pa.array(['{"k":1}'] * N_EVENTS, pa.string()),
    })
    pq.write_table(t, path)


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(OUT)
    gen_s = round(time.time() - t0, 1)

    from pdf_extract_kit_ray.pipelines import streaming

    res: dict = {"events": N_EVENTS, "users": N_USERS,
                 "generate_sec": gen_s}

    t0 = time.time()
    ss = streaming.session_stats(OUT).to_pandas()
    res["session_stats_sec"] = round(time.time() - t0, 1)
    res["sessions"] = len(ss)
    u0 = ss[ss.user_id == 0].sort_values("session_idx")
    res["u0_sessions"] = len(u0)
    res["u0_ok"] = bool(len(u0) == 5
                        and (u0.n_events == 4).all()
                        and list(u0.session_idx) == [1, 2, 3, 4, 5])
    res["n_events_total_ok"] = bool(int(ss.n_events.sum()) == N_EVENTS)

    t0 = time.time()
    sz = streaming.sessionize(OUT).to_pandas()
    res["sessionize_sec"] = round(time.time() - t0, 1)
    roll = ss.groupby("user_id").agg(
        n_sessions=("session_idx", "max"),
        n_events=("n_events", "sum")).reset_index()
    merged = roll.merge(sz, on="user_id", suffixes=("_ss", "_sz"))
    res["sessionize_consistent"] = bool(
        len(merged) == len(roll) == len(sz)
        and (merged.n_sessions_ss == merged.n_sessions_sz).all()
        and (merged.n_events_ss == merged.n_events_sz).all())

    t0 = time.time()
    fl = streaming.user_first_last(OUT).to_pandas()
    res["user_first_last_sec"] = round(time.time() - t0, 1)
    r0 = fl[fl.user_id == 0].iloc[0]
    res["u0_first_last_ok"] = bool(r0.first_type == "signup"
                                   and r0.last_type == "purchase"
                                   and r0.n_events == 20)

    t0 = time.time()
    streaming.user_event_entropy(OUT).to_pandas()
    res["user_event_entropy_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    seq = streaming.user_event_sequences(OUT).to_pandas()
    res["user_event_sequences_sec"] = round(time.time() - t0, 1)
    s0 = seq[seq.user_id == 0].iloc[0]
    res["u0_sequence_ok"] = bool(
        s0.n_events == 20
        and s0.seq == ">".join(["signup>click>view>purchase"] * 5))
    res["sequence_events_total_ok"] = bool(
        int(seq.n_events.sum()) == N_EVENTS)

    t0 = time.time()
    gaps = streaming.inter_event_gaps(OUT).to_pandas()
    res["inter_event_gaps_sec"] = round(time.time() - t0, 1)
    # every user contributes (its event count - 1) gaps: total gaps must
    # equal events minus distinct users (user_first_last's row count)
    res["gap_count_ok"] = bool(
        int(gaps.n_gaps.sum()) == N_EVENTS - len(fl))

    t0 = time.time()
    paths = streaming.top_session_paths(OUT).to_pandas()
    res["top_session_paths_sec"] = round(time.time() - t0, 1)
    res["paths_rows"] = len(paths)
    res["paths_ok"] = bool(
        len(paths) == 20
        and paths.n_sessions.is_monotonic_decreasing
        and int(paths.n_sessions.sum()) <= len(ss))

    t0 = time.time()
    ug = streaming.user_growth_curve(OUT).to_pandas()
    res["user_growth_curve_sec"] = round(time.time() - t0, 1)
    res["growth_total_ok"] = bool(int(ug.new_users.sum()) == len(fl)
                                  and int(ug.cum_users.iloc[-1]) == len(fl))

    t0 = time.time()
    ov = streaming.events_type_overlap(OUT).to_pandas()
    res["events_type_overlap_sec"] = round(time.time() - t0, 1)
    # diagonal of the overlap matrix == the EXACT distinct users per type
    # (cross-checked against the exact operator, not an assumption)
    diag = ov[ov.type_a == ov.type_b].set_index("type_a")["n_users"]
    exact = streaming.distinct_users_by_type(OUT).to_pandas() \
        .set_index("event_type")["distinct_users"]
    res["overlap_diag_ok"] = bool(
        len(diag) == len(exact)
        and (diag.sort_index() == exact.sort_index()).all())

    t0 = time.time()
    lg = streaming.events_locf_grid(
        OUT, start="2024-01-01", end="2024-01-31").to_pandas()
    res["events_locf_grid_sec"] = round(time.time() - t0, 1)
    res["locf_rows"] = len(lg)

    # --- session-12 operators over the same 2M-event table ---
    t0 = time.time()
    scd = streaming.events_scd2_intervals(OUT).to_pandas()
    res["scd2_sec"] = round(time.time() - t0, 1)
    res["scd2_events_total_ok"] = bool(
        int(scd.n_events.sum()) == N_EVENTS)
    # user 0's types alternate every event -> 20 one-event runs, and the
    # last run per user is the only open one
    s0 = scd[scd.user_id == 0]
    res["scd2_u0_ok"] = bool(len(s0) == 20 and (s0.n_events == 1).all()
                             and int(s0.valid_to.isna().sum()) == 1)

    t0 = time.time()
    tw = streaming.user_value_twap(OUT).to_pandas()
    res["twap_sec"] = round(time.time() - t0, 1)
    # user 0's values are all 1.0 -> LOCF average is exactly 1.0
    res["twap_u0_ok"] = bool(
        abs(float(tw[tw.user_id == 0].iloc[0].twap) - 1.0) < 1e-9)

    t0 = time.time()
    ig = streaming.user_intersession_gaps(OUT).to_pandas()
    res["intersession_sec"] = round(time.time() - t0, 1)
    # user 0: sessions start 2 h apart and span 3 min -> 4 gaps of 7020 s
    g0 = ig[ig.user_id == 0].iloc[0]
    res["intersession_u0_ok"] = bool(g0.n_gaps == 4
                                     and abs(g0.mean_gap_s - 7020.0) < 1e-6
                                     and abs(g0.max_gap_s - 7020.0) < 1e-6)

    t0 = time.time()
    bu = streaming.events_burstiness(OUT).to_pandas()
    res["burstiness_sec"] = round(time.time() - t0, 1)
    res["burstiness_ok"] = bool(len(bu) == len(TYPES)
                                and int(bu.n_events.sum()) == N_EVENTS
                                and (bu.fano >= 0).all())

    t0 = time.time()
    er = streaming.events_entropy_rate(OUT).to_pandas().iloc[0]
    res["entropy_rate_sec"] = round(time.time() - t0, 1)
    import numpy as _np
    res["entropy_rate_ok"] = bool(
        0.0 <= er.cond_entropy_bits <= er.marginal_entropy_bits
        <= _np.log2(len(TYPES)) + 1e-9)

    t0 = time.time()
    sv = streaming.session_survival_curve(OUT).to_pandas()
    res["survival_sec"] = round(time.time() - t0, 1)
    res["survival_ok"] = bool(
        abs(float(sv.frac.iloc[0]) - 1.0) < 1e-9
        and sv.n_sessions_ge.is_monotonic_decreasing
        and int(sv.n_sessions_ge.iloc[0]) == len(ss))

    res["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
