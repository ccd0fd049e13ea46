"""Query registry — the engine's declared operator-coverage corpus.

Every operator row in SURVEY.md §2 is realized as a named query over the
driver fixture tables, with (where SQL-expressible) an equivalent ANSI-SQL
oracle string that DuckDB runs on the same parquet files. The verification
driver hash-compares the two result sets (row count + schema + order-
insensitive value hash), so:

- every computed column is aliased identically in the Spark code and SQL;
- double-typed aggregates are rounded identically on both sides (partial
  aggregation order differs between engines at the last ulp) — and the
  rounding grid is magnitude-aware: accumulation error ≈ sqrt(n)·ulp(total),
  so the grid spacing must dominate it (a ~4e9 sum of 600k 2-decimal values
  carries ~4e-4 reorder error — round-4's 5e-5 boundary distance is NOT
  safe there; round at the inputs' exact decimal width instead);
- results involving ``events.ts`` (nanosecond parquet) expose epoch-millis
  bigints or bucket boundaries rather than raw nanosecond timestamps, since
  Spark truncates to microseconds while DuckDB keeps nanos.

Registration is decorator-based; submodules group the corpus by SURVEY §2
section.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL; None → rows-only check
    headline: bool  # included in bench.py's timed suite


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}


# Populate the registry (import order defines initial order; the driver
# window below defines the final order).
from polygon_algotrading_env_spark.queries import (  # noqa: E402,F401
    relational,
    aggregates,
    joins,
    windows,
    timeseries,
    text,
    vectors,
    extended,
    sessions,
    reshape,
    suites,
    advanced,
    retrieval,
    decision,
    mleval,
)

# ---------------------------------------------------------------------------
# Driver correctness window.
#
# The verification driver records results for the FIRST 50 registered
# queries only, so registration order is part of the engine's verification
# contract. The window below is curated so that every SURVEY §2 operator
# family and every LLM-pipeline capability is certified by at least one
# ORACLE-BEARING query inside it (composite "suite" queries consolidate
# single-table scalar variants to make room). Everything else follows in
# stable order — oracle-bearing queries first, rows-only checks last.
# Round-5 rotation (per r4 VERDICT): ten slots whose families are anchored
# by recorded prior certification (CORRECTNESS_r0{1..4}.json — six
# multi-round greens plus the four r3 flagships certified in r04) rotate
# to the post-window tail, making room for the round-4 flagships: the
# microstructure pack, the bigram LM, the cluster-aware split, the
# multi-grain GROUPING SETS ladder, and four TPC-H decision shapes
# (Q3/Q6/Q8/Q20) that have only local oracle runs so far.
# Round-6 rotation (per r5 VERDICT item 2): the nine round-5 flagships —
# certified locally at three scales but never driver-certified — enter in
# exchange for nine slots whose families hold FIVE recorded green rounds
# each (r1-r5): filter_mktsegment, pricing_summary,
# count_distinct_parts_per_flag, join_lineitem_part_broadcast,
# star_join_revenue_by_region, rownum_recent_orders_per_customer,
# moving_avg_price_per_supplier, dedup_docs_by_text, near_dup_clusters.
# All nine move to PRIOR_DRIVER_CERTIFIED; no family loses its anchor.
# Round-7 rotation (per r6 VERDICT item 1): the round-6 SRP ANN tier
# (srp_bucket_assignments, srp_topk_reranked — the first hash-matched ANN
# rows) plus three never-certified oracle-bearing headliners (vwap_5m,
# doc_quality_features, view_click_purchase_funnel) enter. Out: the three
# mid-r4 flagships green r4-r6 (sole_blame_suppliers, heavy_hitter_parts,
# mixture_resample_by_lang) and two of the TPC-H quartet (Q3
# pending_order_revenue_topk, Q6 discount_band_revenue — top-k ordering
# and filtered-agg families are anchored by many other greens; Q8/Q20 keep
# the complex join shapes in-window one more round).
# Round-8 rotation (per r7 VERDICT item 1): the PageRank family — the
# first iterative-float plans to earn recursive-CTE DuckDB oracles
# (pagerank_copurchase_top20, ppr_related_parts, queries/advanced.py) —
# enters alongside three never-driver-certified oracle-bearing queries
# from uncertified-so-far families: full_outer_daily_activity (FULL OUTER
# join), theil_sen_trend_daily (robust median-slope regression),
# weekly_cohort_retention (cohort retention matrix). Out: the remaining
# TPC-H pair Q8/Q20 (green r5-r7) and return_correlation_pairs (r4-r7),
# vpin_volume_buckets + pairs_spread_zscore (r5-r7) — every exiting
# family holds >=3 recorded green rounds and moves to
# PRIOR_DRIVER_CERTIFIED.
DRIVER_WINDOW: tuple[str, ...] = (
    # Round-16 rotation (per r15 VERDICT item 1): TWENTY-TWO slots
    # retire to PRIOR_DRIVER_CERTIFIED — the twenty-one round-14
    # entrants that now hold 2 recorded green rounds each
    # (CORRECTNESS_r14 + CORRECTNESS_r15) plus entity_resolution_parts,
    # whose deliberate r15 re-entry certified the rewritten label loop
    # (4 greens on record). In exchange, twenty-two names enter — the
    # r15-rewrite certification cohort first (the r15 VERDICT's
    # certification-debt list): the four plan-rewrite re-entries /
    # first-certifications (kmeans, dsir, pmi, textrank), the three
    # graph-loop consumers covering bellman_ford / bfs / CC
    # (cheapest_supply_paths, bfs_hops_part_supplier,
    # semantic_dedup_survivors), and the FIVE iterative paths rewritten
    # THIS round (lpa, pagerank, ppr, kcore, train_test_contamination —
    # their r16 plan rewrites are certified by these slots); then ten
    # never-driver-certified oracle-bearing sketch-tier registrations.
    # All pre-verified by the dtype-faithful tools/oracle_check.py at
    # sf0.001/0.01/0.1 on the post-rewrite plans.
    #
    # --- round-16 entrants -------------------------------------------
    # (a) r15 plan-rewrite re-entries / first certifications
    "kmeans_clusters_embeddings",
    "dsir_weights_for_target",
    "pmi_collocations_topk",
    "textrank_keywords_top20",
    # (b) graph-loop consumers (r15 directed-edge-pin rewrite)
    "cheapest_supply_paths",
    "bfs_hops_part_supplier",
    "semantic_dedup_survivors",
    # (c) iterative paths rewritten in r16 (certify the new plans)
    "lpa_communities_copurchase",
    "pagerank_copurchase_top20",
    "ppr_related_parts",
    "kcore80_copurchase_parts",
    "train_test_contamination",
    # (d) sketch-tier first certifications (r15 registrations)
    "cms_partkey_freq_topk",
    "cms_merged_halves_freq",
    "cms_token_freq_topk",
    "apriori_frequent_pairs",
    "brier_decomposition_urgent",
    "haar_energy_5m",
    "ams_f2_partkey",
    "ams_merged_halves_f2",
    "cms_join_size_events_orders",
    "qdigest_relative_quantiles_price",
    # --- holdovers: the round-15 entrants (one green each,
    # CORRECTNESS_r15 — they accrue their second round before retiring)
    # plus the three re-certified oracle-typing casualties
    # (swing_points_5m, candle_pattern_census, stale_tick_fraction —
    # one green each, r15).
    # Round-15 rotation (per r14 VERDICT items 1-3): TWENTY-SIX slots
    # retire to PRIOR_DRIVER_CERTIFIED — the twenty-five round-13
    # entrants that now hold 2 recorded green rounds each
    # (ecdf_drift_by_type ... semantic_dedup_survivors,
    # CORRECTNESS_r13 + CORRECTNESS_r14) plus dsir_weights_for_target,
    # whose r14 re-entry certified the stage-reuse plan rewrite
    # (greens r4-r10 era + r14). In exchange, twenty-six names enter:
    # the queued r14 registration (q-digest), ONE plan-rewrite
    # re-entry (entity_resolution_parts — its label loop gained
    # checkpoint_every 3->2 in r14 and the early_exit default-OFF in
    # r15; the slot certifies the new physical plan), the FIVE latent
    # HUGEINT-sum oracle carriers whose oracles gained CAST(... AS
    # BIGINT) this round (r14 verdict What's-wrong-2 — entering now so
    # they can never burn a future slot), and nineteen
    # never-driver-certified oracle-bearing names from the tier list.
    # All pre-verified by the now DTYPE-FAITHFUL tools/oracle_check.py
    # (kind-level dtype gate added this round) at sf0.001/0.01/0.1.
    #
    # --- round-15 entrants -------------------------------------------
    # (a) queued r14 registration (entity_resolution_parts, the other
    #     r15 (a)-entrant, retired at the r16 rotation: its re-entry
    #     purpose — certifying the rewritten label loop — completed
    #     with the r15 green, its 4th on record)
    "qdigest_quantiles_price",
    # (b) the five latent HUGEINT-sum carriers, oracles fixed r15
    "market_breadth_5m",
    "overnight_gap_fill_rates",
    "hapax_ratio_by_source",
    "returnflag_priority_counts",
    "single_source_parts_by_brand",
    # (c) SQL-surface remainder
    "intersect_all_parts",
    "except_all_parts",
    "null_handling",
    "from_json_struct",
    "collect_set_priorities",
    "date_arithmetic",
    # (d) time-series / market remainder
    "corwin_schultz_spread_daily",
    "cross_sectional_momentum",
    "mtf_trend_filter_5m",
    "volume_profile_poc",
    "updown_streak_stats",
    "v_reversal_patterns",
    "overnight_intraday_returns",
    "sliding_bars_10m_5m",
    "interpolated_bars_30m",
    # (e) text / corpus remainder
    "source_vocab_overlap",
    "token_burstiness_topk",
    "top_terms_per_doc",
    "ngram_containment_adjacent",
    # --- holdovers (below): the 25 round-14 entrants — 22 hold one
    # recorded green each (CORRECTNESS_r14.json) and accrue their
    # second round before retiring; swing_points_5m,
    # candle_pattern_census and stale_tick_fraction hold NO green (the
    # r14 oracle-typing casualties: rows/schema matched, the driver's
    # representation hash failed on uncast HUGEINT sums) — their
    # oracles gained CAST(... AS BIGINT) this round and the same slots
    # now certify the fix.
    # --- round-14 entrants still in-window: the three oracle-typing
    # casualties whose slots re-certified the CAST fix in r15 (their
    # only green on record) — they accrue a second green before
    # retiring; the other twenty-one round-14 entrants (2 greens each,
    # r14+r15) retired at the r16 rotation above.
    "swing_points_5m",
    "candle_pattern_census",
    "stale_tick_fraction",
)

# Round-16 rotation candidates — never-driver-certified oracle-bearing
# names remain (all hash-matched by the dtype-faithful
# tools/oracle_check.py locally). Natural next cohorts, tier by tier:
# (a) the round-15 registrations (register-with-oracle-then-certify):
#     cms_partkey_freq_topk (+ its merge-path twin
#     cms_merged_halves_freq), cms_token_freq_topk,
#     apriori_frequent_pairs, brier_decomposition_urgent,
#     pacf_returns_lags, and the late-r15 seven — haar_energy_5m
#     (integer-exact wavelet energy by scale), ams_f2_partkey +
#     ams_merged_halves_f2 (AMS F2 tug-of-war, the linear sketch
#     wing), cms_join_size_events_orders (CMS inner-product
#     join-size), qdigest_relative_quantiles_price (log-domain
#     value-relative quantiles), pmi_collocations_topk,
#     textrank_keywords_top20 — all verified at 3 SFs, all queued;
# (b) market/time-series remainder: lead_lag_xcorr_pair,
#     lead_lag_best_correlation, rank_ic_momentum_5m,
#     momentum_rank_stability, post_shock_drift_5bar,
#     return_dispersion_5m, am_pm_return_corr, weekday_effect_tstat,
#     interarrival_cv, benford_price_digits, price_histogram_20bins,
#     max_underwater_duration,
#     volume_concentration_hhi, naive_forecast_eval,
#     almgren_chriss_schedule, cross-sectional/decision remainder
#     (order_price_deciles, decile_lift_urgent_orders, ...);
# (c) embedding/vector remainder: embedding_norms,
#     embedding_gram_matrix, embedding_outliers_per_label,
#     explode_embedding_head, lang_label_confusion;
# (d) dedup/linkage remainder: levenshtein_adjacent_parts,
#     dup_cluster_size_histogram, minhash_md5_signatures,
#     part_pair_lift_topk.
# Rotate against slots whose names hold >=2 recorded green rounds
# (after the r15 driver run: the 22 round-14 holdovers each hold 2;
# the 3 re-certified oracle-typing casualties hold 1 and stay).

# Queries that HAVE been driver-certified (hash-matched in a recorded
# CORRECTNESS_r0N.json) in one or more prior rounds and have since rotated
# out of the 50-slot window. Family-coverage checks accept these as
# anchored: their green rows are on record even though they no longer
# occupy a slot.
PRIOR_DRIVER_CERTIFIED: frozenset[str] = frozenset(
    {
        # rotated out in round 16 (the twenty-one round-14 entrants,
        # each green r14+r15, plus entity_resolution_parts, whose
        # deliberate r15 re-entry certified the rewritten label loop —
        # greens r11-era + r15, 4 on record)
        "entity_resolution_parts",
        "intraday_volume_profile",
        "event_study_volume_spikes",
        "kyle_lambda_by_type",
        "trade_size_tail_index",
        "local_supplier_volume_asia",
        "product_profit_by_nation_year",
        "yoy_revenue_growth_by_nation",
        "nation_pair_volume_by_year",
        "top_revenue_supplier_quarter",
        "rfm_user_segments",
        "event_transition_matrix",
        "kaplan_meier_fulfillment",
        "cohort_revenue_curve",
        "ab_test_conversion_ztest",
        "quality_cap_per_source",
        "stratified_sample_by_lang",
        "curriculum_stages_by_length",
        "novelty_by_first_occurrence",
        "vocab_coverage_top64",
        "except_order_slices",
        "intersect_order_slices",
        # (ten prior-certified names re-entered the round-16 window to
        #  certify plan rewrites — kmeans_clusters_embeddings,
        #  dsir_weights_for_target, cheapest_supply_paths,
        #  bfs_hops_part_supplier, semantic_dedup_survivors,
        #  lpa_communities_copurchase, pagerank_copurchase_top20,
        #  ppr_related_parts, kcore80_copurchase_parts,
        #  train_test_contamination — and are not listed here while
        #  they hold slots; the derived-ledger law subtracts the window)
        # rotated out in round 15 (the twenty-five round-13 entrants,
        # each green r13+r14 — CORRECTNESS_r13.json + CORRECTNESS_r14
        # — plus dsir_weights_for_target, whose deliberate r14
        # re-entry certified the stage-reuse plan rewrite)
        "ecdf_drift_by_type",
        "ecdf_drift_first_n_by_type",
        "adjusted_candles_firstday_5m",
        "risk_adjusted_metrics_5m",
        "inverse_vol_portfolio",
        "ulcer_index_5m",
        "max_drawdown_duration_5m",
        "beta_vs_market_5m",
        "cube_flag_status",
        "grouping_sets_flag_status",
        "pipe_syntax_priority_revenue",
        "sql_udf_discounted_pricing",
        "engle_granger_pair",
        "seasonal_decompose_hourly",
        "range_vol_estimators_daily",
        "frac_diff_close_5m",
        "dollar_bars_events",
        "gap_filled_bars_30m",
        "hashed_tfidf_features",
        "char_entropy_docs",
        "zipf_fit_tokens",
        "kl_divergence_by_source",
        "lsh_ann_topk",
        "ivf_ann_topk",
        # rotated out in round 14 (the twenty-four round-12 entrants,
        # each green r12+r13 — CORRECTNESS_r12.json + CORRECTNESS_r13.json
        # — plus minhash_md5_band_pairs, whose deliberate r13 re-entry
        # certified the rebalanced signature plan: greens r11 + r13)
        "bollinger_20_5m",
        "atr_14_5m",
        "donchian_20_5m",
        "stochastic_14_3_5m",
        "obv_5m",
        "variance_ratio_4x_5m",
        "realized_vol_12bar_5m",
        "rolling_zscore_anomalies_5m",
        "mcleod_li_squared_returns_5m",
        "roll_spread_estimator",
        "amihud_illiquidity_daily",
        "kyle_lambda_5m",
        "corwin_schultz_spread",
        "tick_rule_ofi",
        "vwap_slippage_by_symbol",
        "var_es_daily",
        "deflated_sharpe_zscore",
        "quality_filter_docs",
        "redact_pii_docs",
        "balanced_downsample_per_lang",
        "gopher_repetition_filters",
        "boilerplate_ngrams",
        "minhash_md5_band_pairs",
        # rotated out in round 13 (the twenty-six round-11 entrants,
        # each green r11+r12 — CORRECTNESS_r11.json + CORRECTNESS_r12.json)
        "mann_whitney_u_price_urgency",
        "kruskal_wallis_price_by_priority",
        "kendall_tau_qty_discount",
        "theil_index_by_priority",
        "atkinson_index_by_priority",
        "herfindahl_brand_suppliers",
        "hill_tail_index_by_priority",
        "jarque_bera_returns_5m",
        "brown_forsythe_price_by_status",
        "runs_test_returns_5m",
        "ljung_box_returns_5m",
        "cusum_changepoint_by_type",
        "cusum_alarms_5m",
        "acf_by_type",
        "acf_returns_lags",
        "asof_chunked_order_before_event",
        "phrase_search_docs",
        "chunk_docs_overlap",
        "hashed_token_features_docs",
        "source_token_cosine_pairs",
        "quality_percentile_by_lang",
        "ngram_jaccard_adjacent",
        "attribution_touch_points",
        "l_diversity_release_audit",
        "grid_backtest_sma_pairs_5m",
        # rotated out in round 12 (the twenty-two round-10 entrants,
        # green r10+r11, plus macd/kalman whose closed-form plan
        # rewrites were certified by deliberate holds, green r9-r11)
        "gini_order_value_by_priority",
        "woe_iv_price_urgency",
        "stratified_kfold_assignments",
        "bloom_join_prefilter_audit",
        "self_bleu_adjacent_docs",
        "ewma_vol_5m",
        "conformal_naive_intervals",
        "reservoir_sample_docs",
        "pinball_loss_q90_naive",
        "retrieval_label_eval_top10",
        "fairness_gaps_by_segment",
        "chi_square_brand_type",
        "mutual_info_lang_source",
        "cohens_kappa_doc_raters",
        "minhash_recall_report",
        "ngram_jaccard_near_dup",
        "embedding_near_dup_srp",
        "adamic_adar_part_links",
        "ks_temporal_drift_by_type",
        "rrf_hybrid_retrieval",
        "dp_noisy_segment_counts",
        "macd_12_26_9_5m",
        "kalman_level_5m",
        # restored in round 12 (r11 VERDICT "What's missing" §2): early-
        # round greens that were on record in CORRECTNESS_r0{1,2,8,9}
        # but never copied into this hand-curated set when their slots
        # rotated. The set is now DERIVED-CHECKED: tests/test_registry.py
        # recomputes union(green) - DRIVER_WINDOW from the committed
        # CORRECTNESS_r*.json files and pins frozenset equality.
        "case_when_status",
        "price_arithmetic",
        "scalar_string_funcs",
        "scalar_datetime_funcs",
        "limit_sorted_lineitem",
        "top5_orders_per_priority",
        "lang_id_docs",
        "token_count_docs",
        "equity_curve_5m",
        "trades_from_crossover_5m",
        "strategy_summary_5m",
        "asof_next_event_after_order",
        "cumulative_factor_per_supplier",
        "first_nth_value_per_customer",
        # rotated out in round 11 (each green 2-8 recorded rounds; the
        # twenty-six-slot rotation entering the round-10 analytics tier
        # plus the remaining never-certified retrieval/time-series/graph/
        # privacy/backtest candidates)
        "doc_fingerprints",
        "simhash_docs",
        "minhash_near_dup_pairs",
        "ema_20_per_event_type",
        # (minhash_md5_band_pairs re-entered the round-13 window to
        #  certify its rebalanced signature plan; it retired again at
        #  the r14 rotation and is listed in the round-14 block above)
        "winnow_md5_overlap_pairs",
        "simhash_md5_signatures",
        "auc_urgent_price_by_status",
        "spearman_qty_price_by_flag",
        "confusion_f1_price_median",
        "k_anonymous_customer_release",
        "hits_part_supplier_top10",
        "pq_ann_topk",
        "bootstrap_sharpe_ci",
        "hurst_exponent_by_type",
        "full_outer_daily_activity",
        "theil_sen_trend_daily",
        "weekly_cohort_retention",
        # (entity_resolution_parts re-entered the round-15 window to
        #  certify its rewritten label loop — checkpoint_every 3->2
        #  plus early_exit default-OFF — and is not listed here while
        #  it holds a slot; the derived-ledger law subtracts the
        #  window)
        # rotated out in round 10 (each green 3-9 recorded rounds; the
        # twenty-four-slot rotation entering the round-9 additions and
        # the remaining never-certified ML-eval/graph/privacy tiers)
        "map_and_timezone_suite",
        "left_outer_order_count_histogram",
        "asof_latest_order_before_event",
        "ohlcv_bars_1h_resampled",
        "sma_crossover_backtest_5m",
        "adjusted_candles_5m",
        "session_windows_per_user",
        "substring_span_dedup",
        "bm25_topk_docs",
        "cluster_aware_split",
        "multigrain_bars_rollup",
        # (dsir_weights_for_target re-entered the round-14 window to
        #  certify its rebalanced stage-1 scan; that green is on record
        #  in CORRECTNESS_r14.json, so it retired at the r15 rotation
        #  and is listed in the round-15 block above)
        "kneser_ney_logprob_docs",
        "key_skew_profile",
        "bottomk_sketch_quantiles",
        "dq_constraint_audit",
        "kmv_audience_overlap",
        "regular_hours_bars",
        "psi_price_drift",
        "srp_bucket_assignments",
        "srp_topk_reranked",
        "vwap_5m",
        "doc_quality_features",
        "view_click_purchase_funnel",
        # rotated out in round 9 (each green 5-8 recorded rounds; the
        # eighteen-slot rotation that closed the certified-union gap)
        "dedup_overlapping_batches",
        "orders_scalar_suite",
        "string_funcs_suite",
        "lineitem_scalar_suite",
        "sql_api_in_exists_having",
        "exact_percentiles_per_flag",
        "rsi_14_per_event_type",
        "ohlcv_bars_5m",
        "minhash_verified_near_dups",
        "simhash_verified_near_dups",
        "cosine_topk_bruteforce",
        "text_analysis_suite",
        "train_val_test_split",
        "context_window_packing",
        "profile_orders_columns",
        "embedding_neighbors_blocked",
        "dedup_survivors",
        "doc_rarity_scores",
        # rotated out late round 8 (green r4-r7, four recorded rounds)
        "triple_barrier_labels_5m",
        "bigram_logprob_docs",
        # rotated out in round 8 (green r4-r7 or r5-r7)
        "nation_market_share_economy",
        "excess_part_shippers",
        "return_correlation_pairs",
        "vpin_volume_buckets",
        "pairs_spread_zscore",
        # rotated out in round 7 (green r4-r6, or r5-r6 for the two TPC-H
        # shapes whose families are anchored by many other greens)
        "sole_blame_suppliers",
        "heavy_hitter_parts",
        "mixture_resample_by_lang",
        "pending_order_revenue_topk",
        "discount_band_revenue",
        # rotated out in round 6 (each green five rounds, r1-r5)
        "filter_mktsegment",
        "pricing_summary",
        "count_distinct_parts_per_flag",
        "join_lineitem_part_broadcast",
        "star_join_revenue_by_region",
        "rownum_recent_orders_per_customer",
        "moving_avg_price_per_supplier",
        "dedup_docs_by_text",
        "near_dup_clusters",
        # rotated out in round 5 (green r1-r4, or r04 for the four r3
        # flagships that entered the window in round 4)
        "project_customer",
        "sort_by_name_length",
        "topk_orders_by_price",
        "argmax_order_by_price",
        "band_join_events_60s",
        "range_frame_30d_qty",
        "global_ordinals_orders",
        "scd2_customer_refresh",
        "fingerprint_orders",
        "copurchase_triangles",
        # rotated out in round 4 (green r1+r2+r3, or r2+r3 for the three
        # reshape reps that entered the window in round 2)
        "filter_ship_after_watermark",
        "distinct_orderpriority",
        "pivot_status_counts",
        "unpivot_rates",
        "array_higher_order_ops",
        "max_shipdate_watermark",
        "semi_join_customers_with_orders",
        "lag_value_per_user",
        "union_order_slices",
        "json_extract_props",
        "rollup_returnflag_status",
        # rotated out in earlier rounds (green in r1 and/or r2)
        "multi_max_lineitem",
        "min_orderdate",
        "count_lineitem",
        "median_qty_per_flag",
        "anti_join_customers_without_orders",
    }
)


def _apply_registration_order() -> None:
    assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"driver window names not registered: {missing}"
    no_oracle = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not no_oracle, f"rows-only queries in driver window: {no_oracle}"
    window = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    rest_sql = {n: s for n, s in REGISTRY.items() if n not in window and s.oracle}
    rest_rows = {
        n: s for n, s in REGISTRY.items() if n not in window and not s.oracle
    }
    REGISTRY.clear()
    REGISTRY.update(window)
    REGISTRY.update(rest_sql)
    REGISTRY.update(rest_rows)


_apply_registration_order()
