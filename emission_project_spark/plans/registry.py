"""Query registry — the driver-facing catalog of named queries.

Each entry pairs a PySpark query builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (run by the driver
at sf0.01 and hash-compared). Non-SQL-expressible operators register
with ``oracle=None`` → the driver records a rows-only check.

Column-name discipline: every computed column is aliased identically on
both sides (driver compares after sorting columns by name).
Float discipline: every order-of-addition-sensitive aggregate is
``round()``-ed identically on both sides so ulp-level accumulation
differences between engines don't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness artifact covers the first 50 registered
# queries. Window policy (round 5): (a) ``approx_hll_distinct_events``
# in slot 1 — restructured this round from a rows-only HLL estimate
# (which the driver graded ``err: no_oracle``) to an exact-distinct +
# within-2%-assertion form that hash-checks; (a') every query built
# this round (31 new: 5 early + 26 late), so nothing ships without a
# driver row attempt; (b) the 8 queries whose latest driver row is
# round 2 — the below-boundary tail round 4 left behind; (c) the
# round-3-verified queries that still fit, heaviest / drift-sensitive
# (extensions, events-consumers) first. The displaced r3-verified
# relational tail rotates in round 6.
_PRIORITY: list[str] = [
    # -- (a) restructured this round: first hash-checkable driver row -----
    "approx_hll_distinct_events",
    # -- (a) new round 5: queries with no driver row yet ------------------
    "stream_windowed_distinct_batch",
    "dedup_minhash_bucket_survivors",
    "join_q5_regional_supplier_revenue",
    "events_retention_cohorts",
    "validation_contract_orders",
    # -- (b) last verified round 2: the below-boundary tail ----------------
    "text_decontaminate_overlap",
    "text_url_extract",
    "text_corpus_top_terms",
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "curation_pack_sequences",
    "curation_truncate_tokens",
    "curation_final_corpus",
    # -- (a') built later in round 5: no driver row yet --------------------
    "conditional_agg_priority_classes",
    "join_q14_promo_revenue",
    "join_q19_or_predicate_revenue",
    "scalar_subquery_above_avg",
    "window_pct_rank_cume_dist",
    "percentile_exact_prices",
    "events_anomaly_zscore",
    "curation_chunk_overlap",
    "dedup_levenshtein_block",
    "text_bigrams_top",
    "stream_left_outer_join_batch",
    "scd2_customer_segment",
    "scd2_point_in_time",
    "text_unigram_logprob",
    "curation_temperature_weights",
    "argmin_cheapest_part_per_brand",
    "revenue_mom_change",
    "curation_weighted_sample",
    "curation_train_val_test_split",
    "stream_topk_values_batch",
    "stats_corr_price_quantity",
    "listagg_nations_per_region",
    "incremental_rollup_merge",
    "unpivot_lineitem_measures",
    "dedup_chunk_level_profile",
    "similarity_hard_negatives",
    "text_bm25_search",
    "cdc_apply_customers",
    # -- (a'') built in this session (still round 5): no driver row yet;
    # these take precedence over refreshing rows that are already green
    # from round 3, so the (c) block below slides past the boundary and
    # rotates in round 6 instead.
    "join_q7_nation_trade_volume",
    "join_q9_product_profit",
    "join_q13_order_count_distribution",
    "join_q17_small_quantity_revenue",
    "join_q18_large_volume_customers",
    "join_q21_lone_late_supplier",
    "join_q22_idle_balance_customers",
    "join_full_outer_reconcile",
    # ---- window boundary (slot 50 = join_full_outer_reconcile) -----------
    # 42 prior entries + 8 of the 9 session queries fill the window;
    # skew_key_profile_lineitem (locally oracle-swept + pytest-covered)
    # heads the round-6 window together with the displaced (c) block.
    "skew_key_profile_lineitem",
    # tpch_patterns2: the eight deferred TPC-H shapes (Q2/Q4/Q8/Q10/
    # Q11/Q12/Q15/Q20), built after the round-5 window filled — locally
    # oracle-swept; they queue here for their first driver row in r6.
    "join_q2_min_cost_supplier",
    "join_q4_order_priority_check",
    "join_q8_market_share",
    "join_q10_returned_top_customers",
    "join_q11_important_stock",
    "join_q12_ship_class_priority",
    "join_q15_top_supplier",
    "join_q20_excess_share_suppliers",
    "join_q6_forecast_revenue",
    # curation_lm: DSIR importance weights + bigram perplexity filter —
    # also post-window round-5 builds queued for their first r6 row.
    "curation_dsir_weights",
    "text_bigram_perplexity",
    "text_token_entropy",
    "graph_pagerank_parts",
    "text_gopher_rules",
    "events_funnel_3step",
    "embedding_matryoshka_energy",
    "stats_welch_ab_events",
    "events_cumulative_users",
    "text_ngram_novelty",
    "graph_hits_part_authority",
    "embedding_dim_variance",
    "embedding_quantize_error",
    "events_anomaly_mad",
    "profile_orders_columns",
    "text_sentence_stats",
    "events_dwell_times",
    "events_transition_matrix",
    "basket_part_pairs_lift",
    "similarity_knn_classify",
    "join_q16_supplier_diversity",
    "stats_regression_price_on_qty",
    "text_zipf_slope",
    # -- (c) rotation: last verified round 3, extensions first -------------
    "curation_cluster_quality_join",
    "approx_aggregates_events",
    "dedup_semantic_pairs",
    "similarity_ivf_kmeans_topk",
    "embedding_cluster_quality",
    "embedding_kmeans_lloyd",
    "dedup_embedding_cosine_lsh",
    "fk_orphan_check",
    # everything below keeps its green r3 row and rotates in round 6;
    # the 28 late-round-5 queries plus the session block above consumed
    # the remaining slots, pushing this (c) block past the boundary.
    # (tests/test_queries_smoke.py pins that all names here resolve)
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "stream_dedup_watermark_batch",
    "winnow_oversized_report",
    "dedup_bucket_cap_report",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_exact_documents",
    "similarity_bruteforce_topk",
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    # -- (c) rotation: last verified round 3, events-consumers -------------
    "asof_join_clicks_purchases",
    "events_sessionize",
    "events_tumbling_hourly",
    "events_sliding_30m15m",
    "events_json_extract",
    "skew_salted_rollup_events",
    "role_playing_nation_join",
    "skew_salted_join_mktsegment",
    "dedup_subset_deterministic",
    "anti_join_customers_without_orders",
    "nullsafe_join_match",
    "surrogate_keys_dense",
    "incremental_insert_orders",
    "upsert_customer_balances",
    "set_ops_intersect_except",
    "window_rank_top3_per_priority",
    "regex_extract_long_words",
    "array_higher_order_fns",
    "rollup_pricing_summary",
    "topk_orders_by_price",
    "group_rollup_brand",
    "group_rollup_supplier",
    "window_running_total",
    "rollup_grouping_sets",
    "rollup_cube_status_priority",
]


def _reorder() -> None:
    """Rebuild QUERIES/ORACLES with _PRIORITY names first (dicts keep
    insertion order; the driver iterates ``queries()`` in that order)."""
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    q = {n: QUERIES[n] for n in ordered}
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from emission_project_spark.plans import relational  # noqa: F401
    from emission_project_spark.plans import extensions  # noqa: F401
    from emission_project_spark.plans import tpch_patterns  # noqa: F401
    from emission_project_spark.plans import tpch_patterns2  # noqa: F401
    from emission_project_spark.plans import curation_lm  # noqa: F401
    from emission_project_spark.plans import graph_rank  # noqa: F401
    from emission_project_spark.plans import quality_gates  # noqa: F401

    _reorder()
