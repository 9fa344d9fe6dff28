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
# queries. Window policy (round 6): EVERY query that has never had a
# driver row is in-window — (a) the 33 round-5 builds (TPC-H Q2/Q4/
# Q6/Q8/Q10/Q11/Q12/Q15/Q16/Q20 grid, corpus-LM block, both graph
# ranks, events/stats tail) in slots 1-33 — the rotation round 5
# promised but did not apply; (b) 17 round-6 builds in slots 34-50:
# the PQ/IVF-PQ ADC pair (plain + exact re-rank), the PCA stage-1
# cross-moment probe, the substring-span pair + cap report, the
# grid-completing TPC-H Q3, the linear quality classifier, the
# winsorized length stats, the embedding-norm QC gate, the
# canonical-survivor join, the five corpus-governance additions
# (shingle containment minus the two privacy gates, chi-squared,
# epoch schedule, z-order layout), and the drift trio (KS,
# Mann-Whitney, PSI — the richest new cross-engine numerics). The
# privacy gates, the winnow refresh pair, and the rest of the r3
# tail rotate in round 7 — listed after the boundary in refresh
# order.
_PRIORITY: list[str] = [
    # -- (a) round-5 builds: first driver row ------------------------------
    "skew_key_profile_lineitem",
    "join_q2_min_cost_supplier",
    "join_q4_order_priority_check",
    "join_q8_market_share",
    "join_q10_returned_top_customers",
    "join_q11_important_stock",
    "join_q12_ship_class_priority",
    "join_q15_top_supplier",
    "join_q20_excess_share_suppliers",
    "join_q6_forecast_revenue",
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
    # -- (b) built round 6: first driver rows ------------------------------
    "similarity_ivfpq_topk",
    "similarity_ivfpq_rerank_topk",
    "embedding_covariance_block",
    "dedup_substring_spans",
    "dedup_substring_cap_report",
    "join_q3_shipping_priority",
    "text_quality_linear_classifier",
    "stats_winsorized_doc_lengths",
    "embedding_norm_outliers",
    "dedup_canonical_survivors",
    "dedup_shingle_containment",
    "stats_chi2_segment_priority",
    "curation_epoch_schedule",
    "layout_zorder_skipping",
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    "stats_psi_value_drift",
    # ---- window boundary (slot 50 = stats_psi_value_drift) ---------------
    # 33 round-5 builds + 17 round-6 builds fill the window exactly;
    # more round-6 builds exist than slots, so the overflow heads the
    # round-7 rotation: first the later round-6 builds (centroid
    # confusion), then the privacy gates (pure integer counting with
    # pandas recomputation pytests — the least incremental value from
    # a driver row), then the winnow refresh pair (r3 rows,
    # re-profiled clean this round — SCALING.md "winnow drift was
    # noise") and the rest of the r3 tail, in this order.
    # (tests/test_queries_smoke.py pins name resolution.)
    # Session-3 builds (curation_domain_cap, events_hourly_acf,
    # events_cusum_changepoint, stats_classifier_calibration) are not
    # listed here: they register after _PRIORITY in import order and
    # belong at the head of the round-7 rotation with the overflow
    # below.
    "similarity_centroid_confusion",
    "stream_psi_drift_batch",
    "sketch_f2_selfjoin_events",
    "text_langid_confusion",
    "curation_dsir_ess",
    "dedup_lsh_quality",
    "privacy_k_anonymity_customers",
    "privacy_l_diversity_customers",
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "approx_aggregates_events",
    "dedup_semantic_pairs",
    "fk_orphan_check",
    "stream_dedup_watermark_batch",
    "winnow_oversized_report",
    "curation_cluster_quality_join",
    "similarity_ivf_kmeans_topk",
    "embedding_cluster_quality",
    "embedding_kmeans_lloyd",
    "dedup_embedding_cosine_lsh",
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
    from emission_project_spark.plans import corpus_ops  # noqa: F401
    from emission_project_spark.plans import drift_stats  # noqa: F401

    _reorder()
