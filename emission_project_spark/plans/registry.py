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
# queries. Window policy (round 7): (a) slots 1-12 are the twelve
# queries that have never had a driver row — the round-6 overflow
# (centroid confusion, streaming-PSI batch twin, AMS F2, langid
# confusion, DSIR ESS, LSH banding quality, the two privacy gates)
# plus the four session-3 builds (domain cap, hourly ACF, CUSUM
# changepoint, classifier calibration); (b) round-7 new builds
# follow, marked below — never driver-verified by construction;
# (c) the remaining slots refresh the oldest driver rows: the
# r3-verified tail in the refresh order round 6 laid out (winnow
# pair first, then dedup/similarity families, text gates, events,
# skew/relational core). After round 7 every query's latest driver
# row should be ≤3 rounds old or queued at the head of round 8's
# rotation. (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) never driver-verified: round-6 overflow + session-3 builds ----
    "similarity_centroid_confusion",
    "stream_psi_drift_batch",
    "sketch_f2_selfjoin_events",
    "text_langid_confusion",
    "curation_dsir_ess",
    "dedup_lsh_quality",
    "privacy_k_anonymity_customers",
    "privacy_l_diversity_customers",
    "curation_domain_cap",
    "events_hourly_acf",
    "events_cusum_changepoint",
    "stats_classifier_calibration",
    # -- (b) round-7 new builds (insert here as they land) -----------------
    "graph_triangle_stats",
    "graph_adamic_adar_top",
    "dedup_jaccard_prefix_join",
    "text_pmi_collocations",
    "text_vocab_oov_rate",
    "events_attribution_last_touch",
    "stats_benford_first_digit",
    "similarity_range_search",
    "graph_kcore_peel",
    "stats_gini_concentration",
    "stats_mutual_info_priority_segment",
    "events_rfm_segments",
    "events_kaplan_meier",
    "stats_poisson_bootstrap_ci",
    "events_path_topk",
    "similarity_mmr_rerank",
    "stats_cramers_v_priority_segment",
    "text_rake_keywords",
    "text_hash_feature_buckets",
    # -- (c) r3-row refresh tail -------------------------------------------
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
    from emission_project_spark.plans import affinity_ops  # noqa: F401
    from emission_project_spark.plans import cohort_stats  # noqa: F401
    from emission_project_spark.plans import keyword_ops  # noqa: F401

    _reorder()
