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
# queries. Window policy (round 8, per the round-7 verdict): (a) the
# 29 queries whose latest driver row is r3 — 4 rounds stale, the
# oldest in the ledger — head the window (text gates first, then the
# events/asof family, skew handling, and the relational core);
# (b) the three round-7 queries fixed in round 8 for boundary
# divergences re-verify next — `stats_benford_first_digit` also
# CHANGED SCHEMA (n_excluded added) so its old row is void; (c) new
# round-8 builds follow as they land; (d) any remaining slots refresh
# the oldest surviving rows (the r4 relational/projection family).
# After round 8 no query's latest driver row should be older than r5.
# OVERFLOW (the r6→r7 precedent): 29+3 mandatory slots leave 18 for
# the 24 round-8 builds, so the last six of section (c) —
# embedding_hubness_stats, privacy_t_closeness_customers,
# stats_brown_forsythe, events_dau_mau_stickiness,
# graph_neighbor_jaccard_top, events_bot_score — plus section (d)
# fall outside this round's window and are the DECLARED HEAD of
# round 9's rotation; all are three-SF green in COMPARE_r08.txt and
# boundary-suite replayed meanwhile.
# (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) r3-stale refresh head (29) ------------------------------------
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
    # -- (b) round-8 boundary-fix re-verification (3) ----------------------
    "graph_triangle_stats",
    "stats_benford_first_digit",
    "events_path_topk",
    # -- (c) round-8 new builds (insert here as they land) -----------------
    "similarity_recall_at_k",
    "similarity_ndcg_at_k",
    "embedding_pca_project",
    "stats_roc_auc",
    "stats_spearman_corr",
    "stats_cohens_kappa",
    "stats_jensen_shannon",
    "stats_lorenz_deciles",
    "stats_theil_index",
    "events_interarrival_burstiness",
    "text_heaps_law",
    "multimodal_phash_pairs",
    "stream_attribution_batch",
    "stats_permutation_pvalue",
    "events_mann_kendall_trend",
    "embedding_centroid_distances",
    "text_source_diversity",
    "text_kneser_ney_bigrams",
    "embedding_hubness_stats",
    "privacy_t_closeness_customers",
    "stats_brown_forsythe",
    "events_dau_mau_stickiness",
    "graph_neighbor_jaccard_top",
    "events_bot_score",
    "stats_cliffs_delta",
    "events_conversion_delay_percentiles",
    # -- (d) r4-row refresh tail fills any remaining slots (overflow
    # past slot 50 is the declared head of round 9's rotation) -------------
    "count_probe",
    "projection_rename",
    "filter_predicate",
    "derived_measure",
    "cast_and_dateparts",
    "date_id_smart_key",
    "date_dim_generate",
    "dim_fk_resolve",
    "union_distinct_nations",
    "sql_gateway_rollup",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_kmeans_lloyd",
    "dedup_semantic_pairs",
    "dedup_minhash_signatures",
    "fk_orphan_check",
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
    from emission_project_spark.plans import eval_metrics  # noqa: F401

    _reorder()
