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
# queries. Window policy (round 12, per the round-11 verdict task #1):
# drain r6 to zero, oldest-first —
# (a) ALL 27 rows whose latest driver row is r6 (alphabetical,
#     join_q15_top_supplier .. text_token_entropy);
# (b) the 21 oldest r7 rows (alphabetical, approx_aggregates_events ..
#     events_kaplan_meier); the two r7 leftovers that net-new displaced
#     (fk_orphan_check, graph_adamic_adar_top) lead the r13 rotation;
# (c) net-new 2 of the sanctioned <=3: the warehouse maintenance
#     surface's first driver rows (compact range-clustered rewrite +
#     protected-version vacuum, r11 verdict task #8).
# 27 + 21 + 2 = 50. After this round no query's latest driver row is
# older than r7 (histogram via `python -m emission_project_spark
# ledger`). (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) the full r6 tail: drained to zero this round (27) -------------
    "join_q15_top_supplier",
    "join_q16_supplier_diversity",
    "join_q20_excess_share_suppliers",
    "join_q2_min_cost_supplier",
    "join_q3_shipping_priority",
    "join_q4_order_priority_check",
    "join_q6_forecast_revenue",
    "join_q8_market_share",
    "layout_zorder_skipping",
    "profile_orders_columns",
    "similarity_ivfpq_rerank_topk",
    "similarity_ivfpq_topk",
    "similarity_knn_classify",
    "skew_key_profile_lineitem",
    "stats_chi2_segment_priority",
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    "stats_psi_value_drift",
    "stats_regression_price_on_qty",
    "stats_welch_ab_events",
    "stats_winsorized_doc_lengths",
    "text_bigram_perplexity",
    "text_gopher_rules",
    "text_ngram_novelty",
    "text_quality_linear_classifier",
    "text_sentence_stats",
    "text_token_entropy",
    # -- (b) the 21 oldest r7 rows (alphabetical) --------------------------
    "approx_aggregates_events",
    "curation_cluster_quality_join",
    "curation_domain_cap",
    "curation_dsir_ess",
    "dedup_bucket_cap_report",
    "dedup_embedding_cosine_lsh",
    "dedup_exact_documents",
    "dedup_jaccard_prefix_join",
    "dedup_lsh_quality",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_semantic_pairs",
    "dedup_simhash",
    "dedup_winnow_pairs",
    "embedding_cluster_quality",
    "embedding_kmeans_lloyd",
    "events_attribution_last_touch",
    "events_cusum_changepoint",
    "events_hourly_acf",
    "events_kaplan_meier",
    # -- (c) net-new (2): the warehouse maintenance surface ----------------
    "warehouse_compact_clustered",
    "warehouse_vacuum_protected",
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
