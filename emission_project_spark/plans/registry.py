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
# queries. Window policy (round 11, per the round-10 verdict):
# (a) queries whose plans this round rewrote re-verify first — a plan
# rewrite voids the old row's evidentiary value even with an unchanged
# schema (the hubness_ivf single-scan sharded assignment, and the
# triangle/pagerank edge-estimate + probe-cache changes if their plans
# are touched);
# (b) the 25 r5-stale rows — the oldest ledger rows anywhere after the
# r10 drain (join_q5_regional_supplier_revenue ..
# window_pct_rank_cume_dist, alphabetical);
# (c) the oldest-r6 rows, alphabetical, filling to 50. After this
# round no query's latest driver row is older than r6 (histogram via
# `python -m emission_project_spark ledger`). Net-new this round: 1
# (warehouse_snapshot_rollback — the warehouse snapshot layer's first
# driver row, r10 verdict task #7), taking the last section-(c) slot
# (join_q15_top_supplier leads the r12 leftovers).
# (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) round-11 plan rewrites re-verify ------------------------------
    "embedding_hubness_ivf",
    "graph_triangle_stats",
    "graph_pagerank_parts",
    # -- (b) r5-stale tail: the oldest rows in the ledger (25) -------------
    "join_q5_regional_supplier_revenue",
    "join_q7_nation_trade_volume",
    "join_q9_product_profit",
    "listagg_nations_per_region",
    "percentile_exact_prices",
    "revenue_mom_change",
    "scalar_subquery_above_avg",
    "scd2_customer_segment",
    "scd2_point_in_time",
    "similarity_hard_negatives",
    "sketch_bloom_prefilter",
    "sketch_count_min_terms",
    "stats_corr_price_quantity",
    "stream_left_outer_join_batch",
    "stream_topk_values_batch",
    "stream_windowed_distinct_batch",
    "text_bigrams_top",
    "text_bm25_search",
    "text_corpus_top_terms",
    "text_decontaminate_overlap",
    "text_unigram_logprob",
    "text_url_extract",
    "unpivot_lineitem_measures",
    "validation_contract_orders",
    "window_pct_rank_cume_dist",
    # -- (c) oldest-r6 tail, alphabetical (22) -----------------------------
    "basket_part_pairs_lift",
    "curation_dsir_weights",
    "curation_epoch_schedule",
    "dedup_canonical_survivors",
    "dedup_shingle_containment",
    "dedup_substring_cap_report",
    "dedup_substring_spans",
    "embedding_covariance_block",
    "embedding_dim_variance",
    "embedding_matryoshka_energy",
    "embedding_norm_outliers",
    "embedding_quantize_error",
    "events_anomaly_mad",
    "events_cumulative_users",
    "events_dwell_times",
    "events_funnel_3step",
    "events_transition_matrix",
    "graph_hits_part_authority",
    "join_q10_returned_top_customers",
    "join_q11_important_stock",
    "join_q12_ship_class_priority",
    # -- net-new (1): the warehouse layer's first driver row ---------------
    "warehouse_snapshot_rollback",
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
