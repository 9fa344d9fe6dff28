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
# queries. Window policy (round 10, per the round-9 verdict):
# (a) the queries whose plans or outputs this round rewrote re-verify
# first — a plan rewrite voids the old row's evidentiary value even
# with an unchanged schema (the hubness_stats BLAS kernel, the
# hubness_ivf sharded coarse layer + zero-norm tie-break fix, and the
# DAU/MAU HLL 3σ band whose assertion column was renamed);
# (b) the 20 r4-stale queries — the oldest ledger rows anywhere;
# (c) 25 of the 50 r5-stale rows, alphabetical (all equally old, so
# the order is arbitrary but deterministic); the remaining 25 r5 rows
# (join_q5_regional_supplier_revenue .. window_pct_rank_cume_dist)
# lead the r11 window. After this round no query's latest driver row
# is older than r5. Net-new queries this round: 0 — drainage is the long pole
# (the r9 verdict's window arithmetic: 50 slots, 256 queries).
# Post-seal addendum: the later round-10 session rewrote the triangle
# census and pagerank plans (int-width ids — SCALING.md postscripts),
# so they join section (a) and the LAST TWO section-(c) names
# (join_q5_regional_supplier_revenue, join_q7_nation_trade_volume)
# move to the r11 leftovers, keeping the window at 50.
# (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) round-10 plan rewrites re-verify (3 + 2 post-seal) ------------
    "embedding_hubness_stats",
    "embedding_hubness_ivf",
    "events_dau_mau_hll",
    "graph_triangle_stats",
    "graph_pagerank_parts",
    # -- (b) r4-stale tail: the oldest rows in the ledger (20) -------------
    "asof_forward_next_error",
    "curation_mixture_report",
    "curation_mixture_sample",
    "curation_token_budget",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "events_funnel_conversion",
    "events_gapfill_ffill",
    "events_gapfill_hourly",
    "histogram_event_values",
    "join_having_large_orders",
    "join_topk_shipping_priority",
    "multimodal_payload_stats",
    "pivot_daily_event_counts",
    "semi_anti_customers_no_urgent",
    "stream_interval_join_batch",
    "stream_sessionize_batch",
    "text_pii_scrub",
    "text_repetition_metrics",
    "window_rolling_10min_mean",
    # -- (c) r5-stale tail, first 25 alphabetically (25) -------------------
    "approx_hll_distinct_events",
    "argmin_cheapest_part_per_brand",
    "cdc_apply_customers",
    "conditional_agg_priority_classes",
    "curation_chunk_overlap",
    "curation_final_corpus",
    "curation_pack_sequences",
    "curation_temperature_weights",
    "curation_train_val_test_split",
    "curation_truncate_tokens",
    "curation_weighted_sample",
    "dedup_chunk_level_profile",
    "dedup_levenshtein_block",
    "dedup_minhash_bucket_survivors",
    "events_anomaly_zscore",
    "events_retention_cohorts",
    "incremental_rollup_merge",
    "join_full_outer_reconcile",
    "join_q13_order_count_distribution",
    "join_q14_promo_revenue",
    "join_q17_small_quantity_revenue",
    "join_q18_large_volume_customers",
    "join_q19_or_predicate_revenue",
    "join_q21_lone_late_supplier",
    "join_q22_idle_balance_customers",
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
