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
# queries. Window policy (round 14, continuing the r12 verdict task #1
# oldest-first drain; r13 verdict task #7): no ledger row older than r9
# after this round —
# (a) ALL 18 rows whose latest driver row is r8 (alphabetical,
#     similarity_recall_at_k .. window_running_total) — r8 drained;
# (b) the 32 oldest r9 rows (alphabetical, cast_and_dateparts ..
#     stats_brown_forsythe); the 15 r9 leftovers lead the r15 rotation;
# (c) no net-new rows: round 13 gave the last pytest-only corners their
#     oracle rows, and no round-14 query changed its declared OUTPUT
#     (every r14 optimization is result-identical and pinned by the
#     existing hashes — scd2/rfm/jaccard/hubness all re-verified against
#     the oracle at 3 SFs this round, see OPTIMIZATION_r14.md).
# 18 + 32 = 50. Histogram via `python -m emission_project_spark ledger`.
# (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) the 18 r8 leftovers: r8 drained to zero this round -----------
    "similarity_recall_at_k",
    "skew_salted_join_mktsegment",
    "skew_salted_rollup_events",
    "stats_benford_first_digit",
    "stats_cohens_kappa",
    "stats_jensen_shannon",
    "stats_theil_index",
    "stream_attribution_batch",
    "text_fingerprint",
    "text_kneser_ney_bigrams",
    "text_langid",
    "text_quality_score",
    "text_source_diversity",
    "text_token_count",
    "topk_orders_by_price",
    "upsert_customer_balances",
    "window_rank_top3_per_priority",
    "window_running_total",
    # -- (b) the 32 oldest r9 rows (alphabetical) --------------------------
    "cast_and_dateparts",
    "count_probe",
    "curation_length_percentiles",
    "curation_profile_documents",
    "curation_quality_filter",
    "curation_stratified_sample",
    "curation_tfidf_top_terms",
    "date_dim_generate",
    "date_id_smart_key",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_keep_canonical",
    "derived_measure",
    "dim_fk_resolve",
    "distinct_count_customers",
    "embedding_stats",
    "events_bot_score",
    "events_conversion_delay_percentiles",
    "events_dau_mau_stickiness",
    "events_rfm_segments",
    "filter_predicate",
    "graph_neighbor_jaccard_top",
    "multimodal_binary_meta",
    "multimodal_extract_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "privacy_t_closeness_customers",
    "projection_rename",
    "range_join_signup_errors",
    "similarity_ivf_topk",
    "sql_gateway_rollup",
    "stats_brown_forsythe",
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
