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
# queries. Window policy (round 9, per the round-8 verdict):
# (a) the 8 round-8 builds that landed past the 50-slot window and
# have NO driver row yet — the r8 verdict's DECLARED HEAD — verify
# first; (b) the queries whose PLANS were rewritten this round (the
# exact-rank family now ranks via functions/ranks.py bucketed prefix
# sums; permutation's ×13 chunk fold; the bootstrap's Arrow
# partial-sum kernel — its REDRAWN replicates change the CI values,
# so the old row is VOID, which outranks draining one more merely
# stale row; the distributed surrogate-key assigner; the top-k
# vocab / distributed zipf rank) re-verify on the ledger even where
# an old row exists — a plan rewrite voids the old row's evidentiary
# value even with an unchanged schema; (c) the two round-9 builds
# (IVF full-corpus hubness, DAU/MAU HLL twin); (d) the remaining 29
# slots drain the r4-stale tail oldest-first (the
# projection/date/probe §2 family, then the round-4 extension
# family) — after this round the r4 tail is 20 and every §2-core
# row is r8+.
# (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) r8 overflow: never driver-verified (8) ------------------------
    "embedding_hubness_stats",
    "privacy_t_closeness_customers",
    "stats_brown_forsythe",
    "events_dau_mau_stickiness",
    "graph_neighbor_jaccard_top",
    "events_bot_score",
    "stats_cliffs_delta",
    "events_conversion_delay_percentiles",
    # -- (b) round-9 plan rewrites re-verify (10) --------------------------
    "stats_spearman_corr",
    "stats_roc_auc",
    "stats_gini_concentration",
    "stats_lorenz_deciles",
    "events_rfm_segments",
    "text_heaps_law",
    "stats_permutation_pvalue",
    "stats_poisson_bootstrap_ci",
    "surrogate_keys_dense",
    "text_vocab_oov_rate",
    "text_zipf_slope",
    # -- (c) round-9 new builds (2) ----------------------------------------
    "embedding_hubness_ivf",
    "events_dau_mau_hll",
    # -- (d) r4-stale tail, oldest §2 family first (30) --------------------
    "projection_rename",
    "filter_predicate",
    "derived_measure",
    "cast_and_dateparts",
    "date_id_smart_key",
    "date_dim_generate",
    "union_distinct_nations",
    "count_probe",
    "dim_fk_resolve",
    "distinct_count_customers",
    "range_join_signup_errors",
    "sql_gateway_rollup",
    "window_moving_avg",
    "window_ntile_quartiles",
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "curation_stratified_sample",
    "curation_length_percentiles",
    "curation_profile_documents",
    "curation_tfidf_top_terms",
    "curation_quality_filter",
    "similarity_ivf_topk",
    "dedup_embedding_cosine",
    "embedding_stats",
    "multimodal_binary_meta",
    "multimodal_extract_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "stream_user_totals_batch",
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
