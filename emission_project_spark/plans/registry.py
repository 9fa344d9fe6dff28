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
# queries. Window policy (round 13, per the round-12 verdict task #1):
# drain r7 to zero, oldest-first —
# (a) ALL 22 rows whose latest driver row is r7 (alphabetical,
#     fk_orphan_check .. winnow_oversized_report);
# (b) the 25 oldest r8 rows (alphabetical,
#     anti_join_customers_without_orders .. similarity_ndcg_at_k); the
#     18 r8 leftovers (similarity_recall_at_k ..) lead the r14 rotation;
# (c) net-new 2 of the sanctioned <=3: the last pytest-only warehouse
#     corners gaining oracle rows (merged-schema evolution scan +
#     small-files census, r12 verdict task #5);
# (d) re-verify 1: warehouse_compact_clustered changed this round (the
#     files_reduced boolean became a deterministic files_before/
#     files_after count pair, r12 ADVICE #4) — a changed query gets a
#     fresh driver row rather than standing on its r12 hash.
# 22 + 25 + 2 + 1 = 50. After this round no query's latest driver row
# is older than r8 (histogram via `python -m emission_project_spark
# ledger`). (tests/test_queries_smoke.py pins name resolution.)
_PRIORITY: list[str] = [
    # -- (a) the full r7 tail: drained to zero this round (22) -------------
    "fk_orphan_check",
    "graph_adamic_adar_top",
    "graph_kcore_peel",
    "privacy_k_anonymity_customers",
    "privacy_l_diversity_customers",
    "similarity_bruteforce_topk",
    "similarity_centroid_confusion",
    "similarity_ivf_kmeans_topk",
    "similarity_mmr_rerank",
    "similarity_range_search",
    "sketch_f2_selfjoin_events",
    "stats_classifier_calibration",
    "stats_cramers_v_priority_segment",
    "stats_mutual_info_priority_segment",
    "stream_dedup_watermark_batch",
    "stream_psi_drift_batch",
    "text_hash_feature_buckets",
    "text_langid_confusion",
    "text_pmi_collocations",
    "text_rake_keywords",
    "text_winnow_fingerprints",
    "winnow_oversized_report",
    # -- (b) the 25 oldest r8 rows (alphabetical) --------------------------
    "anti_join_customers_without_orders",
    "array_higher_order_fns",
    "asof_join_clicks_purchases",
    "dedup_subset_deterministic",
    "embedding_centroid_distances",
    "embedding_pca_project",
    "events_interarrival_burstiness",
    "events_json_extract",
    "events_mann_kendall_trend",
    "events_path_topk",
    "events_sessionize",
    "events_sliding_30m15m",
    "events_tumbling_hourly",
    "group_rollup_brand",
    "group_rollup_supplier",
    "incremental_insert_orders",
    "multimodal_phash_pairs",
    "nullsafe_join_match",
    "regex_extract_long_words",
    "role_playing_nation_join",
    "rollup_cube_status_priority",
    "rollup_grouping_sets",
    "rollup_pricing_summary",
    "set_ops_intersect_except",
    "similarity_ndcg_at_k",
    # -- (c) net-new (2): last pytest-only warehouse corners ---------------
    "warehouse_schema_evolution",
    "warehouse_files_census",
    # -- (d) re-verify (1): output schema changed this round ---------------
    "warehouse_compact_clustered",
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
