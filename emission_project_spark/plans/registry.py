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
# queries. Window policy (round 3): (a) the two queries without a
# driver-green row yet, (b) every query whose code path changed this
# round (regressions must surface in the artifact, not just locally),
# (c) new round-3 queries, then (d) a rotating slice of queries last
# driver-verified in round 1 — the tail rotates each round so every
# registered query cycles back through the window (ADVICE round 2).
_PRIORITY: list[str] = [
    # -- (a) no driver-green row yet -------------------------------------
    "curation_cluster_quality_join",  # slot 51 in round 2 — first now
    "approx_aggregates_events",       # oracle added this round
    # -- (b) code paths changed this round: re-verify ---------------------
    "dedup_semantic_pairs",           # centroid checkpoint
    "similarity_ivf_kmeans_topk",     # centroid checkpoint
    "embedding_cluster_quality",      # centroid checkpoint
    "embedding_kmeans_lloyd",         # shared kmeans module
    "dedup_embedding_cosine_lsh",     # eager dim probe removed
    "fk_orphan_check",                # empty-input coalesce
    "text_winnow_fingerprints",       # oversized-doc accounting
    "dedup_winnow_pairs",
    # -- (c) new round-3 queries ------------------------------------------
    "stream_dedup_watermark_batch",
    "stream_interval_join_batch",
    "winnow_oversized_report",
    "dedup_bucket_cap_report",
    # -- (d) rotation: last verified round 1, heaviest first ---------------
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
    "role_playing_nation_join",
    "asof_join_clicks_purchases",
    "range_join_signup_errors",
    "events_sessionize",
    "skew_salted_join_mktsegment",
    "skew_salted_rollup_events",
    "rollup_pricing_summary",
    "dedup_subset_deterministic",
    "topk_orders_by_price",
    "anti_join_customers_without_orders",
    "nullsafe_join_match",
    "surrogate_keys_dense",
    "incremental_insert_orders",
    "upsert_customer_balances",
    "group_rollup_brand",
    "group_rollup_supplier",
    "window_running_total",
    "events_tumbling_hourly",
    "rollup_grouping_sets",
    "set_ops_intersect_except",
    "events_json_extract",
    "window_rank_top3_per_priority",
    "rollup_cube_status_priority",
    "regex_extract_long_words",
    "array_higher_order_fns",
    "events_sliding_30m15m",
    # ---- window boundary (slot 50) — below rotates in next round --------
    "sql_gateway_rollup",
    "window_moving_avg",
    "window_ntile_quartiles",
    "projection_rename",
    "filter_predicate",
    "derived_measure",
    "cast_and_dateparts",
    "date_id_smart_key",
    "date_dim_generate",
    "union_distinct_nations",
    "dim_fk_resolve",
    "distinct_count_customers",
    "count_probe",
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

    _reorder()
