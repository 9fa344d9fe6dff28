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
# queries. Window policy (round 4): (a) queries with no driver row of
# any kind, (b) the round-3 red rows (NTZ regression, fixed in
# catalog/tables.py), (c) queries last driver-verified in round 1 —
# the 13-query tail that sat below the boundary since round 1, (d)
# rotation of round-2-verified queries, events-consumers first because
# the loader's NTZ normalization changed their input representation
# this round. The 8 round-2 queries that don't fit (below the
# boundary) rotate in next round; everything else has an r3 row.
_PRIORITY: list[str] = [
    # -- (a) no driver row of any kind yet --------------------------------
    "approx_hll_distinct_events",     # rows-only (HLL estimate, no hash oracle)
    "stream_sessionize_batch",        # new round 4: native session windows
    "stream_interval_join_batch",     # r3 err (NTZ) — fixed
    # -- (b) round-3 red row, fixed this round ----------------------------
    "range_join_signup_errors",       # r3 err (NTZ) — fixed
    # -- (c) last verified round 1: the never-rotated tail -----------------
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
    # -- (d) rotation: last verified round 2, events-consumers first -------
    "stream_user_totals_batch",
    "pivot_daily_event_counts",
    "histogram_event_values",
    "window_rolling_10min_mean",
    "events_gapfill_hourly",
    "events_gapfill_ffill",
    "events_funnel_conversion",
    "asof_forward_next_error",
    # -- (d) rotation: last verified round 2, registry order ---------------
    "join_topk_shipping_priority",
    "join_having_large_orders",
    "semi_anti_customers_no_urgent",
    "similarity_ivf_topk",
    "dedup_embedding_cosine",
    "embedding_stats",
    "multimodal_binary_meta",
    "multimodal_extract_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_payload_stats",
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "curation_stratified_sample",
    "curation_length_percentiles",
    "curation_profile_documents",
    "curation_tfidf_top_terms",
    "curation_quality_filter",
    "curation_token_budget",
    "curation_mixture_sample",
    "curation_mixture_report",
    "text_repetition_metrics",
    "text_pii_scrub",
    # ---- window boundary (slot 50) — below rotates in next round --------
    "text_decontaminate_overlap",
    "text_url_extract",
    "text_corpus_top_terms",
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "curation_pack_sequences",
    "curation_truncate_tokens",
    "curation_final_corpus",
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
