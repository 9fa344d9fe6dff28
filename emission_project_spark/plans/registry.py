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


# The driver's correctness artifact covers the first N registered queries
# (round 1 capped at 50). Highest-value queries must therefore register
# first: the LLM-pipeline capstones that had no driver row in round 1,
# the queries fixed/added this round, then everything that already has a
# green round-1 driver row (those re-verify only if slots remain).
_PRIORITY: list[str] = [
    # -- the end-to-end curated-corpus composition -----------------------
    "curation_final_corpus",
    # -- capstones with no round-1 driver row ----------------------------
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "curation_stratified_sample",
    "curation_length_percentiles",
    "curation_profile_documents",
    "curation_tfidf_top_terms",
    "curation_quality_filter",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "dedup_embedding_cosine",
    "dedup_semantic_pairs",
    "dedup_embedding_cosine_lsh",
    "embedding_stats",
    "embedding_kmeans_lloyd",
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "multimodal_binary_meta",
    "multimodal_extract_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    # -- fixed round 2 (array column -> scalar quantiles) ----------------
    "approx_aggregates_events",
    # -- new round-2 queries ---------------------------------------------
    "fk_orphan_check",
    "stream_user_totals_batch",
    "text_repetition_metrics",
    "text_pii_scrub",
    "text_decontaminate_overlap",
    "pivot_daily_event_counts",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "curation_token_budget",
    "curation_mixture_sample",
    "embedding_cluster_quality",
    "join_topk_shipping_priority",
    "join_having_large_orders",
    "text_url_extract",
    "histogram_event_values",
    "window_rolling_10min_mean",
    "events_gapfill_hourly",
    "events_funnel_conversion",
    "curation_truncate_tokens",
    "text_corpus_top_terms",
    "curation_mixture_report",
    "sketch_count_min_terms",
    "sketch_bloom_prefilter",
    "curation_pack_sequences",
    "semi_anti_customers_no_urgent",
    "multimodal_payload_stats",
    "asof_forward_next_error",
    "events_gapfill_ffill",
    "curation_cluster_quality_join",
    # -- round-1 green, most complex first: re-verify while slots remain -
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
