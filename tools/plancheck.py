"""Physical-plan audit over every registered query.

Compiles each query (no execution) at the given sf_dir and inspects the
Catalyst physical plan for 100 TB red flags:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` on non-trivial
  inputs (a deliberate 1-row scalar cross join is allowed and
  allowlisted below);
- shuffle (``Exchange``) counts per query, to spot plans that reshuffle
  more than their operator semantics require;
- parquet scans with no pushed filters in queries that filter.

Prints one line per query: shuffles, joins by strategy, flags. Exits
nonzero if a disallowed cartesian appears. Usage:

    python tools/plancheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries that intentionally cross-join a 1-row aggregate (scalar
# broadcast) or a tiny constant relation — nested-loop there is correct
SCALAR_CROSS_OK = {
    "count_probe",                # combines three 1-row count aggregates
    "curation_tfidf_top_terms",   # 1-row corpus-size N
    "similarity_bruteforce_topk",  # query set × corpus is the baseline's semantics
    "similarity_ivf_topk",         # centroid table is k rows
    "embedding_kmeans_lloyd",      # k-centroid broadcast
    "dedup_embedding_cosine",      # all-pairs baseline (LSH variant is the scale path)
    "dedup_embedding_cosine_lsh",
    "similarity_ivf_kmeans_topk",  # Lloyd rounds: k-centroid broadcast per assignment
    "similarity_ivfpq_topk",       # coarse + per-subspace Lloyd: k-centroid broadcasts
    "similarity_ivfpq_rerank_topk",  # same IVF-PQ stage-1; refine adds broadcasts only
    "dedup_semantic_pairs",        # same Lloyd quantizer feeds the cluster key
    "embedding_cluster_quality",   # Lloyd rounds again (k-centroid broadcast)
    "curation_mixture_report",     # 1-row corpus token total
    "curation_cluster_quality_join",  # Lloyd rounds (k-centroid broadcast)
    "text_unigram_logprob",           # 1-row corpus token total
    "curation_temperature_weights",   # 1-row mixture normalizer
    "similarity_hard_negatives",      # query set × corpus, the mining baseline
    "text_bm25_search",               # 1-row corpus (N, avgdl) stats
    "join_q22_idle_balance_customers",  # 1-row balance-average scalar
    "skew_key_profile_lineitem",        # 1-row avg-count scalar vs key counts
    "basket_part_pairs_lift",           # 1-row order-count normalizer
    "similarity_knn_classify",          # query set × corpus (brute-force source)
    "join_q11_important_stock",         # 1-row global-total scalar
    "join_q15_top_supplier",            # 1-row max-revenue scalar
    "curation_dsir_weights",            # 1-row LM-totals scalar
    "text_bigram_perplexity",           # 1-row corpus token total
    "events_funnel_3step",              # 1-row × 1-row funnel report
    "graph_hits_part_authority",        # 1-row max normalizer per half-step
    "embedding_norm_outliers",          # 1-row median + MAD scalars
    "similarity_centroid_confusion",    # |labels|-row centroid broadcast
    "sketch_f2_selfjoin_events",        # 1-row exact × 1-row estimate
    "curation_dsir_ess",                # 1-row LM totals + 1-row max-shift scalar
    "dedup_lsh_quality",                # 1-row candidate agg × 1-row truth agg
    "graph_triangle_stats",             # 1-row census agg × 1-row triangle count
    "text_pmi_collocations",            # 1-row token total × 1-row bigram total
    "stats_benford_first_digit",        # 1-row grand-total scalar
    "similarity_range_search",          # query set × corpus, the radius baseline
    "events_rfm_segments",              # 1-row corpus-clock scalar
    "events_kaplan_meier",              # 1-row corpus-clock + 1-row risk total
    "stats_mutual_info_priority_segment",  # 1-row contingency grand total
    "stats_poisson_bootstrap_ci",       # 1-row point estimate × 1-row CI agg
    "stats_cramers_v_priority_segment",  # 1-row contingency grand total
    "stats_chi2_segment_priority",      # 1-row contingency grand total
    "text_hash_feature_buckets",        # 1-row corpus token total
    "stats_cohens_kappa",               # 1-row totals × 1-row marginal mass (cells ≤25 rows)
    "stats_jensen_shannon",             # 1-row (n_click, n_view) totals over ≤11 bins
    "stats_lorenz_deciles",             # 1-row grand-total revenue scalar
    "stats_theil_index",                # 1-row (n, Σx) + 1-row excluded-count scalars
    "text_heaps_law",                   # 1-row Heaps-β fit over the 10-row curve
    "stats_permutation_pvalue",         # 1-row observed-diff scalar vs 199 replicate rows
    "events_mann_kendall_trend",        # 1-row S × 1-row n × 1-row tie-correction scalars
    "text_source_diversity",            # 1-row (n_docs, k) totals over the source counts
    "text_kneser_ney_bigrams",          # 1-row bigram-type total T
    "embedding_hubness_stats",          # corpus × corpus kNN baseline (IVF is the scale path) + 1-row skew
    "stats_brown_forsythe",             # 1-row (N, ΣZ, k) totals scalar
    "events_dau_mau_stickiness",        # day-grid × user-day trailing-window range join (time-grain bounded)
    "privacy_t_closeness_customers",    # 1-row global-count scalar (the sibling gates' shape)
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from emission_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("plancheck")
    spark.sparkContext.setLogLevel("ERROR")
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    failures: list[str] = []
    for name, fn in sorted(entrymod.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(explain_mode)
        except Exception as exc:  # compile error is itself a finding
            failures.append(f"{name}: failed to plan: {exc}")
            print(f"✗ {name}: PLAN ERROR {exc}")
            continue

        shuffles = len(re.findall(r"\bExchange\b", plan))
        joins: dict[str, int] = {}
        for kind in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        ):
            n = len(re.findall(rf"\b{kind}\b", plan))
            if n:
                joins[kind] = n

        flags = []
        if ("CartesianProduct" in joins or "BroadcastNestedLoopJoin" in joins) and (
            name not in SCALAR_CROSS_OK
        ):
            flags.append("CARTESIAN")
            failures.append(f"{name}: unexpected cartesian/nested-loop join")
        if shuffles > 6:
            flags.append(f"MANY_SHUFFLES({shuffles})")

        join_str = ",".join(f"{k}×{v}" for k, v in joins.items()) or "-"
        flag_str = " ".join(flags)
        mark = "✗" if "CARTESIAN" in flags else "✓"
        print(f"{mark} {name}: shuffles={shuffles} joins={join_str} {flag_str}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FLAGGED")
        sys.exit(1)
    print("\nPLANS CLEAN")


if __name__ == "__main__":
    main()
