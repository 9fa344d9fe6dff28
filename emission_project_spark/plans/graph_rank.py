"""Graph-rank queries: PageRank over engine-built co-occurrence graphs.

The reference has no graph surface; this is part of the LLM-pipeline
extension set — link-analysis rank is the classic corpus-quality prior
(crawl pipelines rank hosts before sampling), and the co-purchase graph
is this schema's data-sized stand-in for a link graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.operators.pagerank import pagerank
from emission_project_spark.plans.registry import register


def _rk_sql(k: int) -> str:
    """One PageRank iteration as a CTE (symmetric graph: every node has
    in-edges, so no teleport-floor branch is needed in the oracle)."""
    return f"""
    r{k} AS (
        SELECT e.dst AS node, 0.15 + 0.85 * sum(r{k - 1}.r / d.deg) AS r
        FROM edges e
        JOIN r{k - 1} ON r{k - 1}.node = e.src
        JOIN deg d    ON d.src = e.src
        GROUP BY e.dst
    )"""


# --- PageRank on the part co-purchase graph: nodes = parts, edges =
# "bought in the same order" (distinct, symmetrized), 5 synchronous
# iterations at damping 0.85 from the uniform start. The oracle states
# the iterations as 5 chained CTEs over the same edge list — exactly
# the synchronous schedule the Spark loop runs — so the two engines
# compute the identical sequence of doubles (per-node sums differ only
# in addition order, ~1e-12 against the 1e-6 rounding grid). The edge
# build is the basket pattern (within-order pair fanout bounded by
# order size, never corpus-quadratic); the per-iteration cost is one
# src-key join + one dst-key aggregate, lineage truncated per round.
@register(
    "graph_pagerank_parts",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL
        SELECT pb AS src, pa AS dst FROM pairs
    ),
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
    ),
    r0 AS (SELECT src AS node, 1.0 AS r FROM deg),
    {",".join(_rk_sql(k) for k in range(1, 6))}
    SELECT r5.node AS p_partkey,
           d.deg AS degree,
           round(r5.r, 6) AS rank
    FROM r5 JOIN deg d ON d.src = r5.node
    """,
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    n = F.size("parts")
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.greatest(n - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .distinct()
    )
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    ranked = pagerank(
        edges, iterations=5, damping=0.85, assume_full_in_edges=True
    )
    return ranked.select(
        F.col("node").alias("p_partkey"),
        "degree",
        F.round("rank", 6).alias("rank"),
    )
