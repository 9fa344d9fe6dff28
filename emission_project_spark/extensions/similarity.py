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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from emission_project_spark.functions.vectors import cosine_similarity

ROUND = 6


def _scored(vectors: DataFrame, query: DataFrame) -> DataFrame:
    """Cross-join vectors against (broadcast) query rows and score.

    r14: spread_input before the map-side scoring pass — a single-row-
    group corpus scan would run every cosine fold on one core (guide
    §2.5); no-op when the scan is already wide."""
    from emission_project_spark.catalog.tables import spread_input

    v = spread_input(vectors).select(
        F.col("vec_id"), F.col("embedding").alias("_emb")
    )
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


def hard_negative_topk(vectors: DataFrame, query: DataFrame, k: int = 8) -> DataFrame:
    """Contrastive hard-negative mining: for each query, the k corpus
    vectors MOST similar by cosine whose ``label`` differs from the
    query's — the near-miss negatives that make a retrieval/embedding
    model train (random negatives are trivially separable; the hard
    ones carry the gradient signal).

    Same plan shape as :func:`brute_force_topk` — broadcast query side,
    one scored pass, per-query top-k window — with the label
    inequality applied BEFORE ranking so the window sees only eligible
    rows. The IVF variants compose the same way for the scale path
    (mine within probed cells); brute force is the audited baseline.
    """
    v = vectors.select(
        "vec_id", F.col("embedding").alias("_emb"), F.col("label").alias("neg_label")
    )
    q = query.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_q_emb"),
        F.col("label").alias("_ql"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("_ql"))
        .select(
            "query_id",
            "vec_id",
            "neg_label",
            F.round(cosine_similarity("_emb", "_q_emb"), ROUND).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "neg_label", "cosine_sim")
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (ties → lowest
    centroid id). Centroids broadcast; one map-side pass."""
    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("_c_emb")
    )
    # r14: spread — the per-vector centroid scoring is map-side on the
    # scan (single-row-group hazard, see _scored); no-op when wide
    from emission_project_spark.catalog.tables import spread_input

    scored = spread_input(vectors.select("vec_id", "embedding")).crossJoin(F.broadcast(c)).select(
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


def ivf_topk_kmeans(
    vectors: DataFrame,
    query: DataFrame,
    n_centroids: int = 8,
    k: int = 10,
    iterations: int = 2,
    n_probe: int = 1,
    train_frac: float | None = None,
    assign_method: str = "expr",
) -> DataFrame:
    """IVF top-k with a k-means coarse quantizer — the production
    variant of ``ivf_topk`` (whose docstring promises exactly this
    upgrade): cells come from fixed-iteration Lloyd centroids
    (extensions/kmeans.py) instead of the first ``n_centroids`` raw
    vectors, so cell populations track the data distribution and
    per-cell candidate counts stay balanced.

    ``n_probe`` searches the query's nearest ``n_probe`` cells
    (L2-ranked, ties by centroid id) — the standard IVF recall knob.
    Everything is deterministic (seeded quantizer, grid-rounded
    means, tie-broken ranks), so the whole operator is SQL-expressible
    and oracle-checked. Scale shape: quantizer = broadcast of
    n_centroids·dim doubles; assignment is map-side; search reads
    ≈ n_probe/n_centroids of the corpus. ``train_frac`` bounds
    quantizer training to a deterministic hash sample
    (kmeans.training_sample) — the 100 TB configuration, where Lloyd
    rounds touch a constant-size sample and only the final assignment
    scans the corpus; recall holds (tests/test_extensions.py).
    """
    from emission_project_spark.extensions.kmeans import (
        _sq_dist,
        assign_clusters,
        assign_clusters_blas,
        lloyd_centroids,
    )

    vecs = vectors.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("e")
    )
    centroids = lloyd_centroids(vecs, n_centroids, iterations, train_frac, assign_method)
    assign = assign_clusters_blas if assign_method == "blas" else assign_clusters
    assigned = assign(vecs, centroids).select("vec_id", "e", "cluster_id")

    q = query.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_q_e"),
    )
    qscored = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "_q_e", "cid", _sq_dist(F.col("_q_e"), F.col("ce")).alias("_qd2")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_qd2").asc(), F.col("cid").asc())
    qcells = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_q_e", "cid")
    )
    cand = assigned.join(
        F.broadcast(qcells),
        (assigned["cluster_id"] == qcells["cid"])
        & (assigned["vec_id"] != qcells["query_id"]),
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("e", "_q_e"), ROUND).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (doc-level dedup by
    embedding): all (a < b) pairs with cosine ≥ threshold.

    Both sides blocked — no driver materialization anywhere. Vectors
    hash into ``n_blocks`` blocks; every unordered block pair (i ≤ j)
    becomes one ``applyInPandas`` group holding block i as the left
    matrix and block j as the right, scored with a single BLAS matmul.
    Exact all-pairs is inherently O(n²) compute, but memory per task is
    two blocks (n/n_blocks × d doubles) and shuffle is n_blocks× the
    input — both tunable, neither driver-bound. Size ``n_blocks`` so a
    block fits an executor core's memory (e.g. 1M×256d ≈ 2 GB total →
    32 blocks ≈ 64 MB per side). The subquadratic sibling for corpus
    scale is ``lsh_neardup_pairs``.
    """
    return _blocked_cosine_pairs(
        vectors.select("vec_id", "embedding"), threshold, n_blocks, group_cols=[]
    )


def _blocked_cosine_pairs(
    src: DataFrame,
    threshold: float,
    n_blocks: int,
    group_cols: list[str],
    chunk_rows: int = 2048,
) -> DataFrame:
    """Block-pair grid kernel shared by exact and cluster-scoped cosine
    pair search. ``src`` carries (vec_id, embedding, *group_cols); pairs
    are only formed WITHIN a group (empty ``group_cols`` = whole input
    is one group), with both sides blocked so no matrix ever
    materializes beyond two blocks per task.
    """
    import numpy as np
    import pandas as pd

    nb = F.lit(n_blocks)
    blocked = src.withColumn("_blk", F.pmod(F.hash("vec_id"), nb))
    base = group_cols + ["vec_id", "embedding"]
    # replicate: block b is the LEFT side of pairs (b, j≥b) and the
    # RIGHT side of pairs (i<b, b) — (b, b) appears once, as left.
    left = blocked.select(
        F.col("_blk").alias("_pi"),
        F.explode(F.sequence(F.col("_blk"), nb - 1)).alias("_pj"),
        F.lit("L").alias("_side"),
        *base,
    )
    right = blocked.filter(F.col("_blk") > 0).select(
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("_pi"),
        F.col("_blk").alias("_pj"),
        F.lit("R").alias("_side"),
        *base,
    )
    n_group = len(group_cols)
    out_prefix = [f"{c} bigint" for c in group_cols]
    schema = ", ".join(out_prefix + ["doc_a bigint", "doc_b bigint", "cosine_sim double"])

    def score_block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        i, j = key[n_group], key[n_group + 1]

        def norm_mat(part: pd.DataFrame):
            ids = part["vec_id"].to_numpy(dtype=np.int64)
            if not len(ids):  # a block-pair whose partner block is empty
                return ids, np.zeros((0, 1))
            mat = np.array(list(part["embedding"]), dtype=np.float64)
            n = np.linalg.norm(mat, axis=1)
            n[n == 0] = np.inf  # zero vectors match nothing
            return ids, mat / n[:, None]

        l_ids, l_mat = norm_mat(pdf[pdf["_side"] == "L"])
        if i == j:
            r_ids, r_mat = l_ids, l_mat
        else:
            r_ids, r_mat = norm_mat(pdf[pdf["_side"] == "R"])
        empty = not len(l_ids) or not len(r_ids)
        if empty:
            a = b = sims_out = []
        else:
            # Chunked GEMM through ONE reused output buffer (round 12).
            # The previous full `l_mat @ r_mat.T` materialized a fresh
            # |L|×|R| float64 matrix per block-pair (1.25 GB at sf10
            # geometry); on this host, FAULTING fresh anon memory is up
            # to 150× slower than writing resident memory (measured
            # 0.01-0.78 GB/s first-touch vs 1.5-1.7 GB/s rewrite —
            # host-level page-fault service, SCALING.md round 12), so
            # the allocation dominated the kernel: a 17-worker
            # standalone repro ran 265 s/rep full vs 29.6 s/rep
            # chunked with bit-identical outputs. Chunking also bounds
            # transient memory to CH×|R|×8 B regardless of block size —
            # the right shape at 100 TB anyway.
            CH = chunk_rows
            buf = np.empty((min(CH, len(l_ids)), len(r_ids)))
            a_parts, b_parts, s_parts = [], [], []
            for s in range(0, len(l_ids), CH):
                e = min(s + CH, len(l_ids))
                sims = buf[: e - s]
                np.dot(l_mat[s:e], r_mat.T, out=sims)
                ai, bi = np.where(sims >= threshold)
                if i == j:
                    # self-block: each unordered pair appears twice →
                    # keep a < b (global row ids, offset by the chunk)
                    keep = l_ids[s + ai] < r_ids[bi]
                    ca, cb = l_ids[s + ai][keep], r_ids[bi][keep]
                else:
                    # cross-block: blocks are disjoint, every pair
                    # appears once — keep all, canonicalize a < b
                    keep = np.ones(len(ai), dtype=bool)
                    ca = np.minimum(l_ids[s + ai], r_ids[bi])
                    cb = np.maximum(l_ids[s + ai], r_ids[bi])
                a_parts.append(ca)
                b_parts.append(cb)
                s_parts.append(np.round(sims[ai, bi][keep], ROUND))
            a = np.concatenate(a_parts)
            b = np.concatenate(b_parts)
            sims_out = np.concatenate(s_parts)
        out = {c: np.full(len(a), key[ix]) for ix, c in enumerate(group_cols)}
        out.update({"doc_a": a, "doc_b": b, "cosine_sim": sims_out})
        return pd.DataFrame(out)

    return (
        left.unionByName(right)
        .groupBy(*group_cols, "_pi", "_pj")
        .applyInPandas(score_block_pair, schema=schema)
    )


def semantic_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 8,
    iterations: int = 2,
    n_blocks: int = 4,
    train_frac: float | None = None,
    assign_method: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means-cluster the
    embedding space (deterministic Lloyd quantizer), then search for
    cosine near-duplicate pairs ONLY within each cluster.

    This is the published recipe for semantic dedup at corpus scale
    (Abbas et al., "SemDeDup"): clustering bounds the quadratic pair
    search to within-cluster blocks, trading recall of cross-cluster
    near-dups (rare by construction) for an n²/C compute bound. The
    within-cluster search reuses the blocked BLAS kernel — grouping
    keys are (cluster, block_i, block_j), so even a giant cluster
    never materializes more than two blocks per task.

    Returns (cluster_id, doc_a, doc_b, cosine_sim); deterministic and
    fully SQL-expressible (Lloyd rounds + within-cluster self-join).
    ``train_frac`` bounds quantizer training to a deterministic hash
    sample (kmeans.training_sample — the 100 TB configuration; default
    full-corpus training is the oracle-checked path).
    """
    from emission_project_spark.extensions.kmeans import (
        assign_clusters,
        assign_clusters_blas,
        lloyd_centroids,
    )

    vecs = vectors.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("e")
    )
    assign = assign_clusters_blas if assign_method == "blas" else assign_clusters
    assigned = assign(
        vecs, lloyd_centroids(vecs, n_clusters, iterations, train_frac, assign_method)
    ).select(
        "vec_id",
        F.col("e").alias("embedding"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )
    return _blocked_cosine_pairs(
        assigned, threshold, n_blocks, group_cols=["cluster_id"]
    ).select("cluster_id", "doc_a", "doc_b", "cosine_sim")


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    max_bucket: int | None = 64,
    dim: int | None = None,
    infer_dim: bool = False,
) -> DataFrame:
    """Approximate (subquadratic) embedding near-dup: random-hyperplane
    LSH — the 100 TB path where exact all-pairs can't run.

    Plane components are derived deterministically from md5(plane, dim)
    so runs are reproducible with no RNG state. Vectors agreeing on all
    sign bits land in one bucket; within-bucket pairs are verified with
    the exact cosine. Recall is tunable via n_planes (fewer planes →
    bigger buckets → higher recall, more compute). Candidate
    generation is a hash-bucket group-by — same shape as minhash LSH.

    ``max_bucket`` (ON BY DEFAULT) skips buckets holding more members
    than the cap: with correlated embeddings one bucket can attract a
    large corpus fraction, and an uncapped ``collect_list`` of full
    embedding structs is both a quadratic pair explosion and an
    executor OOM. A hot bucket means the planes don't separate that
    region — raise n_planes rather than the cap. RETURN CONTRACT under
    the cap: pairs whose only shared bucket is hot are silently absent
    (recall loss, never precision loss — survivors are exact-verified);
    the dropped mass is measurable by aggregating the same signature
    expression to bucket sizes and filtering > max_bucket.

    Pass ``dim`` (the embedding dimensionality — a schema-level fact
    the caller knows): plan construction is then action-free. Probing
    the dimension from the first row launches a Spark job at PLAN-BUILD
    time — fine interactively, wrong inside compile-only tooling or a
    lazily-composed pipeline — so it is opt-in via ``infer_dim=True``
    rather than a silent fallback.
    """
    if dim is None:
        if not infer_dim:
            raise ValueError(
                "lsh_neardup_pairs needs the embedding dimensionality: pass "
                "dim=<n> (keeps plan construction action-free), or opt into "
                "a first-row probe job with infer_dim=True"
            )
        dim = len(vectors.select("embedding").first()[0])
    # deterministic ±1 plane matrix: sign of a hash bit per (plane, dim)
    planes = [
        [
            1.0 if int(_md5_hex(f"{p}:{d}"), 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]
    sig = None
    emb = F.col("embedding")
    for p, plane in enumerate(planes):
        dot_p = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot_p >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << p).cast("long")
        sig = term if sig is None else sig + term
    bucketed = vectors.select("vec_id", "embedding", sig.alias("bucket"))
    if max_bucket:
        # Drop hot buckets BEFORE collecting embedding structs — the
        # count pass carries only (bucket) keys, so the cap is enforced
        # without ever materializing an oversized members array.
        kept = (
            bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("bucket")
        )
        bucketed = bucketed.join(kept, "bucket")
    buckets = bucketed.groupBy("bucket").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("members")
    )
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda x, i: F.transform(
                            F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                ),
                lambda s: s["a"]["vec_id"] != s["b"]["vec_id"],
            )
        ).alias("p")
    )
    scored = pairs.select(
        F.least(F.col("p.a.vec_id"), F.col("p.b.vec_id")).alias("doc_a"),
        F.greatest(F.col("p.a.vec_id"), F.col("p.b.vec_id")).alias("doc_b"),
        F.round(cosine_similarity(F.col("p.a.embedding"), F.col("p.b.embedding")), ROUND).alias(
            "cosine_sim"
        ),
    )
    return scored.filter(F.col("cosine_sim") >= threshold).distinct()


def _md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def centroid_classify(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of the whole corpus:
    per-label mean vector, then every vector assigned to its nearest
    centroid by squared L2 (tie -> smaller label).

    The label-quality audit for an annotated corpus: where kNN
    (:func:`brute_force_topk` + vote) evaluates a handful of query
    rows against all neighbors, this scores EVERY row in one pass —
    labels whose members sit closer to another label's centroid are
    mislabeled or non-separable, and the confusion matrix localizes
    which pairs bleed.

    100 TB shape: centroids are |labels| x dim doubles (reuses the
    k-means grid-rounded elementwise-mean pass, one posexplode hash
    aggregate), broadcast into the same min_by argmin as
    :func:`~emission_project_spark.extensions.kmeans.assign_clusters`
    — the shuffle carries O(n) best-so-far rows, never O(n*labels) —
    with the true label carried through the aggregate so no
    corpus-sized re-attach join is needed.
    """
    from emission_project_spark.extensions.kmeans import (
        _sq_dist,
        recompute_centroids,
    )

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).cast("bigint").alias("true_label"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    cents = recompute_centroids(
        vecs.select(F.col("true_label").alias("cluster_id"), "e")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "d2", _sq_dist(F.col("e"), F.col("ce"))
    )
    best = scored.groupBy("vec_id").agg(
        F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("_best"),
        F.first("true_label").alias("true_label"),
    )
    return best.select(
        "vec_id",
        "true_label",
        F.col("_best.cid").cast("bigint").alias("predicted_label"),
    )


def mmr_rerank(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    pool: int = 30,
    lam: float = 0.7,
    max_collect: int = 10_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from each query's cosine top-``pool`` shortlist, greedily
    select ``k`` items maximizing ``λ·rel − (1−λ)·max_sim_to_selected``
    — the diversified-retrieval step that keeps a near-dup cluster
    from monopolizing a result list (retrieval-augmented sampling and
    eval-set construction both need it).

    Scale shape: the shortlist is the same broadcast-query scored pass
    as ``brute_force_topk``; everything after operates on a
    k-row-bounded pool (≤ pool rows per query, pool² pairwise sims),
    which is collected like the k-means centroid sets — bounded by
    construction, never data-sized. The collect itself is a VALIDATED
    bound, not a convention: the pool relation is fetched through
    ``limit(max_collect + 1)`` and the function raises if the limit is
    hit, so a caller passing a corpus-sized query set gets a loud
    error instead of a silent driver-sized collect. Driver memory is
    bounded IN THE PLAN on both collects: ≤ ``max_collect`` pool rows
    and ≤ ``max_collect·pool`` pairwise-sim rows (the sims relation is
    inherently ~pool× the pool). All relevance/similarity values
    are rounded (ROUND) BEFORE the greedy walk, so the selection
    sequence is reproducible across engines bit-for-bit; ties break to
    the smaller vec_id.
    """
    scored = brute_force_topk(vectors, query, k=pool)
    pool_df = scored.filter(F.col("cosine_sim").isNotNull()).select(
        "query_id", "vec_id", F.col("cosine_sim").alias("rel")
    )
    emb = vectors.select("vec_id", F.col("embedding").alias("_e"))
    pa = pool_df.join(emb, "vec_id").select(
        "query_id", F.col("vec_id").alias("va"), "rel", F.col("_e").alias("ea")
    )
    pb = pool_df.join(emb, "vec_id").select(
        F.col("query_id").alias("qb"), F.col("vec_id").alias("vb"), F.col("_e").alias("eb")
    )
    sims_df = (
        pa.join(
            F.broadcast(pb),
            (pa["query_id"] == pb["qb"]) & (pa["va"] != pb["vb"]),
        )
        .select(
            "query_id",
            "va",
            "vb",
            F.round(cosine_similarity("ea", "eb"), ROUND).alias("sim"),
        )
    )
    # bounded collects: ≤ pool rows and ≤ pool² sims per query — the
    # centroid-collect precedent, never data-sized; limit() puts the
    # bound IN THE PLAN so an oversized query set can't reach the
    # driver before the guard fires
    pool_rows = pool_df.limit(max_collect + 1).collect()
    if len(pool_rows) > max_collect:
        raise ValueError(
            f"mmr_rerank pool relation exceeds max_collect={max_collect} "
            f"rows (n_queries × pool too large) — shrink the query set, "
            f"lower pool={pool}, or raise max_collect explicitly"
        )
    rels: dict = {}
    for r in pool_rows:
        rels.setdefault(r["query_id"], {})[r["vec_id"]] = r["rel"]
    # the sims relation is ~pool× larger than the pool (≤ pool²
    # pairwise sims per query ≤ max_collect·pool rows total) — same
    # in-plan limit+raise discipline, with the proportionally larger
    # bound stated explicitly
    sims_cap = max_collect * pool
    sims_rows = sims_df.limit(sims_cap + 1).collect()
    if len(sims_rows) > sims_cap:
        raise ValueError(
            f"mmr_rerank pairwise-sims relation exceeds "
            f"max_collect*pool={sims_cap} rows — shrink the query set, "
            f"lower pool={pool}, or raise max_collect explicitly"
        )
    sims: dict = {}
    for r in sims_rows:
        sims.setdefault(r["query_id"], {})[(r["va"], r["vb"])] = r["sim"]

    out_rows = []
    for qid in sorted(rels):
        cand = dict(rels[qid])
        ssim = sims.get(qid, {})
        selected: list = []
        for rank in range(1, min(k, len(cand)) + 1):
            best = None
            for vid, rel in cand.items():
                ms = max(
                    (ssim.get((vid, s), 0.0) for s in selected), default=0.0
                )
                score = lam * rel - (1.0 - lam) * ms
                key = (-score, vid)
                if best is None or key < best[0]:
                    best = (key, vid, rel, score)
            _, vid, rel, score = best
            selected.append(vid)
            del cand[vid]
            # floor(x·1e6+0.5)/1e6 — the cross-engine HALF_UP grid (the
            # int8-quantizer precedent): Python round() is HALF_EVEN and
            # disagrees with DuckDB round() on exact .5 boundaries,
            # which crafted round-number corpora actually hit
            out_rows.append(
                (qid, rank, vid, rel, math.floor(score * 1e6 + 0.5) / 1e6)
            )

    spark = vectors.sparkSession
    return spark.createDataFrame(
        out_rows,
        "query_id bigint, mmr_rank int, vec_id bigint, rel double, mmr_score double",
    )
