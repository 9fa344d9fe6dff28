"""Round-8 batch: retrieval-eval metrics, agreement/association stats,
concentration curves, arrival-process stats, vocabulary growth, a
fixed-matrix PCA projection, pHash near-dup pairs, and the streaming-
attribution batch twin.

Why these: a training-data pipeline doesn't just BUILD indexes and
filters — it has to GRADE them. recall@k / NDCG@k grade the ANN ladder
against exact ground truth; ROC-AUC / calibration grade quality
classifiers; kappa grades two labelers against each other; JS
divergence and Lorenz/Theil grade mixture drift and source
concentration; Heaps' law grades corpus vocabulary growth (dedup
health at a glance: a flat curve means you're re-crawling the same
pages). All are single-pass or bounded-pool DataFrame plans.

House determinism rules apply throughout: every ranking carries a full
(metric, id) tie-break; scores are round(6)-ed BEFORE ranks are taken;
order-sensitive float sums either fold over exact-integer aggregates
(decimal/HUGEINT) or are round(6)-ed where ulp noise is provably below
the grid; no per-row Python UDFs (the one Arrow `mapInPandas` here is
the pHash decode, which is the multimodal kit's existing surface).

Reference provenance: the reference pipeline (emission-dag.py) has no
eval surface at all — these extend the engine along the LLM-pipeline
axis the build brief names first-class.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.functions.text import LANG_MARKERS
from emission_project_spark.functions.vectors import dot, l2_norm
from emission_project_spark.plans.registry import register

# the strong (support >= 2) co-purchase pair CTE shared with the
# affinity family - single source of truth for the graph shape
from emission_project_spark.plans.affinity_ops import _PAIRS_SQL as _AFF_PAIRS_SQL

_AFFINITY_PAIRS_STRONG_SQL = _AFF_PAIRS_SQL.replace(
    "GROUP BY 1, 2", "GROUP BY 1, 2 HAVING count(*) >= 2"
)
# a reformat of _PAIRS_SQL would make the replace() a silent no-op,
# leaving the oracle on the weak (support>=1) graph while the Spark
# side keeps min_support=2 — fail at import instead of at the parity
# sweep
assert "HAVING count(*) >= 2" in _AFFINITY_PAIRS_STRONG_SQL, (
    "_PAIRS_SQL no longer contains the 'GROUP BY 1, 2' anchor the "
    "strong-graph HAVING splice targets"
)

_K = 10
_N_QUERIES = 20
_TRUNC_DIM = 16
# hubness cell_topk GEMM chunk rows (module-level so the chunk-tail
# buffer-reuse path is pinnable by a small-chunk invariance test; the
# production value only engages above 2048 rows per cell ≈ sf10)
_CELL_CHUNK = 2048
# hubness sharded-assignment: max centroid slices per mapInPandas pass
# (closure ceiling ≈ 64 × cap × dim × 8 B); above it the fold chains
# additional corpus passes instead of raising (round 13, r12 verdict
# task #7). Module-level so a tiny-group test can pin the multi-pass
# path against the flat argmax.
_SHARD_GROUP = 64

# full-precision scored CTE shared by the eval queries (the
# similarity_bruteforce_topk oracle shape: zero-norm guard to NULL,
# round BEFORE rank, (sim DESC, vec_id) tie-break)
_SCORED_SQL = f"""
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               CASE WHEN list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]) > 0
                         AND list_dot_product(q.qe, q.qe) > 0
                    THEN round(list_cosine_similarity(v.embedding::DOUBLE[], q.qe), 6)
               END AS full_sim,
               CASE WHEN list_dot_product((v.embedding::DOUBLE[])[1:{_TRUNC_DIM}], (v.embedding::DOUBLE[])[1:{_TRUNC_DIM}]) > 0
                         AND list_dot_product(q.qe[1:{_TRUNC_DIM}], q.qe[1:{_TRUNC_DIM}]) > 0
                    THEN round(list_cosine_similarity((v.embedding::DOUBLE[])[1:{_TRUNC_DIM}], q.qe[1:{_TRUNC_DIM}]), 6)
               END AS trunc_sim
        FROM embeddings v CROSS JOIN q
        WHERE v.vec_id <> q.query_id
    ),
    gt AS (
        SELECT query_id, vec_id, full_sim,
               row_number() OVER (PARTITION BY query_id
                    ORDER BY full_sim DESC, vec_id) AS r
        FROM scored QUALIFY r <= {_K}
    ),
    ap AS (
        SELECT query_id, vec_id, full_sim,
               row_number() OVER (PARTITION BY query_id
                    ORDER BY trunc_sim DESC, vec_id) AS r
        FROM scored QUALIFY r <= {_K}
    )
"""


def _scored_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, full_sim, trunc_sim) — ONE broadcast-query
    map-side pass scores both the full vector and its matryoshka
    prefix; no shuffle until the per-query top-k windows."""
    emb = load_table(spark, sf_dir, "embeddings")
    # r13 opt (guide §1.2 "per-task work"): the norms and the truncated
    # slice are per-ROW invariants — computing them inside the pair
    # expression re-ran two l2 folds and two array slices per (vector,
    # query) PAIR (interpreted higher-order functions, the hot term of
    # this plan). Hoisting them below the cross join evaluates each
    # once per row; the pair expression keeps the identical sequential
    # dot fold and the identical n = ||a||·||b|| product, so every
    # double is bit-equal to the old cosine_similarity() form (norm
    # product, division, round — same ops, same order).
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_q"),
        F.slice("embedding", 1, _TRUNC_DIM).alias("_qt"),
        l2_norm("embedding").alias("_nq"),
        l2_norm(F.slice("embedding", 1, _TRUNC_DIM)).alias("_nqt"),
    )
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("_e"),
        F.slice("embedding", 1, _TRUNC_DIM).alias("_et"),
        l2_norm("embedding").alias("_ne"),
        l2_norm(F.slice("embedding", 1, _TRUNC_DIM)).alias("_net"),
    )
    full_n = F.col("_ne") * F.col("_nq")
    trunc_n = F.col("_net") * F.col("_nqt")
    return (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(F.when(full_n > 0, dot("_e", "_q") / full_n), 6).alias(
                "full_sim"
            ),
            F.round(F.when(trunc_n > 0, dot("_et", "_qt") / trunc_n), 6).alias(
                "trunc_sim"
            ),
        )
    )


def _topk(scored: DataFrame, by: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col(by).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _K)
        .select("query_id", "vec_id", "full_sim", "r")
    )


# --- recall@k of the matryoshka-truncated ranking (first 16 of 64
# dims) against the exact full-dimension top-k — THE acceptance metric
# for any ANN/compression tier before it ships (Kusupati et al. 2022
# evaluate truncated representations exactly this way). At 100 TB the
# ground truth comes from a sampled query set (here: vec_id < 20) and
# the same one-pass dual scoring; the expensive side is the exact
# ranking you're grading against, which is why it's sampled.
@register(
    "similarity_recall_at_k",
    oracle=f"""
    WITH {_SCORED_SQL}
    SELECT g.query_id,
           CAST(count(a.vec_id) AS BIGINT) AS n_hits,
           round(count(a.vec_id) / {_K}.0, 6) AS recall
    FROM gt g LEFT JOIN ap a
      ON a.query_id = g.query_id AND a.vec_id = g.vec_id
    GROUP BY g.query_id
    """,
)
def similarity_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_both(spark, sf_dir).localCheckpoint(eager=False)
    gt = _topk(scored, "full_sim")
    ap = _topk(scored, "trunc_sim").select(
        F.col("query_id").alias("aq"), F.col("vec_id").alias("av")
    )
    return (
        gt.join(
            ap,
            (gt["query_id"] == ap["aq"]) & (gt["vec_id"] == ap["av"]),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("av").alias("n_hits"),
            F.round(F.count("av") / float(_K), 6).alias("recall"),
        )
    )


# --- NDCG@k of the truncated ranking, gains from the EXACT cosine
# (graded relevance, shifted to [0,1] because cosine can be negative
# and DCG needs non-negative gains): DCG = Σ gain/log2(1+rank) over
# the approx list, IDCG = the same sum over the exact list (which is
# optimal for this gain by construction), NDCG = DCG/IDCG. ≤10 float
# terms per query — ulp noise orders below the round(6) grid.
@register(
    "similarity_ndcg_at_k",
    oracle=f"""
    WITH {_SCORED_SQL},
    dcg AS (
        SELECT query_id,
               sum((full_sim + 1.0) / 2.0 / log2(1.0 + r)) AS dcg
        FROM ap GROUP BY query_id
    ),
    idcg AS (
        SELECT query_id,
               sum((full_sim + 1.0) / 2.0 / log2(1.0 + r)) AS idcg
        FROM gt GROUP BY query_id
    )
    SELECT d.query_id, round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
           round(d.dcg / NULLIF(i.idcg, 0), 6) AS ndcg
    FROM dcg d JOIN idcg i ON i.query_id = d.query_id
    """,
)
def similarity_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_both(spark, sf_dir).localCheckpoint(eager=False)
    gain = (F.col("full_sim") + 1.0) / 2.0 / F.log2(1.0 + F.col("r"))
    dcg = (
        _topk(scored, "trunc_sim")
        .groupBy("query_id")
        .agg(F.sum(gain).alias("dcg"))
    )
    idcg = (
        _topk(scored, "full_sim")
        .groupBy("query_id")
        .agg(F.sum(gain).alias("idcg"))
        .withColumnRenamed("query_id", "iq")
    )
    return dcg.join(idcg, dcg["query_id"] == idcg["iq"]).select(
        "query_id",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        # try_divide: an all-minimal-gain list (every cosine exactly
        # -1) has IDCG 0 — NDCG undefined, NULL on both engines
        F.round(F.try_divide(F.col("dcg"), F.col("idcg")), 6).alias("ndcg"),
    )


# --- projection onto a FIXED 2-component loading matrix — the
# oracle-checkable half of the PCA surface (the eigendecomposition
# itself lives in extensions/pca.py, numpy-exact pytest-pinned; a
# trained component matrix is deployed as literals exactly like this).
# Loadings are multiples of 1/8 so every literal is binary-exact in
# both engines; the dot is the house sequential fold. Map-side only:
# zero shuffles at any scale.
_PC1 = [((i % 8) - 3.5) * 0.25 for i in range(64)]
_PC2 = [((i // 8) - 3.5) * 0.25 for i in range(64)]


@register(
    "embedding_pca_project",
    oracle=f"""
    WITH w AS (SELECT [{", ".join(repr(v) for v in _PC1)}]::DOUBLE[] AS w1,
                      [{", ".join(repr(v) for v in _PC2)}]::DOUBLE[] AS w2)
    SELECT vec_id, label,
           round(list_dot_product(embedding::DOUBLE[], w.w1), 6) + 0.0 AS pc1,
           round(list_dot_product(embedding::DOUBLE[], w.w2), 6) + 0.0 AS pc2
    FROM embeddings CROSS JOIN w
    """,
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    w1 = F.array(*[F.lit(v) for v in _PC1])
    w2 = F.array(*[F.lit(v) for v in _PC2])
    # + 0.0 normalizes IEEE negative zero: a tiny negative projection
    # rounds to -0.0, whose hash differs from 0.0 across engines
    return emb.select(
        "vec_id",
        "label",
        (F.round(dot("embedding", w1), 6) + 0.0).alias("pc1"),
        (F.round(dot("embedding", w2), 6) + 0.0).alias("pc2"),
    )


# --- ROC-AUC via the rank-sum (Mann-Whitney) identity:
# AUC = (Σ avg-ranks of positives − n⁺(n⁺+1)/2) / (n⁺·n⁻), mid-ranks
# for ties — the standard exact AUC without an O(n²) pair join.
# Positives = purchases, score = event value ("does value predict
# purchase?"). avg-rank = min-rank + (ties−1)/2 sits on the 0.5 grid,
# so the positive-rank sum is exact in doubles and the AUC is pure
# integer arithmetic until the final division. Ranks come from the
# distinct-value cell table via functions/ranks.cell_minrank (two-level
# bucketed prefix sums — NO data-sized single-partition window; the
# round-8 rewrite of the exact-rank family), and the rank-sum folds
# from the cells directly — the fact table is touched exactly once,
# by the groupBy(value) histogram. The oracle keeps the textbook
# global-window form (DuckDB, tiny data).
@register(
    "stats_roc_auc",
    oracle="""
    WITH r AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               rank() OVER (ORDER BY value) AS rmin,
               count(*) OVER (PARTITION BY value) AS ties
        FROM events
    ),
    a AS (
        SELECT sum(y) AS np, sum(1 - y) AS nn,
               sum(CASE WHEN y = 1 THEN rmin + (ties - 1) / 2.0 ELSE 0 END) AS rpos
        FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round((rpos - np * (np + 1) / 2.0) / NULLIF(np * nn, 0), 6) AS auc
    FROM a
    """,
)
def stats_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.ranks import cell_minrank

    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    # r13 opt: cell_minrank consumes its histogram 3× (bounds probe,
    # offsets, main relation) — checkpoint the distinct-value-sized
    # cells so the events scan + aggregate run once, not three times
    cells = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("ties"), F.sum(y).alias("pos")
    ).localCheckpoint(eager=False)
    r = cell_minrank(cells, "value", "ties", out_col="rmin")
    # rank-sum over positives folds from the cells: every positive in a
    # cell carries the same mid-rank rmin + (ties−1)/2
    a = r.agg(
        F.sum("pos").alias("np"),
        F.sum(F.col("ties") - F.col("pos")).alias("nn"),
        F.sum(
            F.col("pos") * (F.col("rmin") + (F.col("ties") - 1) / 2.0)
        ).alias("rpos"),
    )
    return a.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        # try_divide: a single-class corpus (no positives or no
        # negatives) has an undefined AUC — NULL on both engines
        F.round(
            F.try_divide(
                F.col("rpos") - F.col("np") * (F.col("np") + 1) / 2.0,
                F.col("np") * F.col("nn"),
            ),
            6,
        ).alias("auc"),
    )


# --- Spearman rank correlation (quantity vs extended price): Pearson
# on average ranks. Ranks are DOUBLED into exact integers (2·avgrank =
# 2·minrank + ties − 1) and every moment folds as decimal(38,0) /
# HUGEINT, so both engines divide the SAME exact integers — zero
# float-order hazard even at sf1 where Σ(2r)² overflows a bigint.
# Round-9 rewrite of the round-8 global-window plan: each column's
# min-rank comes from its distinct-value histogram via
# functions/ranks.cell_minrank (bucketed prefix sums — the serial
# rank wall this query used to carry is gone), and the cross moment
# Σ rx·ry folds over the PRE-AGGREGATED (quantity, price) pair table
# joined to the two rank maps on their keys — ordinary shuffle joins
# that scale out, never a single-task sort. SF1_HEAVY re-measures
# this query every round to confirm the wall stays gone.
@register(
    "stats_spearman_corr",
    oracle="""
    WITH r AS (
        SELECT 2 * rank() OVER (ORDER BY l_quantity)
                 + count(*) OVER (PARTITION BY l_quantity) - 1 AS rx,
               2 * rank() OVER (ORDER BY l_extendedprice)
                 + count(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
        FROM lineitem
    ),
    m AS (
        SELECT count(*) AS n,
               sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
               sum(CAST(rx AS HUGEINT) * rx) AS sxx,
               sum(CAST(ry AS HUGEINT) * ry) AS syy,
               sum(CAST(rx AS HUGEINT) * ry) AS sxy
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0),
                 6) AS spearman_rho
    FROM m
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.ranks import cell_minrank

    li = load_table(spark, sf_dir, "lineitem")

    # r13 experiment, REVERTED: deriving both per-column histograms
    # from a lazily-checkpointed pair histogram ("one fact scan, not
    # three") measured SLOWER at both SFs (sf0.1 1.92→3.08 s in a
    # 0.2%-steal window, benchdiff norm ×1.79; sf1 fresh-JVM A/B old
    # 11.96 vs new 13.50 s, ranges disjoint — plans/r13/ab/batch2.log).
    # Mechanism: l_extendedprice is near-unique, so the (quantity,
    # price) pair table is FACT-sized — the checkpoint materializes a
    # fact-sized relation, while the "three scans" it saves are cheap
    # 2-column columnar reads feeding tiny aggregates. The narrow-
    # aggregates-only checkpoint rule applies; the 3-scan form stands.
    def rank_map(col: str, out: str) -> DataFrame:
        """value → doubled average rank (exact integer), from the
        column's distinct-value histogram."""
        cells = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        return cell_minrank(cells, col, "cnt").select(
            col,
            (2 * F.col("minrank") + F.col("cnt") - 1)
            .cast("decimal(18,0)")
            .alias(out),
        )

    # moments fold over the pre-aggregated pair table joined to the two
    # rank maps on their value keys — shuffle joins, no global sort
    pairs = li.groupBy("l_quantity", "l_extendedprice").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("c")
    )
    r = pairs.join(rank_map("l_quantity", "rx"), "l_quantity").join(
        rank_map("l_extendedprice", "ry"), "l_extendedprice"
    )
    c = F.col("c")
    m = r.agg(
        F.sum(c).cast("long").alias("n"),
        F.sum(c * F.col("rx")).alias("sx"),
        F.sum(c * F.col("ry")).alias("sy"),
        F.sum(c * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(c * F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(c * F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        # try_divide: a constant column has zero rank variance and an
        # undefined rho — NULL on both engines (NULLIF in the oracle)
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            ),
            6,
        ).alias("spearman_rho"),
    )


# --- Cohen's kappa between the n-gram langid labeler and the stored
# lang column — chance-corrected inter-rater agreement, the honest
# number when one class dominates (plain accuracy flatters a labeler
# that just predicts 'en'). The truth side includes 'zh', which the
# 4-way heuristic can never predict — kappa's marginal product handles
# the asymmetric label sets where accuracy-style readouts silently
# can't. Builds on the same 4-way CASE as text_langid (contract:
# identical prediction on both engines), one confusion-cell aggregate,
# marginals fold from the cells.
_LANGID_CASE = """CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
                   WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
                   WHEN score_es >= score_fr THEN 'es'
                   ELSE 'fr' END"""
_LANG_SCORES_SQL = ", ".join(
    f"CAST(len(list_filter(regexp_extract_all(lower(text), '\\w+'), t -> t IN "
    f"({', '.join(repr(m) for m in markers)}))) AS BIGINT) AS score_{lang}"
    for lang, markers in LANG_MARKERS.items()
)


@register(
    "stats_cohens_kappa",
    oracle=f"""
    WITH s AS (SELECT lang, {_LANG_SCORES_SQL} FROM documents),
    lab AS (SELECT lang AS truth, {_LANGID_CASE} AS pred FROM s),
    cells AS (SELECT truth, pred, count(*) AS n FROM lab GROUP BY 1, 2),
    tot AS (SELECT sum(n) AS nn, sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS agree FROM cells),
    rowm AS (SELECT pred AS l, sum(n) AS npred FROM cells GROUP BY 1),
    colm AS (SELECT truth AS l, sum(n) AS ntruth FROM cells GROUP BY 1),
    pe AS (
        SELECT sum(coalesce(r.npred, 0) * coalesce(c.ntruth, 0)) AS cross_mass
        FROM rowm r FULL OUTER JOIN colm c ON c.l = r.l
    )
    SELECT CAST(tot.nn AS BIGINT) AS n_docs,
           round(CAST(tot.agree AS DOUBLE) / tot.nn, 6) AS p_observed,
           round(CAST(pe.cross_mass AS DOUBLE) / (tot.nn * tot.nn), 6) AS p_expected,
           round((CAST(tot.agree AS DOUBLE) / tot.nn
                  - CAST(pe.cross_mass AS DOUBLE) / (tot.nn * tot.nn))
                 / NULLIF(1.0 - CAST(pe.cross_mass AS DOUBLE) / (tot.nn * tot.nn), 0),
                 6) AS kappa
    FROM tot CROSS JOIN pe
    """,
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import lang_scores

    docs = load_table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    s = docs.select(
        F.col("lang").alias("truth"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    pred = (
        F.when(
            (F.col("score_de") >= F.col("score_en"))
            & (F.col("score_de") >= F.col("score_es"))
            & (F.col("score_de") >= F.col("score_fr")),
            "de",
        )
        .when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr")),
            "en",
        )
        .when(F.col("score_es") >= F.col("score_fr"), "es")
        .otherwise("fr")
    )
    cells = (
        s.select("truth", pred.alias("pred"))
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # ≤25 cells, read by 3 consumers
    )
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.sum(F.when(F.col("truth") == F.col("pred"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
    )
    rowm = cells.groupBy("pred").agg(F.sum("n").alias("npred"))
    colm = cells.groupBy("truth").agg(F.sum("n").alias("ntruth"))
    pe = (
        rowm.join(colm, rowm["pred"] == colm["truth"], "full_outer")
        .select(
            (
                F.coalesce("npred", F.lit(0)) * F.coalesce("ntruth", F.lit(0))
            ).alias("m")
        )
        .agg(F.sum("m").alias("cross_mass"))
    )
    nn = F.col("nn").cast("double")
    po = F.col("agree").cast("double") / nn
    pexp = F.col("cross_mass").cast("double") / (nn * nn)
    return tot.crossJoin(F.broadcast(pe)).select(
        F.col("nn").cast("long").alias("n_docs"),
        F.round(po, 6).alias("p_observed"),
        F.round(pexp, 6).alias("p_expected"),
        # try_divide: two constant raters in full agreement give
        # pe = 1 and an undefined kappa — NULL on both engines
        F.round(F.try_divide(po - pexp, 1.0 - pexp), 6).alias("kappa"),
    )


# --- Jensen-Shannon divergence between the click and view value
# distributions over the PSI bin grid (least(floor(v/50), 9) — the
# stream_psi_drift_batch contract): JSD = ½Σp·ln(2p/(p+q)) +
# ½Σq·ln(2q/(p+q)), zero-mass terms contribute 0 (x·ln x → 0), so
# unlike KL/PSI it needs no epsilon smoothing and is symmetric and
# bounded by ln 2 — the drift number you alert on when bins can be
# empty. ≤11 cells; two filtered aggregates over one binned pass.
@register(
    "stats_jensen_shannon",
    oracle="""
    WITH b AS (
        SELECT event_type, least(CAST(floor(value / 50) AS BIGINT), 9) AS bin
        FROM events WHERE event_type IN ('click', 'view')
    ),
    c AS (
        SELECT bin,
               count(*) FILTER (WHERE event_type = 'click') AS cp,
               count(*) FILTER (WHERE event_type = 'view') AS cq
        FROM b GROUP BY bin
    ),
    t AS (SELECT sum(cp) AS np, sum(cq) AS nq FROM c),
    terms AS (
        SELECT CASE WHEN cp > 0 THEN 0.5 * (CAST(cp AS DOUBLE) / t.np)
                        * ln(2.0 * (CAST(cp AS DOUBLE) / t.np)
                             / (CAST(cp AS DOUBLE) / t.np + CAST(cq AS DOUBLE) / t.nq))
                    ELSE 0 END
             + CASE WHEN cq > 0 THEN 0.5 * (CAST(cq AS DOUBLE) / t.nq)
                        * ln(2.0 * (CAST(cq AS DOUBLE) / t.nq)
                             / (CAST(cp AS DOUBLE) / t.np + CAST(cq AS DOUBLE) / t.nq))
                    ELSE 0 END AS term
        FROM c CROSS JOIN t
    )
    SELECT CAST(t.np AS BIGINT) AS n_click, CAST(t.nq AS BIGINT) AS n_view,
           round((SELECT sum(term) FROM terms), 6) AS js_divergence
    FROM t
    -- one-sided corpus: a divergence needs both samples; zero rows
    -- (not a 0/0 NaN) when either side is absent, on both engines
    WHERE t.np > 0 AND t.nq > 0
    """,
)
def stats_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    b = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias("bin"),
    )
    c = b.groupBy("bin").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("cp"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("cq"),
    )
    # one-sided corpus guard: both samples must be non-empty or the
    # p/q ratios degenerate to 0/0 — emit zero rows instead (oracle
    # mirrors with WHERE np > 0 AND nq > 0)
    t = c.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq")).filter(
        (F.col("np") > 0) & (F.col("nq") > 0)
    )
    p = F.col("cp").cast("double") / F.col("np")
    q = F.col("cq").cast("double") / F.col("nq")
    term = F.when(
        F.col("cp") > 0, 0.5 * p * F.log(2.0 * p / (p + q))
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("cq") > 0, 0.5 * q * F.log(2.0 * q / (p + q))
    ).otherwise(F.lit(0.0))
    return (
        c.crossJoin(F.broadcast(t))
        .select(F.col("np"), F.col("nq"), term.alias("term"))
        .groupBy("np", "nq")
        .agg(F.round(F.sum("term"), 6).alias("js_divergence"))
        .select(
            F.col("np").cast("long").alias("n_click"),
            F.col("nq").cast("long").alias("n_view"),
            "js_divergence",
        )
    )


# --- Lorenz curve at customer-revenue deciles — the shape behind the
# Gini scalar (stats_gini_concentration): which tenth of the customer
# base carries which share of revenue. Zero-order customers are
# INCLUDED at revenue 0 (left join) — excluding them understates
# concentration, the classic Lorenz mistake. Decile boundaries
# tie-broken by (revenue, custkey); the decile is ntile(10) recovered
# from a DISTRIBUTED row position (functions/ranks.row_position +
# ntile_from_position — bit-identical tiling, no user-sized
# single-partition window; round-9 rewrite). The surviving global
# window runs over the 10-row decile table only.
@register(
    "stats_lorenz_deciles",
    oracle="""
    WITH rev AS (
        SELECT c.c_custkey, coalesce(sum(o.o_totalprice), 0) AS x
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    d AS (
        SELECT x, ntile(10) OVER (ORDER BY x, c_custkey) AS decile FROM rev
    ),
    g AS (
        SELECT decile, count(*) AS n_customers, sum(x) AS dec_rev
        FROM d GROUP BY decile
    ),
    t AS (SELECT sum(dec_rev) AS total FROM g)
    SELECT decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(dec_rev, 2) AS decile_revenue,
           round(dec_rev / NULLIF(t.total, 0), 6) AS revenue_share,
           round(sum(dec_rev) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) / NULLIF(t.total, 0), 6) AS cum_revenue_share
    FROM g CROSS JOIN t
    """,
)
def stats_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # r13 opt: rev feeds row_position (which reads it 3×: bounds,
    # offsets, main) plus the n_tot probe — checkpoint the
    # customer-sized aggregate so the join + groupBy run once
    rev = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    from emission_project_spark.functions.ranks import (
        ntile_from_position,
        row_position,
    )

    pos = row_position(
        rev, [F.col("x").asc(), F.col("c_custkey").asc()], F.col("x")
    )
    n_tot = rev.agg(F.count(F.lit(1)).alias("n_tot"))
    d = pos.crossJoin(F.broadcast(n_tot)).select(
        "x",
        ntile_from_position(F.col("i"), F.col("n_tot"), 10).alias("decile"),
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("x").alias("dec_rev")
    )
    t = g.agg(F.sum("dec_rev").alias("total"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.crossJoin(F.broadcast(t)).select(
        "decile",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round("dec_rev", 2).alias("decile_revenue"),
        # try_divide: an all-zero-revenue corpus has no shares to
        # apportion — NULL on both engines (NULLIF in the oracle)
        F.round(F.try_divide(F.col("dec_rev"), F.col("total")), 6).alias(
            "revenue_share"
        ),
        F.round(
            F.try_divide(F.sum("dec_rev").over(w), F.col("total")), 6
        ).alias("cum_revenue_share"),
    )


# --- Theil T index of customer revenue — the decomposable
# concentration scalar (unlike Gini it splits exactly into
# within-group + between-group terms, which is what you want when the
# question is "is the skew inside sources or across them"). T =
# (1/n)·Σ (x/μ)·ln(x/μ) over POSITIVE revenues (ln needs x>0; zero-
# revenue customers are excluded and counted observably). One
# aggregate for (n, Σx), one map-side term pass — no sort at all,
# unlike the Gini/Lorenz pair.
@register(
    "stats_theil_index",
    oracle="""
    WITH rev AS (
        SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1
    ),
    t AS (SELECT count(*) AS n, sum(x) AS sx FROM rev WHERE x > 0),
    ex AS (SELECT count(*) AS n_excluded FROM rev WHERE x <= 0)
    SELECT CAST(t.n AS BIGINT) AS n_customers,
           CAST(ex.n_excluded AS BIGINT) AS n_excluded,
           round((SELECT sum((x / (t.sx / t.n)) * ln(x / (t.sx / t.n)))
                  FROM rev WHERE x > 0) / NULLIF(t.n, 0), 6) AS theil_t
    FROM t CROSS JOIN ex
    """,
)
def stats_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
        .localCheckpoint(eager=False)  # user-sized; read by 3 consumers
    )
    pos = rev.filter(F.col("x") > 0)
    t = pos.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    ex = rev.filter(F.col("x") <= 0).agg(
        F.count(F.lit(1)).alias("n_excluded")
    )
    mu = F.col("sx") / F.col("n")
    terms = pos.crossJoin(F.broadcast(t)).select(
        ((F.col("x") / mu) * F.log(F.col("x") / mu)).alias("term")
    )
    # agg (not groupBy) so an all-excluded corpus still yields the
    # 1-row readout the oracle's scalar CTE produces — NULL theil via
    # try_divide (NULLIF in the oracle), counts stay observable
    th = terms.agg(F.sum("term").alias("st"))
    return (
        th.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(ex))
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.col("n_excluded").cast("long").alias("n_excluded"),
            F.round(F.try_divide(F.col("st"), F.col("n")), 6).alias("theil_t"),
        )
    )


# --- inter-arrival burstiness per event type: gaps between a user's
# consecutive same-type events, then CV = σ/μ and the Goh-Barabási
# burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B≈0 is Poisson traffic,
# B→1 is bursty (bot/scraper signature), B→−1 is a metronome
# (heartbeat). Moments fold as EXACT integer µs sums (decimal(38,0) /
# HUGEINT — Σgap² overflows a bigint at real scales), so both engines
# derive σ and μ from identical integers; the only doubles are the
# final ratios. One window pass + one aggregate.
@register(
    "events_interarrival_burstiness",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(gap_us AS HUGEINT)) AS s,
               sum(CAST(gap_us AS HUGEINT) * gap_us) AS ss
        FROM g WHERE gap_us IS NOT NULL GROUP BY 1
    ),
    d AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS mean_us,
               sqrt(greatest((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                             / (n - 1), 0)) AS sd_us
        FROM m WHERE n >= 2
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           -- HALF_UP grid: mean_us/1e6 is an integer ratio (see
           -- events_bot_score) — round() tie hazard
           floor(mean_us / 1e6 * 1e6 + 0.5) / 1e6 AS mean_gap_s,
           round(sd_us / NULLIF(mean_us, 0), 6) AS cv,
           round((sd_us - mean_us) / NULLIF(sd_us + mean_us, 0), 6) AS burstiness
    FROM d
    """,
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("gap_us").cast("decimal(18,0)")
            * F.col("gap_us").cast("decimal(18,0)")
        ).alias("ss"),
    )
    n = F.col("n").cast("double")
    s, ss = F.col("s").cast("double"), F.col("ss").cast("double")
    mean_us = s / n
    sd_us = F.sqrt(F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0)))
    return m.filter(F.col("n") >= 2).select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        # HALF_UP grid — the events_bot_score tie precedent
        (F.floor(mean_us / 1e6 * 1e6 + 0.5) / 1e6).alias("mean_gap_s"),
        # try_divide: all-identical timestamps make every gap 0 —
        # mean = sd = 0, CV/B undefined, NULL on both engines
        F.round(F.try_divide(sd_us, mean_us), 6).alias("cv"),
        F.round(F.try_divide(sd_us - mean_us, sd_us + mean_us), 6).alias(
            "burstiness"
        ),
    )


# --- Heaps'-law vocabulary growth: cumulative distinct token types vs
# cumulative tokens at 10 corpus checkpoints (docs in doc_id order),
# plus the fitted Heaps exponent β from the log-log regression over
# the checkpoints (V ≈ k·nᵝ, β<1 always; a β collapsing toward 0 means
# the crawl is re-reading the same pages — the corpus-health readout
# dedup teams watch). A token's first occurrence is min(doc_id) — one
# token-level aggregate, never a per-checkpoint rescan; checkpoints
# are doc deciles (ntile over doc_id).
@register(
    "text_heaps_law",
    oracle="""
    WITH db AS (
        SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket,
               len(regexp_extract_all(lower(text), '\\w+')) AS n_toks
        FROM documents
    ),
    firsts AS (
        SELECT min(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
              FROM documents)
        GROUP BY tok
    ),
    newt AS (
        SELECT db.bucket, count(*) AS new_types
        FROM firsts JOIN db ON db.doc_id = firsts.first_doc
        GROUP BY 1
    ),
    curve AS (
        SELECT b.bucket,
               CAST(sum(b.n_docs) OVER w AS BIGINT) AS n_docs_cum,
               CAST(sum(b.toks) OVER w AS BIGINT) AS n_tokens_cum,
               CAST(sum(coalesce(nt.new_types, 0)) OVER w AS BIGINT) AS vocab_cum
        FROM (SELECT bucket, count(*) AS n_docs, sum(n_toks) AS toks
              FROM db GROUP BY 1) b
        LEFT JOIN newt nt ON nt.bucket = b.bucket
        WINDOW w AS (ORDER BY b.bucket ROWS UNBOUNDED PRECEDING)
    ),
    fit AS (
        -- only positive checkpoints enter the log-log fit: Spark
        -- ln(0) is NULL (silently dropped by sum) while DuckDB's is
        -- -inf — the Kaplan-Meier trap class; NULLIF guards the
        -- single-checkpoint / constant-curve denominator
        SELECT (count(*) * sum(ln(n_tokens_cum) * ln(vocab_cum))
                - sum(ln(n_tokens_cum)) * sum(ln(vocab_cum)))
               / NULLIF(count(*) * sum(ln(n_tokens_cum) * ln(n_tokens_cum))
                  - sum(ln(n_tokens_cum)) * sum(ln(n_tokens_cum)), 0) AS beta
        FROM curve WHERE n_tokens_cum > 0 AND vocab_cum > 0
    )
    SELECT bucket, n_docs_cum, n_tokens_cum, vocab_cum,
           round(fit.beta, 6) AS heaps_beta
    FROM curve CROSS JOIN fit
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import tokens

    from emission_project_spark.functions.ranks import (
        ntile_from_position,
        row_position,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ntile(10) over doc_id, recovered from a distributed row position
    # (bucketed prefix sums) — no corpus-sized single-partition window.
    # The rank machinery sees ONLY the 8-byte doc_id column; the text
    # column joins back afterwards so document bodies never ride the
    # bucket-assignment broadcast join
    pos = row_position(
        docs.select("doc_id"), [F.col("doc_id").asc()], F.col("doc_id")
    )
    n_tot = docs.agg(F.count(F.lit(1)).alias("n_tot"))
    tiles = pos.crossJoin(F.broadcast(n_tot)).select(
        F.col("doc_id").alias("td"),
        ntile_from_position(F.col("i"), F.col("n_tot"), 10).alias("bucket"),
    )
    db = (
        docs.join(tiles, docs["doc_id"] == tiles["td"])
        .select(
            "doc_id",
            "bucket",
            F.size(tokens(F.lower(F.col("text")))).alias("n_toks"),
        )
        .localCheckpoint(eager=False)  # doc-sized; read by 2 consumers
    )
    firsts = (
        docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    newt = (
        firsts.join(db, firsts["first_doc"] == db["doc_id"])
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
        .withColumnRenamed("bucket", "nb")
    )
    per_bucket = db.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("toks")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_bucket.join(newt, per_bucket["bucket"] == newt["nb"], "left")
        .select(
            "bucket",
            F.sum("n_docs").over(w).cast("long").alias("n_docs_cum"),
            F.sum("toks").over(w).cast("long").alias("n_tokens_cum"),
            F.sum(F.coalesce("new_types", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("vocab_cum"),
        )
        .localCheckpoint(eager=False)  # 10 rows; read by the fit + output
    )
    lx, ly = F.log("n_tokens_cum"), F.log("vocab_cum")
    # positive checkpoints only (Spark ln(0)=NULL vs DuckDB -inf — the
    # KM trap class); try_divide guards the constant-curve denominator
    fit = curve.filter(
        (F.col("n_tokens_cum") > 0) & (F.col("vocab_cum") > 0)
    ).agg(
        F.try_divide(
            F.count(F.lit(1)) * F.sum(lx * ly) - F.sum(lx) * F.sum(ly),
            F.count(F.lit(1)) * F.sum(lx * lx) - F.sum(lx) * F.sum(lx),
        ).alias("beta")
    )
    return curve.crossJoin(F.broadcast(fit)).select(
        "bucket",
        "n_docs_cum",
        "n_tokens_cum",
        "vocab_cum",
        F.round("beta", 6).alias("heaps_beta"),
    )


# --- pHash (aHash) closest candidate pairs over the deterministic
# stub decoder — the multimodal dedup surface promoted from
# pytest-only to the driver ledger. The Spark side runs the REAL kit
# end-to-end (attach_payload → Arrow mapInPandas perceptual_hash →
# banded pigeonhole candidate-gen, extensions/multimodal.py); the
# readout is the 25 CLOSEST candidates by (hamming, doc_a, doc_b)
# with the ≤3-bit near-dup verdict as a flag — informative at every
# SF where a bare threshold filter would return zero rows. The oracle
# replays the stub's arithmetic in SQL: grid[i] = byte[(i·n)//64] of
# the payload (documents.text is ASCII in this corpus, so byte ==
# char and ascii(substring(...)) IS the byte), bit i set iff
# grid[i] > mean (mean = Σ/64.0 is exact — /64 is a power of two),
# signed-64 wrap, 4×16-bit bands, same-band-value buckets capped at
# 256, exact bit_count(xor) on candidates only. Swapping gray8x8_fake
# for the PIL path changes ONLY the grid function — the plan shape is
# identical.
@register(
    "multimodal_phash_pairs",
    oracle="""
    WITH pay AS (SELECT doc_id, text, length(text) AS n FROM documents),
    grid AS (
        SELECT doc_id, i.i,
               ascii(substring(text, CAST((i.i * n) // 64 AS INT) + 1, 1)) AS v
        FROM pay CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
    ),
    mean_g AS (SELECT doc_id, sum(v) / 64.0 AS mn FROM grid GROUP BY 1),
    h AS (
        SELECT g.doc_id,
               sum(CASE WHEN g.v > m.mn
                        THEN CAST(1 AS HUGEINT) << g.i ELSE 0 END) AS hu
        FROM grid g JOIN mean_g m ON m.doc_id = g.doc_id
        GROUP BY 1
    ),
    ph AS (
        SELECT doc_id, hu,
               CAST(CASE WHEN hu >= CAST(1 AS HUGEINT) << 63
                         THEN hu - (CAST(1 AS HUGEINT) << 64)
                         ELSE hu END AS BIGINT) AS phash
        FROM h
    ),
    banded AS (
        SELECT doc_id, phash, b.b AS band,
               CAST((hu >> (16 * b.b)) & 65535 AS INT) AS val
        FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    ),
    buckets AS (
        SELECT band, val, count(*) AS sz FROM banded GROUP BY 1, 2
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
               bit_count(xor(a.phash, c.phash)) AS hamming
        FROM banded a
        JOIN banded c ON c.band = a.band AND c.val = a.val
                      AND c.doc_id > a.doc_id
        JOIN buckets k ON k.band = a.band AND k.val = a.val
        WHERE k.sz BETWEEN 2 AND 256
    )
    SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming,
           (hamming <= 3) AS near_dup
    FROM pairs
    ORDER BY hamming, doc_a, doc_b
    LIMIT 25
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.extensions.multimodal import (
        attach_payload,
        gray8x8_fake,
        perceptual_hash,
        phash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    hashes = perceptual_hash(attach_payload(docs), grid_fn=gray8x8_fake)
    pairs = phash_candidate_pairs(hashes, bands=4, max_bucket=256)
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.col("hamming").cast("int").alias("hamming"),
            (F.col("hamming") <= 3).alias("near_dup"),
        )
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(25)
    )


# --- batch twin of streaming/stateful.py::last_touch_attribution —
# the sixth streaming/batch pairing on the driver ledger (alongside
# user totals, dedup, interval join, sessionize, PSI). The streaming
# operator's per-purchase emissions, grouped by channel, equal exactly
# this aggregate over ordered bounded input
# (tests/test_streaming.py pins the micro-batch path against it); the
# plan is the same one window pass as events_attribution_last_touch.
@register(
    "stream_attribution_batch",
    oracle="""
    WITH t AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM events
    )
    SELECT coalesce(touch, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS attributed_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def stream_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.plans.affinity_ops import (
        events_attribution_last_touch,
    )

    return events_attribution_last_touch(spark, sf_dir)


# --- randomization (permutation-style) test for the click-vs-view
# mean-value difference: B=199 md5-seeded Bernoulli relabelings (the
# Poisson-bootstrap recipe at cohort_stats.py:330 — deterministic,
# mergeable, map-side ×B expansion, NO data-sized resampling pass) and
# the rank of |observed| among |replicate| diffs. Every mean is a
# ratio of EXACT decimal(18,2)/sum integers, so the >= comparisons
# that decide the p-value are bit-identical across engines — a float-
# order hazard would corrupt exactly the boundary replicates that
# decide significance. Replicates with an empty side drop observably
# via HAVING (P ≈ 0 at any real size).
# Perf (measured): the first build hashed md5 once per (row, b) —
# 199 full hashes per row, 9.9 s at sf0.1. The flip bits are just
# bits, so TWO md5s per row supply all 199: replicate b reads bit
# (b mod 128) of hash (b div 128) — hex nibble b//4, bit b%4 —
# and the ×B expansion carries only a 1-hex-char conv. Same
# statistical contract, ~99% fewer hash invocations.
@register(
    "stats_permutation_pvalue",
    oracle="""
    WITH rows_ AS (
        SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type IN ('click', 'view')
    ),
    obs AS (
        SELECT CAST(sum(v) FILTER (WHERE event_type = 'click') AS DOUBLE)
                 / count(*) FILTER (WHERE event_type = 'click')
               - CAST(sum(v) FILTER (WHERE event_type = 'view') AS DOUBLE)
                 / count(*) FILTER (WHERE event_type = 'view') AS d_obs,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
        FROM rows_
    ),
    hashed AS (
        SELECT v,
               md5(CAST(event_id AS VARCHAR) || '-p0') AS h0,
               md5(CAST(event_id AS VARCHAR) || '-p1') AS h1
        FROM rows_
    ),
    reps AS (
        SELECT b.b, hashed.v,
               (('0x' || substring(CASE WHEN b.b < 128 THEN h0 ELSE h1 END,
                                   CAST((b.b % 128) // 4 AS INT) + 1, 1))::INT
                >> CAST(b.b % 4 AS INT)) & 1 AS g
        FROM hashed
        CROSS JOIN (SELECT unnest(generate_series(0, 198)) AS b) b
    ),
    rmeans AS (
        SELECT b,
               CAST(sum(v) FILTER (WHERE g = 0) AS DOUBLE)
                 / count(*) FILTER (WHERE g = 0)
               - CAST(sum(v) FILTER (WHERE g = 1) AS DOUBLE)
                 / count(*) FILTER (WHERE g = 1) AS d
        FROM reps GROUP BY b
        HAVING count(*) FILTER (WHERE g = 0) > 0
           AND count(*) FILTER (WHERE g = 1) > 0
    )
    SELECT o.n_click, o.n_view,
           round(o.d_obs, 6) AS observed_diff,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round((1.0 + sum(CASE WHEN abs(r.d) >= abs(o.d_obs) THEN 1 ELSE 0 END))
                 / (count(*) + 1.0), 6) AS p_value
    FROM rmeans r CROSS JOIN obs o
    GROUP BY o.n_click, o.n_view, o.d_obs
    """,
)
def stats_permutation_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9 rewrite (the r8 verdict's cost-to-watch item): the ×199
    # per-bit row expansion is replaced by a ×13 CHUNK expansion — the
    # two md5s pack into 13 16-bit integer chunks per row (computed
    # JVM-side in one codegen'd projection), posexplode lays them out
    # as (k, chunk) rows, and ONE groupBy(k) fold computes all 16
    # bit-sliced (count, Σv·bit) pairs per chunk — 38 output fields,
    # inside the whole-stage-codegen budget (the keyless 404-field
    # variant measured 50 ns/row/agg interpreted; this shape is
    # codegen'd end-to-end). Replicate b maps to (chunk k, shift)
    # replaying the oracle's nibble arithmetic exactly: nibble i = hex
    # char (b%128)//4 of md5(event_id||'-p{b//128}'), bit =
    # (nibble >> (b%4)) & 1; hex char 4k+p sits at bit 4·(3−p) of
    # chunk k. Sums fold on the exact cent grid as LONGs (the
    # decimal(18,2) HALF_UP cast = the oracle's CAST, so ×100 is an
    # exact integer); the decimal sum is rebuilt before the final
    # double division so the float rounding path matches the oracle
    # bit-for-bit. Observed totals ride the k=0 slice of the SAME
    # pass — one corpus scan, 13 mergeable groups, no shuffle of an
    # expanded relation.
    n_reps = 199
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    is_c = F.col("event_type") == "click"
    v = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    h0 = F.md5(F.concat(F.col("event_id").cast("string"), F.lit("-p0")))
    h1 = F.md5(F.concat(F.col("event_id").cast("string"), F.lit("-p1")))

    def chunk(h: F.Column, k: int) -> F.Column:
        """16-bit integer from hex chars 4k+1..4k+4 (1-indexed)."""
        return F.conv(F.substring(h, 4 * k + 1, 4), 16, 10).cast("int")

    chunks = F.array(
        *[chunk(h0, k) for k in range(8)], *[chunk(h1, k) for k in range(5)]
    )
    kd = ev.select(
        v.alias("vc"),
        is_c.alias("is_c"),
        F.posexplode(chunks).alias("k", "ch"),
    )
    aggs = [
        # observed-stat totals, read off the k=0 slice
        F.count(F.lit(1)).alias("cnt"),
        F.sum("vc").alias("sv"),
        F.sum(F.when(F.col("is_c"), 1).otherwise(0)).alias("cc"),
        F.sum(F.when(F.col("is_c"), F.col("vc")).otherwise(0)).alias("sc"),
    ]
    for j in range(16):
        gb = F.shiftright(F.col("ch"), j).bitwiseAND(F.lit(1))
        aggs.append(F.sum(gb.cast("long")).alias(f"c{j}"))
        aggs.append(F.sum(F.col("vc") * gb).alias(f"s{j}"))
    byk = kd.groupBy("k").agg(*aggs).localCheckpoint(eager=False)

    def dollars(cents: F.Column) -> F.Column:
        """cent-long → double on the ORACLE's rounding path: rebuild
        the exact decimal sum first, then one double rounding —
        fl(S/100)/n, never fl(S/(100·n))."""
        return (cents.cast("decimal(38,2)") / 100).cast("double")

    obs = byk.filter(F.col("k") == 0).select(
        F.col("cc").cast("long").alias("n_click"),
        (F.col("cnt") - F.col("cc")).cast("long").alias("n_view"),
        F.col("cnt").alias("n_tot"),
        F.col("sv").alias("s_tot"),
        (
            F.try_divide(dollars(F.col("sc")), F.col("cc"))
            - F.try_divide(
                dollars(F.col("sv") - F.col("sc")), F.col("cnt") - F.col("cc")
            )
        ).alias("d_obs"),
    )
    # reshape (k, j) → replicate b: bit b lives at shift 4·(3−p)+(b%4)
    # of chunk k where nibble index i = 4k+p (h0) / 4(k−8)+p (h1);
    # inverting: b = 16k + 12 − 4·(j//4) + (j%4) (+128 for the h1
    # chunks), with the 9 combinations past b=198 filtered out
    b_expr = (
        F.when(
            F.col("k") < 8,
            16 * F.col("k") + 12 - 4 * F.floor(F.col("j") / 4) + F.col("j") % 4,
        ).otherwise(
            128
            + 16 * (F.col("k") - 8)
            + 12
            - 4 * F.floor(F.col("j") / 4)
            + F.col("j") % 4
        )
    ).cast("int")
    slices = byk.select(
        "k",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.col(f"c{j}").alias("c1"),
                        F.col(f"s{j}").alias("s1"),
                    )
                    for j in range(16)
                ]
            )
        ),
    ).withColumn("b", b_expr).filter(F.col("b") < n_reps)
    # replicate diff: mean(g=0) − mean(g=1); NULL iff a side is empty
    # (try_divide), dropped by the filter — the oracle's HAVING
    rmeans = slices.crossJoin(F.broadcast(obs)).select(
        (
            F.try_divide(
                dollars(F.col("s_tot") - F.col("s1")),
                F.col("n_tot") - F.col("c1"),
            )
            - F.try_divide(dollars(F.col("s1")), F.col("c1"))
        ).alias("d"),
        "n_click",
        "n_view",
        "d_obs",
    ).filter(F.col("d").isNotNull())
    return (
        rmeans.groupBy("n_click", "n_view", "d_obs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_replicates"),
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(
                            F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1
                        ).otherwise(0)
                    )
                )
                / (F.count(F.lit(1)) + 1.0),
                6,
            ).alias("p_value"),
        )
        .select(
            "n_click",
            "n_view",
            F.round("d_obs", 6).alias("observed_diff"),
            "n_replicates",
            "p_value",
        )
    )


# --- Mann-Kendall trend test + Kendall's tau over the hourly event
# count series — the nonparametric "is traffic trending" readout
# (monotone trend, no distribution assumed; the CUSUM changepoint's
# complement). S = Σ_{i<j} sign(n_j − n_i) over hour pairs: the pair
# relation is TIME-GRAIN-sized (hours², not events²) so it stays
# bounded at any event volume — the same move as events_hourly_acf.
# Tie-corrected variance and the continuity-corrected z are pure
# integer arithmetic until the final ratios.
@register(
    "events_mann_kendall_trend",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.n > a.n THEN 1
                             WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        FROM hourly a JOIN hourly b ON b.h > a.h
    ),
    nn AS (SELECT count(*) AS n FROM hourly),
    ties AS (
        SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_corr
        FROM (SELECT count(*) AS t FROM hourly GROUP BY n) WHERE t > 1
    )
    SELECT CAST(nn.n AS BIGINT) AS n_hours,
           s.s_stat,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_corr) / 18.0, 6) AS var_s,
           round(CAST(s.s_stat AS DOUBLE) / NULLIF(nn.n * (nn.n - 1) / 2.0, 0), 6) AS kendall_tau,
           round((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                  WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
                 / NULLIF(sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_corr) / 18.0), 0),
                 6) AS z_score
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # hour-sized; read by 3 consumers
    )
    a = hourly.select(F.col("h").alias("ha"), F.col("n").alias("na"))
    b = hourly.select(F.col("h").alias("hb"), F.col("n").alias("nb"))
    s = (
        a.join(b, F.col("hb") > F.col("ha"))
        .agg(
            F.sum(
                F.when(F.col("nb") > F.col("na"), 1)
                .when(F.col("nb") < F.col("na"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = hourly.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        hourly.groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_corr")
        )
    )
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_corr")) / 18.0
    sgn = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            n.cast("long").alias("n_hours"),
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            # try_divide twins the oracle's NULLIF: a 0/1-hour series
            # has no pairs; an all-tied series has zero variance
            F.round(
                F.try_divide(
                    F.col("s_stat").cast("double"), n * (n - 1) / 2.0
                ),
                6,
            ).alias("kendall_tau"),
            F.round(
                F.try_divide(F.col("s_stat") - sgn, F.sqrt(var_s)), 6
            ).alias("z_score"),
        )
    )


# --- pairwise distances between per-label embedding centroids — the
# "are my classes separating" readout behind the centroid-confusion
# matrix (labels whose centroids sit close are the ones kNN confuses).
# Centroids fold map-side per (label, dim) and are ROUNDED to the 1e-6
# grid BEFORE the distance arithmetic, so the cross-engine float-order
# noise of the per-dim means can't leak into the pairwise numbers
# (the round-before-rank discipline applied to round-before-distance).
# The pair relation is labels²×dims — bounded at any corpus size.
@register(
    "embedding_centroid_distances",
    oracle="""
    WITH dims AS (
        SELECT label, i.i AS dim,
               round(avg((embedding::DOUBLE[])[i.i]), 6) AS mu
        FROM embeddings
        CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY label, i.i
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum((a.mu - b.mu) * (a.mu - b.mu))), 6) AS centroid_dist,
           round(sum(a.mu * b.mu)
                 / NULLIF(sqrt(sum(a.mu * a.mu)) * sqrt(sum(b.mu * b.mu)), 0),
                 6) AS centroid_cosine
    FROM dims a JOIN dims b ON b.dim = a.dim AND b.label > a.label
    GROUP BY a.label, b.label
    """,
)
def embedding_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .select("label", (F.col("pos") + 1).alias("dim"), F.col("col").alias("x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("mu"))
        .localCheckpoint(eager=False)  # labels×dims; joined to itself
    )
    a = dims.select(
        F.col("label").alias("label_a"), "dim", F.col("mu").alias("mua")
    )
    b = dims.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dimb"),
        F.col("mu").alias("mub"),
    )
    return (
        a.join(
            b,
            (F.col("dimb") == F.col("dim"))
            & (F.col("label_b") > F.col("label_a")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("mua") - F.col("mub"))
                        * (F.col("mua") - F.col("mub"))
                    )
                ),
                6,
            ).alias("centroid_dist"),
            F.round(
                F.try_divide(
                    F.sum(F.col("mua") * F.col("mub")),
                    F.sqrt(F.sum(F.col("mua") * F.col("mua")))
                    * F.sqrt(F.sum(F.col("mub") * F.col("mub"))),
                ),
                6,
            ).alias("centroid_cosine"),
        )
    )


# --- source-mixture diversity: Simpson's D, Shannon entropy, and
# Pielou evenness over the documents-per-source distribution — the
# one-row corpus-governance readout next to curation_domain_cap ("is
# the corpus one source wearing twenty hats"). Pure integer counts
# into closed-form ratios; ln(k)=0 single-source corpus yields NULL
# evenness via try_divide/NULLIF.
@register(
    "text_source_diversity",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT sum(n) AS nn, count(*) AS k FROM c)
    SELECT CAST(t.k AS BIGINT) AS n_sources,
           CAST(t.nn AS BIGINT) AS n_docs,
           round(1.0 - sum((CAST(c.n AS DOUBLE) / t.nn) * (CAST(c.n AS DOUBLE) / t.nn)), 6) AS simpson_d,
           round(-sum((CAST(c.n AS DOUBLE) / t.nn) * ln(CAST(c.n AS DOUBLE) / t.nn)), 6) AS shannon_h,
           round(-sum((CAST(c.n AS DOUBLE) / t.nn) * ln(CAST(c.n AS DOUBLE) / t.nn))
                 / NULLIF(ln(CAST(t.k AS DOUBLE)), 0), 6) AS evenness
    FROM c CROSS JOIN t
    GROUP BY t.k, t.nn
    """,
)
def text_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("nn"), F.count(F.lit(1)).alias("k"))
    p = F.col("n").cast("double") / F.col("nn")
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("k", "nn")
        .agg(
            F.round(1.0 - F.sum(p * p), 6).alias("simpson_d"),
            F.round(-F.sum(p * F.log(p)), 6).alias("shannon_h"),
            F.round(
                F.try_divide(
                    -F.sum(p * F.log(p)), F.log(F.col("k").cast("double"))
                ),
                6,
            ).alias("evenness"),
        )
        .select(
            F.col("k").cast("long").alias("n_sources"),
            F.col("nn").cast("long").alias("n_docs"),
            "simpson_d",
            "shannon_h",
            "evenness",
        )
    )


# --- interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995,
# Chen & Goodman 1999 — the smoothing every n-gram quality filter
# actually ships): P(w2|w1) = max(c12−d, 0)/c1 + (d·N1+(w1·)/c1) ·
# N1+(·w2)/T, d = 0.75. The continuation count N1+(·w2) is what makes
# KN right where ML/add-k are wrong ("francisco" is frequent but only
# ever follows "san"). All four count relations fold from ONE bigram
# pass (vocab²-bounded, same cardinality story as the bigram
# perplexity's count-cutoff); probabilities are integer ratios plus
# the binary-exact 0.75 discount — identical doubles on both engines.
_KN_D = 0.75


@register(
    "text_kneser_ney_bigrams",
    oracle=f"""
    WITH d AS (SELECT regexp_extract_all(lower(text), '\\w+') AS toks FROM documents),
    bg AS (
        SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i])) AS w1,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i + 1])) AS w2
        FROM d WHERE len(toks) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c) AS n, count(*) AS fwd FROM c12 GROUP BY 1),
    bwd AS (SELECT w2, count(*) AS bk FROM c12 GROUP BY 1),
    t AS (SELECT count(*) AS tt FROM c12)
    SELECT b.w1, b.w2,
           CAST(b.c AS BIGINT) AS c12,
           round(CAST(b.c AS DOUBLE) / c1.n, 6) AS p_ml,
           round((greatest(b.c - {_KN_D}, 0) + {_KN_D} * c1.fwd
                  * (CAST(bwd.bk AS DOUBLE) / t.tt)) / c1.n, 6) AS p_kn
    FROM c12 b
    JOIN c1 ON c1.w1 = b.w1
    JOIN bwd ON bwd.w2 = b.w2
    CROSS JOIN t
    ORDER BY b.c DESC, b.w1 ASC, b.w2 ASC
    LIMIT 20
    """,
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(tokens(F.lower(F.col("text"))).alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c12 = c12.localCheckpoint(eager=False)  # feeds 3 count relations
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("fwd")
    ).withColumnRenamed("w1", "cw1")
    bwd = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("bk")).withColumnRenamed(
        "w2", "bw2"
    )
    t = c12.agg(F.count(F.lit(1)).alias("tt"))
    return (
        c12.join(c1, F.col("cw1") == F.col("w1"))
        .join(bwd, F.col("bw2") == F.col("w2"))
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c12"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias("p_ml"),
            F.round(
                (
                    F.greatest(F.col("c") - _KN_D, F.lit(0.0))
                    + _KN_D
                    * F.col("fwd")
                    * (F.col("bk").cast("double") / F.col("tt"))
                )
                / F.col("n"),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


# --- kNN-graph hubness profile: the in-degree distribution of the
# k=5 cosine nearest-neighbor graph plus its skewness — THE embedding
# pathology readout (Radovanović et al. 2010: in high dimensions a few
# "hub" points show up in everyone's neighbor list and poison both
# dedup and retrieval; skewness of the in-degree distribution is the
# standard hubness measure). The estimator runs on a FIXED 500-vector
# sample (hubness is a distributional property — the sample skew IS
# the estimate, and the readout's cost is then SF-invariant by
# construction); the full-corpus variant is the same degree layer
# over the IVF kNN source. Perf note (measured): vectors are
# normalized ONCE map-side and pairs scored by dot alone — the naive
# per-pair cosine recomputes both L2 norms 2·n² times and measured
# 121 s at sf0.1 before this rewrite. In-degree counts are integers
# and the skewness folds from exact integer moment sums (mean
# in-degree is exactly k by construction).
_HUB_SAMPLE = 500


@register(
    "embedding_hubness_stats",
    oracle=f"""
    WITH v0 AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nm
        FROM embeddings WHERE vec_id < {_HUB_SAMPLE}
    ),
    v AS (
        SELECT vec_id,
               CASE WHEN nm > 0 THEN list_transform(e, x -> x / nm) END AS ne
        FROM v0
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round(list_dot_product(a.ne, b.ne), 6) AS s
        FROM v a JOIN v b ON b.vec_id <> a.vec_id
    ),
    knn AS (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
        FROM scored QUALIFY r <= 5
    ),
    indeg AS (
        SELECT v.vec_id, CAST(count(k.src) AS BIGINT) AS d
        FROM v LEFT JOIN knn k ON k.dst = v.vec_id
        GROUP BY v.vec_id
    ),
    m AS (
        SELECT count(*) AS n, sum(d) AS s1,
               sum(CAST(d AS HUGEINT) * d) AS s2,
               sum(CAST(d AS HUGEINT) * d * d) AS s3
        FROM indeg
    ),
    sk AS (
        SELECT round(
            (CAST(s3 AS DOUBLE) / n
             - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
             + 2.0 * power(CAST(s1 AS DOUBLE) / n, 3))
            / NULLIF(power(CAST(s2 AS DOUBLE) / n
                           - power(CAST(s1 AS DOUBLE) / n, 2), 1.5), 0),
            6) AS skew
        FROM m
    )
    SELECT i.d AS in_degree,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM m), 6) AS share,
           sk.skew AS hub_skewness
    FROM indeg i CROSS JOIN sk
    GROUP BY i.d, sk.skew
    """,
)
def embedding_hubness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-10 execution rewrite (same oracle, same semantics): the r8
    # build scored the 500×500 sample pairs as a crossJoin of per-pair
    # JVM HOF dots — the last dense-batch site still on interpreted
    # expression folds (SCALING.md round-9 rule: such plans plateau
    # ~1µs/eval in every shape; kernels measured 10-100× on this exact
    # diagnosis — hubness_ivf went 878 → 18 s). Now the established
    # kernel pattern: the normalized sample matrix rides in a
    # mapInPandas closure (≤_HUB_SAMPLE×dim — a bounded driver collect
    # of the SAME class as the k-row centroid collects) and each Arrow
    # batch scores V@Sᵀ in one float64 BLAS call. The stable argsort on
    # -s over dst-ASC-ordered columns IS the oracle's (s DESC NULLS
    # LAST, dst ASC): zero-norm rows/cols are forced to -inf, so an
    # all-NULL source row degrades to dst-ascending exactly like the
    # SQL window. Dots are BLAS vs the engines' sequential folds:
    # ≤1e-13 summation-order divergence under the round(6) grid.
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).filter(F.col("vec_id") < _HUB_SAMPLE)
    sample_rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    if not sample_rows:
        # empty corpus → empty readout (the oracle's 0-row result)
        indeg = emb.select("vec_id", F.lit(0).cast("long").alias("d"))
        return _degree_hubness_readout(indeg)
    sids = np.array([r["vec_id"] for r in sample_rows], dtype=np.int64)
    smat = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    snorm = np.linalg.norm(smat, axis=1)
    zero_dst = snorm == 0
    snorm[zero_dst] = np.inf  # zero-norm dst column → scores -inf (NULL)
    smat = smat / snorm[:, None]
    k_nn = 5

    def sample_topk(batches):
        # Reused-buffer discipline (round 13, similarity.py:328
        # pattern): normalize v in place (it is freshly built per batch
        # and dead after the GEMM) and run the GEMM + round through one
        # hoisted (n, |sample|) buffer instead of three fresh matrices
        # per batch — fresh-anon first-touch is the slow path on this
        # host (SCALING.md round 12). Op order unchanged → bit-identical.
        # r14 (verdict task #4): the two residual per-batch (n, ·)
        # allocations go too — the Arrow INGEST stacks into a hoisted
        # (n, dim) buffer (float32→float64 widening is exact either
        # way), and the argsort temp -s becomes an in-place negation
        # (stable ASC argsort of -s ≡ the old argsort(-s) bitwise; s is
        # dead after). The argsort INDEX matrix itself stays: numpy has
        # no out= for argsort, and argpartition's unstable tie handling
        # would change which of the round(6)-tied neighbors is kept.
        sbuf = np.empty((0, len(sids)))
        vbuf = np.empty((0, 0))
        for pdf in batches:
            if not len(pdf):
                continue
            emb_rows = list(pdf["embedding"])
            n = len(emb_rows)
            if n > vbuf.shape[0]:
                vbuf = np.empty((n, len(emb_rows[0])))
            v = np.stack(emb_rows, out=vbuf[:n])
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            nrm = np.linalg.norm(v, axis=1)
            zsrc = nrm == 0
            nrm[zsrc] = np.inf
            if n > sbuf.shape[0]:
                sbuf = np.empty((n, len(sids)))
            s = sbuf[:n]
            np.divide(v, nrm[:, None], out=v)
            np.dot(v, smat.T, out=s)
            np.round(s, 6, out=s)
            # NULL-score parity: a zero-norm src scores NULL everywhere
            # (→ all ties, dst ASC); a zero-norm dst scores NULL for
            # every src (→ ordered last, still eligible)
            s[zsrc, :] = -np.inf
            s[:, zero_dst] = -np.inf
            np.negative(s, out=s)
            order = np.argsort(s, axis=1, kind="stable")[:, : k_nn + 1]
            srcs: list[int] = []
            dsts: list[int] = []
            for i in range(len(ids)):
                kept = [sids[j] for j in order[i] if sids[j] != ids[i]][:k_nn]
                srcs.extend([ids[i]] * len(kept))
                dsts.extend(kept)
            yield pd.DataFrame(
                {"src": np.array(srcs, dtype=np.int64),
                 "dst": np.array(dsts, dtype=np.int64)}
            )

    knn = emb.mapInPandas(sample_topk, schema="src long, dst long")
    indeg = (
        emb.select("vec_id")
        .join(knn, knn["dst"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(F.count("src").cast("long").alias("d"))
        .localCheckpoint(eager=False)  # vector-sized; moments + histogram
    )
    return _degree_hubness_readout(indeg)


def _degree_hubness_readout(indeg: DataFrame) -> DataFrame:
    """(vec_id, d) in-degree relation → the hubness readout: degree
    histogram + exact-integer-moment skewness (shared by the sampled
    and the IVF full-corpus hubness queries)."""
    m = indeg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d").cast("decimal(18,0)") * F.col("d").cast("decimal(18,0)")).alias("s2"),
        F.sum(
            F.col("d").cast("decimal(12,0)")
            * F.col("d").cast("decimal(12,0)")
            * F.col("d").cast("decimal(12,0)")
        ).alias("s3"),
    )
    n = F.col("n").cast("double")
    mu1 = F.col("s1").cast("double") / n
    mu2 = F.col("s2").cast("double") / n
    mu3 = F.col("s3").cast("double") / n
    skew = F.round(
        F.try_divide(
            mu3 - 3.0 * mu1 * mu2 + 2.0 * F.pow(mu1, 3),
            F.pow(mu2 - mu1 * mu1, F.lit(1.5)),
        ),
        6,
    )
    sk = m.select(skew.alias("hub_skewness"), n.alias("nn"))
    return (
        indeg.crossJoin(F.broadcast(sk))
        .groupBy("d", "hub_skewness", "nn")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .select(
            F.col("d").alias("in_degree"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.round(F.col("n_vectors") / F.col("nn"), 6).alias("share"),
            "hub_skewness",
        )
    )


# --- full-corpus hubness over the IVF kNN source — the registered
# scale path the sampled estimator's docstring promised (r8 verdict
# task #4): every vector's 5-NN is searched within its IVF cell only,
# with √n centroids (the flat-IVF optimum: assignment n·√n + in-cell
# scoring n·√n ≈ n^1.5 total, vs the sample-free n² graph; above
# max_centroids the assignment argmax SHARDS across closures — see
# _ivf_assign_sharded, exact by construction, pinned against the flat
# path at forced caps — and the cell-bucketed self-join below is
# already the shape that scales out: candidates co-locate by
# centroid_id, no broadcast of a corpus-sized query set anywhere). In-degree then folds over ALL vectors (left
# join keeps never-neighbored vectors at 0 — dropping them inflates
# the skew), same exact-integer moment tail as the sampled query.
# Cell-boundary effects make this an APPROXIMATE kNN graph by design:
# that is the documented IVF recall trade, not a defect.
@register(
    "embedding_hubness_ivf",
    oracle="""
    WITH v0 AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nm
        FROM embeddings
    ),
    v AS (
        SELECT vec_id,
               CASE WHEN nm > 0 THEN list_transform(e, x -> x / nm)
               END AS ne
        FROM v0
    ),
    c AS (SELECT vec_id AS cid, ne AS nce FROM v
          WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM v)),
    ascored AS (
        SELECT v.vec_id, v.ne, c.cid,
               round(list_dot_product(v.ne, c.nce), 6) AS s
        FROM v CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, ne, cid FROM
            (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY s DESC NULLS LAST, cid) AS rn FROM ascored)
        WHERE rn = 1
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round(list_dot_product(a.ne, b.ne), 6) AS s
        FROM assigned a JOIN assigned b
          ON b.cid = a.cid AND b.vec_id <> a.vec_id
    ),
    knn AS (
        SELECT src, dst FROM
            (SELECT src, dst, row_number() OVER (PARTITION BY src
                        ORDER BY s DESC NULLS LAST, dst) AS r FROM scored)
        WHERE r <= 5
    ),
    indeg AS (
        SELECT v.vec_id, CAST(count(k.src) AS BIGINT) AS d
        FROM v LEFT JOIN knn k ON k.dst = v.vec_id
        GROUP BY v.vec_id
    ),
    m AS (
        SELECT count(*) AS n, sum(d) AS s1,
               sum(CAST(d AS HUGEINT) * d) AS s2,
               sum(CAST(d AS HUGEINT) * d * d) AS s3
        FROM indeg
    ),
    sk AS (
        SELECT round(
            (CAST(s3 AS DOUBLE) / n
             - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
             + 2.0 * power(CAST(s1 AS DOUBLE) / n, 3))
            / NULLIF(power(CAST(s2 AS DOUBLE) / n
                           - power(CAST(s1 AS DOUBLE) / n, 2), 1.5), 0),
            6) AS skew
        FROM m
    )
    SELECT i.d AS in_degree,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM m), 6) AS share,
           sk.skew AS hub_skewness
    FROM indeg i CROSS JOIN sk
    GROUP BY i.d, sk.skew
    """,
)
def embedding_hubness_ivf(
    spark: SparkSession, sf_dir: str, max_centroids: int = 8192
) -> DataFrame:
    # Round-9 execution rewrite (same oracle, same semantics): the
    # first build scored both phases with per-pair JVM HOF dots —
    # n·√n assignment + n·√n in-cell ≈ 1e9 interpreted 64-dim folds
    # at sf10, 878 s measured, ~all of it expression interpretation
    # (the sf10 block's own profile). Both phases are dense dot
    # batches — the blocked-BLAS case (_blocked_cosine_pairs
    # precedent) — so they now run as Arrow kernels:
    #   A. assignment: centroid matrix in the closure (≤√n rows,
    #      guarded by max_centroids with the MMR limit+raise
    #      pattern), one mapInPandas V@Cᵀ per batch; ties → lowest
    #      cid via first-argmax over cid-ordered columns; a
    #      zero-norm VECTOR scores 0 everywhere → first cid (the
    #      oracle's all-NULL → NULLS LAST → min cid), a zero-norm
    #      CENTROID column is forced to -inf (the oracle's NULL
    #      column, never chosen while any real score exists).
    #   B. in-cell 5-NN: groupBy(centroid) applyInPandas — cells
    #      co-locate by key, M@Mᵀ row-chunked so no task ever holds
    #      more than chunk×|cell| scores; columns sorted by dst so a
    #      STABLE argsort on -s IS the oracle's (s DESC, dst ASC);
    #      self excluded (not demoted), zero-norm dsts rank last but
    #      remain eligible — exactly the NULL-score ordering.
    # Dots are float64 BLAS vs the engines' sequential folds: ≤1e-13
    # summation-order divergence under the round(6) grid — the
    # established dedup_semantic_pairs/boundary-corpus convention.
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # r14: the n·√n assignment GEMM runs map-side on the scan, and the
    # embeddings table is one parquet row group at every measured SF —
    # ONE populated partition, so the whole corpus×centroid GEMM ran on
    # one Python worker (guide §2.5 unsplittable input). spread_input
    # is a no-op on wide scans; centroid collects/count stay on the
    # raw relation (no shuffle for driver-side probes).
    from emission_project_spark.catalog.tables import spread_input

    emb_sp = spread_input(emb)
    n_total = emb.count()
    if n_total == 0:
        # empty corpus → empty readout (the oracle's 0-row result); the
        # centroid-matrix build below would crash on a 0-d norm
        return _degree_hubness_readout(
            emb.select("vec_id", F.lit(0).cast("long").alias("d"))
        )
    nc = int(math.ceil(math.sqrt(n_total)))
    # Recursive coarse layer (round 10, r9 verdict task #3): above
    # max_centroids the centroid matrix no longer fits one closure, so
    # the assignment argmax is SHARDED across closures instead — each
    # shard holds ≤max_centroids centroid rows, scores the corpus
    # against its slice, and a vec_id-keyed max(struct(s, -cid)) fold
    # reduces the per-shard winners to the EXACT flat argmax (ties →
    # min cid, identical to the oracle's rn=1 ORDER BY s DESC, cid).
    # Recursion changes WHERE the argmax is computed, never its value,
    # so the oracle replays the same flat √n IVF. Read amplification:
    # one corpus scan per ≤_SHARD_GROUP (64) slices — beyond that the
    # fold chains further narrow passes (ceil(n_shards/64) scans, each
    # with a ≤64 × cap × dim × 8 B closure ≈ 3.2 GB at dim 768), so the
    # former >64-shard ValueError (≈275G vectors) is now a working
    # path instead of a guard (round 13, r12 verdict task #7).
    n_shards = -(-nc // max_centroids)
    if n_shards == 1:
        cent_rows = sorted(
            emb.filter(F.col("vec_id") < nc).collect(),
            key=lambda r: r["vec_id"],
        )
        if not cent_rows:
            # sparse ids can leave no vec_id < ceil(sqrt(n)): the
            # oracle's centroid CTE is empty → every in-degree is 0
            return _degree_hubness_readout(
                emb.select("vec_id", F.lit(0).cast("long").alias("d"))
            )
        cmat = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
        cnorm = np.linalg.norm(cmat, axis=1)
        zero_cent = cnorm == 0
        cnorm[zero_cent] = np.inf  # zero-norm centroid column → scores -inf
        cmat = cmat / cnorm[:, None]

        def assign(batches):
            # reused-buffer discipline (round 13): in-place normalize +
            # one hoisted (n, nc) score buffer, same op order →
            # bit-identical (SCALING.md round 12 fresh-anon-page mode).
            # r14 (verdict task #4): the Arrow ingest now stacks into a
            # hoisted (n, dim) buffer too — the last per-batch (n, ·)
            # allocation in this kernel (float32→float64 widening is
            # exact in both forms).
            sbuf = np.empty((0, cmat.shape[0]))
            vbuf = np.empty((0, 0))
            for pdf in batches:
                if not len(pdf):
                    continue
                emb_rows = list(pdf["embedding"])
                n = len(emb_rows)
                if n > vbuf.shape[0]:
                    vbuf = np.empty((n, len(emb_rows[0])))
                v = np.stack(emb_rows, out=vbuf[:n])
                nrm = np.linalg.norm(v, axis=1)
                zsrc = nrm == 0
                nrm[zsrc] = np.inf  # zero-norm vector row → scores 0
                if n > sbuf.shape[0]:
                    sbuf = np.empty((n, cmat.shape[0]))
                s = sbuf[:n]
                np.divide(v, nrm[:, None], out=v)
                np.dot(v, cmat.T, out=s)
                np.round(s, 6, out=s)
                s[:, zero_cent] = -np.inf
                cid = s.argmax(axis=1).astype(np.int64)  # first max = min cid
                # a zero-norm VECTOR scores NULL against EVERY centroid
                # in the oracle (its ne is NULL) → NULLS LAST → rn=1 by
                # cid → the GLOBAL min cid, zero-norm centroids
                # included — not the first non-zero-norm column the
                # -inf masking above would pick
                cid[zsrc] = 0
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                        "cid": cid,
                        "embedding": pdf["embedding"],
                    }
                )

        assigned = emb_sp.mapInPandas(
            assign, schema="vec_id long, cid long, embedding array<float>"
        )
    else:
        assigned = _ivf_assign_sharded(emb, nc, max_centroids)

    k_nn, chunk = 5, _CELL_CHUNK

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", kind="mergesort")  # columns = dst ASC
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"src": ids[:0], "dst": ids[:0]})
        # per-cell ingest stays a fresh (m, dim) matrix: applyInPandas
        # calls this once per GROUP (no batch loop to hoist across) and
        # mat must outlive the whole chunk loop as the GEMM's right
        # operand — unlike the mapInPandas kernels there is no dead
        # buffer to reuse (r14 audit, verdict task #4)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = np.inf
        np.divide(mat, nrm[:, None], out=mat)  # fresh per call — in place
        srcs, dsts = [], []
        # reused-buffer discipline (round 13): one (chunk, m) buffer
        # absorbs every chunk of this cell instead of two fresh
        # matrices per chunk; op order unchanged → bit-identical
        # (SCALING.md round 12 fresh-anon-page mode)
        buf = np.empty((min(chunk, m), m))
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            s = buf[: hi - lo]
            np.dot(mat[lo:hi], mat.T, out=s)
            np.round(s, 6, out=s)
            # zero-norm rows/cols: their dots are 0.0 here but NULL in
            # the oracle (ordered last, still eligible) — force -inf
            zsrc = np.isinf(nrm[lo:hi])
            zdst = np.isinf(nrm)
            s[zsrc, :] = -np.inf
            s[:, zdst] = -np.inf
            # r14: in-place negation + ASC stable argsort ≡ the old
            # argsort(-s) bitwise, minus one fresh (chunk, m) temp per
            # chunk (s is dead after; verdict task #4)
            np.negative(s, out=s)
            order = np.argsort(s, axis=1, kind="stable")[:, : k_nn + 1]
            for i in range(hi - lo):
                src = ids[lo + i]
                kept = [ids[j] for j in order[i] if ids[j] != src][:k_nn]
                srcs.extend([src] * len(kept))
                dsts.extend(kept)
        return pd.DataFrame(
            {"src": np.array(srcs, dtype=np.int64),
             "dst": np.array(dsts, dtype=np.int64)}
        )

    knn = assigned.groupBy("cid").applyInPandas(
        cell_topk, schema="src long, dst long"
    )
    indeg = (
        emb.select("vec_id")
        .join(knn, knn["dst"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(F.count("src").cast("long").alias("d"))
        .localCheckpoint(eager=False)  # vector-sized; moments + histogram
    )
    return _degree_hubness_readout(indeg)


def _ivf_assign_sharded(emb: DataFrame, nc: int, cap: int) -> DataFrame:
    """Exact flat-IVF assignment when the centroid relation exceeds one
    closure matrix: shard the centroids into ≤``cap``-row slices (by
    vec_id range — ids are unique, so each collect is ≤cap rows), then
    run ONE ``mapInPandas`` over the corpus that loops the slice
    matrices INSIDE the closure, folding a running (best_s, best_cid)
    per batch row — highest score, ties to the LOWEST cid, bit-identical
    to the flat argmax / the oracle's ``rn=1 ORDER BY s DESC NULLS
    LAST, cid``. Round-11 rewrite (r10 verdict task #3): the first cut
    gave each slice its own ``mapInPandas`` pass + a vec_id-keyed
    ``max(struct(s, -cid))`` reduce — n_shards column-pruned corpus
    scans, one fold shuffle, and one reattach join, all of which this
    shape deletes: one scan, zero extra exchanges, and the embedding
    column rides through the kernel exactly as in the flat path.

    NULL-score parity: a zero-norm vector scores -inf in every slice →
    assigned the GLOBAL min centroid id (zero-norm centroids included);
    a zero-norm centroid column is -inf, never chosen while any real
    score exists anywhere. -inf ties across slices fall to the lowest
    cid via the fold's tie rule (NumPy ``-inf == -inf`` is True).

    Closure memory = min(n_shards, _SHARD_GROUP) × cap × dim × 8 B per
    pass (at dim 768 / cap 8192 that is ≤3.2 GB); above _SHARD_GROUP
    (64) slices the fold CHAINS further narrow ``mapInPandas`` passes —
    ceil(n_shards/64) corpus scans, no shuffle between passes — so the
    path that used to raise at ≈275G vectors now degrades linearly in
    scan count instead (round 13, r12 verdict task #7). The fold is
    associative over the id-ordered slice sequence, so pass grouping
    never changes a value (pinned by the tiny-_SHARD_GROUP test)."""
    import numpy as np
    import pandas as pd

    shards: list[tuple] = []  # (ids, normalized matrix, zero-norm mask)
    for lo in range(0, nc, cap):
        hi = min(lo + cap, nc)
        rows = sorted(
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).collect(),
            key=lambda r: r["vec_id"],
        )
        if not rows:
            continue
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        cmat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        cnorm = np.linalg.norm(cmat, axis=1)
        zero_cent = cnorm == 0
        cnorm[zero_cent] = np.inf
        shards.append((ids, cmat / cnorm[:, None], zero_cent))
    if not shards:
        # sparse ids left no centroid in [0, nc): empty assignment
        return emb.select(
            "vec_id", F.lit(0).cast("long").alias("cid"), "embedding"
        ).limit(0)
    gmin = int(shards[0][0][0])  # global min centroid id (slices id-ordered)

    def make_pass(group: list[tuple], first: bool, final: bool):
        """One corpus pass folding ≤_SHARD_GROUP slices into the running
        (best_s, best_cid). The fold is left-associative over the same
        id-ordered slice sequence whatever the grouping, and scores are
        already on the round(6) grid, so chaining passes computes the
        EXACT single-pass result — grouping changes closure memory and
        scan count, never a value."""

        def assign(batches):
            # reused-buffer discipline (round 13): in-place normalize +
            # one hoisted score buffer per shard WIDTH (all shards share
            # the cap width except the tail, so ≤2 buffers live), same
            # op order → bit-identical (SCALING.md round 12
            # fresh-anon-page mode)
            bufs: dict[int, np.ndarray] = {}
            vbuf = np.empty((0, 0))
            for pdf in batches:
                if not len(pdf):
                    continue
                emb_rows = list(pdf["embedding"])
                if len(emb_rows) > vbuf.shape[0]:
                    vbuf = np.empty((len(emb_rows), len(emb_rows[0])))
                # r14: hoisted Arrow-ingest buffer (verdict task #4) —
                # float32→float64 widening is exact in both forms
                v = np.stack(emb_rows, out=vbuf[: len(emb_rows)])
                nrm = np.linalg.norm(v, axis=1)
                zsrc = nrm == 0
                nrm[zsrc] = np.inf
                np.divide(v, nrm[:, None], out=v)
                vn = v
                if first:
                    best_s = np.full(len(vn), -np.inf)
                    best_cid = np.full(
                        len(vn), np.iinfo(np.int64).max, np.int64
                    )
                else:
                    best_s = pdf["_bs"].to_numpy(dtype=np.float64).copy()
                    best_cid = pdf["_bc"].to_numpy(dtype=np.int64).copy()
                for ids, cmat, zc in group:
                    w = cmat.shape[0]
                    b = bufs.get(w)
                    if b is None or b.shape[0] < len(vn):
                        b = np.empty((len(vn), w))
                        bufs[w] = b
                    s = b[: len(vn)]
                    np.dot(vn, cmat.T, out=s)
                    np.round(s, 6, out=s)
                    s[:, zc] = -np.inf
                    bi = s.argmax(axis=1)  # first max = slice-min cid
                    bs = s[np.arange(len(bi)), bi]
                    bc = ids[bi]
                    upd = (bs > best_s) | ((bs == best_s) & (bc < best_cid))
                    best_s[upd] = bs[upd]
                    best_cid[upd] = bc[upd]
                if final:
                    # all-NULL score row → global min cid
                    best_cid[zsrc] = gmin
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                            "cid": best_cid,
                            "embedding": pdf["embedding"],
                        }
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                            "embedding": pdf["embedding"],
                            "_bs": best_s,
                            "_bc": best_cid,
                        }
                    )

        return assign

    # r14: the chained corpus passes are map-side GEMMs — spread the
    # scan once so they run wide (centroid-slice collects above stay
    # on the raw relation: no exchange for driver-side probes)
    from emission_project_spark.catalog.tables import spread_input

    out = spread_input(emb)
    n_groups = -(-len(shards) // _SHARD_GROUP)
    for g in range(n_groups):
        group = shards[g * _SHARD_GROUP : (g + 1) * _SHARD_GROUP]
        final = g == n_groups - 1
        out = out.mapInPandas(
            make_pass(group, first=(g == 0), final=final),
            schema=(
                "vec_id long, cid long, embedding array<float>"
                if final
                else "vec_id long, embedding array<float>, _bs double, _bc long"
            ),
        )
    return out


# --- t-closeness (Li et al. 2007) — the third gate of the privacy
# triad (k-anonymity bounds group SIZE, l-diversity bounds distinct
# sensitive VALUES, t-closeness bounds the sensitive DISTRIBUTION's
# distance from the global one; a group can pass both and still leak
# "everyone here is AUTOMOBILE"). Categorical EMD = total variation =
# ½Σ|p_g − p|; segments ABSENT from a group contribute their full
# global share, folded without a 5-way outer join via
# ½(Σ_present|p_gs − p_s| + (1 − Σ_present p_s)). Same QI as the
# sibling gates: (nation, $1000 balance bucket); integer-count ratios
# only.
@register(
    "privacy_t_closeness_customers",
    oracle="""
    WITH gseg AS (
        SELECT c_mktsegment AS seg, count(*) AS ns FROM customer GROUP BY 1
    ),
    tot AS (SELECT sum(ns) AS n FROM gseg),
    cells AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               c_mktsegment AS seg, count(*) AS n
        FROM customer GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT c_nationkey, bal_bucket, sum(n) AS gn FROM cells GROUP BY 1, 2
    ),
    tvals AS (
        SELECT g.c_nationkey, g.bal_bucket, g.gn,
               0.5 * (sum(abs(CAST(c.n AS DOUBLE) / g.gn
                              - CAST(gl.ns AS DOUBLE) / tot.n))
                      + (1.0 - sum(CAST(gl.ns AS DOUBLE) / tot.n))) AS t
        FROM g
        JOIN cells c ON c.c_nationkey = g.c_nationkey
                    AND c.bal_bucket = g.bal_bucket
        JOIN gseg gl ON gl.seg = c.seg
        CROSS JOIN tot
        GROUP BY g.c_nationkey, g.bal_bucket, g.gn, tot.n
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_groups,
           round(max(t), 6) AS max_t,
           CAST(sum(CASE WHEN t > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_far_groups,
           CAST(sum(CASE WHEN t > 0.3 THEN gn ELSE 0 END) AS BIGINT) AS n_exposed_rows
    FROM tvals GROUP BY c_nationkey
    """,
)
def privacy_t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    glob = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("ns")
    )
    tot = glob.agg(F.sum("ns").alias("n"))
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    g = cells.groupBy(
        F.col("c_nationkey").alias("gk"), F.col("bal_bucket").alias("gb")
    ).agg(F.sum("n").alias("gn"))
    p_gs = F.col("n").cast("double") / F.col("gn")
    p_s = F.col("ns").cast("double") / F.col("tn")
    tvals = (
        g.join(
            cells,
            (F.col("c_nationkey") == F.col("gk"))
            & (F.col("bal_bucket") == F.col("gb")),
        )
        .join(F.broadcast(glob), "seg")
        .crossJoin(F.broadcast(tot.select(F.col("n").alias("tn"))))
        .groupBy("gk", "gb", "gn")
        .agg(
            (
                0.5
                * (
                    F.sum(F.abs(p_gs - p_s))
                    + (1.0 - F.sum(p_s))
                )
            ).alias("t")
        )
    )
    far = F.col("t") > 0.3
    return tvals.groupBy(F.col("gk").alias("c_nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(F.max("t"), 6).alias("max_t"),
        F.sum(F.when(far, 1).otherwise(0)).cast("long").alias("n_far_groups"),
        F.sum(F.when(far, F.col("gn")).otherwise(0))
        .cast("long")
        .alias("n_exposed_rows"),
    )


# --- Brown-Forsythe test (Levene with group MEDIANS): are the value
# variances equal across event types — the assumption check that
# decides whether Welch (unequal-variance, already shipped) or pooled
# t is the right A/B readout, robust to the non-normal heavy-tailed
# values real traffic has. z = |x − median_g| rounded to the 1e-6
# grid and summed as decimal(18,6)/(38,12) EXACT integers (the
# Spearman discipline), so the F statistic's inputs are bit-identical
# across engines; the within-group sum of squares folds via the
# moment identity, never a second pass.
@register(
    "stats_brown_forsythe",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY 1
    ),
    z AS (
        SELECT e.event_type,
               CAST(round(abs(e.value - med.m), 6) AS DECIMAL(18,6)) AS z
        FROM events e JOIN med ON med.event_type = e.event_type
    ),
    gm AS (
        SELECT event_type, count(*) AS n, sum(z) AS sz,
               sum(CAST(z AS DECIMAL(18,6)) * z) AS szz
        FROM z GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS nn, sum(sz) AS tsz, count(*) AS k FROM gm),
    parts AS (
        SELECT tot.k, tot.nn,
               sum(gm.n * power(CAST(gm.sz AS DOUBLE) / gm.n
                                - CAST(tot.tsz AS DOUBLE) / tot.nn, 2)) AS between_ss,
               sum(CAST(gm.szz AS DOUBLE)
                   - CAST(gm.sz AS DOUBLE) * CAST(gm.sz AS DOUBLE) / gm.n) AS within_ss
        FROM gm CROSS JOIN tot GROUP BY tot.k, tot.nn
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(nn AS BIGINT) AS n_rows,
           round((between_ss / (k - 1)) / NULLIF(within_ss / (nn - k), 0), 6) AS f_stat
    FROM parts
    """,
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.round(F.abs(F.col("value") - F.col("m")), 6)
        .cast("decimal(18,6)")
        .alias("z"),
    )
    gm = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    tot = gm.agg(
        F.sum("n").alias("nn"),
        F.sum("sz").alias("tsz"),
        F.count(F.lit(1)).alias("k"),
    )
    gmean = F.col("sz").cast("double") / F.col("n")
    tmean = F.col("tsz").cast("double") / F.col("nn")
    parts = (
        gm.crossJoin(F.broadcast(tot))
        .groupBy("k", "nn")
        .agg(
            F.sum(F.col("n") * F.pow(gmean - tmean, 2)).alias("between_ss"),
            F.sum(
                F.col("szz").cast("double")
                - F.col("sz").cast("double")
                * F.col("sz").cast("double")
                / F.col("n")
            ).alias("within_ss"),
        )
    )
    return parts.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("nn").cast("long").alias("n_rows"),
        F.round(
            F.try_divide(
                F.col("between_ss") / (F.col("k") - 1),
                F.col("within_ss") / (F.col("nn") - F.col("k")),
            ),
            6,
        ).alias("f_stat"),
    )


# --- DAU/MAU stickiness per day: distinct daily actives over the
# trailing-30-day distinct actives — the engagement ratio every
# product dashboard leads with. The user-day relation is deduped
# FIRST (one exchange), then the trailing window is a day-grid ×
# user-day range join — the day grid is TIME-GRAIN bounded (30 rows
# per month regardless of event volume), so the "window" never
# rescans events; same bounded-grain move as the Mann-Kendall pair
# relation. Ratios of distinct counts — pure integers.
@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
    grid AS (SELECT DISTINCT d FROM ud),
    mau AS (
        SELECT g.d, count(DISTINCT u.user_id) AS mau
        FROM grid g JOIN ud u
          ON u.d BETWEEN g.d - 29 AND g.d
        GROUP BY g.d
    )
    SELECT dau.d AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON mau.d = dau.d
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)  # user-day grain; read 3×
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    grid = ud.select(F.col("d").alias("gd")).distinct()
    mau = (
        grid.join(
            ud,
            (F.col("d") >= F.date_sub(F.col("gd"), 29))
            & (F.col("d") <= F.col("gd")),
        )
        .groupBy("gd")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return dau.join(mau, dau["d"] == mau["gd"]).select(
        F.col("d").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("mau").cast("long").alias("mau"),
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


# --- DAU/MAU via HLL register merges — the 100 TB twin of
# events_dau_mau_stickiness (r8 verdict task #7): the exact query
# expands user-days ×30 and exact-counts each day; at real volume the
# trailing-window MAU is a mergeable-sketch fold instead —
# approx_count_distinct (HLL++, rsd=0.01) over the same day-grid ×
# user-day range join, whose partial REGISTERS combine map-side
# (fixed bytes per day) where countDistinct must shuffle every
# distinct user. Cross-engine discipline per approx_hll_distinct_-
# events: engine sketches differ, so the row emits the EXACT counts
# plus an assertion that the HLL lands within tolerance; the oracle
# emits the exact counts and literal true, making the sketch path
# hash-verified instead of unverifiable. The band here is 3σ of the
# rsd bound (absolute floor 3 for the linear-counting regime), NOT
# the single-row queries' 2σ: this query asserts once per grid DAY,
# so a 2σ band (~5% miss rate per day on fresh data) would flip the
# whole query's parity on a statistically-normal sketch deviation
# (round-9 advice); at 3σ the per-day miss rate is ~0.3%.
@register(
    "events_dau_mau_hll",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
    grid AS (SELECT DISTINCT d FROM ud),
    mau AS (
        SELECT g.d, count(DISTINCT u.user_id) AS mau
        FROM grid g JOIN ud u
          ON u.d BETWEEN g.d - 29 AND g.d
        GROUP BY g.d
    )
    SELECT dau.d AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness,
           CAST(true AS BOOLEAN) AS hll_within_tol
    FROM dau JOIN mau ON mau.d = dau.d
    """,
)
def events_dau_mau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)  # user-day grain; read 3×
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    grid = ud.select(F.col("d").alias("gd")).distinct()
    # dedupe (day, user) BEFORE aggregating: a mixed
    # countDistinct + approx_count_distinct aggregate plans an Expand
    # over the ×30 range-join output (measured 7× slower); on the
    # deduped relation both counts are plain folds — count(*) IS the
    # exact distinct, and HLL registers over a set equal the registers
    # over the multiset, so the estimate is unchanged
    mau = (
        grid.join(
            ud,
            (F.col("d") >= F.date_sub(F.col("gd"), 29))
            & (F.col("d") <= F.col("gd")),
        )
        .select("gd", "user_id")
        .distinct()
        .groupBy("gd")
        .agg(
            F.count(F.lit(1)).alias("mau"),
            F.approx_count_distinct("user_id", 0.01).alias("_hll"),
        )
    )
    return dau.join(mau, dau["d"] == mau["gd"]).select(
        F.col("d").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("mau").cast("long").alias("mau"),
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
        (
            F.abs(F.col("_hll") - F.col("mau"))
            <= F.greatest(F.ceil(F.col("mau") * F.lit(0.03)), F.lit(3))
        ).alias("hll_within_tol"),
    )


# --- neighborhood-Jaccard link prediction on the STRONG co-purchase
# graph — the set-overlap companion of graph_adamic_adar_top (same
# support-≥2 sparsifier, same deg≤64 hub cap on wedge GENERATION,
# mirrored in the oracle): J(a,b) = |N(a)∩N(b)| / (deg a + deg b −
# |N(a)∩N(b)|) for non-adjacent pairs. Where AA weights shared
# neighbors by rarity, Jaccard normalizes by the neighborhoods' SIZE
# — the two disagree exactly on hub-adjacent pairs, which is why link
# prediction suites report both. Pure integer ratio: no float-order
# hazard anywhere.
@register(
    "graph_neighbor_jaccard_top",
    oracle=f"""
    WITH {_AFFINITY_PAIRS_STRONG_SQL},
    edges AS (
        SELECT pa AS s, pb AS d FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
    ),
    deg AS (SELECT s, count(*) AS dg FROM edges GROUP BY 1),
    apex AS (
        SELECT e.s AS z, e.d AS nb, dg FROM edges e JOIN deg ON deg.s = e.s
        WHERE dg BETWEEN 2 AND 64
    ),
    cand AS (
        SELECT a.nb AS na, b.nb AS nb2, count(*) AS n_common
        FROM apex a JOIN apex b ON a.z = b.z AND a.nb < b.nb
        GROUP BY 1, 2
    ),
    nonadj AS (
        SELECT c.* FROM cand c
        LEFT JOIN pairs p ON p.pa = c.na AND p.pb = c.nb2
        WHERE p.pa IS NULL
    )
    SELECT n.na AS node_a, n.nb2 AS node_b,
           CAST(n.n_common AS BIGINT) AS n_common,
           round(CAST(n.n_common AS DOUBLE)
                 / (da.dg + db.dg - n.n_common), 6) AS jaccard
    FROM nonadj n
    JOIN deg da ON da.s = n.na
    JOIN deg db ON db.s = n.nb2
    ORDER BY round(CAST(n.n_common AS DOUBLE)
                   / (da.dg + db.dg - n.n_common), 6) DESC, n.na, n.nb2
    LIMIT 20
    """,
)
def graph_neighbor_jaccard_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from emission_project_spark.plans.affinity_ops import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir, min_support=2).localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    edges = pairs.select(F.col("pa").alias("s"), F.col("pb").alias("d")).unionAll(
        pairs.select(F.col("pb"), F.col("pa"))
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).localCheckpoint(
        eager=False
    )
    adj = (
        edges.join(deg, "s")
        .filter((F.col("dg") >= 2) & (F.col("dg") <= 64))
        .groupBy("s")
        .agg(F.sort_array(F.collect_list("d")).alias("ns"))
    )
    k = F.size("ns")
    wedge_structs = F.flatten(
        F.transform(
            "ns",
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + 2, F.greatest(k - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("na"), y.alias("nb2")),
            ),
        )
    )
    cand = (
        adj.select(F.explode(wedge_structs).alias("wd"))
        .groupBy(F.col("wd.na").alias("na"), F.col("wd.nb2").alias("nb2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nonadj = cand.join(
        pairs,
        (pairs["pa"] == cand["na"]) & (pairs["pb"] == cand["nb2"]),
        "left_anti",
    )
    da = deg.select(F.col("s").alias("ka"), F.col("dg").alias("da"))
    db = deg.select(F.col("s").alias("kb"), F.col("dg").alias("db"))
    j = F.col("n_common").cast("double") / (
        F.col("da") + F.col("db") - F.col("n_common")
    )
    return (
        nonadj.join(da, F.col("ka") == F.col("na"))
        .join(db, F.col("kb") == F.col("nb2"))
        .select(
            F.col("na").alias("node_a"),
            F.col("nb2").alias("node_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(j, 6).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "node_a", "node_b")
        .limit(20)
    )


# --- per-user bot-likelihood profile: event count, span-based rate,
# and inter-arrival regularity (CV from the burstiness machinery's
# exact integer µs moments) folded into a rule — a metronome cadence
# (CV < 0.1 over ≥ 5 gaps) or an inhuman rate (> 60 events/min) flags
# the user. The operational pre-filter ahead of the dedup/curation
# stack (bot traffic poisons every frequency-based signal downstream).
# One window pass + one user-grain aggregate; every number is an
# exact-integer ratio.
@register(
    "events_bot_score",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
               epoch_us(ts) AS us
        FROM events
    ),
    m AS (
        SELECT user_id,
               count(*) AS n_events,
               count(gap_us) AS n_gaps,
               max(us) - min(us) AS span_us,
               sum(CAST(gap_us AS HUGEINT)) AS s,
               sum(CAST(gap_us AS HUGEINT) * gap_us) AS ss
        FROM g GROUP BY 1
    ),
    d AS (
        SELECT user_id, n_events, n_gaps,
               CAST(s AS DOUBLE) / n_gaps AS mean_us,
               sqrt(greatest((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
                             / (n_gaps - 1), 0)) AS sd_us,
               CASE WHEN span_us > 0
                    THEN n_events * 60.0e6 / span_us END AS rate_per_min
        FROM m WHERE n_gaps >= 5
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           -- floor(x*1e6+0.5)/1e6: the cross-engine HALF_UP grid (the
           -- MMR precedent) — integer-ratio values land EXACTLY on
           -- .5e-6 ties where Spark round (BigDecimal HALF_UP) and
           -- DuckDB round (float-mediated) disagree
           floor(mean_us / 1e6 * 1e6 + 0.5) / 1e6 AS mean_gap_s,
           round(sd_us / NULLIF(mean_us, 0), 6) AS gap_cv,
           floor(rate_per_min * 1e6 + 0.5) / 1e6 AS rate_per_min,
           (coalesce(sd_us / NULLIF(mean_us, 0), 0) < 0.1
            OR coalesce(rate_per_min, 0) > 60.0) AS bot_flag
    FROM d
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "user_id", us.alias("us"), (us - F.lag(us).over(w)).alias("gap_us")
    )
    m = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        (F.max("us") - F.min("us")).alias("span_us"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("gap_us").cast("decimal(18,0)")
            * F.col("gap_us").cast("decimal(18,0)")
        ).alias("ss"),
    ).filter(F.col("n_gaps") >= 5)
    n = F.col("n_gaps").cast("double")
    s, ss = F.col("s").cast("double"), F.col("ss").cast("double")
    mean_us = s / n
    sd_us = F.sqrt(F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0)))
    cv = F.try_divide(sd_us, mean_us)
    rate = F.when(
        F.col("span_us") > 0,
        F.col("n_events") * 60.0e6 / F.col("span_us"),
    )
    return m.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        # HALF_UP grid (floor(x*1e6+0.5)/1e6): integer-ratio values hit
        # exact .5e-6 round ties that Spark/DuckDB round() resolve
        # differently (measured at sf0.1, user 1124)
        (F.floor(mean_us / 1e6 * 1e6 + 0.5) / 1e6).alias("mean_gap_s"),
        F.round(cv, 6).alias("gap_cv"),
        (F.floor(rate * 1e6 + 0.5) / 1e6).alias("rate_per_min"),
        (
            (F.coalesce(cv, F.lit(0.0)) < 0.1)
            | (F.coalesce(rate, F.lit(0.0)) > 60.0)
        ).alias("bot_flag"),
    )


# --- Cliff's delta effect size for click-vs-view values — the
# scale-free companion the Mann-Whitney U test (stats_mannwhitney_u)
# and the permutation p-value both need next to them: significance
# says "not chance", delta says "how big". δ = 2·AUC − 1 via the same
# mid-rank identity as stats_roc_auc (never the O(n²) dominance
# join); |δ| banded into the standard Romano et al. magnitude labels.
# Pure integer-grid arithmetic until the final ratio. Ranks via the
# same cell_minrank bucketed prefix sums as stats_roc_auc — one
# groupBy(value) histogram pass over the fact, no data-sized
# single-partition window anywhere in the plan.
@register(
    "stats_cliffs_delta",
    oracle="""
    WITH r AS (
        SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
               rank() OVER (ORDER BY value) AS rmin,
               count(*) OVER (PARTITION BY value) AS ties
        FROM events WHERE event_type IN ('click', 'view')
    ),
    a AS (
        SELECT sum(y) AS nc, sum(1 - y) AS nv,
               sum(CASE WHEN y = 1 THEN rmin + (ties - 1) / 2.0 ELSE 0 END) AS rc
        FROM r
    ),
    d AS (
        SELECT CAST(nc AS BIGINT) AS n_click, CAST(nv AS BIGINT) AS n_view,
               2.0 * (rc - nc * (nc + 1) / 2.0) / NULLIF(nc * nv, 0) - 1.0 AS delta
        FROM a
    )
    SELECT n_click, n_view,
           round(delta, 6) AS cliffs_delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33  THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM d
    """,
)
def stats_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    from emission_project_spark.functions.ranks import cell_minrank

    y = F.when(F.col("event_type") == "click", 1).otherwise(0)
    # r13 opt: checkpoint the cells — cell_minrank reads them 3×
    cells = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("ties"), F.sum(y).alias("pos")
    ).localCheckpoint(eager=False)
    r = cell_minrank(cells, "value", "ties", out_col="rmin")
    a = r.agg(
        F.sum("pos").alias("nc"),
        F.sum(F.col("ties") - F.col("pos")).alias("nv"),
        F.sum(
            F.col("pos") * (F.col("rmin") + (F.col("ties") - 1) / 2.0)
        ).alias("rc"),
    )
    delta = (
        2.0
        * F.try_divide(
            F.col("rc") - F.col("nc") * (F.col("nc") + 1) / 2.0,
            F.col("nc") * F.col("nv"),
        )
        - 1.0
    )
    return a.select(
        F.col("nc").cast("long").alias("n_click"),
        F.col("nv").cast("long").alias("n_view"),
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --- signup→first-purchase delay percentiles: the scalar summary of
# the Kaplan-Meier curve for the CONVERTED population (KM carries the
# censored mass; this is the "how fast do converters convert" number
# product teams quote). Exact-µs delays (the events_dwell_times
# precedent), exact interpolated percentiles (Spark `percentile` ==
# ANSI percentile_cont == DuckDB quantile_cont bit-for-bit on doubles
# — the percentile_exact_prices pairing). One user-grain aggregate.
@register(
    "events_conversion_delay_percentiles",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id,
               (min(epoch_us(e.ts)) - epoch_us(s.signup_ts)) / 1e6 AS delay_s
        FROM s JOIN events e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND e.ts >= s.signup_ts
        GROUP BY s.user_id, s.signup_ts
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(delay_s, 0.25), 4) AS p25_s,
           round(quantile_cont(delay_s, 0.50), 4) AS p50_s,
           round(quantile_cont(delay_s, 0.75), 4) AS p75_s,
           round(quantile_cont(delay_s, 0.90), 4) AS p90_s
    FROM conv
    """,
)
def events_conversion_delay_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    conv = (
        s.join(
            p,
            (F.col("pu") == F.col("user_id"))
            & (F.col("pts") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "signup_ts")
        .agg(
            (
                (F.min(F.unix_micros("pts")) - F.unix_micros("signup_ts"))
                / 1e6
            ).alias("delay_s")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("delay_s", F.lit(0.25)), 4).alias("p25_s"),
        F.round(F.percentile("delay_s", F.lit(0.50)), 4).alias("p50_s"),
        F.round(F.percentile("delay_s", F.lit(0.75)), 4).alias("p75_s"),
        F.round(F.percentile("delay_s", F.lit(0.90)), 4).alias("p90_s"),
    )
