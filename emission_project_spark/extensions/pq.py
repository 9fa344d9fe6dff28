"""Product quantization (PQ) for the ANN stack.

Completes the memory-reduction ladder int8 (functions/vectors.py, 4×)
→ PQ (this module, 32× at m=8 bytes per 64-float vector): the standard
IVF-PQ composition (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011; the FAISS IndexIVFPQ layout) that makes
a 100 TB float32 corpus scannable from executor memory. Reference
analog: none — training-data-pipeline extension surface.

Decomposition, Spark-first:

- **fit**: the embedding is split into ``m`` contiguous subvectors;
  each subspace trains an independent k-codeword Lloyd quantizer
  reusing extensions/kmeans.py (same seeding, same ``train_frac``
  bounded-training path). Codebooks are m·k·(d/m) floats — KBs — and
  live driver-side like the k-means centroids (kmeans.py:91 pattern).
- **encode**: one ``mapInPandas`` pass; per Arrow batch, one BLAS
  distance matrix per subspace → argmin codes. Output is (id, m codes)
  — the 32×-smaller scan relation.
- **ADC top-k**: per query, an (m × k) lookup table of exact squared
  distances query-subvector ↔ codeword; a corpus item's approximate
  distance is the sum of m table entries at its codes. The scan emits
  only each batch's per-query top-k (np.argpartition), so the shuffle
  carries O(batches · q · k) candidate rows, never the full q × n
  score matrix. By construction ADC(q, codes) = ‖q − decode(codes)‖²
  exactly — pinned by test_pq.py, which is the correctness anchor the
  recall numbers then sit on.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PQModel:
    codebooks: np.ndarray   # (m, k, dsub) codewords per subspace
    dim: int
    m: int
    k: int

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def fit_pq(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iterations: int = 3,
    train_frac: float | None = None,
) -> PQModel:
    """Train per-subspace Lloyd codebooks (kmeans.py seeding: the k
    smallest ids seed, so fit is deterministic for a given corpus)."""
    from emission_project_spark.extensions.kmeans import lloyd_centroids

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for sub in range(m):
        sub_vecs = emb.select(
            F.col(id_col).alias("vec_id"),
            F.slice(
                F.col(vec_col).cast("array<double>"), sub * dsub + 1, dsub
            ).alias("e"),
        )
        cents = lloyd_centroids(
            sub_vecs, k=k, iterations=iterations, train_frac=train_frac
        ).collect()
        if len(cents) < k:
            raise ValueError(
                f"subspace {sub}: Lloyd returned {len(cents)} < k={k} codewords"
            )
        # cids are the seed vec_ids (lloyd_centroids seeds from the k
        # smallest ids) — only 0-based-contiguous corpora would allow
        # indexing books by raw cid. Remap to dense 0..k-1 positions in
        # sorted-cid order (code = rank of cid), and require exactly k
        # distinct cids so a collapsed cluster can't leave a stale row.
        by_cid = sorted((int(r["cid"]), r["ce"]) for r in cents)
        if len({c for c, _ in by_cid}) != k:
            raise ValueError(
                f"subspace {sub}: expected {k} distinct codeword ids, "
                f"got {len({c for c, _ in by_cid})}"
            )
        for code, (_, ce) in enumerate(by_cid):
            books[sub, code] = np.asarray(ce)
    return PQModel(codebooks=books, dim=dim, m=m, k=k)


def pq_encode(
    emb: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m) — argmin codeword per
    subspace, ties to the lowest code (np.argmin), matching the
    kmeans.py (d2 asc, cid asc) convention."""
    books = model.codebooks
    m, dsub = model.m, model.dsub

    # codeword norms are batch-invariant: hoist them out of the batch
    # loop entirely (the old kernel recomputed k_sub×dsub squares per
    # subspace per batch)
    bnorms = [(books[sub] ** 2).sum(axis=1) for sub in range(m)]
    ksub = books[0].shape[0] if m else 0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Reused-buffer discipline (round 13, similarity.py:328
        # pattern): one hoisted (n, k_sub) distance buffer absorbs all
        # m subspaces of every batch instead of m fresh GEMM outputs +
        # m fresh scaled copies of x per batch — fresh-anon-page
        # first-touch is the slow path on this host (SCALING.md round
        # 12). −2·(x·Cᵀ) scales the GEMM output by an exact power of
        # two, bit-identical to the old (−2·x)·Cᵀ fold (pinned by a
        # ragged-batch test).
        d2 = np.empty((0, ksub))
        xbuf = np.empty((0, 0))
        for pdf in batches:
            if not len(pdf):
                continue
            rows = pdf[vec_col].to_numpy()
            n = len(rows)
            if n > xbuf.shape[0]:
                xbuf = np.empty((n, len(rows[0])))
            # r14: stack straight into the hoisted float64 buffer —
            # the old stack(f32)+astype(f64) pair allocated two fresh
            # (n, dim) matrices per batch; widening is exact either way
            x = np.stack(rows, out=xbuf[:n])
            if n > d2.shape[0]:
                d2 = np.empty((n, ksub))
            db = d2[:n]
            codes = np.empty((n, m), dtype=np.int32)
            for sub in range(m):
                xs = x[:, sub * dsub : (sub + 1) * dsub]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
                np.dot(xs, books[sub].T, out=db)
                db *= -2.0
                db += bnorms[sub][None, :]
                codes[:, sub] = db.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    # r14: the encode GEMMs run map-side on the scan — spread so a
    # single-row-group input doesn't serialize them (no-op when wide)
    from emission_project_spark.catalog.tables import spread_input

    return spread_input(emb.select(id_col, vec_col)).mapInPandas(
        gen, schema="vec_id bigint, codes array<int>"
    )


def pq_decode(codes: np.ndarray, model: PQModel) -> np.ndarray:
    """Reconstruct (n, dim) from (n, m) codes — driver/test helper."""
    return np.concatenate(
        [model.codebooks[sub][codes[:, sub]] for sub in range(model.m)],
        axis=1,
    )


def pq_topk(
    encoded: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    model: PQModel,
    k: int = 10,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, ad2) — the k smallest approximate
    squared distances per query. Queries ride the closure (a handful of
    rows — same boundary as the centroid broadcast); each scan batch
    emits only its per-query top-k candidates before the final rank."""
    if queries.ndim != 2 or queries.shape[1] != model.dim:
        raise ValueError(f"queries must be (q, {model.dim})")
    m, dsub = model.m, model.dsub
    books = model.codebooks
    # (q, m, k_codebook) exact LUT: ||q_sub - c||² per codeword
    lut = np.stack(
        [
            ((queries[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None])
             ** 2).sum(axis=2)
            for s in range(m)
        ],
        axis=1,
    )
    qids = np.asarray(query_ids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())          # (n, m)
            vec_ids = pdf["vec_id"].to_numpy()
            # ad2[q, n] = Σ_s lut[q, s, codes[n, s]] — one fancy-index
            # gather per subspace (m is small; each gather is (q, n))
            ad2 = np.zeros((lut.shape[0], len(codes)))
            for s in range(m):
                ad2 += lut[:, s, codes[:, s]]
            top = min(k, ad2.shape[1])
            # Per-batch pre-filter must respect the final (ad2 asc,
            # vec_id asc) tie-break: PQ makes exact ad2 ties routine
            # (identical codes ⇒ identical ADC distance), and a bare
            # argpartition could discard the smaller-id member of a tie
            # at the rank-k boundary, making the global top-k depend on
            # partitioning. lexsort keys are last-is-primary.
            idx = np.stack(
                [np.lexsort((vec_ids, ad2[qi]))[:top] for qi in range(len(qids))]
            )
            rows = {
                "query_id": np.repeat(qids, top),
                "vec_id": vec_ids[idx].ravel(),
                "ad2": np.take_along_axis(ad2, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    candidates = encoded.select("vec_id", "codes").mapInPandas(
        gen, schema="query_id bigint, vec_id bigint, ad2 double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("vec_id").asc()
    )
    return (
        candidates.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists × residual product quantization — the
# FAISS IndexIVFPQ composition (Jégou et al. 2011 §IV). The coarse
# quantizer prunes the scan to n_probe cells (reads ≈ n_probe/C of the
# corpus, the extensions/similarity.py IVF property); PQ shrinks what
# is scanned 32×; encoding the RESIDUAL x − c(x) instead of x keeps
# codeword resolution where the data actually is (within-cell spread,
# not global position).


@dataclass(frozen=True)
class IVFPQModel:
    coarse: np.ndarray      # (n_cells, dim) coarse centroids, row = cid
    pq: PQModel             # trained on residuals


def _residuals(emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, cell_id, r = x − c_cell) via one broadcast assignment —
    assign_clusters' min_by argmin, then a zip_with subtraction."""
    from emission_project_spark.extensions.kmeans import assign_clusters

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    assigned = assign_clusters(vecs, centroids)
    ce = centroids.select(
        F.col("cid").alias("cluster_id"), F.col("ce").alias("_ce")
    )
    return (
        assigned.join(F.broadcast(ce), "cluster_id")
        .select(
            "vec_id",
            F.col("cluster_id").alias("cell_id"),
            F.zip_with("e", "_ce", lambda x, c: x - c).alias("r"),
        )
    )


def fit_ivfpq(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    iterations: int = 3,
    train_frac: float | None = None,
) -> IVFPQModel:
    from emission_project_spark.extensions.kmeans import lloyd_centroids

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    centroids = lloyd_centroids(
        vecs, k=n_cells, iterations=iterations, train_frac=train_frac
    ).cache()
    rows = centroids.collect()
    # Mirror fit_pq's under-fill guard: Lloyd can drop an empty cell
    # during recompute, and an np.empty row silently poisons every
    # downstream assignment. Remap raw cids (seed vec_ids) to dense
    # 0..n_cells-1 rows in sorted-cid order; ivfpq_encode/_centroid_df
    # re-derive cell ids from the same row order, so the mapping is
    # consistent end-to-end.
    if len(rows) < n_cells:
        raise ValueError(
            f"coarse quantizer: Lloyd returned {len(rows)} < n_cells={n_cells} cells"
        )
    by_cid = sorted((int(r["cid"]), r["ce"]) for r in rows)
    if len({c for c, _ in by_cid}) != n_cells:
        raise ValueError(
            f"coarse quantizer: expected {n_cells} distinct cell ids, "
            f"got {len({c for c, _ in by_cid})}"
        )
    coarse = np.empty((n_cells, dim))
    for cell, (_, ce) in enumerate(by_cid):
        coarse[cell] = np.asarray(ce)
    res = _residuals(emb, centroids, id_col, vec_col)
    pq = fit_pq(
        res,
        id_col="vec_id",
        vec_col="r",
        dim=dim,
        m=m,
        k=k,
        iterations=iterations,
        train_frac=train_frac,
    )
    return IVFPQModel(coarse=coarse, pq=pq)


def ivfpq_encode(
    emb: DataFrame,
    model: IVFPQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell_id, codes) — the inverted-list relation. Persist
    this partitioned by cell_id and a probe reads only its lists."""
    centroids = _centroid_df(emb.sparkSession, model.coarse)
    res = _residuals(emb, centroids, id_col, vec_col)
    codes = pq_encode(res, model.pq, id_col="vec_id", vec_col="r")
    return res.select("vec_id", "cell_id").join(codes, "vec_id")


def _centroid_df(spark, coarse: np.ndarray) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(coarse)],
        "cid int, ce array<double>",
    )


def ivfpq_topk(
    encoded: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    model: IVFPQModel,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """ADC top-k over the n_probe nearest cells per query.

    Driver side: per query, coarse distances pick its probe cells and
    one (m × k) LUT per probed cell on the residual q − c. Executor
    side: the scan is FILTERED to the union of probed cells (partition
    pruning when the list relation is stored partitioned by cell_id);
    each batch groups by cell, scores only the queries probing that
    cell, and emits per-batch per-query top-k."""
    m, dsub = model.pq.m, model.pq.dsub
    books = model.pq.codebooks
    qids = np.asarray(query_ids)
    # (q, n_cells) coarse distances → probe lists
    cd = ((queries[:, None, :] - model.coarse[None]) ** 2).sum(axis=2)
    probe = np.argsort(cd, axis=1, kind="stable")[:, :n_probe]    # (q, p)
    # cell → [(query_index, lut)] with lut on the residual
    by_cell: dict[int, list[tuple[int, np.ndarray]]] = {}
    for qi in range(len(queries)):
        for c in probe[qi]:
            r = queries[qi] - model.coarse[c]
            lut = np.stack(
                [
                    (
                        (r[s * dsub : (s + 1) * dsub][None, :] - books[s]) ** 2
                    ).sum(axis=1)
                    for s in range(m)
                ]
            )                                                      # (m, k)
            by_cell.setdefault(int(c), []).append((qi, lut))
    wanted = sorted(by_cell)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for cell, grp in pdf.groupby("cell_id"):
                probes = by_cell.get(int(cell))
                if not probes:
                    continue
                codes = np.stack(grp["codes"].to_numpy())          # (n, m)
                vec_ids = grp["vec_id"].to_numpy()
                for qi, lut in probes:
                    ad2 = np.zeros(len(codes))
                    for s in range(m):
                        ad2 += lut[s, codes[:, s]]
                    top = min(k, len(ad2))
                    # (ad2 asc, vec_id asc) within the batch — same
                    # tie-discipline as pq_topk's pre-filter.
                    idx = np.lexsort((vec_ids, ad2))[:top]
                    yield pd.DataFrame(
                        {
                            "query_id": np.full(top, qids[qi]),
                            "vec_id": vec_ids[idx],
                            "ad2": ad2[idx],
                        }
                    )

    pruned = encoded.filter(F.col("cell_id").isin([int(c) for c in wanted]))
    candidates = pruned.select("vec_id", "cell_id", "codes").mapInPandas(
        gen, schema="query_id bigint, vec_id bigint, ad2 double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("vec_id").asc()
    )
    return (
        candidates.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def ivfpq_topk_expr(
    vectors: DataFrame,
    query: DataFrame,
    dim: int = 64,
    n_cells: int = 4,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """Oracle-checkable expression twin of the IVF-PQ ADC search.

    Computes the IDENTICAL quantity as ``fit_ivfpq`` → ``ivfpq_encode``
    → ``ivfpq_topk`` (same coarse Lloyd quantizer, same residual
    per-subspace Lloyd codebooks, same probe rule, and ADC(q, codes) =
    ‖(q − c_cell) − decode(codes)‖² by the ADC identity test_pq.py
    pins) — but entirely as lazy JVM expressions: Lloyd chains from
    extensions/kmeans.py, codeword assignment as a ``min_by`` argmin
    over the unioned per-subspace codebooks, reconstruction as a
    position-sorted flatten, and the ADC distance as the left-to-right
    ``_sq_dist`` fold the DuckDB oracle reproduces bitwise. No driver
    collect, no numpy — plan construction is action-free, so the
    registered ``similarity_ivfpq_topk`` query keeps tools/plancheck
    compile-only while putting the PQ compression path on the driver's
    oracle ledger; tests/test_pq.py bridges this twin to the numpy path
    by equality on the same corpus.

    Scale shape mirrors the numpy path: each Lloyd round broadcasts
    k·dim doubles; codeword assignment broadcasts the m·k_codes·dsub
    codebook union (KBs); the residual relation is checkpointed once
    (the inverted-list relation a deployment would persist anyway) and
    the m subspace quantizers train in ONE combined chain over the
    exploded (vec_id, sub, e) relation — one scan and one
    (vec_id, sub)-keyed exchange per Lloyd round for ALL subspaces,
    not m separate passes (the per-subspace math is independent, so
    the combined chain computes exactly what m chains would); the
    candidate scan is restricted to each query's ``n_probe`` cells by
    the join key.
    """
    from pyspark.sql import Window

    from emission_project_spark.extensions.kmeans import (
        _sq_dist,
        assign_clusters,
        lloyd_centroids,
    )

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    vecs = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    coarse = lloyd_centroids(vecs, k=n_cells, iterations=iterations)
    assigned = assign_clusters(vecs, coarse)
    ce_map = coarse.select(
        F.col("cid").alias("cluster_id"), F.col("ce").alias("_cell_ce")
    )
    res = (
        assigned.join(F.broadcast(ce_map), "cluster_id")
        .select(
            "vec_id",
            F.col("cluster_id").alias("cell"),
            F.zip_with("e", "_cell_ce", lambda x, c: x - c).alias("r"),
        )
        # corpus-scale (dim doubles per row): serialized + spillable,
        # the operators/pagerank.py edge-checkpoint discipline
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )

    # (vec_id, cell, sub, e): every subspace slice in one explode pass
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice("r", s * dsub + 1, dsub).alias("e"),
            )
            for s in range(m)
        ]
    )
    subs = (
        res.select("vec_id", "cell", F.explode(sub_structs).alias("c"))
        .select("vec_id", "cell", F.col("c.sub").alias("sub"), F.col("c.e").alias("e"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )

    # Combined per-subspace Lloyd: seeds are the k_codes smallest
    # vec_ids (identical per subspace — every vector carries all m
    # slices, so this equals lloyd_centroids' per-sub orderBy/limit
    # seeding); each round is one broadcast join + min_by argmin on
    # (vec_id, sub) + one grid-rounded mean rebuild on (sub, cid).
    seed_ids = vecs.orderBy("vec_id").limit(k_codes).select("vec_id")
    books = subs.join(F.broadcast(seed_ids), "vec_id").select(
        "sub", F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    for _ in range(iterations - 1):
        scored_t = subs.join(F.broadcast(books), "sub").withColumn(
            "d2", _sq_dist(F.col("e"), F.col("ce"))
        )
        best_t = scored_t.groupBy("vec_id", "sub").agg(
            F.min_by(F.struct("cid"), F.struct("d2", "cid")).alias("_b"),
            F.first("e").alias("e"),
        )
        by_pos = best_t.select(
            "sub", F.col("_b.cid").alias("cid"), F.posexplode("e").alias("pos", "val")
        )
        means = by_pos.groupBy("sub", "cid", "pos").agg(
            F.round(F.avg("val"), 6).alias("mv")
        )
        books = means.groupBy("sub", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda st: st["mv"],
            ).alias("ce")
        ).localCheckpoint(eager=False)

    scored = subs.join(F.broadcast(books), "sub").withColumn(
        "d2", _sq_dist(F.col("e"), F.col("ce"))
    )
    best = scored.groupBy("vec_id", "sub").agg(
        F.min_by(F.struct("cid", "ce"), F.struct("d2", "cid")).alias("_best"),
        F.first("cell").alias("cell"),
    )
    recon = best.groupBy("vec_id").agg(
        F.first("cell").alias("cell"),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("sub"), F.col("_best.ce").alias("bce"))
                    )
                ),
                lambda x: x["bce"],
            )
        ).alias("rr"),
    )

    q = query.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    qscored = q.crossJoin(F.broadcast(coarse)).select(
        "query_id", "qe", "cid", "ce",
        _sq_dist(F.col("qe"), F.col("ce")).alias("qd2"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qd2").asc(), F.col("cid").asc()
    )
    qprobes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(
            "query_id",
            F.col("cid").alias("qcell"),
            F.zip_with("qe", "ce", lambda x, c: x - c).alias("qr"),
        )
    )
    cand = recon.join(F.broadcast(qprobes), recon["cell"] == qprobes["qcell"])
    out = cand.select(
        "query_id",
        "vec_id",
        F.round(_sq_dist(F.col("qr"), F.col("rr")), 6).alias("ad2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("vec_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "ad2")
    )


def ivfpq_rerank_topk_expr(
    vectors: DataFrame,
    query: DataFrame,
    dim: int = 64,
    n_cells: int = 4,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 10,
) -> DataFrame:
    """ADC shortlist → exact re-rank (the FAISS ``IndexRefineFlat`` step).

    Stage 1 is the full IVF-PQ ADC search (``ivfpq_topk_expr``) widened
    to ``shortlist`` candidates per query; stage 2 joins the shortlist
    back to the ORIGINAL float vectors and re-orders by exact squared
    L2 with the same (distance, vec_id) deterministic tie-break. This
    is the standard two-tier ANN deployment: compressed-domain recall,
    exact-domain precision — quantization error decides which ~2k
    candidates surface, never their final order.

    Scale shape: the corpus is touched only through the 32×-compressed
    codes (stage 1); the exact pass reads q×shortlist full vectors —
    a broadcast-sized relation by construction — so refining adds one
    broadcast hash join against the vector table and a window over
    ≤shortlist rows per query, never a second full-precision corpus
    scan.
    """
    from pyspark.sql import Window

    from emission_project_spark.extensions.kmeans import _sq_dist

    short = ivfpq_topk_expr(
        vectors,
        query,
        dim=dim,
        n_cells=n_cells,
        m=m,
        k_codes=k_codes,
        iterations=iterations,
        n_probe=n_probe,
        k=shortlist,
    ).select("query_id", "vec_id")
    vecs = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = query.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    exact = (
        vecs.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_sq_dist(F.col("qe"), F.col("e")), 6).alias("ed2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ed2").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "ed2")
    )
