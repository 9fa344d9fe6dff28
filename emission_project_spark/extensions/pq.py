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
        for r in cents:
            books[sub, int(r["cid"])] = np.asarray(r["ce"])
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for sub in range(m):
                xs = x[:, sub * dsub : (sub + 1) * dsub]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
                d2 = (
                    -2.0 * xs @ books[sub].T
                    + (books[sub] ** 2).sum(axis=1)[None, :]
                )
                codes[:, sub] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
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
            idx = np.argpartition(ad2, top - 1, axis=1)[:, :top]
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
