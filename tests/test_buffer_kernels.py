"""Ragged-batch pins for the round-13 reused-buffer kernels.

Round 12 traced the dedup_semantic_pairs sf10 bimodality to host-level
fresh-anon-page fault service and fixed it with a chunked GEMM through
ONE reused output buffer (extensions/similarity.py:328). Round 13
generalizes that discipline to the remaining BLAS kernels
(extensions/kmeans.py, extensions/pq.py, plans/eval_metrics.py hubness
paths). Every rewrite keeps the original operand order — so outputs
must be IDENTICAL, not merely close — and these tests force the two
failure modes buffer reuse can introduce:

- ragged Arrow batches (a small tail batch after full ones): a wrong
  slice would read stale rows from the previous, larger batch;
- buffer growth mid-stream (first batch small): a missed reallocation
  would truncate.

Arrow batch geometry is forced via spark.sql.execution.arrow
.maxRecordsPerBatch; the hubness cell chunk via the _CELL_CHUNK
module constant.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SF = "/root/testdata/sf0.001"
_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


class _arrow_batches:
    """Temporarily pin the Arrow batch size (ragged-tail geometry)."""

    def __init__(self, spark, n):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get(_BATCH_KEY)
        self.spark.conf.set(_BATCH_KEY, str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set(_BATCH_KEY, self.old)


def test_kmeans_blas_ragged_batches_identical(spark):
    """assign_clusters_blas through the reused (n, k) buffers must give
    the same assignment and d2 for 7-row ragged batches (tail smaller
    than the hoisted buffer -> slice discipline) as for one big batch,
    and match the old fresh-alloc expression computed locally."""
    import numpy as np
    from pyspark.sql import functions as F

    from emission_project_spark.catalog.tables import load_table
    from emission_project_spark.extensions.kmeans import (
        assign_clusters_blas,
        lloyd_centroids,
    )

    emb = load_table(spark, _SF, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = lloyd_centroids(vecs, 10, 2)

    def run():
        # d2 on the assignment grid: GEMM row blocking may legally vary
        # with the batch shape (same as the pre-r13 kernel), so bitwise
        # equality is only guaranteed per fixed geometry
        return {
            r["vec_id"]: (r["cluster_id"], round(r["d2"], 9))
            for r in assign_clusters_blas(vecs, cents).collect()
        }

    with _arrow_batches(spark, 7):
        ragged = run()
    big = run()
    assert ragged == big

    # old-kernel reference: the full fresh-alloc expression, one batch
    rows = sorted(cents.collect(), key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cmat = np.array([r["ce"] for r in rows], dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)
    data = sorted(vecs.collect(), key=lambda r: r["vec_id"])
    x = np.array([r["e"] for r in data], dtype=np.float64)
    d2 = np.maximum(
        (x * x).sum(axis=1)[:, None] + cnorm[None, :] - 2.0 * (x @ cmat.T),
        0.0,
    )
    idx = d2.argmin(axis=1)
    for i, r in enumerate(data):
        got_cid, got_d2 = big[r["vec_id"]]
        assert got_cid == cids[idx[i]]
        # GEMM row blocking may differ between batch shapes: compare on
        # the assignment grid, not bitwise vs the single-batch reference
        assert got_d2 == pytest.approx(d2[i, idx[i]], abs=1e-9)


def test_pq_encode_ragged_batches_identical(spark):
    """pq_encode through the reused (n, k_sub) distance buffer: codes
    must be identical for 7-row ragged batches and one big batch, and
    match the old (-2x)@C.T + |C|^2 argmin computed locally."""
    import numpy as np

    from emission_project_spark.catalog.tables import load_table
    from emission_project_spark.extensions.pq import fit_pq, pq_encode

    emb = load_table(spark, _SF, "embeddings").limit(300)
    model = fit_pq(emb, m=4, k=16, iterations=2, vec_col="embedding")

    def run():
        return {
            r["vec_id"]: tuple(r["codes"])
            for r in pq_encode(emb, model, vec_col="embedding").collect()
        }

    with _arrow_batches(spark, 7):
        ragged = run()
    big = run()
    assert ragged == big

    # old-kernel reference (fresh allocs, original operand order)
    data = sorted(emb.collect(), key=lambda r: r["vec_id"])
    x = np.array([r["embedding"] for r in data], dtype=np.float64)
    for sub in range(model.m):
        xs = x[:, sub * model.dsub : (sub + 1) * model.dsub]
        d2 = (
            -2.0 * xs @ model.codebooks[sub].T
            + (model.codebooks[sub] ** 2).sum(axis=1)[None, :]
        )
        want = d2.argmin(axis=1)
        for i, r in enumerate(data):
            assert big[r["vec_id"]][sub] == want[i]


def test_hubness_stats_ragged_batches_identical(spark, tmp_path_factory):
    """embedding_hubness_stats' sample_topk (reused (n, |S|) score
    buffer + in-place normalize) must be batch-geometry invariant."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["embedding_hubness_stats"]

    def run():
        return sorted(map(tuple, q(spark, _SF).collect()))

    with _arrow_batches(spark, 7):
        ragged = run()
    assert ragged == run()


def test_hubness_ivf_chunk_and_batch_invariant(spark):
    """embedding_hubness_ivf: the assign kernel (reused (n, nc) buffer)
    and cell_topk (one reused (chunk, m) buffer across a cell's chunk
    loop, tail chunk smaller than the buffer) must give identical
    results for chunk=5 ragged chunking vs the production 2048."""
    import __spark_entry__ as entrymod
    from emission_project_spark.plans import eval_metrics as em

    q = entrymod.queries()["embedding_hubness_ivf"]

    def run():
        return sorted(map(tuple, q(spark, _SF).collect()))

    base = run()
    old = em._CELL_CHUNK
    try:
        em._CELL_CHUNK = 5  # ~500-row sf0.001 cells -> ~100 ragged chunks
        small_chunk = run()
    finally:
        em._CELL_CHUNK = old
    assert small_chunk == base
    with _arrow_batches(spark, 7):
        ragged = run()
    assert ragged == base


def test_hubness_ivf_sharded_ragged_batches(spark):
    """The sharded assignment path (per-width reused buffers) must match
    the flat path under ragged Arrow batches — a stale per-width buffer
    row would flip an argmax."""
    import __spark_entry__ as entrymod
    from emission_project_spark.plans.eval_metrics import embedding_hubness_ivf

    flat = sorted(map(tuple, embedding_hubness_ivf(spark, _SF).collect()))
    with _arrow_batches(spark, 7):
        sharded = sorted(
            map(
                tuple,
                embedding_hubness_ivf(spark, _SF, max_centroids=3).collect(),
            )
        )
    assert sharded == flat


def test_hubness_ivf_multipass_sharding_matches_flat(spark):
    """Round 13 (r12 verdict task #7): above _SHARD_GROUP slices the
    sharded assignment chains multiple corpus passes instead of
    raising. A tiny group size forces several passes (running best
    carried through Arrow as _bs/_bc columns); the readout must equal
    the flat single-closure path exactly."""
    import __spark_entry__ as entrymod  # noqa: F401 — registry load
    from emission_project_spark.plans import eval_metrics as em

    flat = sorted(
        map(tuple, em.embedding_hubness_ivf(spark, _SF).collect())
    )
    old = em._SHARD_GROUP
    try:
        em._SHARD_GROUP = 2  # cap=3 → ~9 slices → ~5 chained passes
        multi = sorted(
            map(
                tuple,
                em.embedding_hubness_ivf(
                    spark, _SF, max_centroids=3
                ).collect(),
            )
        )
    finally:
        em._SHARD_GROUP = old
    assert multi == flat
