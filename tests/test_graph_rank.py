"""Semantic checks for operators/pagerank.py beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from emission_project_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_star_graph_center_dominates(spark):
    # undirected star: center 0 <-> leaves 1..5
    pairs = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    r = {row["node"]: row["rank"] for row in pagerank(_edges(spark, pairs)).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    leaf = [round(r[i], 9) for i in range(1, 6)]
    assert len(set(leaf)) == 1  # symmetry: all leaves identical


def test_mass_conservation_symmetric(spark):
    # on a symmetric graph (no dangling loss) total rank stays N
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (2, 3), (3, 2)]
    ranked = pagerank(_edges(spark, pairs), iterations=7)
    total = ranked.agg(F.sum("rank")).first()[0]
    assert abs(total - 4.0) < 1e-9


def test_no_inedge_node_holds_teleport_floor(spark):
    # directed chain 0 -> 1 -> 2 ... node 2 is a sink (violates the
    # out-edge contract, so ranks only cover 0 and 1); node 0 has no
    # in-edges and must sit exactly at the teleport floor, not vanish
    pairs = [(0, 1), (1, 2)]
    r = {row["node"]: row["rank"] for row in pagerank(_edges(spark, pairs)).collect()}
    assert abs(r[0] - 0.15) < 1e-12
    assert r[1] > r[0] - 1e-12  # receives 0's contribution each round


def test_iterations_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(0, 1)]), iterations=0)


def test_hits_authority_normalized_and_popularity_aligned(spark, sf_dir):
    from emission_project_spark.plans.graph_rank import graph_hits_part_authority

    df = graph_hits_part_authority(spark, sf_dir)
    rows = df.collect()
    vals = [r["authority"] for r in rows]
    assert max(vals) == 1.0  # max-normalized each half-step
    assert all(0.0 < v <= 1.0 for v in vals)
    # authority tracks buyer popularity: top-decile-by-buyers parts
    # average strictly higher authority than the bottom decile
    ranked = sorted(rows, key=lambda r: r["n_buyers"])
    k = max(1, len(ranked) // 10)
    low = sum(r["authority"] for r in ranked[:k]) / k
    high = sum(r["authority"] for r in ranked[-k:]) / k
    assert high > low
