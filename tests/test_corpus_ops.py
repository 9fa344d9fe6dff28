"""Round-6 corpus-governance additions: asymmetric shingle containment,
Morton z-order layout, k-anonymity, chi-squared independence, and the
data-constrained epoch schedule. Value-level cross-engine parity runs
in tools/compare.py; these pin the semantics the hash gate's aggregate
view can't isolate (direction/orientation of containment pairs, the
exact bit layout of the Morton code, the locality win of z-order, and
independent recomputations of the two statistics in numpy/pandas)."""

from __future__ import annotations

import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from emission_project_spark.extensions.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from emission_project_spark.extensions.layout import morton_z, morton_z_sql


class TestContainmentPairs:
    def _docs(self, spark):
        base = " ".join(f"w{i}" for i in range(12))
        return spark.createDataFrame(
            [
                (1, base),  # fully contained in doc 2
                (2, base + " " + " ".join(f"x{i}" for i in range(40))),
                (3, " ".join(f"z{i}" for i in range(30))),  # unrelated
            ],
            "doc_id bigint, text string",
        )

    def test_subdocument_copy_scores_one(self, spark):
        rows = containment_pairs(self._docs(spark), threshold=0.8).collect()
        assert [(r.src_doc, r.dst_doc, r.containment) for r in rows] == [(1, 2, 1.0)]

    def test_jaccard_misses_the_same_pair(self, spark):
        # the pair containment flags is invisible at the same Jaccard
        # threshold — the reason this operator exists
        rows = ngram_jaccard_pairs(self._docs(spark), threshold=0.8).collect()
        assert rows == []

    def test_orientation_smaller_set_is_src(self, spark):
        # swap insert order: src must still be the smaller shingle set
        docs = self._docs(spark).withColumn(
            "doc_id", F.when(F.col("doc_id") == 1, 9).otherwise(F.col("doc_id"))
        )
        rows = containment_pairs(docs, threshold=0.8).collect()
        assert [(r.src_doc, r.dst_doc) for r in rows] == [(9, 2)]

    def test_equal_sets_tie_break_by_id(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(7, text), (4, text)], "doc_id bigint, text string"
        )
        rows = containment_pairs(docs, threshold=0.8).collect()
        assert [(r.src_doc, r.dst_doc, r.containment) for r in rows] == [(4, 7, 1.0)]


class TestMortonZ:
    def test_known_codes(self, spark):
        cases = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (3, 3, 15), (5, 3, 27), (63, 63, 4095)]
        df = spark.createDataFrame([(x, y) for x, y, _ in cases], "x int, y int")
        got = {
            (r.x, r.y): r.z
            for r in df.select("x", "y", morton_z(F.col("x"), F.col("y"), 6).alias("z")).collect()
        }
        for x, y, want in cases:
            assert got[(x, y)] == want, (x, y)

    def test_sql_twin_matches_spark(self, spark):
        # the DuckDB restatement must produce the identical code
        import duckdb

        df = spark.createDataFrame(
            [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)], "x int, y int"
        )
        spark_z = {
            (r.x, r.y): r.z
            for r in df.select("x", "y", morton_z(F.col("x"), F.col("y"), 6).alias("z")).collect()
        }
        sql = f"SELECT x, y, {morton_z_sql('x', 'y', 6)} AS z FROM grid"
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE grid AS SELECT unnest(range(0,64,7)) AS x, y FROM (SELECT unnest(range(0,64,5)) AS y)"
        )
        for x, y, z in con.execute(sql).fetchall():
            assert spark_z[(x, y)] == z

    def test_rectangle_locality_beats_single_key_sorts(self, spark):
        # full 64×64 grid, 64 files each layout: the 8×16 rectangle
        # x∈[8,15], y∈[16,31] touches 2 z-order files (x bits 4-5 and
        # y bits 4-5 pinned; only y bit 3 floats into the file prefix)
        # vs 8 custkey-sorted and 16 date-sorted files.
        grid = spark.createDataFrame(
            [(x, y) for x in range(64) for y in range(64)], "x int, y int"
        )
        sel = grid.filter(F.col("x").between(8, 15) & F.col("y").between(16, 31))
        out = sel.select(
            F.floor(morton_z(F.col("x"), F.col("y"), 6) / 64).alias("fz"), "x", "y"
        ).agg(
            F.count_distinct("fz").alias("z_files"),
            F.count_distinct("x").alias("x_files"),
            F.count_distinct("y").alias("y_files"),
        ).first()
        assert out.z_files == 2
        assert out.x_files == 8
        assert out.y_files == 16
        assert out.z_files < out.x_files < out.y_files


class TestKAnonymity:
    def test_invariants_on_smoke_corpus(self, spark, sf_dir):
        import __spark_entry__ as entry

        rows = entry.queries()["privacy_k_anonymity_customers"](spark, sf_dir).collect()
        assert len(rows) == 5  # one row per market segment
        for r in rows:
            assert 1 <= r.min_group_size
            assert r.n_risky_groups <= r.n_groups
            # every risky group has ≤ 4 rows and ≥ 1 row
            assert r.n_risky_groups <= r.n_risky_rows <= 4 * r.n_risky_groups


class TestChi2:
    def test_matches_pandas_recomputation(self, spark, sf_dir):
        import __spark_entry__ as entry

        got = entry.queries()["stats_chi2_segment_priority"](spark, sf_dir).first()
        orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
        cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
        merged = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        ct = merged.groupby(["c_mktsegment", "o_orderpriority"]).size().unstack(fill_value=0)
        n = ct.values.sum()
        row = ct.values.sum(axis=1, keepdims=True)
        col = ct.values.sum(axis=0, keepdims=True)
        e = row @ col / n
        chi2 = ((ct.values - e) ** 2 / e).sum()
        assert got.n == n
        assert got.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        assert abs(got.chi2 - chi2) < 1e-3


class TestEpochSchedule:
    def test_matches_pure_python_plan(self, spark, sf_dir):
        import __spark_entry__ as entry

        rows = {
            r.source: r
            for r in entry.queries()["curation_epoch_schedule"](spark, sf_dir).collect()
        }
        docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
        docs["n"] = docs["text"].map(lambda t: len(re.findall(r"\w+", t.lower())))
        avail = docs.groupby("source")["n"].sum().astype(float)
        total, sq = avail.sum(), (avail**0.5).sum()
        for src, a in avail.items():
            target = 2.0 * total * a**0.5 / sq
            epochs = target / a
            r = rows[src]
            assert r.available_tokens == int(a)
            assert abs(r.target_tokens - round(target, 4)) < 1e-9
            assert abs(r.epochs_planned - round(min(epochs, 4.0), 6)) < 1e-9
            assert r.capped == (epochs > 4.0)
            # conservation: effective tokens never exceed 4 epochs
            assert r.effective_tokens <= 4.0 * a + 1e-6
