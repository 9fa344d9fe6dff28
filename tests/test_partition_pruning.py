"""Partition pruning over the partitioned warehouse — static and
DYNAMIC (DPP), the two scan-elimination mechanisms a 100 TB layout
lives or dies by.

Static: a literal predicate on the partition column must appear in the
scan's PartitionFilters (planning-time directory pruning — zero IO for
excluded partitions).

Dynamic: in the star-join shape (big partitioned fact ⋈ filtered dim
on the partition key) the partition values are only known at RUN time
from the dim side; Spark's DPP injects a `dynamicpruning` subquery
into the fact scan so the filter's partitions are the only ones read.
Without DPP the fact side is a full scan however selective the dim
filter is — the single biggest scan-cost cliff in partitioned
warehouses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.sources.warehouse import Warehouse


@pytest.fixture(scope="module")
def part_wh(spark, sf_dir, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("dpp_wh")))
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    wh.append(orders, "orders_by_year", partition_by=["o_year"])
    return wh


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(part_wh):
    fact = part_wh.read("orders_by_year")
    df = fact.filter(F.col("o_year") == 1997).groupBy("o_orderpriority").count()
    plan = _plan(df)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]


def test_dynamic_partition_pruning_star_join(spark, part_wh):
    # dim: (year, label), filtered to ONE label at runtime; the fact
    # side must receive a dynamicpruning filter on o_year, not scan all
    years = spark.createDataFrame(
        [(y, "keep" if y == 1997 else "drop") for y in range(1995, 2002)],
        "d_year int, d_label string",
    )
    fact = part_wh.read("orders_by_year")
    df = (
        fact.join(
            years.filter(F.col("d_label") == "keep"),
            fact["o_year"] == F.col("d_year"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result equals the statically-pruned equivalent
    expected = {
        r["o_orderpriority"]: r["n"]
        for r in fact.filter(F.col("o_year") == 1997)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["o_orderpriority"]: r["n"] for r in df.collect()}
    assert got == expected
