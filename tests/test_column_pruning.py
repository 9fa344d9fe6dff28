"""Pin column pruning through catalog.load_table: a two-column
projection must reach the parquet scan as a two-column ReadSchema —
a scan that decodes all 11 lineitem columns for a 2-column query reads
~5x the bytes at 100 TB."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table


def test_projection_prunes_scan_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols
    # and the filter is pushed alongside the pruning
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
