"""Pin AQE's automatic skew-join splitting (OptimizeSkewedJoin).

operators/skew.py documents the division of labor: manual salting for
aggregations, AQE's runtime skew split for joins. This test proves the
AQE half actually fires in this engine's configuration: a join with
one hot key compiles (post-execution, in the adaptive final plan) to a
sort-merge join whose skewed side is split — visible as `skew=true` on
the SMJ node. Thresholds are lowered only inside this test (saved and
restored) because the defaults are sized for 256 MB cluster
partitions, not a unit-test dataset.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # one hot key carrying ~100k rows vs 1k cold keys with 10 each;
        # payload pads the hot partition past the lowered threshold
        hot = spark.range(100_000).select(
            F.lit(0).alias("k"), F.concat(F.lit("x" * 64), F.col("id")).alias("pad")
        )
        cold = spark.range(10_000).select(
            (F.col("id") % 1000 + 1).alias("k"),
            F.concat(F.lit("y" * 64), F.col("id")).alias("pad"),
        )
        left = hot.unionAll(cold)
        right = spark.range(1001).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        # execute THROUGH the DataFrame's own queryExecution (count()
        # would plan a separate query and leave this one un-finalized)
        assert len(joined.collect()) == 110_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
