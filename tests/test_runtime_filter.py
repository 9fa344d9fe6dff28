"""Pin runtime Bloom-filter join injection (InjectRuntimeFilter).

The fourth engine-behavior pin alongside DPP, AQE skew-split, and
exchange reuse: when a selective filter sits on one side of a shuffle
join, Spark builds a Bloom filter from that side at RUN time and
pushes it into the other side's scan — rows that can't match die
before the exchange. On an UN-partitioned 100 TB fact this is the
analog of DPP: the probe side's shuffle shrinks by the build side's
selectivity. Thresholds are production-sized (10 MB creation / 10 GB
application), so the test lowers them locally (saved and restored)
and disables broadcast to force the shuffle-join shape the rule
targets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
}


def test_runtime_bloom_filter_injected(spark, tmp_path):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # the application side must be a real scan (file source) for
        # the size threshold to apply — write a parquet fact first
        fact_path = str(tmp_path / "fact")
        spark.range(200_000).select(
            (F.col("id") % 5000).alias("k"),
            F.concat(F.lit("p" * 32), F.col("id")).alias("payload"),
        ).write.mode("overwrite").parquet(fact_path)
        dim_path = str(tmp_path / "dim")
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
        ).write.mode("overwrite").parquet(dim_path)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("cat") == 3)  # selective
        joined = fact.join(dim, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower() or "might_contain" in plan.lower(), plan[:3000]
        # semantics unchanged: the filter only PRUNES, never drops matches
        n = joined.count()
        expected = 200_000 // 5000 * (5000 // 7 + (1 if 3 < 5000 % 7 else 0))
        assert n == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
