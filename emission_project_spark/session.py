"""SparkSession factory with scale-oriented defaults.

The reference runs eager single-process pandas (SURVEY.md §4.2); our
engine's equivalent of its "runtime config" is this session builder.
Defaults are chosen for the local[N] test harness but every knob is the
one you would also set on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, empty-relation pruning)
- broadcast threshold generous enough that all star-schema dims
  broadcast (SURVEY.md §2.3 join-strategy note)
- Arrow enabled for the few Pandas-UDF paths (extensions)
- parquet nanos-as-long: the driver testdata's ``events`` table is
  written with TIMESTAMP(NANOS) which vanilla Spark refuses to read;
  we read it as long and convert (catalog/tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "emission_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 10 MB: big enough that every true dimension (nation, supplier,
        # customer, date) broadcasts, small enough that Catalyst never
        # auto-broadcasts a fact-side relation (at sf0.1 lineitem is
        # ~19 MB and was being broadcast under a fatter threshold — a
        # plan that cannot survive scale-up; dims are explicitly hinted
        # with F.broadcast anyway)
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Deployment/experiment overrides without code edits: the
    # ;-separated k=v list in $SPARK_GRAFT_EXTRA_CONF is applied LAST
    # (after caller extra_conf), which is how a 100 TB submission sets
    # cluster-shaped values (shuffle partition count, codec, AQE
    # thresholds) over these local[N] defaults — and how
    # tools/benchdiff.py --ab-run runs config A/Bs through its
    # existing --env-old/--env-new plumbing.
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in env_conf.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v)
    return builder.getOrCreate()


def v2_parquet_conf() -> dict[str, str]:
    """Opt-in DataSource-V2 parquet read path with aggregate pushdown.

    ``get_spark(extra_conf=v2_parquet_conf())`` makes filterless
    COUNT / MIN / MAX probes answer from parquet FOOTER STATISTICS
    instead of scanning data (``PushedAggregation`` in the plan) — at
    100 TB the reference's count-guard probe (SURVEY §2.1 S5) becomes
    a metadata-only operation. Opt-in rather than default: the engine's
    oracle surface is verified on the battle-tested V1 reader, and the
    pushdown only helps the probe-shaped queries; correctness +
    pushed-plan shape under V2 are pinned by
    tests/test_operators.py::test_v2_parquet_aggregate_pushdown.
    """
    return {
        "spark.sql.parquet.aggregatePushdown": "true",
        # keep every non-parquet source on V1; removing 'parquet' from
        # the default list is what activates the V2 scan
        "spark.sql.sources.useV1SourceList": "avro,csv,json,kafka,orc,text",
    }
