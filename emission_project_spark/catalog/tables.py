"""Loaders for the driver's synthetic testdata tables (TESTDATA.md).

TPC-H-ish star schema ``region nation customer supplier part orders
lineitem`` plus an ``events`` stream table and training-data tables
``documents`` / ``embeddings``; one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale note: loads are plain ``spark.read.parquet`` — columnar scans with
predicate pushdown and column pruning; at 100 TB the same call reads a
partitioned directory tree and Catalyst prunes partitions. Nothing here
collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    only reads via the nanos-as-long legacy conf; we convert back to a
    proper (microsecond) TimestampType so downstream queries and the
    DuckDB oracle (``CAST(ts AS TIMESTAMP)``) see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # runtime-settable: the driver's session may not have it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div: float division would lose sub-µs precision at 2^60 nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of DataFrames."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
