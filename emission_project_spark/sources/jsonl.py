"""JSONL (line-delimited JSON) source/sink — the training-data wire
format.

The reference's IO surface is CSV feeds + a relational warehouse
(``dags/emission-dag.py:35-66``, ``utils.py:36-40``); an LLM data
pipeline adds one more: crawl dumps and annotation drops ARRIVE as
JSONL, and curated corpora are DELIVERED to trainers as JSONL shards.
Spark's native json reader/writer does the heavy lifting; this module
pins the contracts that matter at 100 TB:

- **explicit schema on read** — an inference pass over a 100 TB dump is
  a full extra scan, and inferred types drift between dumps; malformed
  lines are dropped by the scan (``DROPMALFORMED``) with a separate
  quarantine reader for inspection, because a billion-line crawl WILL
  contain malformed records and a fail-fast ingest that dies at line
  900M wastes the cluster.
- **shard-controlled write** — trainers want N same-sized shards, not
  one file per upstream partition; ``n_shards`` repartitions by a
  uniform hash of an id column (deterministic placement, no skew from
  upstream partitioning), and gzip keeps the wire size ~5x down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Scan a JSONL file/dir with a declared schema.

    Default: ``DROPMALFORMED`` — malformed lines are skipped by the
    scan itself, no corrupt-record column in the output (Spark
    disallows plans that reference ONLY the corrupt column, so the
    filter-on-PERMISSIVE formulation breaks under column pruning).
    ``keep_corrupt=True`` returns ONLY the malformed raw lines — the
    quarantine stream an ingest job writes aside for inspection —
    implemented as a text scan + ``from_json`` probe, which stays a
    plain narrow filter at any scale."""
    if not keep_corrupt:
        return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    probe = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        "value",
        F.from_json(
            "value", probe, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("_p"),
    )
    return parsed.filter(F.col(f"_p.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias(CORRUPT_COL)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_by: str | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a corpus as JSONL shards.

    ``n_shards`` + ``shard_by`` repartitions by a uniform hash of the
    id column so shard sizes are balanced regardless of upstream
    partitioning (a corpus that just finished a groupBy is keyed by
    that groupBy — writing it as-is bakes the skew into the files).
    Plain ``n_shards`` round-robins. No driver collect; each task
    writes its own shard."""
    out = df
    if n_shards is not None:
        if shard_by is not None:
            out = df.repartition(n_shards, F.xxhash64(F.col(shard_by)))
        else:
            out = df.repartition(n_shards)
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
