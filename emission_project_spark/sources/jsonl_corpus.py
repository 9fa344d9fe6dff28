"""JSONL document-corpus source/sink — the standard interchange format
for LLM training data (one JSON object per line, splittable at scale).

The reference's only ingestion surface is CSV feeds
(``dags/emission-dag.py:35-66``); a training-data engine additionally
needs corpus ingestion and training-shard delivery. Contracts that
matter at 100 TB:

- **explicit schema on read** — an inference pass over a 100 TB dump is
  a full extra scan, and inferred types drift between dumps. Malformed
  lines are dropped by the scan itself (``DROPMALFORMED``) — a
  billion-line crawl WILL contain bad records, and a fail-fast ingest
  dying at line 900M wastes the cluster — with a separate quarantine
  pass returning the raw text of exactly those lines. Both paths are
  plain narrow scans: no cache of the full corpus (the earlier
  PERMISSIVE + filter-on-corrupt-column formulation needed a
  ``cache()`` because Spark disallows plans referencing only the
  corrupt column — caching a 100 TB parse is not a plan).
- **shard-controlled write** — trainers want N same-sized shards, not
  one file per upstream partition; ``shard_by`` repartitions by a
  uniform hash of an id column (deterministic placement, immune to
  upstream groupBy skew), and gzip keeps the wire size ~5x down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with a declared schema contract.

    Returns ``(good, quarantined)``: ``good`` carries exactly the
    contract columns for lines that parsed (missing optional fields
    parse with nulls, matching JSON-lines practice); ``quarantined``
    carries the raw text of lines that didn't — implemented as a text
    scan + ``from_json`` probe, which stays a narrow filter at any
    scale and shares no state with the good-path scan.
    """
    good = spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    probe = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    quarantined = (
        spark.read.text(path)
        .select(
            "value",
            F.from_json(
                "value", probe, {"columnNameOfCorruptRecord": CORRUPT_COL}
            ).alias("_p"),
        )
        .filter(F.col(f"_p.{CORRUPT_COL}").isNotNull())
        .select(F.col("value").alias("raw_line"))
    )
    return good, quarantined


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    partitions: int | None = None,
    shard_by: str | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as JSONL shards.

    ``partitions`` + ``shard_by`` repartitions by a uniform hash of the
    id column so shard sizes are balanced and row→shard placement is
    deterministic across runs, regardless of upstream partitioning (a
    corpus fresh out of a groupBy is keyed by that groupBy — writing it
    as-is bakes the skew into the files). Plain ``partitions``
    round-robins. No driver collect; each task writes its own shard."""
    out = df
    if partitions is not None:
        if shard_by is not None:
            out = df.repartition(partitions, F.xxhash64(F.col(shard_by)))
        else:
            out = df.repartition(partitions)
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
