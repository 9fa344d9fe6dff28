"""JSONL document-corpus source — the standard interchange format for
LLM training data (one JSON object per line, gzip-splittable at scale).

The reference's only ingestion surface is CSV feeds
(``dags/emission-dag.py:35-66``); a training-data engine additionally
needs corpus ingestion: schema-contracted JSONL reading with malformed
-line quarantine, so one bad record in a 100 TB crawl drop neither
kills the job nor silently disappears.

Scale shape: uncompressed (or zstd/bzip2) JSONL splits by line across
executors; ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` keeps
parsing map-side with no driver involvement. The corrupt-line channel
is a FILTER over the same scan (two passes over cheap parquet-cached
parse results beat a shuffle-side split).
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
    contract columns for lines that parsed; ``quarantined`` carries the
    raw text of lines that didn't (missing required fields are NOT
    quarantined — they parse with nulls, matching JSON-lines practice
    where optional fields are simply absent).
    """
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching before filtering on the corrupt column
    # alone (the parser may otherwise prune the referenced raw line)
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantined


def write_jsonl_corpus(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a corpus back out as JSONL (one object per line). At 100 TB
    pass ``partitions`` to size output files; compression is the
    cluster default codec."""
    w = df.repartition(partitions) if partitions else df
    w.write.mode("overwrite").json(path)
