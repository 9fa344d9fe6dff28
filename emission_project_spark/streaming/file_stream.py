"""Structured Streaming twin of the file-drop ingestion path.

The reference's "Near Real-Time" contract (README.md:3,58) is a daily
Airflow tick that consumes and archives dropped CSVs
(``emission-dag.py:35-66``). Spark-first, that contract is exactly the
Structured Streaming file source:

- exactly-once consumption via source tracking + checkpointing (the
  reference's rename-based consume-once, minus its crash window)
- ``cleanSource='archive'`` archives processed files engine-side
- ``Trigger.AvailableNow`` = "drain what's pending, then stop" — the
  scheduled-batch cadence with streaming bookkeeping

Watermarked tumbling/session windows handle late events; at scale the
same code runs continuous with a real trigger interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_feed(
    spark: SparkSession,
    incoming_dir: str,
    schema: StructType,
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CSV feed with consume-once archival."""
    reader = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", "true")
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(incoming_dir)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded — the 100 TB requirement)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Gap-based session windows (built-in ``session_window`` — dynamic
    per-key state merged by the engine; in batch mode it computes the
    same result without state)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    df: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> StreamingQuery:
    """Drain all pending input, write to the sink, stop. The scheduled-
    batch cadence of the reference with streaming exactly-once."""
    return (
        df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
