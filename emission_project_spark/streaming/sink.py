"""Streaming → warehouse delivery: the foreachBatch upsert sink.

The reference's pipeline lands batches into Postgres with a keyed
upsert (``upsert_query.text:5-9``) on a daily Airflow tick
(``emission-dag.py:26``). This is the continuous version: a Structured
Streaming query whose micro-batches MERGE into the parquet warehouse
via the same batch ``upsert`` operator — one code path for batch and
streaming delivery.

Exactly-once story: foreachBatch is at-least-once (a crash between the
sink write and the checkpoint commit replays the epoch), and the keyed
upsert is idempotent — replaying an epoch upserts the same keys to the
same values — so the pipeline is effectively exactly-once without a
transactional table format. The ``overwrite_atomic`` swap keeps
concurrent readers consistent; on a cluster with a transactional
format (Delta/Iceberg) the same function body becomes ``MERGE INTO``.

Scale: each micro-batch rewrite is O(table) on pure parquet — the
price of no table format. At 100 TB the warehouse call swaps to a
MERGE on a transactional format or a partition-pruned rewrite
(upsert keys carrying the partition column); the streaming side —
checkpointing, trigger, epoch semantics — is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from emission_project_spark.operators.incremental import upsert
from emission_project_spark.sources.warehouse import Warehouse


def upsert_sink(
    stream: DataFrame,
    wh: Warehouse,
    table: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run ``stream`` into warehouse ``table`` with per-micro-batch
    keyed upsert semantics. Returns the started query; callers
    ``awaitTermination``.

    The first epoch creates the table (plain write); later epochs
    anti-join the existing table on ``keys`` and union the batch —
    the DELETE USING + INSERT reference semantics, batch-by-batch.
    """

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates(list(keys))
        if wh.exists(table):
            # overwrite_atomic writes to a tmp dir and swaps AFTER the
            # job, so the lazy read of the current table executes while
            # it still exists — no materialization needed
            merged = upsert(wh.read(table), batch, keys)
            wh.overwrite_atomic(merged, table)
        else:
            wh.overwrite_atomic(batch, table)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
