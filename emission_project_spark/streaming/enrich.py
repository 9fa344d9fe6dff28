"""Stream-static enrichment — the dimension-attach join in streaming
mode.

The reference's FK-resolve joins (emission-dag.py:199-242 analog, batch
form in operators/joins.py) applied to a live stream: Structured
Streaming plans the STATIC side fresh each micro-batch, so a
dimension table maintained by the batch pipeline (upsert / SCD2 /
atomic-swap warehouse writes) is picked up between triggers without
restarting the query — the standard slowly-changing-dim enrichment
pattern. The static side is broadcast (dim-sized; the same boundary as
every batch dim join here), so the stream side never shuffles for the
join.

No watermark is needed: stream-static joins are stateless (each stream
row matches the dim as-of its own micro-batch; nothing is buffered).
Left joins keep unmatched stream rows with NULL dim columns —
unresolved FKs stay visible downstream, the §4.5 orphan-keeping
policy."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming relation with a static dimension.

    ``how`` is 'left' (keep unmatched stream rows, NULL dim columns) or
    'inner' (drop them). Right/full joins are not stream-static
    joinable in Spark and are rejected here with a clear message.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            "stream-static enrichment supports how='left'|'inner' "
            "(right/full would need the unbounded side buffered)"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
