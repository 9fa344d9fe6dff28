"""Inline query observability — ``df.observe`` metric counters.

The production complement to the validation kit: `TableContract` /
`fk_violation_counts` run as SEPARATE validation passes, while an
observation rides the SAME action as the query it instruments (one
scan, zero extra jobs) — the pattern for data-quality counters on a
100 TB pipeline stage where a second pass costs real money. The
reference's analog is its count-guard probe (`emission-dag.py:74-78`),
which it pays as an extra round-trip per table; here the counters are
free metadata on the action the stage already runs.

Works identically on batch (read via ``Observation.get``) and
Structured Streaming (surfaced per micro-batch through
``StreamingQueryListener`` / ``lastProgress["observedMetrics"]``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_stage(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    name: str = "stage",
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / out-of-range counters to ``df``.

    Returns ``(instrumented_df, observation)``; run any action on the
    returned frame, then ``observation.get`` yields the metrics dict:
    ``n_rows``, ``null_<col>`` per ``not_null`` column, and
    ``oor_<col>`` per ``ranges`` entry. The counters are computed by
    the SAME tasks that execute the query — no second scan.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null or []:
        metrics.append(F.sum(F.isnull(c).cast("bigint")).alias(f"null_{c}"))
    for c, (lo, hi) in (ranges or {}).items():
        bad = ~F.col(c).between(lo, hi) & F.col(c).isNotNull()
        metrics.append(F.sum(bad.cast("bigint")).alias(f"oor_{c}"))
    return df.observe(obs, *metrics), obs
