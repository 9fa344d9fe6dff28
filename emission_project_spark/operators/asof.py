"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right_ts <= left_ts`` per key (backward direction). Composed from
existing DataFrame ops (union + running ``last(ignorenulls)`` window)
— no UDFs, no per-row Python:

    union(left ∪ right) sorted by (key, ts, side)
    → last(right value, ignorenulls) over rows-unbounded-preceding
    → keep left rows

Scale: one shuffle on the key (same as any join), then a linear window
pass per partition — no range-join explosion. Skewed keys behave like
any windowed aggregation (AQE/salting applies). Semantics match DuckDB
``ASOF LEFT JOIN`` given a right side deduplicated per (key, ts) —
duplicate right timestamps are nondeterministic in ANY as-of engine,
so dedup first (``dedup_subset``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join; right's ``value_cols`` (and its timestamp, as
    ``{prefix}{right_ts}``) arrive prefixed.

    ``direction="backward"`` (default): most recent right row with
    ``right_ts <= left_ts``. ``direction="forward"``: earliest right
    row with ``right_ts >= left_ts`` (time-to-next-event features) —
    the same single window pass, ordered descending.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    rtypes = dict(right.dtypes)
    # the right row travels as ONE struct so the as-of match is atomic:
    # per-column last(ignorenulls) would stitch columns from DIFFERENT
    # right rows whenever a value column is null
    struct_type = (
        "struct<"
        + ",".join([f"`{c}`:{rtypes[c]}" for c in value_cols] + [f"`{right_ts}`:{rtypes[right_ts]}"])
        + ">"
    )

    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(None).cast(struct_type).alias("_rrow"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in keys and c != left_ts],
        F.struct(*value_cols, right_ts).cast(struct_type).alias("_rrow"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal ts (_is_left asc) so a
    # same-timestamp right row is visible to the left row (<=, resp. >=,
    # semantics); forward direction just reverses the time order
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "_ts",
        "_is_left",
        *[c for c in left.columns if c not in keys and c != left_ts],
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[c for c in left.columns if c not in keys and c != left_ts],
        *[F.col(f"_rrow.{c}").alias(f"{prefix}{c}") for c in value_cols],
        F.col(f"_rrow.{right_ts}").alias(f"{prefix}{right_ts}"),
    )
