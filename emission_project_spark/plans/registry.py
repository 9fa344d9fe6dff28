"""Query registry — the driver-facing catalog of named queries.

Each entry pairs a PySpark query builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (run by the driver
at sf0.01 and hash-compared). Non-SQL-expressible operators register
with ``oracle=None`` → the driver records a rows-only check.

Column-name discipline: every computed column is aliased identically on
both sides (driver compares after sorting columns by name).
Float discipline: every order-of-addition-sensitive aggregate is
``round()``-ed identically on both sides so ulp-level accumulation
differences between engines don't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from emission_project_spark.plans import relational  # noqa: F401
    from emission_project_spark.plans import extensions  # noqa: F401
