"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship roll-up on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
training-data extensions), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for the driver's correctness
gate (row-count + schema + order-insensitive value hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emission_project_spark.plans import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue rolled up per customer nation — the
    reference's "total emission on a brand level" surface (README.md:3)
    re-expressed on the testdata star schema (broadcast dim joins +
    partial/final hash aggregate)."""
    from emission_project_spark.plans.relational import role_playing_nation_join

    return role_playing_nation_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry.ORACLES)
