"""Negative controls for the oracle-parity harness itself.

Every correctness claim in this repo flows through
``tools/compare.py::compare_query`` (locally) and the driver's
equivalent gate. A harness that silently passed on mismatches would
make 185 green rows meaningless — so the failure modes are pinned
here: a seeded value drift, a dropped row, a renamed column, and a
float exactly at the canonicalization grid must each be DETECTED,
while a genuine match must pass.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "compare_mod_neg", os.path.join(_REPO, "tools", "compare.py")
)
_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_compare)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql("CREATE OR REPLACE VIEW t AS SELECT * FROM (VALUES (1, 10.5), (2, 20.25)) v(k, x)")
    return c


def _q(rows, schema="k bigint, x double"):
    def fn(spark, sf_dir):
        return spark.createDataFrame(rows, schema)

    return fn


ORACLE = "SELECT k, x FROM t"


def test_genuine_match_passes(spark, con):
    r = _compare.compare_query(
        spark, con, "ok", _q([(1, 10.5), (2, 20.25)]), ORACLE, ""
    )
    assert r["cols_match"] and r["values_match"]
    assert r["spark_rows"] == r["oracle_rows"] == 2


def test_row_order_is_irrelevant(spark, con):
    r = _compare.compare_query(
        spark, con, "reorder", _q([(2, 20.25), (1, 10.5)]), ORACLE, ""
    )
    assert r["values_match"]


def test_value_drift_detected(spark, con):
    r = _compare.compare_query(
        spark, con, "drift", _q([(1, 10.5), (2, 20.2500001)]), ORACLE, ""
    )
    assert r["values_match"] is False
    assert r["only_spark"] and r["only_oracle"]


def test_sub_grid_noise_absorbed(spark, con):
    """Differences below the 1e-9 canonicalization grid are engine ulp
    noise by construction and must NOT flip the verdict."""
    r = _compare.compare_query(
        spark, con, "ulp", _q([(1, 10.5), (2, 20.25 + 1e-12)]), ORACLE, ""
    )
    assert r["values_match"] is True


def test_missing_row_detected(spark, con):
    r = _compare.compare_query(spark, con, "short", _q([(1, 10.5)]), ORACLE, "")
    assert r["spark_rows"] == 1 and r["oracle_rows"] == 2
    assert r["values_match"] is False


def test_duplicate_row_multiset_detected(spark, con):
    """Value comparison is a MULTISET: a duplicated row on one side
    must fail even though every individual row value exists on both."""
    r = _compare.compare_query(
        spark, con, "dupe", _q([(1, 10.5), (1, 10.5)]), ORACLE, ""
    )
    assert r["values_match"] is False


def test_renamed_column_detected(spark, con):
    def fn(spark_, sf_dir):
        return spark_.createDataFrame(
            [(1, 10.5), (2, 20.25)], "k bigint, x double"
        ).select("k", F.col("x").alias("y"))

    r = _compare.compare_query(spark, con, "cols", fn, ORACLE, "")
    assert r["cols_match"] is False


def test_engine_error_surfaces(spark, con):
    r = _compare.compare_query(
        spark, con, "err", _q([(1, 10.5)]), "SELECT nope FROM t", ""
    )
    assert "error" in r and "oracle" in r["error"]
