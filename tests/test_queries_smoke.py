"""Smoke: every registered query runs at sf0.001 and returns a stable
schema; every oracle key refers to a registered query. The full
value-level oracle parity runs in tools/compare.py (and in the driver)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.columns) == len(set(df.columns))  # no duplicate col names
    assert df.count() >= 0
