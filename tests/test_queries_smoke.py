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


def test_priority_window_names_all_registered():
    """Every _PRIORITY name must resolve to a registered query — a typo
    would silently shrink the driver's 50-slot correctness window."""
    from emission_project_spark.plans import registry

    unknown = [n for n in registry._PRIORITY if n not in QUERIES]
    assert unknown == []
    # and the window is fully subscribed: at least 50 registered names
    assert len(registry._PRIORITY) >= 50


def test_every_query_has_oracle():
    """Round-5 invariant: the whole registry is hash-checkable (the HLL
    row was restructured precisely so no rows-only entries remain)."""
    assert sorted(ORACLES) == sorted(QUERIES)
