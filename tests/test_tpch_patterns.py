"""Semantic checks for the TPC-H-pattern queries (plans/tpch_patterns.py)
beyond the hash-vs-oracle gate: internal consistency properties that
hold at any sf, plus a constructed-data unit test for the skew profile
operator the last query wraps."""

from __future__ import annotations

import pytest

from emission_project_spark.plans.tpch_patterns import (
    join_full_outer_reconcile,
    join_q13_order_count_distribution,
    join_q18_large_volume_customers,
    join_q21_lone_late_supplier,
)

SF = "/root/testdata/sf0.001"


def test_q13_distribution_partitions_customers(spark):
    """custdist is a partition of the customer table: counts sum to the
    full customer cardinality (zero-order customers included — the LEFT
    OUTER join's whole point)."""
    from pyspark.sql import functions as F

    dist = join_q13_order_count_distribution(spark, SF)
    total = dist.agg(F.sum("custdist")).first()[0]
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == n_cust
    # and the zero bucket exists or every customer ordered — both legal,
    # but counts must all be positive
    assert dist.filter(F.col("custdist") <= 0).count() == 0


def test_q18_every_row_exceeds_threshold(spark):
    """Recompute each returned order's quantity sum independently and
    assert the HAVING threshold held."""
    from pyspark.sql import functions as F

    out = join_q18_large_volume_customers(spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    recomputed = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("rq")
    )
    joined = out.join(
        recomputed, out["o_orderkey"] == recomputed["l_orderkey"]
    )
    assert joined.count() == out.count()  # every order resolves
    assert joined.filter(F.col("rq") != F.col("sum_qty")).count() == 0
    assert joined.filter(F.col("rq") <= 250).count() == 0


def test_q21_suppliers_have_late_lines_and_company(spark):
    """Every reported supplier must (a) have at least one late line in
    some multi-supplier order and (b) numwait >= 1; and no order can be
    counted for two different suppliers (the n_late = 1 filter)."""
    from pyspark.sql import functions as F

    out = join_q21_lone_late_supplier(spark, SF)
    rows = out.collect()
    assert all(r["numwait"] >= 1 for r in rows)

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    late_sup = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 1000
        )
        .select("l_suppkey")
        .distinct()
    )
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    late_names = {
        r["s_name"]
        for r in late_sup.join(
            s, late_sup["l_suppkey"] == s["s_suppkey"]
        ).select("s_name").collect()
    }
    assert {r["s_name"] for r in rows} <= late_names


def test_full_outer_reconcile_covers_union_of_customers(spark):
    """The three status buckets partition the union of 1996/1997 active
    customers exactly."""
    from pyspark.sql import functions as F

    out = join_full_outer_reconcile(spark, SF).collect()
    by_status = {r["status"]: r for r in out}
    assert set(by_status) <= {"both", "only_1996", "only_1997"}

    o = spark.read.parquet(f"{SF}/orders.parquet")
    od = F.to_date("o_orderdate")
    a = (
        o.filter((od >= F.lit("1996-01-01")) & (od < F.lit("1997-01-01")))
        .select("o_custkey").distinct()
    )
    b = (
        o.filter((od >= F.lit("1997-01-01")) & (od < F.lit("1998-01-01")))
        .select("o_custkey").distinct()
    )
    n_union = a.union(b).distinct().count()
    assert sum(r["n_customers"] for r in out) == n_union
    n_both = a.intersect(b).count()
    if n_both:
        assert by_status["both"]["n_customers"] == n_both


def test_key_skew_profile_constructed(spark):
    """Exact profile on a hand-built skewed frame: A×8, B×1, C×1."""
    from emission_project_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("A",)] * 8 + [("B",)] * 1 + [("C",)] * 1, ["k"]
    )
    row = key_skew_profile(df, "k").first()
    assert row["n_keys"] == 3
    assert row["total_rows"] == 10
    assert row["max_cnt"] == 8
    assert row["min_cnt"] == 1
    assert row["avg_cnt"] == pytest.approx(10 / 3, abs=1e-6)
    assert row["skew_ratio"] == pytest.approx(8 / (10 / 3), abs=1e-6)
    assert row["n_heavy"] == 1  # only A exceeds 2×avg (6.67)
