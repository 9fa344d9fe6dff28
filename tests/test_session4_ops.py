"""Constructed invariants for the session-4 queries — properties the
oracle hash can't state (it only proves engine parity, not meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngram_novelty_first_doc_and_mass_balance(spark, sf_dir):
    from emission_project_spark.functions.text import tokens
    from emission_project_spark.plans.curation_lm import text_ngram_novelty
    from emission_project_spark.catalog.tables import load_table

    nov = text_ngram_novelty(spark, sf_dir)
    rows = {r["doc_id"]: r for r in nov.collect()}
    # the earliest eligible doc introduces every one of its grams
    first_doc = min(rows)
    assert rows[first_doc]["novelty"] == 1.0
    # mass balance: every distinct gram has exactly one first owner
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("toks"), i),
                        F.element_at(F.col("toks"), i + 1),
                        F.element_at(F.col("toks"), i + 2),
                    ),
                )
            ).alias("gram")
        )
        .agg(F.countDistinct("gram").alias("n"))
        .first()["n"]
    )
    assert sum(r["n_novel"] for r in rows.values()) == grams


def test_cumulative_users_totals(spark, sf_dir):
    from emission_project_spark.plans.quality_gates import events_cumulative_users
    from emission_project_spark.catalog.tables import load_table

    rows = events_cumulative_users(spark, sf_dir).orderBy("hour").collect()
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_users"] == total_users
    assert sum(r["new_users"] for r in rows) == total_users
    # running sum is strictly increasing (every bucket adds someone new
    # by construction — buckets only exist where a debut happened)
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)


def test_q10_topk_shape(spark, sf_dir):
    from emission_project_spark.plans.tpch_patterns2 import (
        join_q10_returned_top_customers,
    )

    rows = join_q10_returned_top_customers(spark, sf_dir).collect()
    assert len(rows) == 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q15_is_argmax(spark, sf_dir):
    from emission_project_spark.plans.tpch_patterns2 import join_q15_top_supplier

    rows = join_q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    # all returned suppliers share the (single) maximal revenue
    assert len({r["total_revenue"] for r in rows}) == 1
