"""Pin exchange reuse: the basket relation feeds three consumers
(pair counts, per-part counts, order total) off ONE shuffle.

plans/relational.py::basket_part_pairs_lift is designed so all three
consumers share the identical basket subplan; Spark's exchange-reuse
rule must then compile the repeated scans into ReusedExchange nodes —
the fact scan and the basket exchange run once, not three times. This
is the engine behavior the query's "5 scans down to 2 effective" cost
claim rests on, so it's pinned here rather than assumed.
"""

from __future__ import annotations


def test_basket_lift_reuses_exchange(spark, sf_dir):
    from emission_project_spark.plans.relational import basket_part_pairs_lift

    df = basket_part_pairs_lift(spark, sf_dir)
    df.collect()  # finalize the adaptive plan on this queryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan[:3000]
