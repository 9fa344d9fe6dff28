"""Pin the top-k physical strategy: every LIMIT-after-ORDER query must
compile to TakeOrderedAndProject (per-partition bounded heaps merged at
the driver), never a global Sort + CollectLimit.

This is the plan property the Q3/Q10 "no global sort at 100 TB" cost
claims rest on: a global sort is a full shuffle of the aggregated
relation, while TakeOrderedAndProject ships k rows per partition. Spark
applies it only when the limit is small and sits directly over the
sort — a refactor that slips a projection or exchange between them
silently reverts to the global sort, which is exactly the regression
this pin catches.
"""

from __future__ import annotations

import pytest

TOPK_QUERIES = [
    "join_q3_shipping_priority",
    "join_q10_returned_top_customers",
    "topk_orders_by_price",
]


@pytest.mark.parametrize("name", TOPK_QUERIES)
def test_topk_compiles_to_take_ordered(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:3000]
