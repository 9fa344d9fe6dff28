"""Round-7 batch-2 operators (cohort/concentration stats + k-core):
hand-computed expectations on crafted corpora, plus DuckDB oracle
parity on the same corpus.

Pins:
- Gini on revenues [1, 3] is exactly 0.25 (and 0.0 on equal books),
- MI of a perfectly dependent 2×2 contingency is ln 2,
- RFM quartiles with full (metric, id) tie-breaks bucket 4 users into
  4 distinct quartiles per axis,
- Kaplan-Meier: 2 of 4 convert at day 1 (S=0.5), 1 of the remaining 2
  at day 3 (S=0.25), the last censored — censored-only days never
  emit a row, and the risk set shrinks by PRIOR days' exits only,
- k-core peel: a pendant part drops in round 1, the triangle core
  survives with in-core degree 2 — and 6 rounds equals the fixpoint
  on the generated sf0.001 data (the documented contract).
"""

from __future__ import annotations

import datetime
import importlib.util
import math
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "compare_mod_cohort", os.path.join(_REPO, "tools", "compare.py")
)
_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_compare)

# orders/customer: segment SEG_A always takes priority 1-URGENT,
# SEG_B always 2-HIGH, two orders each -> MI = ln 2 exactly.
# revenues: cust 1 totals 1.0, cust 2 totals 3.0 -> gini 0.25.
_CUSTOMER = [(1, "SEG_A"), (2, "SEG_B")]
_ORDERS = [
    (10, 1, "1-URGENT", 0.4),
    (11, 1, "1-URGENT", 0.6),
    (12, 2, "2-HIGH", 1.0),
    (13, 2, "2-HIGH", 2.0),
]

# triangle {1,2,3} each pair co-purchased twice (support>=2 edge);
# pendant 4-1 also twice -> peels in round 1 (degree 1 < 2).
_LINEITEM = [
    (500, 1), (500, 2), (500, 3),
    (501, 1), (501, 2), (501, 3),
    (502, 1), (502, 4),
    (503, 1), (503, 4),
]

_T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _ts(days: float):
    return _T0 + datetime.timedelta(days=days)


# users 1,2 convert day 1; user 3 converts day 3; user 4 never does
# (censored at the corpus clock = day 5). user 5 has purchases but no
# signup (excluded from KM; included in RFM).
_EVENTS = [
    (1, _ts(0), 1, "signup", 0.0),
    (2, _ts(1), 1, "purchase", 10.0),
    (3, _ts(0), 2, "signup", 0.0),
    (4, _ts(1), 2, "purchase", 20.0),
    (5, _ts(0), 3, "signup", 0.0),
    (6, _ts(3), 3, "purchase", 30.0),
    (7, _ts(0), 4, "signup", 0.0),
    (8, _ts(2), 5, "purchase", 40.0),
    (9, _ts(4), 5, "purchase", 50.0),
    (10, _ts(5), 4, "click", 0.0),  # corpus clock anchor, never converts
]


@pytest.fixture(scope="module")
def cohort_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cohort_boundary"))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in _CUSTOMER], type=pa.int64()),
                "c_mktsegment": pa.array([r[1] for r in _CUSTOMER], type=pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in _ORDERS], type=pa.int64()),
                "o_custkey": pa.array([r[1] for r in _ORDERS], type=pa.int64()),
                "o_orderpriority": pa.array([r[2] for r in _ORDERS], type=pa.string()),
                "o_totalprice": pa.array([r[3] for r in _ORDERS], type=pa.float64()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in _LINEITEM], type=pa.int64()),
                "l_partkey": pa.array([r[1] for r in _LINEITEM], type=pa.int64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in _EVENTS], type=pa.int64()),
                "ts": pa.array([r[1] for r in _EVENTS], type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in _EVENTS], type=pa.int64()),
                "event_type": pa.array([r[3] for r in _EVENTS], type=pa.string()),
                "value": pa.array([r[4] for r in _EVENTS], type=pa.float64()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


_COHORT_QUERIES = [
    "stats_gini_concentration",
    "stats_mutual_info_priority_segment",
    "stats_cramers_v_priority_segment",
    "events_rfm_segments",
    "events_kaplan_meier",
    "graph_kcore_peel",
]


@pytest.mark.parametrize("name", _COHORT_QUERIES)
def test_cohort_boundary_oracle_parity(spark, cohort_dir, name):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    fn, sql = entrymod.queries()[name], entrymod.oracle_sql()[name]
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{cohort_dir}/{t}.parquet'"
        )
    r = _compare.compare_query(spark, con, name, fn, sql, cohort_dir)
    assert "error" not in r, r
    assert r.get("cols_match") and r.get("values_match"), r
    assert r["spark_rows"] == r["oracle_rows"], r


def test_gini_hand_computed(spark, cohort_dir):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    [r] = entrymod.queries()["stats_gini_concentration"](spark, cohort_dir).collect()
    # revenues 1.0 and 3.0: G = 2*(1*1 + 2*3)/(2*4) - 3/2 = 0.25
    assert r["n_customers"] == 2
    assert r["total_revenue"] == 4.0
    assert r["gini"] == 0.25


def test_mutual_info_perfect_dependence_is_ln2(spark, cohort_dir):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    [r] = entrymod.queries()["stats_mutual_info_priority_segment"](
        spark, cohort_dir
    ).collect()
    assert r["n_orders"] == 4 and r["n_cells"] == 2
    assert r["mi_nats"] == round(math.log(2), 6)


def test_kaplan_meier_curve(spark, cohort_dir):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    rows = {
        r["t_days"]: r
        for r in entrymod.queries()["events_kaplan_meier"](spark, cohort_dir).collect()
    }
    # day 1: 4 at risk, 2 convert -> S = 0.5
    assert rows[1]["n_risk"] == 4 and rows[1]["n_events"] == 2
    assert rows[1]["survival"] == 0.5
    # day 3: 2 at risk, 1 converts -> S = 0.25
    assert rows[3]["n_risk"] == 2 and rows[3]["n_events"] == 1
    assert rows[3]["survival"] == 0.25
    # censored-only day 5 emits no row; user 5 (no signup) never enters
    assert set(rows) == {1, 3}


def test_rfm_four_users_four_quartiles(spark, cohort_dir):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["events_rfm_segments"](spark, cohort_dir).collect()
    # purchasers: users 1,2,3,5 — 4 users, so each ntile(4) axis
    # assigns one user per quartile and every count is 1
    assert sum(r["n_users"] for r in rows) == 4
    assert all(r["n_users"] == 1 for r in rows)
    # user 5 purchased last (day 4) AND most (2 purchases, 90 total):
    # best recency, frequency, and monetary quartile simultaneously
    assert any(r["r"] == 1 and r["f"] == 1 and r["m"] == 1 for r in rows)


def test_kcore_pendant_peels_triangle_survives(spark, cohort_dir):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    rows = {
        r["p_partkey"]: r["core_degree"]
        for r in entrymod.queries()["graph_kcore_peel"](spark, cohort_dir).collect()
    }
    assert rows == {1: 2, 2: 2, 3: 2}


def test_kcore_six_rounds_is_fixpoint_on_testdata(spark, sf_dir):
    """The contract is '6 peel rounds'; on the generated data that IS
    the fixpoint — every surviving node keeps >= k neighbors inside
    the surviving set (one more round would change nothing)."""
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["graph_kcore_peel"](spark, sf_dir).collect()
    assert all(r["core_degree"] >= 2 for r in rows)


def test_cramers_v_perfect_dependence_is_one(spark, cohort_dir):
    """SEG_A always 1-URGENT, SEG_B always 2-HIGH: chi2 = n*(min-1),
    so V = 1.0 exactly; and the three dependence readouts reconcile
    (chi2 here equals the chi2 implied by MI = ln 2 dependence)."""
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    [r] = entrymod.queries()["stats_cramers_v_priority_segment"](
        spark, cohort_dir
    ).collect()
    assert r["n_orders"] == 4
    assert r["chi2"] == 4.0
    assert r["dof"] == 1
    assert r["cramers_v"] == 1.0


def test_chi2_includes_structurally_zero_cells(spark, cohort_dir):
    """The pre-existing chi2 query shares the zero-cell fix: on the
    perfect-dependence 2x2 its statistic is n*(min-1) = 4.0, not the
    2.0 an observed-cells-only sum produces."""
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    [r] = entrymod.queries()["stats_chi2_segment_priority"](
        spark, cohort_dir
    ).collect()
    assert r["chi2"] == 4.0 and r["dof"] == 1


def test_poisson_lut_pins_all_three_ladders(spark):
    """The bootstrap kernel's numpy LUT, the Spark CASE ladder
    (_poisson_weight), and the oracle's _POIS_CASE_SQL must give the
    identical Poisson(1) weight for EVERY 8-bit draw v — the kernel
    rewrite is only sound because all three are one function."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from emission_project_spark.plans.cohort_stats import (
        _POIS_CASE_SQL,
        _POIS_CDF,
        _poisson_weight,
    )

    lut = np.searchsorted(
        np.array(_POIS_CDF), np.arange(256) / 256.0, side="right"
    ).astype(np.int64)
    # Spark ladder over all 256 draws
    sdf = spark.range(256).select(
        F.col("id").alias("v"),
        _poisson_weight(F.col("id").cast("double") / F.lit(256.0)).alias("wt"),
    )
    spark_wt = {r["v"]: r["wt"] for r in sdf.collect()}
    # oracle ladder over all 256 draws
    con = duckdb.connect()
    orows = con.sql(
        "SELECT v, " + _POIS_CASE_SQL.replace("u", "(v / 256.0)") + " AS wt "
        "FROM (SELECT unnest(generate_series(0, 255)) AS v)"
    ).fetchall()
    oracle_wt = dict(orows)
    for v in range(256):
        assert int(lut[v]) == spark_wt[v] == oracle_wt[v], v
    # documented truncation: max u = 255/256 = 0.996094 < CDF[4] =
    # 0.996340, so the 8-bit grid collapses the Poisson tail (wt >= 5,
    # P = 0.59%) into wt = 4 — weights reach exactly {0..4}. The
    # replicate statistic is the ratio sum(wt*x)/sum(wt), invariant to
    # the weight mean, and the variance shift (~3%) is orders below
    # B = 200 resampling noise.
    assert set(int(w) for w in lut) == {0, 1, 2, 3, 4}
    assert int(lut[252]) == 4 and int(lut[251]) == 3
