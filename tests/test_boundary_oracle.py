"""Adversarial boundary-corpus oracle parity.

The driver's testdata carries microsecond-resolution timestamps that
essentially never land EXACTLY on a window edge, session gap, bucket
boundary, or join-interval endpoint — so the per-round hash gate cannot
distinguish `>` from `>=` in an oracle (this hid a real session-window
boundary divergence until round 4). This test reruns every
events-only registered query against a tiny corpus built to land ON
the boundaries:

- an event exactly at a tumbling-hour / sliding-15-min edge,
- a purchase exactly at signup + 1 h (interval-join closed endpoint),
- consecutive events exactly gap apart (session merge boundary),
- two events with identical (user, ts) (ordering/tie-break),
- an event exactly at midnight (daily pivot edge),
- zero and negative values.

Spark result and DuckDB oracle must still agree row-for-row.
"""

from __future__ import annotations

import datetime as dt
import importlib.util
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "compare_mod", os.path.join(_REPO, "tools", "compare.py")
)
_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_compare)

_T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ts(h=0, m=0, s=0, us=0, day=1):
    return dt.datetime(2024, 1, day, h, m, s, us)


# (event_id, ts, user_id, event_type, value, props)
_EVENTS = [
    # user 1 — signup→purchase interval boundary + window edges
    (1, _ts(10, 0, 0), 1, "signup", 1.0, '{"k": 1}'),
    (2, _ts(11, 0, 0), 1, "purchase", 5.0, '{"k": 2}'),        # exactly +1h
    (3, _ts(11, 0, 0, 1), 1, "purchase", 6.0, '{"k": 3}'),     # just past
    (4, _ts(10, 0, 0), 1, "click", 0.0, '{"k": 0}'),           # tie ts w/ signup
    (5, _ts(10, 15, 0), 1, "click", 2.5, '{"k": 4}'),          # slide edge
    (6, _ts(10, 2, 0), 1, "error", -1.5, '{"k": 5}'),          # range bucket edge
    (7, _ts(10, 30, 0), 1, "click", 3.0, '{"k": 6}'),
    (8, _ts(11, 0, 0), 1, "click", 4.0, '{"k": 7}'),           # exactly gap after 7
    # user 2 — session split just past the gap, midnight boundary
    (9, _ts(9, 0, 0), 2, "signup", 10.0, '{"k": 8}'),
    (10, _ts(9, 30, 0, 1), 2, "click", 11.0, '{"k": 9}'),      # gap + 1µs
    (11, _ts(0, 0, 0, 0, 2), 2, "purchase", 12.0, '{"k": 10}'),  # midnight day 2
    (12, _ts(23, 59, 59, 999999), 2, "view", 13.0, '{"k": 11}'),
    (13, _ts(10, 0, 0), 2, "error", 0.0, '{"k": 12}'),
    # user 3 — identical (user, ts) pair; full type coverage
    (14, _ts(12, 0, 0), 3, "click", 7.0, '{"k": 13}'),
    (15, _ts(12, 0, 0), 3, "click", 8.0, '{"k": 14}'),         # exact dup ts
    (16, _ts(12, 10, 0), 3, "purchase", 9.0, '{"k": 15}'),
    (17, _ts(12, 40, 0), 3, "view", 1.25, '{"k": 16}'),
    (18, _ts(13, 40, 0), 3, "error", 2.75, '{"k": 17}'),
    (19, _ts(8, 0, 0), 3, "signup", 14.0, '{"k": 18}'),
    # user 3 — a SECOND purchase at the identical µs as id 16:
    # same-timestamp purchase ties must credit/count deterministically
    # by event_id on both engines (attribution, RFM, funnels)
    (20, _ts(12, 10, 0), 3, "purchase", 9.5, '{"k": 19}'),
    # user 4 — all-censored journey: signup + touches, NEVER a
    # purchase (Kaplan-Meier censored mass; zero-conversion paths);
    # the lone view 6 h later is a SINGLE-EVENT session for path
    # mining and a lone-touch tail for attribution
    (21, _ts(14, 0, 0), 4, "signup", 0.0, '{"k": 20}'),
    (22, _ts(14, 5, 0), 4, "click", 1.0, '{"k": 21}'),
    (23, _ts(20, 0, 0), 4, "view", 2.0, '{"k": 22}'),
    # user 1 — a touch at the SAME µs as purchase id 3 but a HIGHER
    # event_id: the (ts, event_id) window order decides whether the
    # purchase sees it; both engines must agree
    (24, _ts(11, 0, 0, 1), 1, "click", 0.5, '{"k": 23}'),
]


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boundary"))
    cols = list(zip(*_EVENTS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], type=pa.int64()),
            "ts": pa.array(cols[1], type=pa.timestamp("us")),
            "user_id": pa.array(cols[2], type=pa.int64()),
            "event_type": pa.array(cols[3], type=pa.string()),
            "value": pa.array(cols[4], type=pa.float64()),
            "props": pa.array(cols[5], type=pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


def _events_only_queries():
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    others = (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split()
    out = []
    for name, sql in oracles.items():
        if re.search(r"\bevents\b", sql) and not any(
            re.search(rf"\b{t}\b", sql) for t in others
        ):
            out.append((name, queries[name], sql))
    return out


def test_boundary_corpus_covers_queries():
    assert len(_events_only_queries()) >= 12


@pytest.mark.parametrize(
    "name,fn,sql", _events_only_queries(), ids=[n for n, _, _ in _events_only_queries()]
)
def test_boundary_corpus_oracle_parity(spark, boundary_dir, name, fn, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE OR REPLACE VIEW events AS"
        f" SELECT * FROM '{boundary_dir}/events.parquet'"
    )
    r = _compare.compare_query(spark, con, name, fn, sql, boundary_dir)
    assert "error" not in r, r
    assert r.get("cols_match") and r.get("values_match"), r
    assert r["spark_rows"] == r["oracle_rows"], r


def test_kaplan_meier_all_censored_cohort(spark, tmp_path_factory):
    """A corpus where NO user ever converts: every duration is
    right-censored at the corpus clock, so the per-day histogram has
    d = 0 everywhere and the KM output is EMPTY (the `WHERE d > 0`
    contract) on both engines — not a crash, not a ln(0)/divide
    hazard, and the same zero rows from Spark and DuckDB."""
    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod

    d = str(tmp_path_factory.mktemp("km_censored"))
    rows = [
        (1, _ts(9, 0, 0), 1, "signup", 0.0, "{}"),
        (2, _ts(10, 0, 0), 1, "click", 1.0, "{}"),
        (3, _ts(9, 0, 0, 0, 2), 2, "signup", 0.0, "{}"),
        (4, _ts(11, 0, 0, 0, 3), 2, "view", 2.0, "{}"),
        (5, _ts(12, 0, 0, 0, 4), 3, "signup", 0.0, "{}"),
    ]
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], type=pa.int64()),
                "ts": pa.array(cols[1], type=pa.timestamp("us")),
                "user_id": pa.array(cols[2], type=pa.int64()),
                "event_type": pa.array(cols[3], type=pa.string()),
                "value": pa.array(cols[4], type=pa.float64()),
                "props": pa.array(cols[5], type=pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    fn = entrymod.queries()["events_kaplan_meier"]
    sql = entrymod.oracle_sql()["events_kaplan_meier"]
    r = _compare.compare_query(spark, con, "events_kaplan_meier", fn, sql, d)
    assert "error" not in r, r
    assert r["spark_rows"] == r["oracle_rows"] == 0, r
