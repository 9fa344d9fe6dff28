"""Every query name bench.py times must resolve in the registry — a
typo here would only surface when the external driver runs the bench,
long after the commit that introduced it."""

from __future__ import annotations

import bench
import __spark_entry__ as entrymod


def test_bench_lists_resolve():
    registered = set(entrymod.queries())
    for lst in (
        bench.HEADLINE,
        bench.R5_EXTRA,
        bench.R6_EXTRA,
        bench.R7_EXTRA,
        bench.SF1_HEAVY,
        bench.SF10_HEAVY,
    ):
        unknown = [n for n in lst if n not in registered]
        assert unknown == [], unknown


def test_bench_lists_disjoint_headline_extra():
    # HEADLINE is the round-over-round comparable — extras must not
    # double-time its members under a different block
    assert not set(bench.HEADLINE) & set(bench.R5_EXTRA)
    assert not set(bench.HEADLINE) & set(bench.R6_EXTRA)
    assert not set(bench.HEADLINE) & set(bench.R7_EXTRA)
    assert not set(bench.R5_EXTRA) & set(bench.R6_EXTRA)
    assert not set(bench.R5_EXTRA) & set(bench.R7_EXTRA)
    assert not set(bench.R6_EXTRA) & set(bench.R7_EXTRA)


def test_mt_calibration_probe_runs_and_bounds():
    # the all-cores twin must complete quickly and can never beat a
    # single worker's loop (it RUNS 32 of them; equality only on an
    # impossibly ideal fork)
    import time

    t0 = time.perf_counter()
    single = bench.cpu_calibration_mt(n_workers=1)
    mt = bench.cpu_calibration_mt(n_workers=4)
    assert 0 < single < 30 and 0 < mt < 60
    assert time.perf_counter() - t0 < 90
