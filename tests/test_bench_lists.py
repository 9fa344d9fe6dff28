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
        bench.R8_EXTRA,
        bench.SF1_HEAVY,
        bench.SF10_HEAVY,
    ):
        unknown = [n for n in lst if n not in registered]
        assert unknown == [], unknown


def test_bench_lists_disjoint_headline_extra():
    # HEADLINE is the round-over-round comparable — extras must not
    # double-time its members under a different block
    blocks = {
        "HEADLINE": bench.HEADLINE,
        "R5": bench.R5_EXTRA,
        "R6": bench.R6_EXTRA,
        "R7": bench.R7_EXTRA,
        "R8": bench.R8_EXTRA,
    }
    names = list(blocks)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            overlap = set(blocks[a]) & set(blocks[b])
            assert not overlap, (a, b, overlap)


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


def test_py_calibration_probe_is_gil_bound():
    """The pure-python probe pair must exist and a 2-worker fork run
    must land within 2x of a single worker on any non-saturated host —
    the property the BLAS-threaded legacy probe lacks (it reads ~7x on
    an idle 32-core box, the round-8 finding)."""
    import bench

    single = bench.cpu_calibration_py()
    mt = bench.cpu_calibration_py_mt(n_workers=2)
    assert 0 < single < 10 and 0 < mt < 20
