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


def test_proc_stat_steal_probe():
    """The round-9 co-tenant audit: read_proc_stat returns a
    monotone (steal, total) pair and steal_pct_since handles the
    degenerate cases (None snapshot, zero elapsed) without raising."""
    import time

    snap = bench.read_proc_stat()
    assert snap is not None  # linux container: /proc/stat exists
    steal, total = snap
    assert steal >= 0 and total > steal
    assert bench.steal_pct_since(None) is None
    # an immediate re-read may land inside the same scheduler tick
    # (zero elapsed jiffies → None) or one tick later (a valid pct) —
    # both are correct; only an exception or a wild value is a bug
    quick = bench.steal_pct_since(snap)
    assert quick is None or 0.0 <= quick <= 100.0
    time.sleep(1.2)
    pct = bench.steal_pct_since(snap)
    assert pct is not None and 0.0 <= pct <= 100.0


def test_py_calibration_is_median_of_three():
    """cpu_calibration_py medians 3 GIL-bound loops (the r9 fix for
    the 0.33-0.50 s single-shot turbo spread) — it must return a
    plausible per-loop time, not the 3-loop total."""
    t = bench.cpu_calibration_py()
    assert 0.05 < t < 5.0


def test_sf10_expected_bands_reference_heavy_queries():
    """Every expected band must name a query actually measured in the
    sf10 block (a rename would silently orphan its band), with lo < hi
    and the registry resolving the name."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name, (lo, hi) in bench.SF10_EXPECTED_BANDS.items():
        assert name in bench.SF10_HEAVY, name
        assert name in qs, name
        assert 0 < lo < hi, name


def test_mem_fault_probe_returns_plausible_bandwidth():
    """First-touch probe (round 12): GB/s in the physically possible
    range — the measured host envelope spans 0.01 (degraded window) to
    a few GB/s (quiet); anything outside [0.001, 100] is a unit bug."""
    v = bench.mem_fault_calibration()
    assert 0.001 <= v <= 100.0
