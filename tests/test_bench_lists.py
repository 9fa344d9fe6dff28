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
    assert not set(bench.R5_EXTRA) & set(bench.R6_EXTRA)
