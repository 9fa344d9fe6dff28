"""Multi-dimensional data layout: Morton (Z-order) clustering.

At 100 TB the dominant cost of a selective query is how many files its
predicate touches. Sorting the table on ONE key makes that key's
min/max zone-maps perfectly selective and every other key's useless;
interleaving the bits of two keys (Morton order — the technique behind
Delta Lake OPTIMIZE ZORDER BY and Iceberg's z-ordered sort, both
public) gives every interleaved dimension *partial* locality, so a
rectangle predicate over (x, y) touches O(perimeter) files instead of
O(all of them).

Everything here is exact integer arithmetic on JVM built-ins (shifts,
masks, adds) — whole-stage-codegen'd, zero shuffles to compute the key
itself — and is restated verbatim in the DuckDB oracle via ``//`` and
``%`` so the assignment is cross-engine checkable bit for bit.

Reference behavior: the reference engine has no layout optimizer (it
appends to Postgres heap tables, emission-dag.py §load); this operator
is part of the 100 TB extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_z(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of non-negative ints x and y
    into the 2·bits-bit Morton code (x in even positions, y in odd).

    Expanded as a fixed sum of shift/mask terms — a pure codegen'd
    expression column, usable as a sort/bucket key at any scale.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton_z_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """The DuckDB restatement of :func:`morton_z` — same bit layout
    via integer division/modulo (no engine-specific bit intrinsics),
    so oracle SQL can replay the exact file assignment."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
