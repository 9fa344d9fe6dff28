"""Count-min sketch over a token/term stream (Cormode & Muthukrishnan
'05) — sublinear-memory frequency estimation.

Why an engine needs it at 100 TB: exact term frequencies require a
shuffle keyed by term over the full token stream; a count-min sketch
collapses that to ``depth × width`` counters that partial (map-side)
aggregation reduces to ≤ d·w rows per partition BEFORE the shuffle —
the shuffle moves kilobytes regardless of corpus size, and sketches
from disjoint corpus shards merge by cell-wise addition.

Determinism: the hash family is md5-derived (``h_d(t) = int(md5(d:t)
[:7hex]) mod width``) — no RNG, identical in Spark and DuckDB, so both
the sketch table and every estimate are oracle-checkable. Estimates
overcount (never undercount): estimate ≥ true, with error ≤ 2N/width
at probability 1-2^-depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def _bucket(depth_col, term_col, width: int):
    """md5-derived row-d hash bucket of a term — 28-bit prefix mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", depth_col.cast("string"), term_col)), 1, 7),
        16,
        10,
    ).cast("bigint")
    return h % width


def count_min_build(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: ``(depth, bucket, cnt)`` — one row per non-empty
    cell. One pass over the term stream: each occurrence fans out to
    ``depth`` (row, bucket) cells via a small explode, then a single
    hash aggregate whose keyspace is ≤ depth·width (map-side combine
    collapses everything before the shuffle)."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth")
    fanned = terms.select(F.col(term_col).alias("_t"), d)
    return (
        fanned.select("depth", _bucket(F.col("depth"), F.col("_t"), width).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str = "term",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-estimate each query term's frequency: min over the sketch
    rows of the term's cell counters. The sketch (≤ depth·width rows)
    broadcasts; estimation is a map-side join + one small aggregate."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth")
    probes = queries.select(F.col(term_col).alias(term_col), d).select(
        term_col,
        "depth",
        _bucket(F.col("depth"), F.col(term_col), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): cell-wise
    addition — the property that lets disjoint corpus shards sketch
    independently and combine."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


# --- Bloom filter (Bloom '70), sparse representation -----------------
# The membership companion to the count-min sketch: the filter is the
# DISTINCT (row, bit) table of the keys' hash positions (≤ depth·width
# rows however many keys went in) — mergeable by union, buildable with
# one small aggregate, probe-able with a broadcast join. No false
# negatives; false-positive rate falls as width grows.


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sparse filter ``(depth, bucket)`` over the key set."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth")
    return (
        keys.select(F.col(key_col).alias("_k"), d)
        .select("depth", _bucket(F.col("depth"), F.col("_k"), width).alias("bucket"))
        .distinct()
    )


def bloom_contains(
    bloom: DataFrame,
    queries: DataFrame,
    key_col: str = "key",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Probe: adds boolean ``possibly_present`` — true iff ALL depth bit
    positions of the key are set. Guaranteed true for every inserted
    key (no false negatives); may be true for absent keys at the
    filter's false-positive rate. Filter broadcasts; probing is
    map-side + one small aggregate.

    Keys are deduplicated before probing: a key appearing k times
    would otherwise contribute k rows per depth and a partial match
    (depth/k bits set) could masquerade as a full match in the
    all-bits count."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth")
    probes = queries.select(F.col(key_col)).distinct().select(F.col(key_col), d).select(
        key_col,
        "depth",
        _bucket(F.col("depth"), F.col(key_col), width).alias("bucket"),
    )
    hit = F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
    return (
        probes.join(
            F.broadcast(bloom.withColumn("_hit", F.lit(1))), ["depth", "bucket"], "left"
        )
        .groupBy(key_col)
        .agg((F.sum(hit) == depth).alias("possibly_present"))
    )


def count_min_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """AMS-style inner-product estimate from two count-min sketches
    built with the same hash family: per depth row, the dot product of
    the two counter vectors; the estimate is the MIN over rows
    (Cormode & Muthukrishnan '05 §4.2). For frequency vectors f, g
    this estimates Σ_k f(k)·g(k) — the JOIN SIZE of the two keyed
    relations — and with a = b it is the second frequency moment F2
    (self-join size), the canonical key-skew statistic. Provably ≥ the
    true value (hash collisions only ever add mass).

    Scale shape: both operands are ≤ depth·width cell rows, so the
    join and both aggregates are sketch-sized — the ability to price a
    join (or measure skew) WITHOUT executing it is the point at 100 TB:
    shards sketch independently, merge cell-wise, and the planner reads
    one number. Returns one row: ``estimate``."""
    per_row = (
        a.select("depth", "bucket", F.col("cnt").alias("_ca"))
        .join(
            b.select("depth", "bucket", F.col("cnt").alias("_cb")),
            ["depth", "bucket"],
        )
        .groupBy("depth")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    return per_row.agg(F.min("_ip").alias("estimate"))
