"""Distribution-drift monitors: KS two-sample, Mann-Whitney U, PSI.

The three standard detectors an ML-ops pipeline runs over feature /
metric distributions before trusting a new data batch:

- ``stats_ks_two_sample`` — exact Kolmogorov-Smirnov D between two
  samples' ECDFs (click vs purchase event values): the distribution-
  level "are these the same?" test that mean-based Welch misses when
  shapes differ but means agree.
- ``stats_mannwhitney_u`` — the rank-sum (Wilcoxon/Mann-Whitney) test
  with average-rank tie handling and the tie-corrected normal
  approximation: the non-parametric location test for skewed metrics
  where the t-test's normality assumption fails.
- ``stats_psi_value_drift`` — Population Stability Index between the
  first and second half of the event stream's time range, over fixed
  value bins: the industry-standard drift score (>0.2 = action).

Reference parity note: the reference engine (emission-dag.py) has no
statistics surface at all; these extend the stats family
(Welch/OLS/chi-squared) mandated by SURVEY.md §7.6.

Plan-shape discipline: all three aggregate the fact scan down to a
value-cell / bin table FIRST (hash partial-agg; events carry ~6.6k
distinct 2-decimal values per 10k rows, so the cell table is bounded
far below row count), then run windows/re-aggregates over that small
frame. The one global ordering each test needs (the ECDF / rank walk)
is a window over the CELL table, not the events — at 100 TB the same
plan holds by coarsening the cell grid (round the value before the
group-by), a one-line knob that trades resolution for cell count.
ECDF gaps and rank statistics are computed in double (cum/total) —
counts stay exact integers through the window; only the final ratios
are floating, so int64 overflow of count products is structurally
impossible at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.plans.registry import register

_A, _B = "click", "purchase"
_PSI_SPLIT = "2024-01-16 00:00:00"  # generator's event window is fixed Jan 2024


# --- exact two-sample KS. One cell per distinct value with per-side
# counts, running cumsums over the value ordering, D = max |F_a - F_b|.
# Rejection at 5%: D > 1.358·sqrt((n_a+n_b)/(n_a·n_b)).
@register(
    "stats_ks_two_sample",
    oracle=f"""
    WITH cells AS (
        SELECT value,
               count(*) FILTER (WHERE event_type = '{_A}') AS c_a,
               count(*) FILTER (WHERE event_type = '{_B}') AS c_b
        FROM events
        WHERE event_type IN ('{_A}', '{_B}')
        GROUP BY value
    ),
    walk AS (
        SELECT sum(c_a) OVER (ORDER BY value) AS cum_a,
               sum(c_b) OVER (ORDER BY value) AS cum_b,
               sum(c_a) OVER () AS n_a,
               sum(c_b) OVER () AS n_b
        FROM cells
    )
    SELECT CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           round(max(abs(CAST(cum_a AS DOUBLE) / n_a
                         - CAST(cum_b AS DOUBLE) / n_b)), 6) AS d_stat,
           round(1.358 * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)
                              / (max(n_a) * max(n_b))), 6) AS crit_5pct,
           (max(abs(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b))
            > 1.358 * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)
                           / (max(n_a) * max(n_b)))) AS drifted_5pct
    FROM walk
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.filter(F.col("event_type").isin(_A, _B))
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == _A, 1)).alias("c_a"),
            F.count(F.when(F.col("event_type") == _B, 1)).alias("c_b"),
        )
    )
    run = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    walk = cells.select(
        F.sum("c_a").over(run).alias("cum_a"),
        F.sum("c_b").over(run).alias("cum_b"),
        F.sum("c_a").over(tot).alias("n_a"),
        F.sum("c_b").over(tot).alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a")
        - F.col("cum_b").cast("double") / F.col("n_b")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.max("n_a") + F.max("n_b")).cast("double") / (F.max("n_a") * F.max("n_b"))
    )
    return walk.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.round(F.max(gap), 6).alias("d_stat"),
        F.round(crit, 6).alias("crit_5pct"),
        (F.max(gap) > crit).alias("drifted_5pct"),
    )


# --- Mann-Whitney U with average ranks for ties and the tie-corrected
# normal approximation. Same cell table as KS; a cell of t tied values
# spanning combined ranks (cum-t+1 .. cum) contributes its side counts
# at the average rank cum - (t-1)/2. U_a = R_a - n_a(n_a+1)/2;
# σ² = n_a·n_b/12 · [(N+1) - Σ(t³-t)/(N(N-1))].
@register(
    "stats_mannwhitney_u",
    oracle=f"""
    WITH cells AS (
        SELECT value,
               count(*) FILTER (WHERE event_type = '{_A}') AS c_a,
               count(*) FILTER (WHERE event_type = '{_B}') AS c_b
        FROM events
        WHERE event_type IN ('{_A}', '{_B}')
        GROUP BY value
    ),
    walk AS (
        SELECT c_a, c_a + c_b AS t,
               sum(c_a + c_b) OVER (ORDER BY value) AS cum,
               sum(c_a) OVER () AS n_a,
               sum(c_b) OVER () AS n_b
        FROM cells
    ),
    s AS (
        SELECT max(n_a) AS n_a, max(n_b) AS n_b,
               sum(c_a * (CAST(cum AS DOUBLE) - (t - 1) / 2.0)) AS r_a,
               sum(CAST(t AS DOUBLE) * t * t - t) AS ties
        FROM walk
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(r_a - n_a * (n_a + 1) / 2.0, 1) AS u_stat,
           round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a * CAST(n_b AS DOUBLE) / 12.0
                        * ((n_a + n_b + 1)
                           - ties / (CAST(n_a + n_b AS DOUBLE)
                                     * (n_a + n_b - 1)))), 4) AS z_stat,
           (abs((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                / sqrt(n_a * CAST(n_b AS DOUBLE) / 12.0
                       * ((n_a + n_b + 1)
                          - ties / (CAST(n_a + n_b AS DOUBLE)
                                    * (n_a + n_b - 1))))) > 1.96)
               AS significant_5pct
    FROM s
    """,
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.filter(F.col("event_type").isin(_A, _B))
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == _A, 1)).alias("c_a"),
            F.count(F.when(F.col("event_type") == _B, 1)).alias("c_b"),
        )
    )
    run = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    t = F.col("c_a") + F.col("c_b")
    walk = cells.select(
        "c_a",
        t.alias("t"),
        F.sum(t).over(run).alias("cum"),
        F.sum("c_a").over(tot).alias("n_a"),
        F.sum("c_b").over(tot).alias("n_b"),
    )
    s = walk.agg(
        F.max("n_a").alias("_n_a"),
        F.max("n_b").alias("_n_b"),
        F.sum(
            F.col("c_a") * (F.col("cum").cast("double") - (F.col("t") - 1) / 2.0)
        ).alias("_r_a"),
        F.sum(F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")).alias(
            "_ties"
        ),
    )
    n_a, n_b = F.col("_n_a"), F.col("_n_b")
    u = F.col("_r_a") - n_a * (n_a + 1) / 2.0
    n = n_a + n_b
    sigma = F.sqrt(
        n_a * n_b.cast("double") / 12.0
        * ((n + 1) - F.col("_ties") / (n.cast("double") * (n - 1)))
    )
    z = (u - n_a * n_b / 2.0) / sigma
    return s.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(u, 1).alias("u_stat"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


# --- PSI over fixed 50-wide value bins (domain [0, 500)), early half
# vs late half of the stream's fixed Jan-2024 window. Laplace +0.5 per
# bin keeps one-sided bins finite (the standard smoothing); the 10-row
# bin frame carries its own total via an unpartitioned window. The
# fixed bin grid (not data-derived quantiles) is deliberate: it is the
# production form — the reference distribution's bin edges are frozen
# when the monitor is installed, so scoring a new batch is one scan +
# one 10-cell aggregate with no second pass to find edges.
@register(
    "stats_psi_value_drift",
    oracle=f"""
    WITH b AS (
        SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
               count(*) FILTER (WHERE ts < TIMESTAMP '{_PSI_SPLIT}') AS c_early,
               count(*) FILTER (WHERE ts >= TIMESTAMP '{_PSI_SPLIT}') AS c_late
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT bin, c_early, c_late,
               (c_early + 0.5) / (sum(c_early) OVER () + 0.5 * count(*) OVER ())
                   AS p_early,
               (c_late + 0.5) / (sum(c_late) OVER () + 0.5 * count(*) OVER ())
                   AS p_late
        FROM b
    ),
    terms AS (
        SELECT bin, c_early, c_late,
               (p_late - p_early) * ln(p_late / p_early) AS term
        FROM p
    )
    SELECT bin,
           CAST(c_early AS BIGINT) AS n_early,
           CAST(c_late AS BIGINT) AS n_late,
           round(term, 6) AS psi_term,
           round(sum(term) OVER (), 6) AS psi_total,
           (sum(term) OVER () > 0.2) AS drift_action
    FROM terms
    """,
)
def stats_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    early = F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")
    b = ev.groupBy(
        F.least(F.floor(F.col("value") / 50).cast("bigint"), F.lit(9).cast("bigint"))
        .alias("bin")
    ).agg(
        F.count(F.when(early, 1)).alias("c_early"),
        F.count(F.when(~early, 1)).alias("c_late"),
    )
    tot = Window.partitionBy()
    p = b.select(
        "bin",
        "c_early",
        "c_late",
        (
            (F.col("c_early") + 0.5)
            / (F.sum("c_early").over(tot) + 0.5 * F.count(F.lit(1)).over(tot))
        ).alias("p_early"),
        (
            (F.col("c_late") + 0.5)
            / (F.sum("c_late").over(tot) + 0.5 * F.count(F.lit(1)).over(tot))
        ).alias("p_late"),
    )
    term = (F.col("p_late") - F.col("p_early")) * F.log(
        F.col("p_late") / F.col("p_early")
    )
    terms = p.select("bin", "c_early", "c_late", term.alias("term"))
    return terms.select(
        "bin",
        F.col("c_early").cast("bigint").alias("n_early"),
        F.col("c_late").cast("bigint").alias("n_late"),
        F.round("term", 6).alias("psi_term"),
        F.round(F.sum("term").over(tot), 6).alias("psi_total"),
        (F.sum("term").over(tot) > 0.2).alias("drift_action"),
    )


# --- autocorrelation of the hourly event-count series at lags 1/2/3/24
# (24 = the daily-seasonality probe): the time-series health readout
# that tells a pipeline whether its ingest volume has memory — a flat
# ACF means Poisson-like arrivals, a spiked lag-24 means a daily cycle
# the capacity planner must budget for. Plan: the fact scan collapses
# to the hour-cardinality series FIRST (one hash partial-agg; 720 rows
# here, ≤ hours-in-retention at any corpus size), then ONE
# unpartitioned window pass builds all four lag columns over that
# bucket-sized frame (the events_cumulative_users discipline: global
# windows only ever run over bucket-cardinality input), and one
# aggregate emits all four Pearson correlations. The four output rows
# come from `stack` on the single agg row — no second scan, no
# self-join. ACF is computed over the OBSERVED hour sequence; on a
# sparse series compose with events_gapfill_hourly first (this
# corpus's 720 hours are dense).
#
# Degenerate-series discipline: Spark 4's ANSI-mode `corr` THROWS
# DIVIDE_BY_ZERO on a zero-variance or single-pair input (exactly what
# the crafted boundary corpora produce), while DuckDB's returns NULL.
# So the Spark side computes Pearson r from conditional moment sums
# with `try_divide` — NULL on 0 pairs / 1 pair / constant series, the
# oracle's semantics — instead of F.corr. The moment products are
# exact for integer counts within 2^53, so a truly constant series
# yields a variance of exactly 0.0, never a tiny negative.
@register(
    "events_hourly_acf",
    oracle="""
    WITH h AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT cnt,
               lag(cnt, 1) OVER (ORDER BY hour) AS c1,
               lag(cnt, 2) OVER (ORDER BY hour) AS c2,
               lag(cnt, 3) OVER (ORDER BY hour) AS c3,
               lag(cnt, 24) OVER (ORDER BY hour) AS c24
        FROM h
    ),
    a AS (
        SELECT CAST(count(c1) AS BIGINT) AS n1, corr(cnt, c1) AS a1,
               CAST(count(c2) AS BIGINT) AS n2, corr(cnt, c2) AS a2,
               CAST(count(c3) AS BIGINT) AS n3, corr(cnt, c3) AS a3,
               CAST(count(c24) AS BIGINT) AS n24, corr(cnt, c24) AS a24
        FROM l
    )
    SELECT lag, n_pairs, round(acf, 4) AS acf
    FROM (
        SELECT CAST(1 AS BIGINT) AS lag, n1 AS n_pairs, a1 AS acf FROM a
        UNION ALL SELECT 2, n2, a2 FROM a
        UNION ALL SELECT 3, n3, a3 FROM a
        UNION ALL SELECT 24, n24, a24 FROM a
    )
    """,
)
def events_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("hour")
    lagged = h.select(
        F.col("cnt").cast("double").alias("cnt"),
        *[
            F.lag("cnt", k).over(w).cast("double").alias(f"c{k}")
            for k in (1, 2, 3, 24)
        ],
    )

    def _pearson_aggs(k: int) -> list:
        ck = F.col(f"c{k}")
        x = F.when(ck.isNotNull(), F.col("cnt"))  # pair set = rows with a lag
        n = F.count(ck).cast("double")
        sx, sy = F.sum(x), F.sum(ck)
        sxx, syy = F.sum(x * x), F.sum(ck * ck)
        sxy = F.sum(x * ck)
        cov = n * sxy - sx * sy
        # greatest(…, 0): a variance is mathematically ≥ 0; the clamp
        # keeps an FP-cancellation hair below zero from reaching sqrt
        # (NaN would leak where the oracle has NULL).
        vxy = F.greatest(n * sxx - sx * sx, F.lit(0.0)) * F.greatest(
            n * syy - sy * sy, F.lit(0.0)
        )
        return [
            F.count(ck).alias(f"n{k}"),
            F.try_divide(cov, F.sqrt(vxy)).alias(f"a{k}"),
        ]

    a = lagged.agg(*[c for k in (1, 2, 3, 24) for c in _pearson_aggs(k)])
    stacked = a.select(
        F.expr(
            "stack(4, "
            "CAST(1 AS BIGINT), n1, a1, "
            "CAST(2 AS BIGINT), n2, a2, "
            "CAST(3 AS BIGINT), n3, a3, "
            "CAST(24 AS BIGINT), n24, a24) AS (lag, n_pairs, acf)"
        )
    )
    return stacked.select("lag", "n_pairs", F.round("acf", 4).alias("acf"))


# --- CUSUM changepoint localization on the hourly series: where PSI
# answers "did the distribution move between two fixed halves", CUSUM
# (Page 1954; the Brownian-bridge form) answers WHEN the level
# shifted — argmax_t |Σ_{i≤t}(c_i − mean)|, normalized by sd·√n and
# compared to the Kolmogorov 5% critical value 1.358 (the sup of the
# bridge has the same limit law as the KS statistic). Plan: the fact
# scan collapses to the hour frame first; the running sum is ONE
# ordered window over that bucket-sized frame (running Σc is an exact
# integer — S_t = cum − t·mean reproduces bit-identically across
# engines because both compute the same two doubles); global moments
# ride the same frame as an unpartitioned window; the final argmax is
# a 1-row conditional aggregate with an earliest-hour tie-break. All
# variance/normalization terms go through try_divide / nullif so the
# 1-hour and constant-series degenerates are NULL on both engines
# (Spark's stddev_samp would be NaN — same ANSI trap family as
# events_hourly_acf).
@register(
    "events_cusum_changepoint",
    oracle="""
    WITH h AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(1.0 * cnt) AS sx,
               sum(1.0 * cnt * cnt) AS sxx
        FROM h
    ),
    s AS (
        SELECT hour,
               sum(cnt) OVER (ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (ORDER BY hour) AS t
        FROM h
    ),
    x AS (
        SELECT s.hour, abs(s.cum - s.t * (m.sx / m.n)) AS abss FROM s, m
    ),
    a AS (
        SELECT max(abss) AS mx,
               min(hour) FILTER (WHERE abss = (SELECT max(abss) FROM x))
                   AS change_hour
        FROM x
    )
    SELECT m.n AS n_hours,
           round(m.sx / m.n, 4) AS mean_cnt,
           round(sqrt((m.n * m.sxx - m.sx * m.sx)
                      / nullif(1.0 * m.n * (m.n - 1), 0)), 4) AS sd_cnt,
           a.change_hour,
           round(a.mx / nullif(
               sqrt((m.n * m.sxx - m.sx * m.sx)
                    / nullif(1.0 * m.n * (m.n - 1), 0)) * sqrt(m.n), 0), 4)
               AS cusum_stat,
           (a.mx / nullif(
               sqrt((m.n * m.sxx - m.sx * m.sx)
                    / nullif(1.0 * m.n * (m.n - 1), 0)) * sqrt(m.n), 0)
            > 1.358) AS significant_5pct
    FROM m, a
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_ord = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    s = h.select(
        "hour",
        F.sum("cnt").over(w_ord).alias("cum"),
        F.row_number().over(Window.orderBy("hour")).alias("t"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum(F.col("cnt") * 1.0).over(w_all).alias("sx"),
        F.sum(F.col("cnt") * 1.0 * F.col("cnt")).over(w_all).alias("sxx"),
    )
    x = s.select(
        "hour", "n", "sx", "sxx",
        F.abs(F.col("cum") - F.col("t") * (F.col("sx") / F.col("n"))).alias("abss"),
    ).withColumn("mxw", F.max("abss").over(w_all))
    sd = F.sqrt(
        F.try_divide(
            F.first("n") * F.first("sxx") - F.first("sx") * F.first("sx"),
            1.0 * F.first("n") * (F.first("n") - 1),
        )
    )
    stat = F.try_divide(F.max("abss"), sd * F.sqrt(F.first("n")))
    agg = x.agg(
        F.first("n").alias("n_hours"),
        F.round(F.first("sx") / F.first("n"), 4).alias("mean_cnt"),
        F.round(sd, 4).alias("sd_cnt"),
        F.min(F.when(F.col("abss") == F.col("mxw"), F.col("hour")))
        .alias("change_hour"),
        F.round(stat, 4).alias("cusum_stat"),
        (stat > 1.358).alias("significant_5pct"),
    )
    return agg
