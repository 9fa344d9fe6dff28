"""Rule-based corpus gates and multi-step behavioral funnels.

`text_gopher_rules` is the Gopher/C4 heuristic quality gate (Rae et
al. 2021, Appendix A; Raffel et al. 2020) restricted to the rules that
are meaningful on a single-line corpus: word-count bounds, mean word
length, alphabetic-word fraction, symbol ratio, and stopword presence.
(The line-shape rules — bullet/ellipsis line fractions — are
degenerate on one-line documents and live with the other per-line
stats in text_sentence_stats; repetition rules are the separate
text_repetition_metrics surface.)

`events_funnel_3step` is the strict-order multi-step funnel
(view → click → purchase), the 3-step extension of
events_funnel_conversion's 2-step shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.plans.registry import register

_TOKS_SQL = "regexp_extract_all(lower(text), '\\w+')"

# Gopher's "must contain 2 of" stopword rule (Rae et al. 2021 §A1.1).
# The paper's list is {the, be, to, of, and, that, have, with}; this
# corpus's synthetic vocabulary carries only 'the' and 'a' as function
# words, so 'a' stands in for the absent seven — same rule structure
# (≥2 distinct function words present), corpus-adapted list. Swap the
# list per deployment corpus; the plan shape is list-independent.
_STOPWORDS = ["the", "a", "be", "to", "of", "and", "that", "with"]
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


# --- Gopher rule gate. Every rule is a higher-order function over the
# per-document token array — the whole query is a MAP with zero
# shuffles and zero joins (the ideal 100 TB gate: embarrassingly
# parallel, whole-stage-codegen'd, reads only the text column).
# Thresholds are the paper's; ratios are exact integer divisions
# rounded at the 1e-4 grid.
@register(
    "text_gopher_rules",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE list_sum(list_transform(toks, t -> len(t)))
                         * 1.0 / len(toks) END AS mwl,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                         * 1.0 / len(toks) END AS fa,
               CAST(len(list_intersect(list_distinct(toks), {_STOP_SQL}))
                    AS BIGINT) AS n_stop
        FROM d
    )
    SELECT doc_id, n_words,
           round(mwl, 4) AS mean_word_len,
           round(fa, 4) AS frac_alpha_words,
           n_stop AS n_stopwords,
           (n_words BETWEEN 50 AND 100000) AS ok_word_count,
           (mwl >= 3 AND mwl <= 10) AS ok_mean_word_len,
           (fa > 0.8) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND mwl >= 3 AND mwl <= 10
            AND fa > 0.8 AND n_stop >= 2) AS passes_gopher
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
    n = F.size("toks").cast("bigint")
    tok_len_sum = F.aggregate(
        "toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mwl = F.when(n == 0, F.lit(0.0)).otherwise(tok_len_sum * 1.0 / n)
    fa = F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.filter("toks", lambda t: t.rlike("[a-z]"))) * 1.0 / n
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct("toks"), F.array(*[F.lit(w) for w in _STOPWORDS])
        )
    ).cast("bigint")
    m = d.select(
        "doc_id",
        n.alias("n_words"),
        mwl.alias("_mwl"),
        fa.alias("_fa"),
        n_stop.alias("n_stop"),
    )
    ok_wc = F.col("n_words").between(50, 100000)
    ok_mwl = (F.col("_mwl") >= 3) & (F.col("_mwl") <= 10)
    ok_fa = F.col("_fa") > 0.8
    ok_stop = F.col("n_stop") >= 2
    return m.select(
        "doc_id",
        "n_words",
        F.round("_mwl", 4).alias("mean_word_len"),
        F.round("_fa", 4).alias("frac_alpha_words"),
        F.col("n_stop").alias("n_stopwords"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_fa.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_fa & ok_stop).alias("passes_gopher"),
    )


# --- Strict-order 3-step funnel: view → click → purchase per user,
# each step strictly after the previous one AND within one day of it
# (the unbounded funnel converts ~100% on this dense synthetic — the
# time bound is what makes the report discriminative: ~150/60/25 at
# sf0.01). The oracle states the cascade as three dependent grouped
# CTEs; the Spark plan collapses it to ONE user_id exchange carrying
# THREE stacked window passes (t2's conditional MIN reads the t1
# column, t3's reads t2 — same partitioning, so Catalyst reuses the
# sort instead of re-shuffling; the join-cascade form costs 6
# exchanges for the same answer). The final 1-row report aggregates
# exact BIGINT counts.
@register(
    "events_funnel_3step",
    oracle="""
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
          AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 1 DAY
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
          AND CAST(e.ts AS TIMESTAMP) <= c.t2 + INTERVAL 1 DAY
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased,
           round((SELECT count(*) FROM c) * 1.0
                 / nullif((SELECT count(*) FROM v), 0), 4) AS view_to_click,
           round((SELECT count(*) FROM p) * 1.0
                 / nullif((SELECT count(*) FROM c), 0), 4) AS click_to_purchase
    """,
)
def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    day = F.expr("INTERVAL 1 DAY")
    relevant = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts")
    step1 = relevant.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    step2 = step1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + day),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = step3.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked"),
        F.count("t3").alias("n_purchased"),
    )
    return counts.select(
        "n_viewed",
        "n_clicked",
        "n_purchased",
        F.round(
            F.try_divide(F.col("n_clicked") * 1.0, F.col("n_viewed")), 4
        ).alias("view_to_click"),
        F.round(
            F.try_divide(F.col("n_purchased") * 1.0, F.col("n_clicked")), 4
        ).alias("click_to_purchase"),
    )


# --- Welch's two-sample t: the A/B experiment readout. Cohorts are a
# deterministic hash split (user_id parity — the assignment any
# experimentation system reproduces); per event type the report gives
# both cohort means and Welch's t with its Satterthwaite df. One
# grouped pass computes BOTH cohorts' moments as conditional aggregates
# (no self-join, no second scan); sample variances come from the
# mergeable (n, Σx, Σx²) partials, so the plan is partial-agg →
# one exchange on the tiny event_type domain. |t| > 1.96 flags the
# nominal-5% significant rows.
@register(
    "stats_welch_ab_events",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n_b,
               avg(value) FILTER (WHERE user_id % 2 = 0) AS mean_a,
               avg(value) FILTER (WHERE user_id % 2 = 1) AS mean_b,
               var_samp(value) FILTER (WHERE user_id % 2 = 0) AS var_a,
               var_samp(value) FILTER (WHERE user_id % 2 = 1) AS var_b
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           round(mean_a, 4) AS mean_a,
           round(mean_b, 4) AS mean_b,
           round((mean_a - mean_b)
                 / sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat,
           round(pow(var_a / n_a + var_b / n_b, 2)
                 / (pow(var_a / n_a, 2) / (n_a - 1)
                    + pow(var_b / n_b, 2) / (n_b - 1)), 2) AS welch_df,
           (abs((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b))
            > 1.96) AS significant_5pct
    FROM m
    """,
)
def stats_welch_ab_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    in_a = F.col("user_id") % 2 == 0
    m = ev.groupBy("event_type").agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(~in_a, 1)).alias("n_b"),
        F.avg(F.when(in_a, F.col("value"))).alias("_mean_a"),
        F.avg(F.when(~in_a, F.col("value"))).alias("_mean_b"),
        F.var_samp(F.when(in_a, F.col("value"))).alias("_var_a"),
        F.var_samp(F.when(~in_a, F.col("value"))).alias("_var_b"),
    )
    se2 = F.col("_var_a") / F.col("n_a") + F.col("_var_b") / F.col("n_b")
    t = (F.col("_mean_a") - F.col("_mean_b")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("_var_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("_var_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return m.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("_mean_a", 4).alias("mean_a"),
        F.round("_mean_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant_5pct"),
    )


# --- Cumulative distinct users by hour — the "running COUNT(DISTINCT)"
# that naive engines compute as a quadratic re-scan per bucket. The
# decorrelation: distinct-count a user ONCE at their first-seen hour
# (one user_id aggregate), roll those up per hour, then a running sum
# over the hour ordering — a bucket-cardinality window, trivially
# small. Exact integers end to end. (Hour grain: this synthetic's
# users all debut within ~2 days, so the daily curve is degenerate.)
@register(
    "events_cumulative_users",
    oracle="""
    WITH fs AS (
        SELECT user_id, min(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                   AS first_hour
        FROM events GROUP BY user_id
    ),
    hourly AS (
        SELECT first_hour AS hour, CAST(count(*) AS BIGINT) AS new_users
        FROM fs GROUP BY first_hour
    )
    SELECT hour, new_users,
           CAST(sum(new_users) OVER (ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM hourly
    """,
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("first_hour")
    )
    hourly = fs.groupBy(F.col("first_hour").alias("hour")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        "hour",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


# --- fastText-style linear quality classifier (Joulin et al. 2016;
# the CCNet/GPT-3 quality-filter deployment shape): hashed
# bag-of-words features → broadcast weight vector → mean activation →
# sigmoid. The weight table stands where a TRAINED model's weights
# arrive in production (a ~D-row side file), so the plan keeps the
# honest deployment shape: one broadcast hash join of the token
# stream against the D-row model, one doc_id-keyed partial-agg
# exchange, and a left join back so zero-token documents score the
# 0.5 prior instead of vanishing. Weights here are md5-derived on the
# repo's cross-engine integer grid — per-doc weight SUMS are exact
# BIGINTs, so summation order can't flip the rounded logit, and the
# keep flag compares INTEGERS (sum ≥ 0 ⟺ p ≥ 0.5), never floats.
_CLF_D = 512       # hashed feature buckets (model rows)
_CLF_SCALE = 1000  # integer weight grid: wi ∈ [-1000, 1000]


@register(
    "text_quality_linear_classifier",
    oracle=f"""
    WITH w AS (
        SELECT bucket,
               ('0x' || substring(md5(CAST(bucket AS VARCHAR)), 1, 7))::BIGINT
                   % 2001 - 1000 AS wi
        FROM (SELECT unnest(range({_CLF_D})) AS bucket)
    ),
    t AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    tb AS (
        SELECT doc_id,
               ('0x' || substring(md5(tok), 1, 7))::BIGINT % {_CLF_D} AS bucket
        FROM t
    ),
    s AS (
        SELECT tb.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(w.wi) AS BIGINT) AS swi
        FROM tb JOIN w USING (bucket) GROUP BY tb.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_tokens, 0) AS n_tokens,
           floor(CASE WHEN s.doc_id IS NULL THEN 0.0
                      ELSE s.swi / ({_CLF_SCALE}.0 * s.n_tokens) END
                 * 1000000 + 0.5) / 1000000 AS logit,
           round(CASE WHEN s.doc_id IS NULL THEN 0.5
                      ELSE 1.0 / (1.0 + exp(-(s.swi / ({_CLF_SCALE}.0 * s.n_tokens))))
                 END, 6) AS p_keep,
           coalesce(s.swi, 0) >= 0 AS keep
    FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    """,
)
def text_quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    w = spark.range(_CLF_D).select(
        F.col("id").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10)
            .cast("bigint")
            % 2001
            - 1000
        ).alias("wi"),
    )
    toks = docs.select("doc_id", F.explode(tokens(F.lower("text"))).alias("tok"))
    tb = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 7), 16, 10).cast("bigint") % _CLF_D
        ).alias("bucket"),
    )
    s = (
        tb.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("wi").alias("swi"),
        )
    )
    logit_raw = F.col("swi") / (F.lit(float(_CLF_SCALE)) * F.col("n_tokens"))
    return (
        docs.select("doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            # floor(x·1e6+0.5)/1e6, not round(x,6): swi/(1000·n) lands
            # EXACTLY on the 6-decimal grid whenever 1000n | 10^7·swi
            # (e.g. n=64), and at those .5 ties Spark's BigDecimal
            # HALF_UP and DuckDB's float-mediated round disagree; the
            # floor form is the same double→double map in both engines
            # (the int8-quantizer grid discipline, functions/vectors).
            (
                F.floor(
                    F.when(F.col("swi").isNull(), F.lit(0.0)).otherwise(logit_raw)
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("logit"),
            F.round(
                F.when(F.col("swi").isNull(), F.lit(0.5)).otherwise(
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_raw))
                ),
                6,
            ).alias("p_keep"),
            (F.coalesce("swi", F.lit(0)) >= 0).alias("keep"),
        )
    )


# --- robust per-language length profile: exact p05/p95 percentiles
# (linear interpolation — Spark `percentile` ≡ DuckDB quantile_cont),
# winsorized mean (outliers clamped to the fences) and trimmed mean
# (outliers dropped). The robust-statistics QC readout a corpus
# curator compares against the plain mean to see how much length
# outliers distort each language slice. Two lang-keyed exchanges:
# the percentile agg (k rows) broadcasts back onto the doc stream,
# and the final rollup reuses the same key. At 100 TB swap
# `percentile` for `percentile_approx` per the profile_orders_columns
# `exact=False` convention; the fences move within sketch error, the
# plan is unchanged.
@register(
    "stats_winsorized_doc_lengths",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, lang, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_toks
        FROM documents
    ),
    q AS (
        SELECT lang,
               quantile_cont(n_toks, 0.05) AS p05,
               quantile_cont(n_toks, 0.95) AS p95
        FROM n GROUP BY lang
    )
    SELECT n.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n.n_toks), 6) AS mean_len,
           round(any_value(q.p05), 6) AS p05,
           round(any_value(q.p95), 6) AS p95,
           round(avg(CASE WHEN n.n_toks < q.p05 THEN q.p05
                          WHEN n.n_toks > q.p95 THEN q.p95
                          ELSE CAST(n.n_toks AS DOUBLE) END), 6)
               AS winsorized_mean,
           round(avg(CASE WHEN CAST(n.n_toks AS DOUBLE) BETWEEN q.p05 AND q.p95
                          THEN CAST(n.n_toks AS DOUBLE) END), 6)
               AS trimmed_mean
    FROM n JOIN q USING (lang)
    GROUP BY n.lang
    """,
)
def stats_winsorized_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emission_project_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    q = n.groupBy("lang").agg(
        F.percentile("n_toks", F.lit(0.05)).alias("p05"),
        F.percentile("n_toks", F.lit(0.95)).alias("p95"),
    )
    j = n.join(F.broadcast(q), "lang")
    wins = (
        F.when(F.col("n_toks") < F.col("p05"), F.col("p05"))
        .when(F.col("n_toks") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("n_toks").cast("double"))
    )
    trim = F.when(
        F.col("n_toks").cast("double").between(F.col("p05"), F.col("p95")),
        F.col("n_toks").cast("double"),
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_toks"), 6).alias("mean_len"),
        F.round(F.first("p05"), 6).alias("p05"),
        F.round(F.first("p95"), 6).alias("p95"),
        F.round(F.avg(wins), 6).alias("winsorized_mean"),
        F.round(F.avg(trim), 6).alias("trimmed_mean"),
    )


# --- reliability diagram + expected-calibration-error terms for the
# linear quality classifier, scored against the Gopher rule gate as
# pseudo-gold (the gate self-evaluation family: text_langid_confusion,
# dedup_lsh_quality). Decile bins of p_keep; per bin the mean
# predicted probability vs the observed gold rate, the |gap|, and the
# n-weighted ECE contribution (sum of ece_term = ECE, Naeini et al.
# 2015). Plan: the two operator pipelines are REUSED as subplans
# (composition, not re-implementation), joined on doc_id — one
# doc-keyed exchange each side — then collapsed to the ≤10-row bin
# frame; the ECE total-weight window runs over that bin frame only.
# The oracle inlines both registered pipelines' CTEs verbatim.
@register(
    "stats_classifier_calibration",
    oracle=f"""
    WITH w AS (
        SELECT bucket,
               ('0x' || substring(md5(CAST(bucket AS VARCHAR)), 1, 7))::BIGINT
                   % 2001 - 1000 AS wi
        FROM (SELECT unnest(range({_CLF_D})) AS bucket)
    ),
    t AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    tb AS (
        SELECT doc_id,
               ('0x' || substring(md5(tok), 1, 7))::BIGINT % {_CLF_D} AS bucket
        FROM t
    ),
    s AS (
        SELECT tb.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(w.wi) AS BIGINT) AS swi
        FROM tb JOIN w USING (bucket) GROUP BY tb.doc_id
    ),
    p AS (
        SELECT d.doc_id,
               round(CASE WHEN s.doc_id IS NULL THEN 0.5
                          ELSE 1.0 / (1.0 + exp(-(s.swi
                               / ({_CLF_SCALE}.0 * s.n_tokens)))) END, 6)
                   AS p_keep
        FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    ),
    g AS (
        SELECT doc_id,
               (CAST(len(toks) AS BIGINT) BETWEEN 50 AND 100000
                AND (CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE list_sum(list_transform(toks, t -> len(t)))
                               * 1.0 / len(toks) END) BETWEEN 3 AND 10
                AND (CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE len(list_filter(toks,
                                   t -> regexp_matches(t, '[a-z]')))
                               * 1.0 / len(toks) END) > 0.8
                AND len(list_intersect(list_distinct(toks), {_STOP_SQL})) >= 2)
                   AS gold
        FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    ),
    b AS (
        SELECT least(CAST(floor(p.p_keep * 10) AS BIGINT), 9) AS bin,
               p.p_keep,
               CASE WHEN g.gold THEN 1 ELSE 0 END AS gi
        FROM p JOIN g USING (doc_id)
    ),
    c AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
               avg(p_keep) AS mp, avg(gi) AS fg
        FROM b GROUP BY bin
    )
    SELECT bin, n_docs,
           round(mp, 4) AS mean_p_keep,
           round(fg, 4) AS frac_gold,
           round(abs(mp - fg), 4) AS abs_gap,
           round(n_docs * abs(mp - fg) / sum(n_docs) OVER (), 6) AS ece_term
    FROM c
    """,
)
def stats_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    clf = text_quality_linear_classifier(spark, sf_dir).select("doc_id", "p_keep")
    gold = text_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_gopher").cast("int").alias("gi")
    )
    b = clf.join(gold, "doc_id").select(
        F.least(F.floor(F.col("p_keep") * 10).cast("bigint"), F.lit(9).cast("bigint"))
        .alias("bin"),
        "p_keep",
        "gi",
    )
    c = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("p_keep").alias("_mp"),
        F.avg("gi").alias("_fg"),
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return c.select(
        "bin",
        "n_docs",
        F.round("_mp", 4).alias("mean_p_keep"),
        F.round("_fg", 4).alias("frac_gold"),
        F.round(F.abs(F.col("_mp") - F.col("_fg")), 4).alias("abs_gap"),
        F.round(F.col("n_docs") * F.abs(F.col("_mp") - F.col("_fg")) / total, 6)
        .alias("ece_term"),
    )
