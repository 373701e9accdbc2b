"""Event-sequence analytics: funnel conversion, cohort retention, and
calendar gap-fill — the product-analytics query family a user of the
reference's event stream (binlog events ≙ product events) runs daily.

Scale shapes:
- funnel: three keyed aggregations over the same user_id key; each
  stage filters map-side BEFORE its shuffle (only 'view' rows shuffle
  into stage 1, only 'click' rows into stage 2, ...), and stage joins
  are on user_id — one partitioning reused, AQE coalesces. No windows,
  no collect.
- retention: one per-user min-date agg + one equi-join back on
  user_id + one (cohort_day, offset) agg. All combiner-backed.
- gap_fill: the calendar spine comes from a single-row min/max agg
  (`sequence()` + explode — the spine is tiny: days x event-types),
  then ONE broadcast-able left join against the daily agg; LOCF is a
  per-type window over the spine (5 partitions x ~30 rows — the spine,
  not the data, so partition-count doesn't matter at any SF).

Timestamps: the driver's events.parquet stores INT64 nanos (read as
long — see session.RUNTIME_CONFS); arithmetic stays in integer micros
so cross-engine sums are exact. Double `value` sums go through
DECIMAL(18,6) so they are associative (order-independent) in both
engines, then round+cast to double for the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("ts_us"),
    )


# ------------------------------------------------------------------ funnel


def _funnel_stages(ev: DataFrame):
    """The shared view → click → purchase stage frames: per user the
    FIRST view, the first click strictly after it, the first purchase
    strictly after that. Used by the funnel summary and the latency
    histogram so both audit the SAME conversions."""
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_us") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"), F.min("v_ts").alias("v_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_us") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"), F.min("c_ts").alias("c_ts"))
    )
    return v, c, p


def funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel: per user the FIRST view, the
    first click strictly after it, the first purchase strictly after
    that; one summary row of stage populations + mean stage delays.

    Mirrors the reference's ordered-event semantics (events ordered by
    commit timestamp, `AugmentedEventTransaction.java:6-60`) applied to
    the classic conversion query.
    """
    prep(spark)
    ev = _events_us(spark, sf_dir)
    v, c, p = _funnel_stages(ev)
    stats_v = v.agg(F.count("*").alias("n_view"))
    stats_c = c.agg(
        F.count("*").alias("n_click"),
        F.round(F.avg(F.col("c_ts") - F.col("v_ts")) / 1000.0, 3).alias(
            "avg_v2c_ms"
        ),
    )
    stats_p = p.agg(
        F.count("*").alias("n_purchase"),
        F.round(F.avg(F.col("p_ts") - F.col("c_ts")) / 1000.0, 3).alias(
            "avg_c2p_ms"
        ),
    )
    return stats_v.crossJoin(stats_c).crossJoin(stats_p)


FUNNEL_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
v AS (
    SELECT user_id, MIN(ts_us) AS v_ts FROM ev
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts_us) AS c_ts, MIN(v.v_ts) AS v_ts
    FROM ev e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts_us > v.v_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts_us) AS p_ts, MIN(c.c_ts) AS c_ts
    FROM ev e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts
    GROUP BY e.user_id
)
SELECT
    (SELECT COUNT(*) FROM v) AS n_view,
    (SELECT COUNT(*) FROM c) AS n_click,
    (SELECT round(AVG(c_ts - v_ts) / 1000.0, 3) FROM c) AS avg_v2c_ms,
    (SELECT COUNT(*) FROM p) AS n_purchase,
    (SELECT round(AVG(p_ts - c_ts) / 1000.0, 3) FROM p) AS avg_c2p_ms
"""


# --------------------------------------------------------------- retention


def retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day; distinct
    actives at day offsets 0..7 per cohort."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


RETENTION_SQL = """
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS day FROM events
),
cohort AS (
    SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
    datediff('day', c.cohort_day, e.day) AS day_offset,
    COUNT(DISTINCT e.user_id) AS n_active
FROM ev e JOIN cohort c USING (user_id)
WHERE datediff('day', c.cohort_day, e.day) <= 7
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- gap fill


def gap_fill_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-event-type counts over a dense calendar spine
    (min..max day x event type); missing days get n=0 and carry the
    last observed daily amount forward (LOCF)."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("n_raw"),
        F.round(F.sum("value"), 2).cast("double").alias("amount_raw"),
    )
    spine_days = (
        ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    types = ev.select("event_type").distinct()
    spine = spine_days.crossJoin(F.broadcast(types))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_raw", F.lit(0)).cast("long").alias("n"),
            F.last("amount_raw", ignorenulls=True).over(w).alias("amount"),
        )
    )


GAP_FILL_SQL = """
WITH ev AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(value AS DECIMAL(18,6)) AS value
    FROM events
),
daily AS (
    SELECT event_type, day, COUNT(*) AS n_raw,
        CAST(round(SUM(value), 2) AS DOUBLE) AS amount_raw
    FROM ev GROUP BY 1, 2
),
bounds AS (
    SELECT CAST(MIN(day) AS TIMESTAMP) AS d0,
        CAST(MAX(day) AS TIMESTAMP) AS d1
    FROM ev
),
spine AS (
    SELECT t.event_type, CAST(gs.day_ts AS DATE) AS day
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day_ts
        FROM bounds
    ) gs
)
SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
    CAST(COALESCE(d.n_raw, 0) AS BIGINT) AS n,
    LAST_VALUE(d.amount_raw IGNORE NULLS) OVER (
        PARTITION BY s.event_type ORDER BY s.day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS amount
FROM spine s LEFT JOIN daily d
    ON s.event_type = d.event_type AND s.day = d.day
"""


# --------------------------------------------------- RFM segmentation
#
# Recency / Frequency / Monetary user segmentation — the classic
# behavioral cohorting a product-analytics surface must provide. Each
# user's three metrics are split HIGH/LOW at the population MEDIAN
# (exact interpolated percentile, rounded to 9 dp before the
# comparison so an ulp can't flip a boundary user between engines —
# the same armor as stats_mad), giving 8 deterministic segments.
# Cutoff-based binning, NOT ntile: ntile's tie placement depends on
# sort order and would be engine-divergent.
#
# Scale: one combiner-backed per-user agg (corpus-sized exchange), a
# 3-value cutoff row computed from the SMALL per-user table and
# broadcast back, and a tiny segment count. No global sort.


def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = _events_us(spark, sf_dir)
    # money as a DECIMAL sum of 6-dp-rounded values: a plain double sum
    # is partition-order-dependent, and one ulp on a user sitting at
    # the median cutoff would flip their segment between engines
    per_user = ev.groupBy("user_id").agg(
        F.max("ts_us").alias("last_us"),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias(
            "money"
        ),
    ).persist()  # users-sized; the corpus-max probe, the median cuts,
    # and the coding pass each re-scanned events un-cached (r9 audit)
    # recency relative to the corpus max — smaller gap = more recent
    tot = per_user.agg(F.max("last_us").alias("now_us"))
    pu = per_user.crossJoin(F.broadcast(tot)).select(
        "user_id",
        (F.col("now_us") - F.col("last_us")).alias("rec_gap_us"),
        "freq",
        F.col("money").cast("double").alias("money"),
    )
    cuts = pu.agg(
        F.round(F.percentile("rec_gap_us", F.lit(0.5)), 9).alias("c_rec"),
        F.round(F.percentile("freq", F.lit(0.5)), 9).alias("c_freq"),
        F.round(F.percentile("money", F.lit(0.5)), 9).alias("c_money"),
    )
    coded = pu.crossJoin(F.broadcast(cuts)).select(
        F.concat(
            # recency: small gap (≤ median) is the HIGH state
            F.when(F.col("rec_gap_us") <= F.col("c_rec"), "R").otherwise("r"),
            F.when(F.col("freq") > F.col("c_freq"), "F").otherwise("f"),
            F.when(F.col("money") > F.col("c_money"), "M").otherwise("m"),
        ).alias("segment"),
        "money",
    )
    return coded.groupBy("segment").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("money"), 6).alias("avg_monetary"),
    )


RFM_SQL = """
WITH pu0 AS (
    SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        COUNT(*) AS freq,
        SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS money
    FROM events GROUP BY user_id
), pu AS (
    SELECT user_id,
        (SELECT MAX(last_us) FROM pu0) - last_us AS rec_gap_us,
        freq, CAST(money AS DOUBLE) AS money
    FROM pu0
), cuts AS (
    SELECT round(quantile_cont(rec_gap_us, 0.5), 9) AS c_rec,
        round(quantile_cont(freq, 0.5), 9) AS c_freq,
        round(quantile_cont(money, 0.5), 9) AS c_money
    FROM pu
), coded AS (
    SELECT (CASE WHEN rec_gap_us <= c_rec THEN 'R' ELSE 'r' END)
        || (CASE WHEN freq > c_freq THEN 'F' ELSE 'f' END)
        || (CASE WHEN money > c_money THEN 'M' ELSE 'm' END) AS segment,
        money
    FROM pu CROSS JOIN cuts
)
SELECT segment, COUNT(*) AS n_users,
    round(AVG(money), 6) AS avg_monetary
FROM coded GROUP BY segment
"""


# ------------------------------------------- inter-arrival gap stats
#
# The distribution of per-user inter-event gaps — the number that
# CALIBRATES the sessionization timeout (sessionize_events picks a gap
# threshold; this op shows where the threshold sits in the actual gap
# distribution — the knee between within-session and between-session
# gaps). Gaps are exact integer microseconds; `F.percentile` is the
# exact interpolated order statistic, identical to quantile_cont.
# One keyed window (lag per user) + one global exact-percentile agg —
# the percentile's single-group sort runs over gaps, the documented
# exactness knob (sketch_quantile_grid is the mergeable alternative).


def interarrival_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    prep(spark)
    ev = _events_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    g = F.col("gap_us").cast("double")
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg(g) / 1e6, 6).alias("mean_gap_s"),
        *[
            F.round(F.percentile(g, F.lit(p)) / 1e6, 6).alias(
                f"p{int(p * 100)}_gap_s"
            )
            for p in (0.25, 0.5, 0.9, 0.99)
        ],
    )


INTERARRIVAL_SQL = """
WITH gaps AS (
    SELECT CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        AS DOUBLE) AS g
    FROM events
)
SELECT COUNT(*) AS n_gaps,
    round(AVG(g) / 1e6, 6) AS mean_gap_s,
    round(quantile_cont(g, 0.25) / 1e6, 6) AS p25_gap_s,
    round(quantile_cont(g, 0.5) / 1e6, 6) AS p50_gap_s,
    round(quantile_cont(g, 0.9) / 1e6, 6) AS p90_gap_s,
    round(quantile_cont(g, 0.99) / 1e6, 6) AS p99_gap_s
FROM gaps WHERE g IS NOT NULL
"""


# -------------------------------------------- conversion latency
#
# Latency decomposition of the funnel: the DISTRIBUTION of the
# view→click and click→purchase delays, as a decimal-magnitude
# histogram (bucket = number of digits of the delay in ms, i.e.
# [10^(d-1), 10^d) ms) plus the per-stage mean. The funnel summary
# answers "how many convert"; this answers "how fast" — the metric
# behind SLA alerting and session-timeout tuning.
#
# Scale: rides the same three bounded stage aggregates as the
# funnel; bucketing is map-side (integer digit count — no log10
# float boundary to disagree on) and the histogram is stages ×
# digits rows. Determinism: deltas are exact integer µs; digit
# count is a string-length op, identical in both engines.


def conversion_latency_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    ev = _events_us(spark, sf_dir)
    _v, c, p = _funnel_stages(ev)
    deltas = c.select(
        F.lit("view_to_click").alias("stage"),
        (F.col("c_ts") - F.col("v_ts")).alias("delta_us"),
    ).unionAll(
        p.select(
            F.lit("click_to_purchase").alias("stage"),
            (F.col("p_ts") - F.col("c_ts")).alias("delta_us"),
        )
    )
    binned = deltas.select(
        "stage",
        "delta_us",
        F.length(
            F.expr("CAST(delta_us div 1000 AS STRING)")
        ).alias("ms_digits"),
    )
    # ONE agg pass + stage-partitioned windows over the tiny
    # (stage x digit-bucket) table, not hist + tot joined back: the
    # join shape re-evaluated the whole funnel-stage subtree twice
    # (10 event scans at 100 TB — round-8 redundant-scan audit). The
    # stage mean comes from exact DECIMAL delta sums (order-exact;
    # Spark long sums would overflow at extreme scale anyway).
    hist = binned.groupBy("stage", "ms_digits").agg(
        F.count("*").alias("n"),
        F.sum(F.col("delta_us").cast("decimal(38,0)")).alias("_sd"),
    )
    ws = W.partitionBy("stage")
    tot = hist.withColumn(
        "n_stage", F.sum("n").over(ws)
    ).withColumn("_sd_stage", F.sum("_sd").over(ws))
    return tot.select(
        "stage",
        F.col("ms_digits").cast("long").alias("ms_digits"),
        "n",
        F.round(
            F.col("n").cast("double") / F.col("n_stage").cast("double"),
            6,
        ).alias("share"),
        F.round(
            F.col("_sd_stage").cast("double")
            / F.col("n_stage").cast("double")
            / 1000.0,
            3,
        ).alias("mean_ms"),
    )


CONVERSION_LATENCY_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
v AS (
    SELECT user_id, MIN(ts_us) AS v_ts FROM ev
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts_us) AS c_ts, MIN(v.v_ts) AS v_ts
    FROM ev e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts_us > v.v_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts_us) AS p_ts, MIN(c.c_ts) AS c_ts
    FROM ev e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts
    GROUP BY e.user_id
),
deltas AS (
    SELECT 'view_to_click' AS stage, c_ts - v_ts AS delta_us FROM c
    UNION ALL
    SELECT 'click_to_purchase' AS stage, p_ts - c_ts AS delta_us
    FROM p
),
binned AS (
    SELECT stage, delta_us,
        length(CAST(delta_us // 1000 AS VARCHAR)) AS ms_digits
    FROM deltas
),
hist AS (
    SELECT stage, ms_digits, COUNT(*) AS n,
        SUM(CAST(delta_us AS DECIMAL(38,0))) AS _sd
    FROM binned GROUP BY stage, ms_digits
),
tot AS (
    SELECT stage, ms_digits, n,
        SUM(n) OVER (PARTITION BY stage) AS n_stage,
        SUM(_sd) OVER (PARTITION BY stage) AS _sd_stage
    FROM hist
)
SELECT stage, CAST(ms_digits AS BIGINT) AS ms_digits, n,
    round(CAST(n AS DOUBLE) / CAST(n_stage AS DOUBLE), 6) AS share,
    round(CAST(_sd_stage AS DOUBLE) / CAST(n_stage AS DOUBLE)
          / 1000.0, 3) AS mean_ms
FROM tot
"""


REGISTRY = [
    ("events_funnel", funnel_query, FUNNEL_SQL),
    ("events_retention", retention_query, RETENTION_SQL),
    ("ts_gap_fill", gap_fill_query, GAP_FILL_SQL),
    ("events_rfm_segments", rfm_segments_query, RFM_SQL),
    ("events_interarrival", interarrival_query, INTERARRIVAL_SQL),
    # funnel stage-delay magnitude histogram + means
    ("events_conversion_latency", conversion_latency_query,
     CONVERSION_LATENCY_SQL),
]
