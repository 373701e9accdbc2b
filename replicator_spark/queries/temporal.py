"""Temporal join operators Spark lacks as builtins: as-of join and
range (interval) join — expressed as scalable compositions.

As-of join (left row ← latest right row with ts ≤ left.ts, per key):
the naive per-row subquery is O(n·m); the scalable form is the
union-window algorithm — tag both sides, sort by (key, ts, side),
carry the last right value forward with `last(ignorenulls)` over an
unbounded-preceding window. ONE exchange on the key, one sort; no
range explosion. DuckDB's native ASOF JOIN is the oracle.

Range join (event ts ∈ [start, end) of arbitrary windows): the naive
theta join is a cartesian filter; the scalable form buckets time —
windows explode to the day buckets they overlap, events join on their
day bucket (equi!), then the exact interval predicate filters. The
cross product never materializes beyond bucket-local pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For each left row, the latest right row with right_ts <= left_ts
    (per key). Union-window algorithm; returns left columns + right_vals
    (NULL when no prior right row exists)."""
    l_tag = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("ts"),
        F.lit(1).alias("is_left"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
          for c in right_vals],
    )
    r_tag = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("ts"),
        F.lit(0).alias("is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (is_left ASC), so a
    # same-timestamp right row IS visible to the left row (ts <= ts)
    w = W.partitionBy("k").orderBy("ts", "is_left").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    carried = u.select(
        "*",
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return carried.where(F.col("is_left") == 1).select(
        *[f.name for f in left.schema.fields],
        *[F.col(f"asof_{c}").alias(f"asof_{c}") for c in right_vals],
    )


def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the same user's latest click value at
    or before the purchase — per-user summary."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts_ms", "user_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts_ms").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.col("event_id").alias("c_event_id"),
    )
    joined = asof_join(
        purchases.withColumnRenamed("user_id", "u"),
        clicks.withColumnRenamed("c_user", "u"),
        key="u",
        left_ts="ts_ms",
        right_ts="c_ts",
        right_vals=["c_event_id"],
    )
    return (
        joined.groupBy(F.col("u").alias("user_id"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.col("asof_c_event_id").isNotNull().cast("long")
            ).alias("n_with_prior_click"),
            F.max("asof_c_event_id").alias("max_prior_click_event"),
        )
    )


# DuckDB ties at equal ts: ASOF JOIN uses >= so a same-ts click is
# matched — mirrored by the is_left sort order in the Spark algorithm.
# When several clicks share the max eligible ts, pick the max event_id
# (Spark's last() at same ts is order-dependent, so the fixture
# guarantees unique (user, ts) among clicks — true for this data).
ASOF_JOIN_SQL = """
WITH ev AS (
    SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
    FROM events
), purchases AS (
    SELECT event_id, ts_ms, user_id, value FROM ev
    WHERE event_type = 'purchase'
), clicks AS (
    SELECT user_id AS c_user, ts_ms AS c_ts, event_id AS c_event_id
    FROM ev WHERE event_type = 'click'
), joined AS (
    SELECT p.user_id, p.event_id, c.c_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.c_user AND p.ts_ms >= c.c_ts
)
SELECT user_id, COUNT(*) AS n_purchases,
    CAST(SUM(CASE WHEN c_event_id IS NOT NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS n_with_prior_click,
    MAX(c_event_id) AS max_prior_click_event
FROM joined GROUP BY user_id
"""


DAY_MS = 86_400_000
N_WINDOWS = 40


def range_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events ∈ arbitrary overlapping maintenance windows, joined via
    day-bucket equi-join + exact interval filter (never a cartesian):
    window w: [epoch + w·0.6 days, + 2.2 days). Per-window event count.
    """
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    base = ev.agg(F.min("ts_ms").alias("t0"))
    # integer arithmetic only — double stride math truncates in Spark
    # but rounds in DuckDB casts, shifting boundaries by 1 ms
    stride = 6 * DAY_MS // 10       # 0.6 day
    span = 22 * DAY_MS // 10        # 2.2 days
    windows = (
        spark.range(N_WINDOWS)
        .withColumnRenamed("id", "w_id")
        .crossJoin(F.broadcast(base))
        .select(
            "w_id",
            (F.col("t0") + F.col("w_id") * stride).alias("w_start"),
            (F.col("t0") + F.col("w_id") * stride + span).alias("w_end"),
        )
    )
    # windows exploded to overlapped day buckets (bounded: ⌈2.2/1⌉+1)
    w_buckets = windows.select(
        "w_id", "w_start", "w_end",
        F.explode(
            F.sequence(
                F.expr(f"w_start div {DAY_MS}"),
                F.expr(f"(w_end - 1) div {DAY_MS}"),
            )
        ).alias("day_bucket"),
    )
    e_buckets = ev.withColumn(
        "day_bucket", F.expr(f"ts_ms div {DAY_MS}")
    )
    joined = e_buckets.join(w_buckets, "day_bucket").where(
        (F.col("ts_ms") >= F.col("w_start"))
        & (F.col("ts_ms") < F.col("w_end"))
    )
    return joined.groupBy("w_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("first_ts_ms"),
        F.max("ts_ms").alias("last_ts_ms"),
    )


RANGE_JOIN_SQL = f"""
WITH ev AS (
    SELECT event_id, epoch_ms(ts) AS ts_ms FROM events
), base AS (SELECT MIN(ts_ms) AS t0 FROM ev),
windows AS (
    SELECT w_id,
        t0 + w_id * {6 * DAY_MS // 10} AS w_start,
        t0 + w_id * {6 * DAY_MS // 10} + {22 * DAY_MS // 10} AS w_end
    FROM (SELECT unnest(range(0, {N_WINDOWS})) AS w_id), base
)
SELECT w_id, COUNT(*) AS n_events,
    MIN(ts_ms) AS first_ts_ms, MAX(ts_ms) AS last_ts_ms
FROM ev JOIN windows
  ON ts_ms >= w_start AND ts_ms < w_end
GROUP BY w_id
"""

HOUR_MS = 3_600_000


def rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the daily rollup is
    RE-aggregated from the hourly rollup, never from raw events — at
    100 TB the raw scan happens once (hourly), every coarser
    resolution reads the much smaller previous tier. Sums use DECIMAL
    so re-aggregation is exactly associative (a double sum would drift
    between tiers). Output: daily tier with its hourly provenance."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        F.expr("ts div 1000000").alias("ts_ms"), "event_type", "value"
    )
    hourly = ev.groupBy(
        F.expr(f"ts_ms div {HOUR_MS}").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    daily = (
        hourly.groupBy(
            F.expr("hour_bucket div 24").alias("day_bucket"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sum_dec"), 2).cast("double").alias("sum_value"),
            F.count("*").alias("n_hourly_rows"),
        )
    )
    return daily


ROLLUP_SQL = f"""
WITH ev AS (
    SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events
), hourly AS (
    SELECT ts_ms // {HOUR_MS} AS hour_bucket, event_type,
        COUNT(*) AS n,
        SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
    FROM ev GROUP BY 1, 2
)
SELECT hour_bucket // 24 AS day_bucket, event_type,
    CAST(SUM(n) AS BIGINT) AS n_events,
    CAST(round(SUM(sum_dec), 2) AS DOUBLE) AS sum_value,
    COUNT(*) AS n_hourly_rows
FROM hourly GROUP BY 1, 2
"""

# --------------------------------------------------- sliding windows

SLIDE_MS = 900_000  # 15 min slide
WIN_MS = 3_600_000  # 1 h window → each event lands in 4 windows


def sliding_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) time-window aggregation: 1-hour windows
    every 15 minutes via Spark's native `window(size, slide)` — the
    smoothing/monitoring view tumbling windows can't give. Spark
    expands each event into size/slide window copies MAP-SIDE and the
    agg is combiner-backed, so the shuffle carries per-(window, type)
    partials — at 100 TB the cost is the 4× row expansion, never a
    self-join. Sums go through DECIMAL for order-insensitivity."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        F.timestamp_millis(F.expr("ts div 1000000")).alias("ts_ts"),
        "event_type",
        "value",
    )
    agg = ev.groupBy(
        F.window("ts_ts", f"{WIN_MS // 1000} seconds",
                 f"{SLIDE_MS // 1000} seconds"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )
    return agg.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type",
        "n",
        "sum_value",
    )


# Oracle: expand each event into its size/slide hop windows explicitly.
# Spark aligns hop windows to the epoch, so for event time t the member
# window starts are (t//slide - j)*slide for j in 0..(size/slide - 1).
SLIDING_WINDOW_SQL = f"""
WITH ev AS (
    SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events
), hopped AS (
    SELECT ((ts_ms // {SLIDE_MS}) - j) * {SLIDE_MS} AS window_start_ms,
        event_type, value
    FROM ev CROSS JOIN (
        SELECT unnest(range({WIN_MS // SLIDE_MS})) AS j
    )
)
SELECT window_start_ms, event_type, COUNT(*) AS n,
    CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS sum_value
FROM hopped GROUP BY 1, 2
"""

# ------------------------------------------------ autocorrelation
#
# Lag-k autocorrelation (k = 1..ACF_MAX_LAG) of the daily event-count
# series — the seasonality probe behind capacity planning and anomaly
# thresholds (a strong lag-7 says weekly cycle). Standard ACF:
# r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², missing trailing terms
# excluded. The day series is one combiner-backed count agg over the
# corpus; every later step runs on the |days|-sized table (the lead
# window's single partition IS that tiny table, not the corpus).
# Determinism: each cross-term is rounded to 9 dp and summed as
# DECIMAL — partition order can't perturb the ratio.

ACF_MAX_LAG = 7


def autocorr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("ts div 1000000 div 86400000").alias("day")
    ).agg(F.count("*").alias("n"))
    mean = daily.agg(F.avg(F.col("n").cast("double")).alias("mu"))
    x = daily.crossJoin(F.broadcast(mean)).select(
        "day", (F.col("n").cast("double") - F.col("mu")).alias("x")
    )
    w = W.orderBy("day")
    leads = x.select(
        "x",
        *[
            F.lead("x", k).over(w).alias(f"x{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    dec = lambda c: F.round(c, 9).cast("decimal(24,9)")  # noqa: E731
    aggs = [F.count("*").alias("n_days"), F.sum(dec(F.col("x") * F.col("x"))).alias("den")]
    for k in range(1, ACF_MAX_LAG + 1):
        aggs.append(
            F.sum(
                F.when(
                    F.col(f"x{k}").isNotNull(),
                    dec(F.col("x") * F.col(f"x{k}")),
                )
            ).alias(f"num{k}")
        )
    g = leads.agg(*aggs)
    return g.select(
        "n_days",
        *[
            F.round(
                F.col(f"num{k}").cast("double") / F.col("den").cast("double"),
                6,
            ).alias(f"acf_lag{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )


_ACF_NUMS = ",\n    ".join(
    f"""SUM(CASE WHEN x{k} IS NOT NULL THEN
        CAST(round(x * x{k}, 9) AS DECIMAL(24,9)) END) AS num{k}"""
    for k in range(1, ACF_MAX_LAG + 1)
)
_ACF_LEADS = ",\n    ".join(
    f"LEAD(x, {k}) OVER (ORDER BY day) AS x{k}"
    for k in range(1, ACF_MAX_LAG + 1)
)
_ACF_OUT = ",\n    ".join(
    f"round(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf_lag{k}"
    for k in range(1, ACF_MAX_LAG + 1)
)

AUTOCORR_SQL = f"""
WITH daily AS (
    SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), mean AS (SELECT AVG(CAST(n AS DOUBLE)) AS mu FROM daily),
x AS (
    SELECT day, CAST(n AS DOUBLE) - mu AS x FROM daily CROSS JOIN mean
), leads AS (
    SELECT x,
    {_ACF_LEADS}
    FROM x
), g AS (
    SELECT COUNT(*) AS n_days,
        SUM(CAST(round(x * x, 9) AS DECIMAL(24,9))) AS den,
    {_ACF_NUMS}
    FROM leads
)
SELECT CAST(n_days AS BIGINT) AS n_days,
    {_ACF_OUT}
FROM g
"""


# --------------------------------------- time-series similarity search
#
# Top-k similar users by BEHAVIORAL PROFILE: each user's daily event
# counts over the first TS_DIM days become a dense vector,
# z-normalized per user (shape matters, not volume — the classic
# normalization of time-series similarity search, cf. the distributed
# top-k similarity literature the survey corpus retrieves: EDBT'19
# streaming TS similarity, EDBT'20 incremental top-k), then exact
# Euclidean top-k against the query users. This is the similarity
# family (pipeline/similarity.py) applied to a DERIVED modality — the
# vectors come out of an aggregation, not a table column.
#
# Scale: profile build is one combiner-backed (user, day) agg + a
# narrow densify/normalize; the query side (|Q| vectors) broadcasts;
# distances are map-side sequential folds (identical order in both
# engines, rounded to 6 dp before ranking with a cand tiebreak). At
# corpus scale you'd coarse-quantize profiles exactly like the IVF
# path — the candidate generator swaps, nothing else.

TS_DIM = 16
TS_TOPK = 5
TS_N_QUERIES = 8


def _profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    start = ev.agg(
        F.min(F.expr("ts div 1000000 div 86400000")).alias("d0")
    )
    daily = (
        ev.crossJoin(F.broadcast(start))
        .select(
            "user_id",
            (F.expr("ts div 1000000 div 86400000") - F.col("d0")).alias("di"),
        )
        .where(F.col("di") < TS_DIM)
        .groupBy("user_id", "di")
        .agg(F.count("*").alias("n"))
    )
    dense = daily.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("di"), F.col("n")))
        ).alias("m")
    )
    v = F.transform(
        F.sequence(F.lit(0), F.lit(TS_DIM - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("long")), F.lit(0)
        ).cast("double"),
    )
    withv = dense.select("user_id", v.alias("v"))
    mu = F.aggregate("v", F.lit(0.0), lambda a, x: a + x) / TS_DIM
    mat = withv.select("user_id", "v", mu.alias("mu"))
    var = (
        F.aggregate(
            "v",
            F.lit(0.0),
            lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu")),
        )
        / TS_DIM
    )
    mat2 = mat.select("user_id", "v", "mu", F.sqrt(var).alias("sd"))
    z = F.transform(
        "v",
        lambda x: F.when(
            F.col("sd") > 0, (x - F.col("mu")) / F.col("sd")
        ).otherwise(F.lit(0.0)),
    )
    return mat2.select("user_id", z.alias("z"))


def ts_profile_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    prof = _profiles(spark, sf_dir).persist()
    # ^ users-sized z-profile table; the query side and the candidate
    # side each re-scanned events un-cached (r9 audit)
    q = prof.where(F.col("user_id") < TS_N_QUERIES).select(
        F.col("user_id").alias("query_user"), F.col("z").alias("qz")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qz"), F.col("z"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        prof.crossJoin(F.broadcast(q))
        .where(F.col("user_id") != F.col("query_user"))
        .select(
            "query_user",
            F.col("user_id").alias("cand_user"),
            F.round(dist, 6).alias("dist"),
        )
    )
    w = W.partitionBy("query_user").orderBy(
        F.col("dist").asc(), F.col("cand_user")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TS_TOPK)
        .select("query_user", "rank", "cand_user", "dist")
    )


_TS_FOLD = (
    "list_reduce(list_transform(range(1, {d} + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
)

TS_PROFILE_TOPK_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events
), start AS (SELECT MIN(day) AS d0 FROM ev),
daily AS (
    SELECT user_id, day - d0 AS di, COUNT(*) AS n
    FROM ev CROSS JOIN start
    WHERE day - d0 < {TS_DIM}
    GROUP BY user_id, day - d0
), densem AS (
    SELECT user_id, MAP(list(di), list(n)) AS m
    FROM daily GROUP BY user_id
), dense AS (
    SELECT user_id,
        list_transform(range(0, {TS_DIM}),
            i -> CAST(COALESCE(m[i][1], 0) AS DOUBLE)) AS v
    FROM densem
), stats AS (
    SELECT user_id, v,
        list_reduce(v, (x, y) -> x + y) / {TS_DIM} AS mu
    FROM dense
), stats2 AS (
    SELECT user_id, v, mu,
        sqrt(list_reduce(list_transform(v, x -> (x - mu) * (x - mu)),
                         (x, y) -> x + y) / {TS_DIM}) AS sd
    FROM stats
), prof AS (
    SELECT user_id,
        list_transform(v, x -> CASE WHEN sd > 0 THEN (x - mu) / sd
                                    ELSE 0.0 END) AS z
    FROM stats2
), q AS (
    SELECT user_id AS query_user, z AS qz FROM prof
    WHERE user_id < {TS_N_QUERIES}
), scored AS (
    SELECT q.query_user, p.user_id AS cand_user,
        round(sqrt(0.0 + {_TS_FOLD.format(d=TS_DIM, a="q.qz", b="p.z")}), 6)
            AS dist
    FROM prof p CROSS JOIN q
    WHERE p.user_id <> q.query_user
)
SELECT query_user, rank, cand_user, dist FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_user ORDER BY dist ASC, cand_user) AS rank
    FROM scored)
WHERE rank <= {TS_TOPK}
"""


# --------------------------------------------- weekly seasonality
#
# Classical seasonal-means decomposition of the daily event series:
# per-weekday-slot means (slot = day index mod 7 — the synthetic
# calendar's week) and the fraction of daily variance the seasonal
# component explains, R² = 1 − SS_resid/SS_total. The companion to
# ts_autocorrelation: ACF says "is there a weekly cycle", this says
# "how much of the volume it explains" — the capacity-planning number.
#
# Shapes: the corpus-sized work is ONE daily count agg; means,
# residuals, and R² all run over the |days|-sized table with
# 9-dp-rounded DECIMAL sums (order-free), means rounded to 9 dp before
# the residual subtraction so both engines subtract identical doubles.

SEASON_PERIOD = 7


def seasonality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("ts div 1000000 div 86400000").alias("day")
    ).agg(F.count("*").alias("n")).persist()
    # ^ |days|-sized; three consumers (slot means, grand mean, the
    # deviation join) each re-scanned events un-cached (r9 audit)
    slotted = daily.select(
        (F.col("day") % SEASON_PERIOD).alias("slot"),
        F.col("n").cast("double").alias("x"),
    )
    slot_means = slotted.groupBy("slot").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("x"), 9).alias("slot_mean"),
    )
    grand = slotted.agg(F.round(F.avg("x"), 9).alias("mu"))
    dec = lambda c: F.round(c, 9).cast("decimal(24,9)")  # noqa: E731
    joined = (
        slotted.join(F.broadcast(slot_means), "slot")
        .crossJoin(F.broadcast(grand))
    )
    ss = joined.agg(
        F.sum(
            dec((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")))
        ).alias("ss_tot"),
        F.sum(
            dec(
                (F.col("x") - F.col("slot_mean"))
                * (F.col("x") - F.col("slot_mean"))
            )
        ).alias("ss_res"),
    )
    r2 = F.when(
        F.col("ss_tot") > 0,
        F.lit(1.0)
        - F.col("ss_res").cast("double") / F.col("ss_tot").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        slot_means.crossJoin(F.broadcast(ss.select(r2.alias("seasonal_r2"))))
        .select(
            "slot",
            "n_days",
            F.round("slot_mean", 6).alias("slot_mean"),
            F.round("seasonal_r2", 6).alias("seasonal_r2"),
        )
    )


SEASONALITY_SQL = f"""
WITH daily AS (
    SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), slotted AS (
    SELECT day % {SEASON_PERIOD} AS slot, CAST(n AS DOUBLE) AS x FROM daily
), slot_means AS (
    SELECT slot, COUNT(*) AS n_days, round(AVG(x), 9) AS slot_mean
    FROM slotted GROUP BY slot
), grand AS (SELECT round(AVG(x), 9) AS mu FROM slotted),
ss AS (
    SELECT
        SUM(CAST(round((x - mu) * (x - mu), 9) AS DECIMAL(24,9))) AS ss_tot,
        SUM(CAST(round((x - slot_mean) * (x - slot_mean), 9)
                 AS DECIMAL(24,9))) AS ss_res
    FROM slotted JOIN slot_means USING (slot) CROSS JOIN grand
)
SELECT slot, CAST(n_days AS BIGINT) AS n_days,
    round(slot_mean, 6) AS slot_mean,
    round(CASE WHEN ss_tot > 0
               THEN 1.0 - CAST(ss_res AS DOUBLE) / CAST(ss_tot AS DOUBLE)
               ELSE 0.0 END, 6) AS seasonal_r2
FROM slot_means CROSS JOIN ss
"""


# --------------------------------------------- CUSUM changepoint
#
# Two-sided CUSUM level-shift detection on the daily event-count
# series — the monitoring question ts_seasonality/ts_autocorrelation
# don't answer: WHEN did the volume regime change? The textbook CUSUM
# recurrence S_t = max(0, S_{t−1} + z_t − slack) is a prefix-dependent
# scan, but it has a WINDOW-FUNCTION closed form: with P_t the prefix
# sum of (z_t − slack), S_t = P_t − min(0, min_{j≤t} P_j) — one
# ordered running SUM + one running MIN, no fold. Both statistics run
# on the |days|-sized table; the only corpus-sized work is the daily
# count agg.
#
# Determinism armor: z-scores are 9-dp-rounded and cast DECIMAL(24,9),
# so the running sums/mins are EXACT (order-free) — identical S_t in
# both engines regardless of window-aggregation internals (segment
# trees need not add in sequential order; decimals make that moot) —
# and the argmax day uses a (S DESC, day ASC) row_number, earliest
# day on ties.
#
# The argmax day is where EVIDENCE peaks (for a sustained shift that
# is just the series end), not where the regime changed; the standard
# CUSUM changepoint ESTIMATE is the last day the statistic sat at 0
# before the peak (shift onset = the next day). Both are reported:
# up_day/down_day (peak) and up_change_day/down_change_day (estimate,
# coalesced to the first day when S never touched 0 before the peak).
# S is DECIMAL-exact, so `S = 0` is a clean equality in both engines.

CUSUM_SLACK = "0.5"  # drift allowance, in sd units
CUSUM_THRESHOLD = 5.0  # decision threshold, in sd units


def changepoint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("ts div 1000000 div 86400000").alias("day")
    ).agg(F.count("*").alias("n"))
    # corpus stats as un-partitioned windows over the |days|-sized
    # aggregate, not a separate agg + crossJoin-back: the join shape
    # re-evaluated the daily-count scan once per consumer (10 event
    # scans at 100 TB — round-8 redundant-scan audit). Sums stay
    # DECIMAL (order-exact), formulas unchanged, so values are
    # bit-identical to the agg shape and the oracle is untouched.
    xdec = F.col("n").cast("double").cast("decimal(24,9)")
    wall = W.partitionBy()
    statted = (
        daily.withColumn("n_days", F.count("*").over(wall))
        .withColumn("sx", F.sum(xdec).over(wall))
        .withColumn("sxx", F.sum(xdec * xdec).over(wall))
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    var = (nd * sxx - sx * sx) / (nd * nd)
    z = statted.withColumn(
        "mu", F.round(sx / nd, 9)
    ).withColumn(
        "sd",
        F.round(
            F.greatest(F.sqrt(F.greatest(var, F.lit(0.0))), F.lit(1e-9)),
            9,
        ),
    ).select(
        "day",
        "n_days",
        "mu",
        "sd",
        F.round(
            (F.col("n").cast("double") - F.col("mu")) / F.col("sd")
            - F.lit(float(CUSUM_SLACK)),
            9,
        )
        .cast("decimal(24,9)")
        .alias("zu"),
        F.round(
            (F.col("mu") - F.col("n").cast("double")) / F.col("sd")
            - F.lit(float(CUSUM_SLACK)),
            9,
        )
        .cast("decimal(24,9)")
        .alias("zd"),
    )
    wrun = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    prefixed = z.select(
        "day",
        "n_days",
        "mu",
        "sd",
        F.sum("zu").over(wrun).alias("pu"),
        F.sum("zd").over(wrun).alias("pd"),
    )
    zero = F.lit(0).cast("decimal(24,9)")
    cur = prefixed.select(
        "day",
        "n_days",
        "mu",
        "sd",
        (
            F.col("pu") - F.least(zero, F.min("pu").over(wrun))
        ).alias("su"),
        (
            F.col("pd") - F.least(zero, F.min("pd").over(wrun))
        ).alias("sd_cusum"),
    )
    # peaks as ordered windows + ONE global aggregate, not three
    # branches (up / down / zero-day estimate) each re-walking `cur`:
    # every row learns the global peak day/value via first() over the
    # total order, then a single agg reduces peaks AND the last-zero
    # changepoint estimates together. All windows run on the
    # |days|-sized frame; the corpus is scanned once.
    wu = W.orderBy(F.col("su").desc(), F.col("day").asc())
    wd = W.orderBy(F.col("sd_cusum").desc(), F.col("day").asc())
    enriched = (
        cur.withColumn("up_day", F.first("day").over(wu))
        .withColumn("up_su", F.first("su").over(wu))
        .withColumn("down_day", F.first("day").over(wd))
        .withColumn("down_sd", F.first("sd_cusum").over(wd))
    )
    zero_d = F.lit(0).cast("decimal(24,9)")
    est = enriched.agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("mu"), 6).alias("mean_daily"),
        F.round(F.max("sd"), 6).alias("sd_daily"),
        F.max("up_day").alias("up_day"),
        F.coalesce(
            F.max(
                F.when(
                    (F.col("su") == zero_d)
                    & (F.col("day") < F.col("up_day")),
                    F.col("day"),
                )
            ),
            F.min("day"),
        ).alias("up_change_day"),
        F.round(F.max("up_su").cast("double"), 6).alias("up_cusum"),
        F.max("down_day").alias("down_day"),
        F.coalesce(
            F.max(
                F.when(
                    (F.col("sd_cusum") == zero_d)
                    & (F.col("day") < F.col("down_day")),
                    F.col("day"),
                )
            ),
            F.min("day"),
        ).alias("down_change_day"),
        F.round(F.max("down_sd").cast("double"), 6).alias(
            "down_cusum"
        ),
    )
    return est.select(
        "n_days",
        "mean_daily",
        "sd_daily",
        "up_day",
        "up_change_day",
        "up_cusum",
        "down_day",
        "down_change_day",
        "down_cusum",
        (
            (F.col("up_cusum") >= CUSUM_THRESHOLD)
            | (F.col("down_cusum") >= CUSUM_THRESHOLD)
        ).alias("shift_detected"),
    )


CHANGEPOINT_SQL = f"""
WITH daily AS (
    SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), stats AS (
    SELECT COUNT(*) AS n_days,
        round(CAST(SUM(xd) AS DOUBLE) / COUNT(*), 9) AS mu,
        round(greatest(sqrt(greatest(
            (COUNT(*) * CAST(SUM(xd * xd) AS DOUBLE)
             - CAST(SUM(xd) AS DOUBLE) * CAST(SUM(xd) AS DOUBLE))
            / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)), 0.0)), 1e-9), 9)
            AS sd
    FROM (SELECT CAST(CAST(n AS DOUBLE) AS DECIMAL(24,9)) AS xd
          FROM daily)
), z AS (
    SELECT day, n_days, mu, sd,
        CAST(round((CAST(n AS DOUBLE) - mu) / sd - {CUSUM_SLACK}, 9)
             AS DECIMAL(24,9)) AS zu,
        CAST(round((mu - CAST(n AS DOUBLE)) / sd - {CUSUM_SLACK}, 9)
             AS DECIMAL(24,9)) AS zd
    FROM daily CROSS JOIN stats
), prefixed AS (
    SELECT day, n_days, mu, sd,
        SUM(zu) OVER w AS pu,
        SUM(zd) OVER w AS pd
    FROM z
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), runs AS MATERIALIZED (
    SELECT day, n_days, mu, sd,
        pu - least(CAST(0 AS DECIMAL(24,9)), MIN(pu) OVER w) AS su,
        pd - least(CAST(0 AS DECIMAL(24,9)), MIN(pd) OVER w) AS sd_cusum
    FROM prefixed
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), ranked AS (
    SELECT *,
        ROW_NUMBER() OVER (ORDER BY su DESC, day ASC) AS ru,
        ROW_NUMBER() OVER (ORDER BY sd_cusum DESC, day ASC) AS rd
    FROM runs
), peaks AS (
    SELECT u.n_days, u.mu, u.sd,
        u.day AS up_day, u.su AS up_su,
        d.day AS down_day, d.sd_cusum AS down_sd
    FROM (SELECT * FROM ranked WHERE ru = 1) u
    CROSS JOIN (SELECT * FROM ranked WHERE rd = 1) d
), est AS (
    SELECT
        COALESCE(MAX(CASE WHEN r.su = 0 AND r.day < p.up_day
                          THEN r.day END), MIN(r.day)) AS up_change_day,
        COALESCE(MAX(CASE WHEN r.sd_cusum = 0 AND r.day < p.down_day
                          THEN r.day END), MIN(r.day)) AS down_change_day
    FROM runs r CROSS JOIN peaks p
)
SELECT p.n_days, round(p.mu, 6) AS mean_daily, round(p.sd, 6) AS sd_daily,
    p.up_day, e.up_change_day,
    round(CAST(p.up_su AS DOUBLE), 6) AS up_cusum,
    p.down_day, e.down_change_day,
    round(CAST(p.down_sd AS DOUBLE), 6) AS down_cusum,
    (round(CAST(p.up_su AS DOUBLE), 6) >= {CUSUM_THRESHOLD}
     OR round(CAST(p.down_sd AS DOUBLE), 6) >= {CUSUM_THRESHOLD})
        AS shift_detected
FROM peaks p CROSS JOIN est e
"""


# --------------------------------------------- per-type OLS trend
#
# Least-squares daily-volume trend per event type: slope (events/day),
# intercept at the corpus's first day, and fit quality r² — the
# monitoring complement of ts_changepoint (that op asks WHEN the
# regime changed; this one asks which event types are secularly
# growing or decaying and how linear that drift is). stats_corr is the
# same algebra over lineitem COLUMNS; this is the time-series variant
# over the |days|-sized daily count table.
#
# Scale shape: corpus work is ONE (event_type, day) count agg; the
# regression runs over that days-sized table with INTEGER moment sums
# (x = day offset, y = count — both ints, exact in any accumulation
# order). The squared/cross moments are carried in DECIMAL(38,0):
# Spark's long SUM(y*y) would silently wrap once a per-day count
# passes ~3e9, while DuckDB promotes BIGINT sums to HUGEINT — the
# decimal armor keeps both engines exact to the same 38-digit width.
# The global first day attaches as a broadcast scalar.

_TREND_DAY = "ts div 1000000 div 86400000"


def trend_ols_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(_TREND_DAY).alias("day")
    ).agg(F.count("*").alias("y"))
    d0 = daily.agg(F.min("day").alias("day0"))
    m = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            (F.col("day") - F.col("day0")).alias("x"),
            "y",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(
                F.col("x").cast("decimal(19,0)")
                * F.col("x").cast("decimal(19,0)")
            ).alias("sxx"),
            F.sum(
                F.col("y").cast("decimal(19,0)")
                * F.col("y").cast("decimal(19,0)")
            ).alias("syy"),
            F.sum(
                F.col("x").cast("decimal(19,0)")
                * F.col("y").cast("decimal(19,0)")
            ).alias("sxy"),
        )
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.when(varx_n > 0, cov_n / varx_n).otherwise(F.lit(0.0))
    r2 = F.when(
        (varx_n > 0) & (vary_n > 0),
        (cov_n * cov_n) / (varx_n * vary_n),
    ).otherwise(F.lit(0.0))
    return m.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


TREND_OLS_SQL = """
WITH daily AS (
    SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        COUNT(*) AS y
    FROM events GROUP BY 1, 2
), d0 AS (SELECT MIN(day) AS day0 FROM daily),
m AS (
    SELECT event_type,
        COUNT(*) AS n_days,
        SUM(day - day0) AS sx,
        SUM(y) AS sy,
        SUM((day - day0) * (day - day0)) AS sxx,
        SUM(y * y) AS syy,
        SUM((day - day0) * y) AS sxy
    FROM daily CROSS JOIN d0
    GROUP BY event_type
)
SELECT event_type,
    CAST(n_days AS BIGINT) AS n_days,
    round(CASE WHEN nn * sxxd - sxd * sxd > 0
               THEN (nn * sxyd - sxd * syd) / (nn * sxxd - sxd * sxd)
               ELSE 0.0 END, 6) AS slope_per_day,
    round((syd - (CASE WHEN nn * sxxd - sxd * sxd > 0
                       THEN (nn * sxyd - sxd * syd)
                            / (nn * sxxd - sxd * sxd)
                       ELSE 0.0 END) * sxd) / nn, 6) AS intercept,
    round(CASE WHEN nn * sxxd - sxd * sxd > 0
                AND nn * syyd - syd * syd > 0
               THEN (nn * sxyd - sxd * syd) * (nn * sxyd - sxd * syd)
                    / ((nn * sxxd - sxd * sxd)
                       * (nn * syyd - syd * syd))
               ELSE 0.0 END, 6) AS r2
FROM (
    SELECT event_type, n_days,
        CAST(n_days AS DOUBLE) AS nn,
        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
        CAST(sxy AS DOUBLE) AS sxyd
    FROM m
)
"""


# ------------------------------------ week-over-week volume growth
#
# The operational complement of ts_trend_ols: instead of one fitted
# slope per type, the discrete week-over-week growth series a volume
# dashboard plots and alerts on. Weeks are epoch-day floor-division
# buckets (integer, engine-identical); growth = (n − prev)/prev.
# Weeks with zero events simply don't appear — the LAG is over
# OBSERVED weeks (ts_gap_fill is the calendar-densifying op).
#
# Scale shape: one (event_type, week) count agg (combiner-backed);
# the LAG window runs over that |weeks|-sized table, partitioned by
# type. All integers until the final ratio.

_WOW_WEEK = "ts div 1000000 div 86400000 div 7"


def wow_growth_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.expr(_WOW_WEEK).alias("week")
    ).agg(F.count("*").alias("n_events"))
    w = W.partitionBy("event_type").orderBy("week")
    lagged = weekly.withColumn(
        "prev_events", F.lag("n_events").over(w)
    ).where(F.col("prev_events").isNotNull())
    return lagged.select(
        "event_type",
        F.col("week").cast("long").alias("week"),
        "n_events",
        "prev_events",
        F.round(
            (F.col("n_events") - F.col("prev_events")).cast("double")
            / F.col("prev_events"),
            6,
        ).alias("wow_growth"),
    )


WOW_GROWTH_SQL = """
WITH weekly AS (
    SELECT event_type, epoch_ms(ts) // 86400000 // 7 AS week,
        COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT event_type, week, n_events,
        LAG(n_events) OVER (PARTITION BY event_type ORDER BY week)
            AS prev_events
    FROM weekly
)
SELECT event_type, CAST(week AS BIGINT) AS week, n_events,
    prev_events,
    round(CAST(n_events - prev_events AS DOUBLE) / prev_events, 6)
        AS wow_growth
FROM lagged WHERE prev_events IS NOT NULL
"""


# ------------------------------------ Theil–Sen robust trend slope
#
# The robust complement of ts_trend_ols: the median of all pairwise
# slopes (y_j − y_i)/(x_j − x_i) over the per-type daily-count
# series, plus the matching median-residual intercept. Breakdown
# point ~29% — a burst day that drags the OLS line barely moves
# this one; the OLS-vs-Theil-Sen gap is the outlier alarm.
#
# Scale: the pair join is over the (type, day) DAILY table, which is
# bounded by types × span-days regardless of event volume — days²
# pairs per type is thousands of rows, not corpus-sized; the only
# corpus-scaled stage is the daily count agg (map-side combine).
# Determinism: slopes are ratios of exact integers (identical IEEE
# division both engines); the median avoids interpolation-formula
# drift by explicitly averaging the two middle elements under a
# total (slope, x1, x2) order — AVG over ≤2 doubles is the same
# sum/2 in both engines. Residuals use the 6-dp-rounded slope so
# both engines fold identical inputs.

# middle ranks (1-indexed): Spark SQL spells integer division `div`,
# DuckDB spells it `//` — same floor semantics on positive ints
_TS_K1 = "(n_pairs + 1) div 2"  # lower-middle rank (Spark)
_TS_K2 = "n_pairs div 2 + 1"  # upper-middle rank (Spark)


def theil_sen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    d0 = ev.agg(
        F.min(F.expr(_TREND_DAY)).alias("day0")
    )
    daily = (
        ev.groupBy("event_type", F.expr(_TREND_DAY).alias("day"))
        .agg(F.count("*").alias("y"))
        .crossJoin(F.broadcast(d0))
        .select(
            "event_type", (F.col("day") - F.col("day0")).alias("x"), "y"
        )
    ).persist()  # |types|x|days| table; its three consumers (both
    # pair-join sides + the residual pass) otherwise re-scan events —
    # exchange reuse does not dedupe sibling branches (r8 scan audit:
    # 6 corpus scans -> 2, the day0 probe + the daily aggregate)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    wp = W.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number()
        .over(wp.orderBy("slope", "x1", "x2"))
        .alias("rn"),
        F.count("*").over(wp).alias("n_pairs"),
    )
    med = (
        ranked.where(
            (F.col("rn") == F.expr(_TS_K1))
            | (F.col("rn") == F.expr(_TS_K2))
        )
        .groupBy("event_type", "n_pairs")
        .agg(F.round(F.avg("slope"), 6).alias("ts_slope"))
    )
    resid = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n_pairs",
        "ts_slope",
        (
            F.col("y").cast("double")
            - F.col("ts_slope") * F.col("x").cast("double")
        ).alias("r"),
    )
    wr = W.partitionBy("event_type")
    rranked = resid.select(
        "event_type",
        "n_pairs",
        "ts_slope",
        "r",
        F.row_number().over(wr.orderBy("r")).alias("rn"),
        F.count("*").over(wr).alias("n_days"),
    )
    k1 = "(n_days + 1) div 2"
    k2 = "n_days div 2 + 1"
    return (
        rranked.where(
            (F.col("rn") == F.expr(k1)) | (F.col("rn") == F.expr(k2))
        )
        .groupBy("event_type", "n_days", "n_pairs", "ts_slope")
        .agg(F.round(F.avg("r"), 6).alias("ts_intercept"))
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "ts_slope",
            "ts_intercept",
        )
    )


THEIL_SEN_SQL = f"""
WITH d0 AS (
    SELECT MIN(epoch_ms(ts) // 86400000) AS day0 FROM events
), daily AS MATERIALIZED (
    SELECT event_type, epoch_ms(ts) // 86400000 - day0 AS x,
        COUNT(*) AS y
    FROM events CROSS JOIN d0 GROUP BY 1, 2
), pairs AS (
    SELECT a.event_type, a.x AS x1, b.x AS x2,
        CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.x < b.x
), ranked AS (
    SELECT event_type, slope,
        ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY slope, x1, x2) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM pairs
), med AS (
    SELECT event_type, n_pairs, round(AVG(slope), 6) AS ts_slope
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2 OR rn = n_pairs // 2 + 1
    GROUP BY event_type, n_pairs
), resid AS (
    SELECT d.event_type, m.n_pairs, m.ts_slope,
        CAST(d.y AS DOUBLE) - m.ts_slope * CAST(d.x AS DOUBLE) AS r
    FROM daily d JOIN med m USING (event_type)
), rranked AS (
    SELECT event_type, n_pairs, ts_slope, r,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n_days
    FROM resid
)
SELECT event_type,
    CAST(n_days AS BIGINT) AS n_days,
    CAST(n_pairs AS BIGINT) AS n_pairs,
    ts_slope,
    round(AVG(r), 6) AS ts_intercept
FROM rranked
WHERE rn = (n_days + 1) // 2 OR rn = n_days // 2 + 1
GROUP BY event_type, n_days, n_pairs, ts_slope
"""


# ------------------------------------ deseasonalized outlier days
#
# Seasonality-aware anomaly detection: daily event counts minus
# their day-of-week mean (the ts_seasonality decomposition), then
# z-scored against the population residual spread — surfacing the
# days that were anomalous FOR THEIR WEEKDAY (a quiet Sunday spike
# that raw z-scores miss under busy-weekday variance, and vice
# versa). Top |z| days reported with their expectation.
#
# Scale: the corpus-sized stage is one daily count agg; slot means,
# residuals, and the top-N ranking all run over the |days|-bounded
# daily table (global windows there sit over aggregates — the
# audited exemption). Determinism: counts and slot sums are exact
# integers; slot means round to 9 dp before residuals (the stats_mad
# armor); Σr² folds as integer nano-units; final z is one IEEE
# expression.

SEAS_OUT_PERIOD = 7
SEAS_OUT_TOP = 10


def seasonal_outliers_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr(_TREND_DAY).alias("day")).agg(
        F.count("*").alias("n")
    ).persist()  # |days|-sized; slot means + residual join + spread
    # each re-scanned events un-cached (r9 audit)
    slotted = daily.select(
        "day", "n", (F.col("day") % SEAS_OUT_PERIOD).alias("slot")
    )
    slot_mean = slotted.groupBy("slot").agg(
        F.round(F.avg("n"), 9).alias("slot_mean")
    )
    resid = slotted.join(F.broadcast(slot_mean), "slot").select(
        "day",
        "n",
        "slot",
        "slot_mean",
        (F.col("n").cast("double") - F.col("slot_mean")).alias("r"),
    )
    spread = resid.agg(
        F.count("*").alias("n_days"),
        F.sum(F.floor(F.col("r") * F.col("r") * 1e9 + 0.5)).alias(
            "_ss"
        ),
    ).select(
        "n_days",
        F.sqrt(
            F.col("_ss").cast("double")
            / 1e9
            / F.col("n_days").cast("double")
        ).alias("resid_std"),
    )
    scored = resid.crossJoin(F.broadcast(spread)).select(
        "day",
        "slot",
        "n",
        F.round("slot_mean", 6).alias("expected"),
        F.round(F.col("r") / F.col("resid_std"), 6).alias("z"),
    )
    w = W.orderBy(F.abs(F.col("z")).desc(), F.col("day"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SEAS_OUT_TOP)
        .select("rank", "day", "slot", "n", "expected", "z")
    )


SEASONAL_OUTLIERS_SQL = f"""
WITH daily AS (
    SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), slotted AS (
    SELECT day, n, day % {SEAS_OUT_PERIOD} AS slot FROM daily
), slot_mean AS (
    SELECT slot, round(AVG(n), 9) AS slot_mean
    FROM slotted GROUP BY slot
), resid AS (
    SELECT day, n, s.slot, slot_mean,
        CAST(n AS DOUBLE) - slot_mean AS r
    FROM slotted s JOIN slot_mean USING (slot)
), spread AS (
    SELECT sqrt(CAST(SUM(CAST(floor(r * r * 1e9 + 0.5) AS BIGINT))
                     AS DOUBLE) / 1e9 / COUNT(*)) AS resid_std
    FROM resid
), scored AS (
    SELECT day, slot, n, round(slot_mean, 6) AS expected,
        round(r / resid_std, 6) AS z
    FROM resid CROSS JOIN spread
)
SELECT ROW_NUMBER() OVER (ORDER BY abs(z) DESC, day) AS rank,
    day, slot, CAST(n AS BIGINT) AS n, expected, z
FROM scored
QUALIFY rank <= {SEAS_OUT_TOP}
"""


# ------------------------------------------- Holt linear forecasting
#
# Double-exponential (Holt) smoothing of the per-type daily volume
# series, h-step-ahead forecast grid — the capacity-planning consumer
# of the trend ops above (OLS/Theil-Sen give a global line; Holt
# tracks a drifting level+trend and extrapolates it).
#
# State recurrence, ALGEBRAICALLY EXPANDED so each field is one
# independent linear combination (no shared l' subexpression —
# DuckDB 1.0 mis-evaluates struct-state list_reduce lambdas whose
# fields reference each other, so the oracle uses a recursive CTE and
# both engines need the exact same IEEE expression tree):
#   l_t = 0.5*x_t + 0.5*l_{t-1} + 0.5*b_{t-1}
#   b_t = 0.125*x_t - 0.125*l_{t-1} + 0.875*b_{t-1}
# (alpha = 0.5, beta = 0.25 — dyadic, so every multiply is exact.)
#
# Scale: ONE daily count agg (combiner-backed, |types|x|days| rows);
# the sequential fold runs over a per-type array of ~|days| elements
# inside a |types|-row aggregate — the fold is inherently sequential
# in TIME but the heavy corpus scan is fully parallel; state is O(1)
# per series. Determinism: identical left fold in both engines
# (Spark F.aggregate == recursive-CTE join by construction).

HOLT_HORIZON = 7


def holt_winters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(_TREND_DAY).alias("day")
    ).agg(F.count("*").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("sd")
    )
    st = series.select(
        "event_type",
        F.size("sd").alias("n_days"),
        F.expr(
            "aggregate("
            "  slice(sd, 2, size(sd) - 1),"
            "  named_struct("
            "    'l', CAST(sd[0].n AS DOUBLE), 'b', CAST(0 AS DOUBLE)),"
            "  (acc, s) -> named_struct("
            "    'l', 0.5D*CAST(s.n AS DOUBLE) + 0.5D*acc.l + 0.5D*acc.b,"
            "    'b', 0.125D*CAST(s.n AS DOUBLE) - 0.125D*acc.l"
            "         + 0.875D*acc.b))"
        ).alias("st"),
    )
    hgrid = F.explode(
        F.array(*[F.lit(h) for h in range(1, HOLT_HORIZON + 1)])
    ).alias("h")
    return st.select(
        "event_type", "n_days", F.col("st.l").alias("l"),
        F.col("st.b").alias("b"), hgrid
    ).select(
        "event_type",
        "n_days",
        "h",
        F.round("l", 6).alias("level"),
        F.round("b", 6).alias("trend"),
        F.round(
            F.col("l") + F.col("h").cast("double") * F.col("b"), 6
        ).alias("forecast"),
    )


HOLT_WINTERS_SQL = f"""
WITH RECURSIVE daily AS (
    SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        COUNT(*) AS n
    FROM events GROUP BY 1, 2
), idx AS (
    SELECT event_type, CAST(n AS DOUBLE) AS x,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
        COUNT(*) OVER (PARTITION BY event_type) AS n_days
    FROM daily
), st AS (
    SELECT event_type, i, n_days, x AS l, CAST(0 AS DOUBLE) AS b
    FROM idx WHERE i = 1
    UNION ALL
    SELECT st.event_type, idx.i, st.n_days,
        0.5e0*idx.x + 0.5e0*st.l + 0.5e0*st.b,
        0.125e0*idx.x - 0.125e0*st.l + 0.875e0*st.b
    FROM st JOIN idx
        ON idx.event_type = st.event_type AND idx.i = st.i + 1
), fin AS (
    SELECT event_type, n_days, l, b FROM st WHERE i = n_days
)
SELECT event_type, CAST(n_days AS INT) AS n_days, h,
    round(l, 6) AS level, round(b, 6) AS trend,
    round(l + CAST(h AS DOUBLE) * b, 6) AS forecast
FROM fin CROSS JOIN (
    SELECT unnest([{", ".join(str(h) for h in range(1, HOLT_HORIZON + 1))}]) AS h
)
"""


# --------------------------------------- Kaplan-Meier survival curve
#
# Survival analysis of the inter-event gap ("how long until a user's
# next event"): classic churn/engagement curve. Every consecutive
# event pair contributes one fully-observed gap in days; the KM
# estimator over the day grid is S(t) = prod_{u<=t} (1 - d_u/n_u)
# with d_u = gaps of exactly u days and n_u = gaps >= u days.
# Output carries LOG-survival (sum of 9-dp-rounded lns, the blessed
# cross-engine pattern) — exp() is not correctly-rounded in either
# engine, so the curve is reported in log space; the terminal row
# where n == d (survival hits exactly 0) carries NULL.
#
# Scale: the lag runs per-user (partitioned window); the day-grid
# histogram is a combiner-backed agg to <= |days| rows; both global
# windows (at-risk reverse-cumsum, log-surv cumsum) run over that
# bounded grid (plan-audit whitelist: gap-day-keyed agg).

def survival_km_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr(_TREND_DAY).alias("day")
    )
    wu = W.partitionBy("user_id").orderBy("day", "event_id")
    gaps = (
        ev.withColumn("prev_day", F.lag("day").over(wu))
        .where(F.col("prev_day").isNotNull())
        .select((F.col("day") - F.col("prev_day")).alias("t"))
    )
    hist = gaps.groupBy("t").agg(F.count("*").alias("d"))
    wrisk = W.orderBy(F.col("t").desc())
    at_risk = hist.withColumn("n_at_risk", F.sum("d").over(wrisk))
    term = F.when(
        F.col("n_at_risk") > F.col("d"),
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            ),
            9,
        ).cast("decimal(20,9)"),
    )
    wcum = W.orderBy("t")
    return (
        at_risk.withColumn("_lt", term)
        .withColumn("_cum", F.sum("_lt").over(wcum))
        .select(
            "t",
            "d",
            "n_at_risk",
            F.when(
                F.col("n_at_risk") > F.col("d"),
                F.round(F.col("_cum").cast("double"), 6),
            ).alias("km_log_surv"),
        )
    )


SURVIVAL_KM_SQL = """
WITH ev AS (
    SELECT user_id, event_id, epoch_ms(ts) // 86400000 AS day
    FROM events
), gaps AS (
    SELECT day - LAG(day) OVER (
        PARTITION BY user_id ORDER BY day, event_id) AS t
    FROM ev
), hist AS (
    SELECT t, COUNT(*) AS d FROM gaps WHERE t IS NOT NULL GROUP BY t
), at_risk AS (
    SELECT t, d, SUM(d) OVER (ORDER BY t DESC) AS n_at_risk
    FROM hist
), terms AS (
    SELECT t, d, n_at_risk,
        CASE WHEN n_at_risk > d THEN
            CAST(round(ln(CAST(n_at_risk - d AS DOUBLE)
                          / CAST(n_at_risk AS DOUBLE)), 9)
                 AS DECIMAL(20,9))
        END AS lt
    FROM at_risk
)
SELECT t, CAST(d AS BIGINT) AS d,
    CAST(n_at_risk AS BIGINT) AS n_at_risk,
    CASE WHEN n_at_risk > d THEN
        round(CAST(SUM(lt) OVER (ORDER BY t) AS DOUBLE), 6)
    END AS km_log_surv
FROM terms
"""


# --------------------------------------- bucketed interval-overlap join
#
# "How many orders were IN FLIGHT in each calendar month?" — each
# order's fulfillment interval [o_orderdate, max ship date of its
# lines] overlap-joined against the month grid. A naive range join
# (grid CROSS JOIN intervals with an overlap predicate — exactly what
# the oracle runs) is quadratic-ish and unprunable; the Spark plan
# EXPLODES each interval into the months it covers (bounded fan-out:
# fulfillment spans a few months) and group-counts — turning the
# range join into an equi-shuffle, the standard interval-bucketing
# trick for time-range joins at scale.
#
# Scale: orders⋈lineitem is key-co-partitioned (SMJ on the join key,
# AQE-managed); the explode adds <= months-spanned rows per order;
# the month agg is combiner-backed and |months|-sized. Determinism:
# month indices are pure integer epoch-day arithmetic; sums are
# integer cents via the floor fold.

_MONTH_OF_DAY = "((y - 1970) * 12 + m - 1)"  # month index from y/m


def interval_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.floor(
            F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
        ).cast("long").alias("cents"),
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    span = (
        orders.join(
            li, orders.o_orderkey == li.l_orderkey
        )
        .groupBy("o_orderkey", "o_orderdate", "cents")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "cents",
            (
                (F.year("o_orderdate") - 1970) * 12
                + F.month("o_orderdate") - 1
            ).alias("m0"),
            (
                (F.year("last_ship") - 1970) * 12
                + F.month("last_ship") - 1
            ).alias("m1"),
        )
        # clamp: a ship date before the order date (possible in the
        # synthetic data) must not make F.sequence step BACKWARDS —
        # an in-flight interval covers at least the order month
        .select(
            "cents",
            "m0",
            F.greatest("m0", "m1").alias("m1"),
        )
    )
    # interval -> covered-months explode (the bucketing step)
    exploded = span.select(
        "cents",
        F.explode(F.sequence("m0", "m1")).alias("mth_idx"),
    )
    return (
        exploded.groupBy("mth_idx")
        .agg(
            F.count("*").alias("n_open_orders"),
            F.sum("cents").alias("open_value_cents"),
        )
        .select(
            "mth_idx", "n_open_orders", "open_value_cents",
        )
    )


INTERVAL_JOIN_SQL = """
WITH span AS (
    SELECT m0, greatest(m0, m1) AS m1, cents
    FROM (
    SELECT
        (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
            AS m0,
        (year(last_ship) - 1970) * 12 + month(last_ship) - 1 AS m1,
        cents
    FROM (
        SELECT o.o_orderkey, o.o_orderdate,
            CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                AS cents,
            MAX(l.l_shipdate) AS last_ship
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    )
    )
), grid AS (
    SELECT unnest(range(
        (SELECT MIN(m0) FROM span),
        (SELECT MAX(m1) FROM span) + 1)) AS mth_idx
)
SELECT g.mth_idx,
    CAST(COUNT(*) AS BIGINT) AS n_open_orders,
    CAST(SUM(s.cents) AS BIGINT) AS open_value_cents
FROM grid g JOIN span s ON g.mth_idx BETWEEN s.m0 AND s.m1
GROUP BY g.mth_idx
"""


# ------------------------------------------------ SAX discretization
#
# Symbolic Aggregate approXimation (Lin et al. 2003) of each event
# type's daily-count series: PAA-segment the observed days into
# SAX_SEGMENTS equal-count segments, z-normalize each segment mean
# against the type's own mean/sd, and map to a 4-letter alphabet at
# the standard Gaussian breakpoints (-0.6745, 0, 0.6745). The symbol
# string is the classic cheap index for motif/similarity search over
# time series.
#
# Scale: one daily count agg (combiner-backed), then per-type
# windows (partitioned — no global sort) and a |types|x|segments|
# result. Determinism: segment assignment is integer div over the
# day RANK (sparse days welcome); mean/sd come from integer moments
# (DECIMAL-exact); z and the breakpoint comparisons evaluate ONE
# shared formula string on identical doubles, so the CASE picks the
# same letter in both engines; z_milli is a floor fold.

SAX_SEGMENTS = 6

# z of a segment mean, from integer moments (shared formula; E0
# literals keep Spark in double arithmetic)
_SAX_Z = (
    "((CAST(t_s AS DOUBLE) / c_s - CAST(tt AS DOUBLE) / dd)"
    " / sqrt((dd * CAST(sxx AS DOUBLE)"
    " - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)) / (dd * dd)))"
)
_SAX_SYMBOL = (
    f"CASE WHEN {_SAX_Z} < -0.6745E0 THEN 'a'"
    f" WHEN {_SAX_Z} < 0.0E0 THEN 'b'"
    f" WHEN {_SAX_Z} < 0.6745E0 THEN 'c' ELSE 'd' END"
)
_SAX_Z_MILLI = f"CAST(floor({_SAX_Z} * 1000 + 0.5E0) AS BIGINT)"


def sax_symbols_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(_TREND_DAY).alias("day")
    ).agg(F.count("*").alias("n"))
    wt = W.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "n",
        (F.row_number().over(wt.orderBy("day")) - 1).alias("di"),
        F.count("*").over(wt).alias("dd"),
        F.sum("n").over(wt).alias("tt"),
        F.sum(
            F.col("n").cast("decimal(19,0)")
            * F.col("n").cast("decimal(19,0)")
        ).over(wt).alias("sxx"),
    )
    segs = ranked.select(
        "event_type",
        "n",
        "dd",
        "tt",
        "sxx",
        F.expr(f"(di * {SAX_SEGMENTS}) div dd").alias("seg"),
    ).groupBy("event_type", "seg").agg(
        F.count("*").alias("c_s"),
        F.sum("n").alias("t_s"),
        F.max("dd").alias("dd"),
        F.max("tt").alias("tt"),
        F.max("sxx").alias("sxx"),
    )
    return segs.select(
        "event_type",
        "seg",
        "c_s",
        "t_s",
        F.expr(_SAX_Z_MILLI).alias("z_milli"),
        F.expr(_SAX_SYMBOL).alias("symbol"),
    )


SAX_SYMBOLS_SQL = f"""
WITH daily AS (
    SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        COUNT(*) AS n
    FROM events GROUP BY 1, 2
), ranked AS (
    SELECT event_type, n,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1
            AS di,
        COUNT(*) OVER (PARTITION BY event_type) AS dd,
        SUM(n) OVER (PARTITION BY event_type) AS tt,
        SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
            OVER (PARTITION BY event_type) AS sxx
    FROM daily
), segs AS (
    SELECT event_type, (di * {SAX_SEGMENTS}) // dd AS seg,
        COUNT(*) AS c_s, CAST(SUM(n) AS BIGINT) AS t_s,
        MAX(dd) AS dd, MAX(tt) AS tt, MAX(sxx) AS sxx
    FROM ranked GROUP BY 1, 2
)
SELECT event_type, CAST(seg AS BIGINT) AS seg, c_s, t_s,
    {_SAX_Z_MILLI} AS z_milli,
    {_SAX_SYMBOL} AS symbol
FROM segs
"""


REGISTRY = [
    ("temporal_asof_join", asof_join_query, ASOF_JOIN_SQL),
    ("temporal_range_join", range_join_query, RANGE_JOIN_SQL),
    ("temporal_rollup", rollup_query, ROLLUP_SQL),
    ("temporal_sliding_window", sliding_window_query, SLIDING_WINDOW_SQL),
    ("ts_autocorrelation", autocorr_query, AUTOCORR_SQL),
    ("ts_profile_topk", ts_profile_topk_query, TS_PROFILE_TOPK_SQL),
    ("ts_seasonality", seasonality_query, SEASONALITY_SQL),
    # two-sided CUSUM level-shift detection (window closed form)
    ("ts_changepoint", changepoint_query, CHANGEPOINT_SQL),
    # per-type OLS daily-volume trend (integer-exact moments)
    ("ts_trend_ols", trend_ols_query, TREND_OLS_SQL),
    # discrete week-over-week growth over observed weeks
    ("events_wow_growth", wow_growth_query, WOW_GROWTH_SQL),
    # Theil–Sen median-of-pairwise-slopes robust trend
    ("ts_theil_sen", theil_sen_query, THEIL_SEN_SQL),
    # day-of-week deseasonalized residual z-score outlier days
    ("ts_seasonal_outliers", seasonal_outliers_query,
     SEASONAL_OUTLIERS_SQL),
    # Holt double-exponential level+trend forecast grid (round 8)
    ("ts_holt_winters", holt_winters_query, HOLT_WINTERS_SQL),
    # Kaplan-Meier inter-event-gap survival curve (round 8)
    ("events_survival_km", survival_km_query, SURVIVAL_KM_SQL),
    # bucketed interval-overlap join (explode-to-months equi-shuffle)
    ("temporal_interval_join", interval_join_query, INTERVAL_JOIN_SQL),
    # SAX symbolic discretization of per-type daily series
    ("ts_sax_symbols", sax_symbols_query, SAX_SYMBOLS_SQL),
]
