"""Gap-based sessionization over the event stream.

The CDC layer groups events into *transactions* by fixed minute
buckets (envelope.py); a training-data pipeline also needs the
behavioral grouping: a session ends after GAP_MS of inactivity. Batch
shape: lag → gap flag → running sum (the gaps-and-islands idiom) —
one exchange on user_id, two window passes over it, no state store.
The streaming twin is `F.session_window(ts, gap)` in a watermarked
aggregation (same semantics, state-store backed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

GAP_MS = 30 * 60 * 1000  # 30 min inactivity closes a session


def sessionize(events: DataFrame) -> DataFrame:
    """Stamp each event with its (user_id, session_no)."""
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = (
        F.col("ts_ms") - F.lag("ts_ms").over(w) > GAP_MS
    ).cast("int")
    return events.withColumn(
        "session_no",
        F.sum(F.coalesce(gap, F.lit(0))).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def session_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session accounting: count, sizes, longest span."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.expr("ts div 1000000").alias("ts_ms"), "user_id"
    )
    sess = sessionize(ev)
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("span_ms"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.max("span_ms").alias("max_session_span_ms"),
    )


SESSION_STATS_SQL = f"""
WITH ev AS (
    SELECT event_id, epoch_ms(ts) AS ts_ms, user_id FROM events
), flagged AS (
    SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > {GAP_MS}
                   THEN 1 ELSE 0 END AS gap
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), sess AS (
    SELECT *, SUM(gap) OVER (
        PARTITION BY user_id ORDER BY ts_ms, event_id
        ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
), per_session AS (
    SELECT user_id, session_no, COUNT(*) AS n_events,
        MAX(ts_ms) - MIN(ts_ms) AS span_ms
    FROM sess GROUP BY user_id, session_no
)
SELECT user_id, COUNT(*) AS n_sessions,
    CAST(SUM(n_events) AS BIGINT) AS n_events,
    MAX(n_events) AS max_session_events,
    MAX(span_ms) AS max_session_span_ms
FROM per_session GROUP BY user_id
"""

# ------------------------------------------------ peak concurrency
#
# Peak simultaneous sessions — the capacity number ("how many users
# were on AT ONCE at the worst moment"), via the classic sweep-line:
# each session contributes (+1 at start, −1 past end), the running sum
# over the time-ordered deltas is the live-session count, its max is
# the peak. The sweep's single-ordered window runs over 2·|sessions|
# boundary rows, never the raw events (the stats_ks_test pattern: the
# corpus-sized work is the session agg; the global sort is over the
# SMALL derived table — at extreme scale you'd bucket time and take
# per-bucket maxima). Tie convention: ends (−1) sort before starts
# (+1) at the same ms — back-to-back sessions don't double-count —
# identical ORDER BY (t, delta) in both engines.


def peak_concurrency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.expr("ts div 1000000").alias("ts_ms"), "user_id"
    )
    sess = sessionize(ev).groupBy("user_id", "session_no").agg(
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
    )
    deltas = sess.select(
        F.col("start_ms").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        # end is exclusive at end_ms + 1 so a 1-event session still
        # occupies its instant
        sess.select(
            (F.col("end_ms") + 1).alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = W.orderBy("t", "delta").rowsBetween(W.unboundedPreceding, 0)
    live = deltas.select(F.sum("delta").over(w).alias("live"))
    return (
        live.agg(F.max("live").alias("peak_concurrent"))
        .crossJoin(
            F.broadcast(sess.agg(F.count("*").alias("n_sessions")))
        )
        .select(
            "peak_concurrent",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
        )
    )


PEAK_CONCURRENCY_SQL = f"""
WITH ev AS (
    SELECT event_id, epoch_ms(ts) AS ts_ms, user_id FROM events
), flagged AS (
    SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > {GAP_MS}
                   THEN 1 ELSE 0 END AS gap
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), sess0 AS (
    SELECT *, SUM(gap) OVER (
        PARTITION BY user_id ORDER BY ts_ms, event_id
        ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
), sess AS (
    SELECT user_id, session_no, MIN(ts_ms) AS start_ms,
        MAX(ts_ms) AS end_ms
    FROM sess0 GROUP BY user_id, session_no
), deltas AS (
    SELECT start_ms AS t, 1 AS delta FROM sess
    UNION ALL SELECT end_ms + 1, -1 FROM sess
), live AS (
    SELECT SUM(delta) OVER (ORDER BY t, delta
        ROWS UNBOUNDED PRECEDING) AS live
    FROM deltas
)
SELECT (SELECT CAST(MAX(live) AS BIGINT) FROM live) AS peak_concurrent,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM sess) AS n_sessions
"""


REGISTRY = [
    ("sessionize_events", session_stats_query, SESSION_STATS_SQL),
    ("events_peak_concurrency", peak_concurrency_query,
     PEAK_CONCURRENCY_SQL),
]
