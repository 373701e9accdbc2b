"""Seeker: exactly-once-ish resume trim after restart.

Reference: KafkaSeeker (applier/kafka/KafkaSeeker.java:65-144; interface
applier/Seeker.java:13-47). After a restart the supplier replays from
the last safe checkpoint; events that were already delivered to the
sink must be suppressed. The reference inspects each Kafka partition's
tail and drops incoming events ≤ that partition's last-seen position
until every partition is "sought".

Spark-first: the sink tail is a tiny per-partition aggregate (one row
per partition), so the trim is `feed LEFT JOIN broadcast(watermarks)`
+ a filter — no state, no driver loop. With a transactional sink this
operator disappears entirely (Structured Streaming's commit log); it
exists for sinks with no transactional read-back (Kafka).

The checkable model: partition = md5-bucket of txn_uuid (the Kafka
routing key, KafkaApplier.java:162); "already applied" = the replayed
prefix (event_id ≤ ⌈max/3⌉ — the resume point); per-partition watermark
= max applied event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import CHANGE_FEED_SQL, change_feed
from .partitioners import md5_bucket

N_PARTITIONS = 8


def seek_trim(feed: DataFrame, applied: DataFrame) -> DataFrame:
    """Suppress feed events at-or-below their partition's watermark.

    `applied` is the sink tail: (partition, watermark_event_id). It is
    one row per partition — always broadcast, never a shuffled join.
    """
    return (
        feed.join(F.broadcast(applied), "partition", "left")
        .where(
            F.col("watermark_event_id").isNull()
            | (F.col("event_id") > F.col("watermark_event_id"))
        )
        .drop("watermark_event_id")
    )


def seeker_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition resume accounting: watermark, #suppressed, #passed."""
    feed = change_feed(spark, sf_dir).withColumn(
        "partition", md5_bucket(F.col("txn_uuid"), N_PARTITIONS)
    )
    # resume point = a third of the stream already applied before
    # restart — integer FLOOR division on both engines (a float-divide
    # then cast TRUNCATES in Spark but ROUNDS in DuckDB, so the two
    # sides disagreed whenever max(event_id) % 3 == 2)
    resume = feed.agg(
        F.expr("max(event_id) div 3").alias("resume_id")
    )
    feed_r = feed.crossJoin(F.broadcast(resume))
    applied = (
        feed_r.where(F.col("event_id") <= F.col("resume_id"))
        .groupBy("partition")
        .agg(F.max("event_id").alias("watermark_event_id"))
    )
    return (
        feed_r.join(F.broadcast(applied), "partition", "left")
        .groupBy("partition")
        .agg(
            F.max("watermark_event_id").alias("watermark_event_id"),
            F.sum(
                F.when(
                    F.col("event_id") <= F.col("watermark_event_id"), 1
                ).otherwise(0)
            ).alias("n_suppressed"),
            F.sum(
                F.when(
                    F.col("watermark_event_id").isNull()
                    | (F.col("event_id") > F.col("watermark_event_id")),
                    1,
                ).otherwise(0)
            ).alias("n_passed"),
        )
        .orderBy("partition")
    )


SEEKER_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
parted AS (
    SELECT *,
        CAST((strpos('0123456789abcdef', substr(md5(txn_uuid), 1, 1)) - 1)
             % {N_PARTITIONS} AS INT) AS partition
    FROM feed
),
resume AS (SELECT MAX(event_id) // 3 AS resume_id FROM parted),
applied AS (
    SELECT partition, MAX(event_id) AS watermark_event_id
    FROM parted, resume WHERE event_id <= resume_id
    GROUP BY partition
)
SELECT p.partition,
    MAX(a.watermark_event_id) AS watermark_event_id,
    CAST(SUM(CASE WHEN p.event_id <= a.watermark_event_id THEN 1 ELSE 0 END)
        AS BIGINT) AS n_suppressed,
    CAST(SUM(CASE WHEN a.watermark_event_id IS NULL
             OR p.event_id > a.watermark_event_id THEN 1 ELSE 0 END)
        AS BIGINT) AS n_passed
FROM parted p LEFT JOIN applied a USING (partition)
GROUP BY p.partition
ORDER BY p.partition
"""

REGISTRY = [("cdc_seeker_resume", seeker_query, SEEKER_SQL)]
