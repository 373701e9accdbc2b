"""Count sink — per-event-type counters (the reference's test oracle
sink, applier/count/CountApplier.java:37-45)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.envelope import CHANGE_FEED_SQL, change_feed


def count_sink(feed: DataFrame) -> DataFrame:
    return feed.groupBy("op").agg(F.count("*").alias("n_events"))


def count_sink_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_sink(change_feed(spark, sf_dir))


COUNT_SINK_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL})
SELECT op, COUNT(*) AS n_events FROM feed GROUP BY op
"""

REGISTRY = [("sink_count", count_sink_query, COUNT_SINK_SQL)]
