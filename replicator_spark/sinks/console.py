"""Console sink — JSON-print each change event (reference:
applier/console/ConsoleApplier.java:48-60, with the Jackson column
filter of KafkaApplier.setupColumnsFilter:127-141 as a select)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.envelope import CHANGE_FEED_SQL, change_feed


def console_format(feed: DataFrame) -> DataFrame:
    """The printable JSON projection (string fields only — the column
    metadata filter keeps the output schema-stable)."""
    return feed.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("op").alias("op"),
                F.col("db").alias("db"),
                F.col("table_name").alias("table"),
                F.col("txn_uuid").alias("txn_uuid"),
            )
        ).alias("line"),
    )


def console_sink(feed: DataFrame, n: int = 20) -> None:
    """Print to stdout (driver) — the actual sink side effect."""
    for row in console_format(feed).orderBy("event_id").limit(n).collect():
        print(row["line"])


def console_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return console_format(change_feed(spark, sf_dir))


CONSOLE_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL})
SELECT event_id,
    to_json(struct_pack(op := op, db := db, "table" := table_name,
                        txn_uuid := txn_uuid)) AS line
FROM feed
"""

REGISTRY = [("sink_console", console_query, CONSOLE_SQL)]
