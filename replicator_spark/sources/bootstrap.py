"""Bootstrap / initial snapshot source: seed the pipeline with a
full-table copy, then switch to the change stream.

Reference: BootstrapReplicator.run (mysql-replicator/.../
BootstrapReplicator.java:38-99) seeds schemas offline; the companion
binlog-flusher tool (binlog-flusher/data-flusher.py) forces a
full-table snapshot *through* the binlog so the stream starts from a
complete image.

Spark-first: the snapshot is a plain batch read (`spark.read`, the
JDBC analog), presented as synthetic INSERT change events stamped
*before* every stream event (version pinned at snapshot_ts = min
stream ts − 1 ms), then union'd with the live change feed. Downstream
operators (time machine, as-of queries) need no special casing — the
snapshot rows are just the oldest versions. At 100 TB the union is
metadata-only (no shuffle); the snapshot read partitions like any
parquet/JDBC scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.envelope import CHANGE_FEED_SQL, change_feed
from ..session import prep, read_table

SNAPSHOT_XID = -1  # synthetic txn id for the seed transaction


def snapshot_events(customers: DataFrame, snapshot_ts_ms) -> DataFrame:
    """Present a table snapshot as INSERT change events (seed txn)."""
    return customers.select(
        (F.lit(-1) * F.col("c_custkey")).alias("event_id"),  # < all stream ids
        F.lit("INSERT").alias("op"),
        F.lit("testdb").alias("db"),
        F.lit("customer").alias("table_name"),
        snapshot_ts_ms.alias("ts_ms"),
        F.col("c_custkey").alias("user_id"),
        F.lit(SNAPSHOT_XID).cast("long").alias("txn_xid"),
        F.col("c_acctbal").cast("double").alias("value_after"),
        F.col("c_mktsegment").alias("props_after"),
        F.lit("snapshot").alias("source"),
    )


def bootstrap_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ∪ stream: one unified change feed, snapshot first."""
    prep(spark)
    feed = change_feed(spark, sf_dir).select(
        "event_id", "op", "db", "table_name", "ts_ms", "user_id",
        "txn_xid", "value_after", "props_after",
        F.lit("binlog").alias("source"),
    )
    start = feed.agg((F.min("ts_ms") - 1).alias("snapshot_ts_ms"))
    customers = read_table(spark, sf_dir, "customer").crossJoin(
        F.broadcast(start)
    )
    snap = snapshot_events(customers, F.col("snapshot_ts_ms"))
    return snap.unionByName(feed)


def bootstrap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed accounting: per (source, op) counts + ts range — verifies
    the snapshot strictly precedes the stream."""
    u = bootstrap_union(spark, sf_dir)
    return (
        u.groupBy("source", "op")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("source", "op")
    )


# Shared CTE prefix (feed → stream ∪ snapshot → `unioned`) — reused by
# the MERGE materialization in cdc/apply.py.
BOOTSTRAP_UNION_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
stream AS (
    SELECT event_id, op, db, table_name, ts_ms, user_id, txn_xid,
        value_after, props_after, 'binlog' AS source
    FROM feed
),
start AS (SELECT MIN(ts_ms) - 1 AS snapshot_ts_ms FROM stream),
snap AS (
    SELECT -1 * c_custkey AS event_id, 'INSERT' AS op, 'testdb' AS db,
        'customer' AS table_name, snapshot_ts_ms AS ts_ms,
        c_custkey AS user_id, CAST({SNAPSHOT_XID} AS BIGINT) AS txn_xid,
        CAST(c_acctbal AS DOUBLE) AS value_after,
        c_mktsegment AS props_after, 'snapshot' AS source
    FROM customer, start
),
unioned AS (SELECT * FROM snap UNION ALL SELECT * FROM stream)
"""

BOOTSTRAP_SQL = (
    BOOTSTRAP_UNION_SQL
    + """
SELECT source, op, COUNT(*) AS n_events,
    MIN(ts_ms) AS min_ts_ms, MAX(ts_ms) AS max_ts_ms,
    COUNT(DISTINCT user_id) AS n_users
FROM unioned
GROUP BY source, op
ORDER BY source, op
"""
)

REGISTRY = [("source_bootstrap_snapshot", bootstrap_query, BOOTSTRAP_SQL)]
