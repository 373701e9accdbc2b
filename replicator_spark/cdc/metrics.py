"""Replication-delay gauges — the reference's metrics surface as a query.

Reference: `Replicator.java:84,265` registers the `coordinator.delay`
gauge (time since the last safe checkpoint was committed) and
`KafkaApplier.java:112-123` keeps `applier.kafka.delay` (time since the
last row was applied); both are served through the pluggable
Console/JMX/Graphite/Prometheus registry in
`mysql-replicator-commons/.../metrics/Metrics.java:1-137`. On Spark the
cluster manager owns metric *transport*, so the engine analog is the
gauge COMPUTATION itself: how far does each server's safe watermark lag
the head of its binlog, in transactions and in event-time?

Deterministic by construction: "now" is the head event's timestamp, not
the wall clock, so the gauge is reproducible and oracle-checkable (the
reference's gauges read System.currentTimeMillis; a batch audit of lag
wants event-time lag anyway).

Scale: two combiner-backed groupBys on the server key (head + safe) and
two broadcast-sized joins back — the checkpoint/ack stream is tiny
relative to the feed, and nothing here touches the wide columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table
from .checkpoint import _GAP_MOD, _N_SERVERS, safe_watermark


def delay_gauge(ev: DataFrame) -> DataFrame:
    """Per-server replication delay: head txn/ts vs safe watermark.

    `ev` carries (event_id, ts[ns]). Transactions are striped across
    servers exactly as in checkpoint.watermark_query (server =
    event_id % N, txn = event_id div N) and every _GAP_MOD-th event is
    un-acked, leaving the hole the safe watermark stops at — the gauge
    then reports how much committed-but-not-safely-applied work sits
    past that hole.
    """
    base = ev.select(
        "event_id",
        (F.col("event_id") % _N_SERVERS).alias("srv"),
        F.expr(f"event_id div {_N_SERVERS}").alias("txn"),
        F.col("ts").alias("ts_ns"),
    )
    head = base.groupBy("srv").agg(
        F.max("txn").alias("head_txn"),
        F.max("ts_ns").alias("head_ts_ns"),
    )
    acked = base.where((F.col("event_id") % _GAP_MOD) != 0)
    safe = safe_watermark(acked, "srv", "txn")
    # event time of the safe-checkpoint transaction ((srv, txn) is
    # unique by construction, so this join is 1:1 and broadcast-sized)
    safe_ts = safe.join(
        base.select(
            F.col("srv").alias("s2"),
            F.col("txn").alias("t2"),
            F.col("ts_ns").alias("safe_ts_ns"),
        ),
        (F.col("srv") == F.col("s2"))
        & (F.col("safe_checkpoint") == F.col("t2")),
    ).select("srv", "safe_checkpoint", "acked_contiguous", "safe_ts_ns")
    out = head.join(safe_ts, "srv").select(
        F.concat(
            F.lit("srv-"), F.lpad(F.col("srv").cast("string"), 2, "0")
        ).alias("server_uuid"),
        "safe_checkpoint",
        "acked_contiguous",
        "head_txn",
        (F.col("head_txn") - F.col("safe_checkpoint")).alias("delay_txns"),
        # integer floor-div, never float: ns→ms at ns magnitudes shifts
        # the millisecond under double division
        F.expr("(head_ts_ns - safe_ts_ns) div 1000000").alias("delay_ms"),
    )
    return out


def delay_gauge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    return delay_gauge(ev).orderBy("server_uuid")


DELAY_GAUGE_SQL = f"""
WITH base AS (
    SELECT event_id,
        event_id % {_N_SERVERS} AS srv,
        event_id // {_N_SERVERS} AS txn,
        epoch_us(ts) * 1000 AS ts_ns
    FROM events
), head AS (
    SELECT srv, MAX(txn) AS head_txn, MAX(ts_ns) AS head_ts_ns
    FROM base GROUP BY srv
), acked AS (
    SELECT * FROM base WHERE event_id % {_GAP_MOD} <> 0
), ranked AS (
    SELECT srv, txn, ts_ns,
        row_number() OVER (PARTITION BY srv ORDER BY txn) - 1 AS rn,
        MIN(txn) OVER (PARTITION BY srv) AS min_txn
    FROM acked
), safe AS (
    SELECT srv, MAX(txn) AS safe_checkpoint,
        COUNT(*) AS acked_contiguous
    FROM ranked WHERE txn - min_txn = rn GROUP BY srv
), safe_ts AS (
    SELECT s.srv, s.safe_checkpoint, s.acked_contiguous,
        b.ts_ns AS safe_ts_ns
    FROM safe s JOIN base b
      ON b.srv = s.srv AND b.txn = s.safe_checkpoint
)
SELECT 'srv-' || lpad(CAST(s.srv AS VARCHAR), 2, '0') AS server_uuid,
    s.safe_checkpoint, s.acked_contiguous, h.head_txn,
    h.head_txn - s.safe_checkpoint AS delay_txns,
    (h.head_ts_ns - s.safe_ts_ns) // 1000000 AS delay_ms
FROM safe_ts s JOIN head h ON h.srv = s.srv
"""

REGISTRY = [
    ("cdc_delay_gauge", delay_gauge_query, DELAY_GAUGE_SQL),
]
