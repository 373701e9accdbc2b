"""Safe-checkpoint watermark: gap-free GTID-set algebra.

Reference: GtidSetAlgebra.getSafeCheckpoint
(supplier/.../gtid/GtidSetAlgebra.java:21-63, gap-scan :149-175): from
the set of checkpoints acked by all sink tasks, compute per server the
largest gap-free transaction range — the low-watermark below which all
work is durably applied — and persist it (ZK in the reference;
Structured Streaming's offset/commit log plays that role here, see
streaming/job.py).

As a batch operator this is gaps-and-islands: within each server's
acked set, the watermark is the end of the first contiguous island
starting at the minimum id. Pure window arithmetic — distributed,
no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

_N_SERVERS = 4
_GAP_MOD = 97  # synthetic ack gaps: every 97th event is un-acked


def safe_watermark(acked: DataFrame, server_col: str, id_col: str) -> DataFrame:
    """Largest gap-free prefix per server over acked transaction ids."""
    w = W.partitionBy(server_col).orderBy(id_col)
    ranked = acked.select(
        server_col,
        F.col(id_col).alias("txn_id"),
        (F.row_number().over(w) - F.lit(1)).alias("rn"),
        F.min(id_col).over(W.partitionBy(server_col)).alias("min_id"),
    )
    contiguous = ranked.where(
        F.col("txn_id") - F.col("min_id") == F.col("rn")
    )
    return contiguous.groupBy(server_col).agg(
        F.max("txn_id").alias("safe_checkpoint"),
        F.count("*").alias("acked_contiguous"),
    )


def watermark_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated acked set: event_ids not divisible by 97, sharded over
    4 servers — compute each server's gap-free watermark."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_id")
    acked = ev.where((F.col("event_id") % _GAP_MOD) != 0).select(
        (F.col("event_id") % _N_SERVERS).cast("int").alias("server_id"),
        # dense per-server transaction sequence (the GTID txn number)
        F.expr(f"event_id div {_N_SERVERS}").alias("txn_no"),
    )
    return safe_watermark(acked, "server_id", "txn_no")


WATERMARK_SQL = f"""
WITH acked AS (
    SELECT CAST(event_id % {_N_SERVERS} AS INT) AS server_id,
           event_id // {_N_SERVERS} AS txn_no
    FROM events
    WHERE event_id % {_GAP_MOD} <> 0
), ranked AS (
    SELECT server_id, txn_no AS txn_id,
        ROW_NUMBER() OVER (PARTITION BY server_id ORDER BY txn_no) - 1
            AS rn,
        MIN(txn_no) OVER (PARTITION BY server_id) AS min_id
    FROM acked
)
SELECT server_id, MAX(txn_id) AS safe_checkpoint,
       COUNT(*) AS acked_contiguous
FROM ranked
WHERE txn_id - min_id = rn
GROUP BY server_id
"""
