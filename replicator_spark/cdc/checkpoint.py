"""Safe-checkpoint watermark: gap-free GTID-set algebra.

Reference: GtidSetAlgebra (supplier/.../gtid/GtidSetAlgebra.java) —
checkpoints acked by sink tasks carry GTID-set fragments
("serverUUID:start-end"); addGTIDSetToServersTransactionRangeMap
(:107-134) parses them per server, and
getMaxUninteruptedRangeStartingFromMinimalTransaction (:136-175) scans
the sorted ranges from the minimum forward, stopping at the first hole
— transactions past a hole are NOT safe even if acked (an interleaved
checkpoint that never arrived means its work may not be applied). The
safe watermark is the end of the first gap-free island.

The reference's scan compares consecutive range *upper limits* for
`diff == 1`, which is exact only for single-transaction ranges; here
the island test is the general range-union form — a gap exists iff the
next range starts after prev_end + 1 — which reduces to the reference's
behavior on its "n-n" checkpoints and extends it to multi-transaction
ranges (the unit test the reference lacks, SURVEY §5).

As a batch operator this is gaps-and-islands: parse → window-lag flag →
cumulative island id → keep island 0. Pure window arithmetic over a
(server, range) shuffle — distributed, no driver loop; at 100 TB the
checkpoint stream is tiny relative to data, so this plan is dominated
by the single exchange on server_uuid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

_N_SERVERS = 4
_GAP_MOD = 97  # synthetic ack gaps: every 97th checkpoint is un-acked
_RANGE_W = 3  # transactions per checkpoint range (multi-txn ranges)


def gtid_safe_set(
    frags: DataFrame, gtid_col: str = "gtid"
) -> DataFrame:
    """Per-server largest gap-free GTID range union.

    `frags` carries acked GTID-set fragments ("uuid:start-end"), in any
    order (out-of-order acks included). Returns per server the safe
    checkpoint (end of the first gap-free island scanning up from the
    minimal transaction), the number of ranges in it, and the collapsed
    safe GTID-set string.
    """
    # fragment grammar matches sources/binlog.parse_gtid_set: an
    # interval is 'n' or 'n-m' — a bare single-transaction ack
    # ("uuid:7") is 7-7, not a silent NULL row corrupting the island
    # scan (regexp_extract returns '' on no-match, which casts NULL)
    r_start = (
        F.regexp_extract(gtid_col, ":(\\d+)(?:-|$)", 1)
        .cast("long")
    )
    parsed = frags.select(
        F.regexp_extract(gtid_col, "^([^:]+):", 1).alias("server_uuid"),
        r_start.alias("r_start"),
        F.coalesce(
            F.regexp_extract(gtid_col, "-(\\d+)$", 1).try_cast("long"),
            r_start,
        ).alias("r_end"),
    )
    w = W.partitionBy("server_uuid").orderBy("r_start", "r_end")
    # a hole exists iff this range starts past the RUNNING MAX of all
    # prior ends + 1 — lag(r_end) alone mis-flags overlapping or
    # contained ranges (duplicate/retried acks carrying cumulative
    # sets: 1-10, 2-3, 11-12 has no hole, but lag sees 11 > 3+1)
    flagged = parsed.withColumn(
        "gap",
        F.when(
            F.col("r_start")
            > F.max("r_end").over(
                w.rowsBetween(W.unboundedPreceding, -1)
            ) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("gap").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    safe = (
        islands.where(F.col("island") == 0)
        .groupBy("server_uuid")
        .agg(
            F.max("r_end").alias("safe_checkpoint"),
            F.min("r_start").alias("set_start"),
            F.count("*").alias("n_safe_ranges"),
        )
    )
    return safe.select(
        "server_uuid",
        "safe_checkpoint",
        "n_safe_ranges",
        F.concat_ws(
            "",
            F.col("server_uuid"),
            F.lit(":"),
            F.col("set_start").cast("string"),
            F.lit("-"),
            F.col("safe_checkpoint").cast("string"),
        ).alias("safe_gtid_set"),
    )


# Backward-compatible id-based form (streaming/job.py uses it): the
# degenerate single-transaction-range case of the algebra above.
def safe_watermark(
    acked: DataFrame, server_col: str, id_col: str
) -> DataFrame:
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
    """Simulated acked checkpoint stream: each acked event contributes
    a GTID fragment "srv-XX:start-end" covering _RANGE_W transactions;
    every 97th checkpoint is un-acked, leaving holes the watermark must
    stop at. Input order is the (arbitrary) event order — out-of-order
    acks by construction."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_id")
    frags = ev.where((F.col("event_id") % _GAP_MOD) != 0).select(
        F.concat_ws(
            "",
            F.lit("srv-"),
            F.lpad((F.col("event_id") % _N_SERVERS).cast("string"), 2, "0"),
            F.lit(":"),
            (F.expr(f"event_id div {_N_SERVERS}") * _RANGE_W).cast("string"),
            F.lit("-"),
            (F.expr(f"event_id div {_N_SERVERS}") * _RANGE_W + _RANGE_W - 1)
            .cast("string"),
        ).alias("gtid")
    )
    return gtid_safe_set(frags).orderBy("server_uuid")


WATERMARK_SQL = f"""
WITH frags AS (
    SELECT 'srv-' || lpad(CAST(event_id % {_N_SERVERS} AS VARCHAR), 2, '0')
        || ':' || CAST((event_id // {_N_SERVERS}) * {_RANGE_W} AS VARCHAR)
        || '-' || CAST((event_id // {_N_SERVERS}) * {_RANGE_W}
                       + {_RANGE_W} - 1 AS VARCHAR) AS gtid
    FROM events
    WHERE event_id % {_GAP_MOD} <> 0
), parsed AS (
    SELECT regexp_extract(gtid, '^([^:]+):', 1) AS server_uuid,
        CAST(regexp_extract(gtid, ':(\\d+)-', 1) AS BIGINT) AS r_start,
        CAST(regexp_extract(gtid, '-(\\d+)$', 1) AS BIGINT) AS r_end
    FROM frags
), flagged AS (
    -- running MAX of prior ends, not LAG: overlapping/contained acked
    -- ranges are not holes (mirrors the Spark plan)
    SELECT *, CASE WHEN r_start > MAX(r_end) OVER (
                       PARTITION BY server_uuid ORDER BY r_start, r_end
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) + 1
                   THEN 1 ELSE 0 END AS gap
    FROM parsed
), islands AS (
    SELECT *, SUM(gap) OVER (
        PARTITION BY server_uuid ORDER BY r_start, r_end
        ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT server_uuid,
    MAX(r_end) AS safe_checkpoint,
    COUNT(*) AS n_safe_ranges,
    server_uuid || ':' || CAST(MIN(r_start) AS VARCHAR)
        || '-' || CAST(MAX(r_end) AS VARCHAR) AS safe_gtid_set
FROM islands
WHERE island = 0
GROUP BY server_uuid
ORDER BY server_uuid
"""
