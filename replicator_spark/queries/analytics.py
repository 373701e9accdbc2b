"""Analytic-SQL surface: window-function suite, pivot, and
semi-structured (JSON) extraction — the remaining query-API families a
user coming from a SQL warehouse expects to Just Work.

Scale shapes: the window suite is one keyed exchange + one sort (all
six functions share the same window frame, Spark computes them in a
single pass); the pivot is a combiner-backed groupBy with a fixed
(explicit) pivot-value list so the schema is static — never use
inferred pivot values at scale, that's an extra distinct scan; JSON
extraction is map-side `get_json_object` (codegen'd path traversal, no
UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

# ------------------------------------------------------------ window suite


def window_analytics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/row_number/ntile/percent_rank/cume_dist per user over
    event time — one window pass."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("prev_gap_ms"),
        (F.lead("ts_ms").over(w) - F.col("ts_ms")).alias("next_gap_ms"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT event_id, user_id,
    ts_ms - LAG(ts_ms) OVER w AS prev_gap_ms,
    LEAD(ts_ms) OVER w - ts_ms AS next_gap_ms,
    ROW_NUMBER() OVER w AS rn,
    NTILE(4) OVER w AS quartile,
    round(PERCENT_RANK() OVER w, 6) AS pct_rank,
    round(CUME_DIST() OVER w, 6) AS cume
FROM (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
"""

# ------------------------------------------------------------------- pivot

PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
)


def pivot_orders_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + exact decimal revenue per year, pivoted by
    priority (explicit value list → static schema, single groupBy)."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").alias("o_year"),
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    piv = (
        base.groupBy("o_year")
        .pivot("o_orderpriority", list(PRIORITIES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).cast("double").alias("amt"),
        )
    )
    cols = [F.col("o_year")]
    for p in PRIORITIES:
        cols.append(
            F.coalesce(F.col(f"`{p}_n`"), F.lit(0)).alias(f"{p}_n")
        )
        cols.append(
            F.coalesce(F.col(f"`{p}_amt`"), F.lit(0.0)).alias(f"{p}_amt")
        )
    return piv.select(*cols)


_PIVOT_COLS_SQL = ",\n    ".join(
    f"""COALESCE(CAST(COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END)
        AS BIGINT), 0) AS "{p}_n",
    COALESCE(CAST(round(SUM(CASE WHEN o_orderpriority = '{p}'
        THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE), 0.0)
        AS "{p}_amt\""""
    for p in PRIORITIES
)

PIVOT_ORDERS_SQL = f"""
SELECT year(o_orderdate) AS o_year,
    {_PIVOT_COLS_SQL}
FROM orders
GROUP BY year(o_orderdate)
"""

# ----------------------------------------------------------- json extract


def json_extract_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props handling: JSON path extraction + typed
    aggregation, per event_type."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.countDistinct("k").alias("k_distinct"),
    )


JSON_EXTRACT_SQL = """
WITH ev AS (
    SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
)
SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_with_k,
    CAST(SUM(k) AS BIGINT) AS k_sum,
    MIN(k) AS k_min, MAX(k) AS k_max,
    COUNT(DISTINCT k) AS k_distinct
FROM ev GROUP BY event_type
"""

REGISTRY = [
    ("window_analytics", window_analytics_query, WINDOW_ANALYTICS_SQL),
    ("pivot_orders", pivot_orders_query, PIVOT_ORDERS_SQL),
    ("events_json_extract", json_extract_query, JSON_EXTRACT_SQL),
]
