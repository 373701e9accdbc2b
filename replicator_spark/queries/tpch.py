"""TPC-H-style batch queries over the driver's star schema — the
engine's batch query surface and the bench headliners.

Numeric convention for oracle parity: money math is done in DECIMAL
(exact, order-insensitive), then rounded and cast to DOUBLE at the
output boundary — a double SUM would depend on accumulation order and
differ between engines in the last ulp.

Scale notes (100 TB): every query is a declarative plan — Catalyst
pushes the date/segment filters into the parquet scan and prunes
columns. Broadcast hints go ONLY on bounded-size sides (region/nation
and scalar aggregates); customer/orders/part/supplier scale with SF,
so those joins are left plain and AQE broadcasts them while they fit
(64 MB threshold) or shuffles beyond — a hard hint would pin a
cluster-killing broadcast at 1000× the data. Verified via .explain:
PushedFilters present, aggregations partial (map-side combine) before
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) else col.cast(f"decimal({p},{s})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    f = li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    disc_price = price * (F.lit(1).cast("decimal(4,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + tax)
    out = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        F.round(
            F.sum(qty).cast("double") / F.count("*"), 6
        ).alias("avg_qty"),
        F.round(
            F.sum(price).cast("double") / F.count("*"), 6
        ).alias("avg_price"),
        F.round(
            F.sum(disc).cast("double") / F.count("*"), 6
        ).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
    CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS sum_qty,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS sum_base_price,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
        AS DOUBLE) AS sum_disc_price,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2)
        AS DOUBLE) AS sum_charge,
    round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6) AS avg_qty,
    round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6) AS avg_price,
    round(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
        / COUNT(*), 6) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue."""
    prep(spark)
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    # customer/orders scale with SF — no broadcast hint; AQE broadcasts
    # them while they fit and falls back to a shuffled join beyond that
    joined = li.join(
        orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    out = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )
    return out


Q3_SQL = """
SELECT l_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
    o_orderpriority,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
        AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue per nation where customer and supplier share it."""
    prep(spark)
    region = read_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    # only the nation⨝region side is bounded — broadcast-hint just it;
    # supplier/customer/orders scale with SF and are left to AQE
    sn = supp.join(
        F.broadcast(nr), supp.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    co = orders.join(
        cust.select("c_custkey", "c_nationkey"),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey")
    out = (
        li.join(co, li.l_orderkey == co.o_orderkey)
        .join(
            sn,
            (li.l_suppkey == sn.s_suppkey)
            & (F.col("c_nationkey") == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )
    return out


Q5_SQL = """
SELECT n_name,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
        AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change (pure scan-filter-agg)."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * _dec("l_discount", 4, 2)
    out = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    return out


Q6_SQL = """
SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
    * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: order-priority counts for orders with at least one
    late lineitem (semi-join — EXISTS)."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
    out = (
        orders.join(
            late.select("o_orderkey").distinct(),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )
    return out


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by lost revenue on returns."""
    prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = read_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    out = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            cust,
            F.col("o_custkey") == cust.c_custkey,
        )
        .join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(_dec("c_acctbal"), 2).cast("double").alias("c_acctbal"),
            "n_name",
            "revenue",
        )
    )
    return out


Q10_SQL = """
SELECT c_custkey, c_name,
    CAST(round(CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS c_acctbal,
    n_name,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
        AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — the canonical windowed
    top-k-per-group operator."""
    prep(spark)
    from pyspark.sql import Window as W

    part = read_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "p_brand",
            "rank",
            "p_partkey",
            F.round(_dec("p_retailprice"), 2).cast("double").alias(
                "p_retailprice"
            ),
        )
    )


TOPK_SQL = """
SELECT p_brand, rank, p_partkey,
    CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 2) AS DOUBLE)
        AS p_retailprice
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
        ROW_NUMBER() OVER (
            PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) AS rank
    FROM part
)
WHERE rank <= 3
"""


REGISTRY = [
    ("tpch_q1", q1_pricing_summary, Q1_SQL),
    ("tpch_q3", q3_shipping_priority, Q3_SQL),
    ("tpch_q4", q4_order_priority, Q4_SQL),
    ("tpch_q5", q5_local_supplier_volume, Q5_SQL),
    ("tpch_q6", q6_forecast_revenue, Q6_SQL),
    ("tpch_q10", q10_returned_items, Q10_SQL),
    ("topk_per_group", topk_parts_per_brand, TOPK_SQL),
]
