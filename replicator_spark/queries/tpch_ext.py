"""Extended TPC-H-style coverage over the driver's slimmed star schema.

The driver testdata has no `partsupp` table and trims several TPC-H
columns (commit/receipt dates, ship mode, phones, comments), so the
partsupp-dependent queries (2, 9, 11, 16, 20) and the date/mode-
dependent ones (12, 21) are *adapted*: same join/aggregation shape,
predicates re-targeted at available columns; the lineitem fact is used
as the part↔supplier relation where partsupp is required. Each
docstring notes the adaptation.

Same conventions as tpch.py: money in DECIMAL then rounded/cast at the
boundary; filters pushed to the scan. Broadcast hints are used ONLY on
bounded-size sides (region/nation, scalar aggregates); every side that
scales with SF (customer/orders/part/supplier subtrees) is a plain
join so AQE broadcasts it while it fits and falls back to a shuffled
join beyond that — a hard hint would OOM a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table
from .tpch import _dec

_ONE = "CAST(1 AS DECIMAL(4,2))"
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    f" * ({_ONE} - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between NATION_1 and NATION_2 by year."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    nation = read_table(spark, sf_dir, "nation")
    sn = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    co = (
        read_table(spark, sf_dir, "orders")
        .join(cn, F.col("o_custkey") == cn.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    out = (
        li.join(co, li.l_orderkey == co.o_orderkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )
    return out


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
    CAST(round(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        year(l_shipdate) AS l_year, {_REV_SQL} AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's market share of PROMO parts sold into ASIA."""
    prep(spark)
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    asia_n = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    co = orders.join(
        cust, F.col("o_custkey") == cust.c_custkey
    ).select("o_orderkey", "o_orderdate")
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sn = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    vol = _revenue()
    out = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(co, li.l_orderkey == co.o_orderkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )
    return out


Q8_SQL = f"""
SELECT o_year,
    round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year, {_REV_SQL} AS volume,
        sn.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted: no partsupp → profit is discounted revenue only
    (ps_supplycost unavailable); STANDARD parts, by supplier nation × year."""
    prep(spark)
    nation = read_table(spark, sf_dir, "nation")
    part = read_table(spark, sf_dir, "part").where(
        F.col("p_type") == "STANDARD"
    )
    sn = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem")
    out = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(_revenue()), 2).cast("double").alias("sum_profit")
        )
    )
    return out


Q9_SQL = f"""
SELECT nation, o_year,
    CAST(round(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
        {_REV_SQL} AS amount
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_type = 'STANDARD'
)
GROUP BY nation, o_year
"""


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted: no ship mode / receipt date → late = shipped >90
    days after order date, bucketed by order status instead of mode."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_orderstatus"
    )
    li = read_table(spark, sf_dir, "lineitem")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = joined.groupBy("o_orderstatus").agg(
        F.sum(high.cast("long")).alias("high_line_count"),
        F.sum((~high).cast("long")).alias("low_line_count"),
    )
    return out


Q12_SQL = """
SELECT o_orderstatus,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderstatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of order counts per customer (incl. 0)."""
    prep(spark)
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for September 1996."""
    prep(spark)
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    vol = _revenue()
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )
    return out


Q14_SQL = f"""
SELECT round(100.0
    * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum revenue in 1996 Q1."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue0 AS (
    SELECT l_suppkey AS supplier_no,
        CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted: lineitem stands in for partsupp — distinct suppliers
    who shipped each (brand, type, size), excluding Brand#5, 8 sizes."""
    prep(spark)
    sizes = [1, 4, 9, 14, 19, 23, 36, 45]
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(sizes)
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
    COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: yearly revenue lost to small orders of Brand#1 parts
    (quantity below 50% of the part's average)."""
    prep(spark)
    part = read_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#1"
    )
    li = read_table(spark, sf_dir, "lineitem")
    lib = li.join(
        part.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
    )
    avg_qty = lib.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    out = (
        lib.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6
            ).alias("avg_yearly")
        )
    )
    return out


Q17_SQL = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    / 7.0, 6) AS avg_yearly
FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey)
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: top-100 large-volume customer orders (sum qty > 300)."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(_dec("o_totalprice"), 2).cast("double").alias(
                "o_totalprice"
            ),
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
    CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
        AS o_totalprice,
    round(sum_qty, 2) AS sum_qty
FROM (
    SELECT l_orderkey, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 adapted: no container/shipmode → OR'd brand × size × quantity
    windows only."""
    prep(spark)
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = read_table(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        F.round(F.sum(_revenue()), 2).cast("double").alias("revenue")
    )


Q19_SQL = f"""
SELECT CAST(round(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted: no commit/receipt dates → "kept waiting" = shipped
    >60 days after order date; supplier counted when it is the ONLY
    late supplier in a multi-supplier order. Top 50 by wait count."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    flagged = j.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .alias("late"),
    )
    # One pre-aggregate per (order, supplier) pair feeds BOTH the
    # per-order counts and the late-pair set: avoids the countDistinct
    # EXPAND (which triples the shuffled rows) and a second scan of the
    # fact join. All later shuffles are over the tiny pair table.
    per_pair = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("long")).alias("n_late_supp"),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        per_pair.where("late")
        .join(
            per_order.where(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
        .select("s_name", "numwait")
    )


Q21_SQL = """
WITH flagged AS (
    SELECT l_orderkey, l_suppkey,
        l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
    SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
    FROM flagged GROUP BY l_orderkey
),
late_pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE late
)
SELECT s_name, COUNT(*) AS numwait
FROM late_pairs
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 50
"""


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted: no phone country codes → nation instead; customers
    with above-average (positive) balance and no orders since 2000
    (the unwindowed anti-join is empty at every SF — all rich
    customers have *some* order in this data)."""
    prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    nation = read_table(spark, sf_dir, "nation")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.distinct(), cust.c_custkey == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT n_name, COUNT(*) AS numcust,
    CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
"""


def q2_min_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted: no partsupp/supplycost → for STANDARD size-15 parts,
    the EUROPE supplier with minimum account balance among those who
    shipped the part (lineitem as the part↔supplier relation)."""
    prep(spark)
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    eur_n = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(eur_n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    shipped = (
        li.join(
            part.select("p_partkey", "p_name"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    w = W.partitionBy("p_partkey").orderBy("s_acctbal", "s_name")
    return (
        shipped.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .orderBy("p_partkey")
        .limit(20)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(_dec("s_acctbal"), 2).cast("double").alias("s_acctbal"),
            "n_name",
        )
    )


Q2_SQL = """
SELECT p_partkey, p_name, s_name,
    CAST(round(CAST(s_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS s_acctbal,
    n_name
FROM (
    SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal, n_name,
        ROW_NUMBER() OVER (
            PARTITION BY p_partkey ORDER BY s_acctbal, s_name) AS rk
    FROM (
        SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal, n_name
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
    )
)
WHERE rk = 1
ORDER BY p_partkey
LIMIT 20
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted: no partsupp → "stock value" is the shipped revenue
    per part from NATION_5 suppliers; keep parts whose value exceeds
    twice the nation's average per-part value (scale-free analog of
    the reference's 0.0001/SF fraction — a fixed fraction empties out
    as the part count grows; same group + scalar-threshold shape)."""
    prep(spark)
    nation = read_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_5"
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    part_value = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = part_value.agg(
        (F.avg("value_dec") * F.lit(2.0)).alias("threshold")
    )
    return (
        part_value.crossJoin(F.broadcast(total))
        .where(F.col("value_dec") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("value_dec", 2).cast("double").alias("part_value"),
        )
    )


Q11_SQL = """
WITH pv AS (
    SELECT l_partkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
    GROUP BY l_partkey
)
SELECT l_partkey,
    CAST(round(value_dec, 2) AS DOUBLE) AS part_value
FROM pv
WHERE value_dec > (SELECT AVG(value_dec) * 2.0 FROM pv)
"""


def q20_restock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted: no partsupp availqty → a NATION_4 supplier is a
    "restock" candidate when, for some PROMO part it ships, its 1997
    shipped quantity exceeds half its 1996 shipped quantity (the same
    nested semi-join shape: supplier IN (... part IN (...)))."""
    prep(spark)
    nation = read_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_4"
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    promo = read_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem")
    lp = li.join(promo, li.l_partkey == promo.p_partkey)
    qty_by_year = lp.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(
            F.when(
                (F.col("l_shipdate") >= F.lit("1996-01-01"))
                & (F.col("l_shipdate") < F.lit("1997-01-01")),
                F.col("l_quantity"),
            ).otherwise(F.lit(0.0))
        ).alias("qty96"),
        F.sum(
            F.when(
                (F.col("l_shipdate") >= F.lit("1997-01-01"))
                & (F.col("l_shipdate") < F.lit("1998-01-01")),
                F.col("l_quantity"),
            ).otherwise(F.lit(0.0))
        ).alias("qty97"),
    )
    restock_pairs = qty_by_year.where(
        F.col("qty97") > F.col("qty96") * 0.5
    ).select("l_suppkey").distinct()
    return (
        supp.join(restock_pairs, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH qty AS (
    SELECT l_suppkey, l_partkey,
        SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                 THEN l_quantity ELSE 0 END) AS qty96,
        SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                 THEN l_quantity ELSE 0 END) AS qty97
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_4'
  AND s_suppkey IN (
    SELECT l_suppkey FROM qty WHERE qty97 > qty96 * 0.5)
ORDER BY s_suppkey
"""


def agg_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP over the q1 dimensions: per-(flag, status)
    pricing stats plus per-flag and grand-total subtotal rows (null
    grouping keys coalesced to 'ALL' for engine-portable output).
    Scale: one shuffle; the rollup re-aggregates the leaf groups, not
    the fact table — map-side partial agg carries all tiers."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    rolled = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty_d"),
            F.sum(_revenue()).alias("revenue_d"),
            F.count("*").alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
            F.round(F.col("revenue_d").cast("double"), 2).alias("revenue"),
            "n_lines",
        )
    )
    return rolled


AGG_ROLLUP_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
    coalesce(l_linestatus, 'ALL') AS l_linestatus,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    round(CAST(sum({_REV_SQL}) AS DOUBLE), 2) AS revenue,
    count(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over order priority × status: all 4 grouping-set
    combinations in one pass (null keys coalesced to 'ALL')."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("total_d"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "n_orders",
            F.round(F.col("total_d").cast("double"), 2).alias("total_price"),
        )
    )


AGG_CUBE_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
    coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
    count(*) AS n_orders,
    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS — the third multi-tier aggregate form
    next to ROLLUP/CUBE: an explicit, asymmetric set list
    ((linestatus, returnflag), (linestatus), (returnflag)) that neither
    of the other two can express (no grand-total row, both one-dim
    marginals). Same scale shape as the rollup: ONE shuffle, the
    extra tiers re-aggregate map-side partials, never the fact
    table."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_linestatus", "l_returnflag"], ["l_linestatus"],
             ["l_returnflag"]],
            "l_linestatus",
            "l_returnflag",
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_dec("l_extendedprice")).alias("price_d"),
        )
        .select(
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias(
                "l_returnflag"
            ),
            "n_lines",
            F.round(F.col("price_d").cast("double"), 2).alias(
                "sum_price"
            ),
        )
    )


AGG_GROUPING_SETS_SQL = """
SELECT coalesce(l_linestatus, 'ALL') AS l_linestatus,
    coalesce(l_returnflag, 'ALL') AS l_returnflag,
    count(*) AS n_lines,
    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
          2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_linestatus, l_returnflag), (l_linestatus),
                        (l_returnflag))
"""


REGISTRY = [
    ("tpch_q2", q2_min_bal_supplier, Q2_SQL),
    ("tpch_q11", q11_important_stock, Q11_SQL),
    ("tpch_q20", q20_restock_suppliers, Q20_SQL),
    ("tpch_q7", q7_volume_shipping, Q7_SQL),
    ("tpch_q8", q8_market_share, Q8_SQL),
    ("tpch_q9", q9_product_profit, Q9_SQL),
    ("tpch_q12", q12_late_lines, Q12_SQL),
    ("tpch_q13", q13_customer_distribution, Q13_SQL),
    ("tpch_q14", q14_promo_revenue, Q14_SQL),
    ("tpch_q15", q15_top_supplier, Q15_SQL),
    ("tpch_q16", q16_supplier_cnt, Q16_SQL),
    ("tpch_q17", q17_small_quantity, Q17_SQL),
    ("tpch_q18", q18_large_volume, Q18_SQL),
    ("tpch_q19", q19_discounted_revenue, Q19_SQL),
    ("tpch_q21", q21_waiting_supplier, Q21_SQL),
    ("tpch_q22", q22_global_sales, Q22_SQL),
    ("agg_rollup_pricing", agg_rollup_pricing, AGG_ROLLUP_SQL),
    ("agg_cube_orders", agg_cube_orders, AGG_CUBE_SQL),
    # explicit asymmetric grouping-set list (third multi-tier form)
    ("agg_grouping_sets", agg_grouping_sets, AGG_GROUPING_SETS_SQL),
]
