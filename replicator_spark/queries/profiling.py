"""Data-profiling operators: column profile, equi-width histogram,
and correlation/regression stats — the data-quality checks run before
admitting a new table/feed into the pipeline (the reference's
validation side-channel, `ValidationService.java`, samples rows for
external checking; these are the Spark-native whole-table profile the
sampled check approximates).

Scale shapes:
- profile: ONE aggregation pass over the table computes every metric
  (null counts, distinct counts, min/max) — Spark plans the multiple
  COUNT(DISTINCT)s via a single Expand + partial aggs, so it's one
  shuffle regardless of column count; the unpivot to (column, metric)
  rows is a map-side `stack` over the single agg row. Never one scan
  per column.
- histogram: bounds from a single-row min/max agg, broadcast to the
  scan (crossJoin of a 1-row DF), bucket id computed map-side with
  double arithmetic that is written IDENTICALLY in the oracle so both
  engines evaluate the same IEEE expression; then one groupBy(bucket).
- corr/regression: sums of products accumulated as DECIMAL (exact,
  order-independent — double accumulation would make the result depend
  on partition count), moments cast to double, and the corr/slope/
  intercept formulas written identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

# ----------------------------------------------------------- column profile

# (name, kind) — kind picks the min/max string rendering.
_PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "date"),
]


def _str_expr(c: str, kind: str, agg: str) -> F.Column:
    fn = F.min if agg == "min" else F.max
    col = F.col(c)
    if kind == "num":
        return fn(col).cast("decimal(18,2)").cast("string")
    if kind == "date":
        return F.date_format(fn(col), "yyyy-MM-dd")
    return fn(col).cast("string")


def profile_columns_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per profiled lineitem column: null count, exact distinct
    count, min/max (string-rendered per type)."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
        aggs.append(_str_expr(c, kind, "min").alias(f"min_{c}"))
        aggs.append(_str_expr(c, kind, "max").alias(f"max_{c}"))
    one = li.agg(*aggs)
    stack_args = []
    for c, _ in _PROFILE_COLS:
        stack_args += [
            F.lit(c),
            F.col(f"nulls_{c}"),
            F.col(f"dist_{c}"),
            F.col(f"min_{c}"),
            F.col(f"max_{c}"),
        ]
    return one.select(
        F.stack(
            F.lit(len(_PROFILE_COLS)), *stack_args
        ).alias("column_name", "n_nulls", "n_distinct", "min_value", "max_value")
    )


def _profile_select(c: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(CAST(MIN({c}) AS DECIMAL(18,2)) AS VARCHAR)"
        mx = f"CAST(CAST(MAX({c}) AS DECIMAL(18,2)) AS VARCHAR)"
    elif kind == "date":
        mn = f"strftime(MIN({c}), '%Y-%m-%d')"
        mx = f"strftime(MAX({c}), '%Y-%m-%d')"
    else:
        mn = f"CAST(MIN({c}) AS VARCHAR)"
        mx = f"CAST(MAX({c}) AS VARCHAR)"
    return f"""SELECT '{c}' AS column_name,
    CAST(COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
    CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
    {mn} AS min_value, {mx} AS max_value
FROM lineitem"""


PROFILE_COLUMNS_SQL = "\nUNION ALL\n".join(
    _profile_select(c, kind) for c, kind in _PROFILE_COLS
)

# -------------------------------------------------------------- histogram

N_BUCKETS = 20


def histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice: global [min,max] split
    into 20 buckets; per bucket the row count and exact amount sum."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    bounds = li.agg(
        F.min("v").alias("minv"), F.max("v").alias("maxv")
    )
    nb = float(N_BUCKETS)
    bucket = F.least(
        F.lit(N_BUCKETS - 1),
        F.floor(
            (F.col("v") - F.col("minv")) * nb / (F.col("maxv") - F.col("minv"))
        ),
    ).alias("bucket")
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            bucket,
            F.col("v").cast("decimal(18,2)").alias("vd"),
            "minv",
            "maxv",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("vd"), 2).cast("double").alias("amount"),
            F.round(
                F.min(
                    F.col("minv")
                    + F.col("bucket") * (F.col("maxv") - F.col("minv")) / nb
                ),
                4,
            ).alias("bucket_lo"),
        )
    )


HISTOGRAM_SQL = f"""
WITH b AS (
    SELECT MIN(l_extendedprice) AS minv, MAX(l_extendedprice) AS maxv
    FROM lineitem
),
tagged AS (
    SELECT LEAST({N_BUCKETS - 1},
        FLOOR((l_extendedprice - minv) * {float(N_BUCKETS)} / (maxv - minv)))
        AS bucket,
        CAST(l_extendedprice AS DECIMAL(18,2)) AS vd, minv, maxv
    FROM lineitem CROSS JOIN b
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
    CAST(round(SUM(vd), 2) AS DOUBLE) AS amount,
    round(MIN(minv + bucket * (maxv - minv) / {float(N_BUCKETS)}), 4)
        AS bucket_lo
FROM tagged GROUP BY bucket
"""

# -------------------------------------------------- correlation / regression


def corr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + least-squares slope/intercept of
    l_extendedprice (y) on l_quantity (x), per l_returnflag, derived
    from EXACT decimal moments so both engines compute identical
    doubles."""
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    slope = cov_n / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.round(
            cov_n / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_xy"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


CORR_SQL = """
WITH m AS (
    SELECT l_returnflag,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(x) AS DOUBLE) AS sx,
        CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        CAST(SUM(y * y) AS DOUBLE) AS syy,
        CAST(SUM(x * y) AS DOUBLE) AS sxy
    FROM (
        SELECT l_returnflag,
            CAST(l_quantity AS DECIMAL(18,2)) AS x,
            CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem
    ) GROUP BY l_returnflag
)
SELECT l_returnflag,
    CAST(n AS BIGINT) AS n_rows,
    round((n * sxy - sx * sy)
        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy,
    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        AS intercept
FROM m
"""


REGISTRY = [
    ("profile_columns", profile_columns_query, PROFILE_COLUMNS_SQL),
    ("stats_histogram", histogram_query, HISTOGRAM_SQL),
    ("stats_corr", corr_query, CORR_SQL),
]
