"""Distribution statistics: exact interpolated percentiles per group.

The monitoring/profiling query every pipeline runs over a numeric
column (latency, value, token counts). `F.percentile` is Spark's exact
order-statistic aggregate with continuous interpolation — identical
semantics to DuckDB/ANSI `quantile_cont` (index = p·(n−1), linear
between neighbors), so the two engines agree bit-for-bit before the
display rounding.

Scale: one combiner-less keyed exchange (exact percentiles need the
group's values together); the group key (event_type) is low-cardinality
but each group's values stream through a single sort — for monstrous
groups you'd switch to `percentile_approx` (t-digest, mergeable) and
lose exactness; that trade-off is the operator's documented scale knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

PS = (0.25, 0.5, 0.9, 0.99)


def percentiles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    aggs = [
        F.round(F.percentile("value", F.lit(p)), 6).alias(
            f"p{int(p * 100)}"
        )
        for p in PS
    ]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
        F.round(F.avg("value"), 6).alias("v_avg"),
        *aggs,
    )


_P_COLS = ", ".join(
    f"round(quantile_cont(value, {p}), 6) AS p{int(p * 100)}" for p in PS
)

PERCENTILES_SQL = f"""
SELECT event_type, COUNT(*) AS n,
    round(MIN(value), 6) AS v_min,
    round(MAX(value), 6) AS v_max,
    round(AVG(value), 6) AS v_avg,
    {_P_COLS}
FROM events
GROUP BY event_type
"""

REGISTRY = [("stats_percentiles", percentiles_query, PERCENTILES_SQL)]
