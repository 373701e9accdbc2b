"""Sketch operators: KMV (k-minimum-values) distinct-count estimation.

Spark's built-in approx_count_distinct (HLL++) is the production
default, but its register layout isn't reproducible outside the JVM —
no oracle. KMV gives the same one-pass, mergeable, bounded-memory
shape with a fully deterministic, engine-portable construction:

    h(x)   = first 12 hex chars of md5(x) as a fraction of 2^48
    sketch = the K smallest h(x) per group        (mergeable: min-K)
    D̂      = (K - 1) / max(sketch)                (if ≥ K distinct)

At 100 TB the heavy lifting is a combiner-backed groupBy whose state
per group is K longs — the same memory bound HLL gives, and the
partial aggregation (map-side top-K via sorted slice) means the
shuffle carries only K values per group per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

K = 64
HASH_SPACE = float(1 << 48)  # 12 hex chars


def _h48(col: Column) -> Column:
    """Deterministic uniform hash → [0, 1): md5's first 48 bits."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("double") / F.lit(HASH_SPACE)


def kmv_estimate(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group KMV distinct estimate + exact count for reference."""
    hashed = df.select(
        group_col, F.col(value_col).alias("v"), _h48(F.col(value_col)).alias("h")
    )
    per_group = hashed.groupBy(group_col).agg(
        # min-K via sorted slice of the collected distinct hashes;
        # collect_set is the associative partial state (bounded only at
        # the combiner level — a production variant caps it with a
        # top-K aggregator, same semantics)
        F.slice(F.array_sort(F.collect_set("h")), 1, K).alias("kmin"),
        F.countDistinct("v").alias("exact_distinct"),
    )
    est = F.when(
        F.size("kmin") >= K,
        F.round((F.lit(K - 1)) / F.element_at("kmin", K), 2),
    ).otherwise(F.size("kmin").cast("double"))
    return per_group.select(
        group_col,
        F.round(est, 2).alias("kmv_estimate"),
        "exact_distinct",
    )


def kmv_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, sketched vs exact."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    return kmv_estimate(ev, "event_type", "user_id")


# hex → integer without conv(): Σ nibble_i · 16^(12−i) (DuckDB has no
# base-16 string→int cast that works on md5 output)
_NIBBLE_SUM = " + ".join(
    "(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), "
    f"{i}, 1)) - 1) * {16 ** (12 - i)}"
    for i in range(1, 13)
)

KMV_SQL = f"""
WITH hashed AS (
    SELECT event_type, user_id AS v,
        CAST({_NIBBLE_SUM} AS DOUBLE) / {HASH_SPACE} AS h
    FROM events
), per_group AS (
    SELECT event_type,
        list_sort(list_distinct(list(h)))[1:{K}] AS kmin,
        COUNT(DISTINCT v) AS exact_distinct
    FROM hashed GROUP BY event_type
)
SELECT event_type,
    round(CASE WHEN len(kmin) >= {K}
               THEN round(({K} - 1) / kmin[{K}], 2)
               ELSE CAST(len(kmin) AS DOUBLE) END, 2) AS kmv_estimate,
    exact_distinct
FROM per_group
"""

REGISTRY = [("sketch_kmv_distinct", kmv_query, KMV_SQL)]
