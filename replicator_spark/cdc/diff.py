"""Changed-column diff for UPDATE events — sparse update projection.

Reference: HBaseApplierMutationGenerator.getPutForMirroredTable UPDATE
branch (:186-260): only columns whose before-image differs from the
after-image are written. Null-safe inequality (`IS DISTINCT FROM` /
eqNullSafe) — a changed NULL is a change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import CHANGE_FEED_SQL, change_feed


def changed_cols_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = change_feed(spark, sf_dir).where(F.col("op") == "UPDATE")
    val_chg = ~F.col("value_before").eqNullSafe(F.col("value_after"))
    props_chg = ~F.col("props_before").eqNullSafe(F.col("props_after"))
    diffed = feed.select(
        "event_id",
        F.concat_ws(
            ",",
            F.when(val_chg, F.lit("value")),
            F.when(props_chg, F.lit("props")),
        ).alias("changed_columns"),
        (val_chg.cast("int") + props_chg.cast("int")).alias("n_changed"),
    )
    return diffed.groupBy("changed_columns", "n_changed").agg(
        F.count("*").alias("n_updates")
    )


CHANGED_COLS_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
diffed AS (
    SELECT event_id,
        concat_ws(',',
            CASE WHEN value_before IS DISTINCT FROM value_after
                 THEN 'value' END,
            CASE WHEN props_before IS DISTINCT FROM props_after
                 THEN 'props' END) AS changed_columns,
        CAST(value_before IS DISTINCT FROM value_after AS INT)
        + CAST(props_before IS DISTINCT FROM props_after AS INT)
            AS n_changed
    FROM feed WHERE op = 'UPDATE'
)
SELECT changed_columns, n_changed, COUNT(*) AS n_updates
FROM diffed
GROUP BY 1, 2
"""
