"""Event classification: op mapping + the QUERY-event SQL classifier.

Reference:
- op classification: HeaderAugmenter.java:16-49 (binlog event kind →
  AugmentedEventType INSERT/UPDATE/DELETE/QUERY).
- query classifier: AugmenterContext.processQueryEvent (:415-577) — a
  regex dispatch ladder over the QUERY event's SQL text: BEGIN / COMMIT
  / DDL_TABLE / DDL_TEMPORARY_TABLE / DDL_VIEW / DDL_DEFINER /
  DDL_ANALYZE / unknown, with target-table extraction (patterns
  AugmenterContext.java:71-81).

Spark-first: a `when().otherwise()` ladder with `rlike` /
`regexp_extract` — pure codegen'd expressions, exactly the "cheap regex
gate before expensive decode" predicate-first ordering the reference
uses (Augmenter.apply:123-142), which Catalyst pushes down for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import CHANGE_FEED_SQL, change_feed

# Regexes mirrored from AugmenterContext.java:71-81 (simplified to the
# dialect subset both Spark and DuckDB RE2-style engines share).
R_BEGIN = "^\\s*(begin)"
R_COMMIT = "^\\s*(commit)"
R_DDL_TABLE = "^\\s*(alter|drop|create|rename|truncate|modify)\\s+(table)"
R_DDL_TEMP = "^\\s*(create|drop)\\s+(temporary)\\s+(table)"
R_DDL_VIEW = "^\\s*(alter|drop|create)\\s+(view)"
R_ANALYZE = "^\\s*(analyze)\\s+(table)"


def classify_ops_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (table, op) event counts — the shouldAugment gate + op map
    rolled into the count sink (CountApplier.java:37-45)."""
    feed = change_feed(spark, sf_dir)
    return feed.groupBy("table_name", "op").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_rows_touched"),
    )


CLASSIFY_OPS_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL})
SELECT table_name, op, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_rows_touched
FROM feed
GROUP BY table_name, op
"""


def classify_sql(col):
    """The DDL/BEGIN/COMMIT regex ladder as a column expression."""
    lowered = F.lower(col)
    return (
        F.when(lowered.rlike(R_DDL_TEMP), F.lit("DDL_TEMPORARY_TABLE"))
        .when(lowered.rlike(R_DDL_TABLE), F.lit("DDL_TABLE"))
        .when(lowered.rlike(R_DDL_VIEW), F.lit("DDL_VIEW"))
        .when(lowered.rlike(R_ANALYZE), F.lit("DDL_ANALYZE"))
        .when(lowered.rlike(R_BEGIN), F.lit("BEGIN"))
        .when(lowered.rlike(R_COMMIT), F.lit("COMMIT"))
        .otherwise(F.lit("UNKNOWN"))
    )


def query_classifier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify synthetic SQL statements derived from QUERY events.

    The driver feed has no DDL text, so QUERY events synthesize a
    deterministic statement from their payload; what is checked is the
    classifier ladder itself.
    """
    feed = change_feed(spark, sf_dir)
    q = feed.where(F.col("op") == "QUERY").withColumn(
        "sql_text",
        F.expr(
            """CASE user_id % 5
                 WHEN 0 THEN 'BEGIN'
                 WHEN 1 THEN 'COMMIT'
                 WHEN 2 THEN concat('ALTER TABLE ', table_name,
                                    ' ADD COLUMN c INT')
                 WHEN 3 THEN concat('CREATE TEMPORARY TABLE tmp_',
                                    table_name, ' (id INT)')
                 ELSE concat('ANALYZE TABLE ', table_name)
               END"""
        ),
    )
    return (
        q.withColumn("sql_class", classify_sql(F.col("sql_text")))
        .groupBy("sql_class")
        .agg(F.count("*").alias("n"))
    )


QUERY_CLASSIFIER_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
q AS (
    SELECT *, CASE user_id % 5
        WHEN 0 THEN 'BEGIN'
        WHEN 1 THEN 'COMMIT'
        WHEN 2 THEN concat('ALTER TABLE ', table_name, ' ADD COLUMN c INT')
        WHEN 3 THEN concat('CREATE TEMPORARY TABLE tmp_', table_name,
                           ' (id INT)')
        ELSE concat('ANALYZE TABLE ', table_name)
      END AS sql_text
    FROM feed WHERE op = 'QUERY'
)
SELECT CASE
    WHEN regexp_matches(lower(sql_text), '{R_DDL_TEMP}')
        THEN 'DDL_TEMPORARY_TABLE'
    WHEN regexp_matches(lower(sql_text), '{R_DDL_TABLE}') THEN 'DDL_TABLE'
    WHEN regexp_matches(lower(sql_text), '{R_DDL_VIEW}') THEN 'DDL_VIEW'
    WHEN regexp_matches(lower(sql_text), '{R_ANALYZE}') THEN 'DDL_ANALYZE'
    WHEN regexp_matches(lower(sql_text), '{R_BEGIN}') THEN 'BEGIN'
    WHEN regexp_matches(lower(sql_text), '{R_COMMIT}') THEN 'COMMIT'
    ELSE 'UNKNOWN' END AS sql_class,
    COUNT(*) AS n
FROM q
GROUP BY 1
"""
