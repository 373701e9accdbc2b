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
R_DDL_DEFINER = (
    "^\\s*(alter|drop|create|rename|truncate|modify)\\s+(definer)\\s*="
)
R_DDL_TABLE = "^\\s*(alter|drop|create|rename|truncate|modify)\\s+(table)"
# target-table extraction: ddlTablePattern group 4
# (AugmenterContext.java:76, backtick/schema strip :488-500)
R_DDL_TABLE_TARGET = (
    "(?i)^\\s*(alter|drop|create|rename|truncate|modify)\\s+(table)\\s+"
    "(if (?:not )?exists\\s+)?(\\S+)"
)
R_DDL_TEMP = "^\\s*(create|drop)\\s+(temporary)\\s+(table)"
R_DDL_VIEW = "^\\s*(alter|drop|create)\\s+(view)"
R_ANALYZE = "^\\s*(analyze)\\s+(table)"
R_RENAME = "^\\s*rename\\s+table"

# Per-rename-pair pattern for the cross-schema RENAME guard
# (AugmenterContext.RENAME_MULTISCHEMA_PATTERN, ActiveSchemaHelpers
# .getShouldProcess:173-198): groups 1/3 carry the optional from/to
# schema qualifiers.
RENAME_PAIR = (
    "(`?\\S+`?\\.)?(`?\\S+`?)\\s+TO\\s+(`?\\S+`?\\.)?(`?\\S+`?)\\s*,?"
)


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
    """The DDL/BEGIN/COMMIT regex ladder as a column expression.

    Precedence follows processQueryEvent (AugmenterContext.java:415-500):
    BEGIN / COMMIT / DDL_DEFINER before DDL_TABLE (a `CREATE
    DEFINER=...` statement must not fall through to the table branch).
    """
    lowered = F.lower(col)
    return (
        F.when(lowered.rlike(R_BEGIN), F.lit("BEGIN"))
        .when(lowered.rlike(R_COMMIT), F.lit("COMMIT"))
        .when(lowered.rlike(R_DDL_DEFINER), F.lit("DDL_DEFINER"))
        .when(lowered.rlike(R_DDL_TEMP), F.lit("DDL_TEMPORARY_TABLE"))
        .when(lowered.rlike(R_DDL_TABLE), F.lit("DDL_TABLE"))
        .when(lowered.rlike(R_DDL_VIEW), F.lit("DDL_VIEW"))
        .when(lowered.rlike(R_ANALYZE), F.lit("DDL_ANALYZE"))
        .otherwise(F.lit("UNKNOWN"))
    )


def rename_should_process(col, replicated_schema: str):
    """Cross-schema RENAME guard (ActiveSchemaHelpers.getShouldProcess
    :173-198): a RENAME is processed only if every rename pair's from-
    and to-schema qualifier, when present, equals the replicated schema
    (which also enforces from==to). Pure codegen'd array expressions —
    regexp_extract_all + filter, no UDF."""

    def _no_foreign(group_idx: int):
        schemas = F.regexp_extract_all(col, F.lit(RENAME_PAIR), F.lit(group_idx))
        norm = F.transform(
            schemas, lambda s: F.regexp_replace(s, "[`.]", "")
        )
        return (
            F.size(
                F.filter(
                    norm,
                    lambda s: (s != F.lit(""))
                    & (s != F.lit(replicated_schema)),
                )
            )
            == 0
        )

    return _no_foreign(1) & _no_foreign(3)


def extract_target_table(col):
    """DDL target-table name: pattern group 4, then strip backticks and
    a schema qualifier (AugmenterContext.java:485-503). Empty when the
    statement is not a table DDL."""
    raw = F.regexp_extract(col, R_DDL_TABLE_TARGET, 4)
    unquoted = F.regexp_replace(raw, "`", "")
    return F.when(
        unquoted.contains("."), F.substring_index(unquoted, ".", -1)
    ).otherwise(unquoted)


_REPLICATED_SCHEMA = "mydb"

_SQL_TEXT_CASE = """CASE user_id % 10
     WHEN 0 THEN 'BEGIN'
     WHEN 1 THEN 'COMMIT'
     WHEN 2 THEN concat('ALTER TABLE ', table_name,
                        ' ADD COLUMN c INT')
     WHEN 3 THEN concat('CREATE TEMPORARY TABLE tmp_',
                        table_name, ' (id INT)')
     WHEN 4 THEN concat('CREATE DEFINER=`admin`@`%` TRIGGER trg_',
                        table_name, ' BEFORE INSERT ON ', table_name,
                        ' FOR EACH ROW SET @x = 1')
     WHEN 5 THEN concat('RENAME TABLE `mydb`.`', table_name,
                        '` TO `otherdb`.`', table_name, '`')
     WHEN 6 THEN concat('RENAME TABLE `mydb`.`', table_name,
                        '` TO `mydb`.`', table_name, '_old`')
     WHEN 7 THEN concat('CREATE VIEW v_', table_name,
                        ' AS SELECT 1')
     WHEN 8 THEN concat('DROP TABLE IF EXISTS `mydb`.`',
                        table_name, '`')
     ELSE concat('ANALYZE TABLE ', table_name)
   END"""


def query_classifier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify synthetic SQL statements derived from QUERY events.

    The driver feed has no DDL text, so QUERY events synthesize a
    deterministic statement from their payload; what is checked is the
    classifier ladder itself plus the cross-schema RENAME guard (a
    rename into another schema classifies DDL_TABLE but is flagged
    should_process=false, AugmenterContext.java:468-479).
    """
    feed = change_feed(spark, sf_dir)
    q = feed.where(F.col("op") == "QUERY").withColumn(
        "sql_text", F.expr(_SQL_TEXT_CASE)
    )
    q = q.withColumn("sql_class", classify_sql(F.col("sql_text")))
    q = q.withColumn(
        "should_process",
        F.when(
            (F.col("sql_class") == "DDL_TABLE")
            & F.lower(F.col("sql_text")).rlike(R_RENAME),
            rename_should_process(F.col("sql_text"), _REPLICATED_SCHEMA),
        ).otherwise(F.lit(True)),
    )
    q = q.withColumn(
        "target_table", extract_target_table(F.col("sql_text"))
    )
    return q.groupBy("sql_class", "should_process").agg(
        F.count("*").alias("n"),
        F.countDistinct(
            F.when(F.col("target_table") != "", F.col("target_table"))
        ).alias("n_target_tables"),
    )


QUERY_CLASSIFIER_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
q AS (
    SELECT *, {_SQL_TEXT_CASE} AS sql_text
    FROM feed WHERE op = 'QUERY'
),
classified AS (
    SELECT *, CASE
        WHEN regexp_matches(lower(sql_text), '{R_BEGIN}') THEN 'BEGIN'
        WHEN regexp_matches(lower(sql_text), '{R_COMMIT}') THEN 'COMMIT'
        WHEN regexp_matches(lower(sql_text), '{R_DDL_DEFINER}')
            THEN 'DDL_DEFINER'
        WHEN regexp_matches(lower(sql_text), '{R_DDL_TEMP}')
            THEN 'DDL_TEMPORARY_TABLE'
        WHEN regexp_matches(lower(sql_text), '{R_DDL_TABLE}') THEN 'DDL_TABLE'
        WHEN regexp_matches(lower(sql_text), '{R_DDL_VIEW}') THEN 'DDL_VIEW'
        WHEN regexp_matches(lower(sql_text), '{R_ANALYZE}') THEN 'DDL_ANALYZE'
        ELSE 'UNKNOWN' END AS sql_class,
        regexp_extract(
            regexp_replace(
                regexp_extract(sql_text, '{R_DDL_TABLE_TARGET}', 4),
                '`', '', 'g'),
            '([^.]*)$', 1) AS target_table
    FROM q
),
guarded AS (
    SELECT *, CASE
        WHEN sql_class = 'DDL_TABLE'
             AND regexp_matches(lower(sql_text), '{R_RENAME}')
        THEN len(list_filter(
                 list_transform(
                     regexp_extract_all(sql_text, '{RENAME_PAIR}', 1),
                     s -> regexp_replace(s, '[`.]', '', 'g')),
                 s -> s <> '' AND s <> '{_REPLICATED_SCHEMA}')) = 0
             AND len(list_filter(
                 list_transform(
                     regexp_extract_all(sql_text, '{RENAME_PAIR}', 3),
                     s -> regexp_replace(s, '[`.]', '', 'g')),
                 s -> s <> '' AND s <> '{_REPLICATED_SCHEMA}')) = 0
        ELSE TRUE END AS should_process
    FROM classified
)
SELECT sql_class, should_process, COUNT(*) AS n,
    COUNT(DISTINCT CASE WHEN target_table <> '' THEN target_table END)
        AS n_target_tables
FROM guarded
GROUP BY 1, 2
"""
