"""Avro presentation: per-table record-schema generation + subjects.

Reference: EventDataPresenterAvro.createAvroSchema
(applier/kafka/EventDataPresenterAvro.java:152-223) generates one Avro
record schema per source table from its ColumnSchema list:

    tinyint/smallint/mediumint          → int
    int unsigned                        → long
    bigint unsigned                     → string
    float/real                          → float
    double                              → double
    date/time/datetime/timestamp/year   → string
    binary/varbinary/blob               → string (hex)
    bit                                 → string
    decimal                             → string
    everything else                     → string

plus meta fields __timestamp (long), __is_deleted (boolean),
__binlog_position (string) (:265-269); every field is nullable
(union with null). Subject = `bigdata-<db>-<table>-value`
(AugmentedEventHeader.schemaKey:63-69), registered per table
(KafkaApplier.java:168-176).

Spark-first: schema generation is a column expression over the
(table, column, type) catalog — the type→avro mapping is a CASE
ladder, the record assembly an ordered string aggregation. The same
mapping lives in the SQL oracle; the catalog fixture is shared.
`spark-avro`'s to_avro handles the wire encoding when the package is
present (config-gated, like the applier.type switch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (table, ordinal, column, mysql_type) — the "organisms"-style type zoo
# (mysql-replicator/src/test/resources/mysql.init.sql analog), plus a
# plain table, so every branch of the mapping is exercised.
CATALOG = [
    ("organisms", 1, "id", "int unsigned"),
    ("organisms", 2, "name", "varchar"),
    ("organisms", 3, "lifespan", "smallint"),
    ("organisms", 4, "population", "bigint unsigned"),
    ("organisms", 5, "mass", "float"),
    ("organisms", 6, "accuracy", "double"),
    ("organisms", 7, "born", "date"),
    ("organisms", 8, "seen_at", "timestamp"),
    ("organisms", 9, "dna", "blob"),
    ("organisms", 10, "flags", "bit"),
    ("organisms", 11, "price", "decimal"),
    ("organisms", 12, "kingdom", "enum"),
    ("users", 1, "user_id", "bigint"),
    ("users", 2, "value", "double"),
    ("users", 3, "props", "json"),
]

DB = "testdb"

_INT_TYPES = ("tinyint", "smallint", "mediumint")
_STRINGLY = (
    "bigint unsigned", "date", "time", "datetime", "timestamp", "year",
    "binary", "varbinary", "blob", "bit", "decimal",
)


def avro_type(mysql_type: Column) -> Column:
    """MySQL type name → Avro primitive type name (the CASE ladder)."""
    t = F.lower(mysql_type)
    return (
        F.when(t.isin(*_INT_TYPES), "int")
        .when(t == "int unsigned", "long")
        .when(t.isin("float", "real"), "float")
        .when(t == "double", "double")
        .when(t.isin(*_STRINGLY), "string")
        .otherwise("string")
    )


def avro_field_json(name: Column, avro_t: Column) -> Column:
    """One nullable Avro field: {"name":…,"type":["null",…],"default":null}."""
    return F.concat(
        F.lit('{"name":"'), name,
        F.lit('","type":["null","'), avro_t,
        F.lit('"],"default":null}'),
    )


_META_FIELDS = (
    '{"name":"__timestamp","type":["null","long"],"default":null},'
    '{"name":"__is_deleted","type":["null","boolean"],"default":null},'
    '{"name":"__binlog_position","type":["null","string"],"default":null}'
)


def catalog_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        CATALOG, "table_name string, ordinal int, col string, mysql_type string"
    )


def avro_schemas(catalog: DataFrame) -> DataFrame:
    """(subject, avro_schema) per table — ordered field aggregation."""
    fields = catalog.select(
        "table_name",
        "ordinal",
        avro_field_json(F.col("col"), avro_type(F.col("mysql_type"))).alias(
            "field_json"
        ),
    )
    per_table = fields.groupBy("table_name").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ordinal", "field_json"))
                ),
                lambda s: s["field_json"],
            ),
            ",",
        ).alias("cols_json")
    )
    return per_table.select(
        F.concat(
            F.lit(f"bigdata-{DB}-"), F.col("table_name"), F.lit("-value")
        ).alias("subject"),
        F.concat(
            F.lit('{"type":"record","name":"'),
            F.col("table_name"),
            F.lit(f'","namespace":"{DB}","fields":['),
            F.col("cols_json"),
            F.lit(f",{_META_FIELDS}]}}"),
        ).alias("avro_schema"),
    )


def avro_schema_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return avro_schemas(catalog_df(spark))


_CATALOG_VALUES = ", ".join(
    f"('{t}', {o}, '{c}', '{m}')" for t, o, c, m in CATALOG
)

_AVRO_TYPE_CASE = f"""CASE
    WHEN lower(mysql_type) IN {str(_INT_TYPES)} THEN 'int'
    WHEN lower(mysql_type) = 'int unsigned' THEN 'long'
    WHEN lower(mysql_type) IN ('float', 'real') THEN 'float'
    WHEN lower(mysql_type) = 'double' THEN 'double'
    WHEN lower(mysql_type) IN {str(_STRINGLY)} THEN 'string'
    ELSE 'string' END"""

AVRO_SCHEMA_SQL = f"""
WITH catalog(table_name, ordinal, col, mysql_type) AS (
    VALUES {_CATALOG_VALUES}
), fields AS (
    SELECT table_name, ordinal,
        '{{"name":"' || col || '","type":["null","' || {_AVRO_TYPE_CASE}
        || '"],"default":null}}' AS field_json
    FROM catalog
), per_table AS (
    SELECT table_name,
        string_agg(field_json, ',' ORDER BY ordinal) AS cols_json
    FROM fields GROUP BY table_name
)
SELECT 'bigdata-{DB}-' || table_name || '-value' AS subject,
    '{{"type":"record","name":"' || table_name
    || '","namespace":"{DB}","fields":[' || cols_json
    || ',{_META_FIELDS}]}}' AS avro_schema
FROM per_table
"""


REGISTRY = [("sink_avro_schemas", avro_schema_query, AVRO_SCHEMA_SQL)]
