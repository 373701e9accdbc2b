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

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

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


# --- Avro payload bytes (EventDataPresenterAvro.java:110-150) ---------
#
# convertAugumentedEventDataToAvro puts row values into the record AS
# STRINGS (row.getValueAsString) and meta fields __timestamp (long),
# __is_deleted, __binlog_position — so the wire record for a change
# event is nullable-string data fields + nullable long/boolean/string
# meta fields. The Avro binary encoding (public spec: zigzag-varint
# longs, length-prefixed utf8 strings, 1-byte booleans, union branch
# index before each nullable) is implemented pure-Python inside an
# Arrow-batched pandas UDF — no spark-avro jar needed. The oracle
# reconstructs the IDENTICAL byte stream as a lowercase hex string in
# SQL (varint unrolled to 10 CASE terms) and compares md5 digests —
# byte-exact cross-engine verification of the wire format.
#
# Record field order (schema subject bigdata-<db>-<table>-value):
#   txn_uuid, txn_xid, value_before, value_after, props_after
#   (nullable strings), __timestamp (nullable long),
#   __is_deleted (nullable boolean), __binlog_position (nullable string)


def _avro_zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & (2**64 - 1)


def _avro_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_long(v: int) -> bytes:
    return _avro_varint(_avro_zigzag(int(v)))


def _avro_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _avro_long(len(raw)) + raw


def _avro_nullable(v, enc) -> bytes:
    # union ["null", T]: branch index 0 → null, 1 → value
    return b"\x00" if v is None else b"\x02" + enc(v)


def avro_encode_row(
    txn_uuid, txn_xid, value_before, value_after, props_after,
    ts_ms, is_deleted, binlog_pos,
) -> bytes:
    return b"".join(
        (
            _avro_nullable(txn_uuid, _avro_string),
            _avro_nullable(txn_xid, _avro_string),
            _avro_nullable(value_before, _avro_string),
            _avro_nullable(value_after, _avro_string),
            _avro_nullable(props_after, _avro_string),
            _avro_nullable(ts_ms, _avro_long),
            _avro_nullable(
                is_deleted, lambda b: b"\x01" if b else b"\x00"
            ),
            _avro_nullable(binlog_pos, _avro_string),
        )
    )


@pandas_udf(BinaryType())
def _avro_encode_udf(
    txn_uuid: pd.Series, txn_xid: pd.Series, value_before: pd.Series,
    value_after: pd.Series, props_after: pd.Series, ts_ms: pd.Series,
    is_deleted: pd.Series, binlog_pos: pd.Series,
) -> pd.Series:
    def _n(v):
        return None if pd.isna(v) else v

    return pd.Series(
        [
            avro_encode_row(
                _n(u), _n(x), _n(vb), _n(va), _n(p),
                None if pd.isna(t) else int(t), _n(d), _n(bp),
            )
            for u, x, vb, va, p, t, d, bp in zip(
                txn_uuid, txn_xid, value_before, value_after,
                props_after, ts_ms, is_deleted, binlog_pos,
            )
        ]
    )


def avro_messages(feed: DataFrame) -> DataFrame:
    """event → (event_id, subject, avro_len, avro_md5): the Avro-binary
    twin of kafka_messages' JSON presentation."""
    rows = feed.where(F.col("op") != "QUERY").select(
        "event_id",
        F.concat(
            F.lit("bigdata-"), F.col("db"), F.lit("-"),
            F.col("table_name"), F.lit("-value"),
        ).alias("subject"),
        _avro_encode_udf(
            F.col("txn_uuid").cast("string"),
            F.col("txn_xid").cast("string"),
            F.col("value_before").cast("string"),
            F.col("value_after").cast("string"),
            F.col("props_after").cast("string"),
            F.col("commit_ts_ms").cast("long"),
            (F.col("op") == "DELETE"),
            F.col("event_id").cast("string"),
        ).alias("avro"),
    )
    return rows.select(
        "event_id",
        "subject",
        F.length("avro").cast("long").alias("avro_len"),
        F.md5(F.lower(F.hex("avro"))).alias("avro_md5"),
    )


def avro_messages_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cdc.envelope import change_feed

    return avro_messages(change_feed(spark, sf_dir))


def _varint_hex_sql(z: str) -> str:
    """Unrolled Avro varint → lowercase hex for a non-negative BIGINT
    SQL expression (10 7-bit groups, continuation bit when more)."""
    terms = []
    for i in range(10):
        byte = (
            f"((({z}) >> {7 * i}) & 127)"
            f" + CASE WHEN (({z}) >> {7 * (i + 1)}) > 0"
            " THEN 128 ELSE 0 END"
        )
        cond = "TRUE" if i == 0 else f"(({z}) >> {7 * i}) > 0"
        terms.append(
            f"CASE WHEN {cond} THEN lpad(lower(to_hex({byte})), 2, '0')"
            " ELSE '' END"
        )
    return "(" + " || ".join(terms) + ")"


def _nullable_str_hex_sql(expr: str) -> str:
    """hex of union-branch + length-varint + utf8 bytes, '00' for NULL.
    (fixture strings are ASCII; strlen = byte length either way)"""
    v = _varint_hex_sql(f"2 * strlen({expr})")
    return (
        f"CASE WHEN {expr} IS NULL THEN '00' ELSE '02' || {v}"
        f" || lower(hex(encode({expr}))) END"
    )


def _nullable_long_hex_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} IS NULL THEN '00'"
        f" ELSE '02' || {_varint_hex_sql(f'2 * ({expr})')} END"
    )


from ..cdc.envelope import CHANGE_FEED_SQL  # noqa: E402

AVRO_MESSAGES_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
enc AS (
    SELECT event_id,
        'bigdata-' || db || '-' || table_name || '-value' AS subject,
        {_nullable_str_hex_sql('CAST(txn_uuid AS VARCHAR)')}
        || {_nullable_str_hex_sql('CAST(txn_xid AS VARCHAR)')}
        || {_nullable_str_hex_sql('CAST(value_before AS VARCHAR)')}
        || {_nullable_str_hex_sql('CAST(value_after AS VARCHAR)')}
        || {_nullable_str_hex_sql('props_after')}
        || {_nullable_long_hex_sql('commit_ts_ms')}
        || (CASE WHEN op = 'DELETE' THEN '0201' ELSE '0200' END)
        || {_nullable_str_hex_sql('CAST(event_id AS VARCHAR)')}
            AS avro_hex
    FROM feed WHERE op <> 'QUERY'
)
SELECT event_id, subject,
    CAST(strlen(avro_hex) / 2 AS BIGINT) AS avro_len,
    md5(avro_hex) AS avro_md5
FROM enc
"""

REGISTRY = [
    ("sink_avro_schemas", avro_schema_query, AVRO_SCHEMA_SQL),
    ("sink_avro_messages", avro_messages_query, AVRO_MESSAGES_SQL),
]
