"""Validation side-channel: sampled source/target compare tasks.

Reference: ValidationService.canSubmitTask throttles to 1 of every N
mutations (applier/validation/ValidationService.java:79-96); the task
payload pairs the source row locator with the written HBase cell
locator (HBaseApplierMutationGenerator.getValidationTask:336-375) and
is sent to a Kafka topic for an external comparator.

Spark-first: the reference throttles with a shared counter (registers
every N-th call); a distributed engine can't share a counter, so the
1-in-N sample is taken deterministically by hashing the mutation
identity — same rate, reproducible, and oracle-checkable (a
`F.rand() < 1/N` sample would not be). The task build is a pure
projection; the side-channel is the Kafka sink of sinks/kafka.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Column

from .transactions import ORGANIZED_FEED_SQL, organized_feed

# 1 of every N mutations (ValidationService.java:79-96). 64 divides the
# two-nibble hash space (256) exactly, so the sample is uniform.
SAMPLE_EVERY = 64
TARGET_DOMAIN = "hbase-cluster"
SOURCE_DOMAIN = "mysql-main"

_HEX = "0123456789abcdef"


def _md5_bucket256(col: Column) -> Column:
    """0..255 bucket from md5's first two nibbles (engine-portable)."""
    h = F.md5(col.cast("string"))
    n1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    n2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (n1 * 16 + n2).cast("int")


def validation_tasks(organized: DataFrame) -> DataFrame:
    """The sampled compare tasks for a (rowkey-stamped) change feed."""
    sampled = organized.where(
        _md5_bucket256(
            F.concat_ws(";", F.col("rowkey"), F.col("event_id"))
        )
        % SAMPLE_EVERY
        == 0
    )
    task = F.struct(
        F.concat(
            F.lit(f"{SOURCE_DOMAIN}/"), F.col("db"), F.lit("."),
            F.col("table_name"),
        ).alias("source"),
        F.concat(
            F.lit(f"{TARGET_DOMAIN}/"), F.lit("testdb:"),
            F.lower(F.col("table_name")), F.lit("/"), F.col("rowkey"),
        ).alias("target"),
        F.col("txn_uuid").alias("transaction_uuid"),
        F.col("version_us").alias("version_us"),
    )
    return sampled.select(
        "event_id",
        "table_name",
        "rowkey",
        F.to_json(task).alias("task"),
    )


def validation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validation_tasks(organized_feed(spark, sf_dir))


VALIDATION_SQL = (
    ORGANIZED_FEED_SQL
    + f"""
SELECT event_id, table_name, rowkey,
    to_json(struct_pack(
        source := '{SOURCE_DOMAIN}/' || db || '.' || table_name,
        target := '{TARGET_DOMAIN}/testdb:' || lower(table_name)
                  || '/' || rowkey,
        transaction_uuid := txn_uuid,
        version_us := version_us)) AS task
FROM organized
WHERE ((strpos('{_HEX}',
          substr(md5(rowkey || ';' || CAST(event_id AS VARCHAR)), 1, 1)) - 1)
       * 16
       + strpos('{_HEX}',
          substr(md5(rowkey || ';' || CAST(event_id AS VARCHAR)), 2, 1)) - 1)
      % {SAMPLE_EVERY} = 0
"""
)

REGISTRY = [("cdc_validation_sample", validation_query, VALIDATION_SQL)]
