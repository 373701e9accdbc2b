"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``replicator_spark/`` (see SURVEY.md §2 and the
registry in replicator_spark/api.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from replicator_spark import api
from replicator_spark.session import prep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full CDC pipeline on sf0.001 — change feed →
    transaction stamping → µs version organizer → time-machine cells →
    as-of snapshot ("state of every row at time T")."""
    prep(spark)
    from replicator_spark.sinks.timemachine import asof_snapshot_query

    return asof_snapshot_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return api.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() entry."""
    return api.oracle_sql()
