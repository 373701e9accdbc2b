"""Streaming SCD2 interval maintenance — the time-machine's
slowly-changing-dimension export (sinks/timemachine.py:SCD2) run
INCREMENTALLY over the live stream instead of as a batch rebuild.

Reference anchor: the HBase time-machine keeps every version of a row
(HBaseApplier.java:166-196, maxVersions); SCD2 intervals are the
warehouse-facing presentation of that history. A batch rebuild rescans
everything; the streaming form closes each key's current interval the
moment its successor arrives, emitting exactly the CLOSED intervals —
each key's open (current) interval lives in the state store, 16 bytes
per key (value double + valid_from long).

Spark-first: applyInPandasWithState keyed by user_id; within a batch
the group's rows process in (ts, event_id) order, so under in-order
micro-batching (file streams preserve it; the multibatch test pins it)
the emitted intervals are byte-identical to the batch LEAD-window
derivation restricted to closed intervals — which is exactly the SQL
oracle. At 100 TB the state store holds one open interval per LIVE
key — the same cardinality the applier's current-state table already
carries — and each batch touches only arriving keys' groups.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import prep
from .job import _events_stream

OUT_SCHEMA = (
    "user_id long, value double, valid_from_ms long, valid_to_ms long"
)
STATE_SCHEMA = "cur double, since long"


def _close_intervals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur, since = state.get if state.exists else (None, None)
    rows = []
    batch = pd.concat(list(pdfs))
    # sort on FULL-precision ts (ns) + event_id — the oracle's LEAD
    # ordering; ms truncation happens only on the emitted columns, so
    # two same-user events inside one millisecond still close in the
    # same order as the batch derivation (round-4 advice item)
    batch = batch.sort_values(["ts_ns", "event_id"])
    for r in batch.itertuples(index=False):
        ts_ms = int(r.ts_ns) // 1_000_000
        if since is not None:
            rows.append((user_id, cur, since, ts_ms))
        cur, since = float(r.value), ts_ms
    if since is not None:
        state.update((cur, since))
    yield pd.DataFrame(
        rows, columns=["user_id", "value", "valid_from_ms", "valid_to_ms"]
    )


def build_scd2_stream(stream: DataFrame) -> DataFrame:
    """events stream → closed-interval stream (factored for the
    multibatch determinism test)."""
    raw = stream.select(
        "user_id",
        F.col("ts").alias("ts_ns"),
        "event_id",
        "value",
    )
    return raw.groupBy("user_id").applyInPandasWithState(
        _close_intervals,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_scd2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    base = tempfile.mkdtemp(prefix="scd2_state_")
    out = os.path.join(base, "out")
    q = (
        build_scd2_stream(_events_stream(spark, sf_dir))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


# Oracle: the batch LEAD-window derivation, closed intervals only.
STREAM_SCD2_SQL = """
WITH iv AS (
    SELECT user_id, value,
        epoch_ms(ts) AS valid_from_ms,
        LEAD(epoch_ms(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ms
    FROM events
)
SELECT user_id, value, valid_from_ms, valid_to_ms
FROM iv WHERE valid_to_ms IS NOT NULL
"""


REGISTRY = [
    ("stream_scd2_intervals", stream_scd2_query, STREAM_SCD2_SQL),
]
