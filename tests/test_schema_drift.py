"""Testdata physical-schema drift armor: the driver regenerated
events.parquet between rounds changing ts from INT64-nanos to
TIMESTAMP-µs, which broke every time-deriving query. These tests pin
the contract: the engine produces IDENTICAL results over either
encoding (and fails loudly, not silently-1000×-shifted, for the
streaming reader)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dual_dirs(spark, sf_dir, tmp_path_factory):
    """Two copies of the events table: ts as INT64 epoch-nanos and ts
    as TIMESTAMP (µs), same logical instants."""
    from replicator_spark.session import normalize_events

    import glob
    import shutil

    base = tmp_path_factory.mktemp("drift")
    nanos_dir = str(base / "nanos")
    micros_dir = str(base / "micros")
    ev = normalize_events(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).limit(2000)

    # mirror the real testdata layout: events.parquet is a single FILE
    def _write_flat(df, out_dir):
        tmp = os.path.join(str(base), "tmp_write")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(out_dir, exist_ok=True)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.copy(part, os.path.join(out_dir, "events.parquet"))
        shutil.rmtree(tmp)

    _write_flat(ev, nanos_dir)
    _write_flat(
        ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))),
        micros_dir,
    )
    return nanos_dir, micros_dir


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_change_feed_identical_across_encodings(spark, dual_dirs):
    from replicator_spark.cdc.envelope import change_feed

    nanos_dir, micros_dir = dual_dirs
    assert _canon(change_feed(spark, nanos_dir)) == _canon(
        change_feed(spark, micros_dir)
    )


def test_normalize_events_yields_long_nanos(spark, dual_dirs):
    from replicator_spark.session import read_table

    nanos_dir, micros_dir = dual_dirs
    for d in dual_dirs:
        df = read_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "bigint", d
    a = _canon(read_table(spark, nanos_dir, "events"))
    b = _canon(read_table(spark, micros_dir, "events"))
    assert a == b


def test_streaming_reader_identical_across_encodings(spark, dual_dirs):
    """The streaming source must not silently misread µs as nanos —
    the exact failure mode of the round-2 regression."""
    from replicator_spark.streaming.job import _events_stream

    outs = []
    for d in dual_dirs:
        stream = _events_stream(spark, d)
        assert dict(stream.dtypes)["ts"] == "bigint"
        out = os.path.join(d, "out")
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outs.append(_canon(spark.read.parquet(out)))
    assert outs[0] == outs[1]
