"""Config-driven pipeline runner: the reference's yaml-config surface
(source → augment filters → partitioner → applier) composed from the
verified operators. Reference: Replicator.java:95-204, config.yaml."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from replicator_spark.runner import (
    DEMO_CONFIG,
    apply_sink,
    build_feed,
    run_batch,
    run_stream,
    runner_pipeline_query,
)


def test_filters_and_merge_applied(spark, sf_dir):
    out = runner_pipeline_query(spark, sf_dir).collect()
    tables = {r["table_name"] for r in out}
    # merge strips the monthly suffix entirely
    assert tables == {"users"}
    # QUERY gate dropped the QUERY class
    assert all(r["op"] != "QUERY" for r in out)


def test_include_overrides_exclude(spark, sf_dir):
    cfg = {**DEMO_CONFIG, "augmenter.table.merge": False}
    feed = build_feed(spark, sf_dir, cfg)
    months = {
        r["table_name"]
        for r in feed.select("table_name").distinct().collect()
    }
    # H1-2024 excluded... except the whitelisted January
    assert "users_202401" in months
    assert not any(
        m.startswith("users_2024") and m[-2:] in
        {"02", "03", "04", "05", "06"}
        for m in months
    )


def test_partitioner_controls_exchange(spark, sf_dir):
    n = 4
    feed = build_feed(
        spark, sf_dir,
        {**DEMO_CONFIG, "partitioner.type": "XXID",
         "replicator.tasks": n},
    )
    assert feed.rdd.getNumPartitions() == n


@pytest.mark.parametrize("kind,cols", [
    ("count", {"op", "n_events"}),
    ("console", {"event_id", "line"}),
    ("kafka", {"event_id", "topic", "partition", "key", "value"}),
    ("timemachine", None),  # cells schema checked by its own tests
])
def test_all_applier_types_compose(spark, sf_dir, kind, cols):
    df = run_batch(
        spark, sf_dir, {**DEMO_CONFIG, "applier.type": kind}
    )
    assert df.count() > 0
    if cols:
        assert set(df.columns) == cols


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streamed composition (foreachBatch per micro-batch) must
    produce the same count-sink totals as the batch plan — the
    streaming==batch guarantee the runner inherits from job.py."""
    cfg = {**DEMO_CONFIG, "applier.type": "count"}
    out = os.path.join(str(tmp_path), "out")
    run_stream(
        spark, sf_dir, cfg, out, os.path.join(str(tmp_path), "ckpt")
    )
    streamed = (
        spark.read.parquet(out)
        .groupBy("op")
        .agg(F.sum("n_events").alias("n_events"))
    )
    batch = run_batch(spark, sf_dir, cfg)
    a = {(r["op"], r["n_events"]) for r in streamed.collect()}
    b = {(r["op"], r["n_events"]) for r in batch.collect()}
    assert a == b


def test_applier_collapse_nets_the_feed(spark, sf_dir):
    """applier.collapse=True routes the count applier through net-effect
    compaction: per-op counts must equal the net feed's op counts, and
    must shrink (or hold) vs the raw feed."""
    import pytest
    from pyspark.sql import functions as F

    from replicator_spark.cdc.apply import net_effect_query
    from replicator_spark.runner import run_batch

    raw = {
        r["op"]: r["n_events"]
        for r in run_batch(spark, sf_dir, {"applier.type": "count"}).collect()
    }
    collapsed = {
        r["op"]: r["n_events"]
        for r in run_batch(
            spark, sf_dir, {"applier.type": "count", "applier.collapse": True}
        ).collect()
    }
    want = {
        r["net_op"]: r["cnt"]
        for r in net_effect_query(spark, sf_dir)
        .groupBy("net_op")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert collapsed == want
    assert sum(collapsed.values()) <= sum(
        v for k, v in raw.items() if k in ("INSERT", "UPDATE", "DELETE")
    )
    # sinks that need per-event txn metadata refuse the collapsed feed
    with pytest.raises(ValueError, match="collapse"):
        run_batch(
            spark,
            sf_dir,
            {"applier.type": "timemachine", "applier.collapse": True},
        )


def test_survey_inventory_in_lockstep_with_registry():
    """SURVEY.md §2.12's generated table must list exactly the
    registered operators (regenerate with
    `python tools/gen_survey_inventory.py --write` after adding ops)."""
    import os
    import re

    from replicator_spark import api

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| `[a-z0-9_/]+\.py:\d+` \|", survey, re.M)
    assert sorted(rows) == sorted(api.queries()), (
        len(rows), len(api.queries()),
    )


def test_binlog_files_source_equals_parquet_row_slice(
    spark, sf_dir, tmp_path
):
    """source.type=binlog_files: real binlog v4 blobs on disk drive the
    SAME composed pipeline, and the result equals the parquet-source
    run restricted to row events (a binlog file source carries exactly
    the row events — QUERY events have no row image)."""
    from replicator_spark.cdc.envelope import OP_CASE_SQL
    from replicator_spark.session import read_table
    from replicator_spark.sources.binlog import encode_binlog_file

    ev = (
        read_table(spark, sf_dir, "events")
        .select(
            F.expr(OP_CASE_SQL).alias("op"),
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .where(F.col("op") != "QUERY")
        .orderBy("event_id")
        .collect()
    )
    recs = [tuple(r) for r in ev]
    (tmp_path / "binlog.000001").write_bytes(
        encode_binlog_file(recs[: len(recs) // 2])
    )
    (tmp_path / "binlog.000002").write_bytes(
        encode_binlog_file(recs[len(recs) // 2 :])
    )
    cfg = {
        "source.type": "binlog_files",
        "source.binlog.path": str(tmp_path),
        "augmenter.table.merge": True,
        "applier.type": "count",
    }
    got = {
        (r["op"], r["n_events"])
        for r in run_batch(spark, None, cfg).collect()
    }
    want = {
        (r["op"], r["n_events"])
        for r in run_batch(
            spark, sf_dir, {"augmenter.table.merge": True}
        ).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="source.type"):
        run_batch(spark, sf_dir, {"source.type": "nope"})
