"""Config-driven pipeline wiring — the Replicator.java analog.

Reference (Replicator.java:151-204, main :384-450): a YAML config
(flattened to dotted keys) selects the applier (`applier.type` ∈
hbase|kafka|console|count, Applier.java:25-52), the partitioner
(`replicator.partitioner.type` ∈ TRID|XXID|TABLE_NAME|RANDOM|NONE,
Partitioner.java:15-88), the augmenter filter
(`augmenter.filter.type`, AugmenterFilter.java:12-29), and the
include/exclude table lists (AugmenterContext.java:61-63); the
pipeline is then fixed at construction.

Spark-first: the same dotted-key config chooses among the DataFrame
stages of this package; the "pipeline" is a composed DataFrame →
DataFrame function for batch and the matching foreachBatch body for
streaming. Strategy objects are plain functions — no reflection, no
class registry.

Example::

    cfg = {
        "augmenter.filter.type": "TABLE_MERGE",
        "augmenter.tables.include": ["users"],
        "replicator.partitioner.type": "TRID",
        "replicator.partitions": 8,
        "applier.type": "count",
    }
    out_df = build_pipeline(cfg)(change_feed(spark, sf_dir))
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc.partitioners import repartition_for
from .sinks.count import count_sink

Stage = Callable[[DataFrame], DataFrame]


def _filter_stage(cfg: dict) -> Stage:
    kind = cfg.get("augmenter.filter.type", "NONE").upper()
    include = cfg.get("augmenter.tables.include")
    exclude_re = cfg.get("augmenter.tables.exclude.pattern")

    def stage(feed: DataFrame) -> DataFrame:
        out = feed
        if kind == "TABLE_MERGE":
            from .cdc.filters import merge_table_name

            out = out.withColumn(
                "table_name", merge_table_name(F.col("table_name"))
            )
        if include:
            # include list overrides the exclude pattern
            # (AugmenterContext.shouldAugmentTable:711-730)
            out = out.where(F.col("table_name").isin(list(include)))
        elif exclude_re:
            out = out.where(~F.col("table_name").rlike(exclude_re))
        return out

    return stage


def _partition_stage(cfg: dict) -> Stage:
    strategy = cfg.get("replicator.partitioner.type", "TRID").upper()
    n = int(cfg.get("replicator.partitions", 8))
    return lambda feed: repartition_for(feed, strategy, n)


def _applier_stage(cfg: dict) -> Stage:
    kind = cfg.get("applier.type", "console").lower()
    if kind == "count":
        return count_sink
    if kind == "console":
        from .sinks.console import console_format

        return console_format
    if kind == "kafka":
        from .sinks.kafka import kafka_messages

        return kafka_messages
    if kind in ("hbase", "timemachine"):
        from .cdc.transactions import organized_feed_from
        from .sinks.timemachine import cells_from

        return lambda feed: cells_from(organized_feed_from(feed))
    raise ValueError(f"unknown applier.type: {kind}")


def build_pipeline(cfg: dict[str, Any]) -> Stage:
    """Compose filter → partition → applier per the dotted-key config;
    returns a DataFrame→DataFrame function usable directly on a batch
    feed or inside a streaming foreachBatch."""
    stages = [_filter_stage(cfg), _partition_stage(cfg), _applier_stage(cfg)]

    def pipeline(feed: DataFrame) -> DataFrame:
        out = feed
        for s in stages:
            out = s(out)
        return out

    return pipeline
