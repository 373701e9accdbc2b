"""Config-driven pipeline runner — the reference's user-facing API.

The reference engine is not invoked operator-by-operator: a user hands
it ONE yaml config and `Replicator.java:95-204` wires
source → augmenter (filters/gates) → partitioner → applier from the
config keys (shipped example: `config/config.yaml`). This module is
that surface for the Spark engine: the same keys select among the
already-verified operators and compose them into a single Catalyst
plan (batch) or a foreachBatch stream (same code path — streaming ==
batch by construction, as in streaming/job.py).

Key mapping (reference key → effect here):
- ``source.type`` ∈ events_parquet|binlog_files (+
  ``source.binlog.path``) → the supplier: the testdata change feed,
  or byte-level decode of real binlog v4 files (`sources/binlog.py`)
  into the same envelope (BinaryLogSupplier selection in
  Replicator.java:95-204)
- ``source.binlog.checkpoint.{gtid_set,file,pos}`` → the startup
  checkpoint override: GTID-set mode wins when non-empty, else
  file/pos (`BinaryLogSupplier.java:207-229`)
- ``augmenter.filter.include`` / ``augmenter.filter.exclude.pattern``
  → `cdc.filters.should_augment_table`
  (ActiveSchemaHelpers shouldAugmentTable)
- ``augmenter.table.merge`` → `cdc.filters.merge_table_name`
  (TableNameMergePatternFilter)
- ``augmenter.skip.query.events`` → drop op == 'QUERY'
  (shouldAugment gate, AugmenterContext)
- ``partitioner.type`` ∈ TRID|XXID|TABLE_NAME|RANDOM|NONE +
  ``replicator.tasks`` → `cdc.partitioners.repartition_for`
  (Replicator.java:179-191 destination-stream fan-out)
- ``applier.type`` ∈ count|console|kafka|timemachine →
  `sinks.{count,console,kafka,timemachine}` presentation

Scale: the composition adds NOTHING beyond its operators — filters are
map-side predicates fused into the feed scan, the partitioner is the
one explicit exchange the reference also pays (and under
``partitioner.type: NONE``-less configs Catalyst is free to elide it
into the applier's own shuffle via AQE).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc.envelope import CHANGE_FEED_SQL, change_feed
from .cdc.filters import MERGE_PATTERN, merge_table_name, should_augment_table
from .cdc.partitioners import repartition_for
from .session import prep

DEFAULT_CONFIG: dict[str, Any] = {
    # source selection (Replicator.java wires the supplier the same
    # way: one config key picks binlog vs test feed):
    # - events_parquet: the testdata change feed (envelope over the
    #   events table — the sandbox stand-in for a live binlog client)
    # - binlog_files: REAL binlog v4 files decoded at byte level
    #   (sources/binlog.py) from `source.binlog.path`, then the same
    #   envelope derivation — the production path for rotated logs
    #   landed on object storage
    "source.type": "events_parquet",
    "source.binlog.path": None,
    # startup-checkpoint override for the binlog source, mirroring
    # BinaryLogSupplier.java:207-229's selection rule: a non-empty
    # gtid_set wins (client skips every transaction inside the set);
    # otherwise a (file, pos) pair resumes strictly after it; with
    # neither, the full retained log replays
    "source.binlog.checkpoint.gtid_set": None,
    "source.binlog.checkpoint.file": None,
    "source.binlog.checkpoint.pos": 4,
    # streaming backpressure: bound each micro-batch to N rotated
    # files (None = Spark's default, all available) — a backlogged
    # 10k-file directory must not become one giant first batch
    "source.binlog.max_files_per_trigger": None,
    "augmenter.filter.include": (),
    "augmenter.filter.exclude.pattern": None,
    "augmenter.table.merge": False,
    "augmenter.skip.query.events": True,
    "partitioner.type": "TRID",
    "replicator.tasks": 8,
    "applier.type": "count",
    # write-batching: collapse each row key's mutation run to its net
    # mutation before the applier (HBaseApplier.java:166-196 keeps only
    # the latest image per key per flush — this is that optimization as
    # a config toggle; OFF by default to preserve full history sinks)
    "applier.collapse": False,
}


def _augment(feed: DataFrame, cfg: Mapping[str, Any]) -> DataFrame:
    """include/exclude gate → QUERY-event gate → table merge →
    partitioner, per (already-defaulted) config. Shared by the batch
    path and each streaming micro-batch so the two cannot drift."""
    raw_include = cfg["augmenter.filter.include"] or ()
    if isinstance(raw_include, str):
        # the natural config mistake: a single table name as a plain
        # string — tuple() would shred it into one-character "names"
        # and the whitelist would silently never match
        raw_include = (raw_include,)
    include = tuple(raw_include)
    excl = cfg["augmenter.filter.exclude.pattern"]
    if include or excl:
        feed = feed.where(
            should_augment_table(
                F.col("table_name"),
                include=include or None,
                exclude_pattern=excl,
            )
        )
    if cfg["augmenter.skip.query.events"]:
        feed = feed.where(F.col("op") != "QUERY")
    if cfg["augmenter.table.merge"]:
        feed = feed.withColumn(
            "table_name", merge_table_name(F.col("table_name"))
        )
    return repartition_for(
        feed, cfg["partitioner.type"], int(cfg["replicator.tasks"])
    )


def _source(
    spark: SparkSession, sf_dir: str, cfg: Mapping[str, Any]
) -> DataFrame:
    """The configured source as an envelope feed. A binlog-file source
    carries only row events (QUERY events have no row image), so the
    envelope's lag-derived fields (value_before, seq_in_txn,
    commit_ts_ms) are computed over row events only — the rows a real
    replica actually receives. The parquet test feed interleaves
    synthetic QUERY rows BEFORE the lag, so those fields can differ
    between the two sources for the same data; op/table routing and
    counts agree (pinned by test_runner)."""
    kind = cfg["source.type"]
    if kind == "events_parquet":
        return change_feed(spark, sf_dir)
    if kind == "binlog_files":
        from .cdc.envelope import change_feed_from
        from .sources.binlog import envelope_projection, read_binlog_files

        gtid_set = cfg["source.binlog.checkpoint.gtid_set"]
        if gtid_set:
            # GTID mode goes through the reader itself so the
            # start-file search prunes whole files from the scan
            # (PREVIOUS_GTIDS headers), not just rows post-decode
            rows = read_binlog_files(
                spark, cfg["source.binlog.path"],
                resume_gtid_set=gtid_set,
            )
        else:
            rows = _apply_checkpoint(
                read_binlog_files(spark, cfg["source.binlog.path"]), cfg
            )
        return change_feed_from(envelope_projection(rows), op_col="op")
    raise ValueError(f"unknown source.type: {kind}")


def _apply_checkpoint(rows: DataFrame, cfg: Mapping[str, Any]) -> DataFrame:
    """The reference's startup-checkpoint selection
    (`BinaryLogSupplier.java:207-229`): GTID set if stored and
    non-empty, else binlog file/pos, else replay everything. Both
    resume modes are map-side filters on the decoded rows' checkpoint
    coordinates — no shuffle, pushed toward the scan."""
    from .sources.binlog import resume_after, resume_after_gtid

    gtid_set = cfg["source.binlog.checkpoint.gtid_set"]
    if gtid_set:
        return resume_after_gtid(rows, gtid_set)
    ckpt_file = cfg["source.binlog.checkpoint.file"]
    if ckpt_file is not None:
        return resume_after(
            rows, ckpt_file, int(cfg["source.binlog.checkpoint.pos"])
        )
    return rows


def build_feed(
    spark: SparkSession, sf_dir: str, config: Mapping[str, Any]
) -> DataFrame:
    """source → augment-filters → partitioner, per config."""
    cfg = {**DEFAULT_CONFIG, **config}
    return _augment(_source(spark, sf_dir, cfg), cfg)


def apply_sink(feed: DataFrame, config: Mapping[str, Any]) -> DataFrame:
    """The applier presentation for the configured sink type."""
    cfg = {**DEFAULT_CONFIG, **config}
    kind = cfg["applier.type"]
    if cfg["applier.collapse"]:
        # write-batching: only the count applier consumes the net feed
        # — the time-machine's point is FULL version history, and the
        # kafka/console presentations carry per-event txn metadata the
        # collapse legitimately destroys (a net mutation spans txns)
        if kind != "count":
            raise ValueError(
                "applier.collapse supports only applier.type=count; "
                f"{kind} needs the uncollapsed feed"
            )
        from .cdc.apply import net_effect_from

        # net per (table, row key) — the reference batches per
        # (table, rowkey) (HBaseApplier.java:166-196), so ops on two
        # different physical tables must never collapse together;
        # with table merge ON the name is already the logical table
        collapsed = net_effect_from(
            feed.where(F.col("op").isin("INSERT", "UPDATE", "DELETE")),
            group_cols=("table_name", "user_id"),
        )
        feed = collapsed.select(F.col("net_op").alias("op"))
    if kind == "count":
        from .sinks.count import count_sink

        return count_sink(feed)
    if kind == "console":
        from .sinks.console import console_format

        return console_format(feed)
    if kind == "kafka":
        from .sinks.kafka import kafka_messages

        return kafka_messages(feed)
    if kind == "timemachine":
        # the applier chain includes the µs-timestamp organizer before
        # the cell writer (RowTimestampOrganizer → HBaseTimeMachineWriter)
        from .cdc.transactions import organized_feed_from
        from .sinks.timemachine import cells_from

        return cells_from(organized_feed_from(feed))
    raise ValueError(f"unknown applier.type: {kind}")


def run_batch(
    spark: SparkSession, sf_dir: str, config: Mapping[str, Any]
) -> DataFrame:
    prep(spark)
    return apply_sink(build_feed(spark, sf_dir, config), config)


def run_stream(
    spark: SparkSession,
    sf_dir: str,
    config: Mapping[str, Any],
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """The same composition as a foreachBatch stream: each micro-batch
    runs build_feed/apply_sink's transformation over the batch slice
    and writes an idempotent per-epoch partition (streaming/job.py's
    exactly-once argument)."""
    import os

    from .cdc.envelope import change_feed_from
    from .streaming.job import _events_stream

    prep(spark)
    cfg = {**DEFAULT_CONFIG, **config}
    kind = cfg["source.type"]
    if kind == "events_parquet":
        stream = _events_stream(spark, sf_dir)
    elif kind == "binlog_files":
        # continuous tail of a rotated-binlog directory: the
        # file-stream checkpoint is the seen-files log, so each
        # rotated file decodes exactly once across restarts; the wire
        # op rides through (envelope_projection + op_col below)
        from .sources.binlog import envelope_projection, tail_binlog_files

        stream = envelope_projection(
            _apply_checkpoint(
                tail_binlog_files(
                    spark,
                    cfg["source.binlog.path"],
                    max_files_per_trigger=cfg[
                        "source.binlog.max_files_per_trigger"
                    ],
                ),
                cfg,
            )
        )
    else:
        raise ValueError(f"unknown source.type: {kind}")

    def one_batch(batch_df: DataFrame, epoch_id: int) -> None:
        feed = _augment(
            change_feed_from(
                batch_df, op_col="op" if kind == "binlog_files" else None
            ),
            cfg,
        )
        apply_sink(feed, cfg).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------ oracle-checked demo
#
# The registered entry runs a config that exercises every stage:
# H1-2024 exclusion with a January whitelist, monthly table merge,
# QUERY-event gate, TABLE_NAME partitioner, and a per-(table, op)
# count applier (count sink keyed finer so the partitioner's routing
# column survives into the checked output).

DEMO_CONFIG: dict[str, Any] = {
    "augmenter.filter.include": ("users_202401",),
    "augmenter.filter.exclude.pattern": "users_2024(0[1-6])$",
    "augmenter.table.merge": True,
    "augmenter.skip.query.events": True,
    "partitioner.type": "TABLE_NAME",
    "replicator.tasks": 8,
    "applier.type": "count",
}


def runner_pipeline_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    feed = build_feed(spark, sf_dir, DEMO_CONFIG)
    return feed.groupBy("table_name", "op").agg(
        F.count("*").alias("n_events")
    )


RUNNER_PIPELINE_SQL = f"""
WITH feed AS ({CHANGE_FEED_SQL}),
kept AS (
    SELECT * FROM feed
    WHERE ((NOT regexp_matches(table_name, 'users_2024(0[1-6])$'))
           OR table_name IN ('users_202401'))
      AND op <> 'QUERY'
),
merged AS (
    SELECT regexp_replace(table_name, '{MERGE_PATTERN}', '')
        AS table_name, op
    FROM kept
)
SELECT table_name, op, COUNT(*) AS n_events
FROM merged GROUP BY 1, 2
"""

REGISTRY = [
    ("runner_pipeline", runner_pipeline_query, RUNNER_PIPELINE_SQL),
]
