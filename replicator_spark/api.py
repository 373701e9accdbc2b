"""Operator registry: every implemented operator from SURVEY.md §2 as a
(queries entry, oracle SQL) pair. `__spark_entry__.py` re-exports these
for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, sql: Optional[str] = None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True

    from .cdc import (
        checkpoint,
        classify,
        decode,
        diff,
        envelope,
        filters,
        partitioners,
        rowkey,
        seeker,
        transactions,
        validation,
    )
    from .sinks import timemachine

    # --- CDC core (SURVEY §2.3-2.9) ---
    register(
        "cdc_change_feed", envelope.change_feed_query, envelope.CHANGE_FEED_SQL
    )
    register(
        "cdc_classify_ops", classify.classify_ops_query,
        classify.CLASSIFY_OPS_SQL,
    )
    register(
        "cdc_query_classifier", classify.query_classifier_query,
        classify.QUERY_CLASSIFIER_SQL,
    )
    register(
        "cdc_table_merge", filters.table_merge_query, filters.TABLE_MERGE_SQL
    )
    register(
        "cdc_include_exclude", filters.include_exclude_query,
        filters.INCLUDE_EXCLUDE_SQL,
    )
    register("cdc_rowkey_salt", rowkey.rowkey_query, rowkey.ROWKEY_SQL)
    register(
        "cdc_txn_group", transactions.txn_group_query,
        transactions.TXN_GROUP_SQL,
    )
    register(
        "cdc_txn_seq", transactions.txn_seq_query, transactions.TXN_SEQ_SQL
    )
    register(
        "cdc_micro_organizer", transactions.organize_versions,
        transactions.MICRO_ORGANIZER_SQL,
    )
    register(
        "cdc_changed_cols", diff.changed_cols_query, diff.CHANGED_COLS_SQL
    )
    register(
        "cdc_partitioners", partitioners.partitioners_query,
        partitioners.PARTITIONERS_SQL,
    )
    register(
        "cdc_safe_watermark", checkpoint.watermark_query,
        checkpoint.WATERMARK_SQL,
    )
    register(
        "cdc_type_decode", decode.type_decode_query, decode.TYPE_DECODE_SQL
    )
    register(
        "cdc_payload_rowkey", rowkey.payload_rowkey_query,
        rowkey.PAYLOAD_ROWKEY_SQL,
    )
    for name, fn, sql in seeker.REGISTRY + validation.REGISTRY:
        register(name, fn, sql)

    try:
        from .sources import bootstrap

        for name, fn, sql in bootstrap.REGISTRY:
            register(name, fn, sql)
    except ImportError:
        pass

    # --- Time-machine sink + read path (SURVEY §2.8, §1.4) ---
    register(
        "tm_cells", timemachine.timemachine_cells,
        timemachine.TIMEMACHINE_CELLS_SQL,
    )
    register(
        "tm_asof_snapshot", timemachine.asof_snapshot_query,
        timemachine.ASOF_SNAPSHOT_SQL,
    )
    register(
        "tm_row_history", timemachine.row_history_query,
        timemachine.ROW_HISTORY_SQL,
    )
    register(
        "tm_compaction", timemachine.compaction_query,
        timemachine.COMPACTION_SQL,
    )

    # --- Batch query surface (TPC-H-style DataFrame layer) ---
    try:
        from .queries import temporal, tpch, tpch_ext

        for name, fn, sql in (
            tpch.REGISTRY + tpch_ext.REGISTRY + temporal.REGISTRY
        ):
            register(name, fn, sql)
    except ImportError:
        pass

    # --- Training-data pipeline ops ---
    try:
        from .pipeline import (
            curation,
            dedup,
            sessions,
            similarity,
            sketches,
            text,
        )

        for mod in (curation, dedup, sessions, similarity, sketches, text):
            for name, fn, sql in mod.REGISTRY:
                register(name, fn, sql)
    except ImportError:
        pass

    try:
        from .sinks import avro as avro_sink_mod
        from .sinks import console as console_sink_mod
        from .sinks import count as count_sink_mod
        from .sinks import kafka as kafka_sink_mod

        for mod in (
            count_sink_mod, console_sink_mod, kafka_sink_mod, avro_sink_mod
        ):
            for name, fn, sql in mod.REGISTRY:
                register(name, fn, sql)
    except ImportError:
        pass

    try:
        from .streaming import job as streaming_job
        from .streaming import registry as schema_registry
        from .streaming import txn_state

        for name, fn, sql in (
            streaming_job.REGISTRY
            + schema_registry.REGISTRY
            + txn_state.REGISTRY
        ):
            register(name, fn, sql)
    except ImportError:
        pass

    try:
        from .pipeline import multimodal

        for name, fn, sql in multimodal.REGISTRY:
            register(name, fn, sql)
    except ImportError:
        pass
