"""Behavioral tests for the round-14 addition: legacy (pre-5.6.4)
packed temporal wire types — TIMESTAMP v0, TIME v0, DATETIME v0 —
through the binlog file path, and the pre-5.0 DECIMAL rejection.
Byte-layout goldens live in test_binlog_codec.py; these tests pin the
Spark-side e2e behavior of `source_binlog_legacy_temporals`."""

from __future__ import annotations

import datetime
import os


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(os.path.join(base, "events.parquet"))


def test_legacy_temporals_known_instants(spark, tmp_path):
    """Hand-picked UTC instants decode to the exact second-truncated
    epoch-µs / time-of-day / datetime strings — including a
    sub-second source timestamp (legacy storage truncates to the
    second on ENCODE, deliberately, matching what a pre-5.6.4 server
    stored)."""
    base = str(tmp_path)
    utc = datetime.timezone.utc
    _write_events(
        spark,
        base,
        [
            (1, datetime.datetime(2009, 2, 13, 23, 31, 30, tzinfo=utc),
             10, "signup", 1.0, "{}"),  # epoch 1234567890
            (2, datetime.datetime(2000, 1, 1, 0, 0, 0, 500000,
                                  tzinfo=utc),
             11, "click", 2.0, "{}"),   # sub-second: truncates
        ],
    )
    from replicator_spark.sources.binlog import (
        binlog_legacy_temporals_query,
    )

    got = {
        r["event_id"]: r
        for r in binlog_legacy_temporals_query(spark, base).collect()
    }
    assert got[1]["ts_us"] == 1234567890 * 1_000_000
    assert got[1]["tod"] == "23:31:30"
    assert got[1]["dt"] == "2009-02-13 23:31:30"
    assert got[2]["ts_us"] == 946684800 * 1_000_000  # .5s truncated
    assert got[2]["tod"] == "00:00:00"
    assert got[2]["dt"] == "2000-01-01 00:00:00"


def test_legacy_temporals_match_v2_value_shapes(spark, tmp_path):
    """The property that makes old-fleet restore work: a consumer
    cannot tell which server generation wrote the log. Encode the
    same instants through the legacy op and compare against the v2
    codecs' decode of the same components directly."""
    base = str(tmp_path)
    utc = datetime.timezone.utc
    instants = [
        datetime.datetime(2015, 6, 30, 23, 59, 59, tzinfo=utc),
        datetime.datetime(1971, 1, 1, 1, 2, 3, tzinfo=utc),
    ]
    _write_events(
        spark,
        base,
        [(i, dt, 0, "e", 0.0, "{}") for i, dt in enumerate(instants)],
    )
    from replicator_spark.sources import binlog as B

    got = {
        r["event_id"]: r
        for r in B.binlog_legacy_temporals_query(spark, base).collect()
    }
    for i, dt in enumerate(instants):
        sec = int(dt.timestamp())
        # v2 TIMESTAMP2 decode of the same instant → same epoch-µs
        v2_ts, _ = B.decode_timestamp2(
            B.encode_timestamp2(sec * 1_000_000, 0), 0, 0
        )
        assert got[i]["ts_us"] == v2_ts
        # v2 DATETIME2 fsp=0 decode → same string
        v2_dt, _ = B.decode_datetime2(
            B.encode_datetime2(dt.year, dt.month, dt.day, dt.hour,
                               dt.minute, dt.second, 0, 0), 0, 0
        )
        assert got[i]["dt"] == v2_dt
        # v2 TIME2 fsp=0 decode → same time-of-day string
        v2_tod, _ = B.decode_time2(
            B.encode_time2(dt.hour, dt.minute, dt.second, 0, 0), 0, 0
        )
        assert got[i]["tod"] == v2_tod


def test_legacy_temporals_plan_shape(spark, sf_dir):
    """Scale contract: one scan of events, no exchange — the codec
    runs map-side in the two Arrow seams (encode repartition is the
    designed round-robin spread, the only exchange allowed)."""
    from replicator_spark.sources.binlog import (
        binlog_legacy_temporals_query,
    )

    plan = (
        binlog_legacy_temporals_query(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    # the round-robin spread before the encode seam is the single
    # designed exchange; nothing downstream of the parse reshuffles
    assert plan.count("Exchange") <= 1


def test_restore_from_legacy_log_mixes_with_modern(spark, tmp_path):
    """A retained-log directory mixing a legacy-temporal table file
    and a modern typed file parses in one `read_binlog_records` pass
    (schema-on-read envelope), proving old and new logs coexist in
    the same restore run."""
    import json
    import struct

    from replicator_spark.sources import binlog as B
    from replicator_spark.sources.binlog import read_binlog_records

    lt = [B.MYSQL_TYPE_LONGLONG, B.MYSQL_TYPE_TIMESTAMP,
          B.MYSQL_TYPE_DATETIME]
    lm = [b"", b"", b""]
    w = B.BinlogWriter()
    w.gtid(B._SID, 1)
    w.query("BEGIN")
    w.table_map(41, "olddb", "t_v0", lt, lm)
    w.rows(B.WRITE_ROWS_EVENT, 41, lt, lm,
           [[7, 1_400_000_000 * 1_000_000, (2014, 5, 13, 16, 53, 20)]])
    w.xid(1)
    mt = [B.MYSQL_TYPE_LONGLONG, B.MYSQL_TYPE_VARCHAR]
    mm = [b"", struct.pack("<H", 40)]
    w.gtid(B._SID, 2)
    w.query("BEGIN")
    w.table_map(42, "newdb", "t_v2", mt, mm)
    w.rows(B.WRITE_ROWS_EVENT, 42, mt, mm, [[8, "modern"]])
    w.xid(2)
    (tmp_path / "binlog.000001").write_bytes(w.getvalue())
    recs = read_binlog_records(spark, str(tmp_path)).collect()
    by_table = {r["table_name"]: json.loads(r["record"]) for r in recs}
    assert by_table["t_v0"] == {
        "c0": 7,
        "c1": 1_400_000_000 * 1_000_000,
        "c2": "2014-05-13 16:53:20",
    }
    assert by_table["t_v2"] == {"c0": 8, "c1": "modern"}


# ---------------------------------------------------------------------
# second round-14 addition: the DDL statement stream through the wire
# (source_binlog_ddl_replay — ActiveSchemaManager on real binlog bytes)


def test_read_binlog_ddl_filters_boundaries(spark, tmp_path):
    """Only real statements surface: BEGIN/COMMIT/ROLLBACK QUERY
    events are filtered at the source; DDL rows carry their file/pos
    and GTID coordinates and the db context."""
    import replicator_spark.sources.binlog as B
    from replicator_spark.sources.binlog import read_binlog_ddl

    logs = tmp_path / "logs"
    logs.mkdir()
    w = B.BinlogWriter()
    w.gtid(B._SID, 1)
    w.query("BEGIN")
    w.table_map(9, "testdb", "events", [B.MYSQL_TYPE_LONG], [b""])
    w.rows(B.WRITE_ROWS_EVENT, 9, [B.MYSQL_TYPE_LONG], [b""], [[7]])
    w.xid(1)
    w.gtid(B._SID, 2)
    w.query("CREATE TABLE t1 (a int)", db="shop")
    w.gtid(B._SID, 3)
    w.query("begin")  # case-insensitive boundary
    w.query("ALTER TABLE t1 ADD COLUMN b int", db="shop")
    w.query("COMMIT")
    (logs / "binlog.000001").write_bytes(w.getvalue())
    got = sorted(
        read_binlog_ddl(spark, str(logs)).collect(),
        key=lambda r: r["log_pos"],
    )
    assert [r["sql"] for r in got] == [
        "CREATE TABLE t1 (a int)",
        "ALTER TABLE t1 ADD COLUMN b int",
    ]
    assert all(r["db"] == "shop" for r in got)
    assert [r["gtid_seq"] for r in got] == [2, 3]
    assert all(r["source_file"] == "binlog.000001" for r in got)
    assert got[0]["log_pos"] > 0


def test_binlog_ddl_replay_gtid_order_across_files(spark, tmp_path):
    """Statements land in rotated files; replay follows GTID order —
    the registry's effects (CREATE then ALTERs) apply exactly as on
    the server, whatever the file layout."""
    import replicator_spark.sources.binlog as B
    from replicator_spark.sources.binlog import read_binlog_ddl
    from replicator_spark.streaming.registry import SchemaRegistry

    logs = tmp_path / "logs"
    logs.mkdir()
    w1 = B.BinlogWriter()
    w1.gtid(B._SID, 1)
    w1.query("CREATE TABLE t (user_id bigint, value double)")
    w1.gtid(B._SID, 2)
    w1.query("ALTER TABLE t ADD COLUMN c1 int")
    (logs / "binlog.000001").write_bytes(w1.getvalue())
    w2 = B.BinlogWriter()
    w2.gtid(B._SID, 3)
    w2.query("ALTER TABLE t ADD COLUMN c2 int")
    w2.gtid(B._SID, 4)
    w2.query("ALTER TABLE t DROP COLUMN c1")
    (logs / "binlog.000002").write_bytes(w2.getvalue())
    ddls = sorted(
        (r["gtid_seq"], r["sql"])
        for r in read_binlog_ddl(spark, str(logs)).collect()
    )
    reg = SchemaRegistry()
    for _, sql in ddls:
        reg.apply_ddl(sql)
    assert reg.n_columns("t") == 3  # user_id, value, c2
    assert [h["kind"] for h in reg.history] == [
        "CREATE_TABLE", "ALTER_TABLE", "ALTER_TABLE", "ALTER_TABLE",
    ]


def test_binlog_ddl_replay_equals_nonwire_twin(spark, sf_dir):
    """The registered op's wire roundtrip changes nothing: its
    history equals schema_history_query's (same derivation, no wire)
    row for row."""
    from replicator_spark.sources.binlog import binlog_ddl_replay_query
    from replicator_spark.streaming.registry import schema_history_query

    got = sorted(
        tuple(r) for r in binlog_ddl_replay_query(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in schema_history_query(spark, sf_dir).collect()
    )
    assert got == want
    assert len(got) > 0


def test_read_binlog_ddl_through_payload_envelope(spark, tmp_path):
    """8.0.20+ binlog_transaction_compression envelopes DDL
    transactions too — the statement must surface identically from
    inside a TRANSACTION_PAYLOAD envelope."""
    import replicator_spark.sources.binlog as B
    from replicator_spark.sources.binlog import read_binlog_ddl

    logs = tmp_path / "logs"
    logs.mkdir()
    w = B.BinlogWriter()
    w.gtid(B._SID, 1)
    t = w.payload_writer()
    t.query("CREATE TABLE env_t (a int)", db="shop")
    w.transaction_payload(t)
    w.gtid(B._SID, 2)
    w.query("ALTER TABLE env_t ADD COLUMN b int", db="shop")  # plain
    (logs / "binlog.000001").write_bytes(w.getvalue())
    got = sorted(
        (r["gtid_seq"], r["sql"], r["db"])
        for r in read_binlog_ddl(spark, str(logs)).collect()
    )
    assert got == [
        (1, "CREATE TABLE env_t (a int)", "shop"),
        (2, "ALTER TABLE env_t ADD COLUMN b int", "shop"),
    ]
