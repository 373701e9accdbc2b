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
