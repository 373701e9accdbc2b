"""GTID-set gap-scan algebra (GtidSetAlgebra.java:107-175): the safe
watermark must stop at a hole left by an un-acked interleaved
checkpoint — the test the reference lacks (SURVEY §5).
"""

from __future__ import annotations


def _safe(spark, frags):
    from replicator_spark.cdc.checkpoint import gtid_safe_set

    df = spark.createDataFrame([(g,) for g in frags], ["gtid"])
    return {
        r["server_uuid"]: r.asDict() for r in gtid_safe_set(df).collect()
    }


def test_watermark_stops_at_hole(spark):
    # acked: 0-2, 3-5, then a hole (6-8 never acked), then 9-11
    out = _safe(spark, ["A:0-2", "A:3-5", "A:9-11"])
    assert out["A"]["safe_checkpoint"] == 5
    assert out["A"]["n_safe_ranges"] == 2
    assert out["A"]["safe_gtid_set"] == "A:0-5"


def test_out_of_order_acks_do_not_advance_past_hole(spark):
    # acks arrive out of order; 20-29 acked BEFORE 10-19 ever is.
    # Watermark must stall at 9 until the 10-19 ack lands.
    out = _safe(spark, ["A:20-29", "A:0-9"])
    assert out["A"]["safe_checkpoint"] == 9
    # ... and advance once the missing ack arrives
    out = _safe(spark, ["A:20-29", "A:0-9", "A:10-19"])
    assert out["A"]["safe_checkpoint"] == 29
    assert out["A"]["safe_gtid_set"] == "A:0-29"


def test_per_server_independence(spark):
    out = _safe(spark, ["A:0-4", "A:5-9", "B:0-1", "B:4-5"])
    assert out["A"]["safe_checkpoint"] == 9
    assert out["B"]["safe_checkpoint"] == 1  # hole at 2-3 stalls B only


def test_single_transaction_ranges_match_reference_scan(spark):
    # the reference's exact case: "n-n" checkpoints, consecutive upper
    # limits advance the scan, a skipped one stops it
    frags = [f"A:{i}-{i}" for i in (0, 1, 2, 4, 5)]
    out = _safe(spark, frags)
    assert out["A"]["safe_checkpoint"] == 2
    assert out["A"]["n_safe_ranges"] == 3
