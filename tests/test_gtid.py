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


# ---------------------------------------------------------------------------
# Property tests (round-10 verdict item #4): randomized multi-server
# interleavings — gaps at head/middle/tail, out-of-order acks, variable
# range widths, single-range collapse — against a pure-Python model of
# the reference scan (GtidSetAlgebra.java:136-175 generalized to range
# unions): the safe watermark is the end of the FIRST gap-free island
# scanning up from the minimal acked transaction.
# ---------------------------------------------------------------------------

import random


def _model(ranges):
    """Reference model: sorted scan, stop at the first hole."""
    rs = sorted(ranges)
    start0, end, n = rs[0][0], rs[0][1], 1
    for s, e in rs[1:]:
        if s > end + 1:
            break
        end = max(end, e)
        n += 1
    return {"start": start0, "safe": end, "n": n}


def _random_case(seed):
    """One multi-server interleaving: per server, a chain of adjacent
    variable-width ranges with a random subset DROPPED (un-acked), the
    survivors shuffled (out-of-order ack arrival)."""
    rng = random.Random(seed)
    frags, expect = [], {}
    for srv in ["A", "B", "C"][: rng.randint(1, 3)]:
        pos, chain = rng.randint(0, 5), []
        for _ in range(rng.randint(1, 12)):
            w = rng.randint(1, 5)
            chain.append((pos, pos + w - 1))
            pos += w
        # drop a random subset — but never ALL of them
        keep = [r for r in chain if rng.random() > 0.3]
        if not keep:
            keep = [chain[0]]
        rng.shuffle(keep)  # out-of-order acks
        frags += [f"{srv}:{s}-{e}" for s, e in keep]
        expect[srv] = _model(keep)
    return frags, expect


def test_random_interleavings_match_reference_model(spark):
    for seed in range(10):
        frags, expect = _random_case(seed)
        out = _safe(spark, frags)
        assert set(out) == set(expect), (seed, frags)
        for srv, want in expect.items():
            got = out[srv]
            assert got["safe_checkpoint"] == want["safe"], (seed, srv, frags)
            assert got["n_safe_ranges"] == want["n"], (seed, srv, frags)
            assert (
                got["safe_gtid_set"]
                == f"{srv}:{want['start']}-{want['safe']}"
            ), (seed, srv, frags)


def test_head_gap_island_starts_at_minimal_acked(spark):
    # head gap: 0-4 never acked; the scan starts from the MINIMAL acked
    # transaction (5), exactly like the reference's
    # getMaxUninteruptedRangeStartingFromMinimalTransaction
    out = _safe(spark, ["A:10-14", "A:5-9", "A:20-24"])
    assert out["A"]["safe_checkpoint"] == 14
    assert out["A"]["safe_gtid_set"] == "A:5-14"


def test_tail_gap_is_irrelevant(spark):
    # a trailing un-acked checkpoint can't hold back anything below it
    out = _safe(spark, ["A:0-9", "A:10-19"])
    assert out["A"]["safe_checkpoint"] == 19
    assert out["A"]["n_safe_ranges"] == 2


def test_single_range_collapse(spark):
    out = _safe(spark, ["A:7-7"])
    assert out["A"]["safe_checkpoint"] == 7
    assert out["A"]["n_safe_ranges"] == 1
    assert out["A"]["safe_gtid_set"] == "A:7-7"


def test_overlapping_and_contained_ranges_are_not_holes(spark):
    """Duplicate/retried acks carry overlapping or contained ranges
    (a cumulative set re-sent): the gap scan must use the running MAX
    of prior ends — lag(r_end) alone saw 1-10, 2-3, 11-12 as a hole
    at 11 (> 3+1) and under-reported the safe watermark as 10."""
    out = _safe(spark, ["A:1-10", "A:2-3", "A:11-12"])
    assert out["A"]["safe_checkpoint"] == 12
    assert out["A"]["safe_gtid_set"] == "A:1-12"
    # exact duplicate ranges likewise
    out2 = _safe(spark, ["B:1-5", "B:1-5", "B:6-7"])
    assert out2["B"]["safe_checkpoint"] == 7
    # a REAL hole past an overlap still stops the scan
    out3 = _safe(spark, ["C:1-10", "C:2-3", "C:12-13"])
    assert out3["C"]["safe_checkpoint"] == 10


def test_single_transaction_fragment_form(spark):
    """A bare single-transaction ack ("uuid:7") is the interval 7-7 —
    the same grammar parse_gtid_set accepts — and composes with ranged
    fragments in the island scan instead of corrupting it."""
    got = _safe(spark, [
        "a:1-3", "a:4", "a:5-6",   # contiguous via the bare 4
        "a:8",                     # past the hole at 7
        "b:1",                     # a lone single-txn server
    ])
    assert got["a"]["safe_checkpoint"] == 6
    assert got["a"]["safe_gtid_set"] == "a:1-6"
    assert got["b"]["safe_checkpoint"] == 1
    assert got["b"]["safe_gtid_set"] == "b:1-1"
