"""Behavioral tests for the round-8 session-3 additions: Kneser-Ney
bigram smoothing, Chao1 vocabulary richness, reciprocal-rank fusion,
and the bitemporal as-of read."""

from __future__ import annotations

import datetime
import os

from replicator_spark.utils import round_half_away


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(os.path.join(base, "events.parquet"))


def _write_embeddings(spark, base, vecs):
    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(os.path.join(base, "embeddings.parquet"))


# --------------------------------------------------- text_kneser_ney


def test_kneser_ney_hand_counts(spark, tmp_path):
    """Two tiny docs with known bigram statistics: every count column
    and the KN probability must match the hand-evaluated formula."""
    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [
            (1, "a b a b", "en", "s1", 7),
            (2, "a c", "en", "s1", 3),
        ],
    )
    from replicator_spark.pipeline.lm import kneser_ney_query

    rows = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_query(spark, base).collect()
    }
    # bigrams: (a,b) x2, (b,a) x1, (a,c) x1
    assert set(rows) == {("a", "b"), ("b", "a"), ("a", "c")}
    ab = rows[("a", "b")]
    assert ab["rank"] == 1
    assert ab["c_bi"] == 2
    assert ab["c_w1"] == 3  # 'a' starts 3 bigrams
    assert ab["n_follow"] == 2  # a->b, a->c
    assert ab["n_precede"] == 1  # only a->b precedes b
    # P_KN = (2-0.75)/3 + 0.75*(2/3)*(1/3)
    expected = (2 - 0.75) / 3.0 + 0.75 * 2.0 / 3.0 * (1.0 / 3.0)
    assert abs(ab["kn_prob"] - round_half_away(expected, 6)) < 1e-12
    ba = rows[("b", "a")]
    assert ba["c_w1"] == 1 and ba["n_follow"] == 1
    exp_ba = (1 - 0.75) / 1.0 + 0.75 * 1.0 / 1.0 * (1.0 / 3.0)
    assert abs(ba["kn_prob"] - round_half_away(exp_ba, 6)) < 1e-12


def test_kneser_ney_conditional_sums_to_one(spark, tmp_path):
    """Interpolated KN is a proper distribution: summed over every
    OBSERVED continuation of w1 plus the backoff mass it reserves,
    the observed-bigram probabilities total less than 1, and the
    discount mass equals d * n_follow / c_w1."""
    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [(1, "a b a c a b a d", "en", "s1", 15)],
    )
    from replicator_spark.pipeline.lm import kneser_ney_query

    rows = [
        r
        for r in kneser_ney_query(spark, base).collect()
        if r["w1"] == "a"
    ]
    # a -> {b:2, c:1, d:1}; continuation distribution over w2 is
    # uniform (each w2 has exactly one left context), so the summed
    # P_KN over observed continuations is (c_w1 - 3d)/c_w1
    # + 3 * d*3/c_w1 * (1/n_types) with n_types = bigram types.
    total = sum(r["kn_prob"] for r in rows)
    assert 0.0 < total <= 1.0 + 1e-9


# ---------------------------------------------- corpus_chao1_richness


def test_chao1_hand_values(spark, tmp_path):
    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [
            (1, "x x y z", "en", "A", 7),
            (2, "p q r", "en", "B", 5),
        ],
    )
    from replicator_spark.pipeline.corpus import chao1_richness_query

    rows = {
        r["source"]: r
        for r in chao1_richness_query(spark, base).collect()
    }
    a = rows["A"]  # x:2 y:1 z:1 -> s=3, f1=2, f2=1, n=4
    assert (a["s_obs"], a["f1"], a["f2"], a["n_tokens"]) == (3, 2, 1, 4)
    assert abs(a["chao1_est"] - (3 + 2 * 1 / (2 * 2))) < 1e-9
    assert abs(a["coverage"] - 0.5) < 1e-9
    b = rows["B"]  # all singletons -> s=3, f1=3, f2=0
    assert (b["s_obs"], b["f1"], b["f2"], b["n_tokens"]) == (3, 3, 0, 3)
    # bias-corrected form stays finite with f2 = 0: 3 + 3*2/2 = 6
    assert abs(b["chao1_est"] - 6.0) < 1e-9
    assert abs(b["coverage"] - 0.0) < 1e-9


# -------------------------------------------------- sim_rrf_fusion


def _toy_vecs(n):
    return [
        [((i * 7 + j * 3) % 13) / 13.0 for j in range(64)]
        for i in range(n)
    ]


def test_rrf_matches_python_recompute(spark, tmp_path):
    """Channel ranks and fused order must equal a plain-Python
    recomputation with the same sequential-fold dot product and the
    same tie-breaks."""
    base = str(tmp_path)
    vecs = _toy_vecs(12)
    _write_embeddings(spark, base, vecs)
    from replicator_spark.pipeline.similarity import (
        N_QUERIES,
        RRF_K,
        RRF_PREFIX_DIM,
        RRF_TOP_K,
        rrf_fusion_query,
    )

    out = rrf_fusion_query(spark, base).collect()
    # float32 storage: recompute from the float32-rounded values
    import struct

    f32 = [
        [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for v in vecs
    ]

    def dot(a, b, d=64):
        acc = 0.0
        for x, y in zip(a[:d], b[:d]):
            acc += x * y
        return acc

    def cos(a, b, d=64):
        import math

        return round_half_away(
            dot(a, b, d) / (math.sqrt(dot(a, a, d)) * math.sqrt(dot(b, b, d))),
            6,
        )

    for q in range(N_QUERIES):
        cands = [c for c in range(12) if c != q]
        r_full = {
            c: r + 1
            for r, c in enumerate(
                sorted(cands, key=lambda c: (-cos(f32[q], f32[c]), c))
            )
        }
        r_pre = {
            c: r + 1
            for r, c in enumerate(
                sorted(
                    cands,
                    key=lambda c: (
                        -cos(f32[q], f32[c], RRF_PREFIX_DIM),
                        c,
                    ),
                )
            )
        }
        rrf = {
            c: 1.0 / (RRF_K + r_full[c]) + 1.0 / (RRF_K + r_pre[c])
            for c in cands
        }
        expect = sorted(cands, key=lambda c: (-rrf[c], c))[:RRF_TOP_K]
        got = sorted(
            (r for r in out if r["query_id"] == q),
            key=lambda r: r["fused_rank"],
        )
        assert [r["cand_id"] for r in got] == expect
        for r in got:
            assert r["r_full"] == r_full[r["cand_id"]]
            assert r["r_prefix"] == r_pre[r["cand_id"]]
            assert abs(
                r["rrf_score"]
                - round_half_away(rrf[r["cand_id"]], 9)
            ) < 1e-12


# ------------------------------------------------ tm_bitemporal_asof

_JAN8_CUT = datetime.datetime(2024, 1, 8)


def test_bitemporal_strict_misses_late_delete(spark, tmp_path):
    """A DELETE that happens 30 minutes before the Jan-8 cutoff but
    arrives 6 simulated hours late (event_id % 7 == 6) is invisible
    to the strict read and visible to the settled read."""
    base = str(tmp_path)
    _write_events(
        spark,
        base,
        [
            # event_id 7 -> lag 0h: on-time INSERT on Jan 2
            (7, datetime.datetime(2024, 1, 2, 12), 1, "signup", 1.0, "{}"),
            # event_id 13 -> lag 6h: DELETE at Jan 7 23:30, arrives
            # Jan 8 05:30 — after the Jan-8 00:00 cutoff
            (13, datetime.datetime(2024, 1, 7, 23, 30), 1, "error", 0.0,
             "{}"),
        ],
    )
    from replicator_spark.sinks.timemachine import bitemporal_asof_query

    rows = {
        (r["valid_cut_us"], r["txn_mode"]): r
        for r in bitemporal_asof_query(spark, base).collect()
    }
    jan8 = 1_704_672_000_000_000
    strict = rows[(jan8, "strict")]
    settled = rows[(jan8, "settled")]
    assert strict["n_rows_seen"] == 1 and settled["n_rows_seen"] == 1
    assert strict["n_alive"] == 1 and strict["n_deleted"] == 0
    assert settled["n_alive"] == 0 and settled["n_deleted"] == 1
    # by the next cutoff the late delete has long arrived: both agree
    jan15 = 1_705_276_800_000_000
    assert rows[(jan15, "strict")]["n_deleted"] == 1
    assert rows[(jan15, "settled")]["n_deleted"] == 1


def test_bitemporal_settled_equals_timetravel(spark, tmp_path):
    """The settled read waits out the maximum simulated lag, so its
    counts must equal the single-axis timetravel sweep at every
    cutoff (arrival <= V + max_lag is implied by version <= V)."""
    base = str(tmp_path)
    rows = []
    eid = 0
    for u in range(5):
        for d in range(0, 40, 3):
            ts = datetime.datetime(2024, 1, 2) + datetime.timedelta(
                days=d, hours=u
            )
            kind = ["signup", "click", "purchase", "error"][eid % 4]
            rows.append((eid, ts, u, kind, float(u), "{}"))
            eid += 1
    _write_events(spark, base, rows)
    from replicator_spark.sinks.timemachine import (
        bitemporal_asof_query,
        timetravel_counts_query,
    )

    bt = {
        (r["valid_cut_us"], r["table_name"]): r
        for r in bitemporal_asof_query(spark, base).collect()
        if r["txn_mode"] == "settled"
    }
    tt = {
        (r["cutoff_us"], r["table_name"]): r
        for r in timetravel_counts_query(spark, base).collect()
    }
    assert set(bt) == set(tt)
    for k, b in bt.items():
        t = tt[k]
        assert (b["n_rows_seen"], b["n_alive"], b["n_deleted"]) == (
            t["n_rows_seen"], t["n_alive"], t["n_deleted"]
        )


# ---------------------------------------------- sketch_bloom_filter
# The round-8 rewrite moved the Bloom bit set across the engine
# boundary: positions are computed and nibble-packed in PYTHON, then
# probed by a Spark-SQL bit-test expression over the hex-mask
# literal. This pins the two sides to each other for arbitrary keys
# (the oracle pins them to DuckDB only on the sf fixture's key
# range).


def test_bloom_mask_python_pack_matches_sql_probe(spark):
    from pyspark.sql import functions as F

    from replicator_spark.pipeline.sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_pack_mask,
        bloom_pos_py,
        bloom_probe_expr,
    )

    # adversarial key mix: small, huge, negative, boundary values
    keys = (
        list(range(50))
        + [2**31 - 1, 2**31, 2**63 - 1, -1, -2**31, 999_999_937]
        + [7**i % (2**40) for i in range(1, 30)]
    )
    members = keys[::3]
    bits = sorted(
        {bloom_pos_py(k, i) for k in members for i in range(BLOOM_K)}
    )
    assert all(0 <= p < BLOOM_M for p in bits)
    mask = bloom_pack_mask(bits)
    assert len(mask) == BLOOM_M // 4

    df = spark.createDataFrame(
        [(k,) for k in keys], "k long"
    ).select("k", bloom_probe_expr(mask).alias("nset"))
    got = {r["k"]: r["nset"] for r in df.collect()}

    member_set = set(members)
    for k in keys:
        expected = sum(
            1
            for i in range(BLOOM_K)
            if (int(mask[bloom_pos_py(k, i) // 4], 16)
                >> (bloom_pos_py(k, i) % 4)) & 1
        )
        assert got[k] == expected, (k, got[k], expected)
        if k in member_set:  # no false negatives, by construction
            assert got[k] == BLOOM_K
