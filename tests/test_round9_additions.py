"""Behavioral tests for the round-9 additions: Kendall tau-b,
jackknife SE, embedding isotropy, Count-Sketch heavy keys, the
bucketed interval-overlap join, DAU/WAU stickiness, HashMin connected
components, PSI drift, RAKE keywords, SAX symbols, at-least-once sink
idempotency, rejection sampling, and content-defined chunk dedup."""

from __future__ import annotations

import datetime
import math
import os


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


def _write_orders(spark, base, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(os.path.join(base, "orders.parquet"))


def _write_lineitem(spark, base, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(os.path.join(base, "lineitem.parquet"))


def _d(y, m, d):
    return datetime.datetime(y, m, d)


# --------------------------------------------------- stats_kendall_tau


def test_kendall_tau_hand_pairs(spark, tmp_path):
    """Three days with (x, y) = (1, 10), (2, 20), (3, 15): pairs
    (d1,d2) concordant, (d1,d3) concordant, (d2,d3) discordant —
    tau-b = (2-1)/3 with no ties."""
    base = str(tmp_path)
    rows = []
    ok = 0
    # day1: 1 order of 0.10; day2: 2 orders of 0.10; day3: 3 orders
    # of 0.05 -> y = cents sums 10, 20, 15
    for day, prices in [
        (1, [0.10]),
        (2, [0.10, 0.10]),
        (3, [0.05, 0.05, 0.05]),
    ]:
        for p in prices:
            ok += 1
            rows.append((ok, 1, "O", p, _d(1995, 1, day), "1-URGENT"))
    _write_orders(spark, base, rows)
    from replicator_spark.queries.stats import kendall_tau_query

    r = kendall_tau_query(spark, base).collect()[0]
    assert r["n_days"] == 3 and r["n_pairs"] == 3
    assert r["concordant"] == 2 and r["discordant"] == 1
    assert r["ties_x_only"] == 0 and r["ties_y_only"] == 0
    assert r["ties_both"] == 0
    assert abs(r["tau_b"] - (1.0 / 3.0)) < 1e-6


# --------------------------------------------------- stats_jackknife_se


def test_jackknife_two_months(spark, tmp_path):
    """Two months, one order each (100.00 and 200.00): leave-one-out
    means are 200 and 100 dollars -> theta values 2e10 and 1e10
    micro-cents, SE = sqrt(1/2 * sum((th - mean)^2)) = 5e9."""
    base = str(tmp_path)
    _write_orders(
        spark,
        base,
        [
            (1, 1, "O", 100.0, _d(1995, 1, 10), "1-URGENT"),
            (2, 1, "O", 200.0, _d(1995, 2, 10), "1-URGENT"),
        ],
    )
    from replicator_spark.queries.stats import jackknife_query

    r = jackknife_query(spark, base).collect()[0]
    assert r["n_months"] == 2 and r["n_orders"] == 2
    # overall mean = 150.00 dollars = 15000 cents = 1.5e10 micro
    assert r["theta_micro"] == 15_000_000_000
    # sum sq dev = 2 * (5e9)^2; se = sqrt((1/2) * that) = 5e9
    assert abs(r["jack_se_micro"] - 5e9) < 1.0


# --------------------------------------------------------- emb_isotropy


def test_isotropy_collinear_and_orthogonal(spark, tmp_path):
    """Two copies of e0: mean pairwise cosine = 1, resultant = 1.
    e0 and e1 (orthogonal): pairwise cosine 0, resultant 1/sqrt(2)."""
    base = str(tmp_path)
    d = 64
    e0 = [1.0] + [0.0] * (d - 1)
    e1 = [0.0, 1.0] + [0.0] * (d - 2)
    _write_embeddings(spark, base, [e0, e0])
    from replicator_spark.pipeline.vectors import isotropy_query

    r = isotropy_query(spark, base).collect()[0]
    assert r["n_vecs"] == 2 and r["n_dims"] == d
    assert r["pair_cos_nano"] == 1_000_000_000
    assert r["resultant_len_nano"] == 1_000_000_000

    base2 = os.path.join(str(tmp_path), "ortho")
    os.makedirs(base2)
    _write_embeddings(spark, base2, [e0, e1])
    r2 = isotropy_query(spark, base2).collect()[0]
    assert r2["pair_cos_nano"] == 0
    expect = math.floor(1.0 / math.sqrt(2.0) * 1e9 + 0.5)
    assert r2["resultant_len_nano"] == expect


# ----------------------------------------------- sketch_countsketch_topk


def test_countsketch_single_key_exact(spark, tmp_path):
    """With one key there are no collisions in any sketch row, so
    sign * bucket_sum recovers the exact count in every row and the
    median equals the true count."""
    base = str(tmp_path)
    t0 = datetime.datetime(2024, 1, 1)
    _write_events(
        spark,
        base,
        [
            (i, t0 + datetime.timedelta(minutes=i), 7, "click", 1.0, "{}")
            for i in range(5)
        ],
    )
    from replicator_spark.pipeline.sketches import countsketch_query

    rows = countsketch_query(spark, base).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 7 and r["rank"] == 1
    assert r["true_count"] == 5
    assert r["cs_estimate"] == 5 and r["abs_err"] == 0


def test_countsketch_testdata_ranks(spark, sf_dir):
    """On the shared fixture: 10 rows, ranks 1..10, true counts
    non-increasing, err consistent."""
    from replicator_spark.pipeline.sketches import countsketch_query

    rows = sorted(
        countsketch_query(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    cs = [r["true_count"] for r in rows]
    assert cs == sorted(cs, reverse=True)
    for r in rows:
        assert r["abs_err"] == abs(r["cs_estimate"] - r["true_count"])


# ---------------------------------------------- temporal_interval_join


def test_interval_join_spans_months(spark, tmp_path):
    """One order placed in Jan with last ship in Mar covers months
    Jan, Feb, Mar; a second order entirely inside Feb raises Feb's
    count to 2."""
    base = str(tmp_path)
    _write_orders(
        spark,
        base,
        [
            (1, 1, "O", 10.0, _d(1995, 1, 15), "1-URGENT"),
            (2, 1, "O", 20.0, _d(1995, 2, 5), "1-URGENT"),
        ],
    )
    _write_lineitem(
        spark,
        base,
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1995, 3, 20)),
            (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1995, 1, 20)),
            (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(1995, 2, 10)),
        ],
    )
    from replicator_spark.queries.temporal import interval_join_query

    rows = {
        r["mth_idx"]: r for r in interval_join_query(spark, base).collect()
    }
    jan = (1995 - 1970) * 12 + 0
    assert rows[jan]["n_open_orders"] == 1
    assert rows[jan + 1]["n_open_orders"] == 2
    assert rows[jan + 2]["n_open_orders"] == 1
    assert rows[jan + 1]["open_value_cents"] == 1000 + 2000


# --------------------------------------------------------- events_dau_mau


def test_dau_mau_stickiness(spark, tmp_path):
    """Week with users {1,2} on day0 and {1} on day1: WAU=2,
    dau_sum=3, stickiness = 3e6 // (2*2) = 750000."""
    base = str(tmp_path)
    t0 = datetime.datetime(1970, 1, 1)  # day 0 = week 0
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0, 2, "click", 1.0, "{}"),
        (3, t0, 1, "view", 1.0, "{}"),  # dup (day,user) collapses
        (4, t0 + datetime.timedelta(days=1), 1, "click", 1.0, "{}"),
    ]
    _write_events(spark, base, rows)
    from replicator_spark.queries.analytics import dau_mau_query

    r = dau_mau_query(spark, base).collect()
    assert len(r) == 1
    row = r[0]
    assert row["week"] == 0 and row["n_days"] == 2
    assert row["dau_sum"] == 3 and row["wau"] == 2
    assert row["stickiness_ppm"] == 750_000


# ------------------------------------------- graph_connected_components


def test_connected_components_two_cliques(spark, tmp_path):
    """Parts {1,2} co-occur in two orders and {3,4} in two other
    orders (support >= 2): two components of size 2, labeled by
    their min part id."""
    base = str(tmp_path)
    li = []
    ln = 0
    for okey, parts in [(1, [1, 2]), (2, [1, 2]), (3, [3, 4]), (4, [3, 4])]:
        for p in parts:
            ln += 1
            li.append(
                (okey, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 _d(1995, 1, 1))
            )
    _write_lineitem(spark, base, li)
    from replicator_spark.queries.graph import connected_components_query

    rows = {
        r["component"]: r["n_nodes"]
        for r in connected_components_query(spark, base).collect()
    }
    assert rows == {1: 2, 3: 2}


# ------------------------------------------------------------ dq_psi_drift


def test_psi_zero_for_identical_halves(spark, tmp_path):
    """Same type counts in both halves -> every contribution and the
    total are exactly 0."""
    base = str(tmp_path)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(4):  # thr splits at day 2
        for ty in ["click", "view"]:
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(days=day), 1, ty, 1.0, "{}")
            )
    _write_events(spark, base, rows)
    from replicator_spark.queries.dq import psi_drift_query

    out = psi_drift_query(spark, base).collect()
    assert len(out) == 2
    for r in out:
        assert r["c_a"] == 2 and r["c_b"] == 2
        assert r["contrib_nano"] == 0 and r["psi_total_nano"] == 0


# ------------------------------------------------------ text_rake_keywords


def test_rake_degree_over_frequency(spark, tmp_path):
    """'red apple the red': phrases [red apple], [red]. freq(red)=2,
    deg(red)=2+1=3 -> 1500 milli; freq(apple)=1, deg=2 -> 2000 milli.
    apple outranks red."""
    base = str(tmp_path)
    _write_docs(spark, base, [(1, "red apple the red", "en", "s", 17)])
    from replicator_spark.pipeline.text import rake_keywords_query

    rows = {r["word"]: r for r in rake_keywords_query(spark, base).collect()}
    assert rows["apple"]["rank"] == 1
    assert rows["apple"]["score_milli"] == 2000
    assert rows["red"]["freq"] == 2 and rows["red"]["degree"] == 3
    assert rows["red"]["score_milli"] == 1500


# -------------------------------------------------------- ts_sax_symbols


def test_sax_symbols_spike(spark, tmp_path):
    """Six days of counts [1,1,1,1,1,7] on one type, one day per
    segment: z = -0.447 ('b') for the flat days and +2.236 ('d') for
    the spike."""
    base = str(tmp_path)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(6):
        for _ in range(7 if day == 5 else 1):
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(days=day), 1, "click",
                 1.0, "{}")
            )
    _write_events(spark, base, rows)
    from replicator_spark.queries.temporal import sax_symbols_query

    rows = sorted(
        sax_symbols_query(spark, base).collect(), key=lambda r: r["seg"]
    )
    assert [r["symbol"] for r in rows] == ["b"] * 5 + ["d"]
    assert rows[-1]["z_milli"] == 2236
    assert rows[0]["z_milli"] == -447


# --------------------------------------------------- cdc_sink_idempotency


def test_sink_idempotency_on_fixture(spark, sf_dir):
    """Duplicated delivery must not change the applied state: zero
    mismatched keys, amplification within (0, 100%]."""
    from replicator_spark.cdc.apply import sink_idempotency_query

    r = sink_idempotency_query(spark, sf_dir).collect()[0]
    assert r["mismatched_keys"] == 0
    assert r["n_deliveries"] >= r["n_mutations"] > 0
    assert 0 <= r["dup_ppm"] <= 1_000_000


# ----------------------------------------------- curate_rejection_sample


def test_rejection_sample_min_bucket_kept(spark, tmp_path):
    """Buckets of size 4 (2-digit n_chars) and 1 (3-digit): the rarest
    bucket is accepted wholesale; the big bucket accepts a subset."""
    base = str(tmp_path)
    docs = [(i, "x", "en", "s", 10 + i) for i in range(4)]
    docs.append((9, "x", "en", "s", 500))
    _write_docs(spark, base, docs)
    from replicator_spark.pipeline.curation import rejection_sample_query

    rows = {
        r["bucket"]: r for r in rejection_sample_query(spark, base).collect()
    }
    assert rows[3]["n_docs"] == 1 and rows[3]["n_accepted"] == 1
    assert rows[2]["n_docs"] == 4
    assert 0 <= rows[2]["n_accepted"] <= 4


# ----------------------------------------------------- dedup_chunk_cdc


def test_chunk_cdc_identical_docs_share_chunks(spark, tmp_path):
    """Two identical documents produce identical chunk fingerprints:
    every reported duplicate chunk occurs in both docs; a third,
    unrelated doc contributes none."""
    base = str(tmp_path)
    text = " ".join(f"tok{i % 13}" for i in range(60))
    other = " ".join(f"zzz{i}" for i in range(30))
    _write_docs(
        spark,
        base,
        [
            (1, text, "en", "s", len(text)),
            (2, text, "en", "s", len(text)),
            (3, other, "en", "s", len(other)),
        ],
    )
    from replicator_spark.pipeline.dedup import chunk_cdc_query

    rows = chunk_cdc_query(spark, base).collect()
    assert rows, "identical docs must surface duplicate chunks"
    for r in rows:
        assert r["n_occurrences"] >= 2
        assert r["n_docs"] == 2
        assert r["chunk_tokens"] >= 1


# -------------------------------------------------- stats_hodges_lehmann


def test_hodges_lehmann_hand_walsh(spark, tmp_path):
    """Daily counts [1, 2, 9] for one type: Walsh sums (i<=j) are
    2,3,10,4,11,18 -> sorted 2,3,4,10,11,18; even n=6 picks ranks 3
    and 4 (4 and 10) -> HL = (4+10)/4 = 3.5 -> 3500 milli."""
    base = str(tmp_path)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 2), (2, 9)]:
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(days=day), 1, "click",
                 1.0, "{}")
            )
    _write_events(spark, base, rows)
    from replicator_spark.queries.stats import hodges_lehmann_query

    r = hodges_lehmann_query(spark, base).collect()
    assert len(r) == 1
    assert r[0]["n_pairs"] == 6
    assert r[0]["hl_milli"] == 3500


# ----------------------------------------------- emb_participation_ratio


def test_participation_ratio_extremes(spark, tmp_path):
    """Vectors spread equally over two orthogonal axes -> PR = 2;
    all mass on one axis -> PR = 1."""
    base = str(tmp_path)
    d = 64
    e0 = [1.0] + [0.0] * (d - 1)
    e1 = [0.0, 1.0] + [0.0] * (d - 2)
    # equal variance on axes 0 and 1, zero covariance
    _write_embeddings(spark, base, [e0, [-x for x in e0], e1,
                                    [-x for x in e1]])
    from replicator_spark.pipeline.vectors import (
        participation_ratio_query,
    )

    r = participation_ratio_query(spark, base).collect()[0]
    assert r["n_vecs"] == 4 and r["n_dims"] == d
    assert r["pr_milli"] == 2000

    base2 = os.path.join(str(tmp_path), "one_axis")
    os.makedirs(base2)
    _write_embeddings(spark, base2, [e0, [-x for x in e0]])
    r2 = participation_ratio_query(spark, base2).collect()[0]
    assert r2["pr_milli"] == 1000


def test_chunk_cdc_prefix_insensitivity(spark, tmp_path):
    """The CDC property: prepending tokens to a long document leaves
    most content-defined chunks intact, so the two versions still
    share duplicate fingerprints."""
    base = str(tmp_path)
    body = " ".join(f"w{i % 17}" for i in range(120))
    _write_docs(
        spark,
        base,
        [
            (1, body, "en", "s", len(body)),
            (2, "prefix added " + body, "en", "s", len(body) + 13),
        ],
    )
    from replicator_spark.pipeline.dedup import chunk_cdc_query

    rows = chunk_cdc_query(spark, base).collect()
    shared = [r for r in rows if r["n_docs"] == 2]
    assert shared, "shifted copy must still share content-defined chunks"
