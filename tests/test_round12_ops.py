"""Behavioral tests for the round-8 additions: Holt forecasting,
Kaplan-Meier survival, power-law degree fit, n-gram novelty,
temperature mixing, template-prefix dedup, and cell lifetimes."""

from __future__ import annotations

import datetime
import math
import os


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(os.path.join(base, "events.parquet"))


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))


def _day(d, sec=0):
    return datetime.datetime(2024, 1, 1 + d, 0, 0, sec)


# ------------------------------------------------- ts_holt_winters


def test_holt_constant_series_flat_forecast(spark, tmp_path):
    """Constant daily volume: level stays at the constant, trend
    stays 0, every h-step forecast equals the constant."""
    rows = []
    eid = 0
    for d in range(6):
        for _ in range(4):
            rows.append((eid, _day(d, eid % 60), 1, "click", 1.0, "{}"))
            eid += 1
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.temporal import holt_winters_query

    out = holt_winters_query(spark, base).collect()
    assert len(out) == 7  # one type x 7 horizons
    for r in out:
        assert r["n_days"] == 6
        assert abs(r["level"] - 4.0) < 1e-9
        assert abs(r["trend"]) < 1e-9
        assert abs(r["forecast"] - 4.0) < 1e-9


def test_holt_matches_python_fold(spark, tmp_path):
    """Ramp series: the Spark fold must equal the plain Python left
    fold of the same expanded linear recurrence, bit for bit."""
    counts = [2, 4, 6, 8, 10, 12, 14]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, _day(d, eid % 60), 1, "view", 1.0, "{}"))
            eid += 1
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.temporal import holt_winters_query

    level, trend = float(counts[0]), 0.0
    for x in counts[1:]:
        nl = 0.5 * x + 0.5 * level + 0.5 * trend
        nb = 0.125 * x - 0.125 * level + 0.875 * trend
        level, trend = nl, nb
    out = {r["h"]: r for r in holt_winters_query(spark, base).collect()}
    assert trend > 0.5  # the ramp is detected
    for h in range(1, 8):
        exp = round(level + h * trend, 6)
        assert abs(out[h]["forecast"] - exp) < 1e-9


# ---------------------------------------------- events_survival_km


def test_survival_km_hand_computed(spark, tmp_path):
    """Gaps [1, 1, 2]: S(1) = 1 - 2/3 = 1/3; t=2 is terminal
    (n == d) so its log-survival is NULL."""
    rows = [
        (0, _day(0), 1, "click", 1.0, "{}"),
        (1, _day(1), 1, "click", 1.0, "{}"),  # user1 gap 1
        (2, _day(0), 2, "click", 1.0, "{}"),
        (3, _day(1), 2, "click", 1.0, "{}"),  # user2 gap 1
        (4, _day(0), 3, "click", 1.0, "{}"),
        (5, _day(2), 3, "click", 1.0, "{}"),  # user3 gap 2
    ]
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.temporal import survival_km_query

    out = {r["t"]: r for r in survival_km_query(spark, base).collect()}
    assert set(out) == {1, 2}
    assert out[1]["d"] == 2 and out[1]["n_at_risk"] == 3
    assert out[2]["d"] == 1 and out[2]["n_at_risk"] == 1
    exp = round(round(math.log(1.0 / 3.0), 9), 6)
    assert abs(out[1]["km_log_surv"] - exp) < 1e-9
    assert out[2]["km_log_surv"] is None


# -------------------------------------------- graph_degree_powerlaw


def test_powerlaw_hand_computed(spark, tmp_path):
    """c1-{s1,s2,s3}, c2-{s1}: degrees c1=3, s1=2, rest 1. Tail at
    xmin=2 is {c1, s1}: alpha = 1 + 2/(ln(2) + ln(4/3))."""
    base = str(tmp_path)
    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)],
        "o_orderkey long, o_custkey long",
    ).write.parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, 100)],
        "l_orderkey long, l_suppkey long",
    ).write.parquet(os.path.join(base, "lineitem.parquet"))
    from replicator_spark.queries.graph import degree_powerlaw_query

    r = degree_powerlaw_query(spark, base).collect()[0]
    assert r["n_nodes"] == 5
    assert r["max_deg"] == 3
    assert r["n_tail"] == 2
    s = round(math.log(3 / 1.5), 9) + round(math.log(2 / 1.5), 9)
    assert abs(r["alpha"] - round(1.0 + 2.0 / s, 6)) < 1e-9


# -------------------------------------------- corpus_ngram_novelty


def test_ngram_novelty_split(spark, tmp_path):
    """Train doc holds gram A; test docs hold gram A (seen) and gram
    B (novel) → novelty 0.5 for that lang."""
    a = "a b c d e"
    b = "v w x y z"
    rows = [
        (0, a, "en", "s", 9),  # train (0 % 10 < 8)
        (8, a, "en", "s", 9),  # test, seen gram
        (9, b, "en", "s", 9),  # test, novel gram
    ]
    base = str(tmp_path)
    _write_docs(spark, base, rows)
    from replicator_spark.pipeline.corpus import ngram_novelty_query

    r = ngram_novelty_query(spark, base).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_test_grams"] == 2
    assert row["n_novel"] == 1
    assert abs(row["novelty_rate"] - 0.5) < 1e-9


# ------------------------------------------- curate_temperature_mix


def test_temperature_mix_sharpening(spark, tmp_path):
    """Token shares 0.75/0.25: k=1 keeps them; k=2 sharpens to
    0.9/0.1; k=4 to ~0.9878/0.0122. Weights sum to ~1 per k."""
    rows = [
        (0, "a b c d e f", "en", "s", 11),   # 6 tokens
        (1, "a b c d e f", "en", "s", 11),   # 6
        (2, "a b c d e f g h i j k l m n o p q r", "en", "s", 35),  # 18
        (3, "x y z u v w q r s t", "fr", "s", 19),  # 10
    ]
    base = str(tmp_path)
    _write_docs(spark, base, rows)
    from replicator_spark.pipeline.curation import temperature_mix_query

    out = temperature_mix_query(spark, base).collect()
    w = {(r["lang"], r["inv_temp"]): r for r in out}
    assert w[("en", 1)]["n_tokens"] == 30
    assert w[("fr", 1)]["n_tokens"] == 10
    assert abs(w[("en", 1)]["weight"] - 0.75) < 1e-6
    assert abs(w[("en", 2)]["weight"] - 0.9) < 1e-6
    assert abs(w[("fr", 2)]["weight"] - 0.1) < 1e-6
    assert w[("en", 4)]["weight"] > 0.98
    for k in (1, 2, 4):
        tot = sum(r["weight"] for r in out if r["inv_temp"] == k)
        assert abs(tot - 1.0) < 1e-5
    assert abs(w[("en", 1)]["exp_tokens"] - 30.0) < 1e-3


# ------------------------------------------- dedup_template_prefix


def test_template_prefix_groups(spark, tmp_path):
    """Two docs share the first 8 tokens (template); a third differs
    at token 8; a 3-token doc is excluded entirely."""
    tpl = "t1 t2 t3 t4 t5 t6 t7 t8"
    rows = [
        (0, tpl + " body one", "en", "s", 1),
        (1, tpl + " other body", "fr", "s", 1),
        (2, "t1 t2 t3 t4 t5 t6 t7 DIFF tail", "en", "s", 1),
        (3, "too short doc", "en", "s", 1),
    ]
    base = str(tmp_path)
    _write_docs(spark, base, rows)
    from replicator_spark.pipeline.dedup import template_prefix_query

    out = template_prefix_query(spark, base).collect()
    assert len(out) == 1
    r = out[0]
    assert r["prefix"] == tpl.lower()
    assert r["n_docs"] == 2
    assert r["n_langs"] == 2
    assert r["rep_doc"] == 0


# ------------------------------------------ cdc_metrics_exposition


def test_metrics_exposition_formats(spark, tmp_path):
    """Two transports render the same report: prometheus lines carry
    underscore names + TYPE metadata; graphite lines keep the dotted
    path and append the data-derived scrape second."""
    rows = [
        (0, _day(0), 1, "click", 1.0, "{}"),
        (1, _day(0, 30), 2, "view", 1.0, "{}"),
    ]
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.cdc.metrics import metrics_exposition_query

    out = metrics_exposition_query(spark, base).collect()
    prom = {r["line"] for r in out if r["transport"] == "prometheus"}
    graph = {r["line"] for r in out if r["transport"] == "graphite"}
    assert "replicator_supplier_events_total 2" in prom
    assert "# TYPE replicator_supplier_events_total counter" in prom
    assert "replicator_applier_events_click 1" in prom
    # graphite keeps the dotted path; every line carries the SAME
    # data-derived scrape second (tz-dependent, so derived not pinned)
    totals = [
        ln for ln in graph
        if ln.startswith("replicator.supplier.events.total 2 ")
    ]
    assert len(totals) == 1
    stamps = {ln.rsplit(" ", 1)[1] for ln in graph}
    assert len(stamps) == 1 and stamps.pop().isdigit()
    # same metric count on both transports (TYPE lines double prom)
    assert len(prom) == 2 * len(graph)


# ---------------------------------------------- stats_mannwhitney_u


def test_mannwhitney_hand_computed(spark, tmp_path):
    """purchase values {3,4,5} vs other {1,2,3}: tied at 3 →
    avg-rank 3.5; R1 = 14.5, U1 = 8.5, tie term 6,
    z = 4 / sqrt(0.75 * (7 - 0.2))."""
    rows = [
        (0, _day(0), 1, "purchase", 3.0, "{}"),
        (1, _day(0, 1), 1, "purchase", 4.0, "{}"),
        (2, _day(0, 2), 1, "purchase", 5.0, "{}"),
        (3, _day(0, 3), 2, "view", 1.0, "{}"),
        (4, _day(0, 4), 2, "view", 2.0, "{}"),
        (5, _day(0, 5), 2, "view", 3.0, "{}"),
    ]
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.stats import mannwhitney_query

    r = mannwhitney_query(spark, base).collect()[0]
    assert r["n1"] == 3 and r["n2"] == 3
    assert abs(r["u1"] - 8.5) < 1e-9
    exp_z = round(4.0 / math.sqrt(0.75 * (7.0 - 0.2)), 6)
    assert abs(r["z"] - exp_z) < 1e-6


# ------------------------------------------ events_markov_stationary


def test_markov_stationary_absorbing(spark, tmp_path):
    """Chain A→B then B→B forever: the stationary distribution is
    all mass on B — every row of P^64 is (0, 1) in nano-units."""
    seq = ["signup", "click", "click", "click", "click"]
    rows = [
        (i, _day(0, i), 1, t, 1.0, "{}") for i, t in enumerate(seq)
    ]
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.analytics import (
        markov_stationary_query,
    )

    out = {
        (r["src_type"], r["dst_type"]): r["p64_nano"]
        for r in markov_stationary_query(spark, base).collect()
    }
    assert out[("signup", "click")] == 1_000_000_000
    assert out[("click", "click")] == 1_000_000_000
    assert out[("signup", "signup")] == 0
    assert out[("click", "signup")] == 0


# --------------------------------------- dedup_minhash_band_tuning


def test_band_tuning_scurve_ordering(spark, sf_dir):
    """More bands of fewer rows always detects more of ANY observed
    similarity mass: detect_rate must be monotone over the config
    ladder (8,1) >= (4,2) >= (2,4) >= (1,8), all within [0, 1]."""
    from replicator_spark.pipeline.dedup import (
        minhash_band_tuning_query,
    )

    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in minhash_band_tuning_query(spark, sf_dir).collect()
    }
    assert set(out) == {(8, 1), (4, 2), (2, 4), (1, 8)}
    ladder = [(8, 1), (4, 2), (2, 4), (1, 8)]
    rates = [out[c]["detect_rate_ppm"] for c in ladder]
    assert all(0 <= x <= 1_000_000 for x in rates)
    assert all(a >= b for a, b in zip(rates, rates[1:]))
    for c in ladder:
        assert (
            out[c]["expected_detected_nano"]
            <= out[c]["n_pairs"] * 1_000_000_000
        )


# ----------------------------------------------- tm_cell_lifetimes


def test_cell_lifetimes_consistent(spark, sf_dir):
    """On the shared fixture: every histogram row is internally
    consistent (min <= avg <= max, digit bucket matches the bounds'
    digit counts, positive gap counts)."""
    from replicator_spark.sinks.timemachine import cell_lifetimes_query

    rows = cell_lifetimes_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] > 0
        assert r["min_gap_s"] <= r["max_gap_s"]
        assert (
            r["min_gap_s"] <= r["avg_gap_s"] + 1e-9
            and r["avg_gap_s"] <= r["max_gap_s"] + 1e-9
        )
        assert len(str(r["min_gap_s"])) == r["gap_digits"]
        assert len(str(r["max_gap_s"])) == r["gap_digits"]
