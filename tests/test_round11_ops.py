"""Behavioral tests for the round-7 batch-9 additions: Pareto user
concentration, common-neighbors link prediction, MATTR lexical
diversity, packed-bit Hamming recall, and the time-travel count
sweep."""

from __future__ import annotations

import os

# ------------------------------------------- events_pareto_share


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(os.path.join(base, "events.parquet"))


def _ts(i):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(
        seconds=i
    )


def test_pareto_whale_dominates(spark, tmp_path):
    """10 users; user 0 fires 91 of 100 events → top decile =
    ceil(10/10) = 1 user = the whale: share 0.91."""
    rows = []
    eid = 0
    for _ in range(91):
        rows.append((eid, _ts(eid), 0, "click", 1.0, "{}"))
        eid += 1
    for u in range(1, 10):
        rows.append((eid, _ts(eid), u, "click", 1.0, "{}"))
        eid += 1
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.analytics import pareto_share_query

    r = pareto_share_query(spark, base).collect()[0]
    assert r["n_events"] == 100
    assert r["n_users"] == 10
    assert r["top_decile_events"] == 91
    assert abs(r["top_user_share"] - 0.91) < 1e-9
    assert abs(r["top_decile_share"] - 0.91) < 1e-9


def test_pareto_uniform_tie_split(spark, tmp_path):
    """20 users with 5 events each: top_k=2 comes entirely from one
    tied histogram bucket — exact tie split takes 2·5/100 = 0.1."""
    rows = []
    eid = 0
    for u in range(20):
        for _ in range(5):
            rows.append((eid, _ts(eid), u, "view", 1.0, "{}"))
            eid += 1
    base = str(tmp_path)
    _write_events(spark, base, rows)
    from replicator_spark.queries.analytics import pareto_share_query

    r = pareto_share_query(spark, base).collect()[0]
    assert r["n_users"] == 20
    assert r["top_decile_events"] == 10
    assert abs(r["top_decile_share"] - 0.1) < 1e-9


# --------------------------------------- graph_link_prediction


def test_link_prediction_path_graph(spark, tmp_path):
    """Edges 1–2 and 2–3 (each co-bought in 2 orders) → predicted
    pair (1,3): cn=1 through middle 2, jaccard = 1/(1+1−1) = 1."""
    rows = []
    # orders o1,o2 hold parts {1,2}; o3,o4 hold parts {2,3}
    for ok, parts in ((1, (1, 2)), (2, (1, 2)), (3, (2, 3)), (4, (2, 3))):
        for i, p in enumerate(parts):
            rows.append((ok, p, i + 1))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    from replicator_spark.queries.graph import link_prediction_query

    out = link_prediction_query(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["w"]) == (1, 3)
    assert r["cn"] == 1
    assert abs(r["jaccard"] - 1.0) < 1e-9


# --------------------------------------- text_mattr_diversity


def test_mattr_short_doc_equals_ttr(spark, tmp_path):
    """6 tokens < window → single window, mattr == ttr == 2/6."""
    spark.createDataFrame(
        [(0, "a b a b a b", "en", "s", 11)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from replicator_spark.pipeline.text import mattr_query

    r = mattr_query(spark, str(tmp_path)).collect()[0]
    assert r["n_tokens"] == 6 and r["n_types"] == 2
    assert r["n_windows"] == 1
    assert abs(r["ttr"] - round(2 / 6, 6)) < 1e-9
    assert abs(r["mattr"] - r["ttr"]) < 1e-9


def test_mattr_all_distinct_long_doc(spark, tmp_path):
    """30 distinct tokens, W=25 → 6 windows, every window TTR=1."""
    text = " ".join(f"w{i}" for i in range(30))
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from replicator_spark.pipeline.text import mattr_query

    r = mattr_query(spark, str(tmp_path)).collect()[0]
    assert r["n_windows"] == 6
    assert abs(r["mattr"] - 1.0) < 1e-9
    assert abs(r["ttr"] - 1.0) < 1e-9


def test_mattr_repetitive_below_ttr_of_distinct(spark, tmp_path):
    """A doc that cycles 3 tokens over 30 positions: every window
    has 3 types → mattr = 3/25, far below the distinct doc's 1.0."""
    text = " ".join(("x", "y", "z")[i % 3] for i in range(30))
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from replicator_spark.pipeline.text import mattr_query

    r = mattr_query(spark, str(tmp_path)).collect()[0]
    assert abs(r["mattr"] - round(3 / 25, 6)) < 1e-9


# --------------------------------------- sim_hamming_recall


def test_hamming_recall_bounds_and_selfsim(spark, sf_dir):
    """On real embeddings: one row per query, recall in [0,1] with
    n_hits = recall·k, and the kth Hamming distance in [0, 64]."""
    from replicator_spark.pipeline.similarity import (
        TOP_K,
        N_QUERIES,
        hamming_recall_query,
    )

    rows = hamming_recall_query(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] == round(r["recall"] * TOP_K)
        assert 0 <= r["hamming_kth"] <= 64


def test_hamming_identical_vector_is_nearest(spark, tmp_path):
    """A candidate with the exact query vector has Hamming 0 and
    must appear in the Hamming top-k."""
    import random

    rng = random.Random(7)
    rows = []
    base_vec = [rng.uniform(-1, 1) for _ in range(64)]
    for vid in range(8):  # queries
        rows.append(
            (vid, [rng.uniform(-1, 1) for _ in range(64)], 0)
        )
    rows[0] = (0, base_vec, 0)
    rows.append((100, list(base_vec), 1))  # exact copy of query 0
    for vid in range(101, 140):
        rows.append(
            (vid, [rng.uniform(-1, 1) for _ in range(64)], 1)
        )
    spark.createDataFrame(
        [(v, [float(x) for x in vec], lab) for v, vec, lab in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    from replicator_spark.pipeline.similarity import (
        hamming_recall_query,
    )

    out = {
        r["query_id"]: r
        for r in hamming_recall_query(spark, str(tmp_path)).collect()
    }
    # query 0's truth top-1 is its exact copy (cosine 1), and the
    # copy also has Hamming 0 → at least one hit is guaranteed
    assert out[0]["n_hits"] >= 1


# --------------------------------------- tm_timetravel_counts


def test_timetravel_counts_monotone(spark, sf_dir):
    """Rows-seen must be non-decreasing in the cutoff, alive+deleted
    must partition rows-seen, and the last cutoff covers history."""
    from replicator_spark.sinks.timemachine import (
        TT_CUTOFFS_US,
        timetravel_counts_query,
    )

    rows = timetravel_counts_query(spark, sf_dir).collect()
    by_cut = {}
    for r in rows:
        assert r["n_alive"] + r["n_deleted"] == r["n_rows_seen"]
        by_cut.setdefault(r["table_name"], {})[r["cutoff_us"]] = r
    for _t, cuts in by_cut.items():
        seen = [
            cuts[c]["n_rows_seen"] for c in TT_CUTOFFS_US if c in cuts
        ]
        assert seen == sorted(seen)


# --------------------------------------- corpus_term_burstiness


def test_burstiness_clustered_vs_uniform(spark, tmp_path):
    """Term 'x': 4 hits in 1 of 4 docs → mean 1, E[k²] 4, var 3,
    fano 3. Term 'u': once per doc → var 0, fano 0."""
    docs = [
        (0, "x x x x u", "en", "s", 9),
        (1, "u pad1", "en", "s", 6),
        (2, "u pad2", "en", "s", 6),
        (3, "u pad3", "en", "s", 6),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from replicator_spark.pipeline.corpus import term_burstiness_query

    rows = {
        r["term"]: r
        for r in term_burstiness_query(spark, str(tmp_path)).collect()
    }
    assert rows["x"]["fano"] == 3.0
    assert rows["x"]["mean_per_doc"] == 1.0
    assert rows["u"]["fano"] == 0.0


# --------------------------------------- agg_grouping_sets


def test_grouping_sets_marginals(spark, sf_dir):
    """No grand-total row; each marginal family must re-add to the
    same line count as the full (status, flag) grouping."""
    from replicator_spark.queries.tpch_ext import agg_grouping_sets

    rows = agg_grouping_sets(spark, sf_dir).collect()
    full = [
        r for r in rows
        if r["l_linestatus"] != "ALL" and r["l_returnflag"] != "ALL"
    ]
    m_status = [r for r in rows if r["l_returnflag"] == "ALL"]
    m_flag = [r for r in rows if r["l_linestatus"] == "ALL"]
    assert not any(
        r["l_linestatus"] == "ALL" and r["l_returnflag"] == "ALL"
        for r in rows
    )
    total = sum(r["n_lines"] for r in full)
    assert sum(r["n_lines"] for r in m_status) == total
    assert sum(r["n_lines"] for r in m_flag) == total


# --------------------------------------- events_conversion_latency


def test_conversion_latency_digit_buckets(spark, tmp_path):
    """view@0 → click@+5ms (1 digit) → purchase@+5s (4 digits)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def at(ms):
        return t0 + datetime.timedelta(milliseconds=ms)

    rows = [
        (0, at(0), 1, "view", 1.0, "{}"),
        (1, at(5), 1, "click", 1.0, "{}"),
        (2, at(5005), 1, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    from replicator_spark.queries.funnel import (
        conversion_latency_query,
    )

    out = {
        (r["stage"], r["ms_digits"]): r
        for r in conversion_latency_query(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("view_to_click", 1)]["n"] == 1
    assert out[("view_to_click", 1)]["mean_ms"] == 5.0
    assert out[("click_to_purchase", 4)]["n"] == 1
    assert out[("click_to_purchase", 4)]["mean_ms"] == 5000.0


# --------------------------------------- emb_jl_fidelity


def test_jl_fidelity_ratio_centered(spark, sf_dir):
    """JL with k=16 keeps the mean pairwise distance ratio near 1
    (E‖Px‖² = ‖x‖²) — and every ratio is finite and positive."""
    from replicator_spark.pipeline.vectors import jl_fidelity_query

    rows = jl_fidelity_query(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 < r["min_ratio"] <= r["mean_ratio"] <= r["max_ratio"]
        assert 0.6 < r["mean_ratio"] < 1.4


# --------------------------------------- stats_wilson_ci


def test_wilson_ci_brackets_phat(spark, sf_dir):
    """CI must bracket p̂, stay inside [0,1], and shrink with n."""
    from replicator_spark.queries.stats import wilson_ci_query

    rows = wilson_ci_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_low"] <= r["p_hat"] <= r["ci_high"] <= 1.0


def test_wilson_ci_known_values(spark, tmp_path):
    """n=100, k=50: Wilson 95% ≈ (0.4038, 0.5962) — symmetric."""
    rows = [
        (i, _ts(i), i, "click", 150.0 if i < 50 else 10.0, "{}")
        for i in range(100)
    ]
    _write_events(spark, str(tmp_path), rows)
    from replicator_spark.queries.stats import wilson_ci_query

    r = wilson_ci_query(spark, str(tmp_path)).collect()[0]
    assert r["n_high"] == 50
    assert abs(r["ci_low"] - 0.403832) < 1e-4
    assert abs(r["ci_high"] - 0.596168) < 1e-4


# --------------------------------------- corpus_herfindahl


def test_herfindahl_balanced_vs_monopoly(spark, tmp_path):
    """lang 'a': 4 docs over 4 sources → HHI 0.25, eff 4.
    lang 'b': all docs one source → HHI 1, eff 1."""
    docs = [(i, "w", "a", f"s{i}", 10) for i in range(4)]
    docs += [(10 + i, "w", "b", "mono", 10) for i in range(3)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from replicator_spark.pipeline.diversity import herfindahl_query

    rows = {
        r["lang"]: r
        for r in herfindahl_query(spark, str(tmp_path)).collect()
    }
    assert rows["a"]["hhi_docs"] == 0.25
    assert rows["a"]["effective_sources"] == 4.0
    assert rows["b"]["hhi_docs"] == 1.0
    assert rows["b"]["n_sources"] == 1


# --------------------------------------- corpus_head_coverage


def test_head_coverage_monotone_in_k(spark, sf_dir):
    """Coverage grows with K and stays in (0, 1]."""
    from replicator_spark.pipeline.diversity import (
        HEAD_KS,
        head_coverage_query,
    )

    rows = {
        r["k"]: r for r in head_coverage_query(spark, sf_dir).collect()
    }
    assert set(rows) == set(HEAD_KS)
    cov = [rows[k]["coverage"] for k in sorted(rows)]
    assert cov == sorted(cov)
    assert all(0.0 < c <= 1.0 for c in cov)
    # head_tokens at K must never exceed the full token count
    for r in rows.values():
        assert r["head_tokens"] <= r["n_tokens"]


# --------------------------------------- ts_seasonal_outliers


def test_seasonal_outliers_flags_planted_spike(spark, tmp_path):
    """Flat 10 events/day for 28 days except day 14 at 100 →
    the spike day must rank first with a large positive z."""
    rows = []
    eid = 0
    import datetime

    for d in range(28):
        n = 100 if d == 14 else 10
        for i in range(n):
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=d, seconds=i
            )
            rows.append((eid, ts, i % 7, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    from replicator_spark.queries.temporal import (
        seasonal_outliers_query,
    )

    out = seasonal_outliers_query(spark, str(tmp_path)).collect()
    top = out[0]
    assert top["rank"] == 1
    assert top["n"] == 100
    assert top["z"] > 3.0
