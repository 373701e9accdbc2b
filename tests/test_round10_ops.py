"""Behavioral tests for the late round-7 additions: Flesch
readability, Markov entropy rate, and the per-subspace PQ
distortion audit."""

from __future__ import annotations

import math
import os

# ------------------------------------------- Flesch readability


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))


def test_readability_known_counts(spark, tmp_path):
    """Hand-countable doc: 6 words, 2 sentences, 6 vowel runs →
    flesch = 206.835 − 1.015·3 − 84.6·1 = 119.19."""
    from replicator_spark.pipeline.text import readability_query

    base = str(tmp_path)
    _write_docs(
        spark, base, [(0, "The cat sat. The dog ran.", "en", "s", 25)]
    )
    r = readability_query(spark, base).collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    assert abs(r["flesch"] - 119.19) < 1e-9


def test_readability_polysyllabic_scores_lower(spark, tmp_path):
    """Latinate prose (many vowel runs per word) must score below
    monosyllabic prose of the same sentence shape."""
    from replicator_spark.pipeline.text import readability_query

    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [
            (0, "He ran to the big red barn.", "en", "s", 27),
            (
                1,
                "Institutional epistemological considerations"
                " predominate.",
                "en",
                "s",
                52,
            ),
        ],
    )
    rows = {
        r["doc_id"]: r["flesch"]
        for r in readability_query(spark, base).collect()
    }
    assert rows[1] < rows[0]


def test_readability_empty_doc_excluded(spark, tmp_path):
    from replicator_spark.pipeline.text import readability_query

    base = str(tmp_path)
    _write_docs(spark, base, [(0, "", "en", "s", 0), (1, "ok.", "en", "s", 3)])
    got = readability_query(spark, base).collect()
    assert [r["doc_id"] for r in got] == [1]


# ------------------------------------------ Markov entropy rate


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).write.parquet(os.path.join(base, "events.parquet"))


def _mkts(spark, i):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, 0, i)


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A user that strictly alternates A→B→A→B has one possible
    successor per state: every conditional entropy is 0."""
    from replicator_spark.queries.analytics import entropy_rate_query

    base = str(tmp_path)
    rows = [
        (i, 1, "A" if i % 2 == 0 else "B", _mkts(spark, i), 1.0)
        for i in range(10)
    ]
    _write_events(spark, base, rows)
    got = entropy_rate_query(spark, base).collect()
    assert {r["src_type"] for r in got} == {"A", "B"}
    for r in got:
        assert r["h_cond"] == 0.0
        assert r["rate_contrib"] == 0.0


def test_entropy_rate_uniform_branching_is_ln2(spark, tmp_path):
    """From state A the chain goes to B or C with equal counts →
    H(dst|A) = ln 2; pi shares sum to 1."""
    from replicator_spark.queries.analytics import entropy_rate_query

    base = str(tmp_path)
    # A→B, A→C repeated: sequence A B A C A B A C ... per user
    seq = ["A", "B", "A", "C"] * 4  # transitions from A: 8 (4 B, 4 C)
    rows = [
        (i, 1, t, _mkts(spark, i), 1.0) for i, t in enumerate(seq)
    ]
    _write_events(spark, base, rows)
    got = {r["src_type"]: r for r in entropy_rate_query(spark, base).collect()}
    assert abs(got["A"]["h_cond"] - math.log(2.0)) < 1e-6
    # B and C always return to A → deterministic
    assert got["B"]["h_cond"] == 0.0
    assert abs(sum(r["pi"] for r in got.values()) - 1.0) < 1e-5


def test_entropy_rate_contrib_decomposition(spark, sf_dir):
    """rate_contrib must equal pi·h_cond (within rounding) and the
    total entropy rate is their sum — on the real events table."""
    from replicator_spark.queries.analytics import entropy_rate_query

    got = entropy_rate_query(spark, sf_dir).collect()
    assert len(got) >= 2
    for r in got:
        assert r["h_cond"] >= 0.0
        assert abs(r["rate_contrib"] - r["pi"] * r["h_cond"]) < 1e-4


# ------------------------------- per-subspace PQ distortion audit


def test_pq_distortion_shape_and_bounds(spark, sf_dir):
    """One row per subspace; every subspace assigns every vector;
    codeword utilization is bounded by K; max ≥ mean ≥ 0."""
    from replicator_spark.pipeline.vectors import (
        PQ_K,
        PQ_M,
        pq_distortion_query,
    )

    got = pq_distortion_query(spark, sf_dir).collect()
    assert len(got) == PQ_M
    assert {r["sub"] for r in got} == set(range(PQ_M))
    n = {r["n_vecs"] for r in got}
    assert len(n) == 1 and n.pop() > 0
    for r in got:
        assert 1 <= r["n_codes_used"] <= PQ_K
        assert 0.0 <= r["mean_d2"] <= r["max_d2"] + 1e-12


# ------------------------------------ Theil–Sen robust trend slope


def test_theil_sen_robust_to_outlier_day(spark, tmp_path):
    """Daily counts follow 10 + 2·day except one burst day; the
    median-of-pairwise-slopes stays at the true 2.0/day while OLS
    would be dragged."""
    import datetime
    from replicator_spark.queries.temporal import theil_sen_query

    base = str(tmp_path)
    rows = []
    eid = 0
    for d in range(8):
        n = 10 + 2 * d if d != 4 else 500  # burst on day 4
        for i in range(n):
            rows.append(
                (
                    eid,
                    1,
                    "A",
                    datetime.datetime(2024, 1, 1 + d, 0, 0, i % 60, i),
                    1.0,
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).write.parquet(os.path.join(base, "events.parquet"))
    r = theil_sen_query(spark, base).collect()[0]
    assert r["n_days"] == 8
    assert r["n_pairs"] == 28
    assert abs(r["ts_slope"] - 2.0) < 1e-9


def test_theil_sen_agrees_with_ols_on_clean_series(spark, sf_dir):
    """On the real events table the two slope estimates should be the
    same order of magnitude (no synthetic bursts)."""
    from replicator_spark.queries.temporal import (
        theil_sen_query,
        trend_ols_query,
    )

    ts = {
        r["event_type"]: r["ts_slope"]
        for r in theil_sen_query(spark, sf_dir).collect()
    }
    ols = {
        r["event_type"]: r["slope_per_day"]
        for r in trend_ols_query(spark, sf_dir).collect()
    }
    assert set(ts) == set(ols)
    for k in ts:
        assert abs(ts[k] - ols[k]) < max(5.0, abs(ols[k]))


# --------------------------------- simplified silhouette audit


def test_silhouette_shape_and_bounds(spark, sf_dir):
    from replicator_spark.pipeline.vectors import (
        KMEANS_K,
        silhouette_query,
    )

    got = silhouette_query(spark, sf_dir).collect()
    assert 1 <= len(got) <= KMEANS_K
    for r in got:
        assert 0.0 <= r["mean_sil"] <= 1.0
        assert r["min_sil"] <= r["mean_sil"] + 1e-12
        assert 0.0 <= r["boundary_frac"] <= 1.0


def test_silhouette_members_match_kmeans(spark, sf_dir):
    """Both audits score the same codebook: member counts per cluster
    must agree with emb_kmeans."""
    from replicator_spark.pipeline.vectors import (
        kmeans_query,
        silhouette_query,
    )

    sil = {
        r["cid"]: r["n_members"]
        for r in silhouette_query(spark, sf_dir).collect()
    }
    km = {
        r["cid"]: r["n_members"]
        for r in kmeans_query(spark, sf_dir).collect()
    }
    assert sil == km


# ------------------------------------------ community modularity


def test_modularity_invariants(spark, sf_dir):
    """Degree sums total 2m, intra edges total ≤ m, and ΣQ_c lands in
    (−1, 1]."""
    from replicator_spark.queries.graph import modularity_query

    got = modularity_query(spark, sf_dir).collect()
    assert len(got) >= 2
    deg_total = sum(r["degree_sum"] for r in got)
    intra_total = sum(r["intra_edges"] for r in got)
    assert deg_total % 2 == 0
    m = deg_total // 2
    assert intra_total <= m
    q = sum(r["q_contrib"] for r in got)
    assert -1.0 < q <= 1.0


def test_modularity_matches_lpa_partition(spark, sf_dir):
    """The modularity rows cover exactly the LPA communities with the
    same node counts."""
    from replicator_spark.queries.graph import (
        label_propagation_query,
        modularity_query,
    )

    mod = {
        r["community"]: r["n_nodes"]
        for r in modularity_query(spark, sf_dir).collect()
    }
    lpa = {}
    for r in label_propagation_query(spark, sf_dir).collect():
        lpa[r["community"]] = r["community_size"]
    assert mod == lpa
