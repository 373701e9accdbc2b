"""Eighth batch of operator additions (build round 6): the kNN label
probe, synchronous label-propagation communities, and greedy k-center
coreset selection.

Test files are numbered by addition batch, not by the driver's grading
round."""

from __future__ import annotations

import math
import os


def _write_embeddings(spark, base, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(base, "embeddings.parquet"))


def _vec(*hot):
    """64-dim unit-ish vector with 1.0 at the given indices."""
    v = [0.0] * 64
    for h in hot:
        v[h] = 1.0
    return v


# ------------------------------------------------ kNN label probe


def test_knn_classifier_separable_clusters(spark, tmp_path):
    from replicator_spark.pipeline.similarity import knn_classifier_query

    base = str(tmp_path)
    rows = []
    # two far-apart clusters of 8: label 0 near axis 0, label 1 near
    # axis 32 — every vector's 5 NN share its label, so accuracy = 1.0
    for i in range(8):
        rows.append((i, _vec(0, 1 + i % 4), 0))
    for i in range(8):
        rows.append((100 + i, _vec(32, 40 + i % 4), 1))
    _write_embeddings(spark, base, rows)
    got = {
        r["label"]: r for r in knn_classifier_query(spark, base).collect()
    }
    for lbl in (0, 1):
        assert got[lbl]["n_classified"] == got[lbl]["n_correct"]
        assert got[lbl]["accuracy"] == 1.0


def test_knn_classifier_majority_vote_flips_minority(spark, tmp_path):
    from replicator_spark.pipeline.similarity import knn_classifier_query

    base = str(tmp_path)
    # one label-1 vector embedded inside a tight label-0 cluster: its
    # 5 neighbors all vote 0, so label 1 scores 0 accuracy
    rows = [(i, _vec(0, 1), 0) for i in range(7)]
    rows.append((99, _vec(0, 1), 1))
    _write_embeddings(spark, base, rows)
    got = {
        r["label"]: r for r in knn_classifier_query(spark, base).collect()
    }
    assert got[1]["n_correct"] == 0
    assert got[0]["accuracy"] == 1.0


# ------------------------------------------------ label propagation


def _write_lineitem_orders(spark, base, baskets):
    """Materialize co-purchase baskets: basket i = one order with the
    given part keys (every pair needs TRI_SUPPORT=2 shared orders, so
    callers duplicate baskets)."""
    li = []
    for okey, parts in enumerate(baskets):
        for p in parts:
            li.append((okey, p, 1, 1.0))
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double"
    ).write.parquet(os.path.join(base, "lineitem.parquet"))


def test_label_propagation_two_cliques(spark, tmp_path):
    from replicator_spark.queries.graph import label_propagation_query

    base = str(tmp_path)
    # two disjoint triangles, each basket repeated so every edge meets
    # TRI_SUPPORT — LPA converges each triangle to its min label
    _write_lineitem_orders(
        spark, base, [[1, 2, 3], [1, 2, 3], [10, 11, 12], [10, 11, 12]]
    )
    got = {
        r["node"]: r
        for r in label_propagation_query(spark, base).collect()
    }
    assert {got[n]["community"] for n in (1, 2, 3)} == {1}
    assert {got[n]["community"] for n in (10, 11, 12)} == {10}
    assert all(got[n]["community_size"] == 3 for n in got)


# ------------------------------------------------ k-center coreset


def test_kcenter_picks_farthest_and_radius_decreases(spark, tmp_path):
    from replicator_spark.pipeline.curation import (
        KCENTER_K,
        coreset_kcenter_query,
    )

    base = str(tmp_path)
    # a tight cluster at axis 0 + singletons at axes 10/20/30 with
    # growing magnitude: picks after the seed must be the far points
    rows = [(i, _vec(0), 0) for i in range(10)]
    far = {100: (10, 3.0), 101: (20, 4.0), 102: (30, 5.0)}
    for vid, (axis, mag) in far.items():
        v = [0.0] * 64
        v[axis] = mag
        rows.append((vid, v, 1))
    _write_embeddings(spark, base, rows)
    got = coreset_kcenter_query(spark, base).collect()
    assert len(got) == KCENTER_K
    by_rank = {r["pick_rank"]: r for r in got}
    assert by_rank[0]["radius"] is None
    # every far singleton is chosen before any second cluster member
    picked = [by_rank[r]["vec_id"] for r in range(1, 4)]
    assert set(picked) <= {100, 101, 102} | {by_rank[0]["vec_id"]}
    # coverage radius is non-increasing after all far points are in
    radii = [
        by_rank[r]["radius"]
        for r in range(1, KCENTER_K)
        if by_rank[r]["radius"] is not None
    ]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_matches_python_replay(spark, tmp_path, sf_dir):
    """Independent pin: greedy FPS replayed in pure Python over the
    same parquet must pick the identical centers in order."""
    import hashlib

    from replicator_spark.pipeline.curation import (
        KCENTER_K,
        coreset_kcenter_query,
    )

    pts = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).collect()
    }

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    seed = min(
        pts, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k)
    )
    centers = [seed]
    expect = [(0, seed)]
    dmin = {k: math.inf for k in pts}
    for rank in range(1, KCENTER_K):
        last = pts[centers[-1]]
        for k in pts:
            dmin[k] = min(dmin[k], d2(pts[k], last))
        pick = max(pts, key=lambda k: (dmin[k], -k))
        centers.append(pick)
        expect.append((rank, pick))
    got = [
        (r["pick_rank"], r["vec_id"])
        for r in coreset_kcenter_query(spark, sf_dir)
        .orderBy("pick_rank")
        .collect()
    ]
    assert got == expect


# ------------------------------------------------ vocab growth (Heaps)


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(os.path.join(base, "documents.parquet"))


def test_vocab_growth_cumulative_curve(spark, tmp_path):
    from replicator_spark.pipeline.diversity import vocab_growth_query

    base = str(tmp_path)
    # 10 docs: doc i repeats earlier vocab and adds ONE new word, so
    # vocab_cum = decile index while tokens grow faster — ttr falls
    docs = []
    for i in range(10):
        words = [f"w{j}" for j in range(i + 1)] + ["w0"] * i
        docs.append((i, " ".join(words), "en", "s", 10))
    _write_docs(spark, base, docs)
    rows = {
        r["decile"]: r
        for r in vocab_growth_query(spark, base).collect()
    }
    assert len(rows) == 10
    # one new word per doc -> vocab_cum == decile
    for d in range(1, 11):
        assert rows[d]["vocab_cum"] == d
        assert rows[d]["docs_cum"] == d
    # tokens: doc i has (i+1) + i tokens -> cumulative sum of (2i+1) = d^2
    assert rows[10]["tokens_cum"] == 100
    # ttr strictly decreasing once repeats dominate
    ttrs = [rows[d]["ttr"] for d in range(1, 11)]
    assert ttrs == sorted(ttrs, reverse=True)


# ------------------------------------------------ IVF + ADC


def test_ivfadc_is_adc_restricted_to_query_cell(spark, sf_dir):
    """IVF+ADC must equal the plain ADC scores filtered to the query's
    coarse cell and re-ranked — the prune changes WHICH candidates are
    scored, never their ADC distances."""
    from replicator_spark.pipeline.similarity import _knn_cell, _knn_h
    from replicator_spark.pipeline.vectors import (
        ADC_TOPK,
        adc_topk_query,
        ivfadc_topk_query,
    )
    from pyspark.sql import functions as F
    from replicator_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    h = _knn_h(emb.count())
    cells = {
        int(r["vec_id"]): int(r["cell"])
        for r in emb.select(
            "vec_id", _knn_cell(F.col("v"), h).alias("cell")
        ).collect()
    }
    ivf = ivfadc_topk_query(spark, sf_dir).collect()
    # every returned candidate shares the query's cell
    for r in ivf:
        assert cells[r["vec_id"]] == cells[r["query_id"]]
    # ADC re-derivation: same trainer seed -> same codebooks -> the
    # cell-filtered ADC ranking must match (ADC emits only top-10
    # overall, so compare on the overlap: every ADC row that IS a
    # cell-mate must appear in IVF with the identical distance)
    adc = adc_topk_query(spark, sf_dir).collect()
    ivf_scores = {
        (r["query_id"], r["vec_id"]): r["adc_d2"] for r in ivf
    }
    for r in adc:
        if cells[r["vec_id"]] == cells[r["query_id"]]:
            key = (r["query_id"], r["vec_id"])
            assert key in ivf_scores
            assert ivf_scores[key] == r["adc_d2"]
    # full rank contract per query
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(x["rank"] for x in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= ADC_TOPK
        # self is a cell-mate with distance ~0 -> rank 1
        assert rows[0]["query_id"] in {x["vec_id"] for x in rows}


# ------------------------------------------------ OLS trend


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(os.path.join(base, "events.parquet"))


def test_trend_ols_recovers_linear_growth(spark, tmp_path):
    from replicator_spark.queries.temporal import trend_ols_query

    base = str(tmp_path)
    day_ns = 86_400 * 10**9
    evs, eid = [], 0
    for d in range(10):
        for i in range(5 + 3 * d):  # "grow": +3 events/day exactly
            evs.append((eid, d * day_ns + i * 10**9, i, "grow", 1.0, "{}"))
            eid += 1
        for i in range(7):  # "flat": constant volume
            evs.append(
                (eid, d * day_ns + i * 10**9, i, "flat", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, base, evs)
    got = {r["event_type"]: r for r in trend_ols_query(spark, base).collect()}
    assert got["grow"]["slope_per_day"] == 3.0
    assert got["grow"]["intercept"] == 5.0
    assert got["grow"]["r2"] == 1.0
    assert got["flat"]["slope_per_day"] == 0.0
    assert got["flat"]["intercept"] == 7.0
    assert got["flat"]["r2"] == 0.0  # zero variance in y -> guarded
