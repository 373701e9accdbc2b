"""Semantic tests for the round-3 additions: count-min sketch
guarantees, embedding centroids, triangle counting, rolling z-score
anomalies, quality filter chain, canonical near-dedup."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cms_estimate_never_underestimates(spark, sf_dir):
    """The count-min guarantee is one-sided: est >= exact for every
    reported item, and every true heavy hitter is reported."""
    from replicator_spark.pipeline.sketches import CMS_T, cms_heavy_query

    rows = cms_heavy_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
    reported = {r["user_id"] for r in rows}
    exact = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= CMS_T)
        .collect()
    )
    for r in exact:
        assert r["user_id"] in reported, r


def test_centroids_cover_every_label_and_dim(spark, sf_dir):
    from replicator_spark.pipeline.vectors import centroids_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    rows = centroids_query(spark, sf_dir).collect()
    assert len(rows) == n_labels * 64
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add(r["dim"])
    for dims in by_label.values():
        assert dims == set(range(64))


def test_triangle_invariants(spark, sf_dir):
    """3*triangles <= wedges (every triangle closes 3 wedges), so the
    clustering coefficient is a proper ratio in [0, 1]."""
    from replicator_spark.queries.graph import triangles_query

    r = triangles_query(spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering_coef"] <= 1.0


def test_anomaly_zscore_flags_injected_spike(spark, tmp_path):
    """A flat-valued user with one huge spike must flag exactly the
    spike (after the baseline window has enough samples)."""
    import os

    from replicator_spark.queries import analytics as mod

    rows = [
        (i, 1, (1_000_000_000 * i), 10.0 + (i % 3) * 0.5) for i in range(1, 40)
    ]
    rows[30] = (31, 1, 1_000_000_000 * 31, 500.0)  # the spike
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    path = os.path.join(str(tmp_path), "events.parquet")
    df.write.parquet(path)
    out = mod.anomaly_zscore_query(spark, str(tmp_path)).collect()
    flagged = {r["event_id"] for r in out}
    assert 31 in flagged
    # the spike also poisons the NEXT window's std upward, so nothing
    # after it should fire; nothing before it either (flat signal)
    assert flagged == {31}


def test_quality_filter_reasons_consistent(spark, sf_dir):
    from replicator_spark.pipeline.curation import quality_filter_query

    rows = quality_filter_query(spark, sf_dir).collect()
    assert rows
    seen_reason = False
    for r in rows:
        assert r["keep"] == (r["reasons"] == ""), r
        if r["reasons"]:
            seen_reason = True
            parts = r["reasons"].split(",")
            assert parts == sorted(parts)
    assert seen_reason, "thresholds never fired — rules untested"


def test_near_dedup_keeps_one_doc_per_cluster(spark, sf_dir):
    from replicator_spark.pipeline.cluster import (
        dedup_clusters_query,
        near_dedup_query,
    )

    clusters = dedup_clusters_query(spark, sf_dir).collect()
    kept = near_dedup_query(spark, sf_dir).collect()
    n_components = len({r["cluster_id"] for r in clusters})
    assert len(kept) == n_components
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    total_docs = sum(len(v) for v in by_cluster.values())
    assert sum(r["n_absorbed"] for r in kept) == total_docs
    for r in kept:
        assert r["doc_id"] == min(by_cluster[r["cluster_id"]])


def test_dq_constraints_report_real_fixture_state(spark, sf_dir):
    """The synthetic warehouse is referentially intact EXCEPT that
    lineitem's (l_orderkey, l_linenumber) is not unique — the report
    must catch exactly that and pass everything else."""
    from replicator_spark.queries.dq import dq_constraints_query

    rows = {r["constraint"]: r for r in dq_constraints_query(spark, sf_dir).collect()}
    assert len(rows) == 7
    for name, r in rows.items():
        assert r["n_checked"] > 0, name
        if name == "lineitem_pk_unique":
            assert not r["passed"] and r["n_violations"] > 0
        else:
            assert r["passed"] and r["n_violations"] == 0, name


def test_dq_constraints_catch_injected_violations(spark, tmp_path):
    """Duplicate PK + orphan FK + out-of-range qty must be counted."""
    import os

    from replicator_spark.queries import dq as mod

    base = str(tmp_path)
    spark.createDataFrame(
        [(1, 10), (1, 10), (2, 99)], "o_orderkey long, o_custkey long"
    ).write.parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, 500.0), (7, 1, 3.0)],
        "l_orderkey long, l_linenumber long, l_quantity double",
    ).write.parquet(os.path.join(base, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "a"), (11, None)], "c_custkey long, c_name string"
    ).write.parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        [(1, -1.0)], "event_id long, value double"
    ).write.parquet(os.path.join(base, "events.parquet"))
    rows = {r["constraint"]: r for r in mod.dq_constraints_query(spark, base).collect()}
    assert rows["orders_pk_unique"]["n_violations"] == 1
    assert rows["lineitem_pk_unique"]["n_violations"] == 1
    assert rows["lineitem_qty_range"]["n_violations"] == 1
    assert rows["customer_name_not_null"]["n_violations"] == 1
    assert rows["events_value_nonneg"]["n_violations"] == 1
    assert rows["orders_custkey_fk"]["n_violations"] == 1  # custkey 99
    assert rows["lineitem_orderkey_fk"]["n_violations"] == 1  # orderkey 7


def test_recall_at_k_bounds_and_consistency(spark, sf_dir):
    from replicator_spark.pipeline.similarity import (
        TOP_K,
        recall_at_k_query,
    )

    rows = recall_at_k_query(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall"] - r["n_hits"] / TOP_K) < 1e-12


def test_pmi_matches_hand_computation(spark, sf_dir):
    """Recompute one bigram's PMI from raw counts."""
    import math

    from replicator_spark.pipeline.corpus import (
        PMI_MIN_COUNT,
        pmi_bigrams_query,
    )

    rows = pmi_bigrams_query(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = [d["text"].lower().split() for d in docs]
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n_uni = sum(uni.values())
    n_bi_kept = sum(c for c in bi.values() if c >= PMI_MIN_COUNT)
    r = rows[0]
    assert r["c_bi"] == bi[(r["w1"], r["w2"])]
    expect = math.log(
        (r["c_bi"] / n_bi_kept)
        / ((uni[r["w1"]] / n_uni) * (uni[r["w2"]] / n_uni))
    )
    assert abs(r["pmi"] - expect) < 1e-5


def test_e2e_pipeline_conserves_survivors(spark, sf_dir):
    from replicator_spark.pipeline.cluster import (
        e2e_pipeline_query,
        near_dedup_query,
    )
    from replicator_spark.pipeline.curation import quality_filter_query

    out = e2e_pipeline_query(spark, sf_dir).collect()
    assert out
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    canon = {r["doc_id"] for r in near_dedup_query(spark, sf_dir).collect()}
    qpass = {
        r["doc_id"]
        for r in quality_filter_query(spark, sf_dir).collect()
        if r["keep"]
    }
    assert sum(r["n_docs"] for r in out) == len(canon & qpass)
