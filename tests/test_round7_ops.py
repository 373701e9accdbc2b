"""Seventh batch of operator additions (build round 4): corpus
diversity (source overlap, entropy/KL), Spearman rank correlation,
Mann-Whitney ROC AUC, Markov event transitions, and theta-sketch set
algebra.

Test files are numbered by addition batch, not by the driver's grading
round."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(os.path.join(base, "documents.parquet"))


def _write_events(spark, base, rows):
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(os.path.join(base, "events.parquet"))


# ------------------------------------------------ source overlap


def test_source_overlap_identical_and_disjoint(spark, tmp_path):
    from replicator_spark.pipeline.diversity import source_overlap_query

    base = str(tmp_path)
    shared = "a b c d e f g h"
    _write_docs(
        spark,
        base,
        [
            (1, shared, "en", "s1", 10),
            (2, shared, "en", "s2", 10),
            (3, "x y z w v u t q", "en", "s3", 10),
        ],
    )
    rows = {
        (r["s1"], r["s2"]): r
        for r in source_overlap_query(spark, base).collect()
    }
    assert len(rows) == 3  # full pair grid, zero-overlap pairs included
    assert rows[("s1", "s2")]["jaccard"] == 1.0
    assert rows[("s1", "s3")]["jaccard"] == 0.0
    assert rows[("s1", "s3")]["n_inter"] == 0
    assert rows[("s2", "s3")]["n_union"] == (
        rows[("s2", "s3")]["n1"] + rows[("s2", "s3")]["n2"]
    )


def test_source_overlap_symmetric_range(spark, sf_dir):
    from replicator_spark.pipeline.diversity import source_overlap_query

    rows = source_overlap_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["s1"] < r["s2"]  # each unordered pair exactly once
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_union"] == r["n1"] + r["n2"] - r["n_inter"]


# ------------------------------------------------ entropy / KL


def test_entropy_kl_uniform_vs_skewed(spark, tmp_path):
    from replicator_spark.pipeline.diversity import entropy_kl_query

    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [
            # uniform over 4 tokens → entropy = ln 4
            (1, "a b c d", "en", "uni", 7),
            # degenerate single token → entropy = 0
            (2, "a a a a", "en", "point", 7),
        ],
    )
    by_src = {
        r["source"]: r for r in entropy_kl_query(spark, base).collect()
    }
    assert abs(by_src["uni"]["entropy"] - math.log(4)) < 1e-6
    assert by_src["point"]["entropy"] == 0.0
    # KL is non-negative, and zero only when the source matches the mix
    assert by_src["uni"]["kl_vs_corpus"] >= 0.0
    assert by_src["point"]["kl_vs_corpus"] > 0.0
    assert by_src["uni"]["vocab"] == 4
    assert by_src["point"]["n_tokens"] == 4


# ------------------------------------------------ Spearman


def test_spearman_perfect_monotone(spark, tmp_path):
    from replicator_spark.queries.stats import spearman_query

    base = str(tmp_path)
    # token count strictly increases with n_chars → rho = +1;
    # "anti" lang reverses it → rho = −1
    rows = []
    for i in range(6):
        rows.append((i, "w " * (i + 1), "mono", "s", i + 1))
        rows.append((10 + i, "w " * (i + 1), "anti", "s", -(i + 1)))
    _write_docs(spark, base, [(d, t.strip(), l, s, n) for d, t, l, s, n in rows])
    by_lang = {r["lang"]: r for r in spearman_query(spark, base).collect()}
    assert by_lang["mono"]["spearman_rho"] == 1.0
    assert by_lang["anti"]["spearman_rho"] == -1.0


def test_spearman_tie_handling_bounded(spark, sf_dir):
    from replicator_spark.queries.stats import spearman_query

    rows = spearman_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["spearman_rho"] <= 1.0


# ------------------------------------------------ AUC


def test_auc_separable_and_antiseparable(spark, tmp_path):
    from replicator_spark.queries.stats import auc_query

    base = str(tmp_path)
    # "hi" events hold the top half of values → AUC 1; "lo" the bottom
    evs = []
    for i in range(10):
        evs.append((i, i * 1_000_000, i, "hi", 100.0 + i, "{}"))
        evs.append((100 + i, i * 1_000_000, i, "lo", float(i), "{}"))
    _write_events(spark, base, evs)
    by_type = {r["event_type"]: r for r in auc_query(spark, base).collect()}
    assert by_type["hi"]["auc"] == 1.0
    assert by_type["lo"]["auc"] == 0.0
    assert by_type["hi"]["n_pos"] == 10


def test_auc_ties_give_half_credit(spark, tmp_path):
    from replicator_spark.queries.stats import auc_query

    base = str(tmp_path)
    # all values identical → every pair is a tie → AUC = 0.5 exactly
    _write_events(
        spark,
        base,
        [(i, 0, i, "a" if i % 2 else "b", 7.0, "{}") for i in range(8)],
    )
    for r in auc_query(spark, base).collect():
        assert r["auc"] == 0.5


# ------------------------------------------------ Markov transitions


def test_markov_rows_are_distributions(spark, sf_dir):
    from replicator_spark.queries.analytics import markov_transitions_query

    rows = markov_transitions_query(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["src_type"]] = by_src.get(r["src_type"], 0.0) + r["p"]
    for total in by_src.values():
        assert abs(total - 1.0) < 1e-4  # each row sums to 1


def test_markov_deterministic_chain(spark, tmp_path):
    from replicator_spark.queries.analytics import markov_transitions_query

    base = str(tmp_path)
    # one user: a → b → a → b → a: P(b|a)=1 over 2 transitions,
    # P(a|b)=1 over 2 transitions
    _write_events(
        spark,
        base,
        [
            (i, i * 1_000_000_000, 1, "a" if i % 2 == 0 else "b", 0.0, "{}")
            for i in range(5)
        ],
    )
    rows = {
        (r["src_type"], r["dst_type"]): r
        for r in markov_transitions_query(spark, base).collect()
    }
    assert rows[("a", "b")]["n_trans"] == 2
    assert rows[("a", "b")]["p"] == 1.0
    assert rows[("b", "a")]["n_trans"] == 2
    assert rows[("b", "a")]["p"] == 1.0
    assert len(rows) == 2  # the final event has no successor


# ------------------------------------------------ theta sketch ops


def test_theta_ops_consistency(spark, sf_dir):
    from replicator_spark.pipeline.sketches import theta_ops_query

    r = theta_ops_query(spark, sf_dir).collect()[0]
    # sketch algebra must be internally consistent
    assert abs(
        (r["est_a"] + r["est_b"] - r["est_inter"]) - r["est_union"]
    ) < 0.1
    # estimates within 3 standard errors (~1/sqrt(K−2) ≈ 13%) of exact
    for est, exact in (
        (r["est_union"], r["exact_union"]),
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
    ):
        if exact:
            assert abs(est - exact) / exact < 0.4
    assert r["exact_union"] <= r["exact_a"] + r["exact_b"]
    assert r["exact_inter"] >= r["exact_a"] + r["exact_b"] - r["exact_union"] - 1


# ------------------------------------------------ streaming near-dedup


def test_stream_near_dedup_drops_later_copy(spark, tmp_path):
    from replicator_spark.streaming.near_dedup import stream_near_dedup_query

    base = str(tmp_path)
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    _write_docs(
        spark,
        base,
        [
            (1, dup, "en", "first", 10),
            (2, dup, "en", "later", 10),  # exact copy, higher doc_id
            (3, "one two three four five six seven eight", "en", "uniq", 10),
        ],
    )
    by_src = {
        r["source"]: r
        for r in stream_near_dedup_query(spark, base).collect()
    }
    assert by_src["first"]["n_kept"] == 1
    assert by_src["later"]["n_dropped"] == 1
    assert by_src["uniq"]["n_kept"] == 1


@pytest.mark.slow  # multibatch golden family (see conftest)
def test_stream_near_dedup_multibatch_matches_single(spark, sf_dir, tmp_path):
    """The admission verdicts must be a pure function of the dataset:
    splitting the stream into 3 doc_id-ordered micro-batches gives the
    same per-source tally as the single-batch run."""
    import glob
    import shutil
    import time

    from replicator_spark.streaming.near_dedup import (
        build_verdict_stream,
        stream_near_dedup_query,
    )

    base = str(tmp_path)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    lo, hi = ids[n // 3], ids[2 * n // 3]
    chunks_dir = os.path.join(base, "docs_dir")
    os.makedirs(chunks_dir)
    now = time.time()
    for i, part in enumerate(
        (
            docs.where(F.col("doc_id") <= lo),
            docs.where((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
            docs.where(F.col("doc_id") > hi),
        )
    ):
        d = os.path.join(base, f"chunk{i}")
        part.coalesce(1).write.parquet(d)
        (f,) = glob.glob(os.path.join(d, "part-*.parquet"))
        dst = os.path.join(chunks_dir, f"{i:03d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_dir)
    )
    out_dir = os.path.join(base, "run")
    q = (
        build_verdict_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "out"))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    verd = (
        spark.read.parquet(os.path.join(out_dir, "out"))
        .groupBy("doc_id")
        .agg(F.min(F.col("admitted").cast("int")).alias("kept"))
    )
    multi = {
        r["source"]: (r["n_kept"], r["n_dropped"])
        for r in docs.select("doc_id", "source")
        .join(verd, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("kept").cast("bigint").alias("n_kept"),
            (F.count("*") - F.sum("kept")).cast("bigint").alias("n_dropped"),
        )
        .collect()
    }
    single = {
        r["source"]: (r["n_kept"], r["n_dropped"])
        for r in stream_near_dedup_query(spark, sf_dir).collect()
    }
    assert multi == single


def test_theta_ops_exact_identities(spark, sf_dir):
    from replicator_spark.pipeline.sketches import theta_ops_query

    r = theta_ops_query(spark, sf_dir).collect()[0]
    # inclusion-exclusion holds exactly on the exact columns
    assert r["exact_union"] == r["exact_a"] + r["exact_b"] - r["exact_inter"]


# ------------------------------------------------ Gini coefficient


def test_gini_equal_and_concentrated(spark, tmp_path):
    from replicator_spark.queries.stats import gini_query

    base = str(tmp_path)
    rows = []
    # "flat": every doc the same length → G = 0
    for i in range(10):
        rows.append((i, "w", "en", "flat", 100))
    # "conc": one giant, nine tiny → G near (n-1)/n · (1 - small corr)
    rows.append((100, "w", "en", "conc", 10000))
    for i in range(9):
        rows.append((101 + i, "w", "en", "conc", 1))
    _write_docs(spark, base, rows)
    by_src = {r["source"]: r for r in gini_query(spark, base).collect()}
    assert by_src["flat"]["gini"] == 0.0
    assert by_src["conc"]["gini"] > 0.85
    assert by_src["conc"]["total_chars"] == 10009


def test_gini_bounded_on_corpus(spark, sf_dir):
    from replicator_spark.queries.stats import gini_query

    for r in gini_query(spark, sf_dir).collect():
        assert 0.0 <= r["gini"] < 1.0


# ------------------------------------------------ assortativity


def test_assortativity_bounded(spark, sf_dir):
    from replicator_spark.queries.graph import assortativity_query

    r = assortativity_query(spark, sf_dir).collect()[0]
    assert r["n_edge_ends"] > 0
    assert r["n_edge_ends"] % 2 == 0  # both directions of each edge
    assert -1.0 <= r["assortativity"] <= 1.0


# ------------------------------------------------ mutual kNN graph


def test_knn_graph_mutual_and_canonical(spark, sf_dir):
    import math

    from replicator_spark.pipeline.similarity import TOP_K, knn_graph_query
    from replicator_spark.session import read_table

    edges = knn_graph_query(spark, sf_dir).collect()
    assert edges
    seen = set()
    deg: dict[int, int] = {}
    for e in edges:
        assert e["a"] < e["b"]  # canonical orientation, each edge once
        assert (e["a"], e["b"]) not in seen
        seen.add((e["a"], e["b"]))
        assert -1.0 <= e["cosine"] <= 1.0
        deg[e["a"]] = deg.get(e["a"], 0) + 1
        deg[e["b"]] = deg.get(e["b"], 0) + 1
    # mutual-kNN degree is bounded by k on BOTH endpoints
    assert max(deg.values()) <= TOP_K
    # cell restriction: every edge joins two vectors of the SAME
    # corpus-scaled hyperplane cell (quantizer recomputed here in pure
    # Python), and the reported cosine matches a direct recompute
    from replicator_spark.pipeline.similarity import (
        _KNN_PLANES,
        KNN_MAX_PLANES,
        KNN_TARGET_CELL,
    )

    rows = read_table(spark, sf_dir, "embeddings").collect()
    vec = {r["vec_id"]: r["embedding"] for r in rows}
    n = len(rows)
    h = max(
        1,
        sum(n > (KNN_TARGET_CELL << j) for j in range(KNN_MAX_PLANES)),
    )

    def cell(x):
        c = 0
        for p in range(h):
            proj = 0.0
            for xi, wi in zip(x, _KNN_PLANES[p]):
                proj += float(xi) * wi
            if proj > 0:
                c += 1 << p
        return c

    for a, b in list(seen)[:25]:
        assert cell(vec[a]) == cell(vec[b])

    def cos(x, y):
        d = sum(a * b for a, b in zip(x, y))
        return d / (
            math.sqrt(sum(a * a for a in x)) * math.sqrt(sum(b * b for b in y))
        )

    for e in edges[:10]:
        assert abs(e["cosine"] - cos(vec[e["a"]], vec[e["b"]])) < 1e-5


# ------------------------------------------------ RFM segmentation


def test_rfm_segments_partition_users(spark, sf_dir):
    from replicator_spark.queries.funnel import rfm_segments_query
    from replicator_spark.session import read_table

    rows = rfm_segments_query(spark, sf_dir).collect()
    assert rows
    segs = {r["segment"] for r in rows}
    assert segs <= {
        a + b + c for a in "Rr" for b in "Ff" for c in "Mm"
    }
    n_users = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users  # exact partition


def test_rfm_known_split(spark, tmp_path):
    from replicator_spark.queries.funnel import rfm_segments_query

    base = str(tmp_path)
    # 2 users: user 1 recent+frequent+big spender, user 2 the opposite
    evs = [
        (1, 10**15, 1, "view", 100.0, "{}"),
        (2, 2 * 10**15, 1, "view", 100.0, "{}"),
        (3, 3 * 10**15, 1, "view", 100.0, "{}"),
        (4, 10**15, 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, base, evs)
    by_seg = {r["segment"]: r for r in rfm_segments_query(spark, base).collect()}
    assert by_seg["RFM"]["n_users"] == 1
    assert by_seg["rfm"]["n_users"] == 1


# ------------------------------------------------ hashing vectorizer


def test_hashing_vectorizer_counts_and_norm(spark, tmp_path):
    from replicator_spark.pipeline.text import (
        HASH_DIMS,
        hashing_vectorizer_query,
    )

    base = str(tmp_path)
    _write_docs(spark, base, [(1, "a a a b", "en", "s", 7)])
    rows = hashing_vectorizer_query(spark, base).collect()
    # 'a' and 'b' land in (at most) two dims; counts must total 4
    assert sum(r["cnt"] for r in rows) == 4
    assert all(0 <= r["dim"] < HASH_DIMS for r in rows)
    if len(rows) == 2:
        # norm = sqrt(3² + 1²) on both rows
        import math

        for r in rows:
            assert abs(r["l2_norm"] - math.sqrt(10)) < 1e-6


def test_hashing_vectorizer_dims_bounded(spark, sf_dir):
    from replicator_spark.pipeline.text import (
        HASH_DIMS,
        hashing_vectorizer_query,
    )

    df = hashing_vectorizer_query(spark, sf_dir)
    assert df.groupBy("doc_id").count().agg({"count": "max"}).collect()[0][
        0
    ] <= HASH_DIMS


# ------------------------------------------------ k-core peel


def test_kcore_monotone_shrink(spark, sf_dir):
    from replicator_spark.queries.graph import kcore_query

    rows = {r["round"]: r["n_alive"] for r in kcore_query(spark, sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # peeling is monotone: survivors never grow
    assert rows[0] >= rows[1] >= rows[2] >= rows[3]


def test_kcore_star_collapses(spark, tmp_path):
    """A star graph has no 3-core: leaves (degree 1) peel in round 1,
    leaving the hub alone (degree 0), which peels in round 2."""
    from replicator_spark.queries.graph import kcore_query

    base = str(tmp_path)
    # lineitem shaped so parts {0..5} form a star around part 0: each
    # order pairs part 0 with one leaf, twice over (TRI_SUPPORT = 2)
    rows = []
    oid = 0
    for leaf in range(1, 6):
        for _ in range(2):
            rows.append((oid, 0, 1))
            rows.append((oid, leaf, 1))
            oid += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long"
    ).write.parquet(os.path.join(base, "lineitem.parquet"))
    out = {r["round"]: r["n_alive"] for r in kcore_query(spark, base).collect()}
    assert out[0] == 6  # hub + 5 leaves
    assert out[1] == 1  # hub survives round 1 (degree 5 >= 3)
    assert out[2] == 0  # alone now, degree 0 -> peels
    assert out[3] == 0


# ------------------------------------ invariants of the rank statistics


def test_auc_invariant_under_monotone_transform(spark, tmp_path):
    """AUC depends only on the RANKING of scores: squaring every
    (positive) value must not change any per-type AUC."""
    from replicator_spark.queries.funnel import _events_us  # noqa: F401
    from replicator_spark.queries.stats import auc_query

    base_a, base_b = str(tmp_path / "a"), str(tmp_path / "b")
    evs = [
        (i, i * 10**9, i % 7, ["x", "y", "z"][i % 3], float((i * 37) % 101) + 1.0, "{}")
        for i in range(120)
    ]
    _write_events(spark, base_a, evs)
    _write_events(
        spark, base_b, [(e, t, u, ty, v * v, p) for e, t, u, ty, v, p in evs]
    )
    a = {r["event_type"]: r["auc"] for r in auc_query(spark, base_a).collect()}
    b = {r["event_type"]: r["auc"] for r in auc_query(spark, base_b).collect()}
    assert a == b


def test_spearman_invariant_under_monotone_transform(spark, tmp_path):
    """Spearman is a rank statistic: cubing n_chars (strictly monotone
    on positives) must leave every per-lang rho unchanged."""
    from replicator_spark.queries.stats import spearman_query

    base_a, base_b = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [
        (i, "w " * ((i * 13) % 29 + 1), ["en", "fr"][i % 2], "s", (i * 7) % 31 + 1)
        for i in range(80)
    ]
    _write_docs(spark, base_a, [(d, t.strip(), l, s, n) for d, t, l, s, n in rows])
    _write_docs(
        spark, base_b, [(d, t.strip(), l, s, n**3) for d, t, l, s, n in rows]
    )
    a = {r["lang"]: r["spearman_rho"] for r in spearman_query(spark, base_a).collect()}
    b = {r["lang"]: r["spearman_rho"] for r in spearman_query(spark, base_b).collect()}
    assert a == b


def test_gini_scale_invariant(spark, tmp_path):
    """Gini is scale-free: multiplying every length by 7 must not move
    the coefficient."""
    from replicator_spark.queries.stats import gini_query

    base_a, base_b = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(i, "w", "en", "s", (i * 11) % 97 + 1) for i in range(60)]
    _write_docs(spark, base_a, rows)
    _write_docs(spark, base_b, [(d, t, l, s, n * 7) for d, t, l, s, n in rows])
    ga = gini_query(spark, base_a).collect()[0]["gini"]
    gb = gini_query(spark, base_b).collect()[0]["gini"]
    assert ga == gb


# ------------------------------------------------ Bloom decontamination


def test_bloom_decontam_no_false_negatives(spark, sf_dir):
    """Bloom membership has no false negatives: every exactly-flagged
    doc must be bloom-flagged, and the overcount must be exactly the
    false positives."""
    from replicator_spark.pipeline.curation import bloom_decontam_query

    r = bloom_decontam_query(spark, sf_dir).collect()[0]
    assert r["n_bloom_flagged"] >= r["n_exact_flagged"]
    assert r["n_bloom_flagged"] == r["n_exact_flagged"] + r["n_false_pos"]
    assert 0.0 <= r["fp_doc_rate"] <= 1.0
    assert r["n_train_docs"] > 0


# ------------------------------------------------ Matryoshka fidelity


def test_matryoshka_delta_grows_as_dims_shrink(spark, sf_dir):
    from replicator_spark.pipeline.similarity import (
        MATRYOSHKA_DIMS,
        matryoshka_fidelity_query,
    )

    rows = {
        r["dim"]: r for r in matryoshka_fidelity_query(spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(MATRYOSHKA_DIMS)
    # all budgets score the same pair set
    assert len({r["n_pairs"] for r in rows.values()}) == 1
    # truncating harder must lose at least as much cosine structure
    assert (
        rows[8]["mean_abs_delta"]
        >= rows[16]["mean_abs_delta"]
        >= rows[32]["mean_abs_delta"]
        >= 0.0
    )
    for r in rows.values():
        assert r["max_abs_delta"] >= r["mean_abs_delta"]


# ------------------------------------------------ Benford audit


def test_benford_shares_and_digits(spark, sf_dir):
    from replicator_spark.queries.dq import benford_query

    rows = benford_query(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_p"] for r in rows) - 1.0) < 1e-4
    # Benford expectations are a fixed distribution summing to 1
    import math

    for r in rows:
        assert abs(r["benford_p"] - round(math.log10(1 + 1 / r["digit"]), 6)) < 1e-9
        assert abs(r["abs_dev"] - round(abs(r["obs_p"] - r["benford_p"]), 6)) < 1e-9


# ------------------------------------------------ Welch t-test


def test_welch_ttest_zero_for_identical_groups(spark, tmp_path):
    from replicator_spark.queries.stats import welch_ttest_query

    base = str(tmp_path)
    rows = []
    for i in range(12):
        ln = 50 + (i % 4) * 10
        rows.append((i, "w", "en", "src0", ln))
        rows.append((100 + i, "w", "en", "src1", ln))  # mirror lengths
    _write_docs(spark, base, rows)
    r = welch_ttest_query(spark, base).collect()[0]
    assert r["t_stat"] == 0.0
    assert r["mean_a"] == r["mean_b"]
    assert r["n_a"] == r["n_b"] == 12


def test_welch_ttest_detects_shift(spark, tmp_path):
    from replicator_spark.queries.stats import welch_ttest_query

    base = str(tmp_path)
    rows = [(i, "w", "en", "src0", 100 + (i % 3)) for i in range(10)]
    rows += [(50 + i, "w", "en", "src1", 200 + (i % 3)) for i in range(10)]
    _write_docs(spark, base, rows)
    r = welch_ttest_query(spark, base).collect()[0]
    assert r["t_stat"] < -50  # enormous, clean separation
    assert 0 < r["welch_df"] <= 18.001


# ------------------------------------------------ autocorrelation


def test_autocorrelation_period_two_series(spark, tmp_path):
    """A strict high/low alternating daily series has acf_lag1 ≈ −1
    and acf_lag2 ≈ +1 (up to the missing-tail normalization)."""
    from replicator_spark.queries.temporal import autocorr_query

    base = str(tmp_path)
    evs = []
    eid = 0
    day_ns = 86400 * 10**9
    for d in range(14):
        for _ in range(30 if d % 2 == 0 else 10):
            evs.append((eid, d * day_ns, eid % 5, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, base, evs)
    r = autocorr_query(spark, base).collect()[0]
    assert r["n_days"] == 14
    assert r["acf_lag1"] < -0.7
    assert r["acf_lag2"] > 0.7
    assert r["acf_lag1"] < r["acf_lag2"]


# ------------------------------------------------ threshold sweep


def test_threshold_sweep_monotone(spark, sf_dir):
    """Raising the cutoff can only shrink the flagged set, and docs
    dropped never exceed pairs."""
    from replicator_spark.pipeline.dedup import (
        SWEEP_THRESHOLDS,
        threshold_sweep_query,
    )

    rows = {
        r["threshold"]: r
        for r in threshold_sweep_query(spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(round(t, 2) for t in SWEEP_THRESHOLDS)
    ordered = [rows[round(t, 2)] for t in sorted(SWEEP_THRESHOLDS)]
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["n_pairs"] >= hi["n_pairs"]
        assert lo["n_docs_dropped"] >= hi["n_docs_dropped"]
    for r in ordered:
        assert r["n_docs_dropped"] <= r["n_pairs"] or r["n_pairs"] == 0


# ------------------------------------------------ dataset card


def test_dataset_card_known_corpus(spark, tmp_path):
    from replicator_spark.pipeline.curation import dataset_card_query

    base = str(tmp_path)
    dup = "alpha beta gamma"
    _write_docs(
        spark,
        base,
        [
            (1, dup, "en", "s1", 16),
            (2, dup, "en", "s1", 16),  # exact duplicate
            (3, "delta epsilon", "fr", "s2", 13),
            (4, "alpha zeta", "en", "s2", 10),
        ],
    )
    r = dataset_card_query(spark, base).collect()[0]
    assert r["n_docs"] == 4
    assert r["n_tokens"] == 3 + 3 + 2 + 2
    assert r["vocab"] == 6  # alpha beta gamma delta epsilon zeta
    assert r["n_langs"] == 2 and r["n_sources"] == 2
    assert r["exact_dup_rate"] == 0.25  # 3 distinct of 4
    assert r["mean_doc_tokens"] == 2.5
    assert r["median_doc_tokens"] == 2.5


# ------------------------------------------------ version depth


def test_version_depth_shares_sum_to_one(spark, sf_dir):
    from replicator_spark.sinks.timemachine import version_depth_query

    rows = version_depth_query(spark, sf_dir).collect()
    assert rows
    per_table: dict[str, float] = {}
    for r in rows:
        assert r["depth"] >= 1
        per_table[r["table_name"]] = (
            per_table.get(r["table_name"], 0.0) + r["share"]
        )
    for share in per_table.values():
        assert abs(share - 1.0) < 1e-4


# ------------------------------------------------ peak concurrency


def test_peak_concurrency_overlapping_sessions(spark, tmp_path):
    from replicator_spark.pipeline.sessions import peak_concurrency_query

    base = str(tmp_path)
    m = 60 * 1000 * 10**6  # minute in ns
    evs = [
        # three users online in overlapping windows: u1 0-10min,
        # u2 5-15min, u3 12-20min → peak 2 (u1+u2, then u2+u3)
        (1, 0 * m, 1, "view", 0.0, "{}"),
        (2, 10 * m, 1, "view", 0.0, "{}"),
        (3, 5 * m, 2, "view", 0.0, "{}"),
        (4, 15 * m, 2, "view", 0.0, "{}"),
        (5, 12 * m, 3, "view", 0.0, "{}"),
        (6, 20 * m, 3, "view", 0.0, "{}"),
    ]
    _write_events(spark, base, evs)
    r = peak_concurrency_query(spark, base).collect()[0]
    assert r["n_sessions"] == 3
    assert r["peak_concurrent"] == 2


def test_peak_concurrency_bounds(spark, sf_dir):
    from replicator_spark.pipeline.sessions import peak_concurrency_query

    r = peak_concurrency_query(spark, sf_dir).collect()[0]
    assert 1 <= r["peak_concurrent"] <= r["n_sessions"]


# ------------------------------------------------ order audit


def test_order_audit_detects_inversion(spark, tmp_path):
    from replicator_spark.cdc.metrics import order_audit_query

    base = str(tmp_path)
    us = 10**3  # ns per µs
    _write_events(
        spark,
        base,
        [
            (1, 100 * us, 1, "a", 0.0, "{}"),
            (2, 300 * us, 1, "a", 0.0, "{}"),
            (3, 200 * us, 1, "a", 0.0, "{}"),  # goes backwards by 100µs
            (4, 400 * us, 1, "a", 0.0, "{}"),
        ],
    )
    r = {r["event_type"]: r for r in order_audit_query(spark, base).collect()}
    assert r["a"]["n_inversions"] == 1
    assert r["a"]["max_backstep_us"] == 100
    assert r["a"]["n_steps"] == 3


def test_order_audit_clean_feed_is_zero(spark, sf_dir):
    from replicator_spark.cdc.metrics import order_audit_query

    for r in order_audit_query(spark, sf_dir).collect():
        assert r["inversion_rate"] >= 0.0
        assert r["n_inversions"] <= r["n_steps"]


# ------------------------------------------------ inter-arrival gaps


def test_interarrival_percentiles_ordered(spark, sf_dir):
    from replicator_spark.queries.funnel import interarrival_query

    r = interarrival_query(spark, sf_dir).collect()[0]
    assert r["n_gaps"] > 0
    assert (
        0
        <= r["p25_gap_s"]
        <= r["p50_gap_s"]
        <= r["p90_gap_s"]
        <= r["p99_gap_s"]
    )
    assert r["mean_gap_s"] > 0


# ------------------------------------------------ top paths


def test_top_paths_known_sequence(spark, tmp_path):
    from replicator_spark.queries.analytics import top_paths_query

    base = str(tmp_path)
    # one user repeating a>b>c: paths a>b>c, b>c>a, c>a>b cycle
    seq = ["a", "b", "c"] * 4
    _write_events(
        spark,
        base,
        [(i, i * 10**9, 1, t, 0.0, "{}") for i, t in enumerate(seq)],
    )
    rows = {r["path"]: r for r in top_paths_query(spark, base).collect()}
    assert rows["a>b>c"]["n"] == 4
    assert rows["b>c>a"]["n"] == 3
    assert rows["c>a>b"]["n"] == 3
    assert rows["a>b>c"]["rank"] == 1
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-4


def test_top_paths_ranked_and_bounded(spark, sf_dir):
    from replicator_spark.queries.analytics import (
        TOP_PATHS_N,
        top_paths_query,
    )

    rows = sorted(
        top_paths_query(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert 0 < len(rows) <= TOP_PATHS_N
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


# ------------------------------------------------ streaming JSONL sink


def test_stream_jsonl_sink_checksums_match_source(spark, sf_dir):
    """The streaming JSON writer must round-trip every value exactly:
    checksums over the re-read files equal checksums over the source
    table directly."""
    from pyspark.sql import functions as F2

    from replicator_spark.session import read_table
    from replicator_spark.sources.formats import (
        CHK_TS_MOD,
        stream_jsonl_sink_query,
    )

    got = {
        r["event_type"]: (
            r["n_events"], r["sum_event_id"], r["sum_ts_mod"],
            r["value_usum"],
        )
        for r in stream_jsonl_sink_query(spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: (
            r["n_events"], r["sum_event_id"], r["sum_ts_mod"],
            r["value_usum"],
        )
        for r in ev.groupBy("event_type")
        .agg(
            F2.count("*").alias("n_events"),
            F2.sum("event_id").cast("bigint").alias("sum_event_id"),
            F2.sum(F2.expr("ts div 1000000") % CHK_TS_MOD)
            .cast("bigint")
            .alias("sum_ts_mod"),
            F2.sum(
                F2.floor(F2.col("value") * F2.lit(1000000.0) + F2.lit(0.5))
            )
            .cast("bigint")
            .alias("value_usum"),
        )
        .collect()
    }
    assert got == want


# ------------------------------------------------ cell balance


def test_cell_balance_identities(spark, sf_dir):
    from replicator_spark.pipeline.similarity import cell_balance_query
    from replicator_spark.session import read_table

    r = cell_balance_query(spark, sf_dir).collect()[0]
    emb = read_table(spark, sf_dir, "embeddings")
    assert r["n_vectors"] == emb.count()
    assert r["n_cells"] == emb.select("label").distinct().count()
    assert r["load_factor"] >= 1.0
    assert 0.0 <= r["size_gini"] < 1.0
    assert r["max_cell"] >= r["mean_cell"]


# ------------------------------------------------ seasonality


def test_seasonality_pure_weekly_signal(spark, tmp_path):
    """A series that is a pure function of day-mod-7 must be fully
    explained by the seasonal means: R² = 1."""
    from replicator_spark.queries.temporal import seasonality_query

    base = str(tmp_path)
    day_ns = 86400 * 10**9
    evs = []
    eid = 0
    for d in range(28):
        for _ in range((d % 7) * 5 + 3):
            evs.append((eid, d * day_ns, eid % 4, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, base, evs)
    rows = seasonality_query(spark, base).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["seasonal_r2"] == 1.0
        assert r["n_days"] == 4
        # slot s was generated with exactly s*5+3 events every week
        assert r["slot_mean"] == r["slot"] * 5 + 3


def test_seasonality_r2_bounded(spark, sf_dir):
    from replicator_spark.queries.temporal import seasonality_query

    rows = seasonality_query(spark, sf_dir).collect()
    r2 = {r["seasonal_r2"] for r in rows}
    assert len(r2) == 1  # one corpus-level statistic repeated per slot
    assert 0.0 <= r2.pop() <= 1.0


# ------------------------------------------------ TS profile top-k


def test_ts_profile_identical_shapes_at_zero(spark, tmp_path):
    """Two users with PROPORTIONAL daily activity (one is 3x the
    other's volume) must z-normalize to identical profiles — distance
    0 — while a flat user stays distant: similarity is shape, not
    volume."""
    from replicator_spark.queries.temporal import ts_profile_topk_query

    base = str(tmp_path)
    day_ns = 86400 * 10**9
    evs = []
    eid = 0
    pattern = [1, 5, 2, 8, 3, 9, 1, 4]
    for d, burst in enumerate(pattern):
        for _ in range(burst):  # user 0: the pattern
            evs.append((eid, d * day_ns, 0, "view", 1.0, "{}")); eid += 1
        for _ in range(burst * 3):  # user 1: same shape, 3x volume
            evs.append((eid, d * day_ns, 1, "view", 1.0, "{}")); eid += 1
        for _ in range(4):  # user 2: flat
            evs.append((eid, d * day_ns, 2, "view", 1.0, "{}")); eid += 1
    _write_events(spark, base, evs)
    rows = {
        (r["query_user"], r["cand_user"]): r
        for r in ts_profile_topk_query(spark, base).collect()
    }
    assert rows[(0, 1)]["dist"] == 0.0
    assert rows[(0, 1)]["rank"] == 1
    assert rows[(0, 2)]["dist"] > 1.0


def test_ts_profile_topk_shape(spark, sf_dir):
    from replicator_spark.queries.temporal import (
        TS_N_QUERIES,
        TS_TOPK,
        ts_profile_topk_query,
    )

    rows = ts_profile_topk_query(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_user"], []).append(r)
    assert len(per_q) <= TS_N_QUERIES
    for q, rs in per_q.items():
        assert len(rs) == TS_TOPK
        ranked = sorted(rs, key=lambda r: r["rank"])
        dists = [r["dist"] for r in ranked]
        assert dists == sorted(dists)  # rank follows distance


# ------------------------------------------------ perceptual-hash dedup


def test_phash_identical_payloads_pair_at_zero(spark, tmp_path):
    from replicator_spark.pipeline.multimodal import (
        multimodal_phash_dedup_query,
    )

    base = str(tmp_path)
    same = "pattern one two three four five six seven eight nine"
    _write_docs(
        spark,
        base,
        [
            (1, same, "en", "s", 52),
            (2, same, "en", "s", 52),  # identical bytes → hamming 0
            (3, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo", "en",
             "s", 47),
        ],
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal_phash_dedup_query(spark, base).collect()
    }
    assert rows.get((1, 2)) == 0


def test_phash_hamming_bounds(spark, sf_dir):
    from replicator_spark.pipeline.multimodal import (
        PHASH_MAX_HAMMING,
        multimodal_phash_dedup_query,
    )

    for r in multimodal_phash_dedup_query(spark, sf_dir).collect():
        assert 0 <= r["hamming"] <= PHASH_MAX_HAMMING
        assert r["doc_a"] < r["doc_b"]


# ------------------------------------------------ recall curve


def test_recall_curve_consistent_with_recall_at_k(spark, sf_dir):
    from replicator_spark.pipeline.similarity import (
        RECALL_K_GRID,
        TOP_K,
        recall_at_k_query,
        recall_curve_query,
    )

    curve = {
        (r["query_id"], r["k"]): r
        for r in recall_curve_query(spark, sf_dir).collect()
    }
    n_queries = len({q for q, _ in curve})
    assert len(curve) == n_queries * len(RECALL_K_GRID)
    for (q, k), r in curve.items():
        assert 0 <= r["n_hits"] <= k
        assert r["recall"] == round(r["n_hits"] / k, 6)
    # at k = TOP_K the curve must agree with the single-k operator
    at_k = {
        r["query_id"]: r["n_hits"]
        for r in recall_at_k_query(spark, sf_dir).collect()
    }
    for q, hits in at_k.items():
        assert curve[(q, TOP_K)]["n_hits"] == hits


# ------------------------------------------------ BPE trainer


def _bpe_replay(word_freqs: dict, n_merges: int):
    """Reference BPE (Sennrich et al.): greedy left-to-right merge of
    the (count desc, lexicographic asc) winning pair each round."""
    words = [(list(w), f) for w, f in sorted(word_freqs.items())]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), total = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, total))
        new_words = []
        for syms, f in words:
            acc: list = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            new_words.append((acc, f))
        words = new_words
    return merges


def test_bpe_train_matches_python_replay(spark, sf_dir):
    from replicator_spark.pipeline.mixture import (
        N_BPE_MERGES,
        bpe_train_query,
    )
    from replicator_spark.pipeline.text import ws_tokens
    from replicator_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    freqs: dict = {}
    for r in docs.select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    ).collect():
        freqs[r["w"]] = freqs.get(r["w"], 0) + 1
    want = _bpe_replay(freqs, N_BPE_MERGES)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"],
         r["weighted_count"])
        for r in bpe_train_query(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_bpe_train_overlapping_run_is_greedy(spark, tmp_path):
    """'aaaa' with merge (a,a) must tokenize greedily to [aa, aa] —
    the left-to-right rule, not an overlap double-count."""
    from replicator_spark.pipeline.mixture import bpe_train_query

    base = str(tmp_path)
    _write_docs(spark, base, [(1, "aaaa aaaa baaa", "en", "s", 14)])
    rows = {
        r["merge_rank"]: r
        for r in bpe_train_query(spark, base).collect()
    }
    # round 1: (a,a) appears 3+3+3? No - weighted by word freq:
    # 'aaaa' freq 2 contributes 3 adjacencies each, 'baaa' 2 -> 8
    assert rows[1]["merged"] == "aa"
    assert rows[1]["weighted_count"] == 8
    # round 2: words are [aa,aa]x2 and [b,aa,a]... greedy fold of baaa
    # = [b, aa, a] so pairs: (aa,aa)x2, (b,aa)x1, (aa,a)x1
    assert rows[2]["left"] == "aa" and rows[2]["right"] == "aa"
    assert rows[2]["weighted_count"] == 2


def test_bpe_encode_consistent_with_trainer(spark, sf_dir):
    """Encoder stats must be the arithmetic of the trained vocab: per
    source, n_bpe_tokens = Σ size(final syms of word) over the token
    stream, bounded by [n_words, n_chars], and ratio consistent."""
    from replicator_spark.pipeline.mixture import (
        _bpe_train,
        _bpe_words,
        bpe_encode_query,
    )
    from replicator_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    trained, _ = _bpe_train(_bpe_words(docs))
    n_sym = {r["w"]: len(r["syms"]) for r in trained.collect()}
    rows = bpe_encode_query(spark, sf_dir).collect()
    assert rows
    from replicator_spark.pipeline.text import ws_tokens

    tokd = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    ).collect()
    want: dict = {}
    for r in tokd:
        s = want.setdefault(r["source"], [0, 0, 0])
        s[0] += 1
        s[1] += len(r["w"])
        s[2] += n_sym[r["w"]]
    for r in rows:
        w0, c0, t0 = want[r["source"]]
        assert (r["n_words"], r["n_chars"], r["n_bpe_tokens"]) == (w0, c0, t0)
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"]
        assert abs(r["chars_per_token"] - round(c0 / t0, 6)) < 1e-9


# ------------------------------------------------ net-effect compaction


def test_net_effect_matches_python_model(spark, sf_dir):
    """Re-derive every key's net mutation with a plain-Python replay of
    the feed and require exact agreement — the collapse rule is the
    operator's whole contract."""
    from replicator_spark.cdc.apply import NULL_SENTINEL, net_effect_query
    from replicator_spark.cdc.envelope import change_feed

    feed = [
        r.asDict()
        for r in change_feed(spark, sf_dir)
        .where(F.col("op").isin("INSERT", "UPDATE", "DELETE"))
        .collect()
    ]
    runs: dict[int, list] = {}
    for r in sorted(feed, key=lambda r: (r["ts_ms"], r["event_id"])):
        runs.setdefault(r["user_id"], []).append(r)
    model = {}
    for uid, rs in runs.items():
        first, last = rs[0]["op"], rs[-1]["op"]
        if first == "INSERT" and last == "DELETE":
            continue  # net no-op
        net = (
            "DELETE"
            if last == "DELETE"
            else "INSERT" if first == "INSERT" else "UPDATE"
        )
        v = (
            NULL_SENTINEL
            if net == "DELETE"
            else (
                str(rs[-1]["value_after"])
                if rs[-1]["value_after"] is not None
                else NULL_SENTINEL
            )
        )
        model[uid] = (net, v, len(rs))
    got = {
        r["user_id"]: (r["net_op"], r["value"], r["n_collapsed"])
        for r in net_effect_query(spark, sf_dir).collect()
    }
    assert got == model


# ------------------------------------------------ format round-trips

HOSTILE_ROWS = [
    (1, 'quote " inside', "en", "s1", 14),
    (2, "comma, semicolon; pipe|", "en", "s1", 23),
    (3, "embedded\nnewline and\ttab", "en", "s2", 24),
    (4, "unicode: naïve café 中文 🚀", "zh", "s2", 24),
    (5, "trailing space ", "en", "s3", 15),
    (6, "", "en", "s3", 0),  # empty text
    (7, "backslash \\ and \\n literal", "en", "s3", 26),
]


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_format_roundtrip_hostile_content(spark, tmp_path, fmt):
    """The checksum oracle at corpus scale only proves benign text
    survives; this pins the hostile cases (quotes, delimiters,
    newlines, unicode, empties) byte-for-byte per format."""
    from replicator_spark.sources.formats import _roundtrip, _summary

    base = str(tmp_path)
    _write_docs(spark, base, HOSTILE_ROWS)
    got = {
        r["source"]: (r["n_docs"], r["sum_chars"], r["content_chk"])
        for r in _roundtrip(spark, base, fmt).collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["sum_chars"], r["content_chk"])
        for r in _summary(
            spark.read.parquet(os.path.join(base, "documents.parquet"))
        ).collect()
    }
    assert got == want


# ------------------------------------------------ SemDeDup cell dedup


def test_semantic_cells_matches_python_replay(spark, sf_dir):
    """Every verdict re-derived in pure Python: dup_of must be the MIN
    lower-id same-cell vector at cosine >= threshold; kept vectors must
    have no such cellmate."""
    import math

    from replicator_spark.pipeline.dedup import (
        SEMDEDUP_THRESHOLD,
        semantic_cells_query,
    )
    from replicator_spark.pipeline.similarity import (
        _KNN_PLANES,
        KNN_MAX_PLANES,
        KNN_TARGET_CELL,
    )
    from replicator_spark.session import read_table

    rows = read_table(spark, sf_dir, "embeddings").collect()
    vec = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    n = len(vec)
    h = max(
        1, sum(n > (KNN_TARGET_CELL << j) for j in range(KNN_MAX_PLANES))
    )

    def cell(x):
        c = 0
        for p in range(h):
            proj = 0.0
            for xi, wi in zip(x, _KNN_PLANES[p]):
                proj += xi * wi
            if proj > 0:
                c += 1 << p
        return c

    by_cell: dict = {}
    for vid, x in vec.items():
        by_cell.setdefault(cell(x), []).append(vid)

    def cos(a, b):
        d = sum(p * q for p, q in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(p * p for p in a))
                * math.sqrt(sum(q * q for q in b))
            ),
            6,
        )

    want: dict = {}
    for c, ids in by_cell.items():
        for vid in ids:
            cands = [
                o
                for o in ids
                if o < vid and cos(vec[vid], vec[o]) >= SEMDEDUP_THRESHOLD
            ]
            want[vid] = min(cands) if cands else None

    got = semantic_cells_query(spark, sf_dir).collect()
    assert len(got) == n
    for r in got:
        assert r["dup_of"] == want[r["vec_id"]], r["vec_id"]
        assert r["kept"] == (want[r["vec_id"]] is None)
    # the threshold actually fires on this corpus (non-trivial op)
    assert any(w is not None for w in want.values())


# ------------------------------------------------ cell-balanced sample


def test_cell_sample_matches_python_replay(spark, sf_dir):
    """Per cell: exactly the CELL_SAMPLE_K smallest md5(vec_id) ids are
    kept, ranks are consecutive from 1, and cell_size matches the
    quantizer recomputed in pure Python."""
    import hashlib

    from replicator_spark.pipeline.curation import (
        CELL_SAMPLE_K,
        cell_sample_query,
    )
    from replicator_spark.pipeline.similarity import (
        _KNN_PLANES,
        KNN_MAX_PLANES,
        KNN_TARGET_CELL,
    )
    from replicator_spark.session import read_table

    rows = read_table(spark, sf_dir, "embeddings").collect()
    vec = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    n = len(vec)
    h = max(
        1, sum(n > (KNN_TARGET_CELL << j) for j in range(KNN_MAX_PLANES))
    )

    def cell(x):
        c = 0
        for p in range(h):
            proj = 0.0
            for xi, wi in zip(x, _KNN_PLANES[p]):
                proj += xi * wi
            if proj > 0:
                c += 1 << p
        return c

    by_cell: dict = {}
    for vid, x in vec.items():
        by_cell.setdefault(cell(x), []).append(vid)
    want: dict = {}
    for c, ids in by_cell.items():
        order = sorted(
            ids,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )
        for rank, vid in enumerate(order[:CELL_SAMPLE_K], 1):
            want[vid] = (c, rank, len(ids))

    got = cell_sample_query(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r["cell"], r["rank_in_cell"], r["cell_size"]) == want[
            r["vec_id"]
        ], r["vec_id"]


# ------------------------------------------------ Poisson bootstrap


def test_bootstrap_ci_matches_python_replay(spark, sf_dir):
    """Full pure-Python replay: md5-sliced 16-bit uniforms, integer
    Poisson thresholds, Decimal-exact replicate sums — every output
    column must match exactly."""
    import hashlib
    import math as m
    from decimal import Decimal

    from replicator_spark.queries.stats import (
        _BOOT_T,
        BOOT_B,
        bootstrap_ci_query,
    )
    from replicator_spark.session import read_table

    rows = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).collect()
    n = len(rows)
    sx = Decimal(0)
    s = [Decimal(0)] * BOOT_B
    c = [0] * BOOT_B
    q = Decimal("0.0000000001")
    for r in rows:
        xdec = Decimal(r["l_quantity"]).quantize(q)
        sx += xdec
        key = f"{r['l_orderkey']}:{r['l_linenumber']}"
        h = [
            hashlib.md5(f"{key}:{g}".encode()).hexdigest() for g in range(2)
        ]
        for b in range(BOOT_B):
            u = int(h[b // 8][(b % 8) * 4 : (b % 8) * 4 + 4], 16)
            w = 7
            for k in range(len(_BOOT_T) - 1, -1, -1):
                if u < _BOOT_T[k]:
                    w = k
            s[b] += xdec * w
            c[b] += w
    means = sorted(float(s[b]) / c[b] for b in range(BOOT_B))
    mm = 0.0
    for x in means:
        mm += x
    mm /= BOOT_B
    acc = 0.0
    for x in means:
        acc += (x - mm) * (x - mm)
    se = m.sqrt(acc / (BOOT_B - 1))

    got = bootstrap_ci_query(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["point_mean"] == round(float(sx) / n, 6)
    assert got["boot_se"] == round(se, 9)
    assert got["ci_lo"] == round(means[1], 6)
    assert got["ci_hi"] == round(means[BOOT_B - 2], 6)
    assert got["b_replicates"] == BOOT_B
    assert got["ci_lo"] <= got["point_mean"] <= got["ci_hi"]


# ------------------------------------------------ CUSUM changepoint


def test_changepoint_detects_level_shift(spark, tmp_path):
    from replicator_spark.queries.temporal import changepoint_query

    base = str(tmp_path)
    day_ns = 86_400 * 10**9
    evs, eid = [], 0
    # asymmetric regimes (20 low, 10 high): the mean sits nearer the
    # low regime, so the UP statistic dominates the DOWN one (a
    # symmetric split makes them exactly equal)
    for d in range(30):
        per_day = 10 if d < 20 else 40
        for i in range(per_day):
            evs.append((eid, d * day_ns + i * 10**9, i, "a", 1.0, "{}"))
            eid += 1
    _write_events(spark, base, evs)
    r = changepoint_query(spark, base).collect()[0]
    assert r["n_days"] == 30
    assert bool(r["shift_detected"]) is True
    # evidence for the UP shift accumulates through the elevated
    # regime — peak lands on its last day
    assert r["up_day"] == 29
    assert r["up_cusum"] > r["down_cusum"]
    # the CHANGEPOINT estimate (last S=0 day before the peak) lands
    # on the day before the injected shift at day 20
    assert r["up_change_day"] == 19


def test_changepoint_flat_series_is_quiet(spark, tmp_path):
    from replicator_spark.queries.temporal import changepoint_query

    base = str(tmp_path)
    day_ns = 86_400 * 10**9
    evs, eid = [], 0
    for d in range(20):
        for i in range(10):  # perfectly constant daily volume
            evs.append((eid, d * day_ns + i * 10**9, i, "a", 1.0, "{}"))
            eid += 1
    _write_events(spark, base, evs)
    r = changepoint_query(spark, base).collect()[0]
    assert bool(r["shift_detected"]) is False
    assert r["up_cusum"] == 0.0
    assert r["down_cusum"] == 0.0
