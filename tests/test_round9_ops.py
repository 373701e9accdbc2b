"""Behavioral tests for the round-7 additions: exact substring-span
dedup, DSIR importance weights + Gumbel-top-k sample, CCNet LM-score
buckets, the AMS F2 sketch, MMR diverse selection, two-feature OLS,
the metrics-registry report, Mahalanobis embedding outliers, DP term
dispersion, per-doc token entropy, and week-over-week growth."""

from __future__ import annotations

import os

# ------------------------------------ exact substring-span dedup


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))


def test_substring_spans_merges_shared_run(spark, tmp_path):
    """A 10-token run shared by two docs yields ONE merged span of 10
    duplicated tokens in each (the three overlapping 8-grams merge);
    a unique doc reports zero."""
    from replicator_spark.pipeline.dedup import substring_spans_query

    base = str(tmp_path)
    shared = "a b c d e f g h i j"  # 10 tokens
    docs = [
        (0, shared + " u1 u2 u3 u4 u5 u6", "en", "s", 10),
        (1, "v1 v2 v3 " + shared + " w1 w2", "en", "s", 10),
        (2, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "en", "s", 10),
    ]
    _write_docs(spark, base, docs)
    rows = {
        r["doc_id"]: r
        for r in substring_spans_query(spark, base).collect()
    }
    assert rows[0]["n_spans"] == 1 and rows[0]["dup_tokens"] == 10
    assert rows[1]["n_spans"] == 1 and rows[1]["dup_tokens"] == 10
    assert rows[2]["n_spans"] == 0 and rows[2]["dup_tokens"] == 0
    assert rows[2]["dup_frac"] == 0.0


def test_substring_spans_counts_within_doc_repeats(spark, tmp_path):
    """A doc repeating its own 8-token phrase is self-duplicated: both
    occurrences mark spans (the corpus-wide occurrence count is >= 2
    even though only one doc is involved)."""
    from replicator_spark.pipeline.dedup import substring_spans_query

    base = str(tmp_path)
    phrase = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly 8 tokens
    docs = [
        (0, phrase + " mid1 mid2 " + phrase, "en", "s", 10),
        (1, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "s", 10),
    ]
    _write_docs(spark, base, docs)
    rows = {
        r["doc_id"]: r
        for r in substring_spans_query(spark, base).collect()
    }
    # two disjoint 8-token spans (positions 1-8 and 11-18)
    assert rows[0]["n_spans"] == 2 and rows[0]["dup_tokens"] == 16
    assert rows[1]["n_spans"] == 0


def test_substring_spans_short_docs_excluded(spark, tmp_path):
    from replicator_spark.pipeline.dedup import substring_spans_query

    base = str(tmp_path)
    docs = [
        (0, "only three tokens", "en", "s", 10),
        (1, "a1 a2 a3 a4 a5 a6 a7 a8", "en", "s", 10),
    ]
    _write_docs(spark, base, docs)
    got = {r["doc_id"] for r in substring_spans_query(spark, base).collect()}
    assert got == {1}


# ----------------------------------------- DSIR importance weights


def test_dsir_scores_target_language_higher(spark, tmp_path):
    """Docs made of target-language (en) tokens must score a higher
    average log importance ratio than docs of disjoint non-target
    tokens — the defining DSIR property."""
    from replicator_spark.pipeline.curation import dsir_weights_query

    base = str(tmp_path)
    docs = [
        (0, "alpha beta gamma alpha beta", "en", "s", 10),
        (1, "alpha beta gamma gamma", "en", "s", 10),
        (2, "zulu yankee xray zulu", "de", "s", 10),
        (3, "zulu xray yankee", "de", "s", 10),
    ]
    _write_docs(spark, base, docs)
    rows = {
        r["doc_id"]: r for r in dsir_weights_query(spark, base).collect()
    }
    assert len(rows) == 4
    for en_doc in (0, 1):
        for de_doc in (2, 3):
            assert rows[en_doc]["dsir_avg"] > rows[de_doc]["dsir_avg"]
    assert rows[0]["n_toks"] == 5


def test_dsir_deterministic(spark, sf_dir):
    from replicator_spark.pipeline.curation import dsir_weights_query

    a = sorted(map(tuple, dsir_weights_query(spark, sf_dir).collect()))
    b = sorted(map(tuple, dsir_weights_query(spark, sf_dir).collect()))
    assert a == b


# ------------------------------------------- CCNet LM-score buckets


def test_ccnet_buckets_partition_each_language(spark, sf_dir):
    """Every scored doc (>= 2 tokens) lands in exactly one bucket; per
    language the head mean LM score is >= the tail's."""
    from pyspark.sql import functions as F

    from replicator_spark.pipeline.lm import (
        bigram_lm_query,
        ccnet_buckets_query,
    )
    from replicator_spark.session import read_table

    rows = ccnet_buckets_query(spark, sf_dir).collect()
    per_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    n_scored = bigram_lm_query(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    docs = read_table(spark, sf_dir, "documents")
    lang_counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, buckets in per_lang.items():
        assert sum(r["n_docs"] for r in buckets.values()) <= lang_counts[lang]
        if "head" in buckets and "tail" in buckets:
            assert (
                buckets["head"]["mean_logp"] >= buckets["tail"]["mean_logp"]
            )


# ------------------------------------------------- AMS F2 sketch


def test_ams_f2_exact_and_estimate(spark, sf_dir):
    """exact_f2 equals the directly-computed second moment; the
    median-of-9 AMS estimate is positive, and rel_err is consistent
    with the reported columns."""
    from pyspark.sql import functions as F

    from replicator_spark.pipeline.sketches import ams_f2_query
    from replicator_spark.session import read_table

    (row,) = ams_f2_query(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    want = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
        .collect()[0]["f2"]
    )
    assert int(row["exact_f2"]) == int(want)
    assert int(row["ams_med"]) > 0
    got_err = abs(float(row["ams_med"]) - float(row["exact_f2"])) / float(
        row["exact_f2"]
    )
    assert abs(got_err - float(row["rel_err"])) < 1e-5


def test_ams_f2_deterministic(spark, sf_dir):
    from replicator_spark.pipeline.sketches import ams_f2_query

    a = ams_f2_query(spark, sf_dir).collect()
    b = ams_f2_query(spark, sf_dir).collect()
    assert a == b


# --------------------------------------------------- MMR selection


def test_mmr_picks_are_distinct_and_exclude_seed(spark, sf_dir):
    from pyspark.sql import functions as F

    from replicator_spark.pipeline.similarity import (
        MMR_K,
        mmr_select_query,
    )
    from replicator_spark.session import read_table

    rows = mmr_select_query(spark, sf_dir).collect()
    assert len(rows) == MMR_K
    picks = [r["vec_id"] for r in rows]
    assert len(set(picks)) == MMR_K
    emb = read_table(spark, sf_dir, "embeddings")
    seed = (
        emb.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(1)
        .collect()[0]["vec_id"]
    )
    assert seed not in picks
    # rank 0 maximizes pure relevance; its score is λ·rel exactly
    assert rows[0]["pick_rank"] == 0
    assert abs(rows[0]["score"] - 0.7 * rows[0]["rel"]) < 1e-5
    # later picks: score == λ·rel − (1−λ)·max-sim-to-prior-picks
    # (maxsim may be negative — a diversity bonus — so recompute it)
    import math

    from replicator_spark.pipeline.similarity import _as_double

    vmap = {
        r["vec_id"]: r["v"]
        for r in emb.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ).collect()
    }

    def cos(a, b):
        num = na = nb = 0.0
        for x, y in zip(a, b):
            num += x * y
            na += x * x
            nb += y * y
        return num / (math.sqrt(na) * math.sqrt(nb))

    for i, r in enumerate(rows[1:], start=1):
        maxsim = max(
            cos(vmap[r["vec_id"]], vmap[p]) for p in picks[:i]
        )
        want = 0.7 * r["rel"] - 0.3 * maxsim
        assert abs(r["score"] - want) < 1e-4


def test_mmr_diversifies_vs_pure_topk(spark, sf_dir):
    """The MMR picks' pairwise similarity must not exceed the pure
    relevance-top-K picks' pairwise similarity (that inequality is the
    point of the operator)."""
    import itertools

    from pyspark.sql import functions as F

    from replicator_spark.pipeline.similarity import (
        MMR_K,
        _as_double,
        mmr_select_query,
    )
    from replicator_spark.session import read_table

    def avg_pairwise_cos(vecs):
        import math

        def cos(a, b):
            num = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(a, b):
                num += x * y
                na += x * x
                nb += y * y
            return num / (math.sqrt(na) * math.sqrt(nb))

        pairs = list(itertools.combinations(vecs, 2))
        return sum(cos(a, b) for a, b in pairs) / len(pairs)

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    vmap = {r["vec_id"]: r["v"] for r in emb.collect()}
    mmr_rows = mmr_select_query(spark, sf_dir).collect()
    mmr_vecs = [vmap[r["vec_id"]] for r in mmr_rows]
    top_rel = [
        r["vec_id"]
        for r in sorted(
            mmr_rows, key=lambda r: (-r["rel"], r["vec_id"])
        )
    ]
    # pure top-K by relevance over the whole table
    seed_v = None
    import math

    # rebuild the seed's vector to rank all candidates by relevance
    from hashlib import md5 as _md5

    seed_id = min(
        vmap, key=lambda vid: (_md5(str(vid).encode()).hexdigest(), vid)
    )
    seed_v = vmap[seed_id]

    def cos_to_seed(v):
        num = na = nb = 0.0
        for x, y in zip(v, seed_v):
            num += x * y
            na += x * x
            nb += y * y
        return num / (math.sqrt(na) * math.sqrt(nb))

    ranked = sorted(
        ((cos_to_seed(v), vid) for vid, v in vmap.items()
         if vid != seed_id),
        key=lambda t: (-t[0], t[1]),
    )
    pure_vecs = [vmap[vid] for _, vid in ranked[:MMR_K]]
    assert (
        avg_pairwise_cos(mmr_vecs)
        <= avg_pairwise_cos(pure_vecs) + 1e-9
    )


# --------------------------------------------- two-feature OLS


def test_ols_multi_recovers_exact_linear_relation(spark, tmp_path):
    """y constructed as an exact linear function of the two features
    must come back with r2 == 1 and the planted coefficients."""
    import os

    base = str(tmp_path)
    rows = []
    # vary token count and distinct count independently
    for i in range(30):
        n_rep = 1 + (i % 5)          # repeated tokens
        n_uni = 2 + (i * 7) % 11     # unique tokens
        toks = ["rep"] * n_rep + [f"u{i}_{j}" for j in range(n_uni)]
        x1 = len(toks)
        x2 = n_uni + 1
        y = 3 + 2 * x1 + 5 * x2
        rows.append((i, " ".join(toks), "en", "s", y))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))
    from replicator_spark.queries.stats import ols_multi_query

    (got,) = ols_multi_query(spark, base).collect()
    assert got["n_docs"] == 30
    assert abs(got["b0"] - 3) < 1e-4
    assert abs(got["b1_tokens"] - 2) < 1e-4
    assert abs(got["b2_distinct"] - 5) < 1e-4
    assert abs(got["r2"] - 1.0) < 1e-6


# ------------------------------------------------ metrics report


def test_metrics_report_namespace_and_totals(spark, sf_dir):
    from pyspark.sql import functions as F

    from replicator_spark.cdc.metrics import metrics_report_query
    from replicator_spark.session import read_table

    rows = {
        r["metric"]: r for r in metrics_report_query(spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    total = ev.count()
    assert rows["replicator.supplier.events.total"]["value"] == total
    assert rows["replicator.supplier.events.total"]["mtype"] == "counter"
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n"))
        .collect()
    }
    applier_total = 0
    for t, n in per_type.items():
        r = rows[f"replicator.applier.events.{t}"]
        assert r["value"] == n and r["mtype"] == "counter"
        applier_total += r["value"]
    assert applier_total == total
    for g in (
        "replicator.coordinator.delay.txns.max",
        "replicator.coordinator.delay.ms.max",
        "replicator.coordinator.safe.txn.min",
    ):
        assert rows[g]["mtype"] == "gauge"
        assert rows[g]["value"] >= 0


# -------------------------------------- Mahalanobis outlier scores


def test_outlier_mahal_flags_planted_outlier(spark, tmp_path):
    """A vector far outside the per-dim distribution must take rank 1
    with a much larger score than the inliers."""
    import os
    import random

    base = str(tmp_path)
    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)], "en"))
    rows.append((999, [50.0] * 64, "en"))  # planted outlier
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    ).write.parquet(os.path.join(base, "embeddings.parquet"))
    from replicator_spark.pipeline.vectors import outlier_mahal_query

    got = outlier_mahal_query(spark, base).collect()
    assert got[0]["rank"] == 1 and got[0]["vec_id"] == 999
    others = [r["mahal_sq"] for r in got if r["vec_id"] != 999]
    assert got[0]["mahal_sq"] > 10 * max(others)


def test_outlier_mahal_topk_shape(spark, sf_dir):
    from replicator_spark.pipeline.vectors import (
        OUTLIER_K,
        outlier_mahal_query,
    )

    rows = outlier_mahal_query(spark, sf_dir).collect()
    assert len(rows) == OUTLIER_K
    assert [r["rank"] for r in rows] == list(range(1, OUTLIER_K + 1))
    scores = [r["mahal_sq"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


# --------------------------------------------- DP term dispersion


def test_dispersion_dp_separates_even_from_locked(spark, tmp_path):
    """A term spread proportionally across sources scores near 0; a
    term locked to one source scores near 1 - w_source."""
    import os

    base = str(tmp_path)
    docs = []
    did = 0
    # 4 sources, equal sizes; 'common' everywhere, 'locked' only in s0
    for s in range(4):
        for d in range(5):
            toks = ["common"] * 10
            if s == 0:
                toks += ["locked"] * 10
            else:
                toks += ["filler%d_%d" % (s, d)] * 10
            docs.append(
                (did, " ".join(toks), "en", f"src{s}", len(toks))
            )
            did += 1
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(base, "documents.parquet"))
    from replicator_spark.pipeline.diversity import dispersion_dp_query

    rows = {r["term"]: r for r in dispersion_dp_query(spark, base).collect()}
    assert rows["common"]["dp"] < 0.05
    assert rows["locked"]["dp"] > 0.5


# --------------------------------------------- DSIR Gumbel sample


def test_dsir_sample_is_deterministic_topk(spark, sf_dir):
    from replicator_spark.pipeline.curation import (
        DSIR_SAMPLE_K,
        dsir_sample_query,
    )

    a = dsir_sample_query(spark, sf_dir).collect()
    b = dsir_sample_query(spark, sf_dir).collect()
    assert a == b
    assert len(a) == DSIR_SAMPLE_K
    keys = [r["gumbel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert len({r["doc_id"] for r in a}) == DSIR_SAMPLE_K


def test_dsir_sample_prefers_target_like_docs(spark, tmp_path):
    """On a corpus larger than the sample size, importance resampling
    must overrepresent target-language (en) docs relative to their
    corpus share (sf0.001 has fewer docs than K, so build one)."""
    from replicator_spark.pipeline.curation import (
        DSIR_SAMPLE_K,
        dsir_sample_query,
    )

    base = str(tmp_path)
    docs = []
    for i in range(300):
        if i % 2 == 0:
            text = f"alpha beta gamma delta epsilon tok{i}"
            lang = "en"
        else:
            text = f"zulu yankee xray whisky victor tok{i}"
            lang = "de"
        docs.append((i, text, lang, "s", 10))
    _write_docs(spark, base, docs)
    rows = dsir_sample_query(spark, base).collect()
    assert len(rows) == DSIR_SAMPLE_K
    en_frac = sum(1 for r in rows if r["lang"] == "en") / len(rows)
    assert en_frac > 0.5  # corpus share is exactly 0.5


# ----------------------------------------------- token entropy


def test_token_entropy_extremes(spark, tmp_path):
    """All-same-token doc → entropy 0; all-distinct doc → normalized
    entropy 1 (H = ln n = ln V)."""
    import math

    base = str(tmp_path)
    docs = [
        (0, "a a a a a a a a", "en", "s", 10),
        (1, "b c d e f g h i", "en", "s", 10),
        (2, "x x y y", "en", "s", 10),
    ]
    _write_docs(spark, base, docs)
    from replicator_spark.pipeline.text import token_entropy_query

    rows = {
        r["doc_id"]: r for r in token_entropy_query(spark, base).collect()
    }
    assert rows[0]["entropy"] == 0.0 and rows[0]["entropy_norm"] == 0.0
    assert abs(rows[1]["entropy"] - math.log(8)) < 1e-5
    assert abs(rows[1]["entropy_norm"] - 1.0) < 1e-5
    # 2 types, uniform → H = ln 2, norm = 1
    assert abs(rows[2]["entropy"] - math.log(2)) < 1e-5
    assert rows[2]["n_toks"] == 4 and rows[2]["n_types"] == 2


# ------------------------------------------- week-over-week growth


def test_wow_growth_matches_weekly_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from replicator_spark.queries.temporal import (
        _WOW_WEEK,
        wow_growth_query,
    )
    from replicator_spark.session import read_table

    got = wow_growth_query(spark, sf_dir).collect()
    assert got, "expected at least one week-over-week row"
    weekly = {
        (r["event_type"], r["week"]): r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr(_WOW_WEEK).alias("week"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in got:
        assert weekly[(r["event_type"], r["week"])] == r["n_events"]
        want = (r["n_events"] - r["prev_events"]) / r["prev_events"]
        assert abs(r["wow_growth"] - want) < 1e-5


# --------------------------------------------- IVF nprobe sweep


def test_nprobe_sweep_monotone_and_bounded(spark, sf_dir):
    """Recall and candidate count must be non-decreasing in nprobe for
    each query, recall in [0, 1], and nprobe spans the grid."""
    from replicator_spark.pipeline.similarity import (
        NPROBE_GRID,
        nprobe_sweep_query,
    )

    rows = nprobe_sweep_query(spark, sf_dir).collect()
    per_q: dict[int, dict[int, object]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], {})[r["nprobe"]] = r
    assert per_q, "expected at least one query"
    for q, by_p in per_q.items():
        assert sorted(by_p) == list(NPROBE_GRID)
        recalls = [by_p[p]["recall_at_k"] for p in NPROBE_GRID]
        cands = [by_p[p]["n_cands"] for p in NPROBE_GRID]
        assert recalls == sorted(recalls)
        assert cands == sorted(cands)
        assert all(0.0 <= r <= 1.0 for r in recalls)


def test_nprobe_full_probe_matches_ivf_recall(spark, sf_dir):
    """At the grid's nprobe=N_PROBE point the sweep's hit count must
    equal recall of the existing ivf_topk operator (same probes, same
    truth) — the two ops must tell one consistent story."""
    from replicator_spark.pipeline.similarity import (
        N_PROBE,
        NPROBE_GRID,
        TOP_K,
        cosine_topk_query,
        ivf_topk_query,
        nprobe_sweep_query,
    )

    if N_PROBE not in NPROBE_GRID:
        return
    truth = {
        (r["query_id"], r["cand_id"])
        for r in cosine_topk_query(spark, sf_dir).collect()
    }
    ivf_hits: dict[int, int] = {}
    for r in ivf_topk_query(spark, sf_dir).collect():
        if r["rank"] <= TOP_K and (r["query_id"], r["cand_id"]) in truth:
            ivf_hits[r["query_id"]] = ivf_hits.get(r["query_id"], 0) + 1
    sweep = {
        r["query_id"]: r["n_hits"]
        for r in nprobe_sweep_query(spark, sf_dir).collect()
        if r["nprobe"] == N_PROBE
    }
    for q, n in sweep.items():
        assert ivf_hits.get(q, 0) == n


# --------------------------------------------- code detection


def test_code_detect_flags_code_not_prose(spark, tmp_path):
    from replicator_spark.pipeline.text import code_detect_query

    base = str(tmp_path)
    code = (
        "def main(); { int x = 1; if (x) { return x; } } "
        "import sys; class Foo { void bar(); }"
    )
    prose = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet green field all afternoon"
    )
    docs = [
        (0, code, "en", "s", len(code)),
        (1, prose, "en", "s", len(prose)),
    ]
    _write_docs(spark, base, docs)
    rows = {r["doc_id"]: r for r in code_detect_query(spark, base).collect()}
    assert rows[0]["is_code"] and not rows[1]["is_code"]
    assert rows[0]["code_score"] > rows[1]["code_score"]
    assert rows[1]["sym_count"] == 0 and rows[1]["kw_count"] == 0
    assert rows[0]["kw_count"] >= 6  # def/int/if/return/import/class/void
