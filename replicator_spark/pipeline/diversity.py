"""Corpus diversity analytics: pairwise source overlap (exact shingle
Jaccard) and per-source token-distribution entropy / KL divergence.

These are the data-mix diagnostics of a pretraining pipeline: overlap
answers "are two crawls/sources feeding me the same content?" (the
corpus-level complement of the pairwise doc dedup in dedup.py), and
entropy/KL answers "how diverse is each source's language, and how far
does it drift from the corpus mix?" — the signals that set mixture
weights (pipeline/mixture.py) and dedup aggressiveness.

Reference scope note: the reference engine (mysql-time-machine
replicator) has no corpus analytics — these extend the engine along
the brief's LLM-pipeline axis, same contract as pipeline/text.py.

Scale shapes (100 TB):
- source overlap: explode → DISTINCT (source, shingle) is the only
  corpus-sized exchange; after that everything is vocab- or
  source-bounded. Pairs are emitted from each shingle's sorted
  source-set (bounded by |sources| per shingle, NOT a corpus
  self-join), then one tiny agg over |sources|² keys. The full pair
  grid (including zero-overlap pairs) is a broadcast cross of the
  per-source size table — |sources| rows.
- entropy/KL: one token explode → combiner-backed (source, token)
  count agg (vocab×|sources| output); the marginals are aggs OVER THAT
  COUNT TABLE, not rescans of the corpus, and join back broadcast.

Float determinism across engines: same armor as lm.py / stats.py —
every log/ratio contribution is rounded to 9 dp and summed as DECIMAL
(order-exact), final display ratios computed in doubles on identical
inputs and rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table
from .text import ws_tokens

# ------------------------------------------------- pairwise source overlap


def source_shingles(docs: DataFrame) -> DataFrame:
    """(source, shingle) incidence rows — NOT deduplicated: every
    consumer aggregates with set/max semantics (collect_set, max of an
    indicator), which dedup map-side inside the combiner, so a
    separate DISTINCT exchange would only add a second corpus-sized
    shuffle for nothing.

    Shingles are built with arrays_zip over three shifted slices and
    exploded as the zipped array — NOT by exploding the lambda-built
    shingle array (dedup._shingles): a higher-order-function subtree
    under a Generate node is evaluated INTERPRETED and dominated the
    sf0.1 headliner at ~9 s where this native collection form runs the
    identical explode in 0.4 s (25×). Semantics are unchanged —
    arrays_zip NULL-pads the short slices and concat_ws drops NULLs,
    reproducing _shingles' partial shingles for < 3-token docs —
    so the SQL oracle is shared verbatim. (_shingles stays the right
    tool for the NARROW minhash path, where the array is consumed by
    array_min without a Generate.)"""
    toked = docs.select(
        "source", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    n = F.size("toks")
    zipped = F.arrays_zip(
        F.slice("toks", 1, F.greatest(n - 2, F.lit(1))),
        F.slice("toks", 2, F.greatest(n - 2, F.lit(1))),
        F.slice("toks", 3, F.greatest(n - 2, F.lit(1))),
    )
    return toked.select("source", F.explode(zipped).alias("z")).select(
        "source",
        F.concat_ws(
            " ", F.col("z.0"), F.col("z.1"), F.col("z.2")
        ).alias("g"),
    )


def source_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise source-to-source 3-gram-shingle Jaccard.

    Emits ALL ordered pairs (s1 < s2), including zero-overlap ones, so
    the result is the full |sources| choose 2 similarity matrix.
    """
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    sh = source_shingles(docs)
    # ONE corpus-sized exchange: collect_set dedups sources per gram in
    # the combiner. Everything downstream — per-source sizes included —
    # derives from this vocab-sized table, so the corpus is scanned and
    # shuffled exactly once.
    by_gram = sh.groupBy("g").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    sizes = (
        by_gram.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sh"))
    )
    # pairs from each shingle's sorted source set: |sources|-bounded per
    # shingle, so the expansion is linear in the gram table — never the
    # corpus² self-join shape.
    pair = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ss"), i + 2, F.greatest(F.size("ss") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("s1"), y.alias("s2")),
            ),
        )
    )
    inter = (
        by_gram.select(F.explode(pair).alias("p"))
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_inter"))
    )
    a = sizes.select(F.col("source").alias("s1"), F.col("n_sh").alias("n1"))
    b = sizes.select(F.col("source").alias("s2"), F.col("n_sh").alias("n2"))
    grid = a.crossJoin(F.broadcast(b)).where(F.col("s1") < F.col("s2"))
    out = grid.join(F.broadcast(inter), ["s1", "s2"], "left").withColumn(
        "n_inter", F.coalesce(F.col("n_inter"), F.lit(0))
    )
    union = F.col("n1") + F.col("n2") - F.col("n_inter")
    return out.select(
        "s1",
        "s2",
        "n1",
        "n2",
        "n_inter",
        union.alias("n_union"),
        F.round(
            F.col("n_inter").cast("double") / union.cast("double"), 6
        ).alias("jaccard"),
    )


# `s <> ''` guard: for a ZERO-token document, concat_ws over all-NULL
# toks[i] yields '' (which IS NOT NULL) — without the guard the oracle
# would emit one empty shingle where Spark's arrays_zip path emits no
# rows (round-4 advice item)
_SHINGLES_SQL = """
list_filter(
    list_transform(
        range(1, greatest(len(toks) - 2, 1) + 1),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
    s -> s IS NOT NULL AND s <> '')
"""

SOURCE_OVERLAP_SQL = f"""
WITH toked AS (
    SELECT source,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
), sh AS (
    SELECT DISTINCT source, g
    FROM toked, UNNEST({_SHINGLES_SQL}) AS u(g)
), sizes AS (
    SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source
), inter AS (
    SELECT x.source AS s1, y.source AS s2, COUNT(*) AS n_inter
    FROM sh x JOIN sh y ON x.g = y.g AND x.source < y.source
    GROUP BY x.source, y.source
)
SELECT a.source AS s1, b.source AS s2, a.n_sh AS n1, b.n_sh AS n2,
    COALESCE(i.n_inter, 0) AS n_inter,
    a.n_sh + b.n_sh - COALESCE(i.n_inter, 0) AS n_union,
    round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
          / CAST(a.n_sh + b.n_sh - COALESCE(i.n_inter, 0) AS DOUBLE), 6)
        AS jaccard
FROM sizes a JOIN sizes b ON a.source < b.source
LEFT JOIN inter i ON i.s1 = a.source AND i.s2 = b.source
"""

# ------------------------------------------------- entropy / KL divergence


def entropy_kl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram entropy H(s) = −Σ p·ln p and KL(s ‖ corpus).

    p_{t|s} and p_t are ratios of exact integer counts evaluated as
    double divisions (identical, correctly-rounded inputs in both
    engines); each summand is rounded to 9 dp and summed as DECIMAL so
    partition order can't perturb the statistic.
    """
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("t")
    )
    st = tok.groupBy("source", "t").agg(
        F.count("*").alias("c_st")
    ).persist()  # sources×vocab-sized (far below the token stream);
    # its four consumers (s_tot, t_tot, n, the join probe) each
    # re-scanned documents un-cached (r9 audit)
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    t_tot = st.groupBy("t").agg(F.sum("c_st").alias("c_t"))
    n = st.agg(F.sum("c_st").alias("n"))
    j = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(t_tot), "t")
        .crossJoin(F.broadcast(n))
    )
    p_ts = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    p_t = F.col("c_t").cast("double") / F.col("n").cast("double")
    ent_term = F.round(-p_ts * F.log(p_ts), 9).cast("decimal(20,9)")
    kl_term = F.round(p_ts * (F.log(p_ts) - F.log(p_t)), 9).cast(
        "decimal(20,9)"
    )
    return (
        j.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.round(F.sum(ent_term).cast("double"), 6).alias("entropy"),
            F.round(F.sum(kl_term).cast("double"), 6).alias("kl_vs_corpus"),
        )
    )


ENTROPY_KL_SQL = """
WITH tok AS (
    SELECT source, t
    FROM documents,
        UNNEST(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS u(t)
), st AS (
    SELECT source, t, COUNT(*) AS c_st FROM tok GROUP BY source, t
), s_tot AS (
    SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source
), t_tot AS (
    SELECT t, SUM(c_st) AS c_t FROM st GROUP BY t
), n AS (
    SELECT SUM(c_st) AS n FROM st
)
SELECT st.source,
    CAST(MAX(n_s) AS BIGINT) AS n_tokens,
    COUNT(*) AS vocab,
    round(CAST(SUM(CAST(round(
        -(CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        * ln(CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)), 9)
        AS DECIMAL(20,9))) AS DOUBLE), 6) AS entropy,
    round(CAST(SUM(CAST(round(
        (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        * (ln(CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
           - ln(CAST(c_t AS DOUBLE) / CAST(n.n AS DOUBLE))), 9)
        AS DECIMAL(20,9))) AS DOUBLE), 6) AS kl_vs_corpus
FROM st
JOIN s_tot USING (source)
JOIN t_tot USING (t)
CROSS JOIN n
GROUP BY st.source
"""


# ------------------------------------------- vocabulary growth (Heaps)
#
# The corpus-scaling diagnostic: cumulative distinct vocabulary vs
# cumulative tokens in ingestion (doc_id) order, reported at decile
# boundaries — the empirical Heaps-law curve. A curation pipeline
# reads it two ways: a flattening curve says new data is mostly
# repeats (dedup harder / stop crawling this source), a straight
# log-log line says the corpus is still discovering language. The
# type-token ratio per decile is the same signal normalized.
#
# Scale shape: one token explode feeding TWO vocab/doc-bounded aggs —
# each token's FIRST document (min doc_id, a combiner-backed groupBy
# over the vocab) and per-doc token counts. Deciles are NOT a global
# NTILE (an un-partitioned window is a single-partition sort over
# every document — the anti-pattern queries/stats.py's eqf-bins
# documents refusing): one percentile aggregate produces the 9
# doc_id cutoffs as a 1-row broadcast, and decile assignment is a
# map-side comparison sum. The cumulative curve is a 10-row window.
# Nothing corpus-sized is ever sorted; the explode is the only big
# exchange.
#
# Determinism: all counts are integers; the interpolated doc_id
# cutoffs are either exactly a data value (both engines return the
# element itself) or strictly between two integers, so integer
# doc_id comparisons can't straddle an ulp (the eqf-bins argument);
# the only double is the final ttr ratio on identical ints.

N_GROWTH_BUCKETS = 10


def vocab_growth_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    )
    cuts = docs.agg(
        *[
            F.percentile(
                "doc_id", F.lit(i / N_GROWTH_BUCKETS)
            ).alias(f"c{i}")
            for i in range(1, N_GROWTH_BUCKETS)
        ]
    )
    decile = F.lit(1) + sum(
        (F.col("doc_id") > F.col(f"c{i}")).cast("int")
        for i in range(1, N_GROWTH_BUCKETS)
    )
    dec = docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id", decile.alias("decile")
    )
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    first_doc = toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
    by_dec = (
        dec.join(per_doc, "doc_id", "left")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("n_toks", F.lit(0))).alias("n_tokens"),
        )
    )
    new_vocab = (
        first_doc.join(dec, "doc_id")
        .groupBy("decile")
        .agg(F.count("*").alias("n_new"))
    )
    wcum = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        by_dec.join(new_vocab, "decile", "left")
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .select(
            "decile",
            F.sum("n_docs").over(wcum).alias("docs_cum"),
            F.sum("n_tokens").over(wcum).alias("tokens_cum"),
            F.sum("n_new").over(wcum).alias("vocab_cum"),
        )
        .select(
            "decile",
            F.col("docs_cum").cast("long").alias("docs_cum"),
            F.col("tokens_cum").cast("long").alias("tokens_cum"),
            F.col("vocab_cum").cast("long").alias("vocab_cum"),
            F.round(
                F.col("vocab_cum")
                / F.col("tokens_cum").cast("double"),
                6,
            ).alias("ttr"),
        )
    )


_GROWTH_CUTS = ", ".join(
    f"quantile_cont(doc_id, {i / N_GROWTH_BUCKETS!r}) AS c{i}"
    for i in range(1, N_GROWTH_BUCKETS)
)
_GROWTH_DECILE = "1 + " + " + ".join(
    f"CAST(doc_id > c{i} AS INT)" for i in range(1, N_GROWTH_BUCKETS)
)

VOCAB_GROWTH_SQL = f"""
WITH docs AS (
    SELECT doc_id, lower(text) AS text FROM documents
), toks AS MATERIALIZED (
    SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
    FROM docs
), cuts AS (
    SELECT {_GROWTH_CUTS} FROM docs
), dec AS MATERIALIZED (
    SELECT doc_id, {_GROWTH_DECILE} AS decile
    FROM docs CROSS JOIN cuts
), per_doc AS (
    SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
), first_doc AS (
    SELECT tok, MIN(doc_id) AS doc_id FROM toks GROUP BY tok
), by_dec AS (
    SELECT d.decile, COUNT(*) AS n_docs,
        SUM(COALESCE(p.n_toks, 0)) AS n_tokens
    FROM dec d LEFT JOIN per_doc p USING (doc_id)
    GROUP BY d.decile
), new_vocab AS (
    SELECT d.decile, COUNT(*) AS n_new
    FROM first_doc f JOIN dec d USING (doc_id)
    GROUP BY d.decile
), cum AS (
    SELECT b.decile,
        SUM(b.n_docs) OVER w AS docs_cum,
        SUM(b.n_tokens) OVER w AS tokens_cum,
        SUM(COALESCE(v.n_new, 0)) OVER w AS vocab_cum
    FROM by_dec b LEFT JOIN new_vocab v USING (decile)
    WINDOW w AS (ORDER BY b.decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
)
SELECT decile,
    CAST(docs_cum AS BIGINT) AS docs_cum,
    CAST(tokens_cum AS BIGINT) AS tokens_cum,
    CAST(vocab_cum AS BIGINT) AS vocab_cum,
    round(CAST(vocab_cum AS DOUBLE) / CAST(tokens_cum AS DOUBLE), 6)
        AS ttr
FROM cum
"""


# ----------------------------- dispersion (deviation of proportions)
#
# Gries' DP (2008): for each high-frequency term, how unevenly is it
# spread across sources relative to source sizes? DP_t = ½·Σ_s
# |f_ts/F_t − w_s| with w_s the source's token share — 0 = perfectly
# proportional, →1 = concentrated in one source. The corpus-health
# complement of corpus_entropy_kl: KL asks "do sources use different
# vocabulary overall", DP asks "WHICH terms are source-locked"
# (boilerplate, templates, source-specific artifacts — prime dedup/
# filter targets).
#
# Scale shape: the token explode feeds three combiner-backed aggs
# (per-source totals — source-count rows; term totals — vocab rows;
# (term, source) counts — vocab×sources rows); the DP evaluation
# itself runs only on the top-DP_TOP_TERMS × sources grid (the term
# rank rides Spark's rank-limit pushdown over the vocab-sized agg).
#
# Determinism: counts are integers; shares are IEEE divisions on
# identical ints; each |share − w_s| rounds to 9 dp into
# DECIMAL(12,9) so the per-term sum over sources is order-exact.

DP_TOP_TERMS = 50


def dispersion_dp_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    toks = read_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok"),
    )
    src = toks.groupBy("source").agg(F.count("*").alias("s_tot"))
    tot = src.agg(F.sum("s_tot").alias("t_tot"))
    tc = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    w_rank = W.orderBy(F.col("cnt").desc(), F.col("tok"))
    top = (
        tc.withColumn("r", F.row_number().over(w_rank))
        .where(F.col("r") <= DP_TOP_TERMS)
        .select("tok", "cnt")
    )
    fts = toks.groupBy("tok", "source").agg(F.count("*").alias("f"))
    grid = (
        top.crossJoin(F.broadcast(src))
        .join(fts, ["tok", "source"], "left")
        .crossJoin(F.broadcast(tot))
    )
    share = F.coalesce("f", F.lit(0)).cast("double") / F.col(
        "cnt"
    ).cast("double")
    w_s = F.col("s_tot").cast("double") / F.col("t_tot").cast("double")
    d = F.round(F.abs(share - w_s), 9).cast("decimal(12,9)")
    return (
        grid.groupBy("tok", "cnt")
        .agg(
            F.round(
                F.lit(0.5) * F.sum(d).cast("double"), 6
            ).alias("dp")
        )
        .select(F.col("tok").alias("term"), "cnt", "dp")
    )


DISPERSION_DP_SQL = f"""
WITH toks AS (
    SELECT source,
        unnest(list_filter(string_split(lower(text), ' '),
               t -> t <> '')) AS tok
    FROM documents
), src AS (
    SELECT source, COUNT(*) AS s_tot FROM toks GROUP BY source
), tot AS (SELECT CAST(SUM(s_tot) AS BIGINT) AS t_tot FROM src),
tc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
top AS (
    SELECT tok, cnt FROM (
        SELECT tok, cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS r
        FROM tc
    ) WHERE r <= {DP_TOP_TERMS}
), fts AS (
    SELECT tok, source, COUNT(*) AS f FROM toks GROUP BY tok, source
), grid AS (
    SELECT t.tok, t.cnt, s.source, s.s_tot, f.f
    FROM top t CROSS JOIN src s
    LEFT JOIN fts f ON f.tok = t.tok AND f.source = s.source
)
SELECT tok AS term, cnt,
    round(0.5 * CAST(SUM(CAST(round(abs(
        CAST(COALESCE(f, 0) AS DOUBLE) / CAST(cnt AS DOUBLE)
        - CAST(s_tot AS DOUBLE) / CAST(t_tot AS DOUBLE)), 9)
        AS DECIMAL(12,9))) AS DOUBLE), 6) AS dp
FROM grid CROSS JOIN tot
GROUP BY tok, cnt
"""


# -------------------------------------- Herfindahl concentration
#
# Herfindahl–Hirschman concentration of the corpus mix, per lang:
# HHI = Σ (source share)² over both the document count and the
# token volume, plus the "effective number of sources" 1/HHI — the
# dataset-card number behind "is this language really diverse or is
# it one crawl wearing twenty hostnames". HHI = 1/N_sources when
# perfectly balanced, → 1 as one source dominates.
#
# Scale: one doc-count agg (map-side) per (lang, source) — the
# token volume rides the same agg via SUM(n_chars) (chars proxy
# tokens 1:1 for concentration purposes; no tokenization pass
# needed). Shares-squared sum over the (lang, source)-bounded
# table. Determinism: integer counts; Σ share² folds as exact
# nano-units (the micro-unit sum pattern), final ratios IEEE.


def herfindahl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = per_src.groupBy("lang").agg(
        F.sum("n_docs").alias("t_docs"),
        F.sum("n_chars").alias("t_chars"),
        F.count("*").alias("n_sources"),
    )
    j = per_src.join(F.broadcast(tot), "lang")
    sh_d = F.col("n_docs").cast("double") / F.col("t_docs").cast(
        "double"
    )
    sh_c = F.col("n_chars").cast("double") / F.col("t_chars").cast(
        "double"
    )
    hhi = j.groupBy("lang", "n_sources").agg(
        F.sum(F.floor(sh_d * sh_d * 1e9 + 0.5)).alias("_hd"),
        F.sum(F.floor(sh_c * sh_c * 1e9 + 0.5)).alias("_hc"),
    )
    hd = F.col("_hd").cast("double") / 1e9
    hc = F.col("_hc").cast("double") / 1e9
    return hhi.select(
        "lang",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.round(hd, 6).alias("hhi_docs"),
        F.round(hc, 6).alias("hhi_chars"),
        F.round(F.lit(1.0) / hd, 6).alias("effective_sources"),
    )


HERFINDAHL_SQL = """
WITH per_src AS (
    SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
    FROM documents GROUP BY lang, source
), tot AS (
    SELECT lang, SUM(n_docs) AS t_docs, SUM(n_chars) AS t_chars,
        COUNT(*) AS n_sources
    FROM per_src GROUP BY lang
), hhi AS (
    SELECT p.lang, n_sources,
        SUM(CAST(floor((CAST(n_docs AS DOUBLE) / CAST(t_docs AS DOUBLE))
            * (CAST(n_docs AS DOUBLE) / CAST(t_docs AS DOUBLE))
            * 1e9 + 0.5) AS BIGINT)) AS hd,
        SUM(CAST(floor((CAST(p.n_chars AS DOUBLE) / CAST(t_chars AS DOUBLE))
            * (CAST(p.n_chars AS DOUBLE) / CAST(t_chars AS DOUBLE))
            * 1e9 + 0.5) AS BIGINT)) AS hc
    FROM per_src p JOIN tot USING (lang)
    GROUP BY p.lang, n_sources
)
SELECT lang, CAST(n_sources AS BIGINT) AS n_sources,
    round(CAST(hd AS DOUBLE) / 1e9, 6) AS hhi_docs,
    round(CAST(hc AS DOUBLE) / 1e9, 6) AS hhi_chars,
    round(1.0 / (CAST(hd AS DOUBLE) / 1e9), 6) AS effective_sources
FROM hhi
"""


# ------------------------------------------- Zipf head coverage
#
# Head-coverage curve: what fraction of ALL token occurrences the
# top-K most frequent terms account for, at K ∈ HEAD_KS. The
# Zipf-head dial behind stop-word list sizing, cache sizing for
# embedding lookups, and "how much of this corpus is boilerplate
# vocabulary". Complements corpus_vocab_growth (type growth) with
# the occurrence-mass view.
#
# Scale: one token-count agg (combiner-backed, vocab-sized); the
# global ranking window over it is safe NOT because an aggregate sits
# beneath (vocab is Heaps-law-large at 100 TB) but because the
# adjacent `rank <= 100` filter triggers Spark's WindowGroupLimit
# rewrite — the physical plan is TakeOrderedAndProject, capping
# per-partition flow at K before the single-partition sort. The K
# grid is a constant fan-out of the ranked head. Determinism: pure
# integer sums.

HEAD_KS = (10, 50, 100)


def head_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count("*").alias("n"))
    tot = cnt.agg(
        F.sum("n").alias("n_tokens"), F.count("*").alias("n_types")
    )
    w = W.orderBy(F.col("n").desc(), F.col("term"))
    ranked = cnt.select(
        "n", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= max(HEAD_KS))
    ks = F.explode(F.array(*[F.lit(k) for k in HEAD_KS])).alias("k")
    fan = ranked.select("n", "rank", ks).where(
        F.col("rank") <= F.col("k")
    )
    return (
        fan.groupBy("k")
        .agg(F.sum("n").alias("head_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("head_tokens").cast("long").alias("head_tokens"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.round(
                F.col("head_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


HEAD_COVERAGE_SQL = f"""
WITH tok AS (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              t -> t <> '')) AS term
    FROM documents
), cnt AS (
    SELECT term, COUNT(*) AS n FROM tok GROUP BY term
), tot AS (
    SELECT SUM(n) AS n_tokens, COUNT(*) AS n_types FROM cnt
), ranked AS (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
    FROM cnt QUALIFY rank <= {max(HEAD_KS)}
), fan AS (
    SELECT n, rank, k
    FROM ranked CROSS JOIN (
        SELECT unnest([{", ".join(str(k) for k in HEAD_KS)}]) AS k)
    WHERE rank <= k
)
SELECT CAST(k AS BIGINT) AS k,
    CAST(SUM(n) AS BIGINT) AS head_tokens,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(n_types AS BIGINT) AS n_types,
    round(CAST(SUM(n) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        AS coverage
FROM fan CROSS JOIN tot
GROUP BY k, n_tokens, n_types
"""


REGISTRY = [
    ("corpus_source_overlap", source_overlap_query, SOURCE_OVERLAP_SQL),
    ("corpus_entropy_kl", entropy_kl_query, ENTROPY_KL_SQL),
    # Heaps-law vocabulary growth curve (decile cumulative vocab)
    ("corpus_vocab_growth", vocab_growth_query, VOCAB_GROWTH_SQL),
    # Gries' DP term dispersion across sources (top terms)
    ("corpus_dispersion_dp", dispersion_dp_query, DISPERSION_DP_SQL),
    # Herfindahl source-concentration per lang (docs + char volume)
    ("corpus_herfindahl", herfindahl_query, HERFINDAHL_SQL),
    # Zipf head-coverage curve (top-K term occurrence mass)
    ("corpus_head_coverage", head_coverage_query, HEAD_COVERAGE_SQL),
]
