"""Corpus language-model statistics: bigram-LM document scoring, Zipf
rank-frequency slope, and cross-document duplicate-n-gram fraction.

These are the corpus-statistics quality gates of a pretraining-data
pipeline (the CCNet/KenLM recipe scores every document under a corpus
LM and drops the tail; Zipf slope is the classic corpus-health
diagnostic; duplicate-n-gram fraction is the near-dup *signal* that
feeds curation thresholds, distinct from the pairwise dedup operators
in dedup.py which *identify* the pairs).

Reference scope note: the reference engine (mysql-time-machine
replicator) has no text analytics — these extend the engine along the
brief's LLM-pipeline axis, same contract as pipeline/text.py.

Scale shapes (100 TB):
- bigram LM: one scan → map-side bigram explode → two combiner-backed
  aggs (bigram counts, prefix counts; both vocab²-bounded, i.e. TINY
  relative to the corpus) → joined back; AQE broadcasts the count
  tables, so the corpus side is never re-shuffled. The vocab-size
  scalar crossJoins as a broadcast literal.
- Zipf: the heavy part is one token-count agg (combiner-backed, vocab
  output); ranking + regression run over the vocab-sized result, and
  the final slope is a single-row reduction.
- dup-frac: per-doc DISTINCT k-grams (map-side) → gram-count agg →
  hash join back on gram → per-doc agg. The gram→count join is the
  standard propose/verify shape: shuffles scale linearly with corpus
  size, never quadratically.

Float determinism across engines (Spark JVM vs DuckDB libm): every
log() is rounded to 9 dp and summed as DECIMAL, so the only
cross-engine risk is a log landing exactly on a 9-dp boundary ulp —
negligible — and the sums themselves are order-exact. Final ratios are
computed in doubles (correctly-rounded IEEE ops on identical inputs)
and rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table
from .text import ws_tokens

# ------------------------------------------------------------- bigram LM


def _toked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )


_TOKED_SQL = """
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
)
"""


def bigram_lm_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score each document under the corpus's own add-one-smoothed
    bigram model: avg ln P(w_i | w_{i-1}), P = (c(w1,w2)+1) /
    (c_prefix(w1)+V). Self-trained (no held-out split) — the curation
    threshold consumer subtracts the corpus mean anyway."""
    prep(spark)
    toked = _toked(spark, sf_dir)
    bigr = (
        toked.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-2),"
                    " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    vocab = toked.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("vsz")
    )
    bic = bigr.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    prec = bigr.groupBy("w1").agg(F.count("*").alias("c_w1"))
    # join PROBE side is the per-(doc, bigram) pre-agg, not the raw
    # occurrence stream: Σ k·round(ln p, 9) over distinct bigrams is
    # decimal-exact-equal to the per-occurrence sum, the probe shrinks
    # to the distinct-bigram cardinality, and bic/prec still compute
    # from bigr in PARALLEL subtrees (deriving prec from bic would
    # serialize the stages — measured slower). ~20% off the sf0.1 wall.
    db = bigr.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("k"))
    j = (
        db.join(bic, ["w1", "w2"])
        .join(prec, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.col("c_bi") + 1).cast("double") / (
        F.col("c_w1") + F.col("vsz")
    ).cast("double")
    logp_dec = F.round(F.log(p), 9).cast("decimal(20,9)")
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            # k as DECIMAL(10,0), not raw long: long widens to
            # (20,0) and the product precision 20+20+1 > 38 silently
            # drops scale digits; (10,0)×(20,9) → (31,9) stays exact
            F.sum(
                F.col("k").cast("decimal(10,0)") * logp_dec
            ).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("_slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logp"),
        )
    )


BIGRAM_LM_SQL = (
    _TOKED_SQL
    + """, bi AS (
    SELECT doc_id,
        unnest(toks[1:len(toks)-1]) AS w1,
        unnest(toks[2:len(toks)]) AS w2
    FROM toked WHERE len(toks) >= 2
), bic AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bi GROUP BY w1, w2),
prec AS (SELECT w1, COUNT(*) AS c_w1 FROM bi GROUP BY w1),
v AS (
    SELECT COUNT(DISTINCT w) AS vsz
    FROM (SELECT unnest(toks) AS w FROM toked)
)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
    round(
        CAST(SUM(CAST(round(ln(
            CAST(c_bi + 1 AS DOUBLE) / CAST(c_w1 + vsz AS DOUBLE)
        ), 9) AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*),
    6) AS avg_logp
FROM bi b JOIN bic USING (w1, w2) JOIN prec USING (w1) CROSS JOIN v
GROUP BY b.doc_id
"""
)

# ------------------------------------------------------------ Zipf slope

ZIPF_TOP_N = 100


def zipf_slope_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(freq) over ln(rank) for the top-N
    corpus tokens (Zipf's law predicts ≈ -1). The token-count agg is
    the distributed part; the regression runs over the vocab-sized
    ranked list with DECIMAL-exact sums."""
    prep(spark)
    uni = (
        _toked(spark, sf_dir)
        .select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    w_rank = W.orderBy(F.col("cnt").desc(), F.col("w"))
    ranked = uni.select(
        "w", "cnt", F.row_number().over(w_rank).alias("rank")
    ).where(F.col("rank") <= ZIPF_TOP_N)
    x = F.round(F.log(F.col("rank").cast("double")), 9).cast(
        "decimal(12,9)"
    )
    y = F.round(F.log(F.col("cnt").cast("double")), 9).cast(
        "decimal(12,9)"
    )
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        F.col("n").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


ZIPF_SLOPE_SQL = (
    _TOKED_SQL
    + f""", uni AS (
    SELECT w, COUNT(*) AS cnt
    FROM (SELECT unnest(toks) AS w FROM toked) GROUP BY w
), ranked AS (
    SELECT w, cnt,
        ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank
    FROM uni QUALIFY rank <= {ZIPF_TOP_N}
), terms AS (
    SELECT
        CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
        CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
    FROM ranked
), sums AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM terms
)
SELECT n AS n_tokens,
    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
    round((CAST(sy AS DOUBLE)
           - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        AS zipf_intercept
FROM sums
"""
)

# ------------------------------------- cross-document duplicate n-grams

DUPFRAC_K = 8


def dupfrac_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of distinct 8-grams that also occur in at
    least one OTHER document — the duplicate-text signal curation
    thresholds consume (dedup.py identifies the pairs; this scores the
    contamination level per doc)."""
    prep(spark)
    from .curation import _kgrams

    grams = _toked(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.array_distinct(_kgrams(F.col("toks"), DUPFRAC_K))
        ).alias("gram"),
    )
    # doc-frequency per gram as a WINDOW over the gram stream, not a
    # separate agg + join back: the agg/join shape materializes the
    # (expensive, 8-gram-string) explode twice and shuffles it twice
    # by gram; the window shuffles it once and counts in place.
    # Measured 2.34 s → 1.08 s at sf0.1; at 100 TB it halves the
    # dominant shuffle. (The combiner the agg would get is worthless
    # here — per-doc-distinct grams are mostly unique.)
    counted = grams.withColumn(
        "n_docs", F.count("*").over(W.partitionBy("gram"))
    )
    return (
        counted
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("n_docs") >= 2, 1).otherwise(0)
            ).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_grams"), 6
            ).alias("dup_frac"),
        )
    )


DUPFRAC_SQL = (
    _TOKED_SQL
    + f""", grams AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(toks) - {DUPFRAC_K - 1}, 1) + 1),
        i -> concat_ws(' ',
            {", ".join(f"toks[i+{j}]" for j in range(DUPFRAC_K))}))))
        AS gram
    FROM toked
), gcnt AS (SELECT gram, COUNT(*) AS n_docs FROM grams GROUP BY gram)
SELECT g.doc_id, COUNT(*) AS n_grams,
    CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_shared,
    round(CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS dup_frac
FROM grams g JOIN gcnt USING (gram)
GROUP BY g.doc_id
"""
)


# --------------------------------------- CCNet-style LM-score buckets
#
# The CCNet recipe (Wenzek et al. 2020): score every document under a
# corpus LM and split EACH LANGUAGE into head/middle/tail perplexity
# tertiles — head feeds pretraining, tail gets dropped, middle is the
# judgment call. Re-expressed on the self-trained bigram scorer above:
# per-language tertile cutoffs of avg ln P come from ONE grouped
# percentile aggregate (a languages×2 broadcast — same cutoff-
# broadcast shape as stats.py's eqf-bins, never a global sort), and
# bucket assignment is a map-side comparison sum. Exact percentile
# buffers one language's doc scores in its reducer — at true 100 TB
# you'd swap in approx_percentile (same plan shape, mergeable
# sketch); exact is kept here for the bit-matching oracle. Higher
# avg_logp = lower perplexity = head.
#
# Determinism: the per-doc scores are the 6-dp-rounded doubles the
# green text_bigram_lm op already pins cross-engine; grouped
# quantile_cont on an identical multiset is identical; bucket
# comparisons reuse the eqf-bins cutoff-safety argument; per-bucket
# mean goes through a DECIMAL(18,6) sum (order-exact).

CCNET_BUCKET_NAMES = {2: "head", 1: "middle", 0: "tail"}


def ccnet_buckets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    scored = bigram_lm_query(spark, sf_dir)
    langd = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    sl = scored.join(langd, "doc_id").persist()
    # ^ doc-sized (4 narrow columns); consumed by BOTH the percentile
    # cutoffs and the bucket assignment — un-cached, each consumer
    # re-ran the entire 5-scan bigram-LM subtree (10 corpus scans
    # total, the r9 full scan audit's highest count; 10 -> 5)
    cuts = sl.groupBy("lang").agg(
        F.percentile("avg_logp", F.lit(1 / 3)).alias("c1"),
        F.percentile("avg_logp", F.lit(2 / 3)).alias("c2"),
    )
    nb = (F.col("avg_logp") > F.col("c1")).cast("int") + (
        F.col("avg_logp") > F.col("c2")
    ).cast("int")
    bucket = (
        F.when(nb == 2, F.lit("head"))
        .when(nb == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        sl.join(F.broadcast(cuts), "lang")
        .select("lang", "n_bigrams", "avg_logp", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("avg_logp").cast("decimal(18,6)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_logp"),
        )
    )


CCNET_BUCKETS_SQL = f"""
WITH scored AS (
    SELECT * FROM ({BIGRAM_LM_SQL}) s
), sl AS (
    SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logp
    FROM scored s JOIN documents d USING (doc_id)
), cuts AS (
    SELECT lang, quantile_cont(avg_logp, {1 / 3!r}) AS c1,
        quantile_cont(avg_logp, {2 / 3!r}) AS c2
    FROM sl GROUP BY lang
), bucketed AS (
    SELECT sl.lang, n_bigrams, avg_logp,
        CAST(avg_logp > c1 AS INT) + CAST(avg_logp > c2 AS INT) AS nb
    FROM sl JOIN cuts USING (lang)
)
SELECT lang,
    CASE nb WHEN 2 THEN 'head' WHEN 1 THEN 'middle'
        ELSE 'tail' END AS bucket,
    COUNT(*) AS n_docs,
    CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
    round(CAST(SUM(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*), 6) AS mean_logp
FROM bucketed GROUP BY lang, nb
"""


# ------------------------------------------- Kneser-Ney bigram model
#
# Interpolated Kneser-Ney smoothing (Kneser & Ney 1995; the KenLM /
# CCNet production smoother, vs text_bigram_lm's add-one baseline)
# for the corpus's top bigrams:
#
#   P_KN(w2|w1) = (c(w1,w2) - d) / c(w1)
#               + d * N1+(w1,*) / c(w1) * N1+(*,w2) / N1+(**)
#
# with discount d = 0.75; N1+(w1,*) = distinct continuation types of
# w1, N1+(*,w2) = distinct left contexts of w2 (the "novel
# continuation" probability that makes KN the right smoother for
# pretraining-data LMs), N1+(**) = total distinct bigram types. Since
# every observed bigram has c >= 1 > d, max(c-d, 0) = c-d.
#
# Determinism: all five inputs are integer counts; the probability is
# ONE shared arithmetic expression string evaluated by both engines
# (identical parse -> identical IEEE tree).
#
# Scale: ONE corpus scan -> combiner-backed bigram-count agg (vocab²-
# bounded, tiny vs the corpus), PERSISTED; c(w1), N1+(w1,*),
# N1+(*,w2), N1+(**) and the top-K rank all derive from that cached
# table. The persist is load-bearing: ReuseExchange cannot
# canonicalize the tokenizer's lambda (higher-order transform()), so
# without it each of the four consumer branches re-scans the corpus
# (verified: 4 FileScans without persist, 1 with — the graph-family
# InMemoryTableScan contract). The global top-K rank filter is
# rewritten to TakeOrderedAndProject(limit=K) beneath the window
# (LimitPushDownThroughWindow), so no executor sorts more than K rows.

KN_DISCOUNT = "0.75"
KN_TOP_K = 20

_KN_PROB = (
    f"(CAST(c_bi AS DOUBLE) - {KN_DISCOUNT}) / CAST(c_w1 AS DOUBLE)"
    f" + {KN_DISCOUNT} * CAST(n_follow AS DOUBLE)"
    " / CAST(c_w1 AS DOUBLE)"
    " * (CAST(n_precede AS DOUBLE) / CAST(n_types AS DOUBLE))"
)


def kneser_ney_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    toked = _toked(spark, sf_dir)
    bigr = (
        toked.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-2),"
                    " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    bic = (
        bigr.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    ).persist()
    fw = bic.groupBy("w1").agg(
        F.sum("c_bi").alias("c_w1"),
        F.count("*").alias("n_follow"),
    )
    bw = bic.groupBy("w2").agg(F.count("*").alias("n_precede"))
    tot = bic.agg(F.count("*").alias("n_types"))
    w_rank = W.orderBy(F.col("c_bi").desc(), "w1", "w2")
    top = bic.withColumn(
        "rank", F.row_number().over(w_rank)
    ).where(F.col("rank") <= KN_TOP_K)
    return (
        top.join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "w1",
            "w2",
            "c_bi",
            "c_w1",
            "n_follow",
            "n_precede",
            F.round(F.expr(_KN_PROB), 6).alias("kn_prob"),
        )
        .orderBy("rank")
    )


KNESER_NEY_SQL = (
    _TOKED_SQL
    + f""", bi AS (
    SELECT
        unnest(toks[1:len(toks)-1]) AS w1,
        unnest(toks[2:len(toks)]) AS w2
    FROM toked WHERE len(toks) >= 2
), bic AS MATERIALIZED (
    SELECT w1, w2, COUNT(*) AS c_bi FROM bi GROUP BY w1, w2
), fw AS (
    SELECT w1, SUM(c_bi) AS c_w1, COUNT(*) AS n_follow
    FROM bic GROUP BY w1
), bw AS (
    SELECT w2, COUNT(*) AS n_precede FROM bic GROUP BY w2
), tot AS (SELECT COUNT(*) AS n_types FROM bic),
top AS (
    SELECT w1, w2, c_bi,
        ROW_NUMBER() OVER (ORDER BY c_bi DESC, w1, w2) AS rank
    FROM bic
    QUALIFY rank <= {KN_TOP_K}
)
SELECT rank, w1, w2,
    CAST(c_bi AS BIGINT) AS c_bi,
    CAST(c_w1 AS BIGINT) AS c_w1,
    CAST(n_follow AS BIGINT) AS n_follow,
    CAST(n_precede AS BIGINT) AS n_precede,
    round({_KN_PROB}, 6) AS kn_prob
FROM top JOIN fw USING (w1) JOIN bw USING (w2) CROSS JOIN tot
ORDER BY rank
"""
)


REGISTRY = [
    ("text_bigram_lm", bigram_lm_query, BIGRAM_LM_SQL),
    ("text_zipf_slope", zipf_slope_query, ZIPF_SLOPE_SQL),
    ("dedup_dupfrac_ngrams", dupfrac_query, DUPFRAC_SQL),
    # CCNet head/middle/tail LM-score tertiles per language
    ("curate_ccnet_buckets", ccnet_buckets_query, CCNET_BUCKETS_SQL),
    # interpolated Kneser-Ney smoothing for the top bigrams (round 8)
    ("text_kneser_ney", kneser_ney_query, KNESER_NEY_SQL),
]
