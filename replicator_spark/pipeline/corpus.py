"""Corpus-level text operators: repetition quality filters, PII
scrubbing, heavy-hitter terms, inverted index, TF-IDF.

These are the cross-document half of the text-analysis surface
(text.py holds the per-document map-only half). Scale shapes:

- repetition: explode bigrams → combiner groupBy(doc_id, bigram) →
  per-doc window. Both exchanges are keyed by doc_id (the second is a
  subset re-sort, not a re-shuffle under AQE).
- pii scrub: pure map-side regexp expressions, whole-stage codegen.
- top terms: combiner groupBy(lang, term) then a window over the
  aggregated (tiny) per-lang term counts.
- inverted index: distinct (term, doc) → groupBy(term) with sorted,
  CAPPED postings — the cap keeps a mega-term's posting row bounded
  (the full list would be a skew cell at 100 TB).
- tf-idf: tf groupBy(doc, term); document frequencies are
  vocabulary-sized → BROADCAST joined back (no shuffle of the tf
  side); corpus size N is a broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table
from .text import ws_tokens

# ---------------------------------------------------------------- repetition

TOP_BIGRAM_MAX_FRAC = 0.18  # Gopher-style duplication gate


def repetition_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram repetition stats (Gopher-style duplication
    filters): total/distinct bigrams, the dominant bigram and its
    frequency fraction, and the pass/fail gate."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    n = F.size("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.get(F.col("toks"), i - 1), F.get(F.col("toks"), i)
        ),
    )
    bg = toked.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("bigram").asc()
    )
    per_doc = counts.select(
        "doc_id", "bigram", "cnt",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt").over(W.partitionBy("doc_id")).alias("n_bigrams"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n_distinct"),
    ).where(F.col("rn") == 1)
    top_frac = F.round(F.col("cnt").cast("double") / F.col("n_bigrams"), 6)
    dup_frac = F.round(
        1 - F.col("n_distinct").cast("double") / F.col("n_bigrams"), 6
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.col("n_distinct").alias("n_distinct_bigrams"),
        F.col("bigram").alias("top_bigram"),
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        (top_frac <= TOP_BIGRAM_MAX_FRAC).alias("passes_repetition"),
    )


REPETITION_SQL = f"""
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
), bg AS (
    SELECT doc_id,
        unnest(list_transform(
            range(1, greatest(len(toks) - 1, 1) + 1),
            i -> concat_ws(' ', toks[i], toks[i+1]))) AS bigram
    FROM toked
), counts AS (
    SELECT doc_id, bigram, COUNT(*) AS cnt
    FROM bg GROUP BY doc_id, bigram
), per_doc AS (
    SELECT doc_id, bigram, cnt,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY cnt DESC, bigram ASC) AS rn,
        CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
        COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct
    FROM counts
)
SELECT doc_id, n_bigrams, n_distinct AS n_distinct_bigrams,
    bigram AS top_bigram,
    round(CAST(cnt AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac,
    round(1 - CAST(n_distinct AS DOUBLE) / n_bigrams, 6)
        AS dup_bigram_frac,
    round(CAST(cnt AS DOUBLE) / n_bigrams, 6) <= {TOP_BIGRAM_MAX_FRAC}
        AS passes_repetition
FROM per_doc WHERE rn = 1
"""

# ---------------------------------------------------------------- pii scrub

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
NUM_RE = "\\b\\d{8,}\\b"


def _with_pii(docs: DataFrame) -> DataFrame:
    """Fixture synthesis: the corpus carries no PII, so stamp a
    deterministic email/IP/account-number tail onto 2 of every 3 docs
    (doc_id-derived, reproducible in the oracle) before scrubbing."""
    tail = F.concat(
        F.lit(" contact u"), F.col("doc_id"), F.lit("@example.com ip 10."),
        F.col("doc_id") % 256, F.lit(".0."), (F.col("doc_id") * 7) % 256,
        F.lit(" acct "), F.col("doc_id") * 97 + 10_000_000,
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 != 0, F.concat(F.col("text"), tail))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def pii_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction: count then replace emails, IPv4s, long
    account numbers; emits per-doc counts + digest of scrubbed text."""
    prep(spark)
    docs = _with_pii(read_table(spark, sf_dir, "documents"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            IP_RE, "<IP>",
        ),
        NUM_RE, "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(IP_RE)).alias("n_ips"),
        F.regexp_count(F.col("text"), F.lit(NUM_RE)).alias("n_nums"),
        F.md5(scrubbed).alias("scrubbed_digest"),
    )


_PII_TEXT_SQL = """
SELECT doc_id,
    CASE WHEN doc_id % 3 <> 0 THEN
        text || ' contact u' || doc_id || '@example.com ip 10.'
             || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
             || ' acct ' || (doc_id * 97 + 10000000)
    ELSE text END AS text
FROM documents
"""

PII_SCRUB_SQL = f"""
WITH pii AS ({_PII_TEXT_SQL})
SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
    CAST(len(regexp_extract_all(text, '{IP_RE}')) AS INT) AS n_ips,
    CAST(len(regexp_extract_all(text, '{NUM_RE}')) AS INT) AS n_nums,
    md5(regexp_replace(
        regexp_replace(
            regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
            '{IP_RE}', '<IP>', 'g'),
        '{NUM_RE}', '<NUM>', 'g')) AS scrubbed_digest
FROM pii
"""

# ---------------------------------------------------------------- top terms

TOP_K_TERMS = 10


def top_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-K terms per language by corpus frequency
    (deterministic tiebreak on the term)."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    counts = tok.groupBy("lang", "term").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.select("lang", "term", "n",
                      F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= TOP_K_TERMS)
    )


TOP_TERMS_SQL = f"""
WITH tok AS (
    SELECT lang,
        unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS term
    FROM documents
), counts AS (
    SELECT lang, term, COUNT(*) AS n FROM tok GROUP BY lang, term
), ranked AS (
    SELECT lang, term, n,
        ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n DESC, term ASC) AS rank
    FROM counts
)
SELECT lang, term, n, rank FROM ranked WHERE rank <= {TOP_K_TERMS}
"""

# ------------------------------------------------------------ inverted index

POSTINGS_CAP = 20


def inverted_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists: term → document frequency + first K sorted doc
    ids (capped so a stop-word's postings row stays bounded)."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    td = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    ).distinct()
    return td.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP),
            ",",
        ).alias("postings"),
    )


INVERTED_INDEX_SQL = f"""
WITH td AS (
    SELECT DISTINCT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS term
    FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
    array_to_string(
        (list(doc_id ORDER BY doc_id))[1:{POSTINGS_CAP}], ',') AS postings
FROM td GROUP BY term
"""

# ------------------------------------------------------------------- tf-idf

TFIDF_TOP_K = 3


def tfidf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K characteristic terms per document by tf·ln(N/df). The df
    table is vocabulary-sized → broadcast; N is a broadcast scalar —
    the tf side (corpus-sized) is never re-shuffled for the join."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = (
        tok.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.select(
        "doc_id", "term", "tfidf", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= TFIDF_TOP_K)


TFIDF_SQL = f"""
WITH tok AS (
    SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, tf.term AS term,
        round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN dfreq ON tf.term = dfreq.term, n
), ranked AS (
    SELECT doc_id, term, tfidf,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""

# ---------------------------------------------------------------- PMI
#
# Pointwise mutual information of adjacent word pairs — the classic
# collocation detector ("new york" scores high, "of the" scores low).
# PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p from corpus counts.
# Scale shape: bigram and unigram counts are two combiner-backed
# groupBys over one exploded scan; the unigram table is
# vocabulary-sized → broadcast twice onto the bigram counts (the
# corpus-sized side never re-shuffles). Corpus totals are broadcast
# scalars. Both engines compute ln over identical integer ratios, so
# the doubles match bit-for-bit; display rounding is tie-proof floor.

PMI_MIN_COUNT = 5  # bigram support threshold


def pmi_bigrams_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    # uni and bi are both persisted: their four consumers (the two
    # scalar normalizers, the u1/u2 broadcast sides, the scored probe)
    # each re-scan the corpus otherwise — exchange reuse does not
    # dedupe sibling branches even on the final adaptive plan
    # (round-8 scan audit: 5 corpus scans before, 2 after — one
    # unigram pass + one bigram pass; both cached tables are
    # vocab-bounded, tiny vs the corpus).
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    ).persist()
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bi = (
        toked.select(
            F.explode(
                F.expr(
                    """transform(slice(toks, 1, size(toks) - 1),
                        (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"""
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bi"))
        .where(F.col("c_bi") >= PMI_MIN_COUNT)
    ).persist()
    n_bi = bi.agg(F.sum("c_bi").alias("n_bi"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.log(
        (F.col("c_bi").cast("double") / F.col("n_bi"))
        / (
            (F.col("c1").cast("double") / F.col("n_uni"))
            * (F.col("c2").cast("double") / F.col("n_uni"))
        )
    )
    return scored.select(
        "w1",
        "w2",
        "c_bi",
        (F.floor(pmi * 1e6 + F.lit(0.5)) / 1e6).alias("pmi"),
    )


PMI_BIGRAMS_SQL = f"""
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
), uni AS (
    SELECT w, COUNT(*) AS c
    FROM (SELECT unnest(toks) AS w FROM toked) GROUP BY w
), n_uni AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
bi AS (
    SELECT w1, w2, COUNT(*) AS c_bi FROM (
        SELECT unnest(list_transform(range(1, len(toks)),
                   i -> toks[i])) AS w1,
               unnest(list_transform(range(1, len(toks)),
                   i -> toks[i + 1])) AS w2
        FROM toked
    ) GROUP BY w1, w2
    HAVING COUNT(*) >= {PMI_MIN_COUNT}
), n_bi AS (SELECT CAST(SUM(c_bi) AS BIGINT) AS n_bi FROM bi)
SELECT w1, w2, CAST(c_bi AS BIGINT) AS c_bi,
    floor(ln((CAST(c_bi AS DOUBLE) / n_bi)
             / ((CAST(u1.c AS DOUBLE) / n_uni)
                * (CAST(u2.c AS DOUBLE) / n_uni))) * 1e6 + 0.5) / 1e6
        AS pmi
FROM bi JOIN uni u1 ON bi.w1 = u1.w
    JOIN uni u2 ON bi.w2 = u2.w, n_uni, n_bi
"""


# ---------------------------------------------- term burstiness
#
# Church–Gale burstiness of the corpus's heaviest terms: the Fano
# factor (variance-to-mean ratio) of a term's PER-DOCUMENT count,
# zeros included. A Poisson-scattered term has fano ≈ 1; content
# words cluster (a doc that mentions a term mentions it again) and
# score ≫ 1, while function words sit near 1 — the signal behind
# stop-word induction, keyword weighting, and template detection.
#
# Scale: one token explode → (term, doc) combiner count → one
# moment agg per term (S1 = Σk, S2 = Σk², both over docs CONTAINING
# the term; the all-docs zeros enter via the closed form using the
# broadcast corpus doc count N: mean = S1/N, var = S2/N − mean²).
# Top-terms ranked by total count with term tiebreak. Determinism:
# moments are exact integers; fano is one IEEE expression.

BURST_TOP = 30


def term_burstiness_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count("*").alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    per_doc = tok.groupBy("term", "doc_id").agg(
        F.count("*").alias("k")
    )
    mom = per_doc.groupBy("term").agg(
        F.count("*").alias("n_docs_with"),
        F.sum("k").alias("s1"),
        F.sum(F.col("k") * F.col("k")).alias("s2"),
    )
    w = W.orderBy(F.col("s1").desc(), F.col("term").asc())
    top = (
        mom.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BURST_TOP)
        .crossJoin(F.broadcast(nd))
    )
    mean = F.col("s1").cast("double") / F.col("n_docs").cast("double")
    var = (
        F.col("s2").cast("double") / F.col("n_docs").cast("double")
        - mean * mean
    )
    return top.select(
        "rank",
        "term",
        F.col("n_docs_with").cast("long").alias("n_docs_with"),
        F.col("s1").cast("long").alias("total_count"),
        F.round(mean, 6).alias("mean_per_doc"),
        F.round(var / mean, 6).alias("fano"),
    )


TERM_BURSTINESS_SQL = f"""
WITH nd AS (SELECT COUNT(*) AS n_docs FROM documents),
tok AS (
    SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS term
    FROM documents
), per_doc AS (
    SELECT term, doc_id, COUNT(*) AS k FROM tok GROUP BY term, doc_id
), mom AS (
    SELECT term, COUNT(*) AS n_docs_with, SUM(k) AS s1,
        SUM(k * k) AS s2
    FROM per_doc GROUP BY term
), top AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY s1 DESC, term ASC) AS rank
    FROM mom
)
SELECT rank, term,
    CAST(n_docs_with AS BIGINT) AS n_docs_with,
    CAST(s1 AS BIGINT) AS total_count,
    round(CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        AS mean_per_doc,
    round((CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)))
          / (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6) AS fano
FROM top CROSS JOIN nd
WHERE rank <= {BURST_TOP}
"""


# ------------------------------------------------- n-gram novelty
#
# Novel-n-gram rate of a held-out split vs the training split — the
# memorization/contamination diagnostic (McCoy et al. 2021 "raw
# novelty" flavor): what fraction of the test split's distinct
# 5-grams never occur in train? The hash split (doc_id % 10: 0-7
# train, 8-9 test) mirrors curate_dataset_split's convention.
#
# Scale: per-doc distinct grams map-side; train side reduces to a
# DISTINCT gram set once (combiner-backed); the test-vs-train
# membership check is one LEFT ANTI hash join keyed by gram — linear
# in corpus size, never pairwise. Determinism: integer counts.

NOVELTY_K = 5


def ngram_novelty_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    from .curation import _kgrams

    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        "lang",
        ws_tokens(F.lower(F.col("text"))).alias("toks"),
    )
    grams = toked.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(_kgrams(F.col("toks"), NOVELTY_K))
        ).alias("gram"),
    )
    train = (
        grams.where(F.col("doc_id") % 10 < 8).select("gram").distinct()
    )
    test = (
        grams.where(F.col("doc_id") % 10 >= 8)
        .select("lang", "gram")
        .distinct()
    )
    novel = test.join(train, "gram", "left_anti")
    n_test = test.groupBy("lang").agg(
        F.count("*").alias("n_test_grams")
    )
    n_novel = novel.groupBy("lang").agg(F.count("*").alias("n_novel"))
    return (
        n_test.join(n_novel, "lang", "left")
        .select(
            "lang",
            "n_test_grams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.col("n_test_grams").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
    )


NGRAM_NOVELTY_SQL = f"""
WITH toked AS (
    SELECT doc_id, lang,
        list_filter(string_split(lower(text), ' '), t -> t <> '')
            AS toks
    FROM documents
), grams AS (
    SELECT doc_id, lang, unnest(list_distinct(list_transform(
        range(1, greatest(len(toks) - {NOVELTY_K - 1}, 1) + 1),
        i -> concat_ws(' ',
            {", ".join(f"toks[i+{j}]" for j in range(NOVELTY_K))}))))
        AS gram
    FROM toked
), train AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % 10 < 8
), test AS (
    SELECT DISTINCT lang, gram FROM grams WHERE doc_id % 10 >= 8
), novel AS (
    SELECT lang, COUNT(*) AS n_novel
    FROM test ANTI JOIN train USING (gram)
    GROUP BY lang
), n_test AS (
    SELECT lang, COUNT(*) AS n_test_grams FROM test GROUP BY lang
)
SELECT t.lang, CAST(n_test_grams AS BIGINT) AS n_test_grams,
    CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
    round(CAST(COALESCE(n_novel, 0) AS DOUBLE)
          / CAST(n_test_grams AS DOUBLE), 6) AS novelty_rate
FROM n_test t LEFT JOIN novel USING (lang)
"""


# ---------------------------------------------- Chao1 vocab richness
#
# Chao1 species-richness estimator applied to per-source vocabulary:
# from the observed type count and the singleton/doubleton frequencies
# (f1, f2), estimate the TRUE vocabulary size the source would show at
# infinite sampling — chao1 = S_obs + f1(f1-1)/(2(f2+1)) (the
# bias-corrected form, defined even when f2 = 0) — plus Good-Turing
# sample coverage 1 - f1/N. The "how much vocabulary haven't we seen
# yet" complement of corpus_vocab_growth (which measures the observed
# accumulation curve).
#
# Determinism: every input to the estimate (S_obs, f1, f2, N) is an
# integer count; the two derived doubles are each ONE shared
# arithmetic expression string evaluated by both engines (identical
# parse -> identical IEEE tree, the stats_ols_multi contract).
#
# Scale: one corpus scan -> combiner-backed groupBy(source, term)
# (vocab-per-source output, tiny vs the corpus) -> per-source
# reduction to |sources| rows. No windows, no joins.

_CHAO1_EST = (
    "CAST(s_obs AS DOUBLE) + CAST(f1 AS DOUBLE)"
    " * CAST(f1 - 1 AS DOUBLE) / (2.0 * CAST(f2 + 1 AS DOUBLE))"
)
_GT_COVERAGE = "1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)"


def chao1_richness_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    agg = tc.groupBy("source").agg(
        F.count("*").alias("s_obs"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
        F.sum("c").alias("n_tokens"),
    )
    return agg.select(
        "source",
        "s_obs",
        "f1",
        "f2",
        "n_tokens",
        F.round(F.expr(_CHAO1_EST), 6).alias("chao1_est"),
        F.round(F.expr(_GT_COVERAGE), 6).alias("coverage"),
    )


CHAO1_RICHNESS_SQL = f"""
WITH toked AS (
    SELECT source, unnest(
        list_filter(string_split(lower(text), ' '), t -> t <> '')
    ) AS w
    FROM documents
), tc AS (
    SELECT source, w, COUNT(*) AS c FROM toked GROUP BY source, w
), agg AS (
    SELECT source,
        COUNT(*) AS s_obs,
        SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
        SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2,
        SUM(c) AS n_tokens
    FROM tc GROUP BY source
)
SELECT source,
    CAST(s_obs AS BIGINT) AS s_obs,
    CAST(f1 AS BIGINT) AS f1,
    CAST(f2 AS BIGINT) AS f2,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    round({_CHAO1_EST}, 6) AS chao1_est,
    round({_GT_COVERAGE}, 6) AS coverage
FROM agg
"""


REGISTRY = [
    ("text_repetition", repetition_query, REPETITION_SQL),
    ("text_pii_scrub", pii_scrub_query, PII_SCRUB_SQL),
    ("text_top_terms", top_terms_query, TOP_TERMS_SQL),
    ("text_inverted_index", inverted_index_query, INVERTED_INDEX_SQL),
    ("text_tfidf", tfidf_query, TFIDF_SQL),
    ("text_pmi_bigrams", pmi_bigrams_query, PMI_BIGRAMS_SQL),
    # Church–Gale Fano-factor burstiness of the heaviest terms
    ("corpus_term_burstiness", term_burstiness_query,
     TERM_BURSTINESS_SQL),
    # held-out novel-5-gram rate vs train split (round 8)
    ("corpus_ngram_novelty", ngram_novelty_query, NGRAM_NOVELTY_SQL),
    # Chao1 unseen-vocabulary estimate + Good-Turing coverage (round 8)
    ("corpus_chao1_richness", chao1_richness_query, CHAO1_RICHNESS_SQL),
]
