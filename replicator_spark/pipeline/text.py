"""Text analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (codegen'd, no UDF): at 100 TB these run
as a single scan with map-side projection — no shuffle at all except
the final stats aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
TOKEN_RE = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization (empty-string guard included)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
    len(list_filter(string_split(text, ' '), t -> t <> ''))
        AS n_ws_tokens,
    len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens,
    length(text) AS n_chars_actual
FROM documents
"""


def quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, word stats, stopword ratio — the usual
    cheap pretraining-data quality gates."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n_words = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    uniq_ratio = F.round(
        F.size(F.array_distinct(toks)).cast("double") / n_words, 6
    )
    return docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.round(
            (F.length("text") - n_words + 1).cast("double") / n_words, 6
        ).alias("avg_word_len"),
        F.round(n_stop.cast("double") / n_words, 6).alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        (
            (n_words >= 20)
            & (n_words <= 1000)
            & (n_stop.cast("double") / n_words >= 0.01)
        ).alias("passes_quality"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)
QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, lang, text,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
)
SELECT doc_id, lang,
    len(toks) AS n_words,
    round(CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks), 6)
        AS avg_word_len,
    round(CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE)
        / len(toks), 6) AS stopword_ratio,
    round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
        AS unique_ratio,
    len(toks) >= 20 AND len(toks) <= 1000
        AND CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE)
            / len(toks) >= 0.01 AS passes_quality
FROM t
"""

# marker-token tables for the language-ID heuristic (counting by
# replace-length arithmetic so both engines agree exactly)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}


def _marker_score(padded: Column, words: tuple) -> Column:
    score = F.lit(0).cast("long")
    for wd in words:
        needle = f" {wd} "
        score = score + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
            / len(needle)
        ).cast("long")
    return score


def langid_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-token language ID: score each language's marker
    set, pick the argmax (fixed precedence on ties), CJK by codepoint
    class. Reported as predicted-vs-labeled confusion counts."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scored = docs.select(
        "doc_id",
        "lang",
        F.when(F.col("text").rlike("[\\u4e00-\\u9fff]"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("s_zh"),
        *[
            _marker_score(padded, words).alias(f"s_{code}")
            for code, words in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{c}") for c in LANG_MARKERS])
    pred = (
        F.when(F.col("s_zh") > 0, F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(F.col("s_en") == best, F.lit("en"))
        .when(F.col("s_de") == best, F.lit("de"))
        .when(F.col("s_fr") == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return (
        scored.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


def _marker_score_sql(words: tuple) -> str:
    terms = [
        f"(length(padded) - length(replace(padded, ' {wd} ', ''))) // {len(wd) + 2}"
        for wd in words
    ]
    return " + ".join(terms)


LANGID_SQL = f"""
WITH scored AS (
    SELECT doc_id, lang,
        CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 1 ELSE 0 END
            AS s_zh,
        {", ".join(f"({_marker_score_sql(w)}) AS s_{c}" for c, w in LANG_MARKERS.items())}
    FROM (SELECT *, ' ' || text || ' ' AS padded FROM documents)
), pred AS (
    SELECT lang,
        CASE
            WHEN s_zh > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS predicted
    FROM scored
)
SELECT lang, predicted, COUNT(*) AS n_docs
FROM pred GROUP BY lang, predicted
"""


def fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenRefine-style document fingerprint: md5 of the sorted distinct
    token set — canonicalizes word order + repetition for fuzzy dedup."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(ws_tokens(F.lower(F.col("text"))))),
            " ",
        )
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


FINGERPRINT_SQL = """
SELECT doc_id,
    md5(array_to_string(
        list_sort(list_distinct(
            list_filter(string_split(lower(text), ' '), t -> t <> ''))),
        ' ')) AS fingerprint
FROM documents
"""


ROLL_BASE = 131
ROLL_MOD = 1_000_000_007  # keeps acc*131+255 < 2^47: no overflow either engine


def rolling_hash(col: Column) -> Column:
    """Rabin–Karp polynomial hash over the character stream:
    h = fold(h*B + code) mod M. Sequential fold (F.aggregate), exact
    order — the content-defined-chunking primitive, as a full-doc
    fingerprint."""
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_MOD,
    )


def rolling_hash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_hash(F.col("text")).alias("roll_hash")
    )


ROLLING_HASH_SQL = f"""
SELECT doc_id,
    list_reduce(
        list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split_regex(text, ''),
                           c -> CAST(unicode(c) AS BIGINT))),
        (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD}) AS roll_hash
FROM documents
"""


# ----------------------------------------------------------- normalization

# Java-regex/RE2 common subset so the identical pattern runs in DuckDB.
_PUNCT_RE = "[^a-z0-9 \\t\\n]"
_WS_RE = "[ \\t\\n]+"


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup keys: lowercase, strip
    punctuation, collapse whitespace, trim. Pure codegen expression
    chain (no UDF) — map-side at any SF."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, _PUNCT_RE, "")
    collapsed = F.regexp_replace(stripped, _WS_RE, " ")
    return F.trim(collapsed)


def normalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(norm).alias("n_norm_chars"),
        F.size(ws_tokens(norm)).alias("n_norm_tokens"),
        F.md5(norm).alias("norm_md5"),
    )


# DuckDB regexp_replace only replaces the first match without the 'g'
# option — Spark replaces all by default, hence the explicit flag.
NORMALIZE_SQL = f"""
WITH n AS (
    SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT_RE}', '',
            'g'), '{_WS_RE}', ' ', 'g')) AS norm
    FROM documents
)
SELECT doc_id, length(norm) AS n_norm_chars,
    len(list_filter(string_split(norm, ' '), t -> t <> ''))
        AS n_norm_tokens,
    md5(norm) AS norm_md5
FROM n
"""


# --------------------------------------------- feature hashing (16-dim)
#
# The hashing-trick bag-of-words vectorizer: each token maps to
# dim = md5's first nibble (HASH_DIMS = 16 buckets, collisions by
# design — the memory/feature trade the hashing trick makes), value =
# token count. Emitted in long format (doc_id, dim, cnt) — the sparse
# representation a downstream trainer consumes — plus the per-doc L2
# norm for cosine-ready scaling. Fully map-side until one
# combiner-backed groupBy(doc_id, dim); no vocabulary table at all,
# which is the operator's scale story: unlike TF-IDF there is NOTHING
# corpus-global to build or broadcast, so it runs at 100 TB as a pure
# linear scan.
#
# Determinism: counts are integers; the norm is sqrt of an integer sum
# (one correctly-rounded op on identical inputs), rounded to 6 dp.

HASH_DIMS = 16
_HEXS = "0123456789abcdef"


def hashing_vectorizer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("t")
    )
    dim = F.instr(F.lit(_HEXS), F.substring(F.md5("t"), 1, 1)) - 1
    cnt = tok.groupBy("doc_id", dim.alias("dim")).agg(
        F.count("*").alias("cnt")
    )
    w = W.partitionBy("doc_id")
    return cnt.select(
        "doc_id",
        "dim",
        "cnt",
        F.round(
            F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).over(w)), 6
        ).alias("l2_norm"),
    )


HASHING_VECTORIZER_SQL = f"""
WITH tok AS (
    SELECT doc_id, t
    FROM documents,
        UNNEST(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS u(t)
), cnt AS (
    SELECT doc_id,
        strpos('{_HEXS}', substr(md5(t), 1, 1)) - 1 AS dim,
        COUNT(*) AS cnt
    FROM tok GROUP BY 1, 2
)
SELECT doc_id, dim, cnt,
    round(sqrt(CAST(SUM(cnt * cnt) OVER (PARTITION BY doc_id)
                    AS DOUBLE)), 6) AS l2_norm
FROM cnt
"""


# -------------------------------------- per-doc token entropy
#
# Shannon entropy of each document's token distribution, raw and
# normalized by ln(vocab): H = ln n − (Σ_t k_t·ln k_t)/n. Low
# normalized entropy = repetitive/templated text (the boilerplate
# signal text_repetition approximates with bigram ratios, here made
# exact); H_norm ≈ 1 = maximally varied. A standard cheap quality
# gate next to text_quality's rule ratios.
#
# Scale shape: token explode → per-(doc, token) combiner count →
# per-doc agg. Two linear exchanges, nothing global.
#
# Determinism: counts are integers; each ln(k) rounds to 9 dp into
# DECIMAL(20,9) and multiplies a DECIMAL(10,0) count (the lm.py
# bigram-fold armor) so the per-doc sum is order-exact; ln(n)/ln(V)
# are IEEE on identical ints.


def token_entropy_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    tk = docs.select(
        "doc_id", F.explode("toks").alias("tok")
    ).groupBy("doc_id", "tok").agg(F.count("*").alias("k"))
    klnk = F.col("k").cast("decimal(10,0)") * F.round(
        F.log(F.col("k").cast("double")), 9
    ).cast("decimal(20,9)")
    per_doc = tk.groupBy("doc_id").agg(
        F.sum("k").alias("n_toks"),
        F.count("*").alias("n_types"),
        F.sum(klnk).alias("_sk"),
    )
    h = F.log(F.col("n_toks").cast("double")) - F.col("_sk").cast(
        "double"
    ) / F.col("n_toks").cast("double")
    hnorm = F.when(F.col("n_types") >= 2, h / F.log(
        F.col("n_types").cast("double")
    )).otherwise(F.lit(0.0))
    return per_doc.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(h, 6).alias("entropy"),
        F.round(hnorm, 6).alias("entropy_norm"),
    )


TOKEN_ENTROPY_SQL = """
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
), tk AS (
    SELECT doc_id, tok, COUNT(*) AS k
    FROM (SELECT doc_id, unnest(toks) AS tok FROM toked)
    GROUP BY doc_id, tok
), per_doc AS (
    SELECT doc_id,
        CAST(SUM(k) AS BIGINT) AS n_toks,
        COUNT(*) AS n_types,
        SUM(CAST(k AS DECIMAL(10,0))
            * CAST(round(ln(CAST(k AS DOUBLE)), 9) AS DECIMAL(20,9)))
            AS sk
    FROM tk GROUP BY doc_id
)
SELECT doc_id, n_toks, n_types,
    round(ln(CAST(n_toks AS DOUBLE))
          - CAST(sk AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS entropy,
    round(CASE WHEN n_types >= 2 THEN
        (ln(CAST(n_toks AS DOUBLE))
         - CAST(sk AS DOUBLE) / CAST(n_toks AS DOUBLE))
        / ln(CAST(n_types AS DOUBLE))
        ELSE 0.0 END, 6) AS entropy_norm
FROM per_doc
"""


# ------------------------------------------ readability (Flesch)
#
# The Flesch reading-ease heuristic: 206.835 − 1.015·(words/sentence)
# − 84.6·(syllables/word), with syllables approximated by maximal
# vowel-run counts ([aeiouy]+) — the standard cheap proxy every
# readability library uses — and sentences by terminal-punctuation
# runs (min 1). A grade-level screen for instruction-tuning corpora
# ("too academic / too simplistic for the mix"). Pure map-side.
#
# Determinism: both engines count the SAME greedy regex runs
# ([aeiouy]+ and [.!?]+ have no dialect-sensitive syntax); the score
# combines integer counts with identical literal arithmetic.


def readability_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    n_words = F.size("toks")
    n_sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syll = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")),
        F.lit(1),
    )
    score = F.round(
        F.lit(206.835)
        - F.lit(1.015)
        * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6)
        * (n_syll.cast("double") / n_words.cast("double")),
        6,
    )
    return docs.where(n_words > 0).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        score.alias("flesch"),
    )


READABILITY_SQL = """
WITH d AS (
    SELECT doc_id,
        len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS n_words,
        greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
            AS n_sents,
        greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
            AS n_syll
    FROM documents
)
SELECT doc_id,
    CAST(n_words AS BIGINT) AS n_words,
    CAST(n_sents AS BIGINT) AS n_sentences,
    CAST(n_syll AS BIGINT) AS n_syllables,
    round(206.835
          - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
          - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
          6) AS flesch
FROM d WHERE n_words > 0
"""


# -------------------------------------- code-vs-prose detection
#
# The code-fence screen a mixed crawl needs before language-ID or
# LM scoring: code-ish symbol density ({};()=[]<> etc.), programming
# keyword hits, and digit density, combined into one score — the
# cheap heuristic layer (a trained classifier would sit behind the
# same feature columns). Pure map-side: one scan, no exchange beyond
# whatever the caller aggregates.
#
# Determinism: symbol counts use length-difference arithmetic (no
# regex dialect), keyword hits are exact token membership, and the
# score combines integer-derived ratios with identical literal
# arithmetic in both engines.

CODE_SYMBOLS = "{}();=[]<>"
CODE_KEYWORDS = (
    "def", "return", "import", "function", "var", "class",
    "if", "else", "for", "while", "int", "void", "public", "static",
)
CODE_SCORE_THRESHOLD = 0.08


def code_detect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    sym_count = None
    for ch in CODE_SYMBOLS:
        c = F.length("text") - F.length(
            F.replace(F.col("text"), F.lit(ch), F.lit(""))
        )
        sym_count = c if sym_count is None else sym_count + c
    kw_arr = F.array(*[F.lit(k) for k in CODE_KEYWORDS])
    kw_count = F.size(
        F.filter(F.col("toks"), lambda t: F.array_contains(kw_arr, t))
    )
    n_chars = F.length("text")
    n_toks = F.size("toks")
    sym_ratio = sym_count.cast("double") / n_chars.cast("double")
    kw_ratio = F.when(
        n_toks > 0, kw_count.cast("double") / n_toks.cast("double")
    ).otherwise(F.lit(0.0))
    score = F.round(sym_ratio * F.lit(5.0) + kw_ratio * F.lit(2.0), 6)
    return docs.where(n_chars > 0).select(
        "doc_id",
        sym_count.cast("long").alias("sym_count"),
        kw_count.cast("long").alias("kw_count"),
        F.round(sym_ratio, 6).alias("sym_ratio"),
        score.alias("code_score"),
        (score > F.lit(CODE_SCORE_THRESHOLD)).alias("is_code"),
    )


_SYM_COUNT_SQL = " + ".join(
    f"(length(text) - length(replace(text, '{ch}', '')))"
    for ch in CODE_SYMBOLS
    if ch != "'"
)
_KW_LIST_SQL = ", ".join(f"'{k}'" for k in CODE_KEYWORDS)

CODE_DETECT_SQL = f"""
WITH d AS (
    SELECT doc_id, text,
        list_filter(string_split(lower(text), ' '), t -> t <> '')
            AS toks,
        {_SYM_COUNT_SQL} AS sym_count
    FROM documents WHERE length(text) > 0
), feats AS (
    SELECT doc_id, sym_count,
        len(list_filter(toks,
            t -> list_contains([{_KW_LIST_SQL}], t))) AS kw_count,
        CAST(sym_count AS DOUBLE) / CAST(length(text) AS DOUBLE)
            AS sym_ratio,
        CASE WHEN len(toks) > 0 THEN
            CAST(len(list_filter(toks,
                t -> list_contains([{_KW_LIST_SQL}], t))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE)
        ELSE 0.0 END AS kw_ratio
    FROM d
)
SELECT doc_id,
    CAST(sym_count AS BIGINT) AS sym_count,
    CAST(kw_count AS BIGINT) AS kw_count,
    round(sym_ratio, 6) AS sym_ratio,
    round(sym_ratio * 5.0 + kw_ratio * 2.0, 6) AS code_score,
    round(sym_ratio * 5.0 + kw_ratio * 2.0, 6)
        > {CODE_SCORE_THRESHOLD} AS is_code
FROM feats
"""


# ----------------------------------------- MATTR lexical diversity
#
# Moving-Average Type-Token Ratio (Covington & McFall): plain TTR
# (distinct/total tokens) collapses as documents grow, so quality
# pipelines use the window-normalized variant — the mean TTR over
# every sliding MATTR_W-token window. Low MATTR = template/boiler-
# plate churn even when the global TTR looks healthy; documents
# shorter than the window fall back to plain TTR over one window.
#
# Scale: entirely map-side — each document's windows come from a
# transform over ITS OWN token array (no explode, no shuffle); the
# output is one row per document. Window work is O(n_tokens × W)
# per doc, W constant. Determinism: each window ratio folds as
# integer NANO-units — floor(distinct/w · 1e9 + 0.5) is the same
# IEEE divide/multiply/add/floor in both engines — so the per-doc
# sum is an exact BIGINT; final values rounded to 6 dp.

MATTR_W = 25


def mattr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    n = F.size(F.col("toks"))
    win = F.when(n > MATTR_W, n - MATTR_W + 1).otherwise(F.lit(1))
    wlen = F.least(n, F.lit(MATTR_W))
    ratios = F.transform(
        F.sequence(F.lit(1), F.col("n_windows")),
        lambda i: F.floor(
            F.size(
                F.array_distinct(F.slice(F.col("toks"), i, MATTR_W))
            ).cast("double")
            / F.col("w_len").cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        ),
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 1)
        .select(
            "doc_id",
            "toks",
            n.alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_types"),
            win.alias("n_windows"),
            wlen.alias("w_len"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
            F.round(
                F.aggregate(
                    ratios,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(1e9)
                / F.col("n_windows").cast("double"),
                6,
            ).alias("mattr"),
        )
    )


MATTR_SQL = f"""
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '')
            AS toks
    FROM documents
), base AS (
    SELECT doc_id, toks, len(toks) AS n_tokens,
        len(list_distinct(toks)) AS n_types,
        CASE WHEN len(toks) > {MATTR_W}
             THEN len(toks) - {MATTR_W} + 1 ELSE 1 END AS n_windows,
        LEAST(len(toks), {MATTR_W}) AS w_len
    FROM toked WHERE len(toks) >= 1
)
SELECT doc_id,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(n_types AS BIGINT) AS n_types,
    CAST(n_windows AS BIGINT) AS n_windows,
    round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        AS ttr,
    round(CAST(list_reduce(
            list_transform(range(1, n_windows + 1),
                i -> CAST(floor(
                    CAST(len(list_distinct(toks[i:i + {MATTR_W} - 1]))
                         AS DOUBLE)
                    / CAST(w_len AS DOUBLE) * 1e9 + 0.5) AS BIGINT)),
            (x, y) -> x + y) AS DOUBLE) / 1e9
          / CAST(n_windows AS DOUBLE), 6) AS mattr
FROM base
"""


# ----------------------------------------------- RAKE keyword scores
#
# Rapid Automatic Keyword Extraction (Rose et al. 2010): split each
# document into candidate phrases at stopwords, then score each word
# by degree/frequency — degree is the summed length of the phrases a
# word occurs in (rewarding words that appear inside long
# multi-word keyphrases), frequency its phrase-occurrence count. Top
# RAKE_TOP_K corpus keywords reported.
#
# Scale: tokenization + the phrase-id running sum are per-doc
# (partitioned window — no global sort); the only global work is the
# word-keyed stat agg (combiner-backed, vocab-sized) and the final
# top-K, whose unpartitioned window has its rank<=K filter adjacent
# so Spark's limit pushdown caps per-partition flow (the
# corpus_head_coverage contract). Determinism: all counts integer;
# score is an integer-milli div (BIGINT div == //).

RAKE_TOP_K = 20


def rake_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(ws_tokens(F.lower(F.col("text")))).alias(
            "pos", "w"
        ),
    ).select(
        "doc_id",
        "pos",
        "w",
        F.col("w").isin(*STOPWORDS).cast("int").alias("stop"),
    )
    w_ph = W.partitionBy("doc_id").orderBy("pos")
    ph = pos.withColumn("phid", F.sum("stop").over(w_ph)).where(
        F.col("stop") == 0
    )
    w_len = W.partitionBy("doc_id", "phid")
    wl = ph.withColumn("len_ph", F.count("*").over(w_len))
    stats = wl.groupBy("w").agg(
        F.count("*").alias("freq"),
        F.sum("len_ph").alias("degree"),
    ).select(
        "w",
        "freq",
        "degree",
        F.expr("(degree * 1000) div freq").alias("score_milli"),
    )
    w_top = W.orderBy(F.col("score_milli").desc(), "w")
    return (
        stats.withColumn("rk", F.row_number().over(w_top))
        .where(F.col("rk") <= RAKE_TOP_K)
        .select(
            F.col("w").alias("word"),
            F.col("rk").alias("rank"),
            "freq",
            "degree",
            "score_milli",
        )
    )


RAKE_KEYWORDS_SQL = f"""
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '')
            AS toks
    FROM documents
), pos AS (
    SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
        unnest(toks) AS w
    FROM toked
), flagged AS (
    SELECT doc_id, pos, w,
        CASE WHEN w IN ({_STOP_IN}) THEN 1 ELSE 0 END AS stop
    FROM pos
), ph AS (
    SELECT doc_id, w, stop,
        SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phid
    FROM flagged
), wl AS (
    SELECT doc_id, phid, w,
        COUNT(*) OVER (PARTITION BY doc_id, phid) AS len_ph
    FROM ph WHERE stop = 0
), stats AS (
    SELECT w, COUNT(*) AS freq, CAST(SUM(len_ph) AS BIGINT) AS degree
    FROM wl GROUP BY w
), scored AS (
    SELECT w, freq, degree,
        CAST((degree * 1000) // freq AS BIGINT) AS score_milli
    FROM stats
)
SELECT w AS word, rk AS rank, freq, degree, score_milli FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY score_milli DESC, w) AS rk
    FROM scored
) WHERE rk <= {RAKE_TOP_K}
"""


REGISTRY = [
    ("text_token_count", token_count_query, TOKEN_COUNT_SQL),
    ("text_normalize", normalize_query, NORMALIZE_SQL),
    ("text_quality", quality_query, QUALITY_SQL),
    ("text_langid", langid_query, LANGID_SQL),
    ("text_fingerprint", fingerprint_query, FINGERPRINT_SQL),
    ("text_rolling_hash", rolling_hash_query, ROLLING_HASH_SQL),
    ("text_hashing_vectorizer", hashing_vectorizer_query,
     HASHING_VECTORIZER_SQL),
    # exact per-doc token entropy (raw + vocab-normalized)
    ("text_token_entropy", token_entropy_query, TOKEN_ENTROPY_SQL),
    # code-vs-prose heuristic screen (symbols + keywords, map-side)
    ("text_code_detect", code_detect_query, CODE_DETECT_SQL),
    # Flesch reading-ease (vowel-run syllable proxy, map-side)
    ("text_readability", readability_query, READABILITY_SQL),
    # MATTR moving-window lexical diversity (map-side)
    ("text_mattr_diversity", mattr_query, MATTR_SQL),
    # RAKE degree/frequency keyword extraction (top-K corpus words)
    ("text_rake_keywords", rake_keywords_query, RAKE_KEYWORDS_SQL),
]
