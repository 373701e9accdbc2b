"""Dataset-curation operators for a pretraining-data pipeline over the
`documents` table: sequence packing, deterministic stratified sampling,
train/val/test hash splits, and benchmark-contamination scanning.

Scale notes (100 TB): every op here is a single scan plus one shuffle
at most. Packing uses a window partitioned by (lang, shard) with a
fixed shard count — each shard packs its own doc stream independently,
so parallelism = #langs × N_PACK_SHARDS and per-task window state stays
bounded no matter how large one language gets.
Sampling/splitting are pure map-side hash predicates (no shuffle until
the final stats agg); contamination is a map-side regex scan that
whole-stage-codegens into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import no_aqe, prep, read_table
from .text import ws_tokens

_HEX = "0123456789abcdef"

# Context-window budget for concat-and-split packing (tokens).
PACK_BUDGET = 256

# Shard count for the packing window: each (lang, shard) stream packs
# independently, bounding window-partition size at scale.
N_PACK_SHARDS = 16

# Per-language keep-rate numerators out of 256 (md5-bucket space):
# downsample the dominant language, keep the tail intact.
SAMPLE_RATES = {"en": 64, "zh": 128}
SAMPLE_RATE_DEFAULT = 256

# Hash-split boundaries in the 0..255 bucket space: <204 → train (~80%),
# <230 → val (~10%), else test.
SPLIT_TRAIN_LT = 204
SPLIT_VAL_LT = 230

# Benchmark-contamination denylist (phrase hits flag the doc), plus the
# usual PII patterns (emails, long digit runs) scrubbed from pretraining
# corpora. Patterns are in the common Java-regex/RE2 subset so the
# DuckDB oracle runs the identical expression.
DENYLIST = ("key agg", "window table", "spark sql")
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONG_NUM_RE = "[0-9]{6,}"


def _md5_bucket256(col: Column) -> Column:
    """0..255 bucket from md5's first two nibbles (engine-portable;
    same construction as cdc/validation.py)."""
    h = F.md5(col.cast("string"))
    n1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    n2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (n1 * 16 + n2).cast("int")


def _bucket256_sql(expr: str) -> str:
    h = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"((strpos('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + strpos('{_HEX}', substr({h}, 2, 1)) - 1)"
    )


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        F.size(ws_tokens(F.col("text"))).alias("n_tokens"),
    )


_TOKENIZED_SQL = """
WITH tokenized AS (
    SELECT doc_id, lang,
        len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS n_tokens
    FROM documents
)
"""


def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid out in
    deterministic (lang, shard, doc_id) order — shard is a stable md5
    bucket of doc_id — and each (lang, shard) stream is cut into
    PACK_BUDGET-token context windows; a document belongs to the bin
    its first token lands in. Sharding keeps window-partition state
    bounded at 100 TB (parallelism = #langs × N_PACK_SHARDS instead of
    #langs). Integer arithmetic only (`div`), per the engine-parity
    rule on double truncation."""
    prep(spark)
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = _tokenized(spark, sf_dir).withColumn(
        "shard", _md5_bucket256(F.col("doc_id")) % N_PACK_SHARDS
    )
    d = d.withColumn("cum", F.sum("n_tokens").over(w))
    d = d.withColumn(
        "bin_id", F.expr(f"(cum - n_tokens) div {PACK_BUDGET}")
    )
    return d.groupBy("lang", "shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


PACK_SEQUENCES_SQL = (
    _TOKENIZED_SQL
    + f""",
sharded AS (
    SELECT *, CAST({_bucket256_sql('doc_id')} % {N_PACK_SHARDS} AS INT)
        AS shard
    FROM tokenized
),
cum AS (
    SELECT *, sum(n_tokens) OVER (
        PARTITION BY lang, shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING
    ) AS cum
    FROM sharded
)
SELECT lang, shard,
    CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id,
    count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
    min(doc_id) AS first_doc
FROM cum
GROUP BY lang, shard, bin_id
"""
)


def _rate_col() -> Column:
    rate = F.lit(SAMPLE_RATE_DEFAULT)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return rate


def stratified_sample_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff its md5 bucket
    falls under the language's keep-rate. Pure map-side predicate —
    reproducible across runs and engines (no rand())."""
    prep(spark)
    d = _tokenized(spark, sf_dir).withColumn(
        "keep", _md5_bucket256(F.col("doc_id")) < _rate_col()
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )


def _rate_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_RATE_DEFAULT} END"


STRATIFIED_SAMPLE_SQL = (
    _TOKENIZED_SQL
    + f""",
flagged AS (
    SELECT *, {_bucket256_sql('doc_id')} < {_rate_sql()} AS keep
    FROM tokenized
)
SELECT lang, count(*) AS n_total,
    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
        AS kept_tokens
FROM flagged
GROUP BY lang
"""
)


def dataset_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by doc_id hash bucket;
    returns per-(lang, split) doc and token counts."""
    prep(spark)
    b = _md5_bucket256(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_LT, "train")
        .when(b < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        _tokenized(spark, sf_dir)
        .withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


DATASET_SPLIT_SQL = (
    _TOKENIZED_SQL
    + f""",
flagged AS (
    SELECT *,
        CASE WHEN {_bucket256_sql('doc_id')} < {SPLIT_TRAIN_LT} THEN 'train'
             WHEN {_bucket256_sql('doc_id')} < {SPLIT_VAL_LT} THEN 'val'
             ELSE 'test' END AS split
    FROM tokenized
)
SELECT lang, split, count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM flagged
GROUP BY lang, split
"""
)


def contamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination / PII scan: per-doc hit counts for the
    denylist phrases + email/long-number patterns, and the flag a
    curation pipeline would filter on."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    deny_hits = None
    for phrase in DENYLIST:
        c = F.regexp_count(F.col("text"), F.lit(phrase))
        deny_hits = c if deny_hits is None else deny_hits + c
    emails = F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
    nums = F.regexp_count(F.col("text"), F.lit(LONG_NUM_RE))
    return docs.select(
        "doc_id",
        deny_hits.alias("n_denylist_hits"),
        emails.alias("n_emails"),
        nums.alias("n_long_nums"),
        ((deny_hits + emails + nums) > 0).alias("contaminated"),
    )


_DENY_SUM_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{p}'))" for p in DENYLIST
)
CONTAMINATION_SQL = f"""
SELECT doc_id,
    {_DENY_SUM_SQL} AS n_denylist_hits,
    len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(text, '{LONG_NUM_RE}')) AS n_long_nums,
    ({_DENY_SUM_SQL}
     + len(regexp_extract_all(text, '{EMAIL_RE}'))
     + len(regexp_extract_all(text, '{LONG_NUM_RE}'))) > 0 AS contaminated
FROM documents
"""


# --------------------------------------------------- n-gram decontamination

DECONTAM_K = 8  # token n-gram size (13 in the usual recipe; 8 fits fixtures)
EVAL_EVERY = 50  # doc_id % EVAL_EVERY == 0 → the held-out "eval set"


def _kgrams(toks: Column, k: int) -> Column:
    """Word-level k-grams from a MATERIALIZED token-array attribute
    (same cloning caveat as dedup._shingles)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j - 1) for j in range(k)]
        ),
    )


def ngram_decontam_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination by n-gram overlap (the GPT-3/PaLM
    recipe): flag every training doc sharing any 8-gram with a held-out
    eval doc. Scale shape: the eval side is small by construction →
    its distinct n-grams BROADCAST; the training side streams through
    one scan + the broadcast hash join; the only exchange is the final
    per-doc count agg."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    grams = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(_kgrams(F.col("toks"), DECONTAM_K))
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % EVAL_EVERY == 0
    eval_grams = grams.where(is_eval).select(
        F.col("doc_id").alias("eval_doc_id"), "gram"
    )
    train_grams = grams.where(~is_eval)
    hits = train_grams.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_shared_ngrams"),
        F.countDistinct("eval_doc_id").alias("n_eval_docs_hit"),
        F.min("eval_doc_id").alias("first_eval_doc"),
    )


_GRAMS_SQL = f"""
WITH toked AS (
    SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
), grams AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(toks) - {DECONTAM_K - 1}, 1) + 1),
        i -> concat_ws(' ', {", ".join(f"toks[i+{j}]" for j in range(DECONTAM_K))}))))
        AS gram
    FROM toked
)
"""

NGRAM_DECONTAM_SQL = (
    _GRAMS_SQL
    + f""",
eval_grams AS (
    SELECT doc_id AS eval_doc_id, gram FROM grams
    WHERE doc_id % {EVAL_EVERY} = 0
),
train_grams AS (
    SELECT doc_id, gram FROM grams WHERE doc_id % {EVAL_EVERY} <> 0
)
SELECT t.doc_id AS doc_id,
    COUNT(DISTINCT t.gram) AS n_shared_ngrams,
    COUNT(DISTINCT e.eval_doc_id) AS n_eval_docs_hit,
    MIN(e.eval_doc_id) AS first_eval_doc
FROM train_grams t JOIN eval_grams e ON t.gram = e.gram
GROUP BY t.doc_id
"""
)

# ------------------------------------------------- Bloom decontamination
#
# The AT-SCALE variant of curate_ngram_decontam: instead of
# broadcasting the eval set's distinct n-grams (which grows with the
# eval corpus), build a CONSTANT-SIZE Bloom filter over them
# (sketches.py's deterministic md5 construction, m=4096, k=4) and
# membership-test every training gram against the broadcast bit set —
# the map-side decontam probe whose broadcast is ≤ m rows no matter
# how many benchmarks are held out. The operator reports bloom-flagged
# vs exact-flagged doc counts side by side, so the false-positive cost
# of the constant-size filter is part of the output contract (Bloom
# has no false NEGATIVES — every exact hit is flagged — so decontam
# soundness is preserved; FPs only over-remove).


def bloom_decontam_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import BLOOM_K, _bloom_pos

    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    grams = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(_kgrams(F.col("toks"), DECONTAM_K))
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % EVAL_EVERY == 0
    eval_g = grams.where(is_eval).select("gram").distinct()
    pos_arr = F.array(
        *[_bloom_pos(F.col("gram"), i) for i in range(BLOOM_K)]
    )
    bits = eval_g.select(F.explode(pos_arr).alias("pos")).distinct()
    train = grams.where(~is_eval)
    # ONE walk of the train grams computing BOTH verdicts per
    # (doc, gram) — bloom membership (all K bits set) and exact
    # membership (gram in the eval set) — then one per-doc and one
    # global reduction. The previous shape re-evaluated the gram
    # explode once per consumer (9 document scans at 100 TB —
    # round-8 redundant-scan audit); counts are identical.
    probe = train.select("doc_id", "gram", F.explode(pos_arr).alias("pos"))
    pair_flags = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos",
                   "left")
        .groupBy("doc_id", "gram")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).alias("nset")
        )
        .join(
            F.broadcast(eval_g.withColumn("ex", F.lit(1))), "gram",
            "left",
        )
        .select(
            "doc_id",
            (F.col("nset") == BLOOM_K).cast("int").alias("bloom_g"),
            F.coalesce("ex", F.lit(0)).alias("exact_g"),
        )
    )
    per_doc = pair_flags.groupBy("doc_id").agg(
        F.max("bloom_g").alias("bloom_d"),
        F.max("exact_g").alias("exact_d"),
    )
    out = per_doc.agg(
        F.count("*").alias("n_train_docs"),
        F.sum("exact_d").alias("n_exact_flagged"),
        F.sum("bloom_d").alias("n_bloom_flagged"),
        F.sum(
            (
                (F.col("bloom_d") == 1) & (F.col("exact_d") == 0)
            ).cast("long")
        ).alias("n_false_pos"),
    )
    return out.select(
        "n_train_docs",
        "n_exact_flagged",
        "n_bloom_flagged",
        "n_false_pos",
        F.round(
            F.col("n_false_pos").cast("double")
            / F.col("n_train_docs").cast("double"),
            6,
        ).alias("fp_doc_rate"),
    )


def _bloom_decontam_sql() -> str:
    from .sketches import BLOOM_K, _bloom_pos_sql

    pos_list = ", ".join(_bloom_pos_sql(i, "gram") for i in range(BLOOM_K))
    return (
        _GRAMS_SQL
        + f""",
eval_g AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_EVERY} = 0
),
bits AS (
    SELECT DISTINCT pos FROM eval_g, UNNEST([{pos_list}]) AS u(pos)
),
train AS (
    SELECT doc_id, gram FROM grams WHERE doc_id % {EVAL_EVERY} <> 0
),
probe AS (
    SELECT doc_id, gram, pos FROM train, UNNEST([{pos_list}]) AS u(pos)
),
gram_hits AS (
    SELECT doc_id, gram
    FROM probe JOIN bits USING (pos)
    GROUP BY doc_id, gram HAVING COUNT(*) = {BLOOM_K}
),
bloom_docs AS (SELECT DISTINCT doc_id FROM gram_hits),
exact_docs AS (
    SELECT DISTINCT t.doc_id FROM train t
    WHERE t.gram IN (SELECT gram FROM eval_g)
),
counts AS (
    SELECT
        (SELECT COUNT(DISTINCT doc_id) FROM train) AS n_train_docs,
        (SELECT COUNT(*) FROM exact_docs) AS n_exact_flagged,
        (SELECT COUNT(*) FROM bloom_docs) AS n_bloom_flagged,
        (SELECT COUNT(*) FROM bloom_docs b
         WHERE b.doc_id NOT IN (SELECT doc_id FROM exact_docs))
            AS n_false_pos
)
SELECT n_train_docs, n_exact_flagged, n_bloom_flagged, n_false_pos,
    round(CAST(n_false_pos AS DOUBLE) / CAST(n_train_docs AS DOUBLE), 6)
        AS fp_doc_rate
FROM counts
"""
    )


# ------------------------------------------------------------ dataset card
#
# The one-row DATASET CARD: the headline numbers a training-data
# release publishes — volume (docs, tokens, chars), diversity (vocab,
# languages, sources), shape (mean/median doc length), and the exact
# duplicate rate (1 − distinct texts / docs). One corpus scan feeds
# the count aggregates; vocabulary is the only second exchange
# (explode → distinct count, vocab-bounded output) and joins back as
# a broadcast 1-row relation. Every number is an exact integer or an
# integer ratio rounded to 6 dp.


def dataset_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = F.size(ws_tokens(F.lower(F.col("text"))))
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.round(F.percentile(toks.cast("double"), F.lit(0.5)), 6).alias(
            "median_doc_tokens"
        ),
    )
    vocab = (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("t"))
        .agg(F.countDistinct("t").alias("vocab"))
    )
    j = base.crossJoin(F.broadcast(vocab))
    return j.select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "vocab",
        "n_langs",
        "n_sources",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("mean_doc_tokens"),
        "median_doc_tokens",
        F.round(
            F.lit(1.0)
            - F.col("n_distinct_texts").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("exact_dup_rate"),
    )


DATASET_CARD_SQL = """
WITH toked AS (
    SELECT *, len(list_filter(string_split(lower(text), ' '),
                              t -> t <> '')) AS n_toks
    FROM documents
), base AS (
    SELECT COUNT(*) AS n_docs,
        CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        COUNT(DISTINCT lang) AS n_langs,
        COUNT(DISTINCT source) AS n_sources,
        COUNT(DISTINCT md5(text)) AS n_distinct_texts,
        round(quantile_cont(CAST(n_toks AS DOUBLE), 0.5), 6)
            AS median_doc_tokens
    FROM toked
), vocab AS (
    SELECT COUNT(DISTINCT t) AS vocab
    FROM documents,
        UNNEST(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS u(t)
)
SELECT n_docs, n_tokens, n_chars, CAST(vocab AS BIGINT) AS vocab,
    n_langs, n_sources,
    round(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        AS mean_doc_tokens,
    median_doc_tokens,
    round(1.0 - CAST(n_distinct_texts AS DOUBLE)
          / CAST(n_docs AS DOUBLE), 6) AS exact_dup_rate
FROM base CROSS JOIN vocab
"""


# ------------------------------------------------------------ global shuffle

N_SHUF_SHARDS = 16


def global_shuffle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random permutation for training order:
    md5-derived shard + md5-ordered position within the shard. The
    global order is (shard, pos) — no single global sort: each shard
    orders independently (parallelism = N_SHUF_SHARDS × whatever the
    range-partitioner gives inside a shard), which is how you shuffle
    100 TB without one worker seeing a total order."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        (_md5_bucket256(F.col("doc_id")) % N_SHUF_SHARDS).alias("shard"),
        F.md5(F.concat(F.lit("ord:"), F.col("doc_id").cast("string"))).alias(
            "ord_key"
        ),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


GLOBAL_SHUFFLE_SQL = f"""
WITH keyed AS (
    SELECT doc_id,
        {_bucket256_sql("doc_id")} % {N_SHUF_SHARDS} AS shard,
        md5('ord:' || CAST(doc_id AS VARCHAR)) AS ord_key
    FROM documents
)
SELECT doc_id, CAST(shard AS INT) AS shard,
    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id) AS pos
FROM keyed
"""


# ------------------------------------------------------------- chunking

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG/context-window prep):
    split each document into CHUNK_TOKENS-token windows every
    CHUNK_STRIDE tokens. Entirely map-side (tokenize -> explode start
    offsets -> slice): a narrow per-row transform with no shuffle at
    any SF; downstream embedding jobs see ~n_tokens/stride rows per
    doc. Chunk text is md5-digested so the operator's output stays
    metadata-sized."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    exploded = toks.where(F.col("n") >= 1).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
    SELECT doc_id,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
),
exploded AS (
    SELECT doc_id, toks,
        unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
    FROM toks
    WHERE len(toks) >= 1
)
SELECT doc_id,
    CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
    CAST(len(list_slice(toks, start + 1, start + {CHUNK_TOKENS})) AS INT)
        AS n_chunk_tokens,
    md5(array_to_string(list_slice(toks, start + 1, start + {CHUNK_TOKENS}),
        ' ')) AS chunk_md5
FROM exploded
"""


# --------------------------------------------------------- filter chain
#
# C4/Gopher-style composed quality-filter chain: every document is
# scored against a set of NAMED rules and carries the list of rules it
# failed ("reasons"), so downstream audits can ask "how much data did
# rule X alone remove" — the operational difference between this and a
# bare boolean gate (text.py quality_query). All rules are map-side
# array/string expressions over one scan — at 100 TB this whole-stage
# codegens into the parquet read, zero shuffles. The top-term scan is
# O(tokens × distinct-tokens) per document — bounded by document
# length, never by corpus size.

QF_MIN_WORDS = 15
QF_MAX_WORDS = 120
QF_MIN_UNIQUE = 0.35
QF_TOP_TERM_MAX = 0.12
QF_MIN_AVG_LEN = 3.0


def quality_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    # no fan_out here: the plan-ceiling test pins this op map-only
    # (zero Exchange), and with the O(n log n) top_cnt fold below the
    # per-row work is cheap enough that the scan's own parallelism is
    # the right shape at every scale
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        F.size(toks).alias("n_words"),
    )
    uniq_ratio = (
        F.size(F.array_distinct("toks")).cast("double") / F.col("n_words")
    )
    # max token frequency as the longest run of the SORTED token array
    # — O(n log n) per doc instead of the old array_distinct ×
    # filter-per-distinct-token scan (O(n²) per doc; at 100 TB the
    # per-row work IS this operator's cost — guide §1.2 step 2).
    # Integer-exact and equal to the old expression for every
    # non-empty token list; ws_tokens never yields ''/NULL tokens so
    # the '' seed can't collide with a real first token. Empty token
    # lists make the old expression NULL and this one 0 — both fail
    # the sole consumer's `cnt/n_words > thr` predicate identically
    # (0/0 and NULL/0 are both NULL in Spark and DuckDB), so the
    # emitted reasons/keep columns are unchanged.
    _run = lambda acc, t: F.when(  # noqa: E731 - local fold step
        t == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    top_cnt = F.aggregate(
        F.array_sort("toks"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            _run(acc, t).alias("run"),
            F.greatest(acc["best"], _run(acc, t)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    avg_len = (
        F.aggregate(
            "toks",
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t),
        ).cast("double")
        / F.col("n_words")
    )
    rules = F.array(
        F.when(F.col("n_words") < QF_MIN_WORDS, F.lit("too_short")),
        F.when(F.col("n_words") > QF_MAX_WORDS, F.lit("too_long")),
        F.when(uniq_ratio < QF_MIN_UNIQUE, F.lit("low_unique")),
        F.when(
            top_cnt.cast("double") / F.col("n_words") > QF_TOP_TERM_MAX,
            F.lit("top_term_heavy"),
        ),
        F.when(avg_len < QF_MIN_AVG_LEN, F.lit("short_words")),
    )
    reasons = F.array_sort(
        F.filter(rules, lambda r: r.isNotNull())
    )
    return d.select(
        "doc_id",
        "lang",
        "n_words",
        F.array_join(reasons, ",").alias("reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


QUALITY_FILTER_SQL = f"""
WITH d AS (
    SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
), scored AS (
    SELECT doc_id, lang, len(toks) AS n_words,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
        list_max(list_transform(list_distinct(toks),
            t -> len(list_filter(toks, x -> x = t)))) AS top_cnt,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
            / len(toks) AS avg_len
    FROM d
), flagged AS (
    SELECT doc_id, lang, n_words,
        list_sort(list_filter([
            CASE WHEN n_words < {QF_MIN_WORDS} THEN 'too_short' END,
            CASE WHEN n_words > {QF_MAX_WORDS} THEN 'too_long' END,
            CASE WHEN uniq_ratio < {QF_MIN_UNIQUE} THEN 'low_unique' END,
            CASE WHEN CAST(top_cnt AS DOUBLE) / n_words > {QF_TOP_TERM_MAX}
                 THEN 'top_term_heavy' END,
            CASE WHEN avg_len < {QF_MIN_AVG_LEN} THEN 'short_words' END
        ], r -> r IS NOT NULL)) AS reasons
    FROM scored
)
SELECT doc_id, lang, n_words,
    COALESCE(array_to_string(reasons, ','), '') AS reasons,
    len(reasons) = 0 AS keep
FROM flagged
"""


# ------------------------------------------------- weighted sampling

SAMPLE_TOP_K = 100


def weighted_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (the A-ES /
    exponential-sort reservoir construction): per-doc priority
    -ln(u)/w with u an md5-derived uniform and w = n_chars; the K
    lowest priorities are exactly a weighted sample without
    replacement. Deterministic (no rand()) so engines and reruns
    agree — the property a reproducible training-mix pipeline needs.

    Scale shape: priority is one map-side expression; global bottom-K
    is TakeOrdered (per-partition top-K then a K-sized driver merge) —
    the distributed-reservoir pattern, never a full sort of the corpus.
    """
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    # u in (0,1): first 8 md5 nibbles → 32-bit int; +0.5 both avoids
    # u=0 and keeps the value exactly representable in a double.
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    # the rank key is ROUNDED (tie-deterministic floor fold) BEFORE
    # the window: JVM Math.log and DuckDB's libm log may differ by an
    # ulp, and an unrounded ulp at the rank-K boundary flips the
    # sample membership between engines (every other ranking op here
    # rounds before ROW_NUMBER for exactly this reason)
    pri = F.floor(
        -F.log(u) / F.col("n_chars").cast("double") * 1e9 + F.lit(0.5)
    ) / 1e9
    w_rank = Window.orderBy(F.col("pri").asc(), F.col("doc_id"))
    return (
        docs.withColumn("pri", pri)
        .withColumn("sample_rank", F.row_number().over(w_rank))
        .where(F.col("sample_rank") <= SAMPLE_TOP_K)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.col("pri").alias("priority"),
            "sample_rank",
        )
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
        floor(-ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 8)) AS UBIGINT) + 0.5) / 4294967296.0)
              / CAST(n_chars AS DOUBLE) * 1e9 + 0.5) / 1e9 AS pri
    FROM documents
), ranked AS (
    SELECT doc_id, lang, n_chars, pri,
        ROW_NUMBER() OVER (ORDER BY pri ASC, doc_id) AS sample_rank
    FROM keyed QUALIFY sample_rank <= {SAMPLE_TOP_K}
)
SELECT doc_id, lang, n_chars, pri AS priority, sample_rank
FROM ranked
"""


# ---------------------------------------- cell-balanced sampling
#
# The embedding-space analog of curate_stratified_sample: strata are
# SEMANTIC CELLS (the corpus-scaled hyperplane quantizer shared with
# sim_knn_graph / dedup_semantic_cells) instead of metadata columns,
# and up to CELL_SAMPLE_K vectors are kept per cell by deterministic
# md5 priority — cluster-balanced data selection, the standard
# diversity-preserving counter to density skew (a dominant mode in
# embedding space otherwise dominates any uniform sample). Cost shape:
# one scan for the cell id (map-side), one window partitioned by cell
# — and because cell count scales with the corpus, per-cell window
# state stays ~KNN_TARGET_CELL rows at any scale.

CELL_SAMPLE_K = 32


def cell_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _as_double, _knn_cell, _knn_h

    prep(spark)
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    # sanctioned constant-size reduction (see knn_graph_query)
    h = _knn_h(emb.count())
    celled = emb.select(
        "vec_id", _knn_cell(F.col("v"), h).alias("cell")
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        celled.withColumn("rank_in_cell", F.row_number().over(w))
        .withColumn(
            "cell_size", F.count("*").over(Window.partitionBy("cell"))
        )
        .where(F.col("rank_in_cell") <= CELL_SAMPLE_K)
        .select("vec_id", "cell", "rank_in_cell", "cell_size")
    )


def _cell_sample_sql() -> str:
    from .similarity import _KNN_CELL_SQL, _KNN_H_SQL

    return f"""
WITH emb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), hh AS (
    SELECT {_KNN_H_SQL} AS h FROM (SELECT COUNT(*) AS n_total FROM emb)
), celled AS (
    SELECT vec_id, {_KNN_CELL_SQL} AS cell
    FROM emb CROSS JOIN hh
)
SELECT vec_id, cell, rank_in_cell, cell_size FROM (
    SELECT vec_id, cell,
        ROW_NUMBER() OVER (
            PARTITION BY cell
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        ) AS rank_in_cell,
        COUNT(*) OVER (PARTITION BY cell) AS cell_size
    FROM celled)
WHERE rank_in_cell <= {CELL_SAMPLE_K}
"""


# ---------------------------------------- k-center coreset selection
#
# Greedy farthest-point traversal over the embeddings — the classic
# 2-approximation k-center CORESET selector (pick the point farthest
# from everything already picked): the "maximally diverse subset"
# primitive a curation pipeline uses to seed labeling batches, probe
# sets, and diversity-balanced eval slices. Output: the KCENTER_K
# picks in pick order with the coverage radius each pick closed
# (radius = that round's max-min distance; monotonically
# non-increasing — the classic coreset quality curve).
#
# Scale shape: KCENTER_K linear passes, each a map-side min-distance
# projection against ≤K broadcast centroid literals + ONE top-1
# reduction (orderBy-limit(1) compiles to TakeOrderedAndProject:
# per-partition top-1 then a constant-size driver merge — no global
# sort). Driver state = K vectors. Same iterative-trainer contract as
# emb_kmeans (constant-size exchanges, fixed rounds).
#
# Determinism: centers are actual table rows (no arithmetic on them),
# distances are the shared sequential fold on identical doubles, seed
# = min (md5(vec_id), vec_id) — same md5-hash spirit as the kmeans
# seed but with an explicit vec_id tiebreak the kmeans rule doesn't
# carry (md5 collisions are absent here either way), and argmax ties
# break to the smallest vec_id. Both engines pick IDENTICAL rows; the
# only rounding is 6 dp on the REPORTED radius, after all decisions.

KCENTER_K = 6

_KC_DIST = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (x, y) -> x + y)"
)


def coreset_kcenter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()  # KCENTER_K scans: seed + one top-1 pass per pick
    with no_aqe(spark):
        return _kcenter_loop(spark, emb)


def _kcenter_loop(spark: SparkSession, emb: DataFrame) -> DataFrame:
    # greedy farthest-point loop: KCENTER_K constant-size driver
    # reductions — run without AQE (session.no_aqe) like the trainers
    seed = (
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(1)
        .select("vec_id", "v")
        .collect()[0]
    )
    centers = [(int(seed["vec_id"]), [float(x) for x in seed["v"]])]
    rows = [(0, centers[0][0], None)]
    for rank in range(1, KCENTER_K):
        c_lit = F.array(
            *[F.array(*[F.lit(x) for x in c]) for _, c in centers]
        )
        dmin = F.array_min(
            F.transform(
                c_lit,
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col("v"), c, lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
            )
        )
        pick = (
            emb.select("vec_id", "v", dmin.alias("dmin"))
            .orderBy(F.col("dmin").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )
        centers.append(
            (int(pick["vec_id"]), [float(x) for x in pick["v"]])
        )
        rows.append((rank, int(pick["vec_id"]), float(pick["dmin"])))
    emb.unpersist()
    from ..utils import round_half_away

    out = [
        (r, vid, None if d is None else round_half_away(d, 6))
        for r, vid, d in rows
    ]
    return spark.createDataFrame(
        out, "pick_rank int, vec_id bigint, radius double"
    )


def _kcenter_sql() -> str:
    """Unrolled-CTE twin: center j is re-derived inside SQL (argmax of
    the least distance to the j already-chosen 1-row center CTEs), so
    the oracle is fully independent of the Spark run."""
    dist = _KC_DIST
    blocks = [
        """c0 AS (
    SELECT vec_id, v FROM emb
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
)"""
    ]
    for j in range(1, KCENTER_K):
        terms = " , ".join(
            dist.format(v="e.v", c=f"c{i}.v") for i in range(j)
        )
        froms = " CROSS JOIN ".join(f"c{i}" for i in range(j))
        blocks.append(f"""c{j} AS (
    SELECT vec_id, v, dmin FROM (
        SELECT e.vec_id, e.v, least({terms}) AS dmin
        FROM emb e CROSS JOIN {froms}
    ) ORDER BY dmin DESC, vec_id ASC LIMIT 1
)""")
    selects = ["SELECT 0 AS pick_rank, vec_id, "
               "CAST(NULL AS DOUBLE) AS radius FROM c0"]
    for j in range(1, KCENTER_K):
        selects.append(
            f"SELECT {j}, vec_id, round(dmin, 6) FROM c{j}"
        )
    return (
        "WITH emb AS MATERIALIZED (\n"
        "    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings\n), "
        + ",\n".join(blocks)
        + "\n"
        + "\nUNION ALL ".join(selects)
    )


# ------------------------------- DSIR hashed importance resampling
#
# Data Selection with Importance Resampling (Xie et al. 2023): score
# every raw document by how target-like its hashed n-gram feature
# distribution is — log importance weight Σ_b k_b·(ln p̂_target(b) −
# ln p̂_raw(b)) over B=256 md5 unigram buckets, add-half smoothing.
# Target here = the English subset (selecting for English-like text
# from the mixed-language crawl); raw = the whole corpus. The
# per-token average is the resampling score a DSIR pass would
# Gumbel-top-k over.
#
# Scale shape: one token explode feeds (a) two B-bounded bucket
# aggs (256-row outputs → broadcast) and (b) the per-(doc, bucket)
# combiner agg; the scoring join is map-side against the 256-row
# broadcast, then one per-doc agg. Nothing corpus-sized shuffles
# except the explode itself.
#
# Determinism: bucket counts are integers; each bucket's log-ratio is
# ln on identical doubles (int + 0.5 / int + 128.0 — all exactly
# representable), rounded to 9 dp into DECIMAL(20,9); the per-doc
# sum is the decimal k×logratio fold from lm.py's bigram scorer —
# order-exact in any accumulation order.

DSIR_B = 256
DSIR_TARGET_LANG = "en"


def dsir_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode("toks").alias("tok"),
    ).withColumn("bucket", _md5_bucket256(F.col("tok")))
    # ONE light bucket-keyed pass builds the raw AND target profile
    # together (256 groups, map-side combine), and the grand totals
    # derive from those 256 persisted rows — the old shape ran raw,
    # tgt, and tot as three separate passes over the token stream
    # (4 corpus scans incl. the scoring pre-agg, r9 audit; now 2:
    # profile + scoring). Deriving the profile from the
    # per-(doc,bucket) pre-agg instead was tried and measured SLOWER
    # at sf0.1 (it repeats the high-cardinality shuffle); this shape
    # keeps both passes light. Warm-session best-of-4 matches the
    # old 4-scan plan locally (0.95 vs 0.92 s) and halves the corpus
    # reads at scale.
    prof = toks.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("ct"),
    ).persist()  # 256 rows; the totals and the ratio table both read it
    tot = prof.agg(
        F.sum("cr").alias("r_tot"), F.sum("ct").alias("t_tot")
    )
    db = toks.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").alias("k")
    )
    ratios = prof.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("ct") + F.lit(0.5))
                / (F.col("t_tot") + F.lit(float(DSIR_B) / 2))
            )
            - F.log(
                (F.col("cr") + F.lit(0.5))
                / (F.col("r_tot") + F.lit(float(DSIR_B) / 2))
            ),
            9,
        )
        .cast("decimal(20,9)")
        .alias("logratio"),
    )
    return (
        db.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").alias("n_toks"),
            F.sum(
                F.col("k").cast("decimal(10,0)") * F.col("logratio")
            ).alias("_lw"),
        )
        .select(
            "doc_id",
            "lang",
            "n_toks",
            F.round(F.col("_lw").cast("double"), 6).alias("dsir_logw"),
            F.round(
                F.col("_lw").cast("double") / F.col("n_toks"), 6
            ).alias("dsir_avg"),
        )
    )


DSIR_WEIGHTS_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, {_bucket256_sql('tok')} AS bucket
    FROM (
        SELECT doc_id, lang,
            unnest(list_filter(string_split(lower(text), ' '),
                   t -> t <> '')) AS tok
        FROM documents
    )
), prof AS MATERIALIZED (
    SELECT bucket, COUNT(*) AS cr,
        SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
            AS ct
    FROM toks GROUP BY bucket
), tot AS (
    SELECT SUM(cr) AS r_tot, SUM(ct) AS t_tot FROM prof
), db AS (
    SELECT doc_id, lang, bucket, COUNT(*) AS k
    FROM toks GROUP BY doc_id, lang, bucket
), ratios AS (
    SELECT bucket,
        CAST(round(
            ln((ct + 0.5) / (t_tot + {DSIR_B / 2!r}))
            - ln((cr + 0.5) / (r_tot + {DSIR_B / 2!r})), 9)
            AS DECIMAL(20,9)) AS logratio
    FROM prof CROSS JOIN tot
)
SELECT doc_id, lang, CAST(SUM(k) AS BIGINT) AS n_toks,
    round(CAST(SUM(CAST(k AS DECIMAL(10,0)) * logratio) AS DOUBLE), 6)
        AS dsir_logw,
    round(CAST(SUM(CAST(k AS DECIMAL(10,0)) * logratio) AS DOUBLE)
          / SUM(k), 6) AS dsir_avg
FROM db JOIN ratios USING (bucket)
GROUP BY doc_id, lang
"""


# ------------------------------- DSIR Gumbel-top-k selection
#
# The SELECTION half of DSIR (Xie et al. 2023, §2): sampling K docs
# without replacement with probability ∝ exp(score) is exactly
# top-K by (score + Gumbel noise) — the Gumbel-top-k trick. Score =
# the per-token average log importance ratio from
# curate_dsir_weights; the Gumbel variate is md5-derived (the
# weighted_sample uniform construction), so the draw is deterministic
# and reproducible — the property a versioned training-mix needs.
#
# Scale shape: the weights op's linear plan + one map-side key
# expression + a global top-K that rides Spark's rank-limit pushdown
# (per-partition top-K, K-sized final window) — the distributed-
# reservoir shape, never a full sort.

DSIR_SAMPLE_K = 100


def dsir_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    wts = dsir_weights_query(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    # rounded BEFORE the rank window (tie-deterministic floor fold) —
    # the double-ln gumbel key amplifies the cross-engine libm ulp,
    # and an unrounded ulp at the rank-K boundary flips membership
    key = F.floor(
        (F.col("dsir_avg") + (-F.log(-F.log(u)))) * 1e6 + F.lit(0.5)
    ) / 1e6
    w_rank = Window.orderBy(F.col("key").desc(), F.col("doc_id"))
    return (
        wts.withColumn("key", key)
        .withColumn("sample_rank", F.row_number().over(w_rank))
        .where(F.col("sample_rank") <= DSIR_SAMPLE_K)
        .select(
            "doc_id",
            "lang",
            "n_toks",
            "dsir_avg",
            F.col("key").alias("gumbel_key"),
            "sample_rank",
        )
    )


def _dsir_sample_sql() -> str:
    return f"""
WITH wts AS (
    SELECT * FROM ({DSIR_WEIGHTS_SQL})
), keyed AS (
    SELECT doc_id, lang, n_toks, dsir_avg,
        floor((dsir_avg + (-ln(-ln(
            (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 8)) AS UBIGINT) + 0.5) / 4294967296.0))))
            * 1e6 + 0.5) / 1e6 AS key
    FROM wts
)
SELECT doc_id, lang, n_toks, dsir_avg,
    key AS gumbel_key, sample_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY key DESC, doc_id)
        AS sample_rank
    FROM keyed
) WHERE sample_rank <= {DSIR_SAMPLE_K}
"""


# ------------------------------------------- temperature sampling mix
#
# Temperature-scaled multilingual sampling weights (the mBERT/XLM-R
# exponentiated-share recipe, Conneau & Lample 2019): per-language
# token share p_l, re-weighted w_l ∝ p_l^k over an inverse-temperature
# grid k ∈ {1, 2, 4} (k=1 proportional, larger k upweights the head;
# the classic T=0.7 sits between the k grid points — integer k keeps
# p^k an exact IEEE multiply chain, identical in both engines, where
# pow() is not).
#
# Scale: one map-side token count → |langs|-row agg; the k grid is a
# constant fan-out and the normalizer is a window over that tiny fan.
# Determinism: p^k via explicit repeated multiplication; normalizer
# sums 12-dp-rounded DECIMALs (order-exact); final ratios in doubles.

TEMP_MIX_KS = (1, 2, 4)


def temperature_mix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    from .text import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    per_lang = docs.select(
        "lang", F.size(ws_tokens(F.lower(F.col("text")))).alias("nt")
    ).groupBy("lang").agg(F.sum("nt").alias("n_tokens"))
    # corpus total as a global window over the |langs|-row aggregate,
    # not a separate agg + crossJoin: the join shape re-evaluates the
    # token-count scan a second time (two corpus scans at 100 TB);
    # the window input is bounded by the language-code domain
    # (plan-audit whitelist: lang-keyed agg)
    based = per_lang.withColumn(
        "tot_tokens",
        F.sum("n_tokens").over(Window.partitionBy()),
    ).withColumn(
        "p",
        F.col("n_tokens").cast("double")
        / F.col("tot_tokens").cast("double"),
    )
    kgrid = F.explode(
        F.array(*[F.lit(k) for k in TEMP_MIX_KS])
    ).alias("inv_temp")
    pk = (
        F.when(F.col("inv_temp") == 1, F.col("p"))
        .when(F.col("inv_temp") == 2, F.col("p") * F.col("p"))
        .otherwise(
            (F.col("p") * F.col("p")) * (F.col("p") * F.col("p"))
        )
    )
    fan = based.select(
        "lang", "n_tokens", "tot_tokens", "p", kgrid
    ).withColumn("pk", pk)
    # normalizer as a PARTITIONED WINDOW, not groupBy+join-back: the
    # join shape re-evaluates the whole token-count scan for the z
    # subtree (two corpus scans at 100 TB); the window computes Z_k
    # in place over the |langs|x|k| fan — one scan, one tiny sort
    wz = Window.partitionBy("inv_temp")
    zed = fan.withColumn(
        "z", F.sum(F.round("pk", 12).cast("decimal(20,12)")).over(wz)
    )
    w = F.col("pk") / F.col("z").cast("double")
    return zed.select(
        "lang",
        "inv_temp",
        "n_tokens",
        F.round(w, 6).alias("weight"),
        F.round(w * F.col("tot_tokens").cast("double"), 3).alias(
            "exp_tokens"
        ),
    )


TEMPERATURE_MIX_SQL = f"""
WITH per_lang AS (
    SELECT lang,
        CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                 t -> t <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
), based AS (
    SELECT lang, n_tokens,
        CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot_tokens,
        CAST(n_tokens AS DOUBLE)
            / CAST(CAST(SUM(n_tokens) OVER () AS BIGINT) AS DOUBLE)
            AS p
    FROM per_lang
), fan AS (
    SELECT lang, n_tokens, tot_tokens, inv_temp,
        CASE WHEN inv_temp = 1 THEN p
             WHEN inv_temp = 2 THEN p * p
             ELSE (p * p) * (p * p) END AS pk
    FROM based CROSS JOIN (
        SELECT unnest([{", ".join(str(k) for k in TEMP_MIX_KS)}])
            AS inv_temp
    )
), zed AS (
    SELECT *,
        SUM(CAST(round(pk, 12) AS DECIMAL(20,12)))
            OVER (PARTITION BY inv_temp) AS z
    FROM fan
)
SELECT lang, inv_temp, n_tokens,
    round(pk / CAST(z AS DOUBLE), 6) AS weight,
    round(pk / CAST(z AS DOUBLE) * CAST(tot_tokens AS DOUBLE), 3)
        AS exp_tokens
FROM zed
"""


# ------------------------------------------ rejection sample to target
#
# Deterministic rejection sampling that flattens the corpus's length
# mix: bucket documents by n_chars digit count (the float-free
# log-ish histogram key), then accept each document with probability
# min_bucket_count / bucket_count so every length bucket is accepted
# at (about) the rarest bucket's rate — the classic way to sample a
# skewed corpus toward a uniform target distribution without
# shuffling or sorting anything.
#
# Scale: one bucket histogram (combiner agg over a handful of keys,
# broadcast back) + one map-side accept test per row — no global
# sort, no per-row state. Determinism: acceptance is an INTEGER
# threshold compare — u = first 6 md5 nibbles of doc_id in [0, 16^6),
# accept iff u * cnt < min_cnt * 16^6 (cross-multiplied so there is
# no division at all).

_REJ_SPACE = 16 ** 6


def rejection_sample_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(F.col("n_chars").cast("string")).alias("bucket"),
    )
    hist = docs.groupBy("bucket").agg(F.count("*").alias("cnt"))
    mn = hist.agg(F.min("cnt").alias("min_cnt"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit("rej"), F.col("doc_id").cast("string")
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    flagged = (
        docs.join(F.broadcast(hist), "bucket")
        .crossJoin(F.broadcast(mn))
        .select(
            "bucket",
            "cnt",
            "min_cnt",
            (
                u * F.col("cnt")
                < F.col("min_cnt") * F.lit(_REJ_SPACE)
            ).cast("long").alias("accept"),
        )
    )
    return flagged.groupBy("bucket").agg(
        F.max("cnt").alias("n_docs"),
        F.sum("accept").alias("n_accepted"),
    )


REJECTION_SAMPLE_SQL = f"""
WITH docs AS (
    SELECT doc_id, length(CAST(n_chars AS VARCHAR)) AS bucket
    FROM documents
), hist AS (
    SELECT bucket, COUNT(*) AS cnt FROM docs GROUP BY bucket
), mn AS (SELECT MIN(cnt) AS min_cnt FROM hist),
flagged AS (
    SELECT d.bucket, h.cnt, mn.min_cnt,
        CASE WHEN (
            (strpos('{_HEX}', substr(h6, 1, 1)) - 1) * 1048576
            + (strpos('{_HEX}', substr(h6, 2, 1)) - 1) * 65536
            + (strpos('{_HEX}', substr(h6, 3, 1)) - 1) * 4096
            + (strpos('{_HEX}', substr(h6, 4, 1)) - 1) * 256
            + (strpos('{_HEX}', substr(h6, 5, 1)) - 1) * 16
            + (strpos('{_HEX}', substr(h6, 6, 1)) - 1)
        ) * h.cnt < mn.min_cnt * {_REJ_SPACE}
        THEN 1 ELSE 0 END AS accept
    FROM (
        SELECT bucket,
            substr(md5(concat('rej', ':', doc_id)), 1, 6) AS h6
        FROM docs
    ) d
    JOIN hist h USING (bucket) CROSS JOIN mn
)
SELECT bucket, MAX(cnt) AS n_docs,
    CAST(SUM(accept) AS BIGINT) AS n_accepted
FROM flagged GROUP BY bucket
"""


REGISTRY = [
    ("curate_pack_sequences", pack_sequences_query, PACK_SEQUENCES_SQL),
    ("curate_chunk_documents", chunk_documents_query, CHUNK_DOCUMENTS_SQL),
    (
        "curate_stratified_sample",
        stratified_sample_query,
        STRATIFIED_SAMPLE_SQL,
    ),
    ("curate_dataset_split", dataset_split_query, DATASET_SPLIT_SQL),
    ("curate_contamination", contamination_query, CONTAMINATION_SQL),
    ("curate_ngram_decontam", ngram_decontam_query, NGRAM_DECONTAM_SQL),
    ("curate_bloom_decontam", bloom_decontam_query, _bloom_decontam_sql()),
    ("curate_dataset_card", dataset_card_query, DATASET_CARD_SQL),
    ("curate_global_shuffle", global_shuffle_query, GLOBAL_SHUFFLE_SQL),
    ("curate_quality_filter", quality_filter_query, QUALITY_FILTER_SQL),
    ("curate_weighted_sample", weighted_sample_query, WEIGHTED_SAMPLE_SQL),
    # cell-balanced embedding-space sampling (corpus-scaled cells)
    ("curate_cell_sample", cell_sample_query, _cell_sample_sql()),
    # greedy k-center coreset (farthest-point traversal)
    ("curate_coreset_kcenter", coreset_kcenter_query, _kcenter_sql()),
    # DSIR hashed-n-gram importance weights (target = English docs)
    ("curate_dsir_weights", dsir_weights_query, DSIR_WEIGHTS_SQL),
    # DSIR Gumbel-top-k deterministic resample over those weights
    ("curate_dsir_sample", dsir_sample_query, _dsir_sample_sql()),
    # temperature-scaled multilingual sampling weights (round 8)
    ("curate_temperature_mix", temperature_mix_query,
     TEMPERATURE_MIX_SQL),
    # division-free deterministic rejection sampling to a flat
    # length-bucket target (round 9)
    ("curate_rejection_sample", rejection_sample_query,
     REJECTION_SAMPLE_SQL),
]
