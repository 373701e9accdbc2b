"""Dataset-mixture design + tokenizer-adjacent corpus operators:
temperature-scaled source mixing weights, token-budget selection,
vocabulary OOV-rate, and first-round BPE pair induction.

These close the "what do we actually train on" half of a pretraining
pipeline: dedup/quality (dedup.py, curation.py) decide what survives;
these decide how the survivors are SAMPLED (mixture weights, budget),
and feed the tokenizer loop (vocab coverage, BPE merge statistics).

Reference scope note: the reference engine (mysql-time-machine
replicator) has no text analytics — these extend the engine along the
brief's LLM-pipeline axis, same contract as pipeline/text.py.

Scale shapes (100 TB):
- mixture weights: ONE combiner-backed groupBy(source) — output is
  source-cardinality (tiny); the normalization constant attaches as a
  broadcast 1-row crossJoin. Nothing scales with corpus size past the
  first agg.
- token budget: one exchange on source feeding a cumulative-sum
  window. A pathologically large single source serializes into one
  task's sort; at that point flip to the two-pass variant (per-source
  quality-threshold from a quantile sketch, then a map-side filter) —
  same semantics minus exact boundary-doc ties, documented here so the
  switch is a config, not a redesign.
- OOV rate: vocab agg (combiner-backed, vocab-bounded output) → top-V
  rank (window over the VOCAB table, not the corpus) → broadcast hash
  join back against the exploded corpus → per-doc agg. Linear, one
  corpus shuffle.
- BPE pairs: map-side substring explode → one combiner-backed pair agg
  (output bounded by |alphabet|², tiny) → top-k window over that
  result only.

Float determinism across engines: shares and weights follow the lm.py
recipe — per-element doubles are correctly-rounded IEEE ops on
identical inputs, every cross-row SUM of doubles is rounded to 9 dp
and summed as DECIMAL (order-exact), and final ratios are rounded to
6 dp. Token/pair counts are integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import no_aqe, prep, read_table
from .text import ws_tokens

# ------------------------------------------------ mixture weights

# Temperature-scaled mixing (the multilingual-LM sampling recipe:
# p_s^alpha renormalized; alpha<1 upsamples small sources). alpha=0.5
# = sqrt scaling, chosen because IEEE sqrt is correctly rounded in
# both engines (pow(x, 0.3) is not guaranteed identical across libms).
MIX_ALPHA_NOTE = "alpha=0.5 (sqrt)"


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(ws_tokens(F.col("text"))).alias("n_tokens"),
    )


_DOC_TOKENS_SQL = """
WITH doc_tokens AS (
    SELECT doc_id, source, n_chars,
        len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS n_tokens
    FROM documents
)
"""


def mixture_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for dataset mixing: raw token share
    s_i = tokens_i / total, scaled share sqrt(s_i), renormalized so the
    weights sum to 1. One row per source with the audit columns a
    mixture config review needs (docs, tokens, raw vs sampled share).
    """
    prep(spark)
    per_src = _doc_tokens(spark, sf_dir).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
    )
    scaled = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "_sc",
        F.round(
            F.sqrt(
                F.col("n_tokens").cast("double")
                / F.col("tot_tokens").cast("double")
            ),
            9,
        ).cast("decimal(20,9)"),
    )
    norm = scaled.agg(F.sum("_sc").alias("_z"))
    return (
        scaled.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("tot_tokens").cast("double"),
                6,
            ).alias("raw_share"),
            F.round(
                F.col("_sc").cast("double") / F.col("_z").cast("double"),
                6,
            ).alias("weight"),
        )
    )


MIXTURE_WEIGHTS_SQL = (
    _DOC_TOKENS_SQL
    + """, per_src AS (
    SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM doc_tokens GROUP BY source
), tot AS (SELECT SUM(n_tokens) AS tot_tokens FROM per_src),
scaled AS (
    SELECT *,
        CAST(round(sqrt(CAST(n_tokens AS DOUBLE)
                        / CAST(tot_tokens AS DOUBLE)), 9)
             AS DECIMAL(20,9)) AS sc
    FROM per_src, tot
), norm AS (SELECT SUM(sc) AS z FROM scaled)
SELECT source, n_docs, n_tokens,
    round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6)
        AS raw_share,
    round(CAST(sc AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight
FROM scaled, norm
"""
)

# ------------------------------------------------ token budget

# Per-source token budget: greedy quality-first selection until the
# budget is spent. Proxy quality = n_chars (the driver corpus carries
# no external score); ties broken by doc_id so selection is total.
TOKEN_BUDGET = 1500


def token_budget_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained selection: within each source, take documents
    in (n_chars DESC, doc_id ASC) order while the running token total
    stays within TOKEN_BUDGET. The greedy knapsack every "N-token
    dataset" request turns into; integer-exact, so the boundary
    document is unambiguous."""
    prep(spark)
    dt = _doc_tokens(spark, sf_dir)
    w = (
        W.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        dt.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SQL = (
    _DOC_TOKENS_SQL
    + f""", cum AS (
    SELECT doc_id, source, n_tokens,
        CAST(SUM(n_tokens) OVER (
            PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM doc_tokens
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
"""
)

# ------------------------------------------------ OOV rate

VOCAB_TOP = 256


def oov_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the top-VOCAB_TOP lowercased token
    vocabulary (count DESC, token ASC — total order), then score every
    document's out-of-vocabulary token rate. The tokenizer-eval loop's
    first question ("how much of the corpus does vocab V explain").
    The rank window runs over the vocab-sized count table, never the
    corpus; the vocab joins back broadcast."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = (
        counts.withColumn(
            "r",
            F.row_number().over(
                W.orderBy(F.col("c").desc(), F.col("tok").asc())
            ),
        )
        .where(F.col("r") <= VOCAB_TOP)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


OOV_RATE_SQL = f"""
WITH toks AS (
    SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
            AS tok
    FROM documents
), counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
vocab AS (
    SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
        FROM counts
    ) WHERE r <= {VOCAB_TOP}
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
    CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_oov,
    round(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""

# ------------------------------------------------ BPE pair induction

BPE_TOP = 32


def bpe_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First merge round of byte-pair encoding: count every adjacent
    character pair inside whitespace tokens (lowercased), rank the
    top-BPE_TOP candidates. Iterating this (merge winner, re-count) is
    the full BPE trainer; one round is the operator — the re-count loop
    is driver-side orchestration of the same plan. Pair explode is
    map-side; the agg output is |alphabet|²-bounded."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok")
    ).where(
        # Spark's sequence(1, 0) counts DOWN; single-char tokens must
        # be excluded before the transform, exactly as the oracle does.
        F.char_length("tok") >= 2
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("n").desc(), F.col("pair").asc())
            ),
        )
        .where(F.col("rank") <= BPE_TOP)
    )


BPE_PAIRS_SQL = f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              t -> t <> '')) AS tok
    FROM documents
), pairs AS (
    SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                 i -> substr(tok, i, 2))) AS pair
    FROM toks WHERE length(tok) >= 2
)
SELECT pair, n, rank FROM (
    SELECT pair, COUNT(*) AS n,
        ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair ASC) AS rank
    FROM pairs GROUP BY pair
) WHERE rank <= {BPE_TOP}
"""


# ------------------------------------------------- full BPE trainer
#
# The complete byte-pair-encoding merge LOOP (text_bpe_pairs above is
# one round): maintain the word-frequency table with each word as a
# symbol sequence; each round counts adjacent symbol pairs weighted by
# word frequency, merges the winning pair (count desc, then
# lexicographic — fully deterministic) greedily left-to-right in every
# word, and repeats. Output is the learned merge table, rank-ordered —
# the artifact a tokenizer ships.
#
# Spark-first shape (the kmeans/PQ pattern): all heavy state lives in
# the VOCAB-BOUNDED word table (never the corpus — one corpus scan
# builds it); the per-round reduction to a single winning pair is a
# constant-size driver-side collect, exactly like the k-means centroid
# update, and the merge rewrite is a narrow fold over the word table.
# localCheckpoint truncates lineage per round (cluster.py's lesson:
# nested round plans re-analyze superlinearly).
#
# ORACLE-EXACT (round-4 verdict item #2): the fixed-round loop unrolls
# into N_BPE_MERGES chained CTE rounds (_bpe_train_sql) — the per-round
# winner is a deterministic integer argmax and the greedy merge rewrite
# has a positional closed form equal to the fold (_bpe_merged_cond,
# pinned by tests/test_bpe_oracle.py), so the op gets a FULL value-hash
# driver row; the pure-Python replay test stays as an independent pin.

N_BPE_MERGES = 8


def _merge_pair(l: str, r: str):  # noqa: E741 - l/r mirror BPE papers
    merged = l + r
    return F.aggregate(
        F.col("syms"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_words(docs: DataFrame) -> DataFrame:
    """Vocab-bounded word table: (w, freq, syms = chars of w)."""
    return (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            "w",
            "freq",
            F.expr(
                "transform(sequence(1, char_length(w)),"
                " i -> substring(w, i, 1))"
            ).alias("syms"),
        )
        # lazy: round 1's pair-count collect is the action that
        # materializes it — the eager form paid one extra job just to
        # checkpoint (guide §1.2: fewer passes; r14 optimization round)
        .localCheckpoint(eager=False)
    )


def _bpe_train(words: DataFrame):
    """Run the N_BPE_MERGES merge rounds over the word table; returns
    (final word table, merge list) — shared by trainer and encoder."""
    with no_aqe(words.sparkSession):
        return _bpe_train_loop(words)


def _bpe_train_loop(words: DataFrame):
    # per-round top-1 pair collect: a constant-size driver reduction —
    # run without AQE (session.no_aqe) exactly as the Lloyd trainers
    merges = []
    for rank in range(1, N_BPE_MERGES + 1):
        n = F.size("syms")
        pair_rows = (
            words.where(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1), F.slice("syms", 2, n - 1)
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.0").alias("l"), F.col("p.1").alias("r"))
            .agg(F.sum("freq").alias("total"))
            .orderBy(F.col("total").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not pair_rows:
            break
        win = pair_rows[0]
        merges.append(
            (rank, win["l"], win["r"], win["l"] + win["r"], int(win["total"]))
        )
        # lazy checkpoint: materialized by the NEXT round's pair-count
        # collect (or the encoder's broadcast build after the last
        # round) — halves the per-merge-round job count while keeping
        # the lineage truncation that bounds Catalyst re-analysis
        words = words.select(
            "w", "freq", _merge_pair(win["l"], win["r"]).alias("syms")
        ).localCheckpoint(eager=False)
    return words, merges


def bpe_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    _, merges = _bpe_train(_bpe_words(docs))
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string,"
        " merged string, weighted_count long"
    )


# ------------------------------------------------- BPE encoder stats
#
# Apply the trained merge table to the corpus — the tokenizer
# DEPLOYMENT step every token-budget plan needs: after training,
# how many BPE tokens does each source actually cost? The encode
# itself never touches the corpus per merge round: the word table is
# the vocab (each unique word's final symbol sequence IS its
# encoding), so corpus cost is one scan + a vocab-bounded broadcast
# join of word → token count. Output is per-source words / chars /
# BPE tokens and the chars-per-token compression ratio — the number a
# mixture plan converts into sampling budgets.


def bpe_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    trained, _ = _bpe_train(_bpe_words(docs))
    sized = trained.select("w", F.size("syms").alias("n_sym"))
    tokd = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    return (
        tokd.join(F.broadcast(sized), "w")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.col("n_chars").cast("double")
                / F.col("n_bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )


def _bpe_merged_cond(ix: str) -> str:
    """SQL for 'position {ix} starts a greedy merge of (l, r)'.

    Mirrors _merge_pair's left fold in closed positional form: an
    occurrence (syms[i]=l, syms[i+1]=r) is merged iff l <> r (adjacent
    occurrences cannot overlap, the fold takes them all) OR — the
    l = r case, a run of identical symbols the fold pairs off from the
    left — the count of consecutive l's immediately before i (K) is
    even. K = i - 1 - (last position before i whose symbol isn't l)."""
    k = (
        f"({ix}) - 1 - coalesce(list_max(list_filter("
        f"range(1, {ix}), j -> syms[j] <> w.l)), 0)"
    )
    return (
        f"(({ix}) < len(syms) AND syms[{ix}] = w.l"
        f" AND syms[({ix}) + 1] = w.r"
        f" AND (w.l <> w.r OR ({k}) % 2 = 0))"
    )


def _bpe_rounds_ctes() -> tuple[str, str]:
    """Shared CTE prefix for the BPE oracles: the word table (carrying
    the word itself) + N_BPE_MERGES chained rounds of pair-count →
    deterministic argmax (total DESC, l, r — binary collation in both
    engines) → greedy merge rewrite (_bpe_merged_cond). Returns
    (cte_sql, final_words_name)."""
    merge_expr = f"""flatten(list_transform(range(1, len(syms) + 1), i ->
        CASE WHEN {_bpe_merged_cond('i')} THEN [w.l || w.r]
             WHEN i > 1 AND {_bpe_merged_cond('i - 1')} THEN []
             ELSE [syms[i]] END))"""
    blocks = []
    prev = "words0"
    for k in range(1, N_BPE_MERGES + 1):
        blocks.append(f"""prs{k} AS (
    SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS total
    FROM {prev}, UNNEST(range(1, len(syms))) AS t(i)
    WHERE len(syms) >= 2
    GROUP BY 1, 2
), win{k} AS (
    SELECT {k} AS merge_rank, l, r, CAST(total AS BIGINT) AS total
    FROM prs{k} ORDER BY total DESC, l, r LIMIT 1
), words{k} AS MATERIALIZED (
    -- LEFT JOIN ON TRUE, not CROSS JOIN: if no adjacent pair exists
    -- anywhere (win{k} empty), keep the vocab unchanged — mirroring
    -- the Spark trainer's early `break` — instead of wiping it
    SELECT wd, freq,
        CASE WHEN w.l IS NULL THEN syms ELSE {merge_expr} END AS syms
    FROM {prev} LEFT JOIN win{k} w ON TRUE
)""")
        prev = f"words{k}"
    ctes = f"""toks AS (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
                              t -> t <> '')) AS w
    FROM documents
), words0 AS MATERIALIZED (
    SELECT w AS wd, COUNT(*) AS freq,
        list_transform(range(1, length(w) + 1), i -> substr(w, i, 1))
            AS syms
    FROM toks GROUP BY w
), {", ".join(blocks)}"""
    return ctes, prev


def _bpe_train_sql() -> str:
    """Unrolled-CTE twin of bpe_train_query (round-4 verdict item #2):
    every round's winner and rewritten vocab are identical in both
    engines (integer-exact freq sums + the closed-form merge pinned by
    tests/test_bpe_oracle.py), so the op gets a FULL value-hash driver
    row, not rows-only."""
    ctes, _ = _bpe_rounds_ctes()
    wins = " UNION ALL ".join(
        f"SELECT * FROM win{k}" for k in range(1, N_BPE_MERGES + 1)
    )
    return f"""
WITH {ctes}
SELECT merge_rank, l AS "left", r AS "right", l || r AS merged,
    total AS weighted_count
FROM ({wins})
"""


def _bpe_encode_sql() -> str:
    """Unrolled-CTE twin of bpe_encode_query: the same trained vocab
    (shared rounds), then one corpus scan joined word → symbol count."""
    ctes, final = _bpe_rounds_ctes()
    return f"""
WITH {ctes}, sized AS (
    SELECT wd, len(syms) AS n_sym FROM {final}
), tokd AS (
    SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS w
    FROM documents
)
SELECT source,
    COUNT(*) AS n_words,
    CAST(SUM(length(w)) AS BIGINT) AS n_chars,
    CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
    round(CAST(SUM(length(w)) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE), 6)
        AS chars_per_token
FROM tokd JOIN sized ON tokd.w = sized.wd
GROUP BY source
"""


REGISTRY = [
    ("curate_mixture_weights", mixture_weights_query, MIXTURE_WEIGHTS_SQL),
    ("curate_token_budget", token_budget_query, TOKEN_BUDGET_SQL),
    ("text_oov_rate", oov_rate_query, OOV_RATE_SQL),
    ("text_bpe_pairs", bpe_pairs_query, BPE_PAIRS_SQL),
    # unrolled-CTE oracle: same merge rounds (see _bpe_train_sql)
    ("text_bpe_train", bpe_train_query, _bpe_train_sql()),
    # same trained vocab + one corpus scan (see _bpe_encode_sql)
    ("text_bpe_encode", bpe_encode_query, _bpe_encode_sql()),
]
