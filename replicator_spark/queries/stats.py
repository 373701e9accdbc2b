"""Distribution statistics: exact interpolated percentiles per group.

The monitoring/profiling query every pipeline runs over a numeric
column (latency, value, token counts). `F.percentile` is Spark's exact
order-statistic aggregate with continuous interpolation — identical
semantics to DuckDB/ANSI `quantile_cont` (index = p·(n−1), linear
between neighbors), so the two engines agree bit-for-bit before the
display rounding.

Scale: one combiner-less keyed exchange (exact percentiles need the
group's values together); the group key (event_type) is low-cardinality
but each group's values stream through a single sort — for monstrous
groups you'd switch to `percentile_approx` (t-digest, mergeable) and
lose exactness; that trade-off is the operator's documented scale knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..pipeline.text import ws_tokens
from ..session import prep, read_table

PS = (0.25, 0.5, 0.9, 0.99)


def percentiles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    aggs = [
        F.round(F.percentile("value", F.lit(p)), 6).alias(
            f"p{int(p * 100)}"
        )
        for p in PS
    ]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
        F.round(F.avg("value"), 6).alias("v_avg"),
        *aggs,
    )


_P_COLS = ", ".join(
    f"round(quantile_cont(value, {p}), 6) AS p{int(p * 100)}" for p in PS
)

PERCENTILES_SQL = f"""
SELECT event_type, COUNT(*) AS n,
    round(MIN(value), 6) AS v_min,
    round(MAX(value), 6) AS v_max,
    round(AVG(value), 6) AS v_avg,
    {_P_COLS}
FROM events
GROUP BY event_type
"""

# ------------------------------------------- chi-square independence
#
# Categorical-association test (is `lang` independent of `source`?) —
# the data-audit query behind "is my training mix balanced per source".
# Observed/expected counts are integers or integer ratios, so each
# cell's (O-E)²/E is a deterministic double; contributions are rounded
# to 9 dp and summed as DECIMAL so the cell order can't perturb the
# statistic. The contingency grid is the FULL cross product of
# observed langs × observed sources — absent cells (O=0) contribute
# (0-E)²/E = E, which a sparse lang×source table needs for a true
# chi-square (dropping them understates association). Scale: one
# (lang, source) count agg; the grid itself is tiny
# (|langs|×|sources|), everything after the agg is broadcast-sized.


def chisq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count("*").alias("o")
    ).persist()  # |langs|x|sources|-sized; row/col/grand totals and
    # the grid's left-join probe each re-scanned documents un-cached
    # (r9 audit, 4 scans -> 1)
    row_t = obs.groupBy("lang").agg(F.sum("o").alias("row_n"))
    col_t = obs.groupBy("source").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    # full r×c grid so O=0 cells are present (broadcast nested-loop of
    # two tiny aggregates, not a shuffling cartesian)
    grid = row_t.crossJoin(F.broadcast(col_t))
    cells = (
        grid.join(obs, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col(
        "n"
    ).cast("double")
    contrib = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
        / e,
        9,
    ).cast("decimal(20,9)")
    agg = cells.groupBy("n", "r", "c").agg(
        F.sum(contrib).alias("_chi")
    )
    chi = F.col("_chi").cast("double")
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    v = F.sqrt(
        chi
        / (
            F.col("n").cast("double")
            * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
        )
    )
    return agg.select(
        "n",
        dof.alias("dof"),
        F.round(chi, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


CHISQ_SQL = """
WITH obs AS (
    SELECT lang, source, COUNT(*) AS o FROM documents
    GROUP BY lang, source
), row_t AS (SELECT lang, SUM(o) AS row_n FROM obs GROUP BY lang),
col_t AS (SELECT source, SUM(o) AS col_n FROM obs GROUP BY source),
tot AS (
    SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS r,
        COUNT(DISTINCT source) AS c
    FROM obs
), grid AS (
    SELECT lang, row_n, source, col_n FROM row_t CROSS JOIN col_t
), cells AS (
    SELECT COALESCE(o.o, 0) AS o, row_n, col_n, n, r, c,
        CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE) AS e
    FROM grid g LEFT JOIN obs o USING (lang, source)
    CROSS JOIN tot
), agg AS (
    SELECT CAST(n AS BIGINT) AS n, r, c,
        SUM(CAST(round(
            (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 9)
        AS DECIMAL(20,9))) AS _chi
    FROM cells GROUP BY n, r, c
)
SELECT n, (r - 1) * (c - 1) AS dof,
    round(CAST(_chi AS DOUBLE), 6) AS chi2,
    round(sqrt(CAST(_chi AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)
        AS cramers_v
FROM agg
"""

# --------------------------------------------- equal-width histogram
#
# Distributed fixed-width histogram of n_chars per language. Bin
# assignment is floor((x-mn)·NB/(mx-mn+1)) where `/` is DOUBLE
# division in BOTH engines; the operands are small integers, so the
# product stays far below 2^53 and every intermediate is an exactly
# representable, correctly-rounded double — the two engines agree
# bit-for-bit. (If this is ever reused on columns whose magnitude can
# approach 2^53/NB, switch both sides to explicit integer floor-div.)
# The global min/max come from a single-row agg that broadcasts. Scale: one scan
# + one (lang, bin) combiner agg — the histogram pattern that works at
# any corpus size.

HIST_BINS = 10


def histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "lang", "n_chars"
    )
    rng = docs.agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    span = F.col("mx") - F.col("mn") + 1
    binned = docs.crossJoin(F.broadcast(rng)).select(
        "lang",
        F.floor(
            (F.col("n_chars") - F.col("mn")) * HIST_BINS / span
        ).alias("bin"),
        F.col("mn"),
        span.alias("span"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            # bin bounds are derivable from (mn, span); carry them so
            # the result is self-describing
            F.min(
                F.col("mn") + F.floor(F.col("bin") * F.col("span") / HIST_BINS)
            ).alias("bin_lo"),
        )
    )


HISTOGRAM_SQL = f"""
WITH rng AS (
    SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
), binned AS (
    SELECT lang,
        CAST(floor((n_chars - mn) * {HIST_BINS} / (mx - mn + 1))
             AS BIGINT) AS bin,
        mn, (mx - mn + 1) AS span
    FROM documents CROSS JOIN rng
)
SELECT lang, bin, COUNT(*) AS n_docs,
    MIN(mn + CAST(floor(bin * span / {HIST_BINS}) AS BIGINT)) AS bin_lo
FROM binned
GROUP BY lang, bin
"""


# ------------------------------------- equal-frequency (quantile) bins
#
# The feature-binning twin of the equal-width histogram: bucket
# boundaries are the exact NB-quantiles, buckets get ~equal counts
# (exactly equal up to ties). NOT implemented as a global ntile —
# a global window is a single-partition sort and dies at scale.
# Instead: one percentile agg produces NB-1 cutoffs (a 1-row broadcast)
# and bucket assignment is a map-side comparison sum — same shape as
# histogram_query, scan + combiner agg. Cross-engine safety: an
# interpolated cutoff is either exactly a data value (both engines
# return the element itself, no arithmetic) or strictly between two
# integers (comparisons with integer n_chars can't straddle an ulp).

EQF_BINS = 10


def eqfreq_bins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select("n_chars")
    cuts = docs.agg(
        *[
            F.percentile("n_chars", F.lit(i / EQF_BINS)).alias(f"c{i}")
            for i in range(1, EQF_BINS)
        ]
    )
    bucket = sum(
        (F.col("n_chars") > F.col(f"c{i}")).cast("int")
        for i in range(1, EQF_BINS)
    )
    return (
        docs.crossJoin(F.broadcast(cuts))
        .select("n_chars", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )


_EQF_CUTS = ", ".join(
    f"quantile_cont(n_chars, {i / EQF_BINS}) AS c{i}"
    for i in range(1, EQF_BINS)
)
_EQF_BUCKET = " + ".join(
    f"CAST(n_chars > c{i} AS INT)" for i in range(1, EQF_BINS)
)

EQFREQ_BINS_SQL = f"""
WITH cuts AS (SELECT {_EQF_CUTS} FROM documents),
binned AS (
    SELECT n_chars, {_EQF_BUCKET} AS bucket
    FROM documents CROSS JOIN cuts
)
SELECT bucket, COUNT(*) AS n_docs, MIN(n_chars) AS lo,
    MAX(n_chars) AS hi
FROM binned GROUP BY bucket
"""


# ------------------------------------------- median absolute deviation
#
# The robust scale estimate (outlier-insensitive twin of stddev):
# MAD = median(|x - median(x)|) per group. Two exact-percentile
# passes; the group medians are a tiny broadcast between them. The
# inner median is rounded to 9 dp before the subtraction so both
# engines rank the SAME |x - med| values (an ulp difference in the
# interpolated median could otherwise reorder ties).


def mad_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    meds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 9).alias("med")
    )
    dev = ev.join(F.broadcast(meds), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    return dev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.max("med"), 6).alias("median"),
        F.round(F.percentile("d", F.lit(0.5)), 6).alias("mad"),
    )


MAD_SQL = """
WITH meds AS (
    SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med
    FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, med, abs(value - med) AS d
    FROM events e JOIN meds USING (event_type)
)
SELECT event_type, COUNT(*) AS n,
    round(MAX(med), 6) AS median,
    round(quantile_cont(d, 0.5), 6) AS mad
FROM dev GROUP BY event_type
"""


# ------------------------------------------------ two-sample KS test
#
# Kolmogorov–Smirnov distance between two sources' document-length
# distributions — the drift detector a crawl pipeline runs between
# snapshots ("did the new crawl's length profile shift?"). Distributed
# shape: one groupBy(x, group) count (combiner-backed; output bounded
# by #distinct lengths), then cumulative windows over that COUNT table
# (never the corpus), then a 1-row max. The ECDF convention at shared
# x values: both ECDFs step BEFORE the comparison at each distinct x
# (sup over right-continuous ECDF diffs is attained at step points,
# and evaluating both post-step at every distinct x is exactly the
# standard two-sample statistic).
#
# Determinism: cumulative counts are integers; each |F1−F2| is one
# subtraction of two correctly-rounded divisions on identical doubles;
# max is order-free. Rounded to 6 dp.

KS_SRC_A = "src0"
KS_SRC_B = "src1"


def ks_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    two = docs.where(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    ).select("source", F.col("n_chars").alias("x"))
    counts = two.groupBy("x").agg(
        F.sum(F.when(F.col("source") == KS_SRC_A, 1).otherwise(0))
        .alias("c1"),
        F.sum(F.when(F.col("source") == KS_SRC_B, 1).otherwise(0))
        .alias("c2"),
    )
    wcum = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = counts.select(
        "x",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    d = F.abs(
        F.col("cum1").cast("double") / F.col("n1").cast("double")
        - F.col("cum2").cast("double") / F.col("n2").cast("double")
    )
    ne = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.round(F.max(d), 6).alias("ks_d"),
            F.round(F.max(d * F.sqrt(ne)), 6).alias("ks_scaled"),
        )
    )


KS_TEST_SQL = f"""
WITH two AS (
    SELECT source, n_chars AS x FROM documents
    WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
), counts AS (
    SELECT x,
        SUM(CASE WHEN source = '{KS_SRC_A}' THEN 1 ELSE 0 END) AS c1,
        SUM(CASE WHEN source = '{KS_SRC_B}' THEN 1 ELSE 0 END) AS c2
    FROM two GROUP BY x
), cum AS (
    SELECT x,
        CAST(SUM(c1) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum2
    FROM counts
), tot AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM counts
)
SELECT MAX(n1) AS n1, MAX(n2) AS n2,
    round(MAX(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6)
        AS ks_d,
    round(MAX(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     / CAST(n1 + n2 AS DOUBLE))), 6) AS ks_scaled
FROM cum, tot
"""


# --------------------------------------- Spearman rank correlation
#
# Monotone-association check between document length in characters and
# in tokens, per language — the robust cousin of stats_corr (Pearson),
# and the standard screen for "is this quality signal redundant?".
# Ties get AVERAGE ranks (rank() + (|ties|-1)/2), so every rank is a
# multiple of 0.5: cast to DECIMAL(14,1), all five moment sums are
# EXACT and order-free in DECIMAL, and the final Pearson-on-ranks
# ratio is one double expression on identical inputs in both engines.
#
# Scale: the rank windows partition by lang — each language's rows
# sort within its own partitions (skewed languages fall to AQE); the
# moment agg is combiner-backed. No global sort, no corpus² anything.


def spearman_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.col("n_chars").cast("double").alias("x"),
        F.size(ws_tokens(F.col("text"))).cast("double").alias("y"),
    )
    rx = (
        F.rank().over(W.partitionBy("lang").orderBy("x"))
        + (F.count("*").over(W.partitionBy("lang", "x")) - 1) / 2.0
    )
    ry = (
        F.rank().over(W.partitionBy("lang").orderBy("y"))
        + (F.count("*").over(W.partitionBy("lang", "y")) - 1) / 2.0
    )
    ranked = d.select(
        "lang",
        rx.cast("decimal(14,1)").alias("rx"),
        ry.cast("decimal(14,1)").alias("ry"),
    )
    agg = ranked.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    rho = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return agg.select("lang", "n", F.round(rho, 6).alias("spearman_rho"))


SPEARMAN_SQL = """
WITH d AS (
    SELECT lang, CAST(n_chars AS DOUBLE) AS x,
        CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
             AS DOUBLE) AS y
    FROM documents
), ranked AS (
    SELECT lang,
        CAST(rank() OVER (PARTITION BY lang ORDER BY x)
             + (COUNT(*) OVER (PARTITION BY lang, x) - 1) / 2.0
             AS DECIMAL(14,1)) AS rx,
        CAST(rank() OVER (PARTITION BY lang ORDER BY y)
             + (COUNT(*) OVER (PARTITION BY lang, y) - 1) / 2.0
             AS DECIMAL(14,1)) AS ry
    FROM d
), agg AS (
    SELECT lang, COUNT(*) AS n,
        SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
        SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
    FROM ranked GROUP BY lang
)
SELECT lang, n,
    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS spearman_rho
FROM agg
"""


# ------------------------------------------------------- ROC AUC
#
# One-vs-rest AUC of `value` as a ranking score for each event type —
# the classifier-free discrimination check (Mann–Whitney U): AUC =
# (rank_sum_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with average ranks
# for ties, which handles tied scores exactly (0.5 credit per tie).
#
# Distributed shape: ranks come from a cumulative window over the
# per-VALUE count table (|distinct values| rows, NOT the corpus; the
# corpus-sized work is one combiner-backed groupBy). The single-
# partition window over distinct values is the documented exactness
# knob — at 100 TB you'd range-bin values first (same formula over
# bins, error bounded by bin width) or range-partition the cumsum.
# Ranks are multiples of 0.5 → DECIMAL sums are exact and order-free.


def auc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    vc = ev.groupBy("value").agg(F.count("*").alias("m"))
    below = F.coalesce(
        F.sum("m").over(
            W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    ranked = vc.select(
        "value",
        "m",
        (below + (F.col("m") + 1) / 2.0).cast("decimal(16,1)").alias(
            "avg_rank"
        ),
    )
    etc = ev.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    j = etc.join(ranked, "value")
    per = j.groupBy("event_type").agg(
        F.sum("c").alias("n_pos"),
        F.sum(
            F.col("c").cast("decimal(10,0)") * F.col("avg_rank")
        ).alias("rank_sum"),
    )
    tot = ev.agg(F.count("*").alias("n_total"))
    out = per.crossJoin(F.broadcast(tot))
    np_ = F.col("n_pos").cast("double")
    nn = (F.col("n_total") - F.col("n_pos")).cast("double")
    auc = (
        F.col("rank_sum").cast("double") - np_ * (np_ + 1) / 2.0
    ) / (np_ * nn)
    return out.select(
        "event_type",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(auc, 6).alias("auc"),
    )


AUC_SQL = """
WITH vc AS (
    SELECT value, COUNT(*) AS m FROM events GROUP BY value
), ranked AS (
    SELECT value, m,
        CAST(COALESCE(SUM(m) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (m + 1) / 2.0 AS DECIMAL(16,1)) AS avg_rank
    FROM vc
), etc AS (
    SELECT event_type, value, COUNT(*) AS c
    FROM events GROUP BY event_type, value
), per AS (
    SELECT event_type, SUM(c) AS n_pos,
        SUM(CAST(c AS DECIMAL(10,0)) * avg_rank) AS rank_sum
    FROM etc JOIN ranked USING (value) GROUP BY event_type
), tot AS (
    SELECT COUNT(*) AS n_total FROM events
)
SELECT event_type,
    CAST(n_pos AS BIGINT) AS n_pos,
    round((CAST(rank_sum AS DOUBLE)
           - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1) / 2.0)
          / (CAST(n_pos AS DOUBLE)
             * CAST(n_total - n_pos AS DOUBLE)), 6) AS auc
FROM per CROSS JOIN tot
"""


# ------------------------------------------------ Gini coefficient
#
# Per-source Gini of document lengths — the inequality summary a
# data-mix review reads next to entropy: is a source's token volume
# spread across its documents or concentrated in a few giants?
# G = (2·Σ rᵢxᵢ)/(n·Σx) − (n+1)/n over ascending-sorted x with
# row_number ranks; swapping ranks among tied x leaves Σ rᵢxᵢ
# unchanged, so the doc_id tiebreak makes both engines identical
# WITHOUT affecting the statistic. Ranks and lengths are integers —
# the rank-weighted sum is DECIMAL-exact and order-free.
#
# Scale: one per-source sort (the rank window, partitioned by source;
# skewed sources fall to AQE) + one combiner-backed moment agg.


def gini_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select("source", "n_chars")
    rn = F.row_number().over(
        W.partitionBy("source").orderBy("n_chars", F.monotonically_increasing_id())
    )
    # monotonically_increasing_id is partition-dependent — but ties in
    # n_chars make rank assignment irrelevant to Σ r·x (see header), so
    # the statistic stays deterministic; doc_id would also do, n_chars
    # + row id avoids carrying an extra column through the sort
    ranked = docs.select(
        "source",
        F.col("n_chars").cast("decimal(18,0)").alias("x"),
        rn.cast("decimal(18,0)").alias("r"),
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("r") * F.col("x")).alias("srx"),
    )
    nd = F.col("n").cast("double")
    g = (
        2.0 * F.col("srx").cast("double") / (nd * F.col("sx").cast("double"))
        - (nd + 1.0) / nd
    )
    return agg.select(
        "source",
        "n",
        F.col("sx").cast("bigint").alias("total_chars"),
        F.round(g, 6).alias("gini"),
    )


GINI_SQL = """
WITH ranked AS (
    SELECT source,
        CAST(n_chars AS DECIMAL(18,0)) AS x,
        CAST(ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id)
             AS DECIMAL(18,0)) AS r
    FROM documents
), agg AS (
    SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(r * x) AS srx
    FROM ranked GROUP BY source
)
SELECT source, n,
    CAST(sx AS BIGINT) AS total_chars,
    round(2.0 * CAST(srx AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
          - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM agg
"""


# ------------------------------------------------ Welch's t-test
#
# Two-sample Welch t (unequal variances) between two sources' document
# lengths — the mean-shift companion to stats_ks_test's full-
# distribution drift check, with the Welch–Satterthwaite effective
# degrees of freedom. Lengths are integers, so all five moment sums
# are exact BIGINT/DECIMAL and order-free; t and df are single double
# expressions on identical inputs, rounded to 6 dp.
#
# Scale: one combiner-backed two-group agg over the filtered scan —
# nothing else.

T_SRC_A = "src0"
T_SRC_B = "src1"


def welch_ttest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("source").isin(T_SRC_A, T_SRC_B)
    )
    g = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("n_chars").cast("decimal(20,0)")).alias("s"),
        F.sum(
            F.col("n_chars").cast("decimal(20,0)")
            * F.col("n_chars").cast("decimal(18,0)")
        ).alias("ss"),
    )
    a = g.where(F.col("source") == T_SRC_A).select(
        F.col("n").alias("na"), F.col("s").alias("sa"), F.col("ss").alias("ssa")
    )
    b = g.where(F.col("source") == T_SRC_B).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"), F.col("ss").alias("ssb")
    )
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (F.col("ssa").cast("double") - na * ma * ma) / (na - 1)
    vb = (F.col("ssb").cast("double") - nb * mb * mb) / (nb - 1)
    se2a, se2b = va / na, vb / nb
    t = (ma - mb) / F.sqrt(se2a + se2b)
    df = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (na - 1) + se2b * se2b / (nb - 1)
    )
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


WELCH_TTEST_SQL = f"""
WITH g AS (
    SELECT source, COUNT(*) AS n,
        SUM(CAST(n_chars AS DECIMAL(20,0))) AS s,
        SUM(CAST(n_chars AS DECIMAL(20,0))
            * CAST(n_chars AS DECIMAL(18,0))) AS ss
    FROM documents WHERE source IN ('{T_SRC_A}', '{T_SRC_B}')
    GROUP BY source
), a AS (SELECT n AS na, s AS sa, ss AS ssa FROM g WHERE source = '{T_SRC_A}'),
b AS (SELECT n AS nb, s AS sb, ss AS ssb FROM g WHERE source = '{T_SRC_B}'),
j AS (
    SELECT na, nb,
        CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
        CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        (CAST(ssa AS DOUBLE) - CAST(na AS DOUBLE)
            * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
            * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)))
            / (CAST(na AS DOUBLE) - 1) AS va,
        (CAST(ssb AS DOUBLE) - CAST(nb AS DOUBLE)
            * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
            * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
            / (CAST(nb AS DOUBLE) - 1) AS vb
    FROM a CROSS JOIN b
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
    round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
    round((ma - mb) / sqrt(va / nad + vb / nbd), 6) AS t_stat,
    round((va / nad + vb / nbd) * (va / nad + vb / nbd)
          / ((va / nad) * (va / nad) / (nad - 1)
             + (vb / nbd) * (vb / nbd) / (nbd - 1)), 6) AS welch_df
FROM j
"""


# --------------------------------------- Poisson bootstrap CI
#
# The SCALABLE bootstrap: instead of materializing B resamples of a
# 100 TB table (impossible), each row draws an independent Poisson(1)
# weight per replicate — the standard streaming/Poisson bootstrap
# approximation to multinomial resampling, whose replicate sums are
# plain weighted aggregates. ONE scan computes all B replicate
# (Σ w·x, Σ w) pairs as map-side combiner aggregates; the final
# reduction is a single row. The bootstrap SE and a trimmed
# percentile envelope of the B replicate means come from a 16-element
# sorted array — constant-size driver-free math.
#
# Determinism (both engines bit-identical): weights derive from md5 of
# the row key — two md5s per row yield 16 four-hex-digit slices, each
# an exact 16-bit integer u; the Poisson(1) inverse CDF is the integer
# threshold table _BOOT_T (floor(CDF_k · 65536), computed ONCE in
# Python — no float parity surface), so w = |{k : u >= T_k}| is pure
# integer comparison. Replicate sums are DECIMAL-exact (order-free);
# only the final mean/SE math runs in doubles via sequential folds.

import math as _math  # noqa: E402

BOOT_B = 16  # replicates

# Poisson(1) CDF thresholds scaled to 16 bits — integer literals, so
# the per-row draw is pure integer comparison in both engines
_BOOT_T = []
_cdf = 0.0
_e1 = _math.exp(-1.0)
_fact = 1
for _k in range(7):
    if _k > 0:
        _fact *= _k
    _cdf += _e1 / _fact
    _BOOT_T.append(int(_cdf * 65536))


def _u16(md5col, slot: int):
    """16-bit integer from hex chars [slot*4, slot*4+4) of an md5 —
    one base-16 conv per slice (the oracle parses digit-by-digit with
    strpos; both are exact integer parses of the same 4 chars)."""
    return F.conv(
        F.substring(md5col, slot * 4 + 1, 4), 16, 10
    ).cast("int")


def _poisson_w(u):
    """Poisson(1) draw from a 16-bit uniform via integer thresholds."""
    w = F.lit(7)
    for k in range(len(_BOOT_T) - 1, -1, -1):
        w = F.when(u < F.lit(_BOOT_T[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("x")
    )
    key = F.concat_ws(
        ":", F.col("l_orderkey"), F.col("l_linenumber")
    )
    # materialize hashes → uniforms → weights in CHAINED PROJECTIONS
    # (one whole-stage-codegen pass): aggregate expressions get no
    # common-subexpression elimination across buffers, so inlining the
    # md5/u16 trees into the 32 SUM arms re-evaluates each md5
    # hundreds of times per row (measured 10× the runtime)
    hashed = li.select(
        F.col("x").cast("decimal(15,10)").alias("xdec"),
        *[
            F.md5(F.concat(key, F.lit(f":{g}"))).alias(f"h{g}")
            for g in range(2)
        ],
    )
    us = hashed.select(
        "xdec",
        *[
            _u16(F.col(f"h{b // 8}"), b % 8).alias(f"u{b}")
            for b in range(BOOT_B)
        ],
    )
    ws = us.select(
        "xdec",
        *[
            _poisson_w(F.col(f"u{b}")).alias(f"w{b}")
            for b in range(BOOT_B)
        ],
    )
    aggs = [
        F.count("*").alias("n"),
        F.sum("xdec").alias("sx"),
    ]
    for b in range(BOOT_B):
        aggs.append(
            F.sum(F.col("xdec") * F.col(f"w{b}")).alias(f"s{b}")
        )
        aggs.append(F.sum(F.col(f"w{b}").cast("long")).alias(f"c{b}"))
    one = ws.agg(*aggs)
    means = F.array(
        *[
            F.col(f"s{b}").cast("double") / F.col(f"c{b}").cast("double")
            for b in range(BOOT_B)
        ]
    )
    srt = F.array_sort(means)
    mm = (
        F.aggregate(srt, F.lit(0.0), lambda a, x: a + x) / BOOT_B
    )
    with_arr = one.select(
        "n", "sx", srt.alias("ms"), mm.alias("mm")
    )
    se = F.sqrt(
        F.aggregate(
            F.col("ms"),
            F.lit(0.0),
            lambda a, x: a + (x - F.col("mm")) * (x - F.col("mm")),
        )
        / F.lit(BOOT_B - 1)
    )
    return with_arr.select(
        "n",
        F.round(
            F.col("sx").cast("double") / F.col("n").cast("double"), 6
        ).alias("point_mean"),
        F.round(se, 9).alias("boot_se"),
        F.round(F.element_at("ms", 2), 6).alias("ci_lo"),
        F.round(F.element_at("ms", BOOT_B - 1), 6).alias("ci_hi"),
        F.lit(BOOT_B).alias("b_replicates"),
    )


def _bootstrap_ci_sql() -> str:
    hexd = "0123456789abcdef"

    def u16(g: int, slot: int) -> str:
        parts = []
        for c in range(4):
            d = (
                f"(strpos('{hexd}', substr(h{g}, {slot * 4 + c + 1}, 1))"
                " - 1)"
            )
            parts.append(f"{d} * {16 ** (3 - c)}")
        return "(" + " + ".join(parts) + ")"

    def pois(u: str) -> str:
        w = "7"
        for k in range(len(_BOOT_T) - 1, -1, -1):
            w = f"CASE WHEN {u} < {_BOOT_T[k]} THEN {k} ELSE {w} END"
        return f"({w})"

    rep_aggs = []
    for b in range(BOOT_B):
        w = pois(u16(b // 8, b % 8))
        rep_aggs.append(
            f"SUM(xdec * {w}) AS s{b}, CAST(SUM({w}) AS BIGINT) AS c{b}"
        )
    means = ", ".join(
        f"CAST(s{b} AS DOUBLE) / CAST(c{b} AS DOUBLE)"
        for b in range(BOOT_B)
    )
    return f"""
WITH keyed AS (
    SELECT CAST(l_quantity AS DECIMAL(15,10)) AS xdec,
        md5(CAST(l_orderkey AS VARCHAR) || ':'
            || CAST(l_linenumber AS VARCHAR) || ':0') AS h0,
        md5(CAST(l_orderkey AS VARCHAR) || ':'
            || CAST(l_linenumber AS VARCHAR) || ':1') AS h1
    FROM lineitem
), agged AS (
    SELECT COUNT(*) AS n, SUM(xdec) AS sx,
        {", ".join(rep_aggs)}
    FROM keyed
), arr AS (
    SELECT n, sx, list_sort([{means}]) AS ms FROM agged
), mm AS (
    SELECT n, sx, ms,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ms),
                    (a, x) -> a + x) / {BOOT_B} AS mm
    FROM arr
)
SELECT CAST(n AS BIGINT) AS n,
    round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS point_mean,
    round(sqrt(list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ms, x -> (x - mm) * (x - mm))),
        (a, x) -> a + x) / {BOOT_B - 1}), 9) AS boot_se,
    round(ms[2], 6) AS ci_lo,
    round(ms[{BOOT_B - 1}], 6) AS ci_hi,
    {BOOT_B} AS b_replicates
FROM mm
"""


# ------------------------------- two-feature OLS (normal equations)
#
# Multivariate linear regression by closed-form normal equations:
# predict n_chars from (token count, distinct-token count) per
# document — the 2-feature extension of stats_corr's single-feature
# algebra, the "which cheap features explain length" screen a quality
# model starts from. One scan computes the ten integer moment sums
# (DECIMAL(38,0)-exact in any order, the ts_trend_ols armor); the
# 3×3 system solves by Cramer's rule on the moments.
#
# Cross-engine: the Cramer determinants and r² are evaluated from ONE
# shared SQL formula string — Spark parses it with F.expr, DuckDB
# verbatim — so both engines execute the identical IEEE expression
# tree on identical moment doubles.

_OLS3_DET = (
    "(nn * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
_OLS3_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y))"
)
_OLS3_DET1 = (
    "(nn * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2))"
)
_OLS3_DET2 = (
    "(nn * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2))"
)
_OLS3_B0 = f"({_OLS3_DET0} / {_OLS3_DET})"
_OLS3_B1 = f"({_OLS3_DET1} / {_OLS3_DET})"
_OLS3_B2 = f"({_OLS3_DET2} / {_OLS3_DET})"
_OLS3_R2 = (
    f"(1.0 - (syy - {_OLS3_B0} * sy - {_OLS3_B1} * s1y"
    f" - {_OLS3_B2} * s2y) / (syy - sy * sy / nn))"
)


def ols_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("y"),
        ws_tokens(F.lower(F.col("text"))).alias("toks"),
    ).select(
        "y",
        F.size("toks").alias("x1"),
        F.size(F.array_distinct("toks")).alias("x2"),
    )

    def dsum(expr: str) -> Column:
        a, b = expr.split("*")
        return F.sum(
            F.col(a.strip()).cast("decimal(19,0)")
            * F.col(b.strip()).cast("decimal(19,0)")
        )

    m = docs.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("rs1"),
        F.sum("x2").alias("rs2"),
        F.sum("y").alias("rsy"),
        dsum("x1 * x1").alias("rs11"),
        dsum("x1 * x2").alias("rs12"),
        dsum("x2 * x2").alias("rs22"),
        dsum("x1 * y").alias("rs1y"),
        dsum("x2 * y").alias("rs2y"),
        dsum("y * y").alias("rsyy"),
    ).select(
        "n",
        F.col("n").cast("double").alias("nn"),
        F.col("rs1").cast("double").alias("s1"),
        F.col("rs2").cast("double").alias("s2"),
        F.col("rsy").cast("double").alias("sy"),
        F.col("rs11").cast("double").alias("s11"),
        F.col("rs12").cast("double").alias("s12"),
        F.col("rs22").cast("double").alias("s22"),
        F.col("rs1y").cast("double").alias("s1y"),
        F.col("rs2y").cast("double").alias("s2y"),
        F.col("rsyy").cast("double").alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.expr(_OLS3_B0), 6).alias("b0"),
        F.round(F.expr(_OLS3_B1), 6).alias("b1_tokens"),
        F.round(F.expr(_OLS3_B2), 6).alias("b2_distinct"),
        F.round(F.expr(_OLS3_R2), 6).alias("r2"),
    )


OLS_MULTI_SQL = f"""
WITH feats AS (
    SELECT n_chars AS y, len(toks) AS x1, len(list_distinct(toks)) AS x2
    FROM (
        SELECT n_chars,
            list_filter(string_split(lower(text), ' '), t -> t <> '')
                AS toks
        FROM documents
    )
), m AS (
    SELECT COUNT(*) AS n,
        CAST(COUNT(*) AS DOUBLE) AS nn,
        CAST(SUM(x1) AS DOUBLE) AS s1,
        CAST(SUM(x2) AS DOUBLE) AS s2,
        CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0)))
             AS DOUBLE) AS s11,
        CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
             AS DOUBLE) AS s12,
        CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
             AS DOUBLE) AS s22,
        CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             AS DOUBLE) AS s1y,
        CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             AS DOUBLE) AS s2y,
        CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             AS DOUBLE) AS syy
    FROM feats
)
SELECT CAST(n AS BIGINT) AS n_docs,
    round({_OLS3_B0}, 6) AS b0,
    round({_OLS3_B1}, 6) AS b1_tokens,
    round({_OLS3_B2}, 6) AS b2_distinct,
    round({_OLS3_R2}, 6) AS r2
FROM m
"""


# ------------------------------------------ Wilson score interval
#
# Exact-count binomial confidence interval per event_type: the share
# of high-value events (value ≥ WILSON_VAL_T) with its Wilson 95%
# bounds. Wilson beats the naive normal ("Wald") interval at small n
# and extreme p̂ — it never leaves [0, 1] — and is the standard for
# conversion-rate dashboards and A/B guardrails.
#
# Scale: one map-side conditional agg per type (combiner-backed);
# the interval math runs on |types| rows. Determinism: n and k are
# exact integers; the Wilson formula is a single shared arithmetic
# expression evaluated from identical inputs in both engines
# (sqrt is IEEE-exact), then rounded.

WILSON_VAL_T = 100.0
WILSON_Z = 1.96  # 95% two-sided

# the shared formula strings (F.expr in Spark, verbatim in DuckDB)
# guarantee an identical IEEE expression tree in both engines
_WILSON_CENTER = (
    "(phat + z2 / (2.0 * n)) / (1.0 + z2 / n)"
)
_WILSON_HALF = (
    "({z} * sqrt(phat * (1.0 - phat) / n + z2 / (4.0 * n * n)))"
    " / (1.0 + z2 / n)"
).format(z=WILSON_Z)


def wilson_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            (F.col("value") >= WILSON_VAL_T).cast("long")
        ).alias("n_high"),
    )
    z2 = WILSON_Z * WILSON_Z
    base = agg.select(
        "event_type",
        "n_events",
        "n_high",
        F.col("n_events").cast("double").alias("n"),
        (
            F.col("n_high").cast("double")
            / F.col("n_events").cast("double")
        ).alias("phat"),
        F.lit(z2).alias("z2"),
    )
    return base.select(
        "event_type",
        "n_events",
        "n_high",
        F.round("phat", 6).alias("p_hat"),
        F.round(
            F.expr(f"{_WILSON_CENTER} - {_WILSON_HALF}"), 6
        ).alias("ci_low"),
        F.round(
            F.expr(f"{_WILSON_CENTER} + {_WILSON_HALF}"), 6
        ).alias("ci_high"),
    )


WILSON_CI_SQL = f"""
WITH agg AS (
    SELECT event_type, COUNT(*) AS n_events,
        SUM(CASE WHEN value >= {WILSON_VAL_T} THEN 1 ELSE 0 END)
            AS n_high
    FROM events GROUP BY event_type
), base AS (
    SELECT event_type, n_events, n_high,
        CAST(n_events AS DOUBLE) AS n,
        CAST(n_high AS DOUBLE) / CAST(n_events AS DOUBLE) AS phat,
        {WILSON_Z} * {WILSON_Z} AS z2
    FROM agg
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
    CAST(n_high AS BIGINT) AS n_high,
    round(phat, 6) AS p_hat,
    round({_WILSON_CENTER} - {_WILSON_HALF}, 6) AS ci_low,
    round({_WILSON_CENTER} + {_WILSON_HALF}, 6) AS ci_high
FROM base
"""


# ------------------------------------------- Mann-Whitney U test
#
# Rank-sum test of `value` for purchase events vs all other types —
# the nonparametric two-sample location test (the distribution-free
# complement of stats_welch_ttest, which assumes normality). Average
# ranks with ties, tie-corrected normal approximation.
#
# Determinism: every moment is an INTEGER — 2x the rank sum
# (2*R1 = sum over distinct values of n1_v * (2*cum_before + t_v + 1)
# is integer because avg ranks are halves) and the tie correction
# sum(t^3 - t) accumulate as DECIMAL(38,0); the z-score is then ONE
# shared arithmetic expression string evaluated by both engines
# (identical parse -> identical IEEE tree, the stats_ols_multi
# contract).
#
# Scale: one distinct-value agg (combiner-backed) then a global
# cumulative window over it — the stats_auc ECDF shape, same audit
# whitelist entry and same documented equi-depth pre-binning note for
# the 100 TB regime; the test itself reduces to ONE row.

_MWU_Z = (
    "(CAST(r1_twice AS DOUBLE) / 2.0E0"
    " - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0E0) / 2.0E0"
    " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0E0)"
    " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0E0"
    "   * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0E0)"
    "      - CAST(tie AS DOUBLE)"
    "        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
    "           * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0E0))))"
)


def mannwhitney_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    # NULL measurements are excluded on BOTH sides (NULL sort order
    # differs between engines, so letting one through would desync
    # the cumulative rank walk)
    per_v = (
        ev.where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n1v"),
            F.count("*").alias("tv"),
        )
    )
    w = W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    cum = per_v.withColumn(
        "cum_before", F.coalesce(F.sum("tv").over(w), F.lit(0))
    )
    mom = cum.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("tv") - F.col("n1v")).alias("n2"),
        F.sum(
            (
                F.col("n1v")
                * (2 * F.col("cum_before") + F.col("tv") + 1)
            ).cast("decimal(38,0)")
        ).alias("r1_twice"),
        F.sum(
            (
                F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")
            ).cast("decimal(38,0)")
        ).alias("tie"),
    )
    u1 = (
        F.col("r1_twice").cast("double") / F.lit(2.0)
        - F.col("n1").cast("double")
        * (F.col("n1").cast("double") + F.lit(1.0))
        / F.lit(2.0)
    )
    return mom.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(F.expr(_MWU_Z), 6).alias("z"),
    )


MANNWHITNEY_SQL = f"""
WITH per_v AS (
    SELECT value,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS n1v,
        COUNT(*) AS tv
    FROM events WHERE value IS NOT NULL GROUP BY value
), cum AS (
    SELECT n1v, tv,
        COALESCE(SUM(tv) OVER (ORDER BY value
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_before
    FROM per_v
), mom AS (
    SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
        CAST(SUM(tv - n1v) AS BIGINT) AS n2,
        SUM(CAST(n1v * (2*cum_before + tv + 1) AS DECIMAL(38,0)))
            AS r1_twice,
        SUM(CAST(tv*tv*tv - tv AS DECIMAL(38,0))) AS tie
    FROM cum
)
SELECT n1, n2,
    round(CAST(r1_twice AS DOUBLE) / 2.0E0
          - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0E0) / 2.0E0,
          1) AS u1,
    round({_MWU_Z}, 6) AS z
FROM mom
"""


# --------------------------------------------- Kendall tau-b
#
# Rank-correlation between daily order volume and daily revenue —
# the concordant/discordant-pair complement of stats_spearman (which
# correlates ranks; tau-b is the standard when ties matter and is
# what monitoring dashboards quote for monotone-trend strength).
#
# Scale: the ONLY corpus exchange is one daily count/sum aggregate
# (map-side combine); the pair enumeration runs over the CALENDAR-
# BOUNDED daily table (|days| ~ 365·years regardless of corpus size)
# as a broadcast nested-loop self-join — |days|² pairs ≈ millions,
# never corpus-sized. Determinism: x is an integer count and y an
# integer cents sum via the engine-identical floor(p*100 + 0.5)
# fold; every pair class is an integer count and tau-b is ONE shared
# formula string (identical IEEE tree, the stats_ols_multi contract).


def kendall_tau_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(
        F.count("*").alias("x"),
        F.sum(
            F.floor(
                F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
            ).cast("long")
        ).alias("y"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    ax, ay = F.col("a.x"), F.col("a.y")
    bx, by = F.col("b.x"), F.col("b.y")
    pairs = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d"))
    cls = pairs.agg(
        F.sum(
            (
                ((ax < bx) & (ay < by)) | ((ax > bx) & (ay > by))
            ).cast("long")
        ).alias("concordant"),
        F.sum(
            (
                ((ax < bx) & (ay > by)) | ((ax > bx) & (ay < by))
            ).cast("long")
        ).alias("discordant"),
        F.sum(((ax == bx) & (ay != by)).cast("long")).alias(
            "ties_x_only"
        ),
        F.sum(((ay == by) & (ax != bx)).cast("long")).alias(
            "ties_y_only"
        ),
        F.sum(((ax == bx) & (ay == by)).cast("long")).alias(
            "ties_both"
        ),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    base = n_days.crossJoin(F.broadcast(cls)).select(
        "*",
        (
            F.col("n_days") * (F.col("n_days") - 1) / F.lit(2)
        ).cast("long").alias("n_pairs"),
    )
    return base.select(
        "n_days",
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x_only",
        "ties_y_only",
        "ties_both",
        F.round(F.expr(_KENDALL_TAU_B), 6).alias("tau_b"),
    )


# shared formula (F.expr / verbatim SQL): tau-b from the pair-class
# integer counts; tx/ty = pairs tied in that variable incl. both-ties
_KENDALL_TAU_B = (
    "((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))"
    " / sqrt((CAST(n_pairs AS DOUBLE)"
    "         - CAST(ties_x_only + ties_both AS DOUBLE))"
    "        * (CAST(n_pairs AS DOUBLE)"
    "           - CAST(ties_y_only + ties_both AS DOUBLE))))"
)

KENDALL_TAU_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x,
        CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
             AS BIGINT) AS y
    FROM orders GROUP BY 1
), cls AS (
    SELECT
        CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                        OR (a.x > b.x AND a.y > b.y)
                 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                        OR (a.x > b.x AND a.y < b.y)
                 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x_only,
        CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y_only,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
                 THEN 1 ELSE 0 END) AS BIGINT) AS ties_both
    FROM daily a JOIN daily b ON a.d < b.d
), base AS (
    SELECT n_days, CAST(n_days * (n_days - 1) / 2 AS BIGINT)
            AS n_pairs,
        concordant, discordant, ties_x_only, ties_y_only, ties_both
    FROM (SELECT COUNT(*) AS n_days FROM daily) CROSS JOIN cls
)
SELECT n_days, n_pairs, concordant, discordant,
    ties_x_only, ties_y_only, ties_both,
    round({_KENDALL_TAU_B}, 6) AS tau_b
FROM base
"""


# ------------------------------------- jackknife variance (grouped)
#
# Delete-one-GROUP jackknife for the mean order value, with order
# months as the deletion blocks (the survey-statistics standard when
# observations cluster — deleting single rows underestimates the
# variance of a clustered mean). Reports the overall mean and the
# jackknife SE of that mean.
#
# Scale: one month-keyed agg (map-side combine) is the only corpus
# exchange; everything after runs on the |months|-sized table (80
# rows here; calendar-bounded at any corpus size). Determinism:
# monthly sums are integer cents (floor fold); each leave-one-out
# mean is computed in micro-cents with the overflow-safe split
# q·1e6 + (r·1e6 div m) — pure BIGINT div/% identical in both
# engines (no double quotient anywhere, the tm_cell_lifetimes rule);
# the variance moments accumulate as DECIMAL(38,0) and the final
# variance/SE is ONE shared formula string.


def jackknife_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("mth")
    ).agg(
        F.count("*").alias("n_i"),
        F.sum(
            F.floor(
                F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
            ).cast("long")
        ).alias("s_i"),
    )
    tot = monthly.agg(
        F.count("*").alias("g"),
        F.sum("n_i").alias("n"),
        F.sum("s_i").alias("s"),
    )
    loo = monthly.crossJoin(F.broadcast(tot)).select(
        "g",
        "n",
        "s",
        # theta_(i) in micro-cents: ((s-s_i) div m)*1e6 + remainder
        # scaled — keeps every intermediate under 2^63 as long as a
        # month has < 9.2e12 orders
        F.expr(
            "((s - s_i) div (n - n_i)) * 1000000"
            " + (((s - s_i) % (n - n_i)) * 1000000) div (n - n_i)"
        ).alias("theta_i"),
    )
    m = loo.groupBy("g", "n", "s").agg(
        F.sum(F.col("theta_i").cast("decimal(38,0)")).alias("b"),
        F.sum(
            F.col("theta_i").cast("decimal(38,0)")
            * F.col("theta_i").cast("decimal(38,0)")
        ).alias("a"),
    )
    base = m.select(
        F.col("g").cast("long").alias("n_months"),
        F.col("n").cast("long").alias("n_orders"),
        F.expr(
            "(s div n) * 1000000 + ((s % n) * 1000000) div n"
        ).alias("theta_micro"),
        F.col("g").cast("double").alias("gg"),
        F.col("a").cast("double").alias("aa"),
        F.col("b").cast("double").alias("bb"),
    )
    return base.select(
        "n_months",
        "n_orders",
        "theta_micro",
        F.round(F.expr(_JACK_SE_MICRO), 3).alias("jack_se_micro"),
    )


# jackknife SE in micro-cents: sqrt((g-1)/g * sum((theta_i - mean)^2))
# with sum of squared deviations via the integer-moment identity
# (g*a - b*b)/g on the DECIMAL-exact a, b
_JACK_SE_MICRO = (
    "sqrt(((gg - 1.0) / gg) * ((gg * aa - bb * bb) / gg))"
)

JACKKNIFE_SQL = f"""
WITH monthly AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS mth, COUNT(*) AS n_i,
        CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
             AS BIGINT) AS s_i
    FROM orders GROUP BY 1
), tot AS (
    SELECT COUNT(*) AS g, SUM(n_i) AS n, SUM(s_i) AS s FROM monthly
), loo AS (
    SELECT g, n, s,
        ((s - s_i) // (n - n_i)) * 1000000
            + (((s - s_i) % (n - n_i)) * 1000000) // (n - n_i)
            AS theta_i
    FROM monthly CROSS JOIN tot
), m AS (
    SELECT g, n, s,
        SUM(CAST(theta_i AS DECIMAL(38,0))) AS b,
        SUM(CAST(theta_i AS DECIMAL(38,0))
            * CAST(theta_i AS DECIMAL(38,0))) AS a
    FROM loo GROUP BY g, n, s
), base AS (
    SELECT CAST(g AS BIGINT) AS n_months, CAST(n AS BIGINT) AS n_orders,
        CAST((s // n) * 1000000 + ((s % n) * 1000000) // n AS BIGINT)
            AS theta_micro,
        CAST(g AS DOUBLE) AS gg, CAST(a AS DOUBLE) AS aa,
        CAST(b AS DOUBLE) AS bb
    FROM m
)
SELECT n_months, n_orders, theta_micro,
    round({_JACK_SE_MICRO}, 3) AS jack_se_micro
FROM base
"""


# -------------------------------------- Hodges-Lehmann pseudo-median
#
# The Hodges-Lehmann location estimator of each event type's daily
# volume: the median of all pairwise Walsh averages (x_i + x_j)/2,
# i <= j. The robust-location companion of ts_theil_sen (which is HL
# applied to pairwise slopes): ~96% Gaussian efficiency with a 29%
# breakdown point, the estimator behind the Wilcoxon signed-rank
# interval.
#
# Scale: one daily count agg (map-side combine) is the only corpus
# exchange; Walsh pairs enumerate the CALENDAR-BOUNDED per-type daily
# table (|days|²/2 per type — constant at any corpus size) and the
# median windows are partitioned by type. Determinism: every Walsh
# sum is an integer (2× the average); the median rank picks are the
# ts_theil_sen k1/k2 expressions; the final milli value is an
# integer-div chain (no double division anywhere).

_HL_DAY = "ts div 1000000 div 86400000"


def hodges_lehmann_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(_HL_DAY).alias("day")
    ).agg(F.count("*").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") <= F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("d1"),
        F.col("b.day").alias("d2"),
        (F.col("a.x") + F.col("b.x")).alias("s"),
    )
    wp = W.partitionBy("event_type")
    ranked = walsh.select(
        "event_type",
        "s",
        F.row_number().over(wp.orderBy("s", "d1", "d2")).alias("rn"),
        F.count("*").over(wp).alias("n_pairs"),
    )
    picked = ranked.where(
        (F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        | (F.col("rn") == F.expr("n_pairs div 2 + 1"))
    ).groupBy("event_type", "n_pairs").agg(
        F.count("*").alias("cnt"), F.sum("s").alias("ssum")
    )
    return picked.select(
        "event_type",
        "n_pairs",
        F.expr("(((ssum * 2) div cnt) * 1000) div 4").alias(
            "hl_milli"
        ),
    )


HODGES_LEHMANN_SQL = f"""
WITH daily AS (
    SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        COUNT(*) AS x
    FROM events GROUP BY 1, 2
), walsh AS (
    SELECT a.event_type, a.day AS d1, b.day AS d2,
        a.x + b.x AS s
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.day <= b.day
), ranked AS (
    SELECT event_type, s,
        ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY s, d1, d2) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM walsh
), picked AS (
    SELECT event_type, n_pairs, COUNT(*) AS cnt,
        CAST(SUM(s) AS BIGINT) AS ssum
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2 OR rn = n_pairs // 2 + 1
    GROUP BY event_type, n_pairs
)
SELECT event_type, n_pairs,
    CAST((((ssum * 2) // cnt) * 1000) // 4 AS BIGINT) AS hl_milli
FROM picked
"""


REGISTRY = [
    ("stats_percentiles", percentiles_query, PERCENTILES_SQL),
    ("stats_chisq_independence", chisq_query, CHISQ_SQL),
    ("stats_histogram", histogram_query, HISTOGRAM_SQL),
    ("stats_eqfreq_bins", eqfreq_bins_query, EQFREQ_BINS_SQL),
    ("stats_mad", mad_query, MAD_SQL),
    ("stats_ks_test", ks_test_query, KS_TEST_SQL),
    ("stats_spearman", spearman_query, SPEARMAN_SQL),
    ("stats_auc", auc_query, AUC_SQL),
    ("stats_gini", gini_query, GINI_SQL),
    ("stats_welch_ttest", welch_ttest_query, WELCH_TTEST_SQL),
    # one-scan Poisson bootstrap (deterministic md5-seeded weights)
    ("stats_bootstrap_ci", bootstrap_ci_query, _bootstrap_ci_sql()),
    # 2-feature OLS via Cramer on decimal-exact moments
    ("stats_ols_multi", ols_multi_query, OLS_MULTI_SQL),
    # Wilson 95% binomial interval for high-value event share
    ("stats_wilson_ci", wilson_ci_query, WILSON_CI_SQL),
    # tie-corrected Mann-Whitney rank-sum test (round 8)
    ("stats_mannwhitney_u", mannwhitney_query, MANNWHITNEY_SQL),
    # Kendall tau-b over the calendar-bounded daily volume/revenue
    # table (round 9)
    ("stats_kendall_tau", kendall_tau_query, KENDALL_TAU_SQL),
    # delete-one-month jackknife SE of the mean order value (round 9)
    ("stats_jackknife_se", jackknife_query, JACKKNIFE_SQL),
    # Hodges-Lehmann pseudo-median of per-type daily volume (round 9)
    ("stats_hodges_lehmann", hodges_lehmann_query, HODGES_LEHMANN_SQL),
]
