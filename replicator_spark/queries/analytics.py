"""Analytic-SQL surface: window-function suite, pivot, and
semi-structured (JSON) extraction — the remaining query-API families a
user coming from a SQL warehouse expects to Just Work.

Scale shapes: the window suite is one keyed exchange + one sort (all
six functions share the same window frame, Spark computes them in a
single pass); the pivot is a combiner-backed groupBy with a fixed
(explicit) pivot-value list so the schema is static — never use
inferred pivot values at scale, that's an extra distinct scan; JSON
extraction is map-side `get_json_object` (codegen'd path traversal, no
UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import prep, read_table

# ------------------------------------------------------------ window suite


def window_analytics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/row_number/ntile/percent_rank/cume_dist per user over
    event time — one window pass."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("prev_gap_ms"),
        (F.lead("ts_ms").over(w) - F.col("ts_ms")).alias("next_gap_ms"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT event_id, user_id,
    ts_ms - LAG(ts_ms) OVER w AS prev_gap_ms,
    LEAD(ts_ms) OVER w - ts_ms AS next_gap_ms,
    ROW_NUMBER() OVER w AS rn,
    NTILE(4) OVER w AS quartile,
    round(PERCENT_RANK() OVER w, 6) AS pct_rank,
    round(CUME_DIST() OVER w, 6) AS cume
FROM (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
"""

# ------------------------------------------------------------------- pivot

PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
)


def pivot_orders_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + exact decimal revenue per year, pivoted by
    priority (explicit value list → static schema, single groupBy)."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").alias("o_year"),
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    piv = (
        base.groupBy("o_year")
        .pivot("o_orderpriority", list(PRIORITIES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).cast("double").alias("amt"),
        )
    )
    cols = [F.col("o_year")]
    for p in PRIORITIES:
        cols.append(
            F.coalesce(F.col(f"`{p}_n`"), F.lit(0)).alias(f"{p}_n")
        )
        cols.append(
            F.coalesce(F.col(f"`{p}_amt`"), F.lit(0.0)).alias(f"{p}_amt")
        )
    return piv.select(*cols)


_PIVOT_COLS_SQL = ",\n    ".join(
    f"""COALESCE(CAST(COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END)
        AS BIGINT), 0) AS "{p}_n",
    COALESCE(CAST(round(SUM(CASE WHEN o_orderpriority = '{p}'
        THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE), 0.0)
        AS "{p}_amt\""""
    for p in PRIORITIES
)

PIVOT_ORDERS_SQL = f"""
SELECT year(o_orderdate) AS o_year,
    {_PIVOT_COLS_SQL}
FROM orders
GROUP BY year(o_orderdate)
"""

# ----------------------------------------------------------- json extract


def json_extract_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props handling: JSON path extraction + typed
    aggregation, per event_type."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.countDistinct("k").alias("k_distinct"),
    )


JSON_EXTRACT_SQL = """
WITH ev AS (
    SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
)
SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_with_k,
    CAST(SUM(k) AS BIGINT) AS k_sum,
    MIN(k) AS k_min, MAX(k) AS k_max,
    COUNT(DISTINCT k) AS k_distinct
FROM ev GROUP BY event_type
"""

# ------------------------------------------------------------ salted join

N_SALTS = 8


def salted_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof enrichment join, oracle-checked: events (big, keyed
    by the 5-value — maximally skewed — event_type) joined to a tiny
    per-type dimension through `utils.salted_join`, which spreads each
    hot key over N_SALTS shuffle partitions. The RESULT is provably
    identical to the plain key join (the oracle IS the plain join);
    what salting changes is only the partition histogram — no 20%-of-
    the-table reducer task at 100 TB. AQE's skew split covers
    sort-merge joins; explicit salting is the portable fix when the
    hot key is known ahead of time (same anti-hotspot idea as the
    reference's salted HBase rowkeys, SURVEY §2.4)."""
    prep(spark)
    from ..utils import salted_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(
        F.round(
            F.avg(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("type_avg")
    )
    joined = salted_join(
        ev, dim, on=["event_type"], n_salts=N_SALTS,
        big_id_cols=["event_id"],
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(
                (F.col("value") - F.col("type_avg")).cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("sum_centered"),
    )


SALTED_ENRICH_SQL = """
WITH dim AS (
    SELECT event_type,
        round(CAST(AVG(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
            AS type_avg
    FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n,
    CAST(round(SUM(CAST(e.value - d.type_avg AS DECIMAL(18,6))), 2)
        AS DOUBLE) AS sum_centered
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""

# ---------------------------------------------------------- market basket

MIN_SUPPORT = 3


def copurchase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs co-occurring in the same order (market-basket
    co-occurrence). Per-order part sets are collected once
    (combiner-backed groupBy on the already-clustered order key) and
    pairs expand in-basket — the same single-evaluation pairing the
    MinHash LSH buckets use, avoiding a fact-table self-join that
    would scan and shuffle lineitem twice. Expansion is quadratic in
    BASKET size (bounded, ~4 lines/order), never in table size."""
    prep(spark)
    lp = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = lp.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    """flatten(transform(parts, (x, i) ->
                        transform(slice(parts, i + 2, size(parts) - i - 1),
                                  y -> struct(x AS part_a, y AS part_b))))"""
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= MIN_SUPPORT)
    )


COPURCHASE_SQL = f"""
WITH lp AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    COUNT(*) AS n_orders
FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= {MIN_SUPPORT}
"""


# ------------------------------------------------------------ anomalies

ZS_LOOKBACK = 20  # rolling baseline: previous N events of the user
ZS_MIN_N = 10  # baseline must have at least this many samples
ZS_T = 3.0  # |z| threshold


def anomaly_zscore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score outliers: each event scored against
    the mean/std of the user's previous ZS_LOOKBACK event values (the
    standard streaming-telemetry anomaly rule). One exchange on
    user_id, one sorted window pass computing count/sum/sum-of-squares
    together — mean and variance come from the same frame, no
    self-join. Sums are DECIMAL (exact, order-independent) and the
    variance is derived from identical doubles in both engines, so the
    flagged set matches bit-for-bit. At 100 TB this is the shape you
    want: cost is the sort within each user partition, and skewed
    users are bounded by the frame (state = 3 numbers), not by
    history length."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    vd = F.col("value").cast("decimal(18,6)")
    scored = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(vd).over(w).cast("double").alias("s"),
        F.sum(vd * vd).over(w).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    flagged = scored.where(F.col("n") >= ZS_MIN_N).select(
        "event_id",
        "user_id",
        "value",
        F.round(mean, 6).alias("baseline_mean"),
        F.round(z, 4).alias("z"),
    )
    return flagged.where(F.abs(F.col("z")) >= ZS_T)


ANOMALY_ZSCORE_SQL = f"""
WITH ev AS (
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events
), scored AS (
    SELECT event_id, user_id, value,
        COUNT(*) OVER w AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
        CAST(SUM(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS ss
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value,
    round(s / n, 6) AS baseline_mean,
    round((value - s / n) / sqrt(ss / n - (s / n) * (s / n)), 4) AS z
FROM scored
WHERE n >= {ZS_MIN_N}
  AND abs(round((value - s / n) / sqrt(ss / n - (s / n) * (s / n)), 4))
      >= {ZS_T}
"""


# ---------------------------------------------------------------- EWMA

EWMA_ALPHA = 0.2


def ewma_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values —
    the recursive filter s_i = α·x_i + (1-α)·s_{i-1} that window
    frames cannot express (every output depends on the FULL prefix).
    Expressed as an ordered collect + sequential F.aggregate fold:
    JVM-side, one combiner-backed exchange on user_id, and the fold
    order is pinned by array_sort on (ts_ms, event_id) so both engines
    run the identical sequence of double ops — bit-for-bit equal.
    State per user is its own history; for unbounded streams the
    streaming twin keeps just s in a keyed state store. At 100 TB the
    per-key collect is bounded by per-user history (and a production
    variant folds per day then chains daily carries — same algebra,
    telescoped)."""
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.expr("ts div 1000000").alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            F.col("value").alias("v"),
        ).alias("rec"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("rec")).alias("recs")
    )
    vals = F.transform("recs", lambda r: r["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x
        + F.lit(1.0 - EWMA_ALPHA) * acc,
    )
    return per_user.select(
        "user_id",
        F.size("recs").alias("n_events"),
        (F.floor(ewma * 1e6 + F.lit(0.5)) / 1e6).alias("ewma"),
        F.element_at(vals, -1).alias("last_value"),
    )


EWMA_SQL = f"""
WITH ordered AS (
    SELECT user_id,
        list(value ORDER BY epoch_ms(ts), event_id) AS vals
    FROM events GROUP BY user_id
)
SELECT user_id,
    CAST(len(vals) AS INTEGER) AS n_events,
    floor(list_reduce(vals,
        (acc, x) -> {EWMA_ALPHA} * x + {1.0 - EWMA_ALPHA} * acc)
        * 1e6 + 0.5) / 1e6 AS ewma,
    vals[-1] AS last_value
FROM ordered
"""


# ------------------------------------------------- Markov transitions
#
# First-order event-type transition matrix over each user's time-
# ordered event stream — the behavioral-model summary behind funnel
# design and synthetic-session generation. One keyed window (lead) per
# user, then a combiner-backed count over ≤ |event_types|² keys;
# probabilities are integer-count ratios rounded to 6 dp (exact,
# order-free). Ties on ts break by event_id, same convention as the
# window suite.


def markov_transitions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    cnt = trans.groupBy("src_type", "dst_type").agg(
        F.count("*").alias("n_trans")
    )
    row_tot = cnt.groupBy("src_type").agg(F.sum("n_trans").alias("n_src"))
    return (
        cnt.join(F.broadcast(row_tot), "src_type")
        .select(
            "src_type",
            "dst_type",
            "n_trans",
            F.round(
                F.col("n_trans").cast("double") / F.col("n_src").cast("double"),
                6,
            ).alias("p"),
        )
    )


MARKOV_TRANSITIONS_SQL = """
WITH trans AS (
    SELECT event_type AS src_type,
        LEAD(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS dst_type
    FROM events
), cnt AS (
    SELECT src_type, dst_type, COUNT(*) AS n_trans
    FROM trans WHERE dst_type IS NOT NULL
    GROUP BY src_type, dst_type
), row_tot AS (
    SELECT src_type, CAST(SUM(n_trans) AS BIGINT) AS n_src
    FROM cnt GROUP BY src_type
)
SELECT src_type, dst_type, n_trans,
    round(CAST(n_trans AS DOUBLE) / CAST(n_src AS DOUBLE), 6) AS p
FROM cnt JOIN row_tot USING (src_type)
"""


# ------------------------------------------- Markov stationary dist
#
# Stationary distribution of the first-order event-type chain: P^64
# via six matrix squarings — at convergence every ROW of P^64 is the
# stationary distribution, so the full (converged) matrix is the
# output and the row-agreement is itself the convergence check.
#
# Arithmetic is INTEGER fixed-point throughout (nano-units, the
# engine-identical micro-unit pattern): transition probs quantize to
# q = floor(p * 1e9 + 0.5) as BIGINT via pure integer ops, each
# squaring computes (sum(q_ik*q_kj) + 5e8) // 1e9 — products <= 1e18
# fit BIGINT/HUGEINT, and // is exact floor in every engine — so the
# output is integers with ZERO float involvement anywhere.
#
# Scale: the distributed work is the transition count over the full
# stream (one lead window + one combiner agg); the 6 squarings act on
# a |types|^2 (constant-size) matrix on the driver — the
# emb_pca_power "driver eigensolve is constant" contract. Ref scope:
# beyond-reference analytics, same contract as markov_transitions.

MARKOV_POW_SCALE = 1_000_000_000
MARKOV_POW_ROUNDS = 6  # P^(2^6) = P^64


def markov_stationary_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    cnt = trans.groupBy("src_type", "dst_type").agg(
        F.count("*").alias("n_trans")
    )
    row_tot = cnt.groupBy("src_type").agg(
        F.sum("n_trans").alias("n_src")
    )
    # constant-size collects: |types| and |types|^2 rows
    types = sorted(
        r[0]
        for r in ev.select("event_type").distinct().collect()
    )
    scale = MARKOV_POW_SCALE
    q = {
        (r["src_type"], r["dst_type"]): (
            2 * r["n_trans"] * scale + r["n_src"]
        )
        // (2 * r["n_src"])
        for r in cnt.join(row_tot, "src_type").collect()
    }
    m = {
        (i, j): q.get((i, j), 0) for i in types for j in types
    }
    for _ in range(MARKOV_POW_ROUNDS):
        m = {
            (i, j): (
                sum(m[(i, k)] * m[(k, j)] for k in types)
                + scale // 2
            )
            // scale
            for i in types
            for j in types
        }
    return spark.createDataFrame(
        [(i, j, m[(i, j)]) for i in types for j in types],
        "src_type string, dst_type string, p64_nano long",
    )


def _markov_pow_step(prev: str, cur: str) -> str:
    return f"""{cur} AS MATERIALIZED (
    SELECT a.i, b.j,
        (SUM(a.q * b.q) + {MARKOV_POW_SCALE // 2})
            // {MARKOV_POW_SCALE} AS q
    FROM {prev} a JOIN {prev} b ON a.j = b.i
    GROUP BY a.i, b.j
)"""


_POW_STEPS = ",\n".join(
    _markov_pow_step(f"m{k}", f"m{k + 1}")
    for k in range(MARKOV_POW_ROUNDS)
)

MARKOV_STATIONARY_SQL = f"""
WITH trans AS (
    SELECT event_type AS src_type,
        LEAD(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS dst_type
    FROM events
), cnt AS (
    SELECT src_type, dst_type, COUNT(*) AS n_trans
    FROM trans WHERE dst_type IS NOT NULL
    GROUP BY src_type, dst_type
), row_tot AS (
    SELECT src_type, SUM(n_trans) AS n_src FROM cnt GROUP BY src_type
), types AS (
    SELECT DISTINCT event_type AS t FROM events
), m0 AS MATERIALIZED (
    SELECT g.i, g.j,
        COALESCE(
            (2 * n_trans * {MARKOV_POW_SCALE} + n_src) // (2 * n_src),
            0) AS q
    FROM (SELECT a.t AS i, b.t AS j FROM types a CROSS JOIN types b) g
    LEFT JOIN (SELECT src_type, dst_type, n_trans, n_src
               FROM cnt JOIN row_tot USING (src_type)) c
        ON g.i = c.src_type AND g.j = c.dst_type
),
{_POW_STEPS}
SELECT i AS src_type, j AS dst_type,
    CAST(q AS BIGINT) AS p64_nano
FROM m{MARKOV_POW_ROUNDS}
"""


# ---------------------------------------------------- top event paths
#
# The most-traveled length-3 behavioral paths (event-type trigrams per
# user's time-ordered stream) — the product-analytics "top user
# journeys" report, and the sequence-level complement of the Markov
# matrix (which only sees single transitions; a path distribution
# exposes higher-order structure the first-order chain misses). Two
# leads in ONE window pass, a combiner-backed count over ≤ |types|³
# keys, global top-N on that tiny table. Ties on ts break by event_id
# (the shared convention), the rank ties break lexicographically.

TOP_PATHS_N = 15


def top_paths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    cnt = paths.groupBy("e1", "e2", "e3").agg(F.count("*").alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    ranked = cnt.crossJoin(F.broadcast(tot)).withColumn(
        "rank",
        F.row_number().over(
            W.orderBy(
                F.col("n").desc(),
                F.col("e1"),
                F.col("e2"),
                F.col("e3"),
            )
        ),
    )
    return ranked.where(F.col("rank") <= TOP_PATHS_N).select(
        "rank",
        F.concat_ws(">", "e1", "e2", "e3").alias("path"),
        "n",
        F.round(
            F.col("n").cast("double") / F.col("total").cast("double"), 6
        ).alias("share"),
    )


TOP_PATHS_SQL = f"""
WITH paths AS (
    SELECT event_type AS e1,
        LEAD(event_type, 1) OVER w AS e2,
        LEAD(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cnt AS (
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM paths WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rank
    FROM cnt CROSS JOIN tot
)
SELECT rank, e1 || '>' || e2 || '>' || e3 AS path, n,
    round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
FROM ranked WHERE rank <= {TOP_PATHS_N}
"""


# ------------------------------------------ Markov entropy rate
#
# The information-theoretic summary of the transition matrix above:
# per-state conditional entropy H(dst | src = s) = −Σ_d p_sd ln p_sd
# and its stationary-weighted contribution π_s·H_s (π estimated as
# the empirical source-state share). Σ contributions = the chain's
# entropy rate — how predictable the NEXT event is given the current
# one, the sequence-level predictability dial (the Markov matrix
# shows the probabilities; this scores them). Algebra:
# π_s·H_s = −(Σ_d n_sd·ln p_sd)/N, so the whole table reduces with
# ONE decimal n×ln(p) fold (the lm.py armor) — order-exact.
#
# Scale: the same one-window lead pass as the transition matrix,
# then |types|²-bounded aggregation.


def entropy_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    cnt = trans.groupBy("src_type", "dst_type").agg(
        F.count("*").alias("n_trans")
    )
    row_tot = cnt.groupBy("src_type").agg(
        F.sum("n_trans").alias("n_src")
    )
    tot = cnt.agg(F.sum("n_trans").alias("n_all"))
    nlnp = F.col("n_trans").cast("decimal(19,0)") * F.round(
        F.log(
            F.col("n_trans").cast("double")
            / F.col("n_src").cast("double")
        ),
        9,
    ).cast("decimal(20,9)")
    per_src = (
        cnt.join(F.broadcast(row_tot), "src_type")
        .groupBy("src_type", "n_src")
        .agg(F.sum(nlnp).alias("_s"))
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "src_type",
            F.col("n_src").cast("long").alias("n_src"),
            F.round(
                F.col("n_src").cast("double")
                / F.col("n_all").cast("double"),
                6,
            ).alias("pi"),
            F.round(
                -F.col("_s").cast("double")
                / F.col("n_src").cast("double"),
                6,
            ).alias("h_cond"),
            F.round(
                -F.col("_s").cast("double")
                / F.col("n_all").cast("double"),
                6,
            ).alias("rate_contrib"),
        )
    )


ENTROPY_RATE_SQL = """
WITH trans AS (
    SELECT event_type AS src_type,
        LEAD(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS dst_type
    FROM events
), cnt AS (
    SELECT src_type, dst_type, COUNT(*) AS n_trans
    FROM trans WHERE dst_type IS NOT NULL
    GROUP BY src_type, dst_type
), row_tot AS (
    SELECT src_type, CAST(SUM(n_trans) AS BIGINT) AS n_src
    FROM cnt GROUP BY src_type
), tot AS (
    SELECT CAST(SUM(n_trans) AS BIGINT) AS n_all FROM cnt
), per_src AS (
    SELECT src_type, n_src,
        SUM(CAST(n_trans AS DECIMAL(19,0))
            * CAST(round(ln(CAST(n_trans AS DOUBLE)
                           / CAST(n_src AS DOUBLE)), 9)
                   AS DECIMAL(20,9))) AS s
    FROM cnt JOIN row_tot USING (src_type)
    GROUP BY src_type, n_src
)
SELECT src_type, n_src,
    round(CAST(n_src AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS pi,
    round(-CAST(s AS DOUBLE) / CAST(n_src AS DOUBLE), 6) AS h_cond,
    round(-CAST(s AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
        AS rate_contrib
FROM per_src CROSS JOIN tot
"""


# --------------------------------------------- user concentration
#
# Pareto/Lorenz concentration audit of event volume: per event_type,
# how much of the traffic the heaviest users generate — the share of
# the single top user and of the top decile (ceil(10%) of users,
# heaviest first). The "is this signal a few whales or the crowd"
# dial behind abuse triage, sampling design, and per-user rate caps.
#
# Scale: the only corpus-sized stage is the (event_type, user_id)
# count agg (combiner-backed). The per-user counts then COMPRESS to a
# (event_type, count, n_users_with_count) histogram — bounded by the
# number of DISTINCT count values, not the number of users — and the
# decile sum runs over that tiny table with exact tie-splitting at
# the boundary bucket (take only top_k − cum_prev of a tied bucket's
# users). Never a per-user rank window (millions of users per type
# would funnel through one partition's sort).
# Determinism: pure integer arithmetic until the two final ratios.


def pareto_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    uc = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("c")
    )
    hist = uc.groupBy("event_type", "c").agg(
        F.count("*").alias("nu")
    )
    tot = hist.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("nu")).alias("n_events"),
        F.sum("nu").alias("n_users"),
        F.max("c").alias("top_c"),
    )
    w = W.partitionBy("event_type").orderBy(F.col("c").desc())
    cum = hist.select(
        "event_type",
        "c",
        "nu",
        (F.sum("nu").over(w) - F.col("nu")).alias("cum_prev"),
    )
    j = cum.join(F.broadcast(tot), "event_type")
    top_k = F.floor((F.col("n_users") + 9) / 10)  # ceil(n_users/10)
    take = F.least(F.col("nu").cast("long"),
                   (top_k - F.col("cum_prev")).cast("long"))
    contrib = F.when(take > 0, take * F.col("c")).otherwise(F.lit(0))
    return (
        j.groupBy("event_type", "n_events", "n_users", "top_c")
        .agg(F.sum(contrib).alias("top_decile_events"))
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("top_decile_events").cast("long").alias(
                "top_decile_events"
            ),
            F.round(
                F.col("top_c").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ).alias("top_user_share"),
            F.round(
                F.col("top_decile_events").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ).alias("top_decile_share"),
        )
    )


PARETO_SHARE_SQL = """
WITH uc AS (
    SELECT event_type, user_id, COUNT(*) AS c
    FROM events GROUP BY event_type, user_id
), hist AS (
    SELECT event_type, c, COUNT(*) AS nu
    FROM uc GROUP BY event_type, c
), tot AS (
    SELECT event_type, SUM(c * nu) AS n_events, SUM(nu) AS n_users,
        MAX(c) AS top_c
    FROM hist GROUP BY event_type
), cum AS (
    SELECT event_type, c, nu,
        SUM(nu) OVER (PARTITION BY event_type ORDER BY c DESC) - nu
            AS cum_prev
    FROM hist
), j AS (
    SELECT cum.event_type, n_events, n_users, top_c,
        GREATEST(LEAST(CAST(nu AS BIGINT),
            CAST((n_users + 9) // 10 - cum_prev AS BIGINT)), 0) * c
            AS contrib
    FROM cum JOIN tot ON cum.event_type = tot.event_type
)
SELECT event_type,
    CAST(n_events AS BIGINT) AS n_events,
    CAST(n_users AS BIGINT) AS n_users,
    CAST(SUM(contrib) AS BIGINT) AS top_decile_events,
    round(CAST(top_c AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
        AS top_user_share,
    round(CAST(SUM(contrib) AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
        AS top_decile_share
FROM j
GROUP BY event_type, n_events, n_users, top_c
"""


# ------------------------------------------------ DAU/WAU stickiness
#
# The engagement ratio product teams watch: per ISO-ish week (epoch
# day div 7), weekly active users, summed daily actives, and the
# stickiness ratio avg-DAU/WAU in ppm. Stickiness near 1e6 means the
# same users return daily; near 1/7 of 1e6 means each user appears
# once a week.
#
# Scale: one (day, user) distinct is the only corpus-sized shuffle;
# the week-level distinct and the day counts both derive from that
# deduped table (users x days sized, far below raw events). All
# outputs are integers — the ratio uses BIGINT div (engine-identical,
# the tm_cell_lifetimes rule), no double division anywhere.

_EV_DAY = "ts div 1000000 div 86400000"


def dau_mau_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events")
    day_user = ev.select(
        F.expr(_EV_DAY).alias("day"), "user_id"
    ).distinct()
    base = day_user.select(
        (F.col("day") - (F.col("day") % 7)).alias("week"),
        "day",
        "user_id",
    )
    dau = base.groupBy("week", "day").agg(
        F.count("*").alias("dau")
    )
    weekly = dau.groupBy("week").agg(
        F.count("*").alias("n_days"),
        F.sum("dau").alias("dau_sum"),
    )
    wau = base.groupBy("week").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return weekly.join(wau, "week").select(
        "week",
        "n_days",
        "dau_sum",
        "wau",
        F.expr(
            "(dau_sum * 1000000) div (n_days * wau)"
        ).alias("stickiness_ppm"),
    )


DAU_MAU_SQL = f"""
WITH day_user AS (
    SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
    FROM events
), base AS (
    SELECT day - (day % 7) AS week, day, user_id FROM day_user
), dau AS (
    SELECT week, day, COUNT(*) AS dau FROM base GROUP BY week, day
), weekly AS (
    SELECT week, COUNT(*) AS n_days,
        CAST(SUM(dau) AS BIGINT) AS dau_sum
    FROM dau GROUP BY week
), wau AS (
    SELECT week, COUNT(DISTINCT user_id) AS wau FROM base
    GROUP BY week
)
SELECT week, n_days, dau_sum, wau,
    CAST((dau_sum * 1000000) // (n_days * wau) AS BIGINT)
        AS stickiness_ppm
FROM weekly JOIN wau USING (week)
"""


REGISTRY = [
    ("window_analytics", window_analytics_query, WINDOW_ANALYTICS_SQL),
    ("pivot_orders", pivot_orders_query, PIVOT_ORDERS_SQL),
    ("events_json_extract", json_extract_query, JSON_EXTRACT_SQL),
    ("join_salted_enrich", salted_enrich_query, SALTED_ENRICH_SQL),
    ("basket_copurchase", copurchase_query, COPURCHASE_SQL),
    ("anomaly_zscore", anomaly_zscore_query, ANOMALY_ZSCORE_SQL),
    ("ts_ewma", ewma_query, EWMA_SQL),
    ("events_markov_transitions", markov_transitions_query,
     MARKOV_TRANSITIONS_SQL),
    ("events_top_paths", top_paths_query, TOP_PATHS_SQL),
    # Pareto/Lorenz user-concentration audit (whales vs crowd)
    ("events_pareto_share", pareto_share_query, PARETO_SHARE_SQL),
    # Markov-chain entropy rate (per-state conditional entropies)
    ("events_entropy_rate", entropy_rate_query, ENTROPY_RATE_SQL),
    # integer fixed-point P^64 stationary distribution (round 8)
    ("events_markov_stationary", markov_stationary_query,
     MARKOV_STATIONARY_SQL),
    # weekly DAU/WAU stickiness from one (day,user) distinct
    ("events_dau_mau", dau_mau_query, DAU_MAU_SQL),
]
