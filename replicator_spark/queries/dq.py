"""Data-quality constraint checking (a Deequ/Great-Expectations-style
"expectations" report): declared constraints over the warehouse tables
— primary-key uniqueness, referential integrity, null and range rules
— evaluated in one batch and emitted as an auditable one-row-per-rule
report. This is the validation side-channel generalized from the
reference's row-sampling throttle (SURVEY §2.8, `cdc/validation.py`)
to schema-level invariants.

Scale shapes (100 TB):
- Uniqueness is `COUNT(*) - COUNT(DISTINCT key)` in a single
  combiner-backed aggregate — never a groupBy-then-filter over the
  key space (that would materialize a row per key).
- Referential integrity is a LEFT ANTI join counted — the dimension
  side (customer / orders keys) broadcasts when small; at dimension
  scale it's one shuffled semi-join, the minimum possible.
- Null/range rules are map-side conditional sums fused into each
  table's single scan (one pass per table, all rules of that table
  together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

QTY_MIN, QTY_MAX = 1, 50


def dq_constraints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass per fact table (round-8 scan audit: 16 scans -> 6, the
    structural minimum given the two RI probes): each table's rules —
    including its FK orphan count, marked by a LEFT join against the
    referenced key set — are fused into ONE aggregate row; the seven
    rule rows are then rendered from the crossed single-row aggregates
    by a constant-size struct explode (no per-rule branch re-scans)."""
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")
    events = read_table(spark, sf_dir, "events")

    cust_keys = (
        cust.select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
        .withColumn("_cm", F.lit(1))
    )
    o_agg = orders.join(cust_keys, "o_custkey", "left").agg(
        F.count("*").alias("n_o"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias(
            "o_pk_dups"
        ),
        F.sum(F.col("_cm").isNull().cast("long")).alias("o_orphans"),
    )
    o_keys = (
        orders.select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .withColumn("_om", F.lit(1))
    )
    li_agg = li.join(o_keys, "l_orderkey", "left").agg(
        F.count("*").alias("n_li"),
        (
            F.count("*")
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("li_pk_dups"),
        F.sum(
            (
                (F.col("l_quantity") < QTY_MIN)
                | (F.col("l_quantity") > QTY_MAX)
            ).cast("long")
        ).alias("qty_out"),
        F.sum(F.col("_om").isNull().cast("long")).alias("li_orphans"),
    )
    c_agg = cust.agg(
        F.count("*").alias("n_c"),
        F.sum(F.col("c_name").isNull().cast("long")).alias("c_nulls"),
    )
    e_agg = events.agg(
        F.count("*").alias("n_e"),
        F.sum((F.col("value") < 0).cast("long")).alias("e_neg"),
    )

    def _rule(name: str, checked: str, violations: str):
        return F.struct(
            F.lit(name).alias("constraint"),
            F.col(checked).alias("n_checked"),
            F.col(violations).alias("n_violations"),
        )

    one = o_agg.crossJoin(li_agg).crossJoin(c_agg).crossJoin(e_agg)
    return (
        one.select(
            F.explode(
                F.array(
                    _rule("orders_pk_unique", "n_o", "o_pk_dups"),
                    _rule("lineitem_pk_unique", "n_li", "li_pk_dups"),
                    _rule("lineitem_qty_range", "n_li", "qty_out"),
                    _rule("customer_name_not_null", "n_c", "c_nulls"),
                    _rule("events_value_nonneg", "n_e", "e_neg"),
                    _rule("orders_custkey_fk", "n_o", "o_orphans"),
                    _rule("lineitem_orderkey_fk", "n_li", "li_orphans"),
                )
            ).alias("r")
        )
        .select(
            "r.constraint",
            "r.n_checked",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


DQ_CONSTRAINTS_SQL = f"""
SELECT 'orders_pk_unique' AS constraint,
    CAST(COUNT(*) AS BIGINT) AS n_checked,
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
    COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
FROM orders
UNION ALL
SELECT 'lineitem_pk_unique',
    CAST(COUNT(*) AS BIGINT),
    CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
    COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber))
FROM lineitem
UNION ALL
SELECT 'lineitem_qty_range',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN l_quantity < {QTY_MIN} OR l_quantity > {QTY_MAX}
                  THEN 1 ELSE 0 END) AS BIGINT),
    SUM(CASE WHEN l_quantity < {QTY_MIN} OR l_quantity > {QTY_MAX}
             THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'customer_name_not_null',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
    SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0
FROM customer
UNION ALL
SELECT 'events_value_nonneg',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
    SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'orders_custkey_fk',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
    CAST(COUNT(*) AS BIGINT),
    COUNT(*) = 0
FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_orderkey_fk',
    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
    CAST(COUNT(*) AS BIGINT),
    COUNT(*) = 0
FROM lineitem l WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""

# ------------------------------------------------ Benford digit audit
#
# First-significant-digit distribution of order totals vs Benford's
# law — the classic forensic data-quality screen for fabricated or
# truncated monetary columns. The digit is extracted ARITHMETICALLY
# (first char of the exact integer cents, round(x·100) — prices carry
# 2 decimals), never via float log10, whose boundary ulps could
# misclassify a 10^k-adjacent value differently per engine. Expected
# shares are log10(1 + 1/d) rounded to 6 dp; observed shares are
# integer-count ratios. One combiner-backed 9-key agg — trivially
# 100 TB-safe.
#
# (TPC-H's uniform price generator is NOT Benford-distributed — the
# value of the audit is the deviation column itself, which the tests
# pin as stable.)


def benford_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    cnt = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("total"))
    benford_p = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
    )
    obs = F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6)
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs.alias("obs_p"),
            benford_p.alias("benford_p"),
            F.round(F.abs(obs - benford_p), 6).alias("abs_dev"),
        )
    )


BENFORD_SQL = """
WITH cnt AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS digit,
        COUNT(*) AS n
    FROM orders GROUP BY 1
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt)
SELECT digit, n,
    round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_p,
    round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
    round(abs(round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6)
              - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6)
        AS abs_dev
FROM cnt CROSS JOIN tot
"""


# -------------------------------- population stability index (drift)
#
# PSI of the event-type mix between the first and second half of the
# observed window — the standard model-monitoring drift score
# (PSI < 0.1: stable; > 0.25: population shift). Per type:
# contribution (p_a - p_b) * ln(p_a / p_b) with add-half smoothing
# ((c + 0.5) / (N + 0.5K)) so types absent from one half stay finite.
#
# Scale: ONE conditional count agg over events (map-side combine);
# everything downstream runs on the |types|-sized table with two
# 1-row broadcasts (the split threshold and the totals). Determinism:
# counts are integers; smoothed proportions are identical doubles in
# both engines; contributions use round(·, 9) -> DECIMAL like the
# text_bigram_lm log-prob precedent (PSI contributions are >= 0, both
# factors share a sign), and the nano outputs are floor folds.

_DQ_DAY = "ts div 1000000 div 86400000"


def psi_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = read_table(spark, sf_dir, "events").select(
        F.expr(_DQ_DAY).alias("day"), "event_type"
    )
    # integer div, not /2 + cast: Spark's long cast truncates while
    # DuckDB's rounds half-to-even — div/// agree exactly
    thr = ev.agg(F.min("day").alias("mn"), F.max("day").alias("mx")).select(
        F.expr("(mn + mx + 1) div 2").alias("thr")
    )
    halves = ev.crossJoin(F.broadcast(thr)).groupBy("event_type").agg(
        F.sum((F.col("day") < F.col("thr")).cast("long")).alias("c_a"),
        F.sum((F.col("day") >= F.col("thr")).cast("long")).alias(
            "c_b"
        ),
    ).persist()  # |types|-sized; its three consumers (tot, scored,
    # output) would otherwise each re-expand the events scan — the
    # plan showed 8 corpus FileScans before this persist (r9 scan
    # audit), 0 un-cached after
    tot = halves.agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count("*").alias("k"),
    )
    scored = halves.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "c_a",
        "c_b",
        F.expr(_PSI_CONTRIB_NANO).alias("contrib_nano"),
    )
    total = scored.agg(
        F.sum("contrib_nano").alias("psi_total_nano")
    )
    return scored.crossJoin(F.broadcast(total)).select(
        "event_type", "c_a", "c_b", "contrib_nano", "psi_total_nano"
    )


# shared contribution formula: smoothed proportions, raw IEEE
# (pa-pb)*ln(pa/pb), quantized by the engine-identical floor fold —
# NOT round(), which resolves to each engine's own (divergent)
# rounding; the total then sums INTEGERS, order-free. Literals are
# 0.5E0 (double), NOT 0.5 — Spark parses a bare decimal literal as
# DECIMAL and silently switches the whole division to decimal
# arithmetic (16-digit pb truncation, caught by the sf0.01 sweep).
_PSI_CONTRIB_NANO = (
    "CAST(floor((((c_a + 0.5E0) / (n_a + 0.5E0 * k)"
    " - (c_b + 0.5E0) / (n_b + 0.5E0 * k))"
    " * ln(((c_a + 0.5E0) / (n_a + 0.5E0 * k))"
    " / ((c_b + 0.5E0) / (n_b + 0.5E0 * k)))) * 1e9 + 0.5E0)"
    " AS BIGINT)"
)

PSI_DRIFT_SQL = f"""
WITH ev AS (
    SELECT epoch_ms(ts) // 86400000 AS day, event_type FROM events
), thr AS (
    SELECT (MIN(day) + MAX(day) + 1) // 2 AS thr
    FROM ev
), halves AS (
    SELECT event_type,
        CAST(SUM(CASE WHEN day < thr THEN 1 ELSE 0 END) AS BIGINT)
            AS c_a,
        CAST(SUM(CASE WHEN day >= thr THEN 1 ELSE 0 END) AS BIGINT)
            AS c_b
    FROM ev CROSS JOIN thr GROUP BY event_type
), tot AS (
    SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b, COUNT(*) AS k
    FROM halves
), scored AS (
    SELECT event_type, c_a, c_b, {_PSI_CONTRIB_NANO} AS contrib_nano
    FROM halves CROSS JOIN tot
), total AS (
    SELECT CAST(SUM(contrib_nano) AS BIGINT) AS psi_total_nano
    FROM scored
)
SELECT event_type, c_a, c_b, contrib_nano, psi_total_nano
FROM scored CROSS JOIN total
"""


REGISTRY = [
    ("dq_constraints", dq_constraints_query, DQ_CONSTRAINTS_SQL),
    ("dq_benford_digits", benford_query, BENFORD_SQL),
    # PSI population-drift score between window halves
    ("dq_psi_drift", psi_drift_query, PSI_DRIFT_SQL),
]
