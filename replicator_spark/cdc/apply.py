"""Applier current-state materialization + snapshot diff.

`cdc_apply_upsert` is the net effect of the reference's applier write
path (HBaseApplier.java:166-196, the MySQL applier analog): apply the
bootstrap-snapshot ∪ change-feed union to produce the CURRENT table
state — last writer per row key wins, a trailing DELETE removes the
row. In SQL terms it is `MERGE INTO current USING feed` collapsed to
one batch expression.

`cdc_snapshot_diff` is the inverse direction (the reference's data
"validation service" compares source and target tables — SURVEY §2.8
validation side-channel): diff two table images and re-derive the NET
change feed (INSERT/UPDATE/DELETE per key) that transforms one into
the other. Here: initial `customer` snapshot vs the post-feed applied
state, so `diff ∘ apply = net(feed)` — a self-checking pair.

Scale shape (100 TB):
- apply: ONE combiner-backed exchange on the row key; every `max_by`
  partial-aggregates map-side, so shuffled bytes are one row per key
  per map partition, not the raw feed.
- diff: full outer join on the row key — both sides hash-partition on
  the same key; with a bucketed store this is exchange-free. No
  broadcast (both sides are table-sized by design).

NULL column images use the time-machine's 'NULL' sentinel: DuckDB's
`arg_max` silently skips NULL values (verified), so both engines
coalesce before the argmax and the sentinel IS the contract
(HBaseApplierMutationGenerator.java:268-270 stores the same literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table
from ..sources.bootstrap import BOOTSTRAP_UNION_SQL, bootstrap_union

NULL_SENTINEL = "NULL"

# DuckDB ordering key: scalar composite (no struct max_by keys in
# DuckDB). ts_ms*1e10 dominates; event_id (shifted non-negative —
# snapshot events use -c_custkey) breaks ties identically to Spark's
# struct(ts_ms, event_id). Valid while |event_id| < 1e8.
_ORD_K = "CAST(ts_ms AS HUGEINT) * 10000000000 + (event_id + 100000000)"


def applied_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per row key after replaying snapshot ∪ feed."""
    prep(spark)
    mut = bootstrap_union(spark, sf_dir).where(F.col("op") != "QUERY")
    keyed = mut.select(
        "user_id",
        "op",
        "ts_ms",
        "event_id",
        "source",
        F.coalesce(F.col("value_after").cast("string"),
                   F.lit(NULL_SENTINEL)).alias("value_s"),
        F.coalesce(F.col("props_after"),
                   F.lit(NULL_SENTINEL)).alias("props_s"),
    )
    ord_k = F.struct("ts_ms", "event_id")
    return keyed.groupBy("user_id").agg(
        F.max_by("op", ord_k).alias("last_op"),
        F.max_by("value_s", ord_k).alias("value"),
        F.max_by("props_s", ord_k).alias("props"),
        F.max_by("source", ord_k).alias("last_source"),
        F.max("ts_ms").alias("last_ts_ms"),
        F.count("*").alias("n_mutations"),
    )


def apply_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE materialization: live rows only (trailing DELETE drops)."""
    return applied_state(spark, sf_dir).where(F.col("last_op") != "DELETE")


APPLIED_STATE_SQL = (
    BOOTSTRAP_UNION_SQL
    + f""",
mut AS (SELECT * FROM unioned WHERE op <> 'QUERY'),
keyed AS (
    SELECT user_id, op, ts_ms, event_id, source,
        COALESCE(CAST(value_after AS VARCHAR), '{NULL_SENTINEL}')
            AS value_s,
        COALESCE(props_after, '{NULL_SENTINEL}') AS props_s,
        {_ORD_K} AS ord_k
    FROM mut
),
state AS (
    SELECT user_id,
        arg_max(op, ord_k) AS last_op,
        arg_max(value_s, ord_k) AS value,
        arg_max(props_s, ord_k) AS props,
        arg_max(source, ord_k) AS last_source,
        MAX(ts_ms) AS last_ts_ms,
        CAST(COUNT(*) AS BIGINT) AS n_mutations
    FROM keyed GROUP BY user_id
)
"""
)

APPLY_UPSERT_SQL = (
    APPLIED_STATE_SQL
    + "SELECT * FROM state WHERE last_op <> 'DELETE'\n"
)


def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net change feed between two table images (A = initial customer
    snapshot, B = post-feed applied state): keys only in B → INSERT,
    only in A → DELETE, changed images → UPDATE; identical rows are
    silent. Full outer join, both sides keyed identically."""
    prep(spark)
    a = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_acctbal").cast("double").cast("string").alias("value_a"),
        F.col("c_mktsegment").alias("props_a"),
    )
    b = applied_state(spark, sf_dir).where(
        F.col("last_op") != "DELETE"
    ).select(
        "user_id",
        F.col("value").alias("value_b"),
        F.col("props").alias("props_b"),
    )
    j = a.join(b, "user_id", "full_outer")
    diff_op = (
        F.when(F.col("value_a").isNull(), F.lit("INSERT"))
        .when(F.col("value_b").isNull(), F.lit("DELETE"))
        .when(
            (F.col("value_a") != F.col("value_b"))
            | (F.col("props_a") != F.col("props_b")),
            F.lit("UPDATE"),
        )
    )
    return (
        j.withColumn("diff_op", diff_op)
        .where(F.col("diff_op").isNotNull())
        .select("user_id", "diff_op", "value_a", "value_b",
                "props_a", "props_b")
    )


SNAPSHOT_DIFF_SQL = (
    APPLIED_STATE_SQL
    + """,
a AS (
    SELECT c_custkey AS user_id,
        CAST(CAST(c_acctbal AS DOUBLE) AS VARCHAR) AS value_a,
        c_mktsegment AS props_a
    FROM customer
),
b AS (
    SELECT user_id, value AS value_b, props AS props_b
    FROM state WHERE last_op <> 'DELETE'
),
j AS (
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        value_a, value_b, props_a, props_b,
        CASE WHEN value_a IS NULL THEN 'INSERT'
             WHEN value_b IS NULL THEN 'DELETE'
             WHEN value_a <> value_b OR props_a <> props_b THEN 'UPDATE'
        END AS diff_op
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
)
SELECT user_id, diff_op, value_a, value_b, props_a, props_b
FROM j WHERE diff_op IS NOT NULL
"""
)

# ------------------------------------------------- incremental aggregates


def incremental_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of per-table aggregates from the
    change feed alone: each event contributes a DELTA (+after for
    INSERT, −before for DELETE, after−before for UPDATE) so the
    maintained SUM/COUNT never re-reads the base table — the applier's
    answer to "keep this dashboard aggregate current" without a 100 TB
    rescan per refresh (the streaming twin is the same expression
    under `foreachBatch`).

    Scale shape: the delta weights are map-side CASE expressions; the
    only exchange is one combiner-backed groupBy(table_name). Sum
    deltas accumulate as DECIMAL so the maintained value is exact and
    associative — incremental maintenance with float accumulation
    drifts, decimal doesn't.
    """
    prep(spark)
    from .envelope import change_feed

    feed = change_feed(spark, sf_dir).where(F.col("op") != "QUERY")
    dec = lambda c: F.coalesce(F.col(c).cast("decimal(18,6)"), F.lit(0))
    row_w = (
        F.when(F.col("op") == "INSERT", 1)
        .when(F.col("op") == "DELETE", -1)
        .otherwise(0)
    )
    val_w = (
        F.when(F.col("op") == "INSERT", dec("value_after"))
        .when(F.col("op") == "DELETE", -dec("value_before"))
        .otherwise(dec("value_after") - dec("value_before"))
    )
    return feed.groupBy(
        "table_name", (F.col("user_id") % 10).alias("user_bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("op") == "INSERT", 1).otherwise(0))
        .cast("long")
        .alias("n_ins"),
        F.sum(F.when(F.col("op") == "UPDATE", 1).otherwise(0))
        .cast("long")
        .alias("n_upd"),
        F.sum(F.when(F.col("op") == "DELETE", 1).otherwise(0))
        .cast("long")
        .alias("n_del"),
        F.sum(row_w).cast("long").alias("delta_rows"),
        F.round(F.sum(val_w), 2).cast("double").alias("delta_value"),
    )


from .envelope import CHANGE_FEED_SQL as _FEED_SQL  # noqa: E402

INCREMENTAL_AGG_SQL = f"""
WITH feed AS ({_FEED_SQL}),
weighted AS (
    SELECT table_name, user_id % 10 AS user_bucket, op,
        CASE WHEN op = 'INSERT' THEN 1
             WHEN op = 'DELETE' THEN -1 ELSE 0 END AS row_w,
        CASE WHEN op = 'INSERT'
                THEN COALESCE(CAST(value_after AS DECIMAL(18,6)), 0)
             WHEN op = 'DELETE'
                THEN -COALESCE(CAST(value_before AS DECIMAL(18,6)), 0)
             ELSE COALESCE(CAST(value_after AS DECIMAL(18,6)), 0)
                - COALESCE(CAST(value_before AS DECIMAL(18,6)), 0)
        END AS val_w
    FROM feed WHERE op <> 'QUERY'
)
SELECT table_name, user_bucket,
    COUNT(*) AS n_events,
    CAST(SUM(CASE WHEN op = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_ins,
    CAST(SUM(CASE WHEN op = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
    CAST(SUM(CASE WHEN op = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
    CAST(SUM(row_w) AS BIGINT) AS delta_rows,
    CAST(round(SUM(val_w), 2) AS DOUBLE) AS delta_value
FROM weighted GROUP BY table_name, user_bucket
"""


# --------------------------------------- incremental view maintenance
#
# Delta-join maintenance: the materialized view V = state(user) JOIN
# counts(user) is kept current WITHOUT recomputing from the full feed —
# the base window's partial results merge with the delta window's:
#   state:  argmax over (base_argmax UNION delta_argmax)  (associative)
#   counts: base_counts + delta_counts                    (additive)
# This is the algebra behind every "maintain the dashboard from the
# CDC stream" job: at 100 TB the base partials are a compact table
# (one row per key) and each delta batch touches only its own keys —
# the full feed is scanned once ever. The oracle recomputes V from the
# WHOLE feed; equality proves the maintenance algebra.

def ivm_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cdc.envelope import change_feed

    prep(spark)
    feed = change_feed(spark, sf_dir).where(F.col("op") != "QUERY")
    rng = feed.agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")
    ).select(F.expr("(mn + mx) div 2").alias("cut"))
    f = feed.crossJoin(F.broadcast(rng)).select(
        "user_id",
        "op",
        "ts_ms",
        "event_id",
        (F.col("ts_ms") >= F.col("cut")).alias("is_delta"),
        F.coalesce(
            F.col("value_after").cast("string"), F.lit(NULL_SENTINEL)
        ).alias("value_s"),
    )
    ord_k = F.struct("ts_ms", "event_id")

    def window_state(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by("value_s", ord_k).alias("value_s"),
            F.max_by("op", ord_k).alias("op"),
            F.max("ts_ms").alias("ts_ms"),
            F.max_by("event_id", ord_k).alias("event_id"),
        )

    base, delta = f.where(~F.col("is_delta")), f.where(F.col("is_delta"))
    merged_state = (
        window_state(base)
        .unionByName(window_state(delta))
        .groupBy("user_id")
        .agg(
            F.max_by("value_s", ord_k).alias("value"),
            F.max_by("op", ord_k).alias("last_op"),
            F.max("ts_ms").alias("last_ts_ms"),
        )
    )

    def window_counts(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("user_id").agg(F.count("*").alias(name))

    merged_counts = (
        window_counts(base, "n_base")
        .join(window_counts(delta, "n_delta"), "user_id", "full")
        .select(
            "user_id",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
        )
        .withColumn("n_changes", F.col("n_base") + F.col("n_delta"))
    )
    return merged_state.join(merged_counts, "user_id")


# Oracle: the SAME view recomputed from the whole feed in one pass
# (plus the cutoff-derived base/delta split so every column is
# checkable). Equality between the delta-merge plan and this full
# recompute is the IVM correctness property.
_IVM_ORD = "CAST(ts_ms AS HUGEINT) * 10000000000 + event_id"

IVM_JOIN_SQL = """
WITH feed AS ({change_feed}),
mut AS (SELECT * FROM feed WHERE op <> 'QUERY'),
rng AS (SELECT (MIN(ts_ms) + MAX(ts_ms)) // 2 AS cut FROM mut),
keyed AS (
    SELECT user_id, op, ts_ms, event_id,
        ts_ms >= cut AS is_delta,
        COALESCE(CAST(value_after AS VARCHAR), '{null_s}') AS value_s
    FROM mut CROSS JOIN rng
)
SELECT user_id,
    arg_max(value_s, {ord}) AS value,
    arg_max(op, {ord}) AS last_op,
    MAX(ts_ms) AS last_ts_ms,
    CAST(SUM(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
        AS n_delta,
    COUNT(*) AS n_changes
FROM keyed
GROUP BY user_id
"""


def _ivm_sql() -> str:
    from ..cdc.envelope import CHANGE_FEED_SQL

    return IVM_JOIN_SQL.format(
        change_feed=CHANGE_FEED_SQL, null_s=NULL_SENTINEL, ord=_IVM_ORD
    )


# ------------------------------------------------ net-effect compaction
#
# Collapse each row key's mutation RUN into its single net mutation —
# the applier-side batching optimization the reference performs before
# flushing (HBaseApplier.java:166-196 keeps only the latest image per
# key per flush; a MySQL applier batches the same way): within one
# batch, INSERT→…→DELETE nets to NOTHING, INSERT→…→UPDATE nets to one
# INSERT (final image), UPDATE/DELETE→…→DELETE nets to one DELETE, and
# anything else nets to one UPDATE with the final image. The collapsed
# feed applies to the target in one write per key — identical final
# state, a fraction of the write amplification.
#
# Derivation needs only first-op + last-op + last image per key: one
# combiner-backed min_by/max_by agg on the row key (the same exchange
# shape as cdc_apply_upsert — shuffled bytes are one row per key per
# map partition at 100 TB).


def net_effect_from(
    feed: DataFrame, group_cols: tuple = ("user_id",)
) -> DataFrame:
    """Collapse a change feed (user_id, op, ts_ms, event_id,
    value_after) to net mutations — the property-testable core.
    ``group_cols`` is the row-identity key: the runner passes
    (table_name, user_id) so ops on different physical tables never
    collapse together (the reference batches per (table, rowkey),
    HBaseApplier.java:166-196); the registered op keeps the plain
    user_id key its oracle mirrors."""
    keyed = feed.select(
        *group_cols,
        "op",
        "ts_ms",
        "event_id",
        F.coalesce(F.col("value_after").cast("string"),
                   F.lit(NULL_SENTINEL)).alias("value_s"),
    )
    ord_k = F.struct("ts_ms", "event_id")
    runs = keyed.groupBy(*group_cols).agg(
        F.min_by("op", ord_k).alias("first_op"),
        F.max_by("op", ord_k).alias("last_op"),
        F.max_by("value_s", ord_k).alias("value"),
        F.max("ts_ms").alias("last_ts_ms"),
        F.count("*").alias("n_collapsed"),
    )
    net = (
        F.when(
            (F.col("first_op") == "INSERT") & (F.col("last_op") == "DELETE"),
            F.lit(None).cast("string"),  # net no-op: never existed
        )
        .when(F.col("last_op") == "DELETE", F.lit("DELETE"))
        .when(F.col("first_op") == "INSERT", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    return (
        runs.withColumn("net_op", net)
        .where(F.col("net_op").isNotNull())
        .select(
            *group_cols,
            "net_op",
            F.when(F.col("net_op") == "DELETE", F.lit(NULL_SENTINEL))
            .otherwise(F.col("value"))
            .alias("value"),
            "last_ts_ms",
            "n_collapsed",
        )
    )


def net_effect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    # feed only — the bootstrap snapshot is not a mutation run
    from .envelope import change_feed

    return net_effect_from(
        change_feed(spark, sf_dir).where(
            F.col("op").isin("INSERT", "UPDATE", "DELETE")
        )
    )


NET_EFFECT_SQL = (
    f"""
WITH feed AS ({_FEED_SQL}),
mut AS (
    SELECT user_id, op, ts_ms, event_id,
        COALESCE(CAST(value_after AS VARCHAR), '{NULL_SENTINEL}')
            AS value_s,
        {_ORD_K} AS ord_k
    FROM feed WHERE op IN ('INSERT', 'UPDATE', 'DELETE')
),
runs AS (
    SELECT user_id,
        arg_min(op, ord_k) AS first_op,
        arg_max(op, ord_k) AS last_op,
        arg_max(value_s, ord_k) AS value,
        MAX(ts_ms) AS last_ts_ms,
        CAST(COUNT(*) AS BIGINT) AS n_collapsed
    FROM mut GROUP BY user_id
)
SELECT user_id,
    CASE WHEN last_op = 'DELETE' THEN 'DELETE'
         WHEN first_op = 'INSERT' THEN 'INSERT'
         ELSE 'UPDATE' END AS net_op,
    CASE WHEN last_op = 'DELETE' THEN '{NULL_SENTINEL}'
         ELSE value END AS value,
    last_ts_ms, n_collapsed
FROM runs
WHERE NOT (first_op = 'INSERT' AND last_op = 'DELETE')
"""
)


# -------------------------------------------- at-least-once idempotency
#
# The reference's appliers retry failed batches, so the sink sees
# AT-LEAST-ONCE delivery (HBaseApplier.java retry loop; Kafka applier
# acks). Correctness then rests on the apply being IDEMPOTENT: a
# duplicate of mutation m carries the same row key and ordering
# coordinates, so last-writer-wins lands on the same state. This op
# PROVES that property on data: it injects deterministic duplicates
# (md5-parity of event_id, ~50% of mutations delivered twice),
# applies both the duplicated and the exactly-once feed, and counts
# keys whose materialized state differs (must be 0), alongside the
# delivery-amplification ppm.
#
# Scale: two key-combiner aggregations (the applied_state shape) and
# a key-keyed join of two states — no broadcast of anything
# table-sized; the duplicate explode at most doubles the feed.


def sink_idempotency_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    mut = bootstrap_union(spark, sf_dir).where(F.col("op") != "QUERY")
    keyed = mut.select(
        "user_id",
        "op",
        "ts_ms",
        "event_id",
        F.coalesce(F.col("value_after").cast("string"),
                   F.lit(NULL_SENTINEL)).alias("value_s"),
        F.coalesce(F.col("props_after"),
                   F.lit(NULL_SENTINEL)).alias("props_s"),
    )
    dup = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("dup"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    copies = keyed.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), dup)
        ).alias("attempt"),
    )
    ord_k = F.struct("ts_ms", "event_id")

    def _state(df: DataFrame, cnt_name: str) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by("op", ord_k).alias("last_op"),
            F.max_by("value_s", ord_k).alias("value"),
            F.max_by("props_s", ord_k).alias("props"),
            F.count("*").alias(cnt_name),
        )

    a = _state(copies, "n_del")
    b = _state(keyed, "n_mut")
    cmp = a.join(
        b.select(
            "user_id",
            F.col("last_op").alias("op_b"),
            F.col("value").alias("value_b"),
            F.col("props").alias("props_b"),
            "n_mut",
        ),
        "user_id",
    ).select(
        "n_del",
        "n_mut",
        (
            (F.col("last_op") != F.col("op_b"))
            | (F.col("value") != F.col("value_b"))
            | (F.col("props") != F.col("props_b"))
        ).cast("long").alias("mismatch"),
    )
    return cmp.agg(
        F.count("*").alias("n_keys"),
        F.sum("n_del").alias("n_deliveries"),
        F.sum("n_mut").alias("n_mutations"),
        F.sum("mismatch").alias("mismatched_keys"),
    ).select(
        "n_keys",
        "n_deliveries",
        "n_mutations",
        "mismatched_keys",
        F.expr(
            "((n_deliveries - n_mutations) * 1000000) div n_mutations"
        ).alias("dup_ppm"),
    )


SINK_IDEMPOTENCY_SQL = (
    BOOTSTRAP_UNION_SQL
    + f""",
mut AS (SELECT * FROM unioned WHERE op <> 'QUERY'),
keyed AS (
    SELECT user_id, op, ts_ms, event_id,
        COALESCE(CAST(value_after AS VARCHAR), '{NULL_SENTINEL}')
            AS value_s,
        COALESCE(props_after, '{NULL_SENTINEL}') AS props_s,
        {_ORD_K} AS ord_k
    FROM mut
),
copies AS (
    -- range() is end-EXCLUSIVE (Spark's sequence(0, dup) is
    -- inclusive): parity 0 -> one copy, parity 1 -> two copies
    SELECT *, unnest(range(0,
        ((strpos('0123456789abcdef',
             substr(md5(concat('dup', ':', event_id)), 1, 1)) - 1)
            % 2) + 1)) AS attempt
    FROM keyed
),
state_a AS (
    SELECT user_id, arg_max(op, ord_k) AS last_op,
        arg_max(value_s, ord_k) AS value,
        arg_max(props_s, ord_k) AS props,
        COUNT(*) AS n_del
    FROM copies GROUP BY user_id
),
state_b AS (
    SELECT user_id, arg_max(op, ord_k) AS op_b,
        arg_max(value_s, ord_k) AS value_b,
        arg_max(props_s, ord_k) AS props_b,
        COUNT(*) AS n_mut
    FROM keyed GROUP BY user_id
),
cmp AS (
    SELECT n_del, n_mut,
        CASE WHEN a.last_op <> b.op_b OR a.value <> b.value_b
                  OR a.props <> b.props_b
             THEN 1 ELSE 0 END AS mismatch
    FROM state_a a JOIN state_b b USING (user_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
    CAST(SUM(n_del) AS BIGINT) AS n_deliveries,
    CAST(SUM(n_mut) AS BIGINT) AS n_mutations,
    CAST(SUM(mismatch) AS BIGINT) AS mismatched_keys,
    CAST(((SUM(n_del) - SUM(n_mut)) * 1000000) // SUM(n_mut)
         AS BIGINT) AS dup_ppm
FROM cmp
"""
)


REGISTRY = [
    ("cdc_apply_upsert", apply_upsert_query, APPLY_UPSERT_SQL),
    ("cdc_snapshot_diff", snapshot_diff_query, SNAPSHOT_DIFF_SQL),
    ("cdc_incremental_agg", incremental_agg_query, INCREMENTAL_AGG_SQL),
    ("cdc_ivm_join", ivm_join_query, _ivm_sql()),
    ("cdc_net_effect_compact", net_effect_query, NET_EFFECT_SQL),
    # at-least-once duplicate-delivery idempotency proof
    ("cdc_sink_idempotency", sink_idempotency_query,
     SINK_IDEMPOTENCY_SQL),
]
