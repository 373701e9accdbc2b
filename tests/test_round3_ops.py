"""Semantic tests for the round-2 late additions: funnel ordering,
retention cohort algebra, calendar gap-fill density/LOCF."""

from __future__ import annotations

from pyspark.sql import Row, functions as F


def test_funnel_stages_are_monotone(spark, sf_dir):
    """Each funnel stage filters the previous one: n_view >= n_click >=
    n_purchase, and stage delays are positive (strictly-after rule)."""
    from replicator_spark.queries.funnel import funnel_query

    row = funnel_query(spark, sf_dir).collect()[0]
    assert row["n_view"] >= row["n_click"] >= row["n_purchase"]
    if row["n_click"]:
        assert row["avg_v2c_ms"] > 0
    if row["n_purchase"]:
        assert row["avg_c2p_ms"] > 0


def test_funnel_respects_order_not_just_presence(spark):
    """A user whose only purchase precedes their first click must NOT
    count as a purchase conversion — presence alone isn't a funnel."""
    from replicator_spark.queries import funnel as mod

    rows = [
        # u1: view -> click -> purchase (converts fully)
        Row(event_id=1, user_id=1, event_type="view", value=0.0, ts=1_000_000_000),
        Row(event_id=2, user_id=1, event_type="click", value=0.0, ts=2_000_000_000),
        Row(event_id=3, user_id=1, event_type="purchase", value=0.0, ts=3_000_000_000),
        # u2: purchase BEFORE click -> stops at click stage
        Row(event_id=4, user_id=2, event_type="view", value=0.0, ts=1_000_000_000),
        Row(event_id=5, user_id=2, event_type="purchase", value=0.0, ts=2_000_000_000),
        Row(event_id=6, user_id=2, event_type="click", value=0.0, ts=4_000_000_000),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(
            os.path.join(d, "events.parquet")
        )
        out = mod.funnel_query(spark, d).collect()[0]
    assert out["n_view"] == 2
    assert out["n_click"] == 2
    assert out["n_purchase"] == 1


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    """Offset-0 actives per cohort == cohort size (every user is active
    on their own first day, by construction)."""
    from replicator_spark.queries.funnel import retention_query

    ret = retention_query(spark, sf_dir)
    day0 = {
        r["cohort_day"]: r["n_active"]
        for r in ret.where(F.col("day_offset") == 0).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
    )
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.date_format(F.min("day"), "yyyy-MM-dd").alias("cohort_day"))
        .groupBy("cohort_day")
        .count()
        .collect()
    )
    assert day0 == {r["cohort_day"]: r["count"] for r in cohorts}


def test_gap_fill_is_dense_and_locf(spark, sf_dir):
    """Spine is dense (days x types, no holes) and amount is never null
    after the first observation of a type."""
    from replicator_spark.queries.funnel import gap_fill_query

    out = gap_fill_query(spark, sf_dir)
    per_type = (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.countDistinct("day").alias("n_distinct"),
        )
        .collect()
    )
    n_days = {r["event_type"]: r["n_days"] for r in per_type}
    assert len(set(n_days.values())) == 1  # every type has the full spine
    assert all(
        r["n_days"] == r["n_distinct"] for r in per_type
    )  # no duplicate days
    # After the first non-null amount per type, LOCF forbids nulls.
    w_ok = out.where(F.col("amount").isNull())
    first_obs = (
        out.where(F.col("n") > 0)
        .groupBy("event_type")
        .agg(F.min("day").alias("first_day"))
    )
    leaked = (
        w_ok.join(first_obs, "event_type")
        .where(F.col("day") >= F.col("first_day"))
        .count()
    )
    assert leaked == 0
