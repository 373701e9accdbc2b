"""Semantic tests for the round-2 late additions: funnel ordering,
retention cohort algebra, calendar gap-fill density/LOCF, profiling,
chunking, blocked matching, PageRank, Bloom membership, incremental
aggregate maintenance."""

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
    from replicator_spark.session import normalize_events

    ev = normalize_events(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select(
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


def test_profile_covers_every_column_once(spark, sf_dir):
    from replicator_spark.queries.profiling import (
        _PROFILE_COLS,
        profile_columns_query,
    )

    rows = profile_columns_query(spark, sf_dir).collect()
    assert sorted(r["column_name"] for r in rows) == sorted(
        c for c, _ in _PROFILE_COLS
    )
    flags = {r["column_name"]: r for r in rows}
    assert flags["l_returnflag"]["n_distinct"] == 3
    assert all(r["n_nulls"] == 0 for r in rows)
    kinds = dict(_PROFILE_COLS)
    for r in rows:
        k = kinds[r["column_name"]]
        lo, hi = r["min_value"], r["max_value"]
        if k in ("num", "int"):
            assert float(lo) <= float(hi)
        else:
            assert lo <= hi  # dates/strings order lexicographically


def test_histogram_partitions_the_table(spark, sf_dir):
    from replicator_spark.queries.profiling import histogram_query

    rows = sorted(
        histogram_query(spark, sf_dir).collect(), key=lambda r: r["bucket"]
    )
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n"] for r in rows) == n_li  # buckets partition all rows
    los = [r["bucket_lo"] for r in rows]
    assert los == sorted(los)


def test_corr_within_bounds(spark, sf_dir):
    from replicator_spark.queries.profiling import corr_query

    for r in corr_query(spark, sf_dir).collect():
        assert -1.0 <= r["corr_xy"] <= 1.0
        assert r["n_rows"] > 0


def test_chunks_cover_every_token(spark, sf_dir):
    """Chunk windows must tile each doc: first chunk starts at 0 and
    consecutive starts advance by the stride, so (n_chunks-1)*stride
    < n_tokens; the final chunk reaches the last token."""
    from replicator_spark.pipeline.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents_query,
    )
    from replicator_spark.pipeline.text import ws_tokens

    chunks = (
        chunk_documents_query(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max(
                F.col("chunk_idx") * CHUNK_STRIDE + F.col("n_chunk_tokens")
            ).alias("covered"),
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_tokens")
    )
    joined = chunks.join(docs, "doc_id")
    assert joined.where(F.col("covered") < F.col("n_tokens")).count() == 0
    assert (
        joined.where(
            (F.col("n_chunks") - 1) * CHUNK_STRIDE >= F.col("n_tokens")
        ).count()
        == 0
    )


def test_entity_match_stays_in_block(spark, sf_dir):
    from replicator_spark.pipeline.matching import (
        MAX_EDIT_DISTANCE,
        entity_match_query,
    )

    rows = entity_match_query(spark, sf_dir).collect()
    assert rows, "sf data has near-duplicate part names"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[-1] == r["block"]
        assert r["name_b"].split(" ")[-1] == r["block"]
        assert 1 <= r["edit_dist"] <= MAX_EDIT_DISTANCE


def test_pagerank_conserves_mass(spark, sf_dir):
    """Every node here has out-edges (edges are mirrored), so total
    rank mass is invariant: sum(rank) == n_nodes at every iteration."""
    from replicator_spark.queries.graph import pagerank_query

    rows = pagerank_query(spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - len(rows)) < 1e-3 * len(rows)
    assert all(r["rank"] >= 0.15 - 1e-9 for r in rows)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    from replicator_spark.pipeline.sketches import bloom_query

    r = bloom_query(spark, sf_dir).collect()[0]
    assert r["n_hits"] == r["n_true"] + r["n_false_pos"]
    assert r["n_hits"] >= r["n_true"]  # Bloom never misses a member
    assert 0 < r["n_bits_set"] <= 4096


def test_incremental_agg_telescopes(spark):
    """On a lifecycle-consistent feed (INSERT -> UPDATE* -> DELETE?),
    per-user value deltas telescope: sum(delta) == last after-image (0
    if the last op is DELETE) — the invariant that makes incremental
    view maintenance correct. (The sf fixture feed is deliberately NOT
    lifecycle-consistent — ops are event-type-mapped — so this checks
    the constructed case the applier contract describes.)"""
    from replicator_spark.cdc.envelope import change_feed_from

    base_ts = 1_704_067_200_000_000_000  # 2024-01-01 in ns
    rows = [
        # u1: insert, two updates
        Row(event_id=1, ts=base_ts + 1_000_000_000, user_id=1,
            event_type="signup", value=10.0, props="{}"),
        Row(event_id=2, ts=base_ts + 2_000_000_000, user_id=1,
            event_type="click", value=25.5, props="{}"),
        Row(event_id=3, ts=base_ts + 3_000_000_000, user_id=1,
            event_type="purchase", value=40.25, props="{}"),
        # u2: insert, update, delete
        Row(event_id=4, ts=base_ts + 1_000_000_000, user_id=2,
            event_type="signup", value=7.0, props="{}"),
        Row(event_id=5, ts=base_ts + 2_000_000_000, user_id=2,
            event_type="click", value=9.5, props="{}"),
        Row(event_id=6, ts=base_ts + 3_000_000_000, user_id=2,
            event_type="error", value=9.5, props="{}"),
    ]
    feed = (
        change_feed_from(spark.createDataFrame(rows))
        .where(F.col("op") != "QUERY")
        .select("user_id", "event_id", "op", "value_before", "value_after")
    )
    delta = F.when(
        F.col("op") == "INSERT", F.coalesce("value_after", F.lit(0.0))
    ).when(
        F.col("op") == "DELETE", -F.coalesce("value_before", F.lit(0.0))
    ).otherwise(
        F.coalesce("value_after", F.lit(0.0))
        - F.coalesce("value_before", F.lit(0.0))
    )
    per_user = (
        feed.groupBy("user_id")
        .agg(
            F.sum(delta).alias("maintained"),
            F.max_by(
                F.when(
                    F.col("op") == "DELETE", F.lit(0.0)
                ).otherwise(F.coalesce("value_after", F.lit(0.0))),
                "event_id",
            ).alias("final_value"),
        )
        .collect()
    )
    for r in per_user:
        assert abs(r["maintained"] - r["final_value"]) < 1e-6, r


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change join semantics — only the partition
    histogram."""
    from replicator_spark.utils import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    salted = salted_join(
        ev, dim, on=["event_type"], n_salts=8, big_id_cols=["event_id"]
    )
    plain = ev.join(dim, "event_type")
    assert salted.count() == plain.count()
    assert (
        salted.select("event_id", "event_type").exceptAll(
            plain.select("event_id", "event_type")
        ).count()
        == 0
    )


def test_copurchase_pairs_are_canonical(spark, sf_dir):
    from replicator_spark.queries.analytics import (
        MIN_SUPPORT,
        copurchase_query,
    )

    rows = copurchase_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_orders"] >= MIN_SUPPORT
