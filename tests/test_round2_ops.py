"""Semantic unit tests for the round-2 operators: applier MERGE
materialization, snapshot diff, connected components, PII scrub,
int8 quantization."""

from __future__ import annotations

from pyspark.sql import Row, functions as F


def test_connected_components_chain_and_singleton(spark):
    """A 4-node chain must collapse to one component (multi-iteration
    propagation), an isolated node stays its own cluster."""
    from replicator_spark.pipeline.cluster import connected_components

    nodes = spark.createDataFrame(
        [Row(doc_id=i) for i in (1, 2, 3, 4, 9)]
    )
    edges = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=3, doc_b=4)]
    )
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_apply_upsert_last_writer_wins_and_delete(spark, sf_dir):
    """The applied state must equal replaying the feed event-by-event:
    no key may survive whose final mutation is DELETE, and every
    surviving value must be the latest (ts, event_id) writer's."""
    from replicator_spark.cdc.apply import applied_state
    from replicator_spark.sources.bootstrap import bootstrap_union

    state = applied_state(spark, sf_dir)
    assert state.where(F.col("last_op") == "QUERY").count() == 0
    # replay one touched user manually
    mut = (
        bootstrap_union(spark, sf_dir)
        .where((F.col("op") != "QUERY"))
        .orderBy("ts_ms", "event_id")
    )
    some_user = mut.where(F.col("source") == "binlog").first()["user_id"]
    events = mut.where(F.col("user_id") == some_user).collect()
    final = events[-1]
    got = state.where(F.col("user_id") == some_user).collect()[0]
    assert got["last_op"] == final["op"]
    expected_value = (
        "NULL" if final["value_after"] is None else str(final["value_after"])
    )
    assert got["value"] == expected_value
    assert got["n_mutations"] == len(events)


def test_snapshot_diff_roundtrip(spark, sf_dir):
    """diff(snapshot, apply(snapshot ∪ feed)) must only contain keys
    the binlog feed touched — untouched customers are silent."""
    from replicator_spark.cdc.apply import snapshot_diff_query
    from replicator_spark.cdc.envelope import change_feed

    diff = snapshot_diff_query(spark, sf_dir)
    touched = {
        r["user_id"]
        for r in change_feed(spark, sf_dir)
        .where(F.col("op") != "QUERY")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert {r["user_id"] for r in diff.collect()} <= touched
    ops = {r["diff_op"] for r in diff.collect()}
    assert ops <= {"INSERT", "UPDATE", "DELETE"}


def test_pii_scrub_counts(spark):
    """Email/IP/number patterns are counted and redacted."""
    from replicator_spark.pipeline.corpus import EMAIL_RE, IP_RE, NUM_RE

    df = spark.createDataFrame(
        [Row(text="mail a@b.co and 10.1.2.3 acct 123456789 end")]
    )
    out = df.select(
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("e"),
        F.regexp_count("text", F.lit(IP_RE)).alias("i"),
        F.regexp_count("text", F.lit(NUM_RE)).alias("n"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
            ),
            NUM_RE,
            "<NUM>",
        ).alias("s"),
    ).collect()[0]
    assert (out["e"], out["i"], out["n"]) == (1, 1, 1)
    assert out["s"] == "mail <EMAIL> and <IP> acct <NUM> end"


def test_quantize_int8_bounds(spark, sf_dir):
    """Quantized values stay in [-127, 127] and reconstruction error is
    bounded by (scale/2)^2 per element."""
    from replicator_spark.pipeline.vectors import quantize_int8_query

    rows = quantize_int8_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["mse_r"] <= (r["scale_r"] / 2) ** 2 + 1e-12
