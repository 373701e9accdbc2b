"""Physical-plan regression tests: the scale properties the operators
claim (filter pushdown, no cartesian blowups, map-side partial
aggregation, bounded-only broadcast hints) asserted on the actual
Catalyst output, so a refactor can't silently regress them.
"""

from __future__ import annotations

import pytest


def _plan(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    from replicator_spark import api

    df = api.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    # only the needed columns reach the scan
    assert "l_comment" not in plan


def test_q6_fully_pushed_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18", "tpch_q21",
        "dedup_minhash_lsh", "tm_asof_snapshot",
    ],
)
def test_no_cartesian_or_nested_loop_blowup(spark, sf_dir, name):
    """Equi-joins must never degrade to CartesianProduct; the only
    nested-loop joins allowed are against 1-row aggregate sides."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_sim_queries_broadcast_only_bounded_sides(spark, sf_dir):
    """The ANN fine search broadcasts probes (|Q|×nprobe rows), never
    the candidate table."""
    plan = _plan(spark, sf_dir, "sim_ivf_topk")
    assert "CartesianProduct" not in plan


def test_feed_windows_share_one_exchange(spark, sf_dir):
    """The change-feed envelope computes its three window functions
    over a single hash exchange on user_id (the txn windows reuse the
    per-user partitioning — subset rule)."""
    plan = _plan(spark, sf_dir, "cdc_change_feed")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1
    # no second shuffle keyed by txn_xid alone
    assert "Exchange hashpartitioning(txn_xid" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables co-bucketed on the join key sort-merge-join with NO
    Exchange — the layout every repeated fact↔fact join should be
    written into at 100 TB. (A local Sort remains: Spark ≥3.0 dropped
    bucketed-scan output *ordering*, so only the network shuffle — the
    expensive part — is eliminated; the sort runs over already-sorted
    single-file buckets.)"""
    import contextlib
    import io

    from replicator_spark.session import read_table
    from replicator_spark.utils import bucketed_join, write_bucketed

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "t_orders_b", str(tmp_path / "o"), "o_orderkey", 8)
    write_bucketed(li, "t_lineitem_b", str(tmp_path / "l"), "o_orderkey", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(
            spark, "t_lineitem_b", "t_orders_b", ["o_orderkey"]
        ).select("o_orderkey", "o_orderstatus", "l_quantity")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2
        assert j.count() == li.count()  # inner join keeps every line
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_timemachine_cells_single_scan(spark, sf_dir):
    """The cell fan-out is one explode over one feed scan — not a
    3-way union re-reading the source."""
    import re

    plan = _plan(spark, sf_dir, "tm_cells")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Union" not in plan


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """The packing cumsum must partition by (lang, shard), not lang
    alone — otherwise window parallelism collapses to #languages at
    scale (round-1 verdict scale-killer)."""
    plan = _plan(spark, sf_dir, "curate_pack_sequences")
    import re

    m = re.search(r"Window .*partial_?sum?", plan) or re.search(
        r"\(\d+\) Window\b.*", plan
    )
    # the window spec line carries its partition keys
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan
    assert any("shard" in ln and "lang" in ln for ln in win_lines), win_lines


def test_pack_sequences_distinct_shards(spark, sf_dir):
    """Shard column actually spreads the data (parallelism = langs × shards)."""
    from pyspark.sql import functions as F

    from replicator_spark import api

    df = api.queries()["curate_pack_sequences"](spark, sf_dir)
    n = df.select("lang", "shard").distinct().count()
    langs = df.select("lang").distinct().count()
    assert n > langs  # more window partitions than languages


def test_scd2_single_exchange(spark, sf_dir):
    """SCD2 interval export: one keyed exchange feeding one window —
    no self-join, no extra shuffle."""
    plan = _plan(spark, sf_dir, "tm_scd2_intervals")
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_decontam_broadcasts_eval_side(spark, sf_dir):
    """The eval-set n-grams must broadcast (the stream side is the
    100 TB train corpus; shuffling it for the join would be the
    scale-killer)."""
    plan = _plan(spark, sf_dir, "curate_ngram_decontam")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    """Document frequencies are vocabulary-sized: broadcast, so the tf
    side is never re-shuffled for the join."""
    plan = _plan(spark, sf_dir, "text_tfidf")
    assert "BroadcastHashJoin" in plan


def test_apply_upsert_single_keyed_exchange(spark, sf_dir):
    """The MERGE materialization is one combiner-backed groupBy — no
    join of feed against state, no sort-merge machinery."""
    plan = _plan(spark, sf_dir, "cdc_apply_upsert")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_max_by" in plan or "partial_maxby" in plan.replace("_", "")


def test_snapshot_diff_no_broadcast_of_table_sides(spark, sf_dir):
    """Both diff sides are table-sized by design: the full outer join
    must be a shuffle join on the key, not a broadcast of either
    image."""
    plan = _plan(spark, sf_dir, "cdc_snapshot_diff")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "basket_copurchase", "graph_triangles", "text_pmi_bigrams",
        "curate_e2e_pipeline", "sim_recall_at_k", "sketch_cms_heavy",
    ],
)
def test_new_ops_no_cartesian(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_quality_filter_is_map_only(spark, sf_dir):
    """The filter chain must fuse into the scan: no exchange at all."""
    plan = _plan(spark, sf_dir, "curate_quality_filter")
    assert "Exchange" not in plan


def test_anomaly_zscore_single_window_exchange(spark, sf_dir):
    """count/sum/sum-of-squares share ONE window pass: exactly one
    shuffle exchange (hashpartitioning on user_id)."""
    plan = _plan(spark, sf_dir, "anomaly_zscore")
    assert plan.count(") Exchange") == 1
    assert plan.count(") Window") == 1
    assert "hashpartitioning(user_id" in plan


def test_pmi_broadcasts_vocabulary_sides(spark, sf_dir):
    """Unigram counts are vocabulary-sized: both joins onto the bigram
    table must be broadcasts, never a shuffle of the bigram side."""
    plan = _plan(spark, sf_dir, "text_pmi_bigrams")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_probe_joins_broadcast_sketch(spark, sf_dir):
    """The d×w-cell sketch must broadcast to the probe side."""
    plan = _plan(spark, sf_dir, "sketch_cms_heavy")
    assert "BroadcastHashJoin" in plan


def test_timemachine_store_partition_pruning(spark, sf_dir, tmp_path):
    """The partitioned store must prune to ONE table partition when a
    reader filters on table_name — the read-path half of the
    one-HBase-table-per-source-table layout."""
    import os

    from pyspark.sql import functions as F

    from replicator_spark.cdc.envelope import change_feed
    from replicator_spark.cdc.transactions import organized_feed_from
    from replicator_spark.sinks.timemachine import (
        cells_from,
        write_timemachine,
    )

    store = os.path.join(str(tmp_path), "store")
    cells = cells_from(organized_feed_from(change_feed(spark, sf_dir)))
    # sf0.001 events span one month → force multiple table partitions
    # so the pruning assertion isn't vacuous
    cells = cells.withColumn(
        "table_name",
        F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string")),
    )
    write_timemachine(cells, store, mode="overwrite")

    (one_table,) = (
        spark.read.parquet(store)
        .select("table_name")
        .limit(1)
        .collect()
    )
    pruned = spark.read.parquet(store).where(
        F.col("table_name") == one_table["table_name"]
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the table_name equality must be a PARTITION filter (directory
    # pruning), not a post-scan data filter
    import re

    (pf,) = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert "isnotnull(table_name" in pf
    assert "table_name" in pf and "= " in pf, pf
    # and it must not degrade into a row-level DataFilter
    df_filters = re.findall(r"DataFilters: \[([^\]]*)\]", plan)
    assert all("table_name" not in d for d in df_filters), df_filters


# ------------------------------------------------ round-4 additions


@pytest.mark.parametrize(
    "name",
    [
        "curate_mixture_weights", "curate_token_budget", "text_oov_rate",
        "text_bpe_pairs", "sketch_quantile_grid", "tm_snapshot_delta",
        "stats_ks_test", "dedup_dupfrac_ngrams",
    ],
)
def test_round4_ops_no_cartesian(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_oov_vocab_joins_broadcast(spark, sf_dir):
    """The 256-row vocab must broadcast back onto the exploded corpus;
    shuffling the token stream for that join would be the scale bug."""
    plan = _plan(spark, sf_dir, "text_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dupfrac_single_gram_exchange(spark, sf_dir):
    """The window rewrite's contract: the gram stream is shuffled ONCE
    (window by gram), then once more for the per-doc agg — no third
    exchange from an agg+join-back."""
    plan = _plan(spark, sf_dir, "dedup_dupfrac_ngrams")
    assert plan.count(") Window") == 1
    # exchanges: gram window + doc agg (partial agg keeps it at 2)
    assert plan.count(") Exchange") == 2


def test_snapshot_delta_two_stacked_aggs(spark, sf_dir):
    """One cells scan, conditional max_by: the delta must NOT contain a
    join of two snapshot subtrees."""
    plan = _plan(spark, sf_dir, "tm_snapshot_delta")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_grid_bounds_broadcast(spark, sf_dir):
    """Global min/max attach as a 1-row broadcast; the value stream is
    shuffled only for the (flag, bin) histogram agg."""
    plan = _plan(spark, sf_dir, "sketch_quantile_grid")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bounds attach


def test_source_overlap_single_corpus_exchange(spark, sf_dir):
    """The shingle incidence must feed ONE groupBy(g) exchange — no
    DISTINCT pre-shuffle, no lambda HOF under the Generate node (the
    interpreted-evaluation trap the arrays_zip form exists to avoid)."""
    plan = _plan(spark, sf_dir, "corpus_source_overlap")
    assert "arrays_zip" in plan
    assert "Generate" in plan
    # the dropped DISTINCT must stay dropped: no exchange keyed on the
    # raw (source, g) incidence — dedup happens inside the collect_set
    # combiner on the groupBy(g) exchange (per-source sizes still agg
    # on source alone, over the vocab-sized gram table)
    import re

    assert not re.search(r"hashpartitioning\(source#\d+, g#", plan)


def test_knn_graph_is_cell_equijoin(spark, sf_dir):
    """Candidates must come from the hyperplane-cell equi-join; a
    cartesian or nested-loop over the full table is exactly what the
    cell restriction exists to avoid. The quantizer bit-width h is
    resolved before plan build (scalar count), so the plan itself has
    no nested loop at all."""
    plan = _plan(spark, sf_dir, "sim_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate pair generation itself must be a hash/sort EQUI-join
    # on the derived cell id, never a nested loop
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_semantic_cells_is_cell_equijoin(spark, sf_dir):
    """SemDeDup candidate generation must be the same hash/sort
    equi-join on the derived cell id as the kNN graph — never a
    cartesian over the embedding table."""
    plan = _plan(spark, sf_dir, "dedup_semantic_cells")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_bpe_encode_broadcasts_vocab(spark, sf_dir):
    """The corpus-side token stream must join the vocab-bounded
    word→token-count table as a BROADCAST — shuffling the corpus
    against a vocab-sized relation would defeat the encode's one-scan
    contract."""
    plan = _plan(spark, sf_dir, "text_bpe_encode")
    assert "BroadcastHashJoin" in plan


def test_bloom_decontam_broadcasts_bits(spark, sf_dir):
    """The probe side must membership-test against a BROADCAST of the
    constant-size bit set — shuffling train grams against it would
    defeat the operator's point."""
    plan = _plan(spark, sf_dir, "curate_bloom_decontam")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_rfm_cutoffs_broadcast_back(spark, sf_dir):
    """The 3-value cutoff row joins back as a broadcast, never a
    shuffle of the per-user table against a 1-row relation."""
    plan = _plan(spark, sf_dir, "events_rfm_segments")
    assert "BroadcastExchange" in plan


def test_net_effect_single_keyed_exchange(spark, sf_dir):
    """min_by/max_by must partial-aggregate map-side: one exchange on
    the row key, combiner-backed."""
    plan = _plan(spark, sf_dir, "cdc_net_effect_compact")
    assert "min_by" in plan
    # two-phase aggregate (partial map-side + final) around exactly
    # one key exchange
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert plan.count("Exchange (") == 1
