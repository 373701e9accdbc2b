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


@pytest.mark.parametrize("name", _audit_names())
def test_no_scale_antipatterns_in_plan(spark, sf_dir, name):
    from replicator_spark import api

    df = api.queries()[name](spark, sf_dir)
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


# Physical nodes that bound the cardinality of everything above them:
# aggregates (output = group count) and limits/top-K (output ≤ K).
_BOUNDING = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "WindowGroupLimitExec",
}


def _subtree_is_bounded(node):
    return any(
        n.getClass().getSimpleName() in _BOUNDING
        for n in _iter_physical(node)
    )


@pytest.mark.parametrize("name", _audit_names())
def test_no_unpartitioned_window_over_corpus(spark, sf_dir, name):
    """An un-partitioned Window (no partitionBy) plans a
    single-partition global sort — every input row funnels through ONE
    task. That is fine over a cardinality-bounded input (a cumulative
    curve over a 10-row decile aggregate, a rank over a top-K) and
    fatal over a corpus-sized one (the corpus_vocab_growth NTILE class
    the round-6 verdict flagged). Sweep the PHYSICAL plan (the logical
    plan would miss Catalyst's rank-limit → TakeOrderedAndProject
    rewrite): every WindowExec with an empty partitionSpec must have a
    cardinality-bounding node (aggregate / limit / window-group-limit)
    somewhere beneath it — i.e. its input is a group-count or top-K
    table, never a raw scan."""
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
            assert _subtree_is_bounded(node), (
                f"{name}: un-partitioned Window over a non-bounded "
                "(potentially corpus-sized) input — single-partition "
                "global sort"
            )
