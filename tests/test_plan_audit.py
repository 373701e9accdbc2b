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
