"""Redundant-scan + shuffle audit: count FileScan / InMemoryTableScan
and Exchange nodes in every registered operator's physical plan and
flag multi-branch shapes that re-evaluate a corpus subtree once per
consumer.

At 100 TB every extra FileScan of a fact table is a full corpus
re-read. Spark's ReuseExchange only dedupes branches whose exchange
subtrees CANONICALIZE equal — which fails whenever the subtree
contains a higher-order-function lambda (tokenizers built on
transform()/filter()), so union-of-aggregates and agg+join-back plans
silently multiply scans. This sweep is how the round-8 rewrites
(SCALE.md "Round-8 redundant-scan audit") were found; keep it runnable
so regressions surface.

Usage:
    python tools/scan_audit.py [sf_dir] [--threshold=N] [--only=a,b]

Prints one line per operator over the threshold, then a JSON summary.
Exit code 0 always (diagnostic, not a gate): known-legitimate
multi-scan shapes are listed in WHITELIST with their reason — the
per-round adjudication lives in SCALE.md.

NOTE: the ops in api.EAGER_CONSTRUCTION (sketch_bloom_filter,
events_markov_stationary) run a bounded distributed job at
DataFrame-construction time — this audit triggers those jobs; they
are constant-size by contract but not free at large sf_dir.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Legitimate multi-scan shapes (adjudicated in SCALE.md round-8 audit).
WHITELIST = {
    # joins of DISTINCT tables: each FileScan is a different input
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q7", "tpch_q8",
    "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    # per-stage FILTERED scans (pushdown-friendly, intentional)
    "events_funnel", "events_conversion_latency",
    # base/delta two-phase IS the op's incremental semantics
    "cdc_ivm_join", "cdc_incremental_agg",
    # query/database sides of a self-scored corpus
    "sim_recall_at_k", "sim_recall_curve", "sim_nprobe_sweep",
    "sim_hamming_recall",
    # percentile-cutoff broadcast design (sanctioned r7; the window
    # alternative would single-task-sort the dominant language)
    "curate_ccnet_buckets",
    # percentile-cutoff decile design (sanctioned r7, same contract)
    "corpus_vocab_growth",
    # train/held-out split halves
    "corpus_ngram_novelty",
    # adjudicated at 5 in the round-8 audit: the rollup counters +
    # three gauge families + scrape watermark are genuinely different
    # aggregates of the feed (SCALE.md round-8 audit table)
    "cdc_metrics_exposition",
    # structural minimum after the round-8 rewrite (16 -> 6): four
    # fact-table rule passes + the two RI key-set sides
    "dq_constraints",
    # the idempotency PROOF applies the duplicated feed and the
    # exactly-once feed as genuinely independent aggregations and
    # compares the two states — two passes over the bootstrap union
    # (3 scans each) is the op's semantics, not a redundancy
    "cdc_sink_idempotency",
}


def audit(sf_dir: str, only=None, threshold: int = 5):
    from replicator_spark import api
    from replicator_spark.session import get_spark
    from replicator_spark.utils import uncached_file_scan_count

    spark = get_spark("scan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = api.queries()
    names = only or sorted(qs)
    rows = {}
    flagged = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only or env-gated ops
            rows[name] = {"error": type(e).__name__}
            continue
        n_scan = plan.count("FileScan")
        n_mem = plan.count("InMemoryTableScan")
        n_reuse = plan.count("ReusedExchange")
        rows[name] = {
            "file_scans": n_scan,
            "inmemory_scans": n_mem,
            "reused_exchanges": n_reuse,
            # Shuffle profile (plan-string counts; persisted subtrees
            # re-print their exchanges once per reference, so iterative
            # graph ops read high here — the runtime reads the cache).
            # rangepartitioning = a global sort (none anywhere as of
            # round 8); SortMergeJoin sites are recorded so big-big
            # joins stay deliberate (AQE still demotes small sides to
            # broadcast at runtime).
            "hash_exchanges": plan.count("Exchange hashpartitioning"),
            "range_exchanges": plan.count("Exchange rangepartitioning"),
            "single_exchanges": plan.count("Exchange SinglePartition"),
            "broadcast_exchanges": plan.count("BroadcastExchange"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
        }
        # InMemoryTableScan re-prints its cached subtree's FileScan in
        # the plan STRING; the runtime reads the cache. Count scans
        # OUTSIDE cached subtrees STRUCTURALLY (py4j tree walk): the
        # old "1 if any cache" floor hid new un-cached scans (r8
        # ADVICE), and string counts are poisoned by AQE final-plan
        # re-prints once a cache has been materialized (r9 finding).
        effective = uncached_file_scan_count(df)
        rows[name]["uncached_file_scans"] = effective
        if effective >= threshold and name not in WHITELIST:
            flagged.append(name)
            print(
                f"FLAG {name}: {n_scan} FileScan, {n_mem} InMemory,"
                f" {n_reuse} ReusedExchange"
            )
    print(
        json.dumps(
            {
                "metric": "scan_audit",
                "sf_dir": sf_dir,
                "threshold": threshold,
                "n_ops": len(rows),
                "flagged": flagged,
                "queries": rows,
            }
        )
    )
    spark.stop()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    threshold = 5
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            threshold = int(a.split("=", 1)[1])
        elif a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    audit(sf_dir, only=only, threshold=threshold)


if __name__ == "__main__":
    main()
