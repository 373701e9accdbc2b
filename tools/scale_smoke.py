"""Scale-up smoke: measure operator runtime at 1x vs Rx data volume.

Builds an R-times replica of the star schema by unioning key-offset
copies (each replica is internally join-consistent: every key column
of a replica gets the same offset, so joins/groupings scale linearly
in replica count and never cross replicas except through shared tiny
dims). Then times a representative operator slate at both scales and
prints one JSON line with per-query seconds and the tN/t1 ratio.

A ratio near R (for scan-bound ops) or below R (for ops whose cost is
dominated by fixed overhead at this size) is the pass signal; a ratio
far ABOVE R flags superlinear behavior — a plan that would not survive
the 100 TB target. Usage:

    python tools/scale_smoke.py [R] [sf_dir]
                                [--fixed-users|--fixed-dups|--mode=unique-neardup]
                                [--only=name1,name2,...]

--only restricts the slate to the named operators (after any
--fixed-* slate narrowing) — for smoking newly-added ops without
re-running the whole slate.

--fixed-users keeps user_id UN-offset in the events replicas: user
count stays constant while per-user history grows R× (the complement
of the default mode, which grows users R× at constant history). This
pins the per-key window-frame claim for user-keyed operators like
anomaly_zscore: bounded rowsBetween frames must absorb R× history
without a per-key blowup. The slate narrows to the user-keyed ops.

--fixed-dups appends a per-replica tag to documents.text for replicas
r >= 1, so replica content is DISTINCT across replicas (no cross-
replica hash collisions) while each replica keeps the source data's
internal duplicate structure — i.e. duplicate DENSITY is held fixed
as the corpus grows R×, which is how a real corpus scales. The
default mode instead R-plicates identical content, inflating every
hash bucket R× — a duplicate-density increase that charges dedup
operators quadratic pair growth their real-scale profile would not
see (the round-5 verdict's `multimodal_phash_dedup` finding). The
slate narrows to the content-hash dedup ops.

--mode=unique-neardup rewrites a character class per replica
THROUGHOUT the document body ('e' → 'q<r>'), so replicas are distinct
to ANY content hash — including sparse strided/perceptual hashes that
cannot see --fixed-dups' O(1) suffix tag — while each replica keeps
the source corpus's internal duplicate and near-dup structure (a
deterministic rewrite maps dup pairs to dup pairs). This is the
DEFAULT replica for the perceptual-hash ops (PERCEPTUAL_SLATE) in the
grow-users run, retiring the round-12 caveat: under --fixed-dups,
replicas of a long doc remained dhash twins of each other, so
multimodal_phash_dedup's true-pair output grew ~R² by construction of
the replica (the adjudicated 13.8× harness artifact,
artifacts/profile_phash_r12.json) — a density profile no real corpus
shows. The fixed-dups mode remains the right profile for whole-text
hashes (md5, shingles), which read the tag.

Writes nothing outside a temp dir; testdata is read-only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.session import get_spark, prep  # noqa: E402

KEY_OFFSET = 10_000_000  # per-replica key stride (clears all sf0.1 ids)
TS_OFFSET_NS = 86_400 * 10**9  # one day per replica

# (table, key columns to offset, optional ts column)
OFFSETS = {
    "events": (["event_id", "user_id"], "ts"),
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "customer": (["c_custkey"], None),
    "supplier": (["s_suppkey"], None),
    "part": (["p_partkey"], None),
    "nation": ([], None),  # shared tiny dims: plain copies
    "region": ([], None),
}

SLATE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q21",
    # round-11 addition: the binlog v4 wire codec (linear per-row
    # encode+parse; dedicated pin artifacts scale_smoke_r11_binlog)
    "source_binlog_roundtrip",
    # round-12 additions: GTID resume + ENUM/SET through the wire
    "source_binlog_gtid_resume",
    "source_binlog_enum_roundtrip",
    # round-14 additions: legacy pre-5.6.4 temporals + the DDL
    # statement stream through the wire
    "source_binlog_legacy_temporals",
    "source_binlog_ddl_replay",
    "cdc_change_feed",
    "cdc_apply_upsert",
    "cdc_delay_gauge",
    "tm_asof_snapshot",
    "dedup_minhash_lsh",
    "sessionize_events",
    "anomaly_zscore",
    "text_tfidf",
    "stats_chisq_independence",
    "curate_e2e_pipeline",
    # round-4 additions: mixture/tokenizer/sketch family + the
    # window-rewritten dupfrac (its linearity claim changed plans)
    "dedup_dupfrac_ngrams",
    "curate_mixture_weights",
    "curate_token_budget",
    "text_oov_rate",
    "text_bpe_pairs",
    "sketch_quantile_grid",
    "emb_pca_power",
    # round-4 batch 2: iterative trainers + stateful streaming ops —
    # their scale claims (constant driver state, constant per-key
    # state-store rows) are exactly what the replica smoke checks
    "emb_kmeans",
    "sim_pq_codes",
    "stream_ewma",
    "stream_quantile_sketch",
    "tm_snapshot_delta",
    "dedup_containment",
    "stats_ks_test",
    # round-4 batch 3: diversity/rank-stats/admission-gate family —
    # their claimed shapes (vocab-bounded pair expansion, per-lang
    # rank windows, distinct-value cumsum, bounded per-bucket state)
    # are what the replica smoke checks
    "corpus_source_overlap",
    "corpus_entropy_kl",
    "stats_spearman",
    "stats_auc",
    "events_markov_transitions",
    "sketch_theta_ops",
    "stream_near_dedup",
    "source_csv_roundtrip",
    # round-4 batch 4-6: segmentation/graph/featurizer/decontam ops —
    # the claims under test are the median-cutoff broadcast (rfm), the
    # per-round survivor joins (kcore), the cell-bounded pair scoring
    # (knn graph, matryoshka), the constant-size bloom broadcast, and
    # the no-global-state featurizer
    "events_rfm_segments",
    "text_hashing_vectorizer",
    "graph_kcore",
    "sim_knn_graph",
    "cdc_net_effect_compact",
    "curate_bloom_decontam",
    "emb_matryoshka_fidelity",
    "dq_benford_digits",
    "stats_gini",
    "graph_assortativity",
    # round-4 final batch: capstones and audits — the claims under
    # test are the sweep-line over session boundaries (not raw
    # events), the two-exchange dataset card, the |days|-table
    # time-series stats, the one-window path/markov leads, the
    # streaming sink write path, and the per-cell-key depth agg
    "curate_dataset_card",
    "events_peak_concurrency",
    "events_interarrival",
    "events_top_paths",
    "cdc_order_audit",
    "tm_version_depth",
    "ts_autocorrelation",
    "ts_seasonality",
    "ts_profile_topk",
    "multimodal_phash_dedup",
    "stream_jsonl_sink",
    "stream_scd2_intervals",
    "sim_recall_curve",
    "stats_welch_ttest",
    "dedup_threshold_sweep",
    "text_bpe_train",
    # round-5 additions: encoder stats (vocab-bounded broadcast join)
    # + SemDeDup cell dedup (the corpus-scaled-quantizer linearity claim)
    "text_bpe_encode",
    "dedup_semantic_cells",
    "curate_cell_sample",
    "stats_bootstrap_ci",
    "ts_changepoint",
    # round-6 additions: the kNN label probe + LPA communities ride
    # the cell quantizer / Pregel shapes already under test; k-center
    # is K top-1 passes with constant driver state
    "sim_knn_classifier",
    "graph_label_propagation",
    "curate_coreset_kcenter",
    "corpus_vocab_growth",
    "sim_ivfadc_topk",
    "ts_trend_ols",
    # round-7 additions: positional-gram span merge (two linear
    # shuffles), DSIR/CCNet broadcast-scored docs, AMS sign explode
    "dedup_substring_spans",
    "curate_dsir_weights",
    "curate_ccnet_buckets",
    "sketch_ams_f2",
    "sim_mmr_select",
    "stats_ols_multi",
    "cdc_metrics_report",
    "emb_outlier_mahal",
    "corpus_dispersion_dp",
    "curate_dsir_sample",
    "text_token_entropy",
    "events_wow_growth",
    "sim_nprobe_sweep",
    "text_code_detect",
    # round-8 additions: the claims under test are the |types|-array
    # sequential fold (holt), the day-grid cumulative windows (KM),
    # the node-keyed degree agg (power law), the anti-join gram
    # membership check (novelty), the |langs|x|k| grid (temperature
    # mix), the prefix-keyed linear groupBy (template), and the
    # cell-key-partitioned lag (lifetimes)
    "ts_holt_winters",
    "events_survival_km",
    "graph_degree_powerlaw",
    "corpus_ngram_novelty",
    "curate_temperature_mix",
    "dedup_template_prefix",
    "tm_cell_lifetimes",
    "cdc_metrics_exposition",
    "stats_mannwhitney_u",
    "events_markov_stationary",
    "dedup_minhash_band_tuning",
    # round-10 addition: the streaming DDL replay — the claim under
    # test is that the driver-side replay cost tracks the (tiny) DDL
    # subset, not the event volume: only filtered DDL rows are
    # collected per batch
    "stream_schema_ddl_replay",
]

# user-keyed operators whose scale risk is per-key frame growth, not
# key-count growth — the --fixed-users slate
FIXED_USER_SLATE = [
    "cdc_change_feed",
    "sessionize_events",
    "anomaly_zscore",
    "ts_ewma",
]

# content-hash dedup ops whose scale risk is bucket growth, not row
# count — the --fixed-dups / --mode=unique-neardup slate
FIXED_DUPS_SLATE = [
    "multimodal_phash_dedup",
    "dedup_exact",
    "dedup_minhash_lsh",
]

# perceptual-hash ops: a sparse strided hash cannot see the fixed-dups
# suffix tag, so their DEFAULT replica is unique-neardup (whole-body
# per-replica rewrite — replicas are perceptually distinct, the
# within-replica duplicate/near-dup structure of the source corpus is
# preserved). Round-12 verdict task #6.
PERCEPTUAL_SLATE = [
    "multimodal_phash_dedup",
]


def build_replica(
    spark, sf_dir: str, out_dir: str, r_factor: int,
    doc_mode: str = "plain", tables=None,
) -> None:
    """doc_mode governs how DOCUMENT text differs across replicas:
    'plain' R-plicates identical content (hash buckets inflate R×);
    'fixed-dups' appends an O(1) per-replica suffix tag (whole-text
    hashes see distinct replicas; sparse perceptual hashes do NOT);
    'unique-neardup' rewrites a character class per replica
    throughout the body ('e' → 'q<r>'), so replicas are distinct to
    ANY content hash — including strided/perceptual ones — while each
    replica keeps the source corpus's internal duplicate and near-dup
    structure (the same rewrite maps dup pairs to dup pairs): the
    duplicate DENSITY a real corpus keeps as it grows."""
    if doc_mode not in ("plain", "fixed-dups", "unique-neardup"):
        raise SystemExit(f"unknown doc_mode {doc_mode!r}")
    for table, (keys, ts_col) in OFFSETS.items():
        if tables is not None and table not in tables:
            continue
        src = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if table == "events":
            from replicator_spark.session import normalize_events

            df = normalize_events(df)  # canonical INT64-nanos ts
        parts = []
        for r in range(r_factor):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(r * KEY_OFFSET))
            if ts_col is not None and r:
                p = p.withColumn(
                    ts_col, F.col(ts_col) + F.lit(r * TS_OFFSET_NS)
                )
            if doc_mode != "plain" and table == "documents" and r:
                if doc_mode == "fixed-dups":
                    # per-replica tag: replicas are mutually distinct
                    # to whole-text hashes, within-replica duplicate
                    # structure preserved
                    p = p.withColumn(
                        "text",
                        F.concat(F.col("text"), F.lit(f" qr{r}z")),
                    )
                else:  # unique-neardup: whole-body rewrite
                    p = p.withColumn(
                        "text",
                        F.regexp_replace("text", "e", f"q{r}"),
                    )
                p = p.withColumn("n_chars", F.length("text"))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if table == "events":
            # the real testdata ships events.parquet as a single FILE,
            # and the streaming reader's pathGlobFilter depends on that
            # shape (a directory's part-files don't match the glob and
            # the stream silently sees zero input) — mirror it exactly
            import glob
            import shutil

            tmp = os.path.join(out_dir, "_tmp_events")
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.move(part, os.path.join(out_dir, "events.parquet"))
            shutil.rmtree(tmp)
        else:
            out.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{table}.parquet")
            )


def time_slate(
    spark, queries, sf_dir: str, slate=None, dir_overrides=None
) -> dict[str, float]:
    times = {}
    for name in (slate or SLATE):
        fn = queries[name]
        d = (dir_overrides or {}).get(name, sf_dir)
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fixed_users = "--fixed-users" in sys.argv[1:]
    fixed_dups = "--fixed-dups" in sys.argv[1:]
    mode_args = [a for a in sys.argv[1:] if a.startswith("--mode=")]
    neardup = bool(mode_args) and mode_args[-1] == "--mode=unique-neardup"
    if mode_args and not neardup:
        raise SystemExit(f"unknown --mode (try unique-neardup)")
    r_factor = int(args[0]) if len(args) > 0 else 10
    sf_dir = (
        args[1]
        if len(args) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    slate = SLATE
    if fixed_users:
        slate = FIXED_USER_SLATE
        # history grows R×, user population doesn't
        OFFSETS["events"] = (["event_id"], "ts")
    elif fixed_dups or neardup:
        slate = FIXED_DUPS_SLATE
    only = [a for a in sys.argv[1:] if a.startswith("--only=")]
    if only:
        from replicator_spark import api as _api

        wanted = set(only[-1].split("=", 1)[1].split(","))
        unknown = wanted - set(_api.queries())
        if unknown:
            raise SystemExit(f"--only names not registered: {unknown}")
        # slate order first, then any registry-only names (ad-hoc
        # smoke of an op that isn't a standing slate member)
        extra = sorted(wanted - set(slate))
        slate = [n for n in slate if n in wanted] + extra
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)
    from replicator_spark import api

    queries = api.queries()
    base = tempfile.mkdtemp(prefix="scale_smoke_")
    side_bases: list[str] = []

    def side_replica(doc_mode: str) -> str:
        """A documents-only replica in the given mode, other tables
        symlinked from the grow-users base."""
        d = tempfile.mkdtemp(prefix=f"scale_smoke_{doc_mode[:4]}_")
        side_bases.append(d)
        build_replica(spark, sf_dir, d, r_factor,
                      doc_mode=doc_mode, tables=("documents",))
        for entry in os.listdir(base):
            dst = os.path.join(d, entry)
            if not os.path.exists(dst):
                os.symlink(os.path.join(base, entry), dst)
        return d

    try:
        build_replica(
            spark, sf_dir, base, r_factor,
            doc_mode=(
                "unique-neardup" if neardup
                else "fixed-dups" if fixed_dups else "plain"
            ),
        )
        # Self-documenting dedup ratios (round-9 verdict item #6,
        # refined by round-12 #6): in the default grow-users mode the
        # content-hash dedup ops are timed against a FIXED-DUPS
        # documents replica (grow-users R-plicates identical text,
        # inflating every hash bucket R× — a duplicate-density
        # increase no real corpus shows), and the PERCEPTUAL-hash ops
        # against a UNIQUE-NEARDUP replica (a sparse strided hash
        # cannot see the suffix tag, so fixed-dups replicas stay
        # perceptual twins and true-pair output grows ~R² by
        # construction — the retired 13.8× harness artifact).
        dir_overrides: dict[str, str] = {}
        replica_mode: dict[str, str] = {}
        if (
            not fixed_users
            and not fixed_dups
            and not neardup
            and any(n in slate for n in FIXED_DUPS_SLATE)
        ):
            fd_base = side_replica("fixed-dups")
            nd_base = (
                side_replica("unique-neardup")
                if any(n in slate for n in PERCEPTUAL_SLATE)
                else None
            )
            for name in FIXED_DUPS_SLATE:
                if name in slate:
                    if name in PERCEPTUAL_SLATE:
                        dir_overrides[name] = nd_base
                        replica_mode[name] = "unique-neardup"
                    else:
                        dir_overrides[name] = fd_base
                        replica_mode[name] = "fixed-dups"
        # warm-up JIT/scan caches so 1x isn't charged the startup cost
        time_slate(spark, queries, sf_dir, slate)
        t1 = time_slate(spark, queries, sf_dir, slate)
        tn = time_slate(spark, queries, base, slate, dir_overrides)
        report = {
            name: {
                "t1_sec": t1[name],
                f"t{r_factor}_sec": tn[name],
                "ratio": round(tn[name] / max(t1[name], 1e-9), 2),
                **(
                    {"replica_mode": replica_mode[name]}
                    if name in replica_mode
                    else {}
                ),
            }
            for name in slate
        }
        print(
            json.dumps(
                {
                    "metric": "scale_smoke",
                    "mode": ("fixed-users" if fixed_users else
                             "fixed-dups" if fixed_dups else
                             "unique-neardup" if neardup else
                             "grow-users"),
                    "r_factor": r_factor,
                    "sf_dir": sf_dir,
                    "queries": report,
                    "superlinear": [
                        n
                        for n, v in report.items()
                        if v["ratio"] > 1.5 * r_factor
                    ],
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        for d in side_bases:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
