"""Operator registry: every implemented operator from SURVEY.md §2 as a
(queries entry, oracle SQL) pair. `__spark_entry__.py` re-exports these
for the driver's correctness gate.

Registration ORDER matters: the driver grades the first N registered
entries (N=50). `_PRIORITY` is therefore a ROTATION SCHEDULE: each
round the first 50 slots hold operators that have never received a
green driver CORRECTNESS row, and previously-verified operators move
below the window (their green rows stay on record in
CORRECTNESS_r{N}.json).

Rotation map (which driver run produced each operator's green row):
- round 1 (CORRECTNESS_r01.json): TPC-H q1-q22 (except q12: r03),
  temporal_* / topk_per_group / agg_* / window_analytics families'
  first 44 greens.
- round 3 (CORRECTNESS_r03.json): all 40 SURVEY §2 CDC/sink/schema/
  streaming rows, tpch_q12, temporal_asof_join, temporal_rollup,
  curate_pack_sequences, and the 6-query dedup family (50/50 green).
- round 4 (CORRECTNESS_r04.json): the SURVEY §2 stragglers
  (tm_retention, cdc_incremental_agg, cdc_ivm_join, tm_scd2_weighted,
  runner_pipeline) plus the never-yet-graded sim/emb/curate/text/
  stats/sketch/multimodal families (50/50 green).
- round 5 window (this file's first 50): the never-graded queue head
  (cdc_delay_gauge .. sketch_bloom_filter), the 14 round-4 session-1
  additions (curate_mixture_weights .. sim_adc_topk — including the
  five iterative trainers, which gained full unrolled-CTE oracles
  this round), and the 11 highest-value session-2 ops named by the
  round-4 verdict (net-effect compaction, order audit, version
  depth, streaming near-dedup + SCD2, the FIXED sim_knn_graph, the
  graph family, and the rank stats).
- round 6 window (this file's first 50): the FINAL 31 never-graded
  ops (26 session-2 leftovers: corpus diversity, Markov, theta
  sketch, format round-trips, RFM, hashing vectorizer, Bloom
  decontam, Matryoshka, Benford, BPE trainer, Welch t,
  autocorrelation, threshold sweep, recall curve, phash dedup,
  ts/events tails, dataset card; plus the 5 round-5 additions:
  text_bpe_encode, dedup_semantic_cells, curate_cell_sample,
  stats_bootstrap_ci, ts_changepoint) — a green round-6 run reaches
  206/206 driver-verified. The 19 spare slots backfill the most
  §2-critical CDC/sink/schema ops (last graded in r3) as regression
  re-pins, per the round-5 verdict's instruction.
- round 7 window (this file's first 50): the 7 operators without a
  green row — `stream_jsonl_sink` (the only-ever red row; its value
  checksum was rebuilt this round as an engine-identical integer
  micro-unit fold) and the six round-6 additions
  (sim_knn_classifier, graph_label_propagation,
  curate_coreset_kcenter, corpus_vocab_growth [global NTILE →
  percentile-cutoff broadcast this round], sim_ivfadc_topk,
  ts_trend_ols [moment sums → DECIMAL(38,0) this round]) — a green
  run reaches 212/212 driver-verified. The 43 spare slots are
  oldest-evidence freshness re-pins: the 25 operators whose only
  green row is round 1 (TPC-H q1-q11/q13-q22, topk_per_group,
  agg_rollup_pricing, agg_cube_orders, temporal_range_join) and 18
  §2-critical r3-green rows that round 6's re-pin pass did not
  cover (CDC apply/seek/validate/bootstrap/diff, tm history/
  compaction/SCD2, the four sinks, schema history+compat, and the
  windowed/dedup/txn streams).
- round 8 window (this file's first 50): the thirty-three round-7
  additions (never graded — listed below), plus 17 oldest-evidence
  re-pins: the 13 operators whose newest green row is round 3
  (stream_sessionize, stream_enrich, stream_attribution_join,
  tpch_q12, temporal_asof_join, temporal_rollup,
  curate_pack_sequences, and the six-query dedup family
  dedup_exact/minhash_lsh/ngram_jaccard/simhash/embedding_cosine/
  clusters) and the head of the r4-green block (tm_retention,
  cdc_incremental_agg, cdc_ivm_join, tm_scd2_weighted). Outcome:
  49/50 green — the only red row was sketch_ams_f2 (DECIMAL output
  columns; the driver's value hash distinguishes Spark Decimal from
  DuckDB float64 — fixed in round 9 by casting to DOUBLE on both
  engines). The registry grew to 260 during round 8, so round 8
  closed at 244 + 15 never-graded + 1 red.
  The thirty-three round-7 additions
  (dedup_substring_spans, curate_dsir_weights, curate_ccnet_buckets,
  sketch_ams_f2, sim_mmr_select, stats_ols_multi,
  cdc_metrics_report, emb_outlier_mahal, corpus_dispersion_dp,
  curate_dsir_sample, text_token_entropy, events_wow_growth,
  sim_nprobe_sweep, text_code_detect, text_readability,
  events_entropy_rate, sim_pq_distortion, ts_theil_sen,
  emb_silhouette, graph_modularity, events_pareto_share,
  graph_link_prediction, text_mattr_diversity, sim_hamming_recall,
  tm_timetravel_counts, corpus_term_burstiness, agg_grouping_sets,
  events_conversion_latency, emb_jl_fidelity, stats_wilson_ci,
  corpus_herfindahl, corpus_head_coverage, ts_seasonal_outliers)
  occupy slots 1-33; the 17 re-pins fill slots 34-50. Any round-8
  additions queue at entries 51+ (ROUND-9 QUEUE) for the next window.
- round 9 window (this file's first 50): the fixed sketch_ams_f2
  (round 8's only red row), the fifteen round-8 additions
  (ts_holt_winters, events_survival_km, graph_degree_powerlaw,
  corpus_ngram_novelty, curate_temperature_mix,
  dedup_template_prefix, tm_cell_lifetimes, cdc_metrics_exposition,
  stats_mannwhitney_u, events_markov_stationary,
  dedup_minhash_band_tuning, text_kneser_ney, sim_rrf_fusion,
  tm_bitemporal_asof, corpus_chao1_richness), and 34 oldest-evidence
  re-pins from the r4-newest-green block. Round-9 additions are
  inserted directly after the 15 (displacing re-pins from the bottom
  of the window) so their FIRST driver row lands the same round they
  ship. The 15 round-9 additions (stats_kendall_tau,
  stats_jackknife_se, emb_isotropy, sketch_countsketch_topk,
  temporal_interval_join, events_dau_mau,
  graph_connected_components, dq_psi_drift, text_rake_keywords,
  ts_sax_symbols, cdc_sink_idempotency, curate_rejection_sample,
  dedup_chunk_cdc, stats_hodges_lehmann, emb_participation_ratio)
  occupy slots 17-31 (registry 260 → 275). A fully green round-9 run
  reaches 275/275 registered operators driver-verified. Outcome:
  50/50 green (CORRECTNESS_r09.json).
- round 10 window (this file's first 50): slot 1 is the round-10
  addition `stream_schema_ddl_replay` (streaming twin of the DDL
  replay, never graded); the rest are freshness re-pins — the 27
  operators whose newest green row is round 4 (sim_cosine_topk ..
  text_zipf_slope — the tail of the r4 block that round 9's window
  displaced below its cut) plus the 22 queue-head operators of the
  round-5-green block (cdc_delay_gauge .. text_rolling_hash).
  text_normalize (displaced by the addition) and the remaining 27
  r5-green operators (curate_global_shuffle .. stats_gini) are the
  ROUND-11 QUEUE and sit immediately after the window (registry
  275 → 276). Outcome: 50/50 green (CORRECTNESS_r10.json).
- round 11 window (this file's first 50): slots 1-2 are the round-11
  additions (never graded): `cdc_type_decode_compat` (binlog-client
  compat-mode decode toggles — CHAR_AND_BINARY_AS_BYTE_ARRAY +
  DATE_AND_TIME_AS_LONG, BinaryLogSupplier.java:113-117) and
  `source_binlog_roundtrip` (the binlog v4 WIRE layer: faithful
  byte-level encode of events into binlog file blobs — FDE, GTID,
  BEGIN, TABLE_MAP, WRITE/UPDATE/DELETE_ROWS v2, XID, CRC32 trailers —
  and the mapInPandas byte-walk parser back to change rows;
  sources/binlog.py); slots 3-5 re-pin the three ops whose source file
  streaming/registry.py changed this round (positional ALTER clauses,
  rename snapshots, committed-epoch recovery):
  stream_schema_ddl_replay, schema_history_log, schema_compat_check;
  slots 6-33 grade the round-10 verdict's named freshness debt
  (text_normalize + the 27 r5-green ops, curate_global_shuffle ..
  stats_gini); slots 34-50 are 17 §2-critical re-pins from the 49-op
  r6-green block (schema_ddl_replay, cdc_type_decode — both in files
  changed this round — plus the 13 other oldest CDC rows,
  sink_avro_messages, stream_timemachine). The remaining r6-green
  ops (tm_cells — displaced below the cut by addition #2 —
  tm_asof_snapshot, the 3 source roundtrips, and 27 non-critical
  rows) are the ROUND-12 QUEUE (registry 276 → 278). Outcome: 50/50
  green (CORRECTNESS_r11.json).
- round 12 window (this file's first 50): slots 1-2 are the round-12
  additions (never graded): `source_binlog_gtid_resume` (GTID-set
  resume end-to-end on the wire format — deterministic-gno encode via
  explicit txn ids, (gtid_uuid, gtid_seq) row coordinates,
  `resume_after_gtid` skipping exactly the transactions inside the
  stored set, BinaryLogSupplier.java:206-228's primary checkpoint
  mode) and `source_binlog_enum_roundtrip` (ENUM/SET packed row
  images through the wire — the reference's organisms-fixture column
  kinds); slot 3 re-pins `source_binlog_roundtrip` (its source file
  gained the mapInArrow encode seam, spec-position checksum-alg
  detection, and GTID/before-image columns this round); slots 4-35
  grade the ENTIRE round-11 verdict freshness debt — all 32 operators
  whose newest green row is round 6 (tm_cells .. ts_seasonality);
  slots 36-50 are 15 §2-critical re-pins from the 48-op r7-green
  cohort (cdc appliers, sinks, time-machine interval ops, bootstrap,
  txn assembly). The remaining 33 r7-green ops (agg_*, tpch_q*,
  sim_ivfadc_topk, …) are the ROUND-13 QUEUE (registry 278 → 280).
  Outcome: 50/50 green (CORRECTNESS_r12.json).
- round 13 window (this file's first 50): slots 1-2 are the round-13
  additions (never graded): `source_binlog_charset_rowkey` (TABLE_MAP
  charset TLVs DEFAULT_CHARSET/COLUMN_CHARSET + SIMPLE_PRIMARY_KEY
  through the generic any-table reader — collation-correct string
  decode in-stream, MysqlTypeDeserializer.java:85-97's latin1-vs-utf8
  dispatch, plus the sink-ready salted rowkey of
  HBaseRowKeyMapper.java:24-58 produced from wire metadata alone) and
  `source_binlog_partial_json` (8.0.3+ binlog_row_value_options:
  PARTIAL_UPDATE_ROWS_EVENT JSON-diff after-images reconstructed
  against the before image through the JSONB codec);
  slots 3-5 re-pin the three binlog ops whose source file changed
  this round (charset/PK TLVs, TRANSACTION_PAYLOAD envelopes mixed
  into the roundtrip encode, signedness-bitmap alignment fix, GTID
  NULL-coordinate replay fix); slots 6-38 grade the ENTIRE round-12
  verdict freshness debt — all 33 operators whose newest green row is
  round 7 (the TPC-H block minus q12, agg cube/rollup, sim_ivfadc_
  topk, sim_knn_classifier, temporal_range_join, topk_per_group,
  graph_label_propagation, curate_coreset_kcenter, stream_windowed_
  counts, stream_jsonl_sink, corpus_vocab_growth, ts_trend_ols);
  slots 39-50 are 12 §2-critical re-pins from the 49-op r8-green
  cohort (cdc incremental appliers + metrics, time-machine interval
  ops, streaming joins/sessions, temporal joins; tpch_q12 displaced
  to the round-14 queue head by addition #2). The remaining 37
  r8-green ops are the ROUND-14 QUEUE (registry 280 → 282).
  Outcome: 50/50 green (CORRECTNESS_r13.json).
- round 14 window (this file's first 50): slots 1-2 are the
  round-14 additions (never graded): `source_binlog_legacy_temporals`
  (pre-5.6.4 packed temporals TIMESTAMP/TIME/DATETIME v0 through
  the wire, decoded to the v2 value shapes; pre-5.0 DECIMAL
  rejected — the retained-log restore path, matching what the
  reference's binlog client handles in
  AbstractRowsEventDataDeserializer) and `source_binlog_ddl_replay`
  (the DDL statement stream through the wire, replayed in GTID
  order through the SchemaRegistry — ActiveSchemaManager end-to-end
  on real binlog bytes); slots 3-7 re-pin all five binlog wire ops
  (sources/binlog.py gained the legacy branches in both compile
  dispatches plus the DDL reader this round — same-round re-pin
  rule); slots 8-44 grade the ENTIRE round-13 verdict freshness
  debt — all 37 operators whose newest green row is round 8
  (tpch_q12, the 7-query dedup core block, and the r7-addition
  curate/emb/sim/stats/text/corpus/events/ts/graph cohort);
  slots 45-50 are 6 oldest-evidence re-pins from the r9-green
  cohort head (registry 282 → 284).

Any registered name missing from `_PRIORITY` is appended at the end
(never silently dropped), and a name listed but not registered raises
at load time.

EAGER CONSTRUCTION: most queries() callables are plan-only — calling
them builds a DataFrame without running a job. Exceptions, by the
bounded-driver-state contract (collected state is constant-size by
construction): sketch_bloom_filter (collects the <= 4096-position bit
set to pack the probe mask literal; re-persists one build side per
session, unpersisting the previous) and events_markov_stationary
(collects the |types| and |types|^2-row transition tables for the
driver-side integer matrix squarings — the emb_pca_power contract).
Plan-only consumers (tools/scan_audit.py, the plan-audit tests) must
expect these two to launch bounded jobs at construction time.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Ops whose queries() callable runs a BOUNDED distributed job at
# DataFrame-construction time (module docstring "EAGER CONSTRUCTION"):
# plan-only consumers must expect a job, not just a plan build.
EAGER_CONSTRUCTION = frozenset(
    {"sketch_bloom_filter", "events_markov_stationary"}
)

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Explicit grading order (see module docstring): round-6 window first
# (final 31 never-graded + 19 §2-critical re-pins), then
# previously-driver-verified blocks.
_PRIORITY = [
    # ======== ROUND-14 GRADING WINDOW (2 + 5 + 37 + 6) ========
    # --- the round-14 addition (never graded): pre-5.6.4 legacy
    #     packed temporals — TIMESTAMP v0 (4-byte LE epoch sec),
    #     TIME v0 (signed int24 H*10000+M*100+S), DATETIME v0
    #     (8-byte LE YYYYMMDDHHMMSS) through the wire, decoded to
    #     the v2 codecs' value shapes; pre-5.0 DECIMAL rejected
    #     (AbstractRowsEventDataDeserializer parity — the
    #     retained-log restore path, r13 verdict task #3) ---
    "source_binlog_legacy_temporals",
    # --- the second round-14 addition (never graded): the DDL
    #     statement stream through the wire — QUERY events carrying
    #     CREATE/ALTER text (BEGIN/COMMIT boundaries filtered at the
    #     source), wire-decoded and replayed in GTID order through
    #     the SchemaRegistry; history equals the non-wire twin
    #     (ActiveSchemaManager.java:202-288 end-to-end on real
    #     binlog bytes) ---
    "source_binlog_ddl_replay",
    # --- re-pins: sources/binlog.py changed this round (legacy
    #     temporal branches in both compile dispatches, DECIMAL(0)
    #     reject, the DDL statement reader) — same-round re-pin rule
    #     covers all five wire ops ---
    "source_binlog_roundtrip",
    "source_binlog_gtid_resume",
    "source_binlog_enum_roundtrip",
    "source_binlog_charset_rowkey",
    "source_binlog_partial_json",
    # --- the full ROUND-14 QUEUE: all 37 operators whose newest
    #     green row is round 8 (the round-13 verdict's standing
    #     freshness debt, task #1: the dedup core block, the
    #     r7-addition sim/curate/text/stats/graph cohort, tpch_q12) ---
    "tpch_q12",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_substring_spans",
    "curate_pack_sequences",
    "curate_ccnet_buckets",
    "curate_dsir_weights",
    "curate_dsir_sample",
    "emb_jl_fidelity",
    "emb_outlier_mahal",
    "emb_silhouette",
    "sim_hamming_recall",
    "sim_mmr_select",
    "sim_nprobe_sweep",
    "sim_pq_distortion",
    "stats_ols_multi",
    "stats_wilson_ci",
    "text_code_detect",
    "text_mattr_diversity",
    "text_readability",
    "text_token_entropy",
    "corpus_dispersion_dp",
    "corpus_term_burstiness",
    "corpus_herfindahl",
    "corpus_head_coverage",
    "events_wow_growth",
    "events_entropy_rate",
    "events_pareto_share",
    "events_conversion_latency",
    "ts_theil_sen",
    "ts_seasonal_outliers",
    "graph_modularity",
    "graph_link_prediction",
    # --- 7 oldest-evidence re-pins from the r9-green cohort head
    #     (the next-stalest surviving grades after the r8 cohort) ---
    "sketch_ams_f2",
    "ts_holt_winters",
    "events_survival_km",
    "graph_degree_powerlaw",
    "corpus_ngram_novelty",
    "curate_temperature_mix",
    "dedup_template_prefix",
    # ======== previously-driver-verified (latest grade r9-r13),
    #          original rotation order preserved ========
    "agg_cube_orders",
    "agg_rollup_pricing",
    "corpus_vocab_growth",
    "curate_coreset_kcenter",
    "graph_label_propagation",
    "sim_ivfadc_topk",
    "sim_knn_classifier",
    "stream_jsonl_sink",
    "stream_windowed_counts",
    "temporal_range_join",
    "topk_per_group",
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "ts_trend_ols",
    "agg_grouping_sets",
    "cdc_incremental_agg",
    "cdc_ivm_join",
    "cdc_metrics_report",
    "tm_retention",
    "tm_scd2_weighted",
    "tm_timetravel_counts",
    "stream_attribution_join",
    "stream_enrich",
    "stream_sessionize",
    "temporal_asof_join",
    "temporal_rollup",
    "tm_cells",
    "tm_asof_snapshot",
    "source_csv_roundtrip",
    "source_jsonl_roundtrip",
    "source_orc_roundtrip",
    "corpus_entropy_kl",
    "corpus_source_overlap",
    "curate_bloom_decontam",
    "curate_cell_sample",
    "curate_dataset_card",
    "dedup_semantic_cells",
    "dedup_threshold_sweep",
    "dq_benford_digits",
    "emb_cell_balance",
    "emb_matryoshka_fidelity",
    "events_interarrival",
    "events_markov_transitions",
    "events_peak_concurrency",
    "events_rfm_segments",
    "events_top_paths",
    "multimodal_phash_dedup",
    "sim_recall_curve",
    "sketch_theta_ops",
    "stats_bootstrap_ci",
    "stats_welch_ttest",
    "text_bpe_encode",
    "text_bpe_train",
    "text_hashing_vectorizer",
    "ts_autocorrelation",
    "ts_changepoint",
    "ts_profile_topk",
    "ts_seasonality",
    "cdc_apply_upsert",
    "cdc_payload_rowkey",
    "cdc_seeker_resume",
    "cdc_snapshot_diff",
    "cdc_validation_sample",
    "sink_avro_schemas",
    "sink_console",
    "sink_count",
    "sink_kafka_messages",
    "source_bootstrap_snapshot",
    "stream_txn_assembly",
    "stream_dedup_exact",
    "tm_compaction",
    "tm_row_history",
    "tm_scd2_intervals",
    "cdc_type_decode_compat",
    "stream_schema_ddl_replay",
    "schema_history_log",
    "schema_compat_check",
    "text_normalize",
    "curate_global_shuffle",
    "sketch_bloom_filter",
    "curate_mixture_weights",
    "curate_token_budget",
    "text_oov_rate",
    "text_bpe_pairs",
    "sketch_quantile_grid",
    "emb_pca_power",
    "tm_snapshot_delta",
    "stats_ks_test",
    "stream_quantile_sketch",
    "dedup_containment",
    "emb_kmeans",
    "sim_pq_codes",
    "stream_ewma",
    "sim_adc_topk",
    "cdc_net_effect_compact",
    "cdc_order_audit",
    "tm_version_depth",
    "stream_near_dedup",
    "stream_scd2_intervals",
    "sim_knn_graph",
    "graph_assortativity",
    "graph_kcore",
    "stats_spearman",
    "stats_auc",
    "stats_gini",
    "schema_ddl_replay",
    "cdc_type_decode",
    "cdc_change_feed",
    "cdc_changed_cols",
    "cdc_classify_ops",
    "cdc_include_exclude",
    "cdc_json_decode",
    "cdc_micro_organizer",
    "cdc_partitioners",
    "cdc_query_classifier",
    "cdc_rowkey_salt",
    "cdc_safe_watermark",
    "cdc_table_merge",
    "cdc_txn_group",
    "cdc_txn_seq",
    "sink_avro_messages",
    "stream_timemachine",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_label_separability",
    "sim_lsh_buckets",
    "sim_norm_stats",
    "sim_recall_at_k",
    "sketch_cms_heavy",
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "stats_chisq_independence",
    "stats_corr",
    "stats_eqfreq_bins",
    "stats_histogram",
    "stats_mad",
    "stats_percentiles",
    "text_bigram_lm",
    "text_fingerprint",
    "text_inverted_index",
    "text_langid",
    "text_pii_scrub",
    "text_pmi_bigrams",
    "text_quality",
    "text_repetition",
    "text_tfidf",
    "text_token_count",
    "text_top_terms",
    "text_zipf_slope",
    "cdc_delay_gauge",
    "window_analytics",
    "pivot_orders",
    "events_json_extract",
    "sessionize_events",
    "stream_sliding_counts",
    "stream_topk_users",
    "stream_upsert",
    "temporal_sliding_window",
    "join_salted_enrich",
    "basket_copurchase",
    "anomaly_zscore",
    "ts_ewma",
    "events_funnel",
    "events_retention",
    "ts_gap_fill",
    "profile_columns",
    "graph_pagerank",
    "graph_triangles",
    "dq_constraints",
    "entity_match_blocked",
    "text_rolling_hash",
    "tm_cell_lifetimes",
    "cdc_metrics_exposition",
    "stats_mannwhitney_u",
    "events_markov_stationary",
    "dedup_minhash_band_tuning",
    "text_kneser_ney",
    "sim_rrf_fusion",
    "tm_bitemporal_asof",
    "corpus_chao1_richness",
    "stats_kendall_tau",
    "stats_jackknife_se",
    "emb_isotropy",
    "sketch_countsketch_topk",
    "temporal_interval_join",
    "events_dau_mau",
    "graph_connected_components",
    "dq_psi_drift",
    "text_rake_keywords",
    "ts_sax_symbols",
    "cdc_sink_idempotency",
    "curate_rejection_sample",
    "dedup_chunk_cdc",
    "stats_hodges_lehmann",
    "emb_participation_ratio",
    "curate_e2e_pipeline",
    "runner_pipeline",
    "curate_chunk_documents",
    "curate_contamination",
    "curate_dataset_split",
    "curate_near_dedup",
    "curate_ngram_decontam",
    "curate_quality_filter",
    "curate_stratified_sample",
    "curate_weighted_sample",
    "dedup_dupfrac_ngrams",
    "emb_centroids",
    "emb_covariance",
    "emb_dim_stats",
    "emb_quantize_int8",
    "multimodal_audio_frames",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
]



def register(name: str, fn: QueryFn, sql: Optional[str] = None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return {n: _ORACLES[n] for n in _QUERIES if n in _ORACLES}


_LOADED = False


def _load() -> None:
    global _LOADED, _QUERIES
    if _LOADED:
        return
    _LOADED = True

    # Imports are intentionally loud: a broken module must fail the
    # whole registry, not silently shrink the driver's grading window.
    from .cdc import (
        apply,
        checkpoint,
        classify,
        decode,
        diff,
        envelope,
        filters,
        jsonb,
        metrics,
        partitioners,
        rowkey,
        seeker,
        transactions,
        validation,
    )
    from .pipeline import (
        cluster,
        corpus,
        curation,
        dedup,
        diversity,
        lm,
        matching,
        mixture,
        multimodal,
        sessions,
        similarity,
        sketches,
        text,
        vectors,
    )
    from .queries import (
        analytics,
        dq,
        funnel,
        graph,
        profiling,
        stats,
        temporal,
        tpch,
        tpch_ext,
    )
    from . import runner
    from .sinks import avro as avro_sink
    from .sinks import console as console_sink
    from .sinks import count as count_sink
    from .sinks import kafka as kafka_sink
    from .sinks import timemachine
    from .sources import binlog as source_binlog
    from .sources import bootstrap
    from .sources import formats as source_formats
    from .streaming import enrich as stream_enrich
    from .streaming import ewma_state as stream_ewma_state
    from .streaming import joins as stream_joins
    from .streaming import job as streaming_job
    from .streaming import near_dedup as stream_near_dedup_mod
    from .streaming import scd2_state as stream_scd2_mod
    from .streaming import registry as schema_registry
    from .streaming import sessionize as stream_sessionize
    from .streaming import txn_state

    register("cdc_change_feed", envelope.change_feed_query,
             envelope.CHANGE_FEED_SQL)
    register("cdc_classify_ops", classify.classify_ops_query,
             classify.CLASSIFY_OPS_SQL)
    register("cdc_query_classifier", classify.query_classifier_query,
             classify.QUERY_CLASSIFIER_SQL)
    register("cdc_table_merge", filters.table_merge_query,
             filters.TABLE_MERGE_SQL)
    register("cdc_include_exclude", filters.include_exclude_query,
             filters.INCLUDE_EXCLUDE_SQL)
    register("cdc_rowkey_salt", rowkey.rowkey_query, rowkey.ROWKEY_SQL)
    register("cdc_txn_group", transactions.txn_group_query,
             transactions.TXN_GROUP_SQL)
    register("cdc_txn_seq", transactions.txn_seq_query,
             transactions.TXN_SEQ_SQL)
    register("cdc_micro_organizer", transactions.organize_versions,
             transactions.MICRO_ORGANIZER_SQL)
    register("cdc_changed_cols", diff.changed_cols_query,
             diff.CHANGED_COLS_SQL)
    register("cdc_partitioners", partitioners.partitioners_query,
             partitioners.PARTITIONERS_SQL)
    register("cdc_safe_watermark", checkpoint.watermark_query,
             checkpoint.WATERMARK_SQL)
    for _n, _f, _s in metrics.REGISTRY:
        register(_n, _f, _s)
    register("cdc_type_decode", decode.type_decode_query,
             decode.TYPE_DECODE_SQL)
    register("cdc_type_decode_compat", decode.type_decode_compat_query,
             decode.TYPE_DECODE_COMPAT_SQL)
    register("cdc_payload_rowkey", rowkey.payload_rowkey_query,
             rowkey.PAYLOAD_ROWKEY_SQL)

    register("tm_cells", timemachine.timemachine_cells,
             timemachine.TIMEMACHINE_CELLS_SQL)
    register("tm_asof_snapshot", timemachine.asof_snapshot_query,
             timemachine.ASOF_SNAPSHOT_SQL)
    register("tm_row_history", timemachine.row_history_query,
             timemachine.ROW_HISTORY_SQL)
    register("tm_compaction", timemachine.compaction_query,
             timemachine.COMPACTION_SQL)
    register("tm_scd2_intervals", timemachine.scd2_intervals_query,
             timemachine.SCD2_INTERVALS_SQL)
    register("tm_retention", timemachine.retention_query,
             timemachine.RETENTION_SQL)
    register("tm_scd2_weighted", timemachine.scd2_weighted_query,
             timemachine.SCD2_WEIGHTED_SQL)
    register("tm_snapshot_delta", timemachine.snapshot_delta_query,
             timemachine.SNAPSHOT_DELTA_SQL)
    register("tm_version_depth", timemachine.version_depth_query,
             timemachine.VERSION_DEPTH_SQL)
    register("tm_timetravel_counts", timemachine.timetravel_counts_query,
             timemachine.TIMETRAVEL_COUNTS_SQL)
    register("tm_bitemporal_asof", timemachine.bitemporal_asof_query,
             timemachine.BITEMPORAL_ASOF_SQL)
    register("tm_cell_lifetimes", timemachine.cell_lifetimes_query,
             timemachine.CELL_LIFETIMES_SQL)

    for mod in (
        seeker, validation, bootstrap, source_formats, source_binlog,
        jsonb, apply,
        count_sink, console_sink, kafka_sink, avro_sink,
        schema_registry, streaming_job, stream_near_dedup_mod,
        stream_scd2_mod, txn_state, stream_sessionize,
        stream_enrich, stream_ewma_state, stream_joins,
        tpch, tpch_ext, temporal, stats, analytics, funnel, profiling,
        graph, dq,
        cluster, corpus, curation, dedup, diversity, lm, matching, mixture,
        sessions, similarity, sketches,
        text, vectors,
        multimodal,
        runner,
    ):
        for name, fn, sql in mod.REGISTRY:
            register(name, fn, sql)

    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: _QUERIES[n] for n in _PRIORITY}
    ordered.update(
        (n, f) for n, f in _QUERIES.items() if n not in ordered
    )
    _QUERIES = ordered
