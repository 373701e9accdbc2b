"""Near-duplicate cluster assignment: connected components over the
MinHash-LSH candidate-pair graph.

The LSH stage (dedup.py) emits candidate PAIRS; a dedup pipeline needs
per-document CLUSTER ids ("keep one doc per component"). This operator
closes that gap: iterative min-label propagation until fixpoint, i.e.
the classic distributed connected-components loop.

Scale shape (100 TB):
- Each iteration is one equi-join (labels ⋈ symmetric edges) plus one
  combiner-backed min-groupBy — both hash-partitioned on doc_id, so AQE
  reuses one exchange layout across iterations; edges are persisted
  once (the expensive minhash subtree is NOT re-evaluated per round).
- Rounds needed = graph diameter. LSH dup components are near-cliques
  (duplicates share buckets pairwise), so diameter is 1-2 in practice;
  the loop still guards with a fixpoint check and a hard cap. For
  adversarial long-chain graphs swap the body for alternating
  large-star/small-star (same join+groupBy primitives, O(log n)
  rounds) — the driver loop shape is identical.
- The per-round `.count()` is a scalar fixpoint probe, not a data
  collect.

Oracle: DuckDB recursive CTE computing min reachable label — exact
same fixpoint, declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..session import prep, read_table
from .dedup import _BANDED_SQL, _PAIRS_SQL, _SIG_SQL, minhash_lsh_pairs

MAX_ITERS = 20
# rounds that run without a fixpoint probe: diameter-≤2 components (the
# LSH case by construction) converge within two propagation rounds, so
# the first probe that can possibly read 0 is the one after round 2
PROBE_FREE_ROUNDS = 2


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """nodes(doc_id), edges(doc_a, doc_b) → (doc_id, cluster_id) where
    cluster_id = min doc_id of the component.

    The propagation loop runs ONLY over edge-endpoint nodes: in a real
    dedup graph the overwhelming majority of documents are singletons
    (no LSH candidate pair at all), and a singleton's label is itself
    by definition — shuffling them through every iteration is pure
    waste. They are unioned back (anti-join) once, after the fixpoint.
    At 100 TB this cuts per-iteration shuffle volume from |corpus| to
    |dup-involved docs| (typically 10-100× smaller).

    Each round's labels are LINEAGE-TRUNCATED (localCheckpoint), not
    just persisted: persist() caches data but keeps the logical plan,
    so round N's plan nests all N-1 predecessors and Catalyst
    re-analysis grows superlinearly — measured 1 s → 5.6 s per round
    by round 5 at sf0.1 before the fix. A long-lived cluster job would
    use reliable checkpoint(dir) instead (localCheckpoint loses data
    on executor failure); the plan shape is identical."""
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    enodes = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = enodes.select("doc_id", F.col("doc_id").alias("label"))

    def _propagate(lab: DataFrame) -> DataFrame:
        prop = (
            sym.join(lab, sym.doc_a == lab.doc_id)
            .select(F.col("doc_b").alias("doc_id"), "label")
        )
        return (
            lab.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )

    # LSH dup components are near-cliques (diameter ≤2, and the
    # mega-bucket star guard keeps even adversarial buckets at
    # diameter 2), so the first PROBE_FREE_ROUNDS rounds always
    # change labels — probing them is a wasted scalar job each, and
    # checkpointing BETWEEN them is another: the blind rounds fuse
    # into ONE Catalyst plan with a single materialization (measured
    # 3.2 s → 2.7 s at sf0.1; lineage depth 2 is nowhere near the
    # re-analysis blowup the checkpoint guards against).
    for _ in range(PROBE_FREE_ROUNDS):
        labels = _propagate(labels)
    # lazy checkpoint: the probe's scalar aggregate below is the
    # action that materializes it, so truncation costs no extra job
    labels = labels.localCheckpoint(eager=False)
    # then fixpoint-probe every round (long-chain graphs still
    # terminate correctly, just with the per-round probe cost they
    # genuinely need)
    # fixpoint probe via the exact label sum instead of the old
    # new⨝old join + count: min-label propagation is MONOTONE (a
    # node's new label is min(own old label, incoming labels), so it
    # never increases), hence "no label changed" ⟺ "the exact integer
    # label sum is unchanged". One shuffle-free scalar aggregate per
    # round replaces a join of two checkpointed frames (guide §2.4
    # remove shuffles outright). DECIMAL(38,0) keeps the sum exact at
    # any node count.
    def _label_sum(lab: DataFrame):
        return lab.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(PROBE_FREE_ROUNDS, MAX_ITERS):
        new_labels = _propagate(labels).localCheckpoint(eager=False)
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError("connected_components: no fixpoint "
                           f"after {MAX_ITERS} iterations")
    # the loop is done and `labels` is checkpoint-materialized: the
    # working sets must not stay pinned for the session lifetime (the
    # registry drive calls this from three operators — leaked persists
    # fill executor storage and evict later operators' caches). The
    # singleton anti-join reads the edge-node set from LABELS (already
    # materialized) instead of the unpersisted `enodes`.
    sym.unpersist()
    enodes.unpersist()
    singletons = nodes.join(
        labels.select("doc_id"), "doc_id", "anti"
    ).select("doc_id", F.col("doc_id").alias("label"))
    return labels.unionByName(singletons)


def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its near-dup cluster id + component size
    (singletons cluster with themselves)."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    nodes = docs.select("doc_id")
    edges = minhash_lsh_pairs(docs)
    labels = connected_components(nodes, edges)
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        F.count("*").over(W.partitionBy("label")).alias("n_members"),
    )


DEDUP_CLUSTERS_SQL = (
    _SIG_SQL.replace("WITH toked", "WITH RECURSIVE toked", 1)
    + f""", banded AS ({_BANDED_SQL}),
{_PAIRS_SQL},
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(n, l) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n
),
labels AS (SELECT n AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY n)
SELECT doc_id, cluster_id,
    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
FROM labels
"""
)

def near_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-duplicate REMOVAL: LSH pairs → connected
    components → keep exactly one canonical document per component
    (the min doc_id — deterministic, no tiebreak ambiguity). This is
    the operator a pretraining pipeline actually runs; the cluster
    assignment above is its auditable intermediate. Returns the
    surviving documents with their cluster id and how many near-dups
    each one absorbed. Scale shape: everything up to the final join is
    the cluster computation (see module docstring); the keep-filter is
    one combiner-backed min-groupBy over (cluster_id) — cardinality =
    #components — broadcast back against the labels."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    nodes = docs.select("doc_id")
    labels = connected_components(nodes, minhash_lsh_pairs(docs))
    keep = labels.groupBy("label").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_absorbed"),
    )
    return (
        keep.join(
            docs.select("doc_id", "lang", "n_chars"), "doc_id"
        )
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "n_absorbed",
            "lang",
            "n_chars",
        )
    )


NEAR_DEDUP_SQL = (
    _SIG_SQL.replace("WITH toked", "WITH RECURSIVE toked", 1)
    + f""", banded AS ({_BANDED_SQL}),
{_PAIRS_SQL},
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(n, l) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n
),
labels AS (SELECT n AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY n),
keep AS (
    SELECT cluster_id, MIN(doc_id) AS doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_absorbed
    FROM labels GROUP BY cluster_id
)
SELECT k.doc_id, k.cluster_id, k.n_absorbed, d.lang, d.n_chars
FROM keep k JOIN documents d ON k.doc_id = d.doc_id
"""
)


def e2e_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE declarative plan:
    near-dedup (keep canonical doc per LSH component) ∩ quality-filter
    pass → deterministic hash split → per-(split, lang) corpus stats.
    This is the job a pretraining-data team actually schedules; every
    stage is an operator verified on its own above, and Catalyst fuses
    the composition (the documents scan is shared, the quality rules
    stay map-side, the only shuffles are the dedup component loop and
    the final stats agg). Survival accounting (n_docs vs the 500-doc
    corpus) is the job's acceptance metric."""
    prep(spark)
    from .curation import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        _md5_bucket256,
        quality_filter_query,
    )

    docs = read_table(spark, sf_dir, "documents")
    labels = connected_components(
        docs.select("doc_id"), minhash_lsh_pairs(docs)
    )
    canonical = labels.groupBy("label").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    quality_pass = (
        quality_filter_query(spark, sf_dir)
        .where(F.col("keep"))
        .select("doc_id")
    )
    kept = (
        docs.select("doc_id", "lang", "n_chars")
        .join(canonical, "doc_id")
        .join(quality_pass, "doc_id")
    )
    b = _md5_bucket256(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_LT, "train")
        .when(b < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        kept.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _e2e_sql() -> str:
    from .curation import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        QUALITY_FILTER_SQL,
        _bucket256_sql,
    )

    return f"""
WITH canon AS (SELECT doc_id FROM ({NEAR_DEDUP_SQL}) nd),
qpass AS (SELECT doc_id FROM ({QUALITY_FILTER_SQL}) qf WHERE keep),
kept AS (
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN canon USING (doc_id) JOIN qpass USING (doc_id)
),
assigned AS (
    SELECT *,
        CASE WHEN {_bucket256_sql('doc_id')} < {SPLIT_TRAIN_LT} THEN 'train'
             WHEN {_bucket256_sql('doc_id')} < {SPLIT_VAL_LT} THEN 'val'
             ELSE 'test' END AS split
    FROM kept
)
SELECT split, lang, COUNT(*) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY split, lang
"""


REGISTRY = [
    ("dedup_clusters", dedup_clusters_query, DEDUP_CLUSTERS_SQL),
    ("curate_near_dedup", near_dedup_query, NEAR_DEDUP_SQL),
    ("curate_e2e_pipeline", e2e_pipeline_query, _e2e_sql()),
]
