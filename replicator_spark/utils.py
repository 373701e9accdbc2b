"""Scale utilities: skew-aware join salting + bucketed co-located joins.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins with statistics; a pathologically hot key in a
shuffled hash join, or a skewed stream-stateful key, needs explicit
salting. This is the technique SURVEY §4 notes the reference gets via
its salted HBase rowkeys (region anti-hotspotting) — the same idea
applied to a Spark join:

  big side:   key → (key, salt = hash(row) % S)      one of S buckets
  small side: key → (key, salt = 0..S-1)             replicated S×

The join on (key, salt) spreads each hot key over S tasks; the result
is identical to the plain key join.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame


def uncached_file_scans(plan: str) -> int:
    """Count FileScan nodes OUTSIDE cached subtrees in a physical-plan
    STRING by walking the tree-drawing indentation.

    Caveat: once a cached relation's stored plan is a MATERIALIZED
    AQE plan (isFinalPlan=true — happens after any action in the same
    session touched that cache), its re-print emits "== Final Plan =="
    sections at RESET indentation, which this walker cannot attribute
    to the enclosing InMemoryRelation. Prefer
    ``uncached_file_scan_count(df)`` (structural, session-state-proof)
    wherever a live DataFrame is available; this string variant remains
    for offline plan-text analysis.
    """
    n = 0
    cached_stack: list[int] = []  # content positions of open relations
    for line in plan.splitlines():
        pos = 0
        while pos < len(line) and line[pos] in " :+-":
            pos += 1
        if pos >= len(line):
            continue
        while cached_stack and pos <= cached_stack[-1]:
            cached_stack.pop()
        if "InMemoryRelation" in line:
            cached_stack.append(pos)
        elif "FileScan" in line and not cached_stack:
            n += 1
    return n


def uncached_file_scan_count(df: DataFrame) -> int:
    """Count file-scan leaves OUTSIDE cached subtrees STRUCTURALLY.

    Walks the actual physical-plan tree over py4j instead of parsing
    the plan string: InMemoryTableScanExec is a LEAF of the executed
    plan (its cached subtree exists only in the string re-print), so
    stopping there counts exactly the scans the runtime would perform
    against files. Unlike the string walk, this is immune to the AQE
    "== Final Plan ==" re-print sections that appear (at reset
    indentation) once a cached relation has been materialized
    elsewhere in the session — the poisoning that made string counts
    session-order-dependent (round-9 finding). The old audit discount
    (1 if any InMemoryTableScan) under-counted; naive string counts
    over-count; this is the ground truth either way.
    """

    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        if cls == "InMemoryTableScanExec":
            return 0
        if cls in ("FileSourceScanExec", "BatchScanExec"):
            return 1
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.inputPlan())
        n = 0
        ch = node.children()
        for i in range(ch.size()):
            n += walk(ch.apply(i))
        try:  # scalar subqueries hang off the node, not children()
            sq = node.subqueries()
            for i in range(sq.size()):
                n += walk(sq.apply(i))
        except Exception:
            pass
        return n

    return walk(df._jdf.queryExecution().executedPlan())


def round_half_away(x: float, n: int) -> float:
    """round(double, n) with ties away from zero — the semantics of
    Spark F.round AND DuckDB round(). Python's builtin round() is
    half-EVEN, which disagrees on exact dyadic ties (e.g. 2^-7 =
    0.0078125 at 6 dp: Python → 0.007812, Spark/DuckDB → 0.007813);
    float32-sourced embeddings are all dyadic, so driver-side seeds /
    centroid reductions that are later value-hashed against an oracle
    must round half-away. Decimal(x) is the EXACT binary value, so
    quantize(..., ROUND_HALF_UP) is exact decimal rounding of it."""
    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP)) + 0.0
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, n_salts: int, *dedup_cols: str) -> DataFrame:
    """Assign each row of the (skewed) fact side a stable salt bucket.
    The salt is derived from xxhash64 of the row's identifying columns
    — deterministic, so retries and replays land in the same bucket."""
    basis = [F.col(c) for c in dedup_cols] if dedup_cols else [
        F.monotonically_increasing_id()
    ]
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int")
    )


def explode_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the small side once per salt bucket."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    big_id_cols: list[str] | None = None,
) -> DataFrame:
    """Join `big` to `small` on `on`, spreading each join key over
    `n_salts` shuffle partitions. Result equals big.join(small, on, how).
    """
    b = salt_big_side(big, n_salts, *(big_id_cols or []))
    s = explode_small_side(small, n_salts)
    return b.join(s, on + [SALT_COL], how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist `df` as a bucketed + sorted table (hash-partitioned into
    `n_buckets` files per write-task group, each sorted by `key`).

    This is the 100 TB lever for repeated fact↔fact joins: two tables
    bucketed on the same key with the same bucket count join with NO
    shuffle — the scan itself satisfies the join's distribution
    requirement (Spark ≥3.0 keeps a local per-bucket sort, which is
    cheap over the already-sorted single-file buckets this writer
    produces). At cluster scale, bucket count is chosen once
    (≈ total cores × small multiple) and every downstream join/groupBy
    on that key reuses the layout.
    """
    (
        # repartition on the bucket key first: Spark's bucketing and
        # repartition use the same Murmur3 hash, so every bucket is
        # written by exactly one task → one file per bucket, which is
        # what lets the bucketed scan also satisfy the join's SORT
        # requirement (multi-file buckets would force a re-sort).
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables; with matching bucket
    specs Spark plans a sort-merge join with zero Exchange
    operators."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
