"""Scale utilities: skew-aware join salting.

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

from pyspark.sql import Column, DataFrame
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
