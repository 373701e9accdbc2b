"""Blocked fuzzy entity matching (record linkage): find near-identical
entity labels without an all-pairs comparison.

The canonical scale pattern, applied in order:
1. **Collapse to distinct entities first** — match DISTINCT labels,
   not rows. 100 TB of parts collapses to the (tiny) distinct-name
   universe before any pairing; row-level multiplicity comes back as
   per-name counts.
2. **Block** — self-join only within a blocking key (here the head
   noun = last name token). Candidate pairs are O(sum block_size^2) on
   the DISTINCT set, never O(n^2) on rows.
3. **Verify** — exact Levenshtein on the candidates only (both
   engines implement classic edit distance, so the oracle is exact).

This is the propose/dispose structure the MinHash-LSH dedup in
`dedup.py` uses for documents, specialized to short entity labels
where edit distance is the right verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

MAX_EDIT_DISTANCE = 3


def entity_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs: distinct names, blocked by last
    token, Levenshtein <= MAX_EDIT_DISTANCE, with per-name row
    multiplicities."""
    prep(spark)
    part = read_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.col("p_name").alias("name"),
            "n_rows",
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        )
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_a"),
        "block",
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_b"),
        "block",
    )
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .where(
            F.levenshtein("name_a", "name_b") <= MAX_EDIT_DISTANCE
        )
        .select(
            "block",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
            "n_a",
            "n_b",
        )
    )


ENTITY_MATCH_SQL = f"""
WITH names AS (
    SELECT p_name AS name, COUNT(*) AS n_rows,
        string_split(p_name, ' ')[-1] AS block
    FROM part GROUP BY p_name
)
SELECT a.block, a.name AS name_a, b.name AS name_b,
    CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
    a.n_rows AS n_a, b.n_rows AS n_b
FROM names a JOIN names b
    ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {MAX_EDIT_DISTANCE}
"""


REGISTRY = [
    ("entity_match_blocked", entity_match_query, ENTITY_MATCH_SQL),
]
