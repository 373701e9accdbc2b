"""The BPE oracle's positional closed-form merge (_bpe_merged_cond)
must equal the Spark left fold (_merge_pair) on adversarial symbol
sequences — especially l = r runs, where greedy pairing from the left
is exactly what a naive string replace gets wrong.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


CASES = [
    # (syms, l, r) — l = r runs of every parity, interrupted runs,
    # l <> r chains, prefix-shadowing symbols
    (["a", "a", "a"], "a", "a"),
    (["a", "a", "a", "a"], "a", "a"),
    (["a", "a", "a", "a", "a"], "a", "a"),
    (["b", "a", "a", "a", "b", "a", "a"], "a", "a"),
    (["l", "l", "r"], "l", "r"),
    (["l", "r", "l", "r"], "l", "r"),
    (["l", "r", "r", "l", "r"], "l", "r"),
    (["a", "a", "ab"], "a", "ab"),
    (["ba", "a", "a"], "ba", "a"),
    (["x"], "a", "a"),
    (["a", "b"], "b", "a"),
]


@pytest.mark.parametrize("syms,l,r", CASES, ids=[str(i) for i in range(len(CASES))])
def test_merge_closed_form_matches_fold(spark, syms, l, r):
    from replicator_spark.pipeline.mixture import _bpe_merged_cond, _merge_pair

    sdf = spark.createDataFrame([(syms,)], "syms array<string>")
    spark_out = sdf.select(_merge_pair(l, r).alias("m")).collect()[0]["m"]

    merge_expr = f"""flatten(list_transform(range(1, len(syms) + 1), i ->
        CASE WHEN {_bpe_merged_cond('i')} THEN [w.l || w.r]
             WHEN i > 1 AND {_bpe_merged_cond('i - 1')} THEN []
             ELSE [syms[i]] END))"""
    con = duckdb.connect()
    sql_out = con.execute(
        f"""WITH words AS (SELECT ? ::VARCHAR[] AS syms),
        win AS (SELECT ? AS l, ? AS r)
        SELECT {merge_expr} AS m FROM words CROSS JOIN win w""",
        [syms, l, r],
    ).fetchone()[0]
    con.close()
    assert list(sql_out) == list(spark_out), (syms, l, r)
