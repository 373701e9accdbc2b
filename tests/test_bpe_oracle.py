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


# -------------------------------------------- property-based closure


def _py_fold_merge(syms, l, r):
    """The Spark fold's exact semantics in plain Python."""
    acc = []
    for x in syms:
        if acc and acc[-1] == l and x == r:
            acc[-1] = l + r
        else:
            acc.append(x)
    return acc


def test_merge_closed_form_property():
    """Hypothesis sweep: for random symbol sequences over a tiny
    alphabet (maximizing runs and prefix collisions) and every
    occurring adjacent pair, the SQL closed form equals the fold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from replicator_spark.pipeline.mixture import _bpe_merged_cond

    merge_expr = f"""flatten(list_transform(range(1, len(syms) + 1), i ->
        CASE WHEN {_bpe_merged_cond('i')} THEN [w.l || w.r]
             WHEN i > 1 AND {_bpe_merged_cond('i - 1')} THEN []
             ELSE [syms[i]] END))"""
    con = duckdb.connect()

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(
            st.sampled_from(["a", "b", "ab", "ba", "aa"]),
            min_size=1,
            max_size=12,
        )
    )
    def check(syms):
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        for l, r in pairs or {("a", "a")}:
            want = _py_fold_merge(syms, l, r)
            got = con.execute(
                f"""WITH words AS (SELECT ? ::VARCHAR[] AS syms),
                win AS (SELECT ? AS l, ? AS r)
                SELECT {merge_expr} FROM words CROSS JOIN win w""",
                [syms, l, r],
            ).fetchone()[0]
            assert list(got) == want, (syms, l, r)

    try:
        check()
    finally:
        con.close()
