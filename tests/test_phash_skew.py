"""Mega-bucket guard for perceptual-hash dedup (multimodal.
PHASH_BUCKET_CAP) — the dHash analog of tests/test_lsh_skew.py.

An adversarial corpus of many IDENTICAL images (same payload → same
dhash → same 16-bit bucket prefix) would expand to k(k-1)/2 Hamming
pairs inside one task. With the guard, oversized buckets emit a sorted
star (all ids paired with the bucket min): O(k) pairs with identical
connected components for cluster-level dedup.

Also pins the round-4 advice fix: dHash bits are computed over Unicode
CODE POINTS (not UTF-8 bytes), so Spark and the DuckDB unicode()-based
oracle agree on non-ASCII payloads.
"""

from __future__ import annotations


def _image_docs(spark, n, text="the quick brown fox jumps over a dog"):
    rows = [(i, text, "en", "web", len(text)) for i in range(n)]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _pairs_for(spark, docs):
    from replicator_spark.pipeline.multimodal import (
        PHASH_SCHEMA,
        _dhash_rows,
        _phash_pairs,
        with_binary_payload,
    )

    # same pipeline as multimodal_phash_dedup_query minus the parquet read
    hashed = with_binary_payload(docs).mapInPandas(_dhash_rows, PHASH_SCHEMA)
    return _phash_pairs(hashed)


def test_mega_bucket_emits_linear_star(spark):
    from replicator_spark.pipeline.multimodal import (
        PHASH_BUCKET_CAP,
        multimodal_phash_dedup_query,
    )

    n = 500
    assert n > PHASH_BUCKET_CAP
    got = _pairs_for(spark, _image_docs(spark, n)).collect()
    # identical payloads: ONE bucket of n ids → sorted star of n-1 pairs
    # (clique expansion would be n(n-1)/2 = 124750)
    assert len(got) == n - 1
    assert {r["doc_a"] for r in got} == {0}
    assert {r["doc_b"] for r in got} == set(range(1, n))
    assert multimodal_phash_dedup_query is not None  # guard is in the op


def test_small_buckets_still_full_clique(spark):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in _pairs_for(spark, _image_docs(spark, 3)).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_oracle_mirrors_cap_and_codepoints(spark):
    """DuckDB oracle applies the same band/clique/star rule AND the
    same code-point (not byte) dHash on a non-ASCII corpus, so the
    driver's hash compare stays green on any text."""
    import duckdb

    from replicator_spark.pipeline.multimodal import _phash_dedup_sql

    n = 50  # > PHASH_BUCKET_CAP to trip the star path
    # non-ASCII payload: bytes-vs-codepoint divergence would flip bits
    text = "z\u00fcrich caf\u00e9 na\u00efve \u2014 f\u00fc\u00dfe \u00f8l \u5317\u4eac quick brown fox"
    docs = _image_docs(spark, n, text=text)
    spark_pairs = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _pairs_for(spark, docs).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = sorted(map(tuple, con.execute(_phash_dedup_sql()).fetchall()))
    con.close()
    assert spark_pairs == oracle
    assert len(spark_pairs) == n - 1  # star engaged, hamming 0 kept all
