"""Mega-bucket guard for banded LSH (dedup.LSH_BUCKET_CAP).

An adversarial boilerplate corpus — many near-identical documents —
lands every doc in the SAME (band, bucket) for all bands. Without a
guard the in-bucket pair expansion is O(k²) inside one task (the skew
straggler flagged in round 3's plan audit). With the guard, oversized
buckets emit a sorted star (all ids paired with the bucket min):
O(k) pairs, identical connected components, and diameter 2 so label
propagation converges in the same rounds as a clique.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _boilerplate_docs(spark, n=1000):
    # identical text → identical shingles → identical signature
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base, "en", "web", len(base)) for i in range(n)]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_mega_bucket_emits_linear_star(spark):
    from replicator_spark.pipeline.dedup import (
        LSH_BUCKET_CAP,
        N_BANDS,
        minhash_lsh_pairs,
    )

    n = 1000
    docs = _boilerplate_docs(spark, n)
    pairs = minhash_lsh_pairs(docs)
    k = pairs.count()
    # identical docs: every band holds ONE bucket of n ids → each band
    # contributes the same sorted star of n-1 pairs, deduped by the
    # final distinct. Clique expansion would be n(n-1)/2 = 499500.
    assert k == n - 1, k
    assert n > LSH_BUCKET_CAP  # the guard actually engaged
    assert N_BANDS >= 2  # star thinning is band-redundant by design


def test_mega_bucket_components_match_clique_semantics(spark):
    """The star keeps every doc in ONE component — cluster-level dedup
    output is identical to what the unguarded clique would produce."""
    from replicator_spark.pipeline.cluster import connected_components
    from replicator_spark.pipeline.dedup import minhash_lsh_pairs

    docs = _boilerplate_docs(spark, 200)
    labels = connected_components(
        docs.select("doc_id"), minhash_lsh_pairs(docs)
    )
    comp = labels.agg(
        F.countDistinct("label").alias("n_comp"),
        F.count("*").alias("n_docs"),
    ).collect()[0]
    assert comp["n_comp"] == 1
    assert comp["n_docs"] == 200


def test_small_buckets_still_full_clique(spark):
    """Normal corpora (bucket size ≤ cap) keep exact all-pairs output:
    3 identical docs → 3 pairs, not a 2-pair star."""
    from replicator_spark.pipeline.dedup import minhash_lsh_pairs

    docs = _boilerplate_docs(spark, 3)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_oracle_mirrors_cap(spark):
    """DuckDB oracle applies the same clique/star rule, so the driver's
    hash compare stays green even on a corpus that trips the cap."""
    import duckdb

    from replicator_spark.pipeline.dedup import MINHASH_LSH_SQL, minhash_lsh_pairs

    n = 50  # > LSH_BUCKET_CAP, small enough for recursive oracle speed
    docs = _boilerplate_docs(spark, n)
    spark_pairs = sorted(
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    )
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = sorted(
        map(tuple, con.execute(MINHASH_LSH_SQL).fetchall())
    )
    con.close()
    assert spark_pairs == oracle
    assert len(spark_pairs) == n - 1
