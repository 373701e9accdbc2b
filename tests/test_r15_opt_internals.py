"""Focused pins for round-15 optimization internals (round rule: an
optimization that changes an operator's internals adds a test)."""

from __future__ import annotations

import pytest


# ------------------------------------------ trainer partial reduction


def _partials_frame(spark):
    # duplicate (cid, dim) keys spread across partitions, values chosen
    # so a float reduce would drift but an exact integer one cannot
    rows = [
        (0, 0, 10**17 + 1, 3),
        (0, 0, 10**17 + 3, 2),
        (1, 0, -5, 1),
        (1, 63, 7, 4),
        (1, 63, -7, 1),
        (15, 63, 123456789012345, 2),
    ]
    return spark.createDataFrame(
        rows, "cid int, dim int, sx long, n long"
    ).repartition(4)


def test_reduce_partials_direct_matches_groupby(spark):
    from replicator_spark.pipeline.vectors import _reduce_partials

    part = _partials_frame(spark)
    direct = _reduce_partials(part, ["cid", "dim"], n_partial_rows=6)
    via_spark = _reduce_partials(
        part, ["cid", "dim"], n_partial_rows=10**9
    )
    assert direct == via_spark
    assert direct[(0, 0)] == (2 * 10**17 + 4, 5)
    assert direct[(1, 63)] == (0, 5)


def test_km_train_centroids_unchanged_by_reduce_path(spark, sf_dir):
    """The driver-side exact reduce must yield bit-identical centroids
    to the Spark decimal(38,0) groupBy path over the real corpus."""
    import replicator_spark.pipeline.vectors as V

    emb = V._km_corpus(spark, sf_dir).persist()
    cents_direct = V._km_train(emb)
    old_cap = V._PARTIAL_COLLECT_MAX_ROWS
    V._PARTIAL_COLLECT_MAX_ROWS = 0  # force the groupBy path
    try:
        cents_spark = V._km_train(emb)
    finally:
        V._PARTIAL_COLLECT_MAX_ROWS = old_cap
    emb.unpersist()
    assert cents_direct == cents_spark


# ------------------------------------------------ wire-op fan-out width


def test_wire_fan_out_width_derives_from_source_size(spark, sf_dir):
    """The wire ops' pre-codec spread must follow ceil(bytes/128KiB)
    capped at defaultParallelism — not a flat repartition."""
    import math
    import os

    from replicator_spark.session import read_table, table_path
    from replicator_spark.sources.binlog import (
        _WIRE_BYTES_PER_TASK,
        _wire_fan_out,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id")
    out = _wire_fan_out(ev, spark, sf_dir, "events")
    size = os.path.getsize(table_path(sf_dir, "events"))
    want = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            math.ceil(size / _WIRE_BYTES_PER_TASK),
        ),
    )
    assert out.rdd.getNumPartitions() == want


# ------------------------- vectorized serving passes (bit-exactness)


def test_km_assign_arrow_bitwise_equals_fold(spark, sf_dir):
    """The Arrow serving pass must reproduce _assign / _assign2
    bit-for-bit (cid, d2, d2b) over the real corpus."""
    import replicator_spark.pipeline.vectors as V

    emb = V._km_corpus(spark, sf_dir).persist()
    cents = V._km_train(emb)

    ref = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in V._assign(emb, cents).collect()
    }
    got = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in V._km_assign_arrow(
            emb, cents, with_vec_id=True
        ).collect()
    }
    assert ref == got

    ref2 = {
        r["vec_id"]: (r["cid"], r["d2"], r["d2b"])
        for r in V._assign2(emb, cents).collect()
    }
    got2 = {
        r["vec_id"]: (r["cid"], r["d2"], r["d2b"])
        for r in V._km_assign_arrow(
            emb, cents, with_vec_id=True, second=True
        ).collect()
    }
    emb.unpersist()
    assert ref2 == got2


def test_pq_assign_arrow_bitwise_equals_fold(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    import replicator_spark.pipeline.vectors as V
    from replicator_spark.session import table_path

    emb = spark.read.parquet(table_path(sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    subs = V._pq_subvectors(
        emb, input_bytes=os.path.getsize(table_path(sf_dir, "embeddings"))
    ).persist()
    cents = V._pq_train(spark, subs)
    ref = {
        (r["vec_id"], r["sub"]): (r["cid"], r["d2"])
        for r in V._pq_assign(spark, subs, cents).collect()
    }
    got = {
        (r["vec_id"], r["sub"]): (r["cid"], r["d2"])
        for r in V._pq_assign_arrow(subs, cents).collect()
    }
    subs.unpersist()
    assert ref == got


# ---------------------------------------- fan_out probe-free bounds


def test_fan_out_bounds_skip_rdd_probe(spark, sf_dir):
    """Tiny single-file scans must take the upper-bound branch
    (repartition without an RDD probe) and behave exactly as before;
    frames without file provenance must still fall back safely."""
    from pyspark.sql import functions as F

    from replicator_spark.session import fan_out, read_table

    p = spark.sparkContext.defaultParallelism
    docs = read_table(spark, sf_dir, "documents")
    out = fan_out(docs, spark)
    assert out.rdd.getNumPartitions() == p
    # size-derived width unchanged
    out2 = fan_out(docs, spark, input_bytes=300 << 10,
                   bytes_per_task=256 << 10)
    assert out2.rdd.getNumPartitions() == min(p, 2)
    # no file provenance: local relation falls back to the RDD probe
    local = spark.range(10).select(F.col("id").alias("doc_id"))
    n_before = local.rdd.getNumPartitions()
    got = fan_out(local, spark).rdd.getNumPartitions()
    assert got == (p if n_before < p else n_before)
