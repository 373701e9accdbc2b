"""Streaming near-duplicate admission — stateful MinHash-LSH dedup of
a document stream.

The batch dedup family (pipeline/dedup.py) identifies near-dup PAIRS
after the fact; a live ingestion pipeline instead wants an ADMISSION
GATE: as documents arrive, drop any document that collides (shares an
LSH band bucket) with an earlier-admitted arrival. This is the
streaming analog of the reference's in-flight dedup spirit (its
applier collapses repeated row images before flushing,
HBaseApplier.java:166-196) re-expressed for text near-dups.

Semantics (deterministic from the data, not the batching): arrival
order is doc_id order (the stream's monotonic key — binlog position in
the reference, crawl sequence in an ingest pipeline); a document is
KEPT iff in EVERY band it is the earliest (minimum doc_id) occupant of
its bucket seen so far. One earlier collision in ANY band ⇒ near-dup ⇒
dropped. That rule makes the verdict a pure function of the dataset —
the property the multibatch tests pin.

Spark-first shape:
- signature + banding run NARROW on the stream (the same zero-exchange
  minhash_signatures as batch — streaming-compatible by construction);
- the only stateful op is applyInPandasWithState keyed by
  (band, bucket): state is ONE long (the bucket's min doc_id ever) —
  at 100 TB the state store holds |buckets| longs, the same bound the
  batch LSH groupBy shuffles, and each batch's per-bucket work is
  sorted-linear. A production deployment adds a ProcessingTimeTimeout
  TTL to age out cold buckets (the dedup horizon knob); the bounded
  test stream keeps state forever so the verdict matches the batch
  oracle exactly.
- per-band verdicts AND-combine per doc in the SERVE layer over the
  sink output (same stream+serve split as stream_topk_users: a doc's
  final verdict needs all 4 band streams, which is a second stateful
  stage a single append-mode stream can't express).
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pipeline.dedup import (
    N_BANDS,
    N_MINHASH,
    _BANDED_SQL,
    _SIG_SQL,
    minhash_signatures,
)
from ..session import prep, table_path

OUT_SCHEMA = "doc_id long, band int, admitted boolean"
STATE_SCHEMA = "m long"


def _admit(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band, _bucket = key
    prev = state.get[0] if state.exists else None
    # the group arrives as MULTIPLE Arrow chunks once it exceeds the
    # batch size, in no particular order — sort across the WHOLE
    # micro-batch group (the sibling stateful ops' pd.concat pattern),
    # or a later chunk's smaller doc_id would be admitted alongside an
    # earlier chunk's larger one.
    #
    # Vectorized (guide §4.2): this function runs once per (band,
    # bucket) group — tens of thousands of mostly-1-row groups per
    # micro-batch — so per-call Python cost IS the operator's cost.
    # The sorted scan of the old per-id loop reduces to a closed form:
    # after ascending sort only the batch minimum can ever be admitted
    # (every later id sees prev ≤ ids[0] ≤ id), so the verdict vector
    # is computed without a loop and the output frame is built from
    # numpy arrays instead of a per-row tuple list.
    chunks = [pdf["doc_id"].to_numpy() for pdf in pdfs]
    ids = np.sort(np.concatenate(chunks)) if len(chunks) > 1 else np.sort(
        chunks[0]
    )
    adm = np.zeros(len(ids), dtype=bool)
    if len(ids):
        adm[0] = prev is None or int(ids[0]) < prev
        newmin = int(ids[0]) if prev is None else min(prev, int(ids[0]))
        state.update((newmin,))
    yield pd.DataFrame(
        {"doc_id": ids, "band": band, "admitted": adm}
    )


def _docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file-stream sources need an explicit schema and a directory:
    # driver testdata ships documents.parquet as a flat FILE (glob it
    # from the parent dir); test fixtures write it as a parquet DIR
    # (stream the dir itself).
    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def build_verdict_stream(docs_stream: DataFrame) -> DataFrame:
    """Signature → bands → stateful per-bucket admission, as a streaming
    DataFrame of (doc_id, band, admitted) — factored out so the
    multibatch tests can drive it one-file-per-trigger."""
    sig = minhash_signatures(docs_stream)
    rows_per_band = N_MINHASH // N_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _admit,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_near_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the admission gate over the document stream (availableNow),
    then serve the per-source kept/dropped tally."""
    prep(spark)
    base = tempfile.mkdtemp(prefix="near_dedup_")
    out = os.path.join(base, "out")
    verdicts = build_verdict_stream(_docs_stream(spark, sf_dir))
    q = (
        verdicts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # serve: AND across bands, then the per-source tally
    from ..session import read_table

    verd = (
        spark.read.parquet(out)
        .groupBy("doc_id")
        .agg(F.min(F.col("admitted").cast("int")).alias("kept"))
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(verd, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            (F.count("*") - F.sum("kept")).cast("bigint").alias("n_dropped"),
        )
    )


# Oracle: the batch restatement of the arrival-order rule — a doc is
# kept iff it is the min doc_id of its bucket in EVERY band.
STREAM_NEAR_DEDUP_SQL = f"""
{_SIG_SQL}, banded AS ({_BANDED_SQL}), verd AS (
    SELECT doc_id,
        MIN(CASE WHEN doc_id = m THEN 1 ELSE 0 END) AS kept
    FROM (
        SELECT doc_id, band, bucket,
            MIN(doc_id) OVER (PARTITION BY band, bucket) AS m
        FROM banded)
    GROUP BY doc_id
)
SELECT d.source, COUNT(*) AS n_docs,
    CAST(SUM(kept) AS BIGINT) AS n_kept,
    CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
FROM documents d JOIN verd USING (doc_id)
GROUP BY d.source
"""


REGISTRY = [
    ("stream_near_dedup", stream_near_dedup_query, STREAM_NEAR_DEDUP_SQL),
]
