"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, decoded/feature-extracted via Arrow-batched
Pandas UDFs over mapInPandas.

The container has no image/audio libraries, so the *decode* step is a
clearly marked stub (deterministic fake) — what is real and tested is
the Spark-side plumbing: binary column synthesis, metadata struct
schema, mapInPandas batch iteration, UDF signature, and partitioning.

Scale notes: binary payloads ride the same parquet scan as everything
else; feature extraction is map-only (no shuffle), Arrow-batched, and
the output schema is fixed so downstream ops stay columnar.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

FORMATS = ("png", "jpeg", "wav")

FEATURE_SCHEMA = (
    "doc_id long, fmt string, n_bytes int, byte_sum long, "
    "feat_mean double, feat_dim int"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the opaque binary column + metadata struct (the shape
    a real multimodal table would have: payload + typed sidecar)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(f) for f in FORMATS]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("fmt"),
            F.length("text").alias("n_bytes"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fmt: str) -> list:
    """STUB: real image/audio decode is unavailable in this container
    (no PIL/cv2/librosa). Deterministic fake 'decoded features': the
    per-byte values themselves. Swap with a real decoder in prod.
    """
    # NotImplementedError would be raised for a real codec path:
    if fmt not in FORMATS:
        raise NotImplementedError(f"unsupported format: {fmt}")
    return list(payload)


def extract_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, fixed-schema features out."""
    for pdf in it:
        feats = []
        for doc_id, payload, meta in zip(
            pdf["doc_id"], pdf["payload"], pdf["meta"]
        ):
            data = decode_stub(bytes(payload), meta["fmt"])
            n = len(data)
            s = int(sum(data))
            feats.append(
                (
                    int(doc_id),
                    meta["fmt"],
                    n,
                    s,
                    float(s) / n if n else 0.0,
                    n,
                )
            )
        yield pd.DataFrame(
            feats,
            columns=[
                "doc_id", "fmt", "n_bytes", "byte_sum", "feat_mean",
                "feat_dim",
            ],
        )


def multimodal_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full plumbing path: docs → binary+meta → mapInPandas decode
    stub → features. byte_sum/feat_mean are reproducible in SQL (UTF-8
    bytes of the text), so even the UDF path gets a real oracle."""
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs)
    feats = payloads.mapInPandas(extract_features, FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "fmt",
        "n_bytes",
        "byte_sum",
        F.round("feat_mean", 6).alias("feat_mean"),
    )


# documents text is ASCII word-soup, so UTF-8 byte values == unicode
# codepoints — lets plain SQL reproduce the stubbed decoder exactly.
MULTIMODAL_FEATURES_SQL = """
WITH payload AS (
    SELECT doc_id,
        (['png', 'jpeg', 'wav'])[CAST(doc_id % 3 + 1 AS INT)] AS fmt,
        length(text) AS n_bytes,
        list_sum(list_transform(string_split_regex(text, ''),
                                c -> unicode(c))) AS byte_sum
    FROM documents
)
SELECT doc_id, fmt, n_bytes, CAST(byte_sum AS BIGINT) AS byte_sum,
    round(CAST(byte_sum AS DOUBLE) / n_bytes, 6) AS feat_mean
FROM payload
"""


TARGET_BOX = 256  # resize target (fit within TARGET_BOX × TARGET_BOX)

RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "scale double"
)


def resize_plan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: aspect-preserving fit-to-box resize plan.
    The pixel resample itself is the stubbed step (no PIL/cv2 in this
    container) — the geometry, batch shape, and output schema are the
    real plumbing a decoder would slot into."""
    for pdf in it:
        w = pdf["width"].astype("int64")
        h = pdf["height"].astype("int64")
        # scale is rounded once and used rounded everywhere — the SQL
        # oracle does the same, so trunc boundaries agree
        scale = (
            (TARGET_BOX / w).combine(TARGET_BOX / h, min)
            .clip(upper=1.0)
            .round(6)
        )
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "out_w": (w * scale).round(6).apply(int),
                "out_h": (h * scale).round(6).apply(int),
                "scale": scale,
            }
        )
        yield out


def multimodal_resize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    dims = with_binary_payload(docs).select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return dims.mapInPandas(resize_plan, RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = f"""
WITH dims AS (
    SELECT doc_id,
        CAST(doc_id % 640 + 1 AS INT) AS width,
        CAST(doc_id % 480 + 1 AS INT) AS height
    FROM documents
), scaled AS (
    SELECT *, round(least(least({TARGET_BOX}.0 / width,
                               {TARGET_BOX}.0 / height), 1.0), 6) AS scale
    FROM dims
)
SELECT doc_id, width, height,
    CAST(trunc(round(width * scale, 6)) AS INT) AS out_w,
    CAST(trunc(round(height * scale, 6)) AS INT) AS out_h,
    scale
FROM scaled
"""

FRAME_EVERY = 30  # sample one frame per FRAME_EVERY (≈1/s at 30 fps)
FPS = 30.0

FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long"


def frame_sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 1→N frame-index expansion per video.
    Frame *decode* is the stubbed step; the sampling plan (which frame
    indices to pull, at which timestamps) is the real Spark-side work.
    """
    for pdf in it:
        out = []
        for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
            for idx in range(0, int(n_frames), FRAME_EVERY):
                out.append(
                    (int(doc_id), idx, int(round(idx / FPS * 1000)))
                )
        yield pd.DataFrame(
            out, columns=["doc_id", "frame_idx", "ts_ms"]
        )


def multimodal_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    videos = docs.select(
        "doc_id", (F.col("doc_id") % 300 + 1).cast("int").alias("n_frames")
    )
    return videos.mapInPandas(frame_sample, FRAME_SCHEMA)


MULTIMODAL_FRAMES_SQL = f"""
WITH videos AS (
    SELECT doc_id, CAST(doc_id % 300 + 1 AS INT) AS n_frames
    FROM documents
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
    CAST(round(i / {FPS} * 1000) AS BIGINT) AS ts_ms
FROM videos, LATERAL (
    SELECT unnest(range(0, n_frames, {FRAME_EVERY})) AS i)
"""


# ------------------------------------------------------ audio framing
#
# The speech-pipeline front end: slice a PCM byte stream into
# overlapping fixed-length frames (the 25 ms window / 10 ms hop
# pattern) and compute per-frame energy — the input to VAD, silence
# trimming, and feature extraction. Real audio decode is stubbed like
# the other modalities (payload bytes stand in for samples); the
# Spark-side shape is real: Arrow-batched mapInPandas doing a
# vectorized 1→N frame expansion, map-only, no shuffle. Energies are
# integer sums of byte values, so the DuckDB oracle reproduces the
# "decoder" exactly from the text's codepoints.

AF_LEN = 64  # frame length in samples (bytes)
AF_HOP = 32  # hop (50% overlap)

AUDIO_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, start_sample int, energy long, "
    "rms double"
)


def audio_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = len(data)
            if n < AF_LEN:
                continue
            for i in range((n - AF_LEN) // AF_HOP + 1):
                w = data[i * AF_HOP : i * AF_HOP + AF_LEN].astype(
                    np.int64
                )
                e = int(w.sum())
                rms = float((w * w).sum() / AF_LEN) ** 0.5
                out.append(
                    (int(doc_id), i, i * AF_HOP, e, round(rms, 6))
                )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "frame_idx", "start_sample", "energy", "rms",
            ],
        )


def multimodal_audio_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    wavs = with_binary_payload(docs).where(
        F.col("meta.fmt") == "wav"
    ).select("doc_id", "payload")
    return wavs.mapInPandas(audio_frames, AUDIO_FRAME_SCHEMA)


MULTIMODAL_AUDIO_SQL = f"""
WITH wavs AS (
    SELECT doc_id, text, length(text) AS n FROM documents
    WHERE (['png', 'jpeg', 'wav'])[CAST(doc_id % 3 + 1 AS INT)] = 'wav'
      AND length(text) >= {AF_LEN}
), framed AS (
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
        CAST(i * {AF_HOP} AS INT) AS start_sample,
        list_transform(
            string_split_regex(
                substr(text, i * {AF_HOP} + 1, {AF_LEN}), ''),
            c -> unicode(c)) AS w
    FROM wavs, LATERAL (
        SELECT unnest(range(0, (n - {AF_LEN}) // {AF_HOP} + 1)) AS i)
)
SELECT doc_id, frame_idx, start_sample,
    CAST(list_sum(w) AS BIGINT) AS energy,
    round(sqrt(CAST(list_sum(list_transform(w, x -> x * x)) AS DOUBLE)
               / {AF_LEN}), 6) AS rms
FROM framed
"""


# ------------------------------------------------ perceptual-hash dedup
#
# The multimodal bridge into the dedup family: a difference-hash
# (dHash) over the decoded byte grid — the classic perceptual
# image-dedup signature (64 bits: does cell (r,c) outshine its right
# neighbor on an 8×8 walk of a 9-wide grid) — candidate-generated by
# Hamming-LSH BANDING (4 bands of 16 bits; a pair is a candidate iff
# some band matches exactly, the multi-index Hamming search every
# production pHash dedup uses), verified by exact Hamming distance.
# The hash is computed in the Arrow-batched mapInPandas worker over
# the (stub-)decoded bytes — the REAL deployment swaps decode_stub for
# a resize+grayscale decode and nothing else changes; the
# deterministic stub is what lets plain SQL reproduce the bits for the
# oracle.
#
# Scale: hashing is map-only; the band groupBy is the single exchange
# (4 rows per doc); in-band pair expansion is O(k²) on LSH-small
# buckets with the star cap bounding adversarial mega-buckets, and the
# Hamming verify runs only on candidates (propose/dispose, the
# dedup.py contract).

PHASH_GRID = 8  # 8×8 bits from a 9-column walk
PHASH_BANDS = 4
PHASH_BAND_BITS = 16  # 4 × 16 = the full 64-bit hash
PHASH_MAX_HAMMING = 16
PHASH_BUCKET_CAP = 32  # mega-bucket star guard (dedup.LSH_BUCKET_CAP analog)

PHASH_SCHEMA = "doc_id long, dhash string"


_PHASH_CELLS = PHASH_GRID * (PHASH_GRID + 1)  # 72 grid positions


def _dhash_rows(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Bits are computed over Unicode CODE POINTS of the decoded payload
    # (ord of each char, char length n) — NOT raw UTF-8 bytes — so the
    # hash agrees with the oracle's unicode()/length() semantics for
    # any text, not just ASCII (round-4 advice item). Grid cell g
    # samples char (g*n)//72 — a STRIDE over the WHOLE payload, the
    # text analog of the resize step real dHash starts with. (The
    # earlier (g % n) sampling read only the first ~72 code points, so
    # any corpus sharing a boilerplate prefix — or a suffix-tagged
    # replica harness — collapsed into dhash twins; the round-12
    # profile localized the 10x smoke ratchet to exactly that.)
    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            chars = bytes(payload).decode("utf-8")
            n = len(chars)
            if n == 0:
                continue
            bits = "".join(
                "1"
                if ord(chars[((r * (PHASH_GRID + 1) + c) * n) // _PHASH_CELLS])
                > ord(chars[((r * (PHASH_GRID + 1) + c + 1) * n) // _PHASH_CELLS])
                else "0"
                for r in range(PHASH_GRID)
                for c in range(PHASH_GRID)
            )
            out.append((int(doc_id), bits))
        yield pd.DataFrame(out, columns=["doc_id", "dhash"])


_HAMMING = (
    "aggregate(sequence(1, {n}), 0, (acc, i) -> acc + "
    "if(substring({a}, i, 1) = substring({b}, i, 1), 0, 1))"
)


def _phash_pairs(hashed: DataFrame) -> DataFrame:
    """(doc_id, dhash) → verified near-dup pairs via Hamming-LSH
    banding. Each doc emits PHASH_BANDS (band_id, band_bits) keys; a
    band bucket holding >1 doc expands to candidate pairs; candidates
    are verified by exact Hamming distance; a pair found by several
    bands dedups to one row (distinct over the deterministic result).

    Mega-bucket guard (dedup.py's LSH_BUCKET_CAP rule): a band bucket
    of k near-identical images would expand to k(k-1)/2 pairs inside
    ONE task. Oversized buckets emit a sorted STAR (every id paired
    with the bucket min): O(k) pairs. Because the Hamming filter runs
    per EDGE after expansion, the star is an APPROXIMATION: two docs
    within PHASH_MAX_HAMMING of each other but both farther than that
    from the bucket-min lose their connecting edge, so star components
    are a REFINEMENT (possible splits, never merges) of the full
    clique expansion's — the same recall-for-bound trade-off
    LSH_BUCKET_CAP makes. The oracle applies the identical rule, so
    engine parity is exact."""
    band_keys = F.array(
        *[
            F.concat(
                F.lit(f"{i}:"),
                F.substring(
                    "dhash", i * PHASH_BAND_BITS + 1, PHASH_BAND_BITS
                ),
            )
            for i in range(PHASH_BANDS)
        ]
    )
    banded = hashed.select(
        "doc_id", "dhash", F.explode(band_keys).alias("bucket")
    )
    buckets = (
        banded.groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "dhash"))
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
    )
    all_pairs = """flatten(transform(ids, (x, i) ->
        transform(slice(ids, i + 2, size(ids) - i - 1),
                  y -> struct(x.doc_id AS doc_a,
                              y.doc_id AS doc_b,
                              x.dhash AS ha,
                              y.dhash AS hb))))"""
    star = """transform(slice(ids, 2, size(ids) - 1), y ->
        struct(element_at(ids, 1).doc_id AS doc_a,
               y.doc_id AS doc_b,
               element_at(ids, 1).dhash AS ha,
               y.dhash AS hb))"""
    pairs = buckets.select(
        F.explode(
            F.when(
                F.size("ids") <= PHASH_BUCKET_CAP, F.expr(all_pairs)
            ).otherwise(F.expr(star))
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.ha", "p.hb")
    ham = F.expr(
        _HAMMING.format(n=PHASH_GRID * PHASH_GRID, a="ha", b="hb")
    )
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def multimodal_phash_dedup_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    docs = read_table(spark, sf_dir, "documents")
    hashed = with_binary_payload(docs).mapInPandas(
        _dhash_rows, PHASH_SCHEMA
    )
    return _phash_pairs(hashed)


def _phash_bits_sql() -> str:
    cells = []
    for r in range(PHASH_GRID):
        for c in range(PHASH_GRID):
            i = r * (PHASH_GRID + 1) + c
            cells.append(
                "CASE WHEN"
                f" unicode(substr(text, (({i} * n) // {_PHASH_CELLS}) + 1, 1))"
                f" > unicode(substr(text, (({i + 1} * n) // {_PHASH_CELLS}) + 1, 1))"
                " THEN '1' ELSE '0' END"
            )
    return " || ".join(cells)


def _phash_dedup_sql() -> str:
    # Same clique/star PHASH_BUCKET_CAP rule as the Spark side.
    ham = (
        f"list_reduce(list_transform(range(1, {PHASH_GRID**2 + 1}), "
        "i -> CASE WHEN substr(p.ha, i, 1) = substr(p.hb, i, 1) "
        "THEN 0 ELSE 1 END), (x, y) -> x + y)"
    )
    return f"""
WITH hashed AS (
    SELECT doc_id, {_phash_bits_sql()} AS dhash
    FROM (SELECT doc_id, text, length(text) AS n FROM documents
          WHERE length(text) > 0)
), bucketed AS (
    SELECT doc_id, dhash,
        i || ':' || substr(dhash, CAST(i * {PHASH_BAND_BITS} + 1 AS INT),
                           {PHASH_BAND_BITS}) AS bucket
    FROM hashed, (SELECT unnest(range(0, {PHASH_BANDS})) AS i)
), buckets AS (
    SELECT bucket,
        list_sort(list({{'doc_id': doc_id, 'dhash': dhash}})) AS ids
    FROM bucketed GROUP BY bucket HAVING count(*) > 1
), expanded AS (
    SELECT unnest(CASE WHEN len(ids) <= {PHASH_BUCKET_CAP} THEN
        flatten(list_transform(range(1, len(ids) + 1), i ->
            list_transform(range(i + 1, len(ids) + 1), j ->
                {{'doc_a': ids[i].doc_id, 'doc_b': ids[j].doc_id,
                  'ha': ids[i].dhash, 'hb': ids[j].dhash}})))
    ELSE
        list_transform(range(2, len(ids) + 1), i ->
            {{'doc_a': ids[1].doc_id, 'doc_b': ids[i].doc_id,
              'ha': ids[1].dhash, 'hb': ids[i].dhash}})
    END) AS p
    FROM buckets
)
SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b, {ham} AS hamming
FROM expanded
WHERE {ham} <= {PHASH_MAX_HAMMING}
"""


REGISTRY = [
    ("multimodal_features", multimodal_features_query, MULTIMODAL_FEATURES_SQL),
    ("multimodal_resize", multimodal_resize_query, MULTIMODAL_RESIZE_SQL),
    ("multimodal_frame_sample", multimodal_frames_query, MULTIMODAL_FRAMES_SQL),
    ("multimodal_audio_frames", multimodal_audio_query, MULTIMODAL_AUDIO_SQL),
    ("multimodal_phash_dedup", multimodal_phash_dedup_query,
     _phash_dedup_sql()),
]
