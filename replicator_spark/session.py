"""SparkSession construction + per-query session prep.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM; the configs
below are chosen so the same logical plans scale to a real cluster:
AQE on (runtime coalesce + skew-join), shuffle partitions sized to
cores locally (cluster: ~2-3x total cores), UTC session time so
results are zone-independent, Arrow enabled for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Confs that MUST hold for our readers/expressions regardless of who
# built the session (the driver harness builds its own). All of these
# are runtime-settable SQLConfs.
RUNTIME_CONFS = {
    # driver testdata events.parquet uses INT64(TIMESTAMP_NANOS,...) which
    # Spark's parquet reader rejects; read the nanos as plain longs and
    # convert explicitly (see cdc/envelope.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # zone-independent date_format/unix_millis — parity with the DuckDB
    # oracle (naive-UTC timestamps) and with the reference's pinned-UTC
    # fixtures (SURVEY.md §7 "zone-dependent timestamp math").
    "spark.sql.session.timeZone": "UTC",
    # the default 200 shuffle partitions over-parallelizes local runs
    # by an order of magnitude (AQE coalesces batch plans, but
    # stateful streaming ops are pinned to this number at first run).
    # Sized from $SPARK_GRAFT_CPUS (floor 8) so the driver's low-core
    # scaling bench gets proportionally fewer state partitions too —
    # a cluster deployment sizes this at 2-3× total cores instead.
    "spark.sql.shuffle.partitions": str(
        max(
            int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            if os.environ.get("SPARK_GRAFT_CPUS", "32").isdigit()
            else 32,
            8,
        )
    ),
}


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already fixed to the same value, or a no-op conf
    return spark


def get_spark(app_name: str = "replicator-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # scan-split sizing: 128 MB input splits keep a task's working
        # set well under executor memory at any SF (at 100 TB this is
        # the lever that bounds per-task memory, together with
        # shuffle.partitions ≈ 2-3× total cores)
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prep(spark)


from contextlib import contextmanager as _contextmanager


@_contextmanager
def no_aqe(spark: SparkSession):
    """Disable adaptive query execution around driver-side
    constant-size reduction loops (Lloyd/PQ training rounds, greedy
    top-1 selection loops). Their reduction output is constant-size
    BY DESIGN at any corpus scale, so AQE has nothing to adapt — no
    skew join, no post-shuffle size surprise — while its
    stage-by-stage re-optimization costs a driver round-trip per
    stage per round (measured 1.7-2.4 s/round with AQE vs 0.9-1.1 s
    without on the sf0.1 trainer corpus, identical results). Serving
    plans returned to callers keep AQE."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def fan_out(
    df,
    spark: SparkSession,
    input_bytes: int | None = None,
    bytes_per_task: int | None = None,
):
    """Input-skew guard (optimization guide §2.5 "one huge unsplittable
    file ... repartition immediately after the read").

    The bench/driver testdata ships every table as ONE single-row-group
    parquet file, so every scan is exactly one task and all map-side
    work before the first exchange runs single-threaded regardless of
    core count. For operators whose cost is heavy per-row compute (the
    vector/trainer family's distance folds, LSH hashing, in-cell
    self-join scoring, wide decimal partial aggregations), one
    round-robin exchange of the (tiny) input right after the scan
    unlocks the cores.

    Scale-adaptive, not a local[32] constant: the guard compares the
    scan's actual partition count to ``defaultParallelism`` (which
    follows $SPARK_GRAFT_CPUS locally and cluster sizing in
    production). At real scale the scan already carries more
    partitions than cores and this is the identity — no exchange
    enters the plan. Only applied where results are provably
    partition-invariant (deterministic total orders, order-free exact
    aggregates — the repo-wide cross-engine determinism armor already
    guarantees this for every declared query it is used in).
    """
    if df.isStreaming:
        # streaming frames can't be repartition-probed (and micro-batch
        # parallelism is governed by the stream's own partitioning)
        return df
    p = spark.sparkContext.defaultParallelism
    # Scan-partition bounds from the file listing (r15, VERDICT item 5):
    # `df.rdd.getNumPartitions()` re-analyzes the plan and converts it
    # to an RDD — a fixed driver cost per call in exactly the
    # overhead-bound regime this guard serves. A file of size s yields
    # at most ceil(s/maxPartitionBytes) splits (splits never cross
    # files) and packing can only merge them, so Σceil bounds n from
    # ABOVE; every split holds ≤ maxPartitionBytes of file bytes (open
    # cost only inflates further), so ceil(total/maxPartitionBytes)
    # bounds n from BELOW. When the bounds decide (tiny local inputs:
    # upper < p → repartition; cluster-scale inputs: lower ≥ p →
    # identity) the RDD probe is skipped; only the in-between band
    # pays it.
    n = None
    sizes = _input_file_sizes(df)
    if sizes:
        try:
            max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        except Exception:
            max_pb = 128 * 1024 * 1024
        n_upper = sum(-(-s // max_pb) for s in sizes)
        n_lower = max(1, -(-sum(sizes) // max_pb))
        if n_upper < p:
            n = n_upper  # < p: the repartition branch fires below
        elif n_lower >= p:
            return df  # already at least p scan partitions
    if n is None:
        try:
            n = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover - defensive only
            return df
    if input_bytes is not None and bytes_per_task:
        # Iterative callers (the Lloyd/PQ trainer loops) additionally
        # derive the fan-out width from the INPUT SIZE (guide §2
        # "make partitioning scale-adaptive — derive from input size"):
        # every training round re-schedules one task per partition, so
        # for a working set of a few hundred KB the 32-way round-robin
        # costs more per round in scheduler latency than the distance
        # math it parallelizes (measured 1.5-2.1 s/round at 32 parts
        # vs 0.8-1.0 s at 4 parts on the sf0.1 trainer corpus). The
        # defaultParallelism cap is what sizes production: a corpus
        # big enough to need the cluster saturates it, and a scan that
        # already carries >= that many partitions skips the exchange
        # entirely.
        p = max(1, min(p, -(-input_bytes // bytes_per_task)))
    return df.repartition(p) if n < p else df


def _input_file_sizes(df) -> list | None:
    """Local on-disk sizes of the files behind a scan (driver-side
    listing, no job). None when the frame has no file provenance or a
    file is not local."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive only
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        pth = uri
        if pth.startswith("file:"):
            pth = pth[5:]
            while pth.startswith("//"):
                pth = pth[1:]
        try:
            sizes.append(os.path.getsize(pth))
        except OSError:  # pragma: no cover - non-local storage
            return None
    return sizes


def scan_bytes(df) -> int | None:
    """Total on-disk size of the files behind a scan, for the
    size-derived fan_out width (guide §2 scale-adaptive partitioning).
    Driver-side listing only — no job. None when the frame has no
    file provenance (local relations, streaming)."""
    sizes = _input_file_sizes(df)
    return sum(sizes) if sizes else None


def normalize_events(df):
    """Canonicalize the events ``ts`` column to INT64 epoch-nanos.

    The driver's testdata has shipped ``events.ts`` in two physical
    forms across rounds: INT64(TIMESTAMP_NANOS) (read as plain longs
    via ``nanosAsLong``) and a parquet TIMESTAMP in micros (read as
    TIMESTAMP_NTZ). Every downstream expression works in integer nanos
    (``ts div 1000000`` → ms), so convert the timestamp form back to
    nanos here at the single read choke point. With the session zone
    pinned to UTC, ``unix_micros(cast(ts as timestamp)) * 1000`` is the
    exact inverse of the µs-timestamp encoding; the DuckDB oracles'
    ``epoch_ms(ts)`` / ``epoch_us(ts)`` agree in both engines. This is
    a pure projection over the scan — pushdown/pruning on the other
    columns is unaffected.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype in (None, "bigint", "long"):
        # the driver's historical long encoding is epoch-nanos; keep
        # the contract fixed rather than magnitude-sniffing, so tiny
        # synthetic test values can't be mis-bucketed
        return df

    def _magnitude_ns(v):
        # unit dispatched on magnitude per row — epoch seconds (<1e11,
        # fractional µs/ns preserved), millis (<1e14), micros (<1e17),
        # else nanos. Exact for 1973-2200; decimal×int products stay
        # within precision 38 before the final long cast.
        return (
            F.when(v >= F.lit(10**17), v)
            .when(v >= F.lit(10**14), v * 1000)
            .when(v >= F.lit(10**11), v * 1000000)
            .otherwise(v * 1000000000)
        ).cast("long")

    if dtype.startswith("decimal"):
        # preemptive armor for a DECIMAL ts encoding (the driver has
        # already changed the physical encoding twice)
        ns = _magnitude_ns(F.col("ts"))
    elif dtype.startswith("timestamp") or dtype == "date":
        ns = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    elif dtype == "string":
        # further preemptive armor: digit strings dispatch by
        # magnitude like DECIMAL; everything else must parse as an
        # ISO timestamp (UTC session zone), and an unparseable value
        # surfaces as NULL ts downstream rather than a unit shift
        v = F.col("ts")
        ns = F.when(
            v.rlike(r"^\d+(\.\d+)?$"),
            _magnitude_ns(v.cast("decimal(38,9)")),
        ).otherwise(F.unix_micros(v.cast("timestamp")) * 1000)
    else:
        raise ValueError(
            f"events.ts arrived as unsupported dtype {dtype!r}; "
            "normalize_events knows long-nanos, timestamp, and decimal "
            "encodings — extend it rather than letting a silent unit "
            "shift through"
        )
    cols = [ns.alias("ts") if c == "ts" else F.col(c) for c in df.columns]
    return df.select(cols)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    prep(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    return normalize_events(df) if name == "events" else df
