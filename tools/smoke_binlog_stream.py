"""10x smoke of the COMPOSED steady-state topology on the wire format
(round-11 verdict task #5): config-driven streaming run — rotated
binlog v4 files -> byte-walk decode -> envelope -> txn stamping /
micro-organizer -> time-machine cells via foreachBatch — timed at 1x
and 10x the file count, fresh checkpoint each run.

The 10x replica offsets event_id/user_id/ts per copy (the scale_smoke
convention) so the envelope's per-user lag work scales with data, not
degenerately. Files are the unit of parallelism for the binaryFile
source, so the expected profile is ~linear in files.

Usage: python tools/smoke_binlog_stream.py [sf_dir] [R]
Writes artifacts/smoke_binlog_stream_r12.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.runner import run_stream  # noqa: E402
from replicator_spark.session import get_spark, prep, read_table  # noqa: E402
from replicator_spark.sources.binlog import (  # noqa: E402
    snapshot_to_binlog_files,
)

KEY_OFFSET = 10_000_000
TS_OFFSET_US = 400 * 24 * 3600 * 1_000_000


def change_rows(spark, sf_dir: str):
    from replicator_spark.cdc.envelope import OP_CASE_SQL

    return (
        read_table(spark, sf_dir, "events")
        .select(
            F.expr(OP_CASE_SQL).alias("op"),
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .where(F.col("op") != "QUERY")
    )


def build_logs(spark, sf_dir: str, out_dir: str, r_factor: int) -> int:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    rows = change_rows(spark, sf_dir)
    parts = []
    for r in range(r_factor):
        parts.append(
            rows.withColumn("event_id", F.col("event_id") + F.lit(r * KEY_OFFSET))
            .withColumn("user_id", F.col("user_id") + F.lit(r * KEY_OFFSET))
            .withColumn("ts_us", F.col("ts_us") + F.lit(r * TS_OFFSET_US))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    files = snapshot_to_binlog_files(out, out_dir)
    return len(files)


def timed_stream(spark, logs_dir: str, tag: str) -> float:
    out = f"/tmp/binlog_stream_smoke/out_{tag}"
    ckpt = f"/tmp/binlog_stream_smoke/ckpt_{tag}"
    for d in (out, ckpt):
        if os.path.exists(d):
            shutil.rmtree(d)
    cfg = {
        "source.type": "binlog_files",
        "source.binlog.path": logs_dir,
        "applier.type": "timemachine",
    }
    t0 = time.time()
    run_stream(spark, None, cfg, out, ckpt)
    dt = time.time() - t0
    n = spark.read.parquet(out).count()
    print(f"{tag}: {dt:.3f}s, {n} cells")
    return round(dt, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    r_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    prep(spark)
    base = "/tmp/binlog_stream_smoke"
    n1 = build_logs(spark, sf_dir, f"{base}/logs_1x", 1)
    nr = build_logs(spark, sf_dir, f"{base}/logs_rx", r_factor)
    # warm-up: one full composed run (streaming+python-worker cold
    # paths), then time each scale
    timed_stream(spark, f"{base}/logs_1x", "warmup")
    t1 = timed_stream(spark, f"{base}/logs_1x", "1x")
    tr = timed_stream(spark, f"{base}/logs_rx", "rx")
    result = {
        "sf_dir": sf_dir,
        "r_factor": r_factor,
        "files_1x": n1,
        "files_rx": nr,
        "t_1x": t1,
        "t_rx": tr,
        "ratio": round(tr / t1, 2) if t1 else None,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/smoke_binlog_stream_r12.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
