"""Stage-level 10x profile of multimodal_phash_dedup (round-11 verdict
task #6: the op's 10x smoke ratio ratcheted 12.3x -> 13.7x across two
rounds, 91% of the 15x flag — localize WHICH term grows).

Builds a fixed-dups 10x replica of documents (the scale_smoke
annotation: per-replica text tags keep duplicate density constant),
then times, best-of-N in one JVM at BOTH scales:

  hash    — the mapInPandas dhash scan alone
  bucket  — + the groupBy(bucket) collect_list agg
  full    — + pair expansion + Hamming verify (the registered op)

A warm-up run of the full op precedes timing at each scale, so the
JIT-warm-denominator hypothesis (cold 1x denominator inflating the
ratio) is removed by construction: if ratios stay high here, the
growth is real; if they drop to ~linear, the smoke's cold 1x run was
the inflator.

Usage: python tools/profile_phash.py [sf_dir] [R] [reps]
Writes artifacts/profile_phash_r12.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.pipeline.multimodal import (  # noqa: E402
    PHASH_SCHEMA,
    _dhash_rows,
    multimodal_phash_dedup_query,
    with_binary_payload,
)
from replicator_spark.session import get_spark, prep, read_table  # noqa: E402
from tools.scale_smoke import build_replica  # noqa: E402


def stage_times(spark, sf_dir: str, reps: int) -> dict:
    def run_hash():
        docs = read_table(spark, sf_dir, "documents")
        with_binary_payload(docs).mapInPandas(
            _dhash_rows, PHASH_SCHEMA
        ).write.format("noop").mode("overwrite").save()

    def run_bucket():
        from replicator_spark.pipeline.multimodal import (
            PHASH_BAND_BITS,
            PHASH_BANDS,
        )

        docs = read_table(spark, sf_dir, "documents")
        hashed = with_binary_payload(docs).mapInPandas(
            _dhash_rows, PHASH_SCHEMA
        )
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
        (
            hashed.select(
                "doc_id", "dhash", F.explode(band_keys).alias("bucket")
            )
            .groupBy("bucket")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "dhash"))
                ).alias("ids")
            )
            .filter(F.size("ids") > 1)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def run_full():
        multimodal_phash_dedup_query(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

    run_full()  # JIT/codegen warm-up at this scale — not timed
    out = {}
    for name, fn in (("hash", run_hash), ("bucket", run_bucket),
                     ("full", run_full)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark()
    prep(spark)
    rep_dir = "/tmp/phash_profile_replica"
    build_replica(
        spark, sf_dir, rep_dir, r_factor, fixed_dups=True,
        tables={"documents"},
    )
    t1 = stage_times(spark, sf_dir, reps)
    tr = stage_times(spark, rep_dir, reps)
    result = {
        "sf_dir": sf_dir,
        "r_factor": r_factor,
        "reps": reps,
        "t_1x": t1,
        "t_rx": tr,
        "ratios": {
            k: round(tr[k] / t1[k], 2) if t1[k] else None for k in t1
        },
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/profile_phash_r12.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
