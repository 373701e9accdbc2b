"""Phase-level timing for the iterative trainer family (r14 opt round).

Times each driver-blocking phase of the k-means / PQ trainers in
isolation so the fixed per-job overhead (plan + codegen + schedule)
can be separated from data compute. Prints one JSON line per phase.

Usage: python tools/profile_trainer_phases.py [kmeans|pq|ivfadc] ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(json.dumps({"phase": label, "s": round(dt, 3)}), flush=True)
    return out


def main() -> None:
    which = sys.argv[1:] or ["kmeans"]
    from pyspark.sql import functions as F

    from replicator_spark.session import get_spark, read_table
    from replicator_spark.pipeline import vectors as V

    spark = get_spark("phase-profile")
    # warm like bench.py
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.count("*")).write.format("noop").mode(
        "overwrite"
    ).save()

    if "kmeans" in which:
        emb = V._km_corpus(spark, SF_DIR).persist()
        t("km.persist_materialize", lambda: emb.count())
        seeds = t(
            "km.seeds",
            lambda: (
                emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
                .orderBy("h")
                .limit(V.KMEANS_K)
                .select("v")
                .collect()
            ),
        )
        cents = [
            [V.round_half_away(float(x), 6) for x in r["v"]] for r in seeds
        ]
        for it in range(V.KMEANS_ITERS):
            def one_round():
                assigned = V._assign(emb, cents)
                return (
                    assigned.select(
                        "cid", F.posexplode("v").alias("dim", "x")
                    )
                    .groupBy("cid", "dim")
                    .agg(
                        F.sum(
                            F.col("x").cast("decimal(15,10)")
                        ).alias("sx"),
                        F.count("*").alias("n"),
                    )
                    .collect()
                )

            sums = t(f"km.round{it}", one_round)
            by_cid: dict = {}
            for r in sums:
                by_cid.setdefault(r["cid"], {})[r["dim"]] = (
                    float(r["sx"]),
                    r["n"],
                )
            new_cents = []
            for i, old in enumerate(cents):
                dims = by_cid.get(i)
                if not dims:
                    new_cents.append(old)
                    continue
                new_cents.append(
                    [
                        V.round_half_away(dims[d][0] / dims[d][1], 6)
                        for d in range(len(old))
                    ]
                )
            cents = new_cents
        emb.unpersist()
        final = V._assign(emb, cents)
        t(
            "km.final_noop",
            lambda: final.groupBy("cid")
            .agg(F.count("*").alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    if "pq" in which or "ivfadc" in which:
        emb = read_table(spark, SF_DIR, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        if "ivfadc" in which:
            n_total = t("ivf.count", lambda: emb.count())
            h = V._knn_h(n_total)
        subs = V._pq_subvectors(emb).persist()
        t("pq.persist_materialize", lambda: subs.count())
        t0 = time.perf_counter()
        cents = V._pq_train(spark, subs)
        print(
            json.dumps(
                {
                    "phase": "pq.train_total(seeds+3rounds)",
                    "s": round(time.perf_counter() - t0, 3),
                }
            ),
            flush=True,
        )
        subs.unpersist()
        final = V._pq_assign(spark, subs, cents)
        t(
            "pq.final_assign_noop",
            lambda: final.write.format("noop").mode("overwrite").save(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
