"""Full-registry oracle drive, resumable in index-range chunks.

Drives registered queries against the DuckDB oracle at the driver's
correctness SF (sf0.01) under a HOSTILE session timezone with a
vanilla SparkSession — the grading driver's own procedure. The full
registry takes ~25 min, which exceeds this environment's 10-minute
background-command cap, so the drive is chunked: each invocation
processes [lo, hi) of the registration order and APPENDS one JSON
line per op to the JSONL log; `--summarize` folds the log into the
round artifact.

Usage:
    python tools/full_drive.py LO HI [--log=/tmp/full_drive.jsonl]
    python tools/full_drive.py --summarize ARTIFACT.json \
        [--log=/tmp/full_drive.jsonl]

Typical round close (4 chunks of ~70 ops):
    for span in "0 70" "70 145" "145 215" "215 9999"; do
        python tools/full_drive.py $span; done   # sequentially!
    python tools/full_drive.py --summarize artifacts/full_drive_rN.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def summarize(log_path: str, out_path: str) -> None:
    rows = [json.loads(line) for line in open(log_path)]
    bad = [
        r["op"] for r in rows
        if r["status"] != "pass" and not r["status"].startswith("rows-only")
    ]
    by_status: dict[str, int] = {}
    for r in rows:
        k = r["status"].split(":")[0]
        by_status[k] = by_status.get(k, 0) + 1
    summary = {
        "n_ops": len(rows),
        "by_status": by_status,
        "bad": bad,
        "total_sec": round(sum(r["sec"] for r in rows), 1),
        "tz": "America/New_York",
        "sf": 0.01,
        "results": {
            r["op"]: {"status": r["status"], "rows": r["rows"],
                      "sec": r["sec"]}
            for r in rows
        },
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}))


def drive(
    lo: int, hi: int, log_path: str, sf_dir: str, only: list | None = None
) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    import __spark_entry__ as E
    from tools.parity import canon

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, orc = E.queries(), E.oracle_sql()
    names = [n for n in only if n in qs] if only else list(qs)[lo:hi]
    with open(log_path, "a") as logf:
        for i, name in enumerate(names):
            t0 = time.time()
            try:
                sdf = qs[name](spark, sf_dir).toPandas()
                if name not in orc:
                    status, n = "rows-only", len(sdf)
                else:
                    ddf = con.execute(orc[name]).fetchdf()
                    sc, sr = canon(sdf)
                    dc, dr = canon(ddf)
                    status = "pass" if (sc == dc and sr == dr) else "FAIL"
                    n = len(sr)
            except Exception as e:  # recorded, not fatal — keep driving
                status, n = f"ERROR:{repr(e)[:120]}", -1
            logf.write(
                json.dumps(
                    {"op": name, "status": status, "rows": n,
                     "sec": round(time.time() - t0, 2)}
                )
                + "\n"
            )
            logf.flush()
            print(f"[{lo + i + 1}] {status} {name}", flush=True)
    spark.stop()


def main() -> None:
    log_path = "/tmp/full_drive.jsonl"
    sf_dir = "/root/testdata/sf0.01"
    args = []
    summarize_to = None
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--log="):
            log_path = a.split("=", 1)[1]
        elif a == "--summarize":
            summarize_to = next(it)
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            args.append(a)
    if summarize_to:
        summarize(log_path, summarize_to)
        return
    if args and not args[0].isdigit():
        # name mode: drive exactly these ops (targeted re-verification
        # of a touched-op set during the optimization rounds)
        drive(0, 0, log_path, sf_dir, only=args)
        return
    lo, hi = int(args[0]), int(args[1])
    drive(lo, hi, log_path, sf_dir)


if __name__ == "__main__":
    main()
