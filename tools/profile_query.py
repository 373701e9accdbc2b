"""Per-query profiling harness for the optimization rounds.

Usage:
    python tools/profile_query.py [--plans-dir plans/r14] [--suffix before]
        [--reps 3] name1 name2 ...

For each named queries() entry: builds the DataFrame (timed — plan
construction + any constant-size driver jobs the trainer contract
allows), writes `.explain("formatted")` to
<plans-dir>/<name>_<suffix>.txt, then times the noop-sink
materialization best-of-N. Prints one JSON line per query with
{name, build_s, exec_s, total_s, n_exchanges, n_python_evals, joins}.

Jobs are labelled via setJobDescription so the timeline is readable
in the event logs if enabled.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from replicator_spark import api
    from replicator_spark.session import get_spark

    spark = get_spark("profile")
    qs = api.queries()
    # warm the JVM/noop path like bench.py does
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.count("*")).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.names:
        sc = spark.sparkContext
        sc.setJobDescription(f"profile:{name}:build")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf_dir)
        build_s = time.perf_counter() - t0
        plan_txt = ""
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan_txt = buf.getvalue()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"),
                "w",
            ) as fh:
                fh.write(plan_txt)
        best = float("inf")
        for i in range(args.reps):
            sc.setJobDescription(f"profile:{name}:rep{i}")
            t0 = time.perf_counter()
            df2 = qs[name](spark, args.sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        sc.setJobDescription(None)
        rec = {
            "name": name,
            "build_s": round(build_s, 3),
            "best_total_s": round(best, 3),
            "n_exchanges": len(re.findall(r"\bExchange\b", plan_txt)),
            "n_python": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow",
                    plan_txt,
                )
            ),
            "joins": sorted(
                set(re.findall(r"(\w*Join\w*)\b", plan_txt))
            ),
            "aqe": "AdaptiveSparkPlan" in plan_txt,
        }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
