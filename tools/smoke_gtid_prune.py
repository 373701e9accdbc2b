"""Quantify file-level pruning for GTID-mode resume: with N retained
rotated files and a checkpoint near the head, resume cost should
scale with the REPLAY TAIL, not the retention window.

Builds N server-style files (PREVIOUS_GTIDS headers, continuing gno),
then times read_binlog_files + count three ways:
  full      — no checkpoint (decode all N files)
  row-trim  — resume_after_gtid only (decode all, filter rows)
  pruned    — resume_gtid_set= (start-file search drops N-tail files
              from the scan)

Usage: python tools/smoke_gtid_prune.py [n_files] [rows_per_file] [tail]
Writes artifacts/smoke_gtid_prune_r12.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from replicator_spark.session import get_spark  # noqa: E402
from replicator_spark.sources.binlog import (  # noqa: E402
    _SID_UUID,
    encode_binlog_file,
    read_binlog_files,
    resume_after_gtid,
)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    tail = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    logs = "/tmp/gtid_prune_smoke/logs"
    if os.path.exists(logs):
        shutil.rmtree(logs)
    os.makedirs(logs)
    eid = 0
    for f in range(n_files):
        recs, ids = [], []
        for _ in range(rows_per):
            eid += 1
            recs.append(
                ("INSERT", eid, eid * 1_000_000, eid % 997, "signup",
                 float(eid), "{}")
            )
            ids.append(f + 1)  # one txn per file: gno = file index + 1
        prev = {_SID_UUID: [(1, f)]} if f else {}
        with open(f"{logs}/binlog.{f + 1:06d}", "wb") as fh:
            fh.write(encode_binlog_file(recs, txn_ids=ids, prev_gtids=prev))

    spark = get_spark()
    ckpt = f"{_SID_UUID}:1-{n_files - tail}"  # all but the last `tail` txns

    def timed(tag, df):
        t0 = time.time()
        n = df.count()
        dt = round(time.time() - t0, 3)
        print(f"{tag}: {dt}s, {n} rows")
        return dt, n

    # warm-up the python workers / codegen on a small slice
    read_binlog_files(spark, logs, resume_gtid_set=ckpt).count()
    t_full, n_full = timed("full", read_binlog_files(spark, logs))
    t_trim, n_trim = timed(
        "row-trim", resume_after_gtid(read_binlog_files(spark, logs), ckpt)
    )
    t_prune, n_prune = timed(
        "pruned", read_binlog_files(spark, logs, resume_gtid_set=ckpt)
    )
    assert n_trim == n_prune == tail * rows_per
    result = {
        "n_files": n_files,
        "rows_per_file": rows_per,
        "tail_files": tail,
        "t_full_sec": t_full,
        "t_row_trim_sec": t_trim,
        "t_pruned_sec": t_prune,
        "prune_speedup_vs_trim": round(t_trim / t_prune, 2),
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/smoke_gtid_prune_r12.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
