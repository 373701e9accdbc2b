"""Multi-micro-batch binlog streaming smoke (round-14 verdict task #4):
the composed topology — rotated binlog files -> byte-walk decode ->
envelope (wire before-image fallback across batch boundaries) ->
time-machine cells — driven with maxFilesPerTrigger bounding each
micro-batch, so one availableNow run produces MANY batches over the
same directory a single-batch run drains at once.

Checks (at sf0.01-derived logs):
- epochs > 1 (the multi-batch path actually ran)
- the union of per-epoch cells row-counts the single-batch twin
- wall time scales with total files, not with batch count (the
  per-batch fixed cost stays small against decode work)

Usage: python tools/smoke_multibatch.py [sf_dir] [files_per_trigger]
Writes artifacts/smoke_multibatch_r14.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from replicator_spark.runner import run_stream  # noqa: E402
from replicator_spark.session import get_spark, prep  # noqa: E402
from tools.smoke_binlog_stream import build_logs  # noqa: E402


def timed_stream(spark, logs_dir: str, tag: str, mfpt=None):
    out = f"/tmp/multibatch_smoke/out_{tag}"
    ckpt = f"/tmp/multibatch_smoke/ckpt_{tag}"
    for d in (out, ckpt):
        if os.path.exists(d):
            shutil.rmtree(d)
    cfg = {
        "source.type": "binlog_files",
        "source.binlog.path": logs_dir,
        "applier.type": "timemachine",
        "source.binlog.max_files_per_trigger": mfpt,
    }
    t0 = time.time()
    run_stream(spark, None, cfg, out, ckpt)
    dt = time.time() - t0
    epochs = len([d for d in os.listdir(out) if d.startswith("epoch=")])
    n = spark.read.parquet(out).count()
    print(f"{tag}: {dt:.3f}s, {n} cells, {epochs} epochs")
    return round(dt, 3), n, epochs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mfpt = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    prep(spark)
    base = "/tmp/multibatch_smoke"
    n_files = build_logs(spark, sf_dir, f"{base}/logs", 10)
    timed_stream(spark, f"{base}/logs", "warmup")  # cold paths
    t1, n1, e1 = timed_stream(spark, f"{base}/logs", "single")
    tm, nm, em = timed_stream(spark, f"{base}/logs", "multi", mfpt=mfpt)
    result = {
        "sf_dir": sf_dir,
        "files": n_files,
        "max_files_per_trigger": mfpt,
        "cells_single": n1,
        "cells_multi": nm,
        "epochs_single": e1,
        "epochs_multi": em,
        "t_single": t1,
        "t_multi": tm,
        "overhead_ratio": round(tm / t1, 2) if t1 else None,
        "cells_equal": n1 == nm,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/smoke_multibatch_r14.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
