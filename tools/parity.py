"""Local stand-in for the driver's correctness gate: run each
queries()[name] on Spark and the matching oracle_sql()[name] on DuckDB
over the same sf dir, compare row count + column set + order-insensitive
values.

Usage: python tools/parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    # Mirror the driver's dtype-sensitive hash: ints and floats must NOT
    # collapse to the same string ("107" vs "107.0"), or we mask exactly
    # the DuckDB HUGEINT->float64 mismatches the driver catches.
    # Decimals get their OWN namespace: the r8 sketch_ams_f2 red row
    # proved the driver distinguishes a Spark Decimal('677248') from
    # DuckDB's float64 677248.0 even when values are equal — no green
    # op has ever emitted DecimalType output. Cast decimal outputs to
    # DOUBLE/BIGINT on both sides instead of relying on normalization.
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.9g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"d:{v}"
    except Exception:
        pass
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int) or type(v).__name__ in (
        "int8", "int16", "int32", "int64",
        "uint8", "uint16", "uint32", "uint64",
    ):
        return f"i:{int(v)}"
    return str(v)


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(r[c]) for c in cols)
        for r in df_pandas.to_dict("records")
    ]
    rows.sort()
    return cols, rows


def run(sf_dir: str, only: list[str]) -> int:
    import duckdb

    from replicator_spark import api
    from replicator_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = api.queries(), api.oracle_sql()
    names = only or sorted(qs)
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only (no oracle), rows={len(sdf)}")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            continue
        sc, sr = canon(sdf)
        dc, dr = canon(ddf)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failed.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            failed.append(name)
        elif sr != dr:
            diffs = [
                (a, b) for a, b in zip(sr, dr) if a != b
            ][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(sr)}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    raise SystemExit(run(sf_dir, only))
