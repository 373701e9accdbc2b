"""Focused tests for the round-14 optimization-round internals.

Each test pins an operator-internal rewrite from the optimization
round to the semantics of the code it replaced:

- session.fan_out: scale-adaptive input-skew guard (guide §2.5) —
  repartitions only when the scan carries fewer partitions than
  defaultParallelism, identity otherwise.
- cluster.connected_components: the fixpoint probe is now an exact
  label-sum scalar aggregate (guide §2.4 — the old probe was a
  join+count of two checkpointed frames); valid because min-label
  propagation is monotone. Exercised on a long-chain graph whose
  diameter far exceeds PROBE_FREE_ROUNDS so the probe loop really
  drives termination.
- curation.quality_filter top_cnt: max token frequency via a sorted
  run-length fold (O(n log n)) must equal the old
  array_distinct × filter count (O(n²)) on every shape that matters.
- vectors._gram_partial: the mapInArrow Gram pass (guide §4.2) must
  recompose, via sa·2³² + sab·2¹⁶ + sb, to the exact integer Gram
  matrix of the quantized vectors, negatives included.
- streaming.near_dedup._admit: the vectorized closed form must match
  the old per-id sorted-scan loop on multi-chunk, duplicate-id, and
  prior-state inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- fan_out


def test_fan_out_repartitions_single_partition_input(spark):
    from replicator_spark.session import fan_out

    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    one = df.coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    out = fan_out(one, spark)
    p = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == p
    # content identical
    assert sorted(r.x for r in out.collect()) == list(range(100))


def test_fan_out_identity_when_input_already_parallel(spark):
    from replicator_spark.session import fan_out

    p = spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(
        [(i,) for i in range(100)], "x long"
    ).repartition(p + 4)
    out = fan_out(df, spark)
    # identity — no extra exchange enters the plan
    assert out is df


def test_fan_out_input_size_derived_width(spark):
    """Iterative-trainer sizing: with input_bytes given, the fan-out
    width is ceil(input_bytes / bytes_per_task), capped at
    defaultParallelism — tiny working sets stop paying per-round
    scheduler latency, big inputs still saturate the cluster."""
    from replicator_spark.session import fan_out

    df = spark.createDataFrame(
        [(i,) for i in range(100)], "x long"
    ).coalesce(1)
    out = fan_out(
        df, spark, input_bytes=300 << 10, bytes_per_task=256 << 10
    )
    assert out.rdd.getNumPartitions() == 2  # ceil(300K/256K)
    assert sorted(r.x for r in out.collect()) == list(range(100))
    # the defaultParallelism cap holds for big inputs
    p = spark.sparkContext.defaultParallelism
    out_big = fan_out(
        df, spark, input_bytes=(p + 50) << 20, bytes_per_task=1 << 20
    )
    assert out_big.rdd.getNumPartitions() == p
    # a scan already wider than the derived width is left alone
    wide = df.repartition(4)
    assert (
        fan_out(
            wide, spark, input_bytes=300 << 10, bytes_per_task=256 << 10
        )
        is wide
    )


def test_km_train_restores_aqe_conf(spark):
    """_no_aqe must restore the session's AQE setting even when the
    loop raises."""
    from replicator_spark.pipeline.vectors import _no_aqe

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    with _no_aqe(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    try:
        with _no_aqe(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


# --------------------------------------- connected_components label-sum


def test_cc_label_sum_probe_terminates_long_chain(spark):
    """A 14-node path graph: diameter 13 >> PROBE_FREE_ROUNDS, so the
    label-sum probe loop must drive propagation to the true fixpoint
    (one hop per round on a path — 13 rounds + 1 confirming round,
    inside the MAX_ITERS=20 cap) and stop exactly when labels
    freeze."""
    from replicator_spark.pipeline.cluster import connected_components

    n = 14
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(chain, "doc_a long, doc_b long")
    out = connected_components(nodes, edges).collect()
    assert {(r.doc_id, r.label) for r in out} == {(i, 0) for i in range(n)}


def test_cc_label_sum_probe_two_components_plus_singleton(spark):
    from replicator_spark.pipeline.cluster import connected_components

    nodes = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, edges).collect()
    got = {(r.doc_id, r.label) for r in out}
    assert got == {
        (0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3), (6, 6)
    }


# ----------------------------------------- quality_filter top_cnt fold


def test_top_cnt_run_fold_matches_naive_count(spark):
    """The sorted run-length fold must equal the old
    array_max(transform(array_distinct, count-per-token)) on every
    token-array shape: all-same, all-distinct, ties, interleaved."""
    cases = [
        ["a"],
        ["a", "a", "a"],
        ["a", "b", "c"],
        ["a", "b", "a", "c", "a", "b"],
        ["z", "y", "z", "y"],
        ["m", "m", "n", "n", "n", "o"],
    ]
    df = spark.createDataFrame([(c,) for c in cases], "toks array<string>")
    _run = lambda acc, t: F.when(  # noqa: E731
        t == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    fold = F.aggregate(
        F.array_sort("toks"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            _run(acc, t).alias("run"),
            F.greatest(acc["best"], _run(acc, t)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    naive = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda t: F.size(F.filter("toks", lambda x: x == t)),
        )
    )
    rows = df.select(fold.alias("fold"), naive.alias("naive")).collect()
    for r in rows:
        assert r.fold == r.naive


# ------------------------------------------------- _gram_partial exact


def _naive_gram(q: np.ndarray):
    g = q.T.astype(object) @ q.astype(object)  # exact big-int products
    s = q.sum(axis=0)
    return g, s


@pytest.mark.parametrize("seed_rows", [(3, 5), (7, 64)])
def test_gram_partial_recomposes_exact(seed_rows):
    from replicator_spark.pipeline.vectors import _gram_partial

    k, d = seed_rows
    # deterministic pseudo-data with negatives and large magnitudes
    # (quantized embeddings are ~1e6-1e9 scale longs)
    q = np.array(
        [
            [((i * 2654435761 + j * 40503) % 2000003) - 1000001
             for j in range(d)]
            for i in range(k)
        ],
        dtype=np.int64,
    ) * 997  # push into the ~1e9 range
    arr = pa.array([row.tolist() for row in q], type=pa.list_(pa.int64()))
    batch = pa.RecordBatch.from_arrays([arr], names=["q"])
    out = list(_gram_partial(iter([batch])))
    assert len(out) == 1
    t = out[0].to_pydict()
    g, s = _naive_gram(q)
    # upper-triangle keys 0..d(d+1)/2-1 in (i, j>=i) row-major order
    idx = 0
    for i in range(d):
        for j in range(i, d):
            pos = t["k"].index(idx)
            got = t["sa"][pos] * 4294967296 + t["sab"][pos] * 65536 \
                + t["sb"][pos]
            assert got == int(g[i][j]), (i, j)
            assert t["n"][pos] == k
            idx += 1
    for dim in range(d):
        pos = t["k"].index(100000 + dim)
        assert t["sx"][pos] == int(s[dim])


def test_gram_partial_multiple_batches_accumulate():
    from replicator_spark.pipeline.vectors import _gram_partial

    d = 4
    q1 = np.array([[1, -2, 3, -4], [5, 6, -7, 8]], dtype=np.int64)
    q2 = np.array([[-9, 10, 11, -12]], dtype=np.int64)

    def mk(q):
        arr = pa.array(
            [row.tolist() for row in q], type=pa.list_(pa.int64())
        )
        return pa.RecordBatch.from_arrays([arr], names=["q"])

    out = list(_gram_partial(iter([mk(q1), mk(q2)])))
    assert len(out) == 1
    t = out[0].to_pydict()
    g, s = _naive_gram(np.vstack([q1, q2]))
    idx = 0
    for i in range(d):
        for j in range(i, d):
            pos = t["k"].index(idx)
            got = t["sa"][pos] * 4294967296 + t["sab"][pos] * 65536 \
                + t["sb"][pos]
            assert got == int(g[i][j])
            assert t["n"][pos] == 3
            idx += 1
    for dim in range(d):
        assert t["sx"][t["k"].index(100000 + dim)] == int(s[dim])


def test_gram_partial_empty_input_yields_nothing():
    from replicator_spark.pipeline.vectors import _gram_partial

    empty = pa.RecordBatch.from_arrays(
        [pa.array([], type=pa.list_(pa.int64()))], names=["q"]
    )
    assert list(_gram_partial(iter([empty]))) == []


# ------------------------------------------------ streaming _admit


class _FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return (self._v,)

    def update(self, t):
        self._v = t[0]


def _admit_reference(rows, prior):
    """The original per-(band,bucket) sorted-scan loop, applied bucket
    by bucket over the shard's rows: walk each bucket's ids ascending,
    admit iff earlier than everything seen for that bucket so far."""
    prev = dict(prior)
    out = []
    for bucket, did in sorted(rows):
        p = prev.get(bucket)
        out.append((bucket, did, p is None or did < p))
        prev[bucket] = did if p is None else min(p, did)
    return out, prev


@pytest.mark.parametrize(
    "rows,prior",
    [
        ([("a", 5), ("a", 3), ("a", 9)], {}),
        ([("a", 5), ("a", 3), ("a", 9)], {"a": 4}),
        ([("a", 5), ("a", 3), ("a", 9)], {"a": 2}),
        ([("a", 7), ("a", 7), ("a", 7)], {}),  # dups: only first admitted
        # several buckets sharing one shard, unordered multi-chunk arrival
        ([("a", 9), ("b", 8), ("a", 2), ("b", 11), ("c", 6)], {}),
        ([("a", 9), ("b", 8), ("a", 2), ("b", 11), ("c", 6)],
         {"a": 1, "c": 100}),
        ([("a", 4)], {"a": 4}),  # equal to prior: not admitted
    ],
)
def test_admit_sharded_matches_per_bucket_rule(rows, prior):
    import pickle

    from replicator_spark.streaming.near_dedup import _admit

    key = (3, 17)
    # split rows into two arrival chunks to exercise the cross-chunk sort
    half = len(rows) // 2
    pdfs = [
        pd.DataFrame(
            {"doc_id": [d for _, d in c], "bucket": [b for b, _ in c]}
        )
        for c in (rows[:half], rows[half:])
        if c
    ]
    state = _FakeState(pickle.dumps(prior) if prior else None)
    got = pd.concat(list(_admit(key, iter(pdfs), state)))
    ref_rows, prev = _admit_reference(rows, prior)
    # emitted rows = input rows (same multiset of doc_ids), band from key
    assert sorted(int(x) for x in got["doc_id"]) == sorted(
        d for _, d in rows
    )
    assert list(got["band"]) == [key[0]] * len(got)
    # the implementation emits in (bucket, doc_id) order — exactly the
    # reference's sorted() order, so verdicts align positionally
    got_adm = [bool(x) for x in got["admitted"]]
    assert got_adm == [adm for _, _, adm in ref_rows]
    assert pickle.loads(state._v) == prev


# ------------------------- _assign/_assign2 broadcast-book equivalence


def _assign_literal_reference(emb, cents):
    """The pre-optimization literal-centroid argmin, verbatim."""
    from pyspark.sql import functions as F

    c_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(x) for x in c]).alias("c"),
            )
            for i, c in enumerate(cents)
        ]
    )
    best = F.array_min(
        F.transform(
            c_lit,
            lambda t: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"), t["c"], lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("d2"),
                t["cid"].alias("cid"),
            ),
        )
    )
    return emb.select(
        "vec_id", "v", best["cid"].alias("cid"), best["d2"].alias("d2")
    )


def test_assign_broadcast_book_bitwise_equals_literal_form(spark):
    from replicator_spark.pipeline.vectors import _assign, _assign2

    cents = [
        [0.125, -3.5, 2.0 / 3.0],
        [1e-9, 4.75, -0.1],
        [0.125, -3.5, 2.0 / 3.0 + 1e-15],  # near-tie with cid 0
    ]
    rows = [
        (0, [0.125, -3.5, 2.0 / 3.0]),          # exact tie cid0 vs cid2
        (1, [100.0, -200.0, 0.5]),
        (2, [1e-9, 4.75, -0.1]),
        (3, [-7.25, 0.0, 9.625]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        r.vec_id: (r.cid, r.d2)
        for r in _assign(emb, cents).collect()
    }
    ref = {
        r.vec_id: (r.cid, r.d2)
        for r in _assign_literal_reference(emb, cents).collect()
    }
    assert got == ref  # same argmin AND bit-identical doubles
    two = {r.vec_id: (r.cid, r.d2, r.d2b) for r in
           _assign2(emb, cents).collect()}
    for vid, (cid, d2) in ref.items():
        assert two[vid][0] == cid and two[vid][1] == d2
        assert two[vid][2] >= two[vid][1]


# ------------------------------- delay_gauge single-pass equivalence


def test_delay_gauge_maxby_matches_join_back_shape(spark):
    """The inlined max_by(ts_ns, txn_id) safe-checkpoint timestamp must
    equal the old join-back-to-base lookup on a stream with holes."""
    from pyspark.sql import functions as F

    from replicator_spark.cdc.checkpoint import _GAP_MOD, _N_SERVERS
    from replicator_spark.cdc.metrics import delay_gauge

    n = 5000
    ev = spark.createDataFrame(
        [(i, 1_700_000_000_000_000_000 + i * 1_000_000) for i in range(n)],
        "event_id long, ts long",
    )
    out = {r.server_uuid: r.asDict() for r in delay_gauge(ev).collect()}
    assert len(out) == _N_SERVERS
    # reference: per server, safe = largest gap-free acked prefix;
    # safe_ts from the (srv, txn) bijection event_id = txn*N + srv
    for srv in range(_N_SERVERS):
        txns = sorted(
            i // _N_SERVERS
            for i in range(n)
            if i % _N_SERVERS == srv and i % _GAP_MOD != 0
        )
        safe = txns[0]
        cnt = 1
        for t in txns[1:]:
            if t == safe + 1:
                safe, cnt = t, cnt + 1
            else:
                break
        r = out[f"srv-{srv:02d}"]
        assert r["safe_checkpoint"] == safe
        assert r["acked_contiguous"] == cnt
        head_txn = max(
            i // _N_SERVERS for i in range(n) if i % _N_SERVERS == srv
        )
        assert r["head_txn"] == head_txn
        head_ts = 1_700_000_000_000_000_000 + (
            head_txn * _N_SERVERS + srv
        ) * 1_000_000
        safe_ts = 1_700_000_000_000_000_000 + (
            safe * _N_SERVERS + srv
        ) * 1_000_000
        assert r["delay_ms"] == (head_ts - safe_ts) // 1_000_000


# ---------------------------------------------------------------- #
# numpy Lloyd-round partials (_km_round_fn / _pq_round_fn)          #
# ---------------------------------------------------------------- #


def test_dec15_10_scaled_matches_spark_cast(spark):
    """The scaled-int fast path + repr fallback must reproduce Spark's
    CAST(double AS DECIMAL(15,10)) on adversarial values: negatives,
    exact .5 boundaries at the 10th place, and values whose binary
    expansion disagrees with the shortest-repr digits near a boundary."""
    from replicator_spark.pipeline.vectors import _dec15_10_scaled

    vals = [
        0.0,
        -0.0,
        1.23456789015,       # boundary .5 at the 11th digit
        -1.23456789015,
        0.00000000005,       # rounds to 1e-10 HALF_UP
        -0.00000000005,
        0.05,
        -17.333333333349999,
        123.45678901234999,
        -123.45678901235001,
        2.5e-10,
        -2.5e-10,
        0.9999999999499999,
        1.00000000005,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    expect = [
        int(r["s"])
        for r in df.select(
            (F.col("x").cast("decimal(15,10)") * F.lit(10**10))
            .cast("long")
            .alias("s")
        ).collect()
    ]
    got = _dec15_10_scaled(np.asarray(vals).reshape(-1, 1))[:, 0]
    assert [int(x) for x in got] == expect


def test_km_round_fn_matches_posexplode_formulation(spark):
    """One numpy Lloyd round (assign + partial sums) must equal the
    pre-optimization posexplode/hash-agg round bit for bit, including
    argmin ties (duplicate centroids) and negative coordinates."""
    import random

    from replicator_spark.pipeline.vectors import (
        _KM_PARTIAL_SCHEMA,
        _assign,
        _km_round_fn,
    )

    rnd = random.Random(14)
    dim = 5
    cents = [[round(rnd.uniform(-2, 2), 3) for _ in range(dim)] for _ in range(3)]
    cents.append(list(cents[0]))  # duplicate centroid: tie must go to cid 0
    rows = [
        (i, [rnd.uniform(-3, 3) for _ in range(dim)]) for i in range(400)
    ] + [(400 + j, list(cents[0])) for j in range(5)]  # exact-tie rows
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>").repartition(4)
    emb = emb.persist()
    try:
        old = (
            _assign(emb, cents)
            .select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(15,10)")).alias("sx"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        old_map = {
            (r["cid"], r["dim"]): (int(r["sx"] * 10**10), r["n"]) for r in old
        }
        new = (
            emb.select("v")
            .mapInArrow(_km_round_fn(cents), _KM_PARTIAL_SCHEMA)
            .groupBy("cid", "dim")
            .agg(
                F.sum(F.col("sx").cast("decimal(38,0)")).alias("sx"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new_map = {
            (r["cid"], r["dim"]): (int(r["sx"]), int(r["n"])) for r in new
        }
        assert new_map == old_map
        # the duplicate centroid (cid 3) must have received NO members
        assert not any(k[0] == 3 for k in new_map)
    finally:
        emb.unpersist()


def test_pq_round_fn_matches_posexplode_formulation(spark):
    """Same contract for the per-subspace PQ round."""
    import random

    from replicator_spark.pipeline.vectors import (
        _PQ_PARTIAL_SCHEMA,
        _pq_assign,
        _pq_round_fn,
    )

    rnd = random.Random(41)
    dim, M, K = 4, 2, 3
    cents = {
        (s, k): [round(rnd.uniform(-1, 1), 3) for _ in range(dim)]
        for s in range(M)
        for k in range(K)
    }
    rows = [
        (i, i % M, [rnd.uniform(-2, 2) for _ in range(dim)])
        for i in range(300)
    ]
    subs = spark.createDataFrame(
        rows, "vec_id long, sub int, subv array<double>"
    ).repartition(3)
    subs = subs.persist()
    try:
        old = (
            _pq_assign(spark, subs, cents)
            .select("sub", "cid", F.posexplode("subv").alias("dim", "x"))
            .groupBy("sub", "cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(15,10)")).alias("sx"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        old_map = {
            (r["sub"], r["cid"], r["dim"]): (int(r["sx"] * 10**10), r["n"])
            for r in old
        }
        new = (
            subs.select("sub", "subv")
            .mapInArrow(_pq_round_fn(cents), _PQ_PARTIAL_SCHEMA)
            .groupBy("sub", "cid", "dim")
            .agg(
                F.sum(F.col("sx").cast("decimal(38,0)")).alias("sx"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new_map = {
            (r["sub"], r["cid"], r["dim"]): (int(r["sx"]), int(r["n"]))
            for r in new
        }
        assert new_map == old_map
    finally:
        subs.unpersist()


# ------------------------------------------------- isotropy partials


def _naive_iso(vs):
    """Reference: the exact per-row sequence the old in-plan HOF ran
    (products, sequential left fold from 0.0, floor-quantize), with
    exact big-int per-dim sums."""
    import math

    d = len(vs[0])
    s = [0] * d
    r = [0] * d
    for v in vs:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        for k, x in enumerate(v):
            q = int(math.floor(x / nrm * 1e9 + 0.5))
            s[k] += q
            r[k] += q * q
    return s, r, len(vs)


def _iso_batch(vs):
    arr = pa.array(
        [list(map(float, v)) for v in vs], type=pa.list_(pa.float64())
    )
    return pa.RecordBatch.from_arrays([arr], names=["v"])


def test_iso_partial_recomposes_exact():
    from replicator_spark.pipeline.vectors import _iso_partial

    # deterministic data with negatives, mixed magnitudes
    vs = [
        [((i * 2654435761 + j * 40503) % 2003 - 1001) / 7.0
         for j in range(16)]
        for i in range(9)
    ]
    out = list(_iso_partial(iter([_iso_batch(vs)])))
    assert len(out) == 1
    t = out[0].to_pydict()
    s, r, n = _naive_iso(vs)
    for dim in range(16):
        pos = t["dim"].index(dim)
        assert t["s"][pos] == s[dim], dim
        got_r = t["rhi"][pos] * 4294967296 + t["rlo"][pos]
        assert got_r == r[dim], dim
        assert t["n"][pos] == n


def test_iso_partial_accumulates_batches_and_skips_empty():
    from replicator_spark.pipeline.vectors import _iso_partial

    vs1 = [[1.0, -2.0, 3.0], [0.5, 0.25, -0.125]]
    vs2 = [[-9.0, 4.0, 1.0]]
    empty = pa.RecordBatch.from_arrays(
        [pa.array([], type=pa.list_(pa.float64()))], names=["v"]
    )
    out = list(
        _iso_partial(iter([_iso_batch(vs1), empty, _iso_batch(vs2)]))
    )
    assert len(out) == 1
    t = out[0].to_pydict()
    s, r, n = _naive_iso(vs1 + vs2)
    assert t["n"] == [3, 3, 3]
    assert t["s"] == s
    assert [h * 4294967296 + l for h, l in zip(t["rhi"], t["rlo"])] == r
    assert list(_iso_partial(iter([empty]))) == []


# ------------------------------------------- JL fidelity partials


def _naive_jl(queries, rows):
    """Reference: the exact pairwise path the old plan ran — JL
    projection and both d² as products-then-sequential-fold, one IEEE
    division per pair, floor fold, min/max."""
    import math

    from replicator_spark.pipeline.vectors import (
        _JL_ROWS,
        _JL_SCALE,
        _jl_proj_py,
    )

    res = {}
    for qid, qv, qy in queries:
        cnt = 0
        sfl = 0
        mn = math.inf
        mx = -math.inf
        for vid, v in rows:
            if vid == qid:
                continue
            y = _jl_proj_py(list(v))
            d2v = 0.0
            for a, b in zip(qv, v):
                d2v = d2v + (a - b) * (a - b)
            if not d2v > 0:
                continue
            d2y = 0.0
            for a, b in zip(qy, y):
                d2y = d2y + (a - b) * (a - b)
            ratio = d2y / d2v
            cnt += 1
            sfl += int(math.floor(ratio * 1e9 + 0.5))
            mn = min(mn, ratio)
            mx = max(mx, ratio)
        if cnt:
            res[qid] = (cnt, sfl, mn, mx)
    return res


def test_jl_partial_matches_pairwise_reference():
    from replicator_spark.pipeline.vectors import (
        _jl_partial_fn,
        _jl_proj_py,
    )

    rows = [
        (
            i,
            [((i * 48271 + j * 16807) % 1009 - 504) / 63.0
             for j in range(64)],
        )
        for i in range(12)
    ]
    rows.append((12, list(rows[3][1])))  # exact duplicate → d2v == 0
    queries = [
        (qid, list(v), _jl_proj_py(list(v)))
        for qid, v in rows
        if qid < 3
    ]
    ids = pa.array([r[0] for r in rows], type=pa.int64())
    vecs = pa.array(
        [r[1] for r in rows], type=pa.list_(pa.float64())
    )
    # split into two batches to exercise cross-batch accumulation
    b1 = pa.RecordBatch.from_arrays([ids[:7], vecs[:7]], ["vec_id", "v"])
    b2 = pa.RecordBatch.from_arrays([ids[7:], vecs[7:]], ["vec_id", "v"])
    out = list(_jl_partial_fn(queries)(iter([b1, b2])))
    assert len(out) == 1
    t = out[0].to_pydict()
    ref = _naive_jl(queries, rows)
    assert sorted(t["query_id"]) == sorted(ref)
    for i, qid in enumerate(t["query_id"]):
        cnt, sfl, mn, mx = ref[qid]
        assert t["n"][i] == cnt
        assert t["sfloor"][i] == sfl
        assert t["minr"][i] == mn
        assert t["maxr"][i] == mx
    # the duplicate pair (query 3's twin) is excluded by d2v > 0, and
    # self-pairs are excluded by id — mirrored by the reference; also
    # check the empty case
    empty = pa.RecordBatch.from_arrays(
        [pa.array([], type=pa.int64()),
         pa.array([], type=pa.list_(pa.float64()))],
        ["vec_id", "v"],
    )
    assert list(_jl_partial_fn(queries)(iter([empty]))) == []


# ------------------------------------------------ covariance partials


def test_cov_partial_matches_decimal_products():
    """_cov_partial's decimal(38,20) partials must equal the exact
    Σ CAST(xi AS DEC(15,10))·CAST(xj AS DEC(15,10)) the old per-row
    explode summed, and the per-dim sums the old posexplode produced."""
    from decimal import ROUND_HALF_UP, Decimal

    from replicator_spark.pipeline.vectors import _cov_partial

    d = 5
    vs = [
        [((i * 2654435761 + j * 40503) % 2003 - 1001) / 977.0
         for j in range(d)]
        for i in range(7)
    ]
    # includes negatives and values near rounding boundaries
    vs[0][0] = 0.00000000005  # exactly .5 at the 10th decimal place
    vs[1][2] = -1.25
    arr = pa.array(vs, type=pa.list_(pa.float64()))
    b1 = pa.RecordBatch.from_arrays([arr[:4]], names=["v"])
    b2 = pa.RecordBatch.from_arrays([arr[4:]], names=["v"])
    out = list(_cov_partial(iter([b1, b2])))
    assert len(out) == 1
    t = out[0].to_pydict()
    q10 = Decimal("1e-10")
    dec = [
        [Decimal(repr(x)).quantize(q10, rounding=ROUND_HALF_UP)
         for x in row]
        for row in vs
    ]
    k = 0
    for i in range(d):
        for j in range(i, d):
            want = sum(row[i] * row[j] for row in dec)
            pos = t["k"].index(k)
            assert t["spp"][pos] == want, (i, j)
            assert t["n"][pos] == len(vs)
            k += 1
    for dim in range(d):
        pos = t["k"].index(100000 + dim)
        assert t["sx"][pos] == sum(row[dim] for row in dec), dim
    # empty input yields nothing
    empty = pa.RecordBatch.from_arrays(
        [pa.array([], type=pa.list_(pa.float64()))], names=["v"]
    )
    assert list(_cov_partial(iter([empty]))) == []
