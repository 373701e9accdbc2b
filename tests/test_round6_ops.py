"""Sixth batch of operator additions (build round 4): dataset-mixture
weights, token-budget selection, OOV rate, BPE pair induction, the
mergeable quantile-grid sketch, and power-iteration PCA.

Test files are numbered by addition batch, not by the driver's grading
round."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, base, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(os.path.join(base, "documents.parquet"))


# ------------------------------------------------ mixture weights


def test_mixture_weights_sum_to_one(spark, sf_dir):
    from replicator_spark.pipeline.mixture import mixture_weights_query

    rows = mixture_weights_query(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4


def test_mixture_weights_upsample_small_sources(spark, tmp_path):
    """sqrt scaling must give the small source MORE than its raw share
    and the big source LESS — that is the entire point of temperature
    mixing."""
    from replicator_spark.pipeline.mixture import mixture_weights_query

    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [(1, "w " * 99, "en", "big", 10), (2, "w", "en", "small", 1)],
    )
    by_src = {
        r["source"]: r for r in mixture_weights_query(spark, base).collect()
    }
    assert by_src["small"]["weight"] > by_src["small"]["raw_share"]
    assert by_src["big"]["weight"] < by_src["big"]["raw_share"]
    assert by_src["big"]["weight"] > by_src["small"]["weight"]


# ------------------------------------------------ token budget


def test_token_budget_respected_and_greedy(spark, tmp_path):
    from replicator_spark.pipeline.mixture import (
        TOKEN_BUDGET,
        token_budget_query,
    )

    base = str(tmp_path)
    # one source, docs of 600 tokens each: budget 1500 → exactly 2 kept,
    # and they must be the two longest-n_chars ones
    docs = [
        (i, "t " * 600, "en", "s", 1000 - i) for i in range(1, 6)
    ]
    _write_docs(spark, base, docs)
    kept = token_budget_query(spark, base).collect()
    assert {r["doc_id"] for r in kept} == {1, 2}
    assert all(r["cum_tokens"] <= TOKEN_BUDGET for r in kept)


def test_token_budget_per_source_isolation(spark, sf_dir):
    from replicator_spark.pipeline.mixture import (
        TOKEN_BUDGET,
        token_budget_query,
    )

    out = token_budget_query(spark, sf_dir)
    mx = out.groupBy("source").agg(
        F.max("cum_tokens").alias("m")
    ).collect()
    assert mx
    assert all(r["m"] <= TOKEN_BUDGET for r in mx)


# ------------------------------------------------ OOV rate


def test_oov_rate_bounds_and_known_vocab(spark, tmp_path):
    from replicator_spark.pipeline.mixture import oov_rate_query

    base = str(tmp_path)
    # "a" dominates the vocab; a doc of only rare singletons is 100% OOV
    # once the 256-slot vocab is exhausted — build <256 distinct common
    # tokens so the rare ones are all in-vocab instead: use the bound
    # check on the real corpus and an exact check on a tiny one.
    _write_docs(
        spark,
        base,
        [(1, "a a a b", "en", "s", 7), (2, "a b", "en", "s", 3)],
    )
    rows = {r["doc_id"]: r for r in oov_rate_query(spark, base).collect()}
    # only 2 distinct tokens, both within top-256 → zero OOV everywhere
    assert rows[1]["oov_rate"] == 0.0
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["oov_rate"] == 0.0


def test_oov_rate_counts_out_of_vocab(spark, sf_dir):
    from replicator_spark.pipeline.mixture import oov_rate_query

    rows = oov_rate_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]
    # OOV can only exist once the corpus vocabulary overflows the
    # 256-slot vocab (sf0.001's corpus has ~31 distinct tokens — all
    # covered; sf0.01+ overflows)
    from replicator_spark.pipeline.mixture import VOCAB_TOP
    from replicator_spark.pipeline.text import ws_tokens
    from replicator_spark.session import read_table

    n_vocab = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("t"))
        .distinct()
        .count()
    )
    if n_vocab > VOCAB_TOP:
        assert any(r["n_oov"] > 0 for r in rows)
    else:
        assert all(r["n_oov"] == 0 for r in rows)


# ------------------------------------------------ BPE pairs


def test_bpe_pairs_counts_adjacent_chars(spark, tmp_path):
    from replicator_spark.pipeline.mixture import bpe_pairs_query

    base = str(tmp_path)
    _write_docs(
        spark,
        base,
        [(1, "abab ab x", "en", "s", 9)],
    )
    rows = {r["pair"]: r for r in bpe_pairs_query(spark, base).collect()}
    # "abab" → ab, ba, ab; "ab" → ab; "x" contributes nothing
    assert rows["ab"]["n"] == 3
    assert rows["ba"]["n"] == 1
    assert rows["ab"]["rank"] == 1
    assert "x" not in rows


def test_bpe_pairs_topk_ordering(spark, sf_dir):
    from replicator_spark.pipeline.mixture import BPE_TOP, bpe_pairs_query

    rows = bpe_pairs_query(spark, sf_dir).orderBy("rank").collect()
    assert 0 < len(rows) <= BPE_TOP
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


# ------------------------------------------------ quantile grid


def test_quantile_grid_brackets_exact_quantiles(spark, sf_dir):
    """Sketch estimates must land within one bin width of the exact
    per-group percentiles."""
    import duckdb

    from replicator_spark.pipeline.sketches import (
        QG_NB,
        quantile_grid_query,
    )

    est = {
        (r["flag"], r["q"]): r["q_est"]
        for r in quantile_grid_query(spark, sf_dir).collect()
    }
    assert len(est) == 9  # 3 flags × 3 quantiles
    li = os.path.join(sf_dir, "lineitem.parquet")
    exact = duckdb.sql(
        "SELECT l_returnflag f, "
        " quantile_cont(l_extendedprice, 0.5) q50,"
        " quantile_cont(l_extendedprice, 0.9) q90,"
        " quantile_cont(l_extendedprice, 0.99) q99,"
        " max(l_extendedprice) mx, min(l_extendedprice) mn"
        f" FROM '{li}' GROUP BY 1"
    ).fetchall()
    for f_, q50, q90, q99, mx, mn in exact:
        width = (mx - mn) / QG_NB * 1.5  # global range ≥ group range
        assert abs(est[(f_, 0.5)] - q50) <= width * 2
        assert abs(est[(f_, 0.9)] - q90) <= width * 2
        assert abs(est[(f_, 0.99)] - q99) <= width * 2


def test_quantile_grid_monotone(spark, sf_dir):
    from replicator_spark.pipeline.sketches import quantile_grid_query

    rows = quantile_grid_query(spark, sf_dir).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r["flag"], {})[r["q"]] = r["q_est"]
    for flag, qs in by_flag.items():
        assert qs[0.5] <= qs[0.9] <= qs[0.99], (flag, qs)


# ------------------------------------------------ PCA power iteration


def test_pca_power_matches_numpy_eigh(spark, sf_dir):
    np = pytest.importorskip("numpy")
    from replicator_spark.pipeline.vectors import (
        covariance_query,
        pca_power_query,
    )

    out = (
        pca_power_query(spark, sf_dir)
        .orderBy("dim")
        .collect()
    )
    v = np.array([r["loading"] for r in out])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    # reconstruct the same rounded covariance the operator consumed
    tri = covariance_query(spark, sf_dir).collect()
    d = len(out)
    C = np.zeros((d, d))
    for r in tri:
        C[r["di"], r["dj"]] = r["cov"]
        C[r["dj"], r["di"]] = r["cov"]
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    # near-flat spectrum → compare up to the residual the squaring
    # count guarantees (see PCA_SQUARINGS comment)
    assert abs(out[0]["eigenvalue"] - w[-1]) < 1e-4
    assert float(np.max(np.abs(v - top))) < 5e-3


def test_pca_power_deterministic(spark, sf_dir):
    from replicator_spark.pipeline.vectors import pca_power_query

    a = pca_power_query(spark, sf_dir).orderBy("dim").collect()
    b = pca_power_query(spark, sf_dir).orderBy("dim").collect()
    assert a == b


# ------------------------------------------------ snapshot delta


def test_snapshot_delta_kinds_consistent(spark, sf_dir):
    from replicator_spark.sinks.timemachine import snapshot_delta_query

    rows = snapshot_delta_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["change_kind"] in ("ADDED", "REMOVED", "CHANGED")
        if r["change_kind"] == "ADDED":
            # alive at t2 → must have a t2 image (a t1 image may still
            # exist: deleted-before-t1 rows keep their old cells)
            assert (
                r["value_after"] is not None
                or r["props_after"] is not None
            )
        if r["change_kind"] == "REMOVED":
            assert (
                r["value_before"] is not None
                or r["props_before"] is not None
            )
        if r["change_kind"] == "CHANGED":
            assert (
                r["value_before"] != r["value_after"]
                or r["props_before"] != r["props_after"]
            )


def test_snapshot_delta_matches_two_snapshots(spark, sf_dir):
    """The one-scan conditional-aggregate delta must agree with the
    naive two-snapshot full-outer-join on which keys changed."""
    from pyspark.sql import functions as F

    from replicator_spark.sinks.timemachine import (
        DELTA_T1_US,
        asof_snapshot,
        snapshot_delta_query,
        timemachine_cells,
    )

    cells = timemachine_cells(spark, sf_dir)
    s1 = asof_snapshot(cells, DELTA_T1_US).select(
        "table_name", "rowkey",
        F.col("value").alias("v1"), F.col("props").alias("p1"),
    )
    s2 = asof_snapshot(cells).select(
        "table_name", "rowkey",
        F.col("value").alias("v2"), F.col("props").alias("p2"),
    )
    j = s1.join(s2, ["table_name", "rowkey"], "full_outer")
    naive = {
        (r["table_name"], r["rowkey"])
        for r in j.collect()
        if not (
            r["v1"] == r["v2"] and r["p1"] == r["p2"]
        )
    }
    fast = {
        (r["table_name"], r["rowkey"])
        for r in snapshot_delta_query(spark, sf_dir).collect()
    }
    assert fast == naive


# ------------------------------------------------ KS test


def test_ks_test_bounds(spark, sf_dir):
    from replicator_spark.queries.stats import ks_test_query

    (row,) = ks_test_query(spark, sf_dir).collect()
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n1"] > 0 and row["n2"] > 0
    assert row["ks_scaled"] >= row["ks_d"] * 0  # finite, non-negative


def test_ks_identical_distribution_is_zero(spark, tmp_path):
    """Same sample under two labels → D = 0."""
    from replicator_spark.queries.stats import ks_test_query

    base = str(tmp_path)
    rows = []
    for i in range(50):
        rows.append((i, "t", "en", "src0", 100 + (i % 7)))
        rows.append((1000 + i, "t", "en", "src1", 100 + (i % 7)))
    _write_docs(spark, base, rows)
    (out,) = ks_test_query(spark, base).collect()
    assert out["ks_d"] == 0.0


def test_ks_disjoint_distribution_is_one(spark, tmp_path):
    from replicator_spark.queries.stats import ks_test_query

    base = str(tmp_path)
    rows = [(i, "t", "en", "src0", 10) for i in range(20)]
    rows += [(100 + i, "t", "en", "src1", 99999) for i in range(20)]
    _write_docs(spark, base, rows)
    (out,) = ks_test_query(spark, base).collect()
    assert out["ks_d"] == 1.0


# ------------------------------ randomized independent-model checks
#
# One deterministic random corpus (seed 0), each operator compared
# against a pure-Python reference implementation — the same invariant
# a hypothesis sweep would pin, at one Spark roundtrip per operator.


def _random_corpus(n=200, seed=0):
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(n):
        toks = [rng.choice(words) for _ in range(rng.randint(1, 30))]
        text = " ".join(toks)
        rows.append(
            (i, text, "en", f"src{rng.randint(0, 4)}", len(text))
        )
    return rows


def test_token_budget_matches_python_model(spark, tmp_path):
    from replicator_spark.pipeline.mixture import (
        TOKEN_BUDGET,
        token_budget_query,
    )

    rows = _random_corpus()
    base = str(tmp_path)
    _write_docs(spark, base, rows)
    # pure-Python greedy: per source, (n_chars DESC, doc_id ASC), keep
    # while cumulative tokens <= budget
    by_src: dict = {}
    for doc_id, text, _l, src, n_chars in rows:
        by_src.setdefault(src, []).append(
            (doc_id, len(text.split()), n_chars)
        )
    expect = set()
    for src, docs in by_src.items():
        cum = 0
        for doc_id, ntok, _nc in sorted(
            docs, key=lambda d: (-d[2], d[0])
        ):
            cum += ntok
            if cum > TOKEN_BUDGET:
                break
            expect.add(doc_id)
    got = {
        r["doc_id"] for r in token_budget_query(spark, base).collect()
    }
    assert got == expect


def test_mixture_weights_match_python_model(spark, tmp_path):
    import math

    from replicator_spark.pipeline.mixture import mixture_weights_query

    rows = _random_corpus()
    base = str(tmp_path)
    _write_docs(spark, base, rows)
    tok: dict = {}
    for _i, text, _l, src, _n in rows:
        tok[src] = tok.get(src, 0) + len(text.split())
    total = sum(tok.values())
    sc = {s: round(math.sqrt(t / total), 9) for s, t in tok.items()}
    z = sum(sc.values())
    got = {
        r["source"]: r
        for r in mixture_weights_query(spark, base).collect()
    }
    assert set(got) == set(tok)
    for s in tok:
        assert got[s]["n_tokens"] == tok[s]
        assert abs(got[s]["weight"] - sc[s] / z) < 1e-6


def test_quantile_grid_matches_python_model(spark, tmp_path, sf_dir):
    from replicator_spark.pipeline.sketches import (
        QG_NB,
        QG_QS,
        quantile_grid_query,
    )

    import duckdb

    li = os.path.join(sf_dir, "lineitem.parquet")
    vals = [
        (f, x)
        for f, x in duckdb.sql(
            f"SELECT l_returnflag, l_extendedprice FROM '{li}'"
        ).fetchall()
    ]
    mn = min(x for _f, x in vals)
    mx = max(x for _f, x in vals)
    hist: dict = {}
    for f, x in vals:
        b = min(int((x - mn) * QG_NB / (mx - mn)), QG_NB - 1)
        hist.setdefault(f, {})
        hist[f][b] = hist[f].get(b, 0) + 1
    expect = {}
    for f, bins in hist.items():
        n = sum(bins.values())
        for q in QG_QS:
            target = q * n
            cum = 0
            for b in sorted(bins):
                prev = cum
                cum += bins[b]
                if cum >= target:
                    est = mn + (mx - mn) / QG_NB * (
                        b + (target - prev) / bins[b]
                    )
                    expect[(f, q)] = round(est, 6)
                    break
    got = {
        (r["flag"], r["q"]): r["q_est"]
        for r in quantile_grid_query(spark, sf_dir).collect()
    }
    assert got == expect


# ------------------------------------------------ streaming quantile sketch


def test_stream_quantile_sketch_monotone_and_bracketed(spark, sf_dir):
    """Per emitted window: q50 <= q90 <= q99, every estimate within one
    bin width of the exact per-day quantile, and the trailing
    (watermark-withheld) day absent."""
    import duckdb

    from replicator_spark.streaming.job import (
        SKQ_NB,
        SKQ_SPAN,
        stream_quantile_sketch_query,
    )

    rows = stream_quantile_sketch_query(spark, sf_dir).collect()
    assert rows
    by_win: dict = {}
    for r in rows:
        by_win.setdefault(r["window_start_ms"], {})[r["q"]] = r["q_est"]
    width = SKQ_SPAN / SKQ_NB
    for win, qs in by_win.items():
        assert qs[0.5] <= qs[0.9] <= qs[0.99], (win, qs)
    ev = os.path.join(sf_dir, "events.parquet")
    exact = duckdb.sql(
        "SELECT epoch_ms(date_trunc('day', ts)) w,"
        " quantile_cont(value, 0.5) q50, quantile_cont(value, 0.9) q90"
        f" FROM '{ev}' GROUP BY 1"
    ).fetchall()
    exact_by_win = {w: (q50, q90) for w, q50, q90 in exact}
    # emitted windows are a strict prefix: the last day is withheld
    assert set(by_win) < set(exact_by_win)
    for win, qs in by_win.items():
        q50x, q90x = exact_by_win[win]
        # grid target q·n vs quantile_cont's type-7 q·(n-1)+1 index can
        # land the estimate in an adjacent bin at boundaries → 2 widths
        assert abs(qs[0.5] - q50x) <= 2 * width
        assert abs(qs[0.9] - q90x) <= 2 * width


# ------------------------------------------------ containment


def test_containment_detects_subset_jaccard_misses(spark, tmp_path):
    """A short doc fully embedded in a long one: containment(short in
    long) = 1.0 while Jaccard is far below — the asymmetric signal."""
    from replicator_spark.pipeline.dedup import (
        containment_query,
        ngram_jaccard_query,
    )

    base = str(tmp_path)
    short = "alpha beta gamma delta epsilon zeta eta theta"
    long_ = short + " " + " ".join(f"tail{i}" for i in range(40))
    _write_docs(
        spark, base,
        [(1, short, "en", "s", len(short)), (2, long_, "en", "s", len(long_))],
    )
    cont = containment_query(spark, base).collect()
    assert cont, "LSH must propose the embedded pair"
    (r,) = [x for x in cont if {x["doc_a"], x["doc_b"]} == {1, 2}]
    small_side = (
        r["containment_a_in_b"] if r["doc_a"] == 1
        else r["containment_b_in_a"]
    )
    assert small_side == 1.0
    jac = {
        (x["doc_a"], x["doc_b"]): x["jaccard"]
        for x in ngram_jaccard_query(spark, base).collect()
    }
    assert all(v < 0.5 for v in jac.values())


def test_containment_bounds(spark, sf_dir):
    from replicator_spark.pipeline.dedup import containment_query

    for r in containment_query(spark, sf_dir).collect():
        assert 0.0 <= r["containment_a_in_b"] <= 1.0
        assert 0.0 <= r["containment_b_in_a"] <= 1.0


# ------------------------------------------------ k-means


def _numpy_kmeans_replay(sf_dir):
    """Exact replay of the operator's algorithm in pure numpy."""
    import hashlib

    import duckdb
    import numpy as np

    from replicator_spark.pipeline.vectors import KMEANS_ITERS, KMEANS_K

    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in emb]
    X = np.array([r[1] for r in emb], dtype=np.float64)
    seed_order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest(),
    )[:KMEANS_K]
    cents = np.round(X[seed_order], 6)
    for _ in range(KMEANS_ITERS):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # ties → lower cid, same as min-struct
        new = []
        for k in range(KMEANS_K):
            members = X[cid == k]
            if len(members) == 0:
                new.append(cents[k])
            else:
                # decimal-exact sums: components have ≤10 dp, so numpy
                # float64 sums of the (15,10)-quantized values match
                # the engine's decimal path after the 6 dp round
                new.append(np.round(members.sum(0) / len(members), 6))
        cents = np.array(new)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)
    return cid, cents


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    pytest.importorskip("numpy")
    import numpy as np

    from replicator_spark.pipeline.vectors import kmeans_query

    rows = kmeans_query(spark, sf_dir).collect()
    cid, cents = _numpy_kmeans_replay(sf_dir)
    want_sizes = {
        k: int((cid == k).sum()) for k in set(cid.tolist())
    }
    got_sizes = {r["cid"]: r["n_members"] for r in rows}
    assert got_sizes == want_sizes
    for r in rows:
        assert abs(
            r["centroid_norm"]
            - round(float(np.sqrt((cents[r["cid"]] ** 2).sum())), 4)
        ) < 1e-3


def test_kmeans_deterministic_and_partitions_all(spark, sf_dir):
    from replicator_spark.pipeline.vectors import kmeans_query

    a = sorted(tuple(r) for r in kmeans_query(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in kmeans_query(spark, sf_dir).collect())
    assert a == b
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{os.path.join(sf_dir, 'embeddings.parquet')}'"
    ).fetchone()[0]
    # every vector lands in exactly one cluster
    assert sum(x[1] for x in a) == n


# ------------------------------------------------ product quantization


def test_pq_codes_match_numpy_replay(spark, sf_dir):
    pytest.importorskip("numpy")
    import hashlib

    import duckdb
    import numpy as np

    from replicator_spark.pipeline.vectors import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        pq_codes_query,
    )

    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in emb]
    X = np.array([r[1] for r in emb], dtype=np.float64)
    d_sub = X.shape[1] // PQ_M
    codes = {}
    errs = {}
    for s in range(PQ_M):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        order = sorted(
            range(len(ids)),
            key=lambda i: hashlib.md5(
                f"{s}:{ids[i]}".encode()
            ).hexdigest(),
        )[:PQ_K]
        cents = np.round(Xs[order], 6)
        for _ in range(PQ_ITERS):
            d2 = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cid = d2.argmin(axis=1)
            new = []
            for k in range(PQ_K):
                m = Xs[cid == k]
                new.append(
                    cents[k] if len(m) == 0
                    else np.round(m.sum(0) / len(m), 6)
                )
            cents = np.array(new)
        d2 = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)
        for i, v in enumerate(ids):
            codes.setdefault(v, []).append(int(cid[i]))
            errs[v] = errs.get(v, 0.0) + round(float(d2[i, cid[i]]), 9)
    want = {
        v: "".join(format(c, "X") for c in cs) for v, cs in codes.items()
    }
    got = {
        r["vec_id"]: (r["pq_code"], r["recon_err"])
        for r in pq_codes_query(spark, sf_dir).collect()
    }
    assert {v: g[0] for v, g in got.items()} == want
    for v, (_, e) in got.items():
        assert abs(e - errs[v]) < 1e-5


def test_pq_codes_deterministic(spark, sf_dir):
    from replicator_spark.pipeline.vectors import pq_codes_query

    a = sorted(tuple(r) for r in pq_codes_query(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in pq_codes_query(spark, sf_dir).collect())
    assert a == b


# ------------------------------------------------ ADC search


def test_adc_topk_matches_numpy_replay(spark, sf_dir):
    pytest.importorskip("numpy")
    import hashlib

    import duckdb
    import numpy as np

    from replicator_spark.pipeline.vectors import (
        ADC_QUERIES,
        ADC_TOPK,
        PQ_ITERS,
        PQ_K,
        PQ_M,
        adc_topk_query,
    )

    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in emb]
    X = np.array([r[1] for r in emb], dtype=np.float64)
    d_sub = X.shape[1] // PQ_M
    cents = {}
    codes = np.zeros((len(ids), PQ_M), dtype=int)
    for s in range(PQ_M):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        order = sorted(
            range(len(ids)),
            key=lambda i: hashlib.md5(
                f"{s}:{ids[i]}".encode()
            ).hexdigest(),
        )[:PQ_K]
        C = np.round(Xs[order], 6)
        for _ in range(PQ_ITERS):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cid = d2.argmin(axis=1)
            C = np.array(
                [
                    C[k] if (cid == k).sum() == 0
                    else np.round(Xs[cid == k].sum(0) / (cid == k).sum(), 6)
                    for k in range(PQ_K)
                ]
            )
        d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
        cents[s] = C
    idx = {v: i for i, v in enumerate(ids)}
    want = {}
    for q in ADC_QUERIES:
        qv = X[idx[q]]
        # sequential per-subspace fold, same order as the operator
        adc = np.zeros(len(ids))
        for s in range(PQ_M):
            qs = qv[s * d_sub : (s + 1) * d_sub]
            lut = ((cents[s] - qs) ** 2).sum(axis=1)
            adc = adc + lut[codes[:, s]]
        ranked = sorted(range(len(ids)), key=lambda i: (adc[i], ids[i]))
        want[q] = [ids[i] for i in ranked[:ADC_TOPK]]
    got: dict = {}
    for r in adc_topk_query(spark, sf_dir).orderBy(
        "query_id", "rank"
    ).collect():
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got == want


def test_adc_topk_self_match(spark, sf_dir):
    """Each probe's own code reconstructs to a small distance — the
    probe must appear in its own top-k (sanity of the whole chain)."""
    from replicator_spark.pipeline.vectors import adc_topk_query

    by_q: dict = {}
    for r in adc_topk_query(spark, sf_dir).collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q, members in by_q.items():
        assert q in members
