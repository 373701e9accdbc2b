"""Iterative graph analytics on DataFrames: fixed-iteration PageRank
over the customer<->supplier trade graph (an edge per distinct
(customer, supplier) trading pair from orders x lineitem, materialized
in both directions so the walk is over the undirected trade network).

Scale shape per iteration: one equi-join edges⨝ranks on src + one
groupBy(dst) — the classic Pregel superstep expressed as DataFrame
ops. The edge list is the big side and keeps a STABLE partitioning on
src across iterations (Spark reuses the exchange); ranks (one row per
node) is the small side — at 100 TB of edges the node table is still
orders of magnitude smaller and usually broadcast-able. Iteration
count is fixed (3) so the whole computation is ONE lazy plan; a
long-running job would checkpoint ranks every ~5 iterations to cut
lineage, which is an operational knob, not a plan change.

Determinism: ranks are doubles; per-iteration sums are order-dependent
in the last ulp, so results are rounded to 6 dp — divergence after 3
iterations is bounded far below that (~1e-12 relative).

Cites: connected-components cousin in `pipeline/cluster.py`; the
reference has no graph ops (SURVEY §2.11 absent-list) — this is part
of the beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prep, read_table

N_ITER = 3
DAMPING = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct trade pairs as directed edges, both directions."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    )
    rev = pairs.select(
        F.col("snode").alias("src"), F.col("cnode").alias("dst")
    )
    return fwd.unionByName(rev)


def pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    # Persist the loop-invariant relations: a fully lazy plan would
    # re-derive the edges subtree (scan + join + distinct) once per
    # iteration per consumer — 8+ scans of the fact table. With the
    # cache, the plan is ONE edges computation + per-iteration
    # join/agg over the in-memory relation (MEMORY_AND_DISK: spills
    # instead of OOMing when the edge list outgrows executor memory).
    edges = _edges(spark, sf_dir).persist()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().persist()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(N_ITER):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(1.0 - DAMPING)
                + F.lit(DAMPING) * F.coalesce("m", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
    SELECT n.node,
        {1.0 - DAMPING} + {DAMPING} * COALESCE(s.m, 0.0) AS rank
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / o.deg) AS m
        FROM edges e
        JOIN outdeg o ON e.src = o.src
        JOIN {prev} r ON e.src = r.node
        GROUP BY e.dst
    ) s ON n.node = s.node
)"""


PAGERANK_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cnode,
        's:' || CAST(l.l_suppkey AS VARCHAR) AS snode
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT cnode AS src, snode AS dst FROM pairs
    UNION ALL
    SELECT snode AS src, cnode AS dst FROM pairs
),
outdeg AS (
    SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
{_iter_sql("r0", "r1")},
{_iter_sql("r1", "r2")},
{_iter_sql("r2", "r3")}
SELECT node, round(rank, 6) AS rank FROM r3
"""


# ------------------------------------------------------------- triangles
#
# Triangle count + global clustering coefficient over the part
# co-purchase graph (parts are adjacent iff they appear in ≥
# TRI_SUPPORT common orders; the trade graph above is bipartite and
# triangle-free by construction, so the unipartite projection is the
# interesting graph). Edges are kept in canonical a<b orientation, so
# each triangle is enumerated exactly once as a<b<c by two equi-joins
# — never a cartesian. At 100 TB the standard refinement is to orient
# each edge from lower- to higher-DEGREE endpoint (cuts the join
# fan-out on hub nodes to O(m^1.5) work); id-orientation here keeps
# the oracle identical while the join topology is the same.

TRI_SUPPORT = 2


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                """flatten(transform(parts, (x, i) ->
                    transform(slice(parts, i + 2, size(parts) - i - 1),
                              y -> struct(x AS a, y AS b))))"""
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("s"))
        .where(F.col("s") >= TRI_SUPPORT)
        .select("a", "b")
    )


def triangles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    return (
        deg.agg(F.count("*").alias("n_nodes"))
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri.agg(F.count("*").alias("n_triangles")))
        .crossJoin(wedges)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coef"),
        )
    )


# ------------------------------------------------ degree assortativity
#
# Degree-degree Pearson correlation over the symmetrized co-purchase
# edge list — do high-degree products co-occur with other high-degree
# products (r > 0, hub-clustered catalog) or with the long tail
# (r < 0, hub-and-spoke)? This is the degree-degree variant of Newman's
# assortativity (plain degrees, not remaining degrees — documented
# choice, deterministic either way).
#
# Shape: the degree table is node-sized (tiny next to edges), joined
# twice onto the directed edge list — AQE broadcasts it — then one
# combiner-backed moment agg. Degrees are integers, so the five moment
# sums are DECIMAL-exact and order-free; the final ratio is one double
# expression on identical inputs in both engines.


def assortativity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    # persisted: the symmetrized union + degree agg + probe join
    # otherwise re-run the whole basket-explode edge build once per
    # branch (r8 scan audit: 6 lineitem scans -> 1)
    e = _copurchase_edges(spark, sf_dir).persist()
    # symmetrize: each undirected edge contributes both (a,b) and (b,a),
    # so every endpoint appears once per incidence (the standard sum
    # over edge ENDS)
    both = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        both.groupBy("a")
        .agg(F.count("*").alias("d"))
        .select(F.col("a").alias("n"), "d")
    )
    dx = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    dy = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    j = both.join(F.broadcast(dx), "a").join(F.broadcast(dy), "b")
    agg = j.agg(
        F.count("*").alias("m"),
        F.sum(F.col("da").cast("decimal(20,0)")).alias("sx"),
        F.sum(F.col("db").cast("decimal(20,0)")).alias("sy"),
        F.sum(
            F.col("da").cast("decimal(20,0)") * F.col("db").cast("decimal(18,0)")
        ).alias("sxy"),
        F.sum(
            F.col("da").cast("decimal(20,0)") * F.col("da").cast("decimal(18,0)")
        ).alias("sxx"),
        F.sum(
            F.col("db").cast("decimal(20,0)") * F.col("db").cast("decimal(18,0)")
        ).alias("syy"),
    )
    md = F.col("m").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (md * sxy - sx * sy) / F.sqrt(
        (md * sxx - sx * sx) * (md * syy - sy * sy)
    )
    return agg.select(
        F.col("m").alias("n_edge_ends"),
        F.round(r, 6).alias("assortativity"),
    )


ASSORTATIVITY_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS n, COUNT(*) AS d FROM sym GROUP BY a),
j AS (
    SELECT CAST(dx.d AS DECIMAL(20,0)) AS da,
           CAST(dy.d AS DECIMAL(20,0)) AS db
    FROM sym JOIN deg dx ON sym.a = dx.n JOIN deg dy ON sym.b = dy.n
),
agg AS (
    SELECT COUNT(*) AS m, SUM(da) AS sx, SUM(db) AS sy,
        SUM(da * db) AS sxy, SUM(da * da) AS sxx, SUM(db * db) AS syy
    FROM j
)
SELECT CAST(m AS BIGINT) AS n_edge_ends,
    round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS assortativity
FROM agg
"""


TRIANGLES_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
tri AS (
    SELECT COUNT(*) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3
      ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
    SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b FROM e
    ) GROUP BY n
),
wed AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
    (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles,
    n_wedges,
    round(CASE WHEN n_wedges > 0
               THEN 3.0 * (SELECT n_triangles FROM tri) / n_wedges
               ELSE 0.0 END, 6) AS clustering_coef
FROM wed
"""


# ------------------------------------------------ k-core peeling
#
# Bounded-round k-core decomposition of the co-purchase graph: each
# round removes every node whose degree in the SURVIVING subgraph is
# < KCORE_K. After enough rounds the survivors are exactly the k-core;
# a FIXED round count (KCORE_ROUNDS) keeps the whole computation one
# deterministic lazy plan mirrored by unrolled SQL CTEs — the same
# fixed-iteration contract as PageRank above. The emitted per-round
# survivor trajectory is itself the diagnostic (how fast the periphery
# peels); production would loop to fixpoint with a count-delta stop,
# an operational knob, not a plan change.
#
# Scale per round: two node⨝edge equi-joins (node side is the small
# one — broadcast via AQE) + one combiner-backed degree agg. The edge
# list is persisted once; rounds never rescan the fact table.

KCORE_K = 3
KCORE_ROUNDS = 3


def kcore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    alive = sym.select(F.col("a").alias("n")).distinct()
    out = [
        alive.agg(F.count("*").alias("n_alive")).select(
            F.lit(0).alias("round"), "n_alive"
        )
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        surv = sym.join(
            alive.select(F.col("n").alias("a")), "a"
        ).join(alive.select(F.col("n").alias("b")), "b")
        # localCheckpoint per round: the survivor-count branches below
        # are separate plan trees — without truncation round i's branch
        # re-runs every earlier peel (cluster.py's lineage lesson;
        # measured 11.8 s → 6 s at sf0.1). LAZY since the r14
        # optimization round: the final union action materializes the
        # whole checkpoint chain in ONE job (stage graph dedupes the
        # shared alive_i RDDs), instead of paying one eager
        # materialization job per peel round.
        alive = (
            surv.groupBy("a")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select(F.col("a").alias("n"))
            .localCheckpoint(eager=False)
        )
        out.append(
            alive.agg(F.count("*").alias("n_alive")).select(
                F.lit(i).alias("round"), "n_alive"
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def _kcore_round_sql(prev: str, cur_e: str, cur_a: str) -> str:
    return f"""{cur_e} AS (
    SELECT s.a, s.b FROM sym s
    JOIN {prev} x ON s.a = x.n JOIN {prev} y ON s.b = y.n
),
{cur_a} AS (
    SELECT a AS n FROM {cur_e} GROUP BY a HAVING COUNT(*) >= {KCORE_K}
)"""


KCORE_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
a0 AS (SELECT DISTINCT a AS n FROM sym),
{_kcore_round_sql("a0", "e1", "a1")},
{_kcore_round_sql("a1", "e2", "a2")},
{_kcore_round_sql("a2", "e3", "a3")}
SELECT 0 AS round, CAST(COUNT(*) AS BIGINT) AS n_alive FROM a0
UNION ALL SELECT 1, CAST(COUNT(*) AS BIGINT) FROM a1
UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM a2
UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM a3
"""


# ------------------------------------------- label propagation (LPA)
#
# Synchronous label-propagation community detection over the
# co-purchase graph — the missing member of the graph family
# (pagerank = centrality, triangles = clustering, kcore = density,
# LPA = COMMUNITIES). Init: every node labels itself; each round every
# node adopts the most frequent label among its neighbors (ties break
# to the SMALLEST label — the determinism armor plain LPA lacks);
# LPA_ROUNDS fixed rounds, no data-dependent stopping.
#
# Scale shape per round: one equi-join edges⨝labels on the neighbor
# endpoint + one (node, label) combiner-backed count + one per-node
# argmax — the Pregel superstep as DataFrame ops, same as pagerank's.
# Labels are one row per node (edges >> nodes at 100 TB); the edge
# list keeps a stable partitioning across rounds and is persisted.
#
# Determinism: integer vote counts (order-free), integer labels,
# min-struct argmax with the exact tie order ROW_NUMBER (c DESC,
# label ASC) uses in the oracle — bit-identical rounds.

LPA_ROUNDS = 3


def _lpa_labels(sym: DataFrame) -> DataFrame:
    """LPA_ROUNDS synchronous label-propagation supersteps over the
    symmetric edge list; returns (node, label). Shared by the
    community query and the modularity audit so both score the SAME
    partition."""
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.groupBy("a")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("neg"),
                        F.col("label").alias("lbl"),
                    )
                ).alias("m")
            )
            .select(
                F.col("a").alias("node"), F.col("m.lbl").alias("label")
            )
        )
    return labels


def label_propagation_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    comm = _lpa_labels(sym).select(
        "node", F.col("label").alias("community")
    )
    sizes = comm.groupBy("community").agg(
        F.count("*").alias("community_size")
    )
    return comm.join(sizes, "community").select(
        "node", "community", "community_size"
    )


def _lpa_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
    SELECT a AS node, label FROM (
        SELECT a, label, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY c DESC, label ASC) AS rn
        FROM (
            SELECT s.a, l.label, COUNT(*) AS c
            FROM sym s JOIN {prev} l ON s.b = l.node
            GROUP BY s.a, l.label
        )
    ) WHERE rn = 1
)"""


# shared LPA CTE chain (edges → symmetric list → 3 supersteps →
# communities); both the community listing and the modularity audit
# select from it
_LPA_PREFIX_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
{_lpa_round_sql("l0", "l1")},
{_lpa_round_sql("l1", "l2")},
{_lpa_round_sql("l2", "l3")},
comm AS MATERIALIZED (
    SELECT node, label AS community FROM l3
)"""

LABEL_PROPAGATION_SQL = f"""{_LPA_PREFIX_SQL}
SELECT c.node, c.community, s.community_size
FROM comm c JOIN (
    SELECT community, CAST(COUNT(*) AS BIGINT) AS community_size
    FROM comm GROUP BY community
) s USING (community)
"""


# ------------------------------------------ community modularity
#
# Newman modularity decomposition of the LPA partition: per
# community c, Q_c = L_c/m − (D_c/2m)² where L_c = intra-community
# edges, D_c = total degree of its nodes, m = edges. Σ Q_c is the
# chain's modularity — the "are these communities real structure or
# noise" score (Q ≈ 0: no better than random; Q ≳ 0.3: strong).
# Scores the partition graph_label_propagation emits.
#
# Scale: two equi-joins of the edge list against the (node,
# community) map — linear in edges, shuffled on node keys — then
# |communities|-bounded aggregation; m is a 1-row broadcast.
# Determinism: every input to the Q formula is an exact integer;
# the double expression is written identically in both engines.


def modularity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    comm = (
        _lpa_labels(sym)
        .select("node", F.col("label").alias("community"))
        .persist()  # reused by the degree and both endpoint joins
    )
    deg = (
        sym.groupBy("a")
        .agg(F.count("*").alias("degree"))
        .withColumnRenamed("a", "node")
    )
    m = e.agg(F.count("*").alias("m_edges"))
    dc = (
        comm.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("degree").alias("degree_sum"),
        )
    )
    ca = comm.select(
        F.col("node").alias("a"), F.col("community").alias("ca")
    )
    cb = comm.select(
        F.col("node").alias("b"), F.col("community").alias("cb")
    )
    lc = (
        e.join(ca, "a")
        .join(cb, "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy("ca")
        .agg(F.count("*").alias("intra_edges"))
        .withColumnRenamed("ca", "community")
    )
    intra = F.coalesce(F.col("intra_edges"), F.lit(0))
    dfrac = F.col("degree_sum").cast("double") / (
        F.lit(2) * F.col("m_edges")
    )
    return (
        dc.join(lc, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            intra.cast("long").alias("intra_edges"),
            (
                F.round(
                    intra.cast("double") / F.col("m_edges")
                    - dfrac * dfrac,
                    6,
                )
                + F.lit(0.0)  # −0.0 → +0.0 (cross-engine canon)
            ).alias("q_contrib"),
        )
    )


MODULARITY_SQL = f"""{_LPA_PREFIX_SQL},
deg AS (SELECT a AS node, COUNT(*) AS degree FROM sym GROUP BY a),
m AS (SELECT COUNT(*) AS m_edges FROM e),
dc AS (
    SELECT c.community, COUNT(*) AS n_nodes,
        SUM(d.degree) AS degree_sum
    FROM comm c JOIN deg d USING (node)
    GROUP BY c.community
),
lc AS (
    SELECT ca.community, COUNT(*) AS intra_edges
    FROM e JOIN comm ca ON e.a = ca.node
           JOIN comm cb ON e.b = cb.node
    WHERE ca.community = cb.community
    GROUP BY ca.community
)
SELECT d.community,
    CAST(d.n_nodes AS BIGINT) AS n_nodes,
    CAST(d.degree_sum AS BIGINT) AS degree_sum,
    CAST(COALESCE(l.intra_edges, 0) AS BIGINT) AS intra_edges,
    round(CAST(COALESCE(l.intra_edges, 0) AS DOUBLE) / m_edges
          - (CAST(d.degree_sum AS DOUBLE) / (2 * m_edges))
            * (CAST(d.degree_sum AS DOUBLE) / (2 * m_edges)),
          6) + 0.0 AS q_contrib
FROM dc d LEFT JOIN lc l USING (community) CROSS JOIN m
"""


# ------------------------------------------------ link prediction
#
# Common-neighbors / Jaccard link prediction over the co-purchase
# graph: for every NON-adjacent pair (u, w) sharing at least one
# neighbor, cn = |N(u) ∩ N(w)| and jaccard = cn / (|N(u)| + |N(w)|
# − cn); the LP_TOP highest-scored pairs are the "products most
# likely to be bought together next" recommendation seed.
#
# Scale: wedge enumeration (two equi-joins of the symmetric edge
# list through the shared middle node) — Σ_m deg(m)² rows, the same
# propose shape as the triangle counter; at 100 TB the standard
# refinement is capping/salting hub middles (documented at the
# triangle op), never a cartesian. The degree table is node-sized
# and broadcasts; the final top-N is TakeOrderedAndProject.
# Determinism: cn/degrees are exact integers; jaccard is one IEEE
# division on identical inputs; (u, w) breaks every tie totally.

LP_TOP = 20


def link_prediction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    s1 = sym.select(F.col("a").alias("m"), F.col("b").alias("u"))
    s2 = sym.select(F.col("a").alias("m"), F.col("b").alias("w"))
    cn = (
        s1.join(s2, "m")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("cn"))
    )
    nonadj = cn.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "anti",
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("d"))
    du = deg.select(F.col("a").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("a").alias("w"), F.col("d").alias("dw"))
    scored = (
        nonadj.join(F.broadcast(du), "u")
        .join(F.broadcast(dw), "w")
        .select(
            "u",
            "w",
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dw") - F.col("cn")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("cn").desc(), "u", "w"
    ).limit(LP_TOP)


LINK_PREDICTION_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
cn AS (
    SELECT s1.b AS u, s2.b AS w, COUNT(*) AS cn
    FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
    GROUP BY 1, 2
),
nonadj AS (
    SELECT u, w, cn FROM cn
    WHERE NOT EXISTS (
        SELECT 1 FROM e WHERE e.a = cn.u AND e.b = cn.w)
),
deg AS (SELECT a AS n, COUNT(*) AS d FROM sym GROUP BY a)
SELECT u, w, CAST(cn AS BIGINT) AS cn,
    round(CAST(cn AS DOUBLE)
          / CAST(du.d + dw.d - cn AS DOUBLE), 6) AS jaccard
FROM nonadj JOIN deg du ON nonadj.u = du.n
            JOIN deg dw ON nonadj.w = dw.n
ORDER BY jaccard DESC, cn DESC, u, w
LIMIT {LP_TOP}
"""


# ------------------------------------------ power-law degree fit
#
# Clauset-Shalizi-Newman continuous-MLE exponent for the degree
# distribution tail: alpha = 1 + n / sum(ln(deg / (xmin - 0.5)))
# over nodes with deg >= xmin. The scale-free-ness diagnostic that
# tells you whether hub-capped plans (triangles/link-prediction) are
# load-bearing on this graph. Public method: Clauset, Shalizi &
# Newman 2009, "Power-law distributions in empirical data".
#
# Scale: degree agg is node-keyed (combiner-backed); everything after
# runs over the node-degree table and reduces to ONE row — no
# windows, no joins. Determinism: ln rounded to 9 dp summed as
# DECIMAL (order-exact), final ratio in doubles.

PL_XMIN = 2


def degree_powerlaw_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    deg = (
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
    )
    lnterm = F.round(
        F.log(F.col("deg").cast("double") / F.lit(float(PL_XMIN) - 0.5)),
        9,
    ).cast("decimal(20,9)")
    return deg.agg(
        F.count("*").alias("n_nodes"),
        F.max("deg").alias("max_deg"),
        F.sum(F.when(F.col("deg") >= PL_XMIN, 1).otherwise(0)).alias(
            "n_tail"
        ),
        F.sum(F.when(F.col("deg") >= PL_XMIN, lnterm)).alias("_sl"),
    ).select(
        F.lit(PL_XMIN).alias("xmin"),
        "n_nodes",
        "max_deg",
        "n_tail",
        F.round(
            F.lit(1.0)
            + F.col("n_tail").cast("double")
            / F.col("_sl").cast("double"),
            6,
        ).alias("alpha"),
    )


DEGREE_POWERLAW_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cnode,
        's:' || CAST(l.l_suppkey AS VARCHAR) AS snode
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT cnode AS src, snode AS dst FROM pairs
    UNION ALL
    SELECT snode AS src, cnode AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
SELECT {PL_XMIN} AS xmin,
    CAST(COUNT(*) AS BIGINT) AS n_nodes,
    CAST(MAX(deg) AS BIGINT) AS max_deg,
    CAST(SUM(CASE WHEN deg >= {PL_XMIN} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_tail,
    round(1.0e0 + CAST(SUM(CASE WHEN deg >= {PL_XMIN} THEN 1 ELSE 0 END)
                       AS DOUBLE)
        / CAST(SUM(CASE WHEN deg >= {PL_XMIN} THEN
              CAST(round(ln(CAST(deg AS DOUBLE) / {float(PL_XMIN) - 0.5}e0),
                         9) AS DECIMAL(20,9)) END) AS DOUBLE),
        6) AS alpha
FROM deg
"""


# ------------------------------------- connected components (HashMin)
#
# Synchronous min-label propagation ("HashMin") over the co-purchase
# graph: every node starts labeled with itself; each superstep every
# node takes the min of its own label and its neighbors' labels.
# After CC_ROUNDS supersteps, labels identify components whose
# graph diameter is <= CC_ROUNDS (the fixed-horizon contract
# graph_label_propagation / graph_pagerank already pin: a constant
# number of linear supersteps, never run-to-convergence). Reported
# per component: its min-node id (the label) and size.
#
# Scale: each superstep is one edge⋈label equi-join + a node-keyed
# min agg — linear in edges, shuffled on node keys; the edge list is
# persisted once (the pagerank pattern). Rounds double-reference the
# previous level, so the oracle marks every level MATERIALIZED.
# Determinism: min over integers — wholly order-free.

CC_ROUNDS = 6


def connected_components_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prep(spark)
    e = _copurchase_edges(spark, sf_dir).persist()
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    # self-loops fold "keep my own label" into the SAME join as the
    # neighbor min, so each superstep references the previous label
    # table exactly ONCE — a double reference (left-join + neighbor
    # derivation) doubles the unshared plan subtree per round, 2^R
    # copies of the base by round R (caught by the round-9 smoke:
    # 18 s -> ~2 s after this rewrite)
    sym2 = sym.unionAll(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b"))
    ).persist()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(CC_ROUNDS):
        labels = (
            sym2.join(labels, sym2.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("label"))
            .select(F.col("a").alias("node"), "label")
        )
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count("*").alias("n_nodes")
    )


def _cc_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS MATERIALIZED (
    SELECT s.a AS node, MIN(p.label) AS label
    FROM sym2 s JOIN {prev} p ON s.b = p.node
    GROUP BY s.a
)"""


_CC_STEPS = ",\n".join(
    _cc_round_sql(f"c{k}", f"c{k + 1}") for k in range(CC_ROUNDS)
)

CONNECTED_COMPONENTS_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRI_SUPPORT}
),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
sym2 AS MATERIALIZED (
    SELECT a, b FROM sym
    UNION ALL SELECT DISTINCT a, a FROM sym
),
c0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
{_CC_STEPS}
SELECT label AS component, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM c{CC_ROUNDS} GROUP BY label
"""


REGISTRY = [
    ("graph_pagerank", pagerank_query, PAGERANK_SQL),
    ("graph_triangles", triangles_query, TRIANGLES_SQL),
    ("graph_assortativity", assortativity_query, ASSORTATIVITY_SQL),
    ("graph_kcore", kcore_query, KCORE_SQL),
    # synchronous LPA communities (fixed rounds, min-label ties)
    ("graph_label_propagation", label_propagation_query,
     LABEL_PROPAGATION_SQL),
    # Newman modularity decomposition of the LPA partition
    ("graph_modularity", modularity_query, MODULARITY_SQL),
    # common-neighbors / Jaccard link prediction (top pairs)
    ("graph_link_prediction", link_prediction_query,
     LINK_PREDICTION_SQL),
    # Clauset-Shalizi-Newman power-law degree exponent (round 8)
    ("graph_degree_powerlaw", degree_powerlaw_query,
     DEGREE_POWERLAW_SQL),
    # HashMin connected components at a fixed superstep horizon
    ("graph_connected_components", connected_components_query,
     CONNECTED_COMPONENTS_SQL),
]
