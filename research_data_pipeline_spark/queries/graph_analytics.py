"""Graph query surface (SURVEY §2.8) expressed over the TPC-H tables.

The reference's Cypher queries are all ≤2-hop pattern matches
(/root/reference/README.md:290-333); each compiles to joins over
vertex/edge DataFrames. Here the same shapes run on the test star schema
(suppliers/orders/customers as the property graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..graph.build import co_occurrence_edges, vertices_from
from ..registry import REGISTRY
from ..tables import load

# ---------------------------------------------------------------------------
# Shared co-supplier edge table (optimization r14). Twelve graph queries
# plus q08/q16 derive from the IDENTICAL weighted co-occurrence edge set
# over lineitem (item=l_orderkey, actor=l_suppkey) — only the threshold
# applied on top differs (band structure in minhash terms: the thresholds
# are post-aggregation filters, so no pushdown is lost by sharing). Each
# inline rebuild costs the same 2 exchanges (collect_set per order,
# (src,dst) aggregate); a production suite materializes the edge table
# once per dataset. Session-scoped memo with the exact contract of
# docs._lsh_pair_stream: keyed (applicationId, sf_dir), localCheckpoint-
# materialized (lineage-free blocks, freed by the ContextCleaner when the
# entry is dropped), stopped-session entries evicted on insert; bench.py
# clears and rebuilds it under `shared` so the build cost is charged to
# every run, never silently amortized away.
_CO_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _co_edge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CO_EDGE_CACHE.get(key)
    if cached is None:
        l = load(spark, sf_dir, "lineitem")
        cached = co_occurrence_edges(
            l, item_col="l_orderkey", actor_col="l_suppkey"
        ).localCheckpoint()
        for k in [k for k in _CO_EDGE_CACHE if k[0] != key[0]]:
            del _CO_EDGE_CACHE[k]
        _CO_EDGE_CACHE[key] = cached
    return cached


@REGISTRY.add(
    "g01_label_counts",
    """
    SELECT label, CAST(cnt AS BIGINT) AS cnt FROM (
        SELECT 'customer' AS label, COUNT(*) AS cnt FROM customer
        UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        UNION ALL SELECT 'part', COUNT(*) FROM part
        UNION ALL SELECT 'nation', COUNT(*) FROM nation
    )
    """,
    "graph",
)
def g01_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node count by label (SURVEY G1; research_pipeline_dag.py:265-275)."""
    v = vertices_from(
        {
            "customer": (load(spark, sf_dir, "customer"), "c_custkey"),
            "supplier": (load(spark, sf_dir, "supplier"), "s_suppkey"),
            "part": (load(spark, sf_dir, "part"), "p_partkey"),
            "nation": (load(spark, sf_dir, "nation"), "n_nationkey"),
        }
    )
    return v.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


@REGISTRY.add(
    "g02_ego_cosuppliers",
    """
    SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
           CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS n_shared_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    WHERE a.l_suppkey = 1 OR b.l_suppkey = 1
    GROUP BY a.l_suppkey, b.l_suppkey
    """,
    "graph",
)
def g02_ego_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hop undirected ego network (SURVEY G3; README.md:296-311).

    The disjunctive ego predicate ``a=ego OR b=ego`` cannot be pushed
    below the co-occurrence self-join, so joining first would
    materialize the FULL order×supplier pair space — a scale-killer at
    100 TB. Instead, derive the ego's (tiny) order set first and
    broadcast-semi-join BOTH self-join inputs to it: every qualifying
    pair shares an order with the ego by construction, so the pruned
    join is equivalent. The residual OR filter only removes
    non-ego/non-ego pairs inside ego orders. Join input shrinks from
    |orders| to |ego's orders| regardless of fact-table size.
    """
    l = load(spark, sf_dir, "lineitem")
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    ego_orders = pairs.where(F.col("l_suppkey") == 1).select("l_orderkey")
    pruned = pairs.join(F.broadcast(ego_orders), "l_orderkey", "left_semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .where((F.col("a.l_suppkey") == 1) | (F.col("b.l_suppkey") == 1))
        .groupBy(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .agg(F.countDistinct("a.l_orderkey").alias("n_shared_orders"))
    )


@REGISTRY.add(
    "g03_high_volume_reach",
    """
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY s.s_suppkey, s.s_name
    """,
    "graph",
)
def g03_high_volume_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge traversal with node+edge predicates (SURVEY G4/G5;
    README.md:319-333): supplier -[supplies qty>45]-> order -> customer."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        l.where(F.col("l_quantity") > 45)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@REGISTRY.add(
    "g04_edge_counts",
    """
    SELECT rel, CAST(cnt AS BIGINT) AS cnt FROM (
        SELECT 'PLACED' AS rel, COUNT(*) AS cnt FROM orders
        UNION ALL
        SELECT 'SUPPLIES', COUNT(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    )
    """,
    "graph",
)
def g04_edge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge count by relationship type (SURVEY G2;
    research_pipeline_dag.py:277-282)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    placed = o.select(F.lit("PLACED").alias("rel")).groupBy("rel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    supplies = (
        l.select("l_suppkey", "l_partkey")
        .distinct()
        .select(F.lit("SUPPLIES").alias("rel"))
        .groupBy("rel")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return placed.unionByName(supplies)


# ---------------------------------------------------------------------------
_CC_MIN_SHARED = 36

_CC_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    walk(node, label) AS (
        SELECT s_suppkey, s_suppkey FROM supplier
        UNION
        SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node
        WHERE w.label < e.dst
    )
    SELECT node, MIN(label) AS component FROM walk GROUP BY node
"""


@REGISTRY.add("g05_connected_components", _CC_ORACLE, "graph", "iterative")
def g05_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the strong co-supplier graph (pairs with
    >= {_CC_MIN_SHARED} shared orders): iterative min-label propagation vs
    DuckDB's recursive-CTE reachability — two entirely different fixpoint
    mechanisms, identical labels.

    Algorithm choice: this graph is dense with single-digit diameter, so
    label propagation (3 jobs/round, O(diameter) rounds) beats
    large-star/small-star contraction (more jobs/round, O(log n) rounds)
    — measured 2.7s vs 4s here. High-diameter / billion-edge graphs
    invert that; ``connected_components_contraction`` is the drop-in
    scale path (identical labels, property-tested, O(log n) rounds on a
    long-path fixture).

    The label-pruned recursion (w.label < e.dst) is safe as an oracle:
    the component minimum is smaller than every other member, so its
    label passes the guard on every hop of any path.
    """
    from ..graph.build import connected_components

    s = load(spark, sf_dir, "supplier")
    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _CC_MIN_SHARED
    )
    return (
        connected_components(s.select("s_suppkey"), edges, id_col="s_suppkey")
        .select(F.col("node"), F.col("label").alias("component"))
    )


# ---------------------------------------------------------------------------
# g06: integer-exact PageRank on the strong co-supplier graph.
#
# Floating-point PageRank cannot be differentially tested value-for-value
# (partial-sum order perturbs low bits), so the operator runs in FIXED
# POINT: ranks are bigint micro-units (SCALE = 1e12), contributions are
# floor divisions, damping is (85 * x) div 100 — every op associative /
# deterministic, so Spark and DuckDB agree bit-for-bit at any
# partitioning (the d16 integer-exact trick applied to an iterative
# algorithm). Scale shape: each of the 5 iterations is one keyed join of
# the edge list against the node-sized rank table plus one groupBy(dst)
# — no global state, no driver data, O(iters) shuffles.
_PR_SCALE = 1_000_000_000_000
_PR_ITERS = 5

_PR_EDGES_SQL = f"""
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM supplier),
    p0 AS (SELECT s_suppkey AS node, {_PR_SCALE} // (SELECT n FROM nn) AS pr
           FROM supplier)
"""


def _pr_iter_sql(k: int) -> str:
    prev = f"p{k - 1}"
    return f"""
    p{k} AS (
        SELECT v.node,
               CAST((15 * ({_PR_SCALE} // (SELECT n FROM nn))) // 100
               + (85 * CAST(COALESCE(SUM(c.contrib), 0) AS BIGINT)) // 100
               AS BIGINT) AS pr
        FROM {prev} v
        LEFT JOIN (
            SELECT e.dst, p.pr // d.outdeg AS contrib
            FROM e JOIN {prev} p ON p.node = e.src
                   JOIN deg d ON d.src = e.src
        ) c ON c.dst = v.node
        GROUP BY v.node
    )"""


_PR_ORACLE = (
    "WITH "
    + _PR_EDGES_SQL
    + ","
    + ",".join(_pr_iter_sql(k) for k in range(1, _PR_ITERS + 1))
    + f"\n    SELECT node, pr AS pagerank_fp FROM p{_PR_ITERS}"
)


@REGISTRY.add("g06_pagerank", _PR_ORACLE, "graph", "iterative")
def g06_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (damping 85/100, 5 iterations) over the
    strong co-supplier graph; isolated suppliers keep the base rank.
    Exact vs the DuckDB chained-CTE oracle because every arithmetic step
    is integer."""
    s = load(spark, sf_dir, "supplier")
    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _CC_MIN_SHARED
    ).select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint()  # reused every iteration

    n = s.count()
    if n == 0:  # empty graph: no nodes, no ranks (not a crash)
        return s.select(
            F.col("s_suppkey").alias("node"),
            F.lit(0).cast("bigint").alias("pagerank_fp"),
        )
    base = (15 * (_PR_SCALE // n)) // 100
    pr = s.select(
        F.col("s_suppkey").alias("node"),
        F.lit(_PR_SCALE // n).cast("bigint").alias("pr"),
    )
    for _ in range(_PR_ITERS):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            "dst", F.expr("pr div outdeg").alias("contrib")
        )
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        pr = (
            pr.select("node")
            .join(sums, pr["node"] == sums["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).cast("bigint").alias("pr"),
            )
        )
    return pr.select("node", F.col("pr").alias("pagerank_fp"))


# ---------------------------------------------------------------------------
# g07: per-node triangle counts on the same strong graph — the standard
# clustering-structure primitive. Canonical (src < dst) edge list; the
# two-join wedge-close enumeration touches each triangle exactly once
# (a < b < c). Scale shape: two keyed equi-joins on an edge list already
# thresholded to the strong graph; per-node counts from one union+groupBy.
_TRI_ORACLE = f"""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    e AS (SELECT src, dst FROM e0 WHERE src < dst),
    tri AS (
        SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        FROM e ab JOIN e bc ON ab.dst = bc.src
                  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    per_node AS (
        SELECT node, COUNT(*) AS n FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT s.s_suppkey AS node, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_triangles
    FROM supplier s LEFT JOIN per_node p ON p.node = s.s_suppkey
"""


@REGISTRY.add("g07_triangle_count", _TRI_ORACLE, "graph")
def g07_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles per supplier in the strong co-supplier graph (each
    triangle counted once via a < b < c wedge closing)."""
    s = load(spark, sf_dir, "supplier")
    e = (
        _co_edge_table(spark, sf_dir)
        .where(
            (F.col("n_shared_orders") >= _CC_MIN_SHARED)
            & (F.col("src") < F.col("dst"))
        )
        .select("src", "dst")
        # three-way self-join input: a cheap filter over the memo's
        # already-materialized blocks — no second checkpoint needed
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = ab.join(bc, F.col("ab.dst") == F.col("bc.src")).join(
        ac,
        (F.col("ac.src") == F.col("ab.src"))
        & (F.col("ac.dst") == F.col("bc.dst")),
    ).select(
        F.col("ab.src").alias("a"), F.col("ab.dst").alias("b"),
        F.col("bc.dst").alias("c"),
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return s.select(F.col("s_suppkey").alias("node")).join(
        per_node, "node", "left"
    ).select(
        "node", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# g08: single-source BFS hop distance — the traversal primitive the ≤2-hop
# Cypher patterns (README.md:290-333) generalize to. Edge threshold 32
# keeps the co-supplier graph sparse enough that the 4-hop ball from
# supplier 1 is a real frontier expansion (measured hops 0-4 populated at
# sf0.01), not one dense blob. Iterative Spark BFS (graph/build.bfs_hops)
# vs DuckDB's depth-guarded recursive-CTE walk — different fixpoint
# mechanisms, identical minimum-hop labels.
_BFS_MIN_SHARED, _BFS_SEED, _BFS_MAX_HOPS = 32, 1, 4

_BFS_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_BFS_MIN_SHARED}
    ),
    walk(node, hops) AS (
        SELECT CAST({_BFS_SEED} AS BIGINT), 0
        UNION
        SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        WHERE w.hops < {_BFS_MAX_HOPS}
    )
    SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""


@REGISTRY.add("g08_bfs_hops", _BFS_ORACLE, "graph", "iterative")
def g08_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from supplier 1 over the ≥32-shared-orders
    co-supplier graph, capped at 4 hops."""
    from ..graph.build import bfs_hops

    s = load(spark, sf_dir, "supplier")
    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _BFS_MIN_SHARED
    )
    return bfs_hops(
        s.select(F.col("s_suppkey").alias("node")),
        edges,
        seed=_BFS_SEED,
        max_hops=_BFS_MAX_HOPS,
    )


# ---------------------------------------------------------------------------
# g09: k-core decomposition — the density-peeling primitive (community
# cores, spam/bot subgraph mining). Spark side iterates to the fixpoint
# at any graph size; the oracle UNROLLS the peel as chained CTE stages
# (same device as g06's fixed-iteration PageRank): 6 stages ≥ the
# measured 2-round cascade at sf0.01, and extra stages past the fixpoint
# are no-ops, so the unrolling is safe for any test scale the driver
# uses. Threshold 32 / k=3 leaves a 63-node core after a real cascade
# (dropping degree-<3 nodes pushes OTHER nodes below 3 — single-pass
# degree filtering would get this wrong, which is what makes it a
# fixpoint problem).
_KCORE_MIN_SHARED, _KCORE_K = 32, 3


def _kcore_stage(prev: str, nxt: str, k: int) -> str:
    return (
        f"{nxt} AS (SELECT e.src AS node FROM e "
        f"JOIN {prev} a ON e.src = a.node JOIN {prev} b ON e.dst = b.node "
        f"GROUP BY e.src HAVING COUNT(*) >= {k})"
    )


_KCORE_ORACLE = f"""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_KCORE_MIN_SHARED}
    ),
    n0 AS (SELECT DISTINCT src AS node FROM e),
    {", ".join(_kcore_stage(f"n{i}", f"n{i + 1}", _KCORE_K) for i in range(6))}
    SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e JOIN n6 a ON e.src = a.node JOIN n6 b ON e.dst = b.node
    GROUP BY e.src
"""


@REGISTRY.add("g09_kcore", _KCORE_ORACLE, "graph", "iterative")
def g09_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the ≥32-shared-orders co-supplier graph: members with
    their within-core degree (graph/build.k_core iterative peeling)."""
    from ..graph.build import k_core

    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _KCORE_MIN_SHARED
    )
    return k_core(edges, k=_KCORE_K)


# ---------------------------------------------------------------------------
# g10: local clustering coefficient — triangles(v) relative to the wedge
# count deg(v)·(deg(v)−1)/2, the standard "how clique-like is this node's
# neighborhood" metric (complements g07's raw triangle counts). Integer
# discipline: the coefficient is emitted as parts-per-million via one
# integer division — (2_000_000·tri) div (deg·(deg−1)) — so Spark and the
# oracle agree bit-for-bit with no float rounding anywhere. Scale shape:
# the directed strong edge list yields degrees with one groupBy; triangles
# reuse g07's canonical two-join wedge closing; final assembly is two
# keyed left joins on supplier ids. No step materializes the wedge set.
_LCC_ORACLE = f"""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM e0 GROUP BY src),
    e AS (SELECT src, dst FROM e0 WHERE src < dst),
    tri AS (
        SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        FROM e ab JOIN e bc ON ab.dst = bc.src
                  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    per_node AS (
        SELECT node, COUNT(*) AS n FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT d.node,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.degree >= 2
                     THEN (2000000 * COALESCE(p.n, 0)) // (d.degree * (d.degree - 1))
                     ELSE 0 END AS BIGINT) AS lcc_ppm
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
"""


@REGISTRY.add("g10_clustering_coefficient", _LCC_ORACLE, "graph")
def g10_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (ppm) on the strong
    co-supplier graph; degree from the directed edge list, triangles via
    g07's canonical a<b<c wedge closing."""
    e0 = (
        _co_edge_table(spark, sf_dir)
        .where(F.col("n_shared_orders") >= _CC_MIN_SHARED)
        .select("src", "dst")
        # degree agg + 3 join aliases re-filter the memo's materialized
        # blocks — cheaper than a second checkpoint copy
    )
    deg = e0.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e = e0.where(F.col("src") < F.col("dst"))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = ab.join(bc, F.col("ab.dst") == F.col("bc.src")).join(
        ac,
        (F.col("ac.src") == F.col("ab.src"))
        & (F.col("ac.dst") == F.col("bc.dst")),
    ).select(
        F.col("ab.src").alias("a"), F.col("ab.dst").alias("b"),
        F.col("bc.dst").alias("c"),
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_tri = F.coalesce(F.col("n"), F.lit(0))
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("degree").cast("bigint").alias("degree"),
        n_tri.cast("bigint").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.expr("(2000000 * coalesce(n, 0)) div (degree * (degree - 1))"),
        ).otherwise(F.lit(0)).cast("bigint").alias("lcc_ppm"),
    )


# ---------------------------------------------------------------------------
# g11: bounded-hop WEIGHTED shortest path — g08's traversal upgraded with
# integer edge costs (cost = 1e6 div n_shared_orders: frequently
# co-occurring pairs are cheap to traverse). Spark runs ``max_hops``
# Bellman-Ford relaxation rounds — round k is exactly "min cost over
# ≤k-edge walks", so the fixed round count IS the query's semantics; the
# oracle enumerates the same bounded walk space with a recursive CTE and
# takes MIN per node. A node's cheapest path may use MORE hops than its
# BFS distance (two strong edges can undercut one weak edge), which is
# what distinguishes this from g08.
_WSP_MIN_SHARED, _WSP_SEED, _WSP_MAX_HOPS, _WSP_COST_SCALE = 32, 1, 4, 1_000_000

_WSP_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
               {_WSP_COST_SCALE} // COUNT(*) AS cost
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_WSP_MIN_SHARED}
    ),
    walk(node, hops, cost) AS (
        SELECT CAST({_WSP_SEED} AS BIGINT), 0, CAST(0 AS BIGINT)
        UNION
        SELECT e.dst, w.hops + 1, w.cost + e.cost
        FROM walk w JOIN e ON e.src = w.node
        WHERE w.hops < {_WSP_MAX_HOPS}
    )
    SELECT node, CAST(MIN(cost) AS BIGINT) AS min_cost FROM walk GROUP BY node
"""


@REGISTRY.add("g11_weighted_shortest_path", _WSP_ORACLE, "graph", "iterative")
def g11_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum integer path cost from supplier 1 over ≤4-hop walks in the
    strong co-supplier graph (graph/build.bounded_min_cost)."""
    from ..graph.build import bounded_min_cost

    edges = (
        _co_edge_table(spark, sf_dir)
        .where(F.col("n_shared_orders") >= _WSP_MIN_SHARED)
        .select(
            "src",
            "dst",
            F.expr(f"{_WSP_COST_SCALE} div n_shared_orders").alias("cost"),
        )
    )
    return bounded_min_cost(
        edges, seed=_WSP_SEED, max_hops=_WSP_MAX_HOPS
    )


# ---------------------------------------------------------------------------
# g12: HITS hubs & authorities on the BIPARTITE purchase graph
# (customer → supplier, one edge per distinct buying relationship).
# Kleinberg's iteration without the float normalization step: with a
# fixed iteration count the l2-normalizer is a positive scalar that
# never changes the RANKING, so dropping it keeps every step an exact
# BIGINT sum (the same fixed-point discipline as g06's PageRank —
# magnitudes stay ≤ degree³ ≪ 2^63 at any plausible scale; renormalize
# only when persisting floats for humans). auth₁ = indegree,
# hub₁ = Σ auth₁ over the customer's suppliers, auth₂ = Σ hub₁ —
# two keyed-join + groupBy rounds on the edge list, no driver state.
_HITS_ORACLE = """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), a1 AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY s
    ), h1 AS (
        SELECT e.c, CAST(SUM(a1.a) AS BIGINT) AS h
        FROM edges e JOIN a1 ON a1.s = e.s GROUP BY e.c
    ), a2 AS (
        SELECT e.s, CAST(SUM(h1.h) AS BIGINT) AS a
        FROM edges e JOIN h1 ON h1.c = e.c GROUP BY e.s
    )
    SELECT sup.s_suppkey AS node,
           COALESCE(a1.a, 0) AS indegree,
           COALESCE(a2.a, 0) AS authority_fp
    FROM supplier sup
    LEFT JOIN a1 ON a1.s = sup.s_suppkey
    LEFT JOIN a2 ON a2.s = sup.s_suppkey
"""


@REGISTRY.add("g12_hits_authorities", _HITS_ORACLE, "graph", "iterative")
def g12_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round integer HITS authority scores for suppliers over the
    customer→supplier bipartite graph; isolated suppliers score 0."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    edges = (
        o.select("o_orderkey", "o_custkey")
        .join(l.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()  # reused by all three rounds
    )
    a1 = edges.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("a1"))
    h1 = (
        edges.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a1").cast("bigint").alias("h1"))
    )
    a2 = (
        edges.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h1").cast("bigint").alias("a2"))
    )
    return (
        sup.select(F.col("s_suppkey").alias("node"))
        .join(a1, F.col("node") == a1["s"], "left")
        .drop("s")
        .join(a2, F.col("node") == a2["s"], "left")
        .drop("s")
        .select(
            "node",
            F.coalesce("a1", F.lit(0)).cast("bigint").alias("indegree"),
            F.coalesce("a2", F.lit(0)).cast("bigint").alias("authority_fp"),
        )
    )


# ---------------------------------------------------------------------------
# g13: COMMUNITY detection by synchronous majority-label propagation —
# distinct from g05's connected components (which spreads the MIN label
# to everything reachable): here each node adopts the most COMMON label
# among its neighbors (tie → smallest label), so densely-knit groups
# converge to one label while bridges don't bleed labels across. Three
# synchronized rounds from label=node-id, fully deterministic — the
# async/randomized LPA variants are not reproducible, the sync+tiebreak
# form is. Each round = one edge⋈label join + one (node,label) count +
# one argmax: all keyed shuffles on the same edge list (localCheckpoint
# reused), no driver state.
_LP_ROUNDS = 3


def _lp_iter_sql(k: int) -> str:
    return f"""
    c{k} AS (
        SELECT e.dst AS node, l.label, COUNT(*) AS cnt
        FROM e JOIN l{k - 1} l ON l.node = e.src
        GROUP BY 1, 2
    ),
    w{k} AS (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM c{k}
    ),
    l{k} AS (
        SELECT s.node, COALESCE(w.label, s.label) AS label
        FROM l{k - 1} s LEFT JOIN w{k} w ON w.node = s.node AND w.rn = 1
    )"""


_LP_ORACLE = (
    f"""WITH
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    l0 AS (SELECT s_suppkey AS node, s_suppkey AS label FROM supplier),"""
    + ",".join(_lp_iter_sql(k) for k in range(1, _LP_ROUNDS + 1))
    + f"""
    SELECT node, CAST(label AS BIGINT) AS community,
           CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT)
               AS community_size
    FROM l{_LP_ROUNDS}"""
)


@REGISTRY.add("g13_label_prop_communities", _LP_ORACLE, "graph", "iterative")
def g13_label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous majority-LPA communities on the strong co-supplier
    graph: 3 deterministic rounds, tie → smallest label."""
    s = load(spark, sf_dir, "supplier")
    edges = (
        _co_edge_table(spark, sf_dir)
        .where(F.col("n_shared_orders") >= _CC_MIN_SHARED)
        .select("src", "dst")
        # reused every round as a filter over the memo's materialized
        # blocks — no per-query checkpoint copy
    )
    labels = s.select(
        F.col("s_suppkey").alias("node"), F.col("s_suppkey").alias("label")
    )
    for _ in range(_LP_ROUNDS):
        counts = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("n2"), "label")
            .groupBy("n2", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax with (cnt desc, label asc): max over (cnt, -label)
        best = counts.groupBy("n2").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))["nl"])
            .alias("new_label")
        )
        labels = (
            labels.join(best, labels["node"] == best["n2"], "left")
            .select(
                "node",
                F.coalesce("new_label", "label").cast("bigint").alias("label"),
            )
        )
    w = W.partitionBy("label")
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("community_size"),
    )


# ---------------------------------------------------------------------------
# g14: LINK PREDICTION scores — common-neighbor count and resource-
# allocation index (Zhou/Lü/Zhang 2009: Σ_z 1/deg(z) over shared
# neighbors z) for every non-adjacent supplier pair with ≥2 shared
# strong co-suppliers. RA crosses engines as exact integers: each
# neighbor contributes FLOOR(1e6/deg(z)) — BIGINT floor division, no
# float summation anywhere. Scale shape: the wedge join fans out as
# Σ_z deg(z)² — bounded here by the strong-edge threshold keeping the
# graph sparse; an open-web run caps each neighbor list to its top-d
# strongest edges first (same mitigation as the d06 band guard).
_LP_ORACLE = f"""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    deg AS (SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS d FROM e0 GROUP BY src),
    wedge AS (
        SELECT ax.dst AS i, bx.dst AS j, ax.src AS z
        FROM e0 ax JOIN e0 bx ON ax.src = bx.src AND ax.dst < bx.dst
    ),
    cand AS (
        SELECT w.i, w.j, w.z FROM wedge w
        WHERE NOT EXISTS (
            SELECT 1 FROM e0 x WHERE x.src = w.i AND x.dst = w.j
        )
    )
    SELECT c.i, c.j,
           CAST(COUNT(*) AS BIGINT) AS common_neighbors,
           CAST(SUM(1000000 // deg.d) AS BIGINT) AS ra_ppm
    FROM cand c JOIN deg ON deg.z = c.z
    GROUP BY c.i, c.j
    HAVING COUNT(*) >= 2
"""


@REGISTRY.add("g14_link_prediction", _LP_ORACLE, "graph", "similarity")
def g14_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor and resource-allocation link-prediction scores
    for non-adjacent supplier pairs in the strong co-supplier graph
    (≥2 shared neighbors; RA in exact integer ppm)."""
    e0 = (
        _co_edge_table(spark, sf_dir)
        .where(F.col("n_shared_orders") >= _CC_MIN_SHARED)
        .select("src", "dst")
        # wedge self-join + anti-join input: filter over memo blocks
    )
    deg = e0.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    ax, bx = e0.alias("ax"), e0.alias("bx")
    wedge = ax.join(
        bx,
        (F.col("ax.src") == F.col("bx.src"))
        & (F.col("ax.dst") < F.col("bx.dst")),
    ).select(
        F.col("ax.dst").alias("i"),
        F.col("bx.dst").alias("j"),
        F.col("ax.src").alias("z"),
    )
    cand = wedge.join(
        e0.select(F.col("src").alias("i"), F.col("dst").alias("j")),
        ["i", "j"],
        "left_anti",
    )
    return (
        cand.join(deg, "z")
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(F.expr("1000000 div d")).cast("bigint").alias("ra_ppm"),
        )
        .where(F.col("common_neighbors") >= 2)
    )


# ---------------------------------------------------------------------------
# g15: degree ASSORTATIVITY — Pearson correlation of endpoint degrees
# over the directed edge list (Newman 2002): do hubs attach to hubs
# (r>0) or to leaves (r<0)? The sufficient statistics (n, Σx, Σy, Σxy,
# Σx², Σy²) are exact integers on DECIMAL(38,0)/HUGEINT — the s18
# discipline — so the only float is the final r = num/√(dx·dy), where
# both engines divide and square-root the same exactly-represented
# values (IEEE-correctly-rounded sqrt), floored to µ-units like every
# ln()-family score. Scale shape: one degree agg + two broadcastable
# degree-lookup joins + one scalar agg; no pair space beyond the edge
# list itself.
_ASSORT_ORACLE = f"""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM e0 GROUP BY src),
    xy AS (
        SELECT CAST(ds.d AS HUGEINT) AS x, CAST(dd_.d AS HUGEINT) AS y
        FROM e0 JOIN deg ds ON ds.node = e0.src
                JOIN deg dd_ ON dd_.node = e0.dst
    ),
    s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           CAST(sx AS BIGINT) AS sum_src_degree,
           CAST(FLOOR(
               1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
               / SQRT(CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                      * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE))
           ) AS BIGINT) AS assortativity_e6
    FROM s
"""


@REGISTRY.add("g15_degree_assortativity", _ASSORT_ORACLE, "graph", "stats")
def g15_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the strong co-supplier graph in
    exact-integer sufficient statistics (final r floored to µ-units)."""
    e0 = (
        _co_edge_table(spark, sf_dir)
        .where(F.col("n_shared_orders") >= _CC_MIN_SHARED)
        .select("src", "dst")
    )
    deg = e0.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).localCheckpoint()  # looked up from both endpoints, computed once
    xy = (
        e0.join(F.broadcast(deg.select(F.col("node").alias("src"),
                                       F.col("d").alias("x"))), "src")
        .join(F.broadcast(deg.select(F.col("node").alias("dst"),
                                     F.col("d").alias("y"))), "dst")
        .select(F.col("x").cast("decimal(38,0)").alias("x"),
                F.col("y").cast("decimal(38,0)").alias("y"))
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_directed_edges"),
        F.col("sx").cast("bigint").alias("sum_src_degree"),
        F.expr(
            "CAST(FLOOR(1000000.0"
            " * CAST(n * sxy - sx * sy AS DOUBLE)"
            " / SQRT(CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"
            "        * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE))"
            ") AS BIGINT)"
        ).alias("assortativity_e6"),
    )


# ---------------------------------------------------------------------------
# g16: PERSONALIZED PageRank — g06's fixed-point machinery with the
# teleport mass restricted to a seed set (every 20th supplier): the
# ranking "importance relative to THESE nodes" that powers
# related-entity retrieval. Same integer-exact discipline (bigint
# micro-units, floor divisions, 85/100 damping — bit-identical at any
# partitioning); only the base vector changes: seeds restart with
# (15 · SCALE div n_seeds) div 100, non-seeds restart with 0. Scale
# shape is g06's: one edge⋈rank join + one groupBy(dst) per iteration.
_PPR_ITERS = 3
_PPR_SEED_MOD = 20

_PPR_CTES = f"""
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MIN_SHARED}
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
    ns AS (SELECT COUNT(*) AS n FROM supplier
           WHERE s_suppkey % {_PPR_SEED_MOD} = 0),
    p0 AS (
        SELECT s_suppkey AS node,
               CASE WHEN s_suppkey % {_PPR_SEED_MOD} = 0
                    THEN {_PR_SCALE} // (SELECT n FROM ns) ELSE 0 END AS pr
        FROM supplier
    )"""


def _ppr_iter_sql(k: int) -> str:
    prev = f"p{k - 1}"
    return f"""
    p{k} AS (
        SELECT v.node,
               CAST(CASE WHEN v.node % {_PPR_SEED_MOD} = 0
                    THEN (15 * ({_PR_SCALE} // (SELECT n FROM ns))) // 100
                    ELSE 0 END
               + (85 * CAST(COALESCE(SUM(c.contrib), 0) AS BIGINT)) // 100
               AS BIGINT) AS pr
        FROM {prev} v
        LEFT JOIN (
            SELECT e.dst, p.pr // d.outdeg AS contrib
            FROM e JOIN {prev} p ON p.node = e.src
                   JOIN deg d ON d.src = e.src
        ) c ON c.dst = v.node
        GROUP BY v.node
    )"""


_PPR_ORACLE = (
    "WITH "
    + _PPR_CTES
    + ","
    + ",".join(_ppr_iter_sql(k) for k in range(1, _PPR_ITERS + 1))
    + f"""
    SELECT node, pr AS ppr_fp, node % {_PPR_SEED_MOD} = 0 AS is_seed
    FROM p{_PPR_ITERS}"""
)


@REGISTRY.add("g16_personalized_pagerank", _PPR_ORACLE, "graph", "iterative")
def g16_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point personalized PageRank (3 iterations, damping 85/100)
    over the strong co-supplier graph, teleporting only to the seed set
    (every 20th supplier); integer-exact vs the chained-CTE oracle."""
    s = load(spark, sf_dir, "supplier")
    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _CC_MIN_SHARED
    ).select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint()  # reused every iteration

    n_seeds = s.where(F.col("s_suppkey") % _PPR_SEED_MOD == 0).count()
    if n_seeds == 0:  # no seeds: all mass is zero, not a crash
        return s.select(
            F.col("s_suppkey").alias("node"),
            F.lit(0).cast("bigint").alias("ppr_fp"),
            F.lit(False).alias("is_seed"),
        )
    seed_share = _PR_SCALE // n_seeds
    seed_base = (15 * seed_share) // 100
    is_seed = F.col("node") % _PPR_SEED_MOD == 0
    pr = s.select(
        F.col("s_suppkey").alias("node"),
        F.when(F.col("s_suppkey") % _PPR_SEED_MOD == 0, F.lit(seed_share))
        .otherwise(F.lit(0)).cast("bigint").alias("pr"),
    )
    for _ in range(_PPR_ITERS):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            "dst", F.expr("pr div outdeg").alias("contrib")
        )
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        pr = (
            pr.select("node")
            .join(sums, pr["node"] == sums["dst"], "left")
            .select(
                "node",
                (
                    F.when(is_seed, F.lit(seed_base)).otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).cast("bigint").alias("pr"),
            )
        )
    return pr.select("node", F.col("pr").alias("ppr_fp"), is_seed.alias("is_seed"))


# ---------------------------------------------------------------------------
# g17: HARMONIC centrality of the seed set — "how close is each seed to
# the rest of the graph", the centrality that stays defined on
# disconnected graphs (unreached nodes contribute 0 instead of ∞).
# H(s) = Σ_{v≠s reached within 3 hops} 1e6 div hops, exact integers.
# One multi-source BFS job per round (graph/build.multi_source_bfs):
# ALL seeds' frontiers expand together — |seeds| sequential BFS runs
# would pay the per-job floor |seeds| times. Oracle: depth-guarded
# recursive walk keyed by root, min-hop per (root, node).
_HC_MIN_SHARED, _HC_SEED_MOD, _HC_MAX_HOPS = 32, 20, 3

_HC_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM pairs a JOIN pairs b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_HC_MIN_SHARED}
    ),
    walk(root, node, hops) AS (
        SELECT CAST(s_suppkey AS BIGINT), CAST(s_suppkey AS BIGINT), 0
        FROM supplier WHERE s_suppkey % {_HC_SEED_MOD} = 0
        UNION
        SELECT w.root, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        WHERE w.hops < {_HC_MAX_HOPS}
    ),
    d AS (SELECT root, node, MIN(hops) AS hops FROM walk GROUP BY root, node)
    SELECT root,
           CAST(COUNT(CASE WHEN hops > 0 THEN 1 END) AS BIGINT) AS n_reached,
           CAST(COALESCE(SUM(CASE WHEN hops > 0
                                  THEN 1000000 // hops END), 0) AS BIGINT)
               AS harmonic_e6
    FROM d GROUP BY root
"""


@REGISTRY.add("g17_harmonic_centrality", _HC_ORACLE, "graph", "iterative")
def g17_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality (Σ 1e6 div hops, 3-hop ball) of every 20th
    supplier over the strong co-supplier graph via ONE multi-source BFS."""
    from ..graph.build import multi_source_bfs

    s = load(spark, sf_dir, "supplier")
    edges = _co_edge_table(spark, sf_dir).where(
        F.col("n_shared_orders") >= _HC_MIN_SHARED
    ).select("src", "dst")
    seeds = s.where(F.col("s_suppkey") % _HC_SEED_MOD == 0).select(
        F.col("s_suppkey").alias("node")
    )
    d = multi_source_bfs(seeds, edges, max_hops=_HC_MAX_HOPS)
    return d.groupBy("root").agg(
        F.count(F.when(F.col("hops") > 0, 1)).cast("bigint")
        .alias("n_reached"),
        F.coalesce(
            F.sum(F.when(F.col("hops") > 0,
                         F.expr("1000000 div hops"))), F.lit(0)
        ).cast("bigint").alias("harmonic_e6"),
    )


# ---------------------------------------------------------------------------
# g18: STRONGLY connected components of the directed supplier HANDOFF
# graph — the spider-trap detector (g05 is undirected CC; directed
# cycles are what trap a crawler / random surfer). Edges: within each
# order, suppliers ordered by (first line number, suppkey) — the
# composite is unique per supplier within an order at ANY scale (a
# packed ln·10⁶+suppkey key would collide once suppkey passes 10⁶,
# ~sf100), so the LEAD walk is total-order deterministic on both
# engines even though synthetic lineitem REPEATS l_linenumber; each
# consecutive pair is one handoff, and each
# supplier keeps its top-2 strongest successors (row_number by count
# desc, dst asc — a kNN-style sparsifier that yields non-trivial SCC
# structure at every scale: 28 SCCs / max 73 at sf0.01, 299 / 702 at
# sf0.1). Operator: graph/build.strongly_connected_components
# (FW-BW min-id coloring distributed path; guarded driver Tarjan under
# 1M edges). Oracle: recursive-CTE transitive closure + mutual-reach
# minimum — tractable here even at sf0.1 (top-2 out-degree bounds the
# closure).
_SCC_TOP = 2
_SCC_ORACLE = f"""
    WITH RECURSIVE pos AS (
        SELECT l_orderkey AS ok, l_suppkey AS s,
               MIN(l_linenumber) AS first_ln
        FROM lineitem GROUP BY 1, 2
    ), nxt AS (
        SELECT ok, s,
               LEAD(s) OVER (PARTITION BY ok ORDER BY first_ln, s) AS t
        FROM pos
    ), h AS (
        SELECT s AS src, t AS dst, COUNT(*) AS w FROM nxt
        WHERE t IS NOT NULL GROUP BY 1, 2
    ), e AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM h
        ) WHERE rn <= {_SCC_TOP}
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
    ),
    mutual AS (
        SELECT a.src AS v, a.dst AS u FROM reach a JOIN reach b
          ON b.src = a.dst AND b.dst = a.src
    ),
    lab AS (
        SELECT s.s_suppkey AS node,
               LEAST(s.s_suppkey, COALESCE(MIN(m.u), s.s_suppkey)) AS scc_id
        FROM supplier s LEFT JOIN mutual m ON m.v = s.s_suppkey
        GROUP BY s.s_suppkey
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(scc_id AS BIGINT) AS scc_id,
           CAST(COUNT(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
    FROM lab
"""


@REGISTRY.add("g18_strongly_connected", _SCC_ORACLE, "graph", "iterative")
def g18_strongly_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC labels (min member id) + SCC sizes for every supplier over
    the directed top-2 handoff graph; singletons label themselves —
    any scc_size > 1 row is a directed cycle a crawler could trap in."""
    from pyspark.sql import Window as W

    from ..graph.build import strongly_connected_components

    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    pos = l.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).agg(F.min("l_linenumber").alias("first_ln"))
    nxt = pos.select(
        "s",
        F.lead("s").over(
            W.partitionBy("ok").orderBy("first_ln", "s")
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    h = nxt.groupBy(F.col("s").alias("src"), F.col("t").alias("dst")).agg(
        F.count(F.lit(1)).alias("w")
    )
    e = (
        h.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
            ),
        )
        .where(F.col("rn") <= _SCC_TOP)
        .select("src", "dst")
    )
    scc = strongly_connected_components(
        s.select("s_suppkey"), e, id_col="s_suppkey"
    )
    wsz = W.partitionBy("scc_id")
    return scc.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("scc_id"),
    ).withColumn(
        "scc_size", F.count(F.lit(1)).over(wsz).cast("bigint")
    )
