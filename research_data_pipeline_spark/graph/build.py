"""Property-graph construction as vertex/edge DataFrames.

The reference materializes a Neo4j graph (nodes Author/Article/Journal/
Category; edges AUTHORED/BELONGS_TO/COAUTHORS/PUBLISHED_IN —
/root/reference/dags/research_pipeline_dag.py:285-369). All its graph
queries are ≤2-hop pattern matches, so the Spark-native representation is
plain DataFrames: a ``vertices(id, label, props...)`` union and typed edge
DataFrames — every Cypher query in the reference compiles to joins
(SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_label_df(spark, rows: list[tuple], id_type: str) -> DataFrame:
    """(node, label) DataFrame from driver-local pairs, Arrow-encoded.

    ``createDataFrame`` over a plain Python list ships pickled Row objects
    and pays a Python-worker pass on EVERY downstream job that evaluates
    the relation (measured 1.4 s for a 5k-row broadcast build side at
    sf0.1 — the single largest slice of the cluster-table build). A
    pandas frame with explicit dtypes takes the Arrow path instead: the
    data crosses once as Arrow batches and downstream evaluation is pure
    JVM. Integral ids get exact int64/int32 dtypes; anything else falls
    back to object columns with the same schema string as before.
    """
    import pandas as pd

    dtype = {"bigint": "int64", "int": "int32", "smallint": "int16"}.get(
        id_type
    )
    if dtype is not None:
        pdf = pd.DataFrame(rows, columns=["node", "label"]).astype(dtype)
    else:
        pdf = pd.DataFrame(rows, columns=["node", "label"])
    return spark.createDataFrame(pdf, schema=f"node {id_type}, label {id_type}")


def co_occurrence_edges(
    df: DataFrame,
    item_col: str,
    actor_col: str,
    weight_col: str = "n_shared_orders",
) -> DataFrame:
    """Directed co-occurrence edges between actors sharing an item.

    Reproduces the reference's COAUTHORS derivation
    (research_pipeline_dag.py:353-357): Cypher CREATE emits BOTH
    directions and one edge per shared item. At scale a multi-edge list is
    wasteful, so multiplicity is carried as a weight; both directions are
    kept (the reference's queries treat the relation as undirected via
    either endpoint).

    Two shuffles, no join: ``collect_set`` per item (dedup + grouping in
    ONE exchange on the item key), then the pair space is generated
    map-side by a chained double explode and aggregated on (src, dst).
    The self-join formulation costs a third exchange (the distinct's
    (item, actor) partitioning cannot serve a join keyed on item alone)
    for the identical pair stream. After the set-dedup each (src, dst)
    occurs at most once per item, so the weight is a plain ``count`` —
    COUNT(DISTINCT item) would give the same number while paying an
    extra expand + shuffle.

    Skew note for the 100-TB case: one item with k actors emits k²
    pairs from a single row. That quadratic blowup is inherent to
    co-occurrence (the join form pays it too, just spread across
    matches); production co-occurrence jobs cap or drop super-items
    first, since their edges are near-meaningless and dominate cost.
    """
    per_item = (
        df.select(item_col, actor_col)
        .groupBy(item_col)
        .agg(F.collect_set(actor_col).alias("_actors"))
    )
    return (
        per_item.select(F.explode("_actors").alias("src"), F.col("_actors"))
        .select("src", F.explode("_actors").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias(weight_col))
    )


def vertices_from(dfs: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """Build a unified vertex DataFrame from {label: (df, id_col)}."""
    parts = [
        df.select(F.col(id_col).cast("string").alias("id"), F.lit(label).alias("label"))
        for label, (df, id_col) in dfs.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ego_network(edges: DataFrame, vertex_id, src: str = "src", dst: str = "dst") -> DataFrame:
    """1-hop undirected ego network (reference README.md:296-311, G3)."""
    return edges.where((F.col(src) == vertex_id) | (F.col(dst) == vertex_id))


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    prop_rounds: int = 6,
    stats: dict | None = None,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components — auto-selecting hybrid.

    Starts with min-label propagation (each round: one join + one
    min-aggregate; every node adopts the smallest label among itself and
    its neighbors). That converges in O(component diameter) rounds and is
    the measured-fastest path on dense, small-diameter graphs like the
    co-supplier graph (g05: 2.7 s prop vs 4 s contraction at sf0.1).

    If propagation has not converged after ``prop_rounds`` rounds — the
    cheap high-diameter probe — the partial labels (min id within
    ``prop_rounds`` hops) are used to CONTRACT the graph: nodes sharing a
    label collapse to one quotient node, and the O(log n) large/small-star
    contraction (``connected_components_contraction``) finishes on the
    quotient, which is strictly smaller and preserves components. Quotient
    labels are original node ids, so component minima are unchanged; the
    final join maps every node through its quotient label. Net: a path
    graph costs ``prop_rounds`` cheap rounds + O(log n) contraction
    rounds, never O(n) — without the caller choosing an algorithm.

    Lineage is cut every round with an eager ``localCheckpoint`` —
    without it the plan doubles per iteration and the driver dies
    planning round ~20 long before the executors break a sweat.

    ``edges`` must contain both directions of each undirected edge (as
    ``co_occurrence_edges`` emits). Isolated vertices keep their own id
    as the component label. Deterministic: min is order-independent.
    ``stats`` (optional) records ``algorithm`` ("label_propagation" or
    "hybrid_contraction"), ``prop_rounds`` executed, and the contraction
    round count when the scale path engages.
    """
    # the edge list is re-joined every round — materialize it once instead
    # of re-running its (possibly expensive) derivation per iteration
    edges = edges.select(src, dst).localCheckpoint()

    # Small-graph fast path: after heavy pruning (e.g. LSH pairs at a
    # high threshold) the edge set is often well under a million rows —
    # a few MB — while the iterative path still pays its per-round job
    # floor (~0.3-0.5 s x O(diameter) rounds of scheduling, probes,
    # checkpoints). Below ``driver_max_edges`` the edge list is pulled to
    # the driver and path-compressed union-find computes the exact same
    # min-id labels (property-tested against both distributed paths).
    # Driver memory is bounded by the guard (1M edges = 16 MB of int64
    # pairs); the vertex table STAYS distributed — labels broadcast back
    # and isolated vertices fall through the left join. 0 disables,
    # forcing the distributed path (the auto-selection tests use this;
    # billion-edge graphs never pass the guard).
    # one LIMIT-bounded pull decides the path AND delivers the fast path's
    # input: on checkpointed blocks a limit+collect costs the same one job
    # the old count() did, so the separate toPandas() job disappears; the
    # over-limit case (real scale) pays a bounded ≤(max+1)-row pull and
    # falls through to the distributed rounds unchanged
    pdf = (
        edges.limit(driver_max_edges + 1).toPandas()
        if driver_max_edges
        else None
    )
    if pdf is not None and len(pdf) <= driver_max_edges:
        n_edges = len(pdf)
        from ..operators.decisions import record

        record(
            "connected_components",
            n_edges=n_edges,
            driver_max_edges=driver_max_edges,
            path="driver_union_find",
        )
        if stats is not None:
            stats["algorithm"] = "driver_union_find"
            stats["n_edges"] = n_edges
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        srcs, dsts = pdf[src].tolist(), pdf[dst].tolist()
        for a, b in zip(srcs, dsts):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp_min: dict = {}
        touched = set(srcs)
        touched.update(dsts)
        for node in touched:
            root = find(node)
            cur = comp_min.get(root)
            comp_min[root] = node if cur is None or node < cur else cur
        rows = [(node, comp_min[find(node)]) for node in touched]
        spark = vertices.sparkSession
        schema = vertices.select(F.col(id_col).alias("node")).schema
        lbl = _local_label_df(
            spark, rows, schema["node"].dataType.simpleString()
        )
        return (
            vertices.select(F.col(id_col).alias("node"))
            .join(F.broadcast(lbl), "node", "left")
            .select("node", F.coalesce("label", "node").alias("label"))
        )

    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()

    # Convergence probe: under min-propagation a node's label never
    # increases, so for INTEGRAL labels the TOTAL label sum is strictly
    # decreasing until the fixpoint — an unchanged sum IS convergence.
    # One scalar aggregate over the (vertex-sized, checkpointed) label
    # table per round, replacing a full old⋈new join + count.
    # decimal(38,0): exact at any node count (1e9 bigint ids overflow a
    # bigint sum). The sum probe is ONLY sound for integral ids: casting
    # a string label to decimal yields NULL under non-ANSI Spark (None ==
    # None would report convergence after round 1) and lexicographic min
    # ('10' < '9') breaks monotonicity even for numeric strings. For any
    # non-integral id type the probe is the order-independent
    # count+bit_xor(xxhash64) signature the contraction path already
    # uses — type-agnostic, one scalar aggregate, 2^-64 false-fixpoint
    # odds per round.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = vertices.schema[id_col].dataType
    _sum_probe_ok = isinstance(id_type, (ByteType, ShortType, IntegerType, LongType))

    def _label_sum(lb) -> object:
        if _sum_probe_ok:
            return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        row = lb.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(node, label))"), F.lit(0)).alias("h"),
        ).first()
        return (int(row["n"]), int(row["h"]))

    prev_sum = _label_sum(labels)
    converged = False
    executed = 0
    for rnd in range(min(prop_rounds, max_iter)):
        executed += 1
        if rnd == 0:
            # round-1 fusion: initial labels are identities, so the
            # neighbor-label stream is just the edge list re-aimed —
            # the full edges⋈labels join would produce exactly this
            neigh = edges.select(F.col(dst).alias("node"), F.col(src).alias("label"))
        else:
            neigh = (
                edges.join(labels, edges[src] == labels["node"])
                .select(F.col(dst).alias("node"), "label")
            )
        new_labels = (
            labels.unionByName(neigh).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        labels = new_labels
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["prop_rounds"] = executed
    if converged:
        if stats is not None:
            stats["algorithm"] = "label_propagation"
        return labels
    # High-diameter: contract by current labels and finish in O(log n).
    # Each quotient node is a label value (an original node id); edges map
    # endpoints through their labels. Self-loops/duplicates are dropped by
    # the contraction's canonicalization.
    if stats is not None:
        stats["algorithm"] = "hybrid_contraction"
    sl = labels.select(F.col("node").alias("_sn"), F.col("label").alias("_sl"))
    dl = labels.select(F.col("node").alias("_dn"), F.col("label").alias("_dl"))
    quotient_edges = (
        edges.join(sl, edges[src] == sl["_sn"])
        .join(dl, edges[dst] == dl["_dn"])
        .select(F.col("_sl").alias("qsrc"), F.col("_dl").alias("qdst"))
    )
    quotient_vertices = labels.select(F.col("label").alias("qnode")).distinct()
    comp = connected_components_contraction(
        quotient_vertices,
        quotient_edges,
        id_col="qnode",
        src="qsrc",
        dst="qdst",
        max_iter=max_iter,
        stats=stats,
    ).select(F.col("node").alias("_q"), F.col("label").alias("_comp"))
    return (
        labels.join(comp, labels["label"] == comp["_q"])
        .select("node", F.col("_comp").alias("label"))
    )


def connected_components_contraction(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the billion-edge scale path: O(log n) rounds
    instead of label propagation's O(component diameter).

    Per round, over the undirected neighbor view of the current edge set:

    - large-star: every neighbor v > u re-links to m = min(N(u) ∪ {u});
      long chains fold toward small ids from every node at once.
    - small-star: every neighbor v ≤ u (and u itself) links to the
      smallest such neighbor; stars flatten to height one.

    Both steps are one groupBy-min + one hash join on the node id — the
    same shuffle family as label propagation, just fewer rounds. The edge
    set is canonicalized (a < b) and deduped each round, so it only
    shrinks toward the final star forest. Fixpoint detection is one
    count+checksum aggregate per round; lineage is cut per round with an
    eager localCheckpoint. Returns (node, label) with isolated vertices
    labeling themselves; labels are component minima, identical to
    ``connected_components`` (property-tested against union-find).
    ``stats["rounds"]`` records the executed round count when given.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def undirected(ed: DataFrame) -> DataFrame:
        return ed.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            ed.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    def canon(ed: DataFrame) -> DataFrame:
        return (
            ed.select(
                F.least(F.col("u"), F.col("v")).alias("a"),
                F.greatest(F.col("u"), F.col("v")).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def signature(ed: DataFrame) -> tuple[int, int]:
        # bit_xor: order-independent and overflow-free (ANSI mode rejects
        # a plain SUM of xxhash64 values)
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = signature(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star
        und = undirected(e)
        mins = (
            und.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )
        large = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # no checkpoint between the stars: a 2-join lineage per round is
        # cheap to plan, and skipping the mid-round materialization saves
        # one job per round
        e = canon(large)
        # small-star over parent-oriented edges (v ≤ u after large-star)
        und = undirected(e)
        low = und.where(F.col("v") <= F.col("u"))
        mins = low.groupBy("u").agg(F.min("v").alias("m"))
        small = low.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        e = canon(small).localCheckpoint()
        new_sig = signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edge set is a star forest rooted at component minima
    roots = e.groupBy(F.col("b").alias("node")).agg(F.min("a").alias("label"))
    return (
        vertices.select(F.col(id_col).alias("node"))
        .join(roots, "node", "left")
        .select("node", F.coalesce("label", "node").alias("label"))
    )


def bfs_hops(
    vertices: DataFrame,
    edges: DataFrame,
    seed: int,
    max_hops: int = 4,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source BFS: minimum hop distance from ``seed`` to every
    vertex reachable within ``max_hops``. Returns (node, hops BIGINT),
    seed included at hops 0.

    Per round: one keyed join (frontier ⋈ edges on src) + distinct + one
    anti-join against the settled set — frontier-sized state, no global
    structure, the standard distributed BFS. Lineage is cut per round
    with ``localCheckpoint`` (same rationale as ``connected_components``);
    the loop exits early on an empty frontier, so ``max_hops`` is a cap,
    not a fixed cost. Deterministic: hop numbers are exact integers and a
    node's first discovery round is partition-order independent.

    ``edges`` must contain both directions of each undirected edge.
    """
    edges = edges.select(src, dst).localCheckpoint()
    seed_df = vertices.select(F.col(id_col).alias("node")).where(
        F.col("node") == seed
    )
    dist = seed_df.withColumn("hops", F.lit(0)).localCheckpoint()
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return dist.select("node", F.col("hops").cast("bigint").alias("hops"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-core: the maximal subgraph where every vertex keeps degree ≥ k.

    Iterative peeling — each round recomputes degrees WITHIN the current
    alive set (two semi-join-shaped keyed joins + one count aggregate)
    and drops every vertex below k simultaneously; the fixpoint is
    detected by an unchanged alive count. O(peel depth) rounds, each
    linear in surviving edges; lineage cut per round (localCheckpoint),
    same rationale as ``connected_components``. Returns
    (node, core_degree BIGINT) for core members only. Deterministic:
    simultaneous removal has no order dependence.

    ``edges`` must contain both directions of each undirected edge.
    """
    edges = edges.select(src, dst).localCheckpoint()

    def _deg(alive: DataFrame, out: str) -> DataFrame:
        return (
            edges.join(alive.withColumnRenamed("node", src), src)
            .join(alive.withColumnRenamed("node", dst), dst)
            .groupBy(src)
            .agg(F.count(F.lit(1)).alias(out))
        )

    alive = edges.select(F.col(src).alias("node")).distinct().localCheckpoint()
    n = alive.count()
    for _ in range(max_iter):
        nxt = (
            _deg(alive, "deg")
            .where(F.col("deg") >= k)
            .select(F.col(src).alias("node"))
            .localCheckpoint()
        )
        m = nxt.count()
        alive = nxt
        if m == n:
            break
        n = m
    return _deg(alive, "core_degree").select(
        F.col(src).alias("node"), F.col("core_degree").cast("bigint").alias("core_degree")
    )


def bounded_min_cost(
    edges: DataFrame,
    seed: int,
    max_hops: int = 4,
    cost_col: str = "cost",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source minimum path cost over walks of ≤ ``max_hops`` edges
    (bounded Bellman-Ford). Returns (node, min_cost BIGINT), seed at 0.

    Round k of the relaxation yields the exact minimum over all ≤k-edge
    walks, so ``max_hops`` fixed rounds ARE the semantics (not a
    convergence heuristic) — no convergence probe needed. Per round: one
    keyed join (tentative dists ⋈ edges on src) + one min-groupBy; state
    is one row per reached node, lineage cut per round. Costs are BIGINT
    throughout — integer relaxation is shuffle-order independent, which
    is what makes the result reproducible on retries at cluster scale.

    ``edges`` must contain both directions of each undirected edge.
    """
    e = edges.select(src, dst, cost_col).localCheckpoint()
    spark = edges.sparkSession
    from ..tables import local_df

    # LocalRelation seed (tables.local_df): the list-rows path plans a
    # defaultParallelism-slice Python RDD, and this localCheckpoint then
    # pays one Python-worker roundtrip per slice before the loop starts
    dist = local_df(
        spark, [(seed, 0)], "node bigint, min_cost bigint"
    ).localCheckpoint()
    for _ in range(max_hops):
        cand = dist.join(e, dist["node"] == e[src]).select(
            F.col(dst).alias("node"),
            (F.col("min_cost") + F.col(cost_col)).alias("min_cost"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("min_cost").alias("min_cost"))
            .localCheckpoint()
        )
    return dist.select("node", F.col("min_cost").cast("bigint").alias("min_cost"))


def multi_source_bfs(
    seeds: DataFrame,
    edges: DataFrame,
    max_hops: int = 3,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from EVERY seed to every
    vertex within ``max_hops`` of it. Returns (root, node, hops BIGINT),
    each seed included at hops 0 from itself.

    Same per-round shape as :func:`bfs_hops` with a composite (root,
    node) settled set: one keyed join (frontier ⋈ edges on src) +
    distinct + one anti-join per round, lineage cut per round. State is
    Σ ball sizes — the frontier of all sources expands in ONE job per
    round rather than |seeds| sequential BFS runs, which is what makes
    seed-set centralities feasible on a cluster.

    ``edges`` must contain both directions of each undirected edge.
    """
    edges = edges.select(src, dst).localCheckpoint()
    dist = (
        seeds.select(F.col(id_col).alias("root"))
        .withColumn("node", F.col("root"))
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("root", "node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select("root", F.col(dst).alias("node"))
            .distinct()
            .join(dist.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("root", "node")
    return dist.select(
        "root", "node", F.col("hops").cast("bigint").alias("hops")
    )


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 30,
    max_iter: int = 200,
    stats: dict | None = None,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the
    spider-trap detector a web-crawl / citation pipeline runs before
    trusting PageRank-style scores (reference scope: graph analytics
    over derived edges, neo4j_queries.py; SCC itself is an extension).
    Returns (node, label) with label = the smallest member id of the
    node's SCC — isolated vertices and DAG nodes label themselves.

    Distributed path: Fleischer-style forward-backward intersection via
    MIN-ID COLORING (Orzan). Each outer round (1) propagates
    color(v) = min{u : u ->* v} forward to fixpoint over the remaining
    subgraph — same per-round shape and decreasing-sum convergence probe
    as :func:`connected_components`, but along edge DIRECTION only;
    (2) every color class's root r (color(r) = r, the class minimum)
    anchors a backward BFS restricted to its own color class, and the
    reached set is EXACTLY SCC(r): membership proof — for v in the
    class, any u ->* v also reaches r through v's v ->* r path, so
    u >= r, and every intermediate w on a v ->* r path satisfies
    r ->* w ->* r, keeping the restricted BFS closed and complete.
    All color classes resolve their root's SCC in the SAME round — the
    outer loop runs O(SCC-DAG chain depth) times, not O(#SCCs).

    Driver fast path (same guard/contract as ``connected_components``):
    under ``driver_max_edges`` the edge list is pulled once and an
    iterative Tarjan computes identical min-id labels; the vertex table
    stays distributed and isolated vertices fall through the left join.
    Lineage is cut per round with eager localCheckpoints.
    """
    # Shared contract for BOTH paths (r10 advisor): the component universe
    # is the VERTEX table — edges touching ids absent from it are dropped
    # up front. Without this, the driver-Tarjan path labeled every edge
    # endpoint (a cycle through a dangling id could yield a non-vertex
    # label) while the distributed path semi-joined per round, so the two
    # auto-selected paths disagreed on graphs with dangling endpoints.
    vset = vertices.select(F.col(id_col).alias("node"))
    edges = (
        edges.select(src, dst)
        .join(vset.select(F.col("node").alias(src)), src, "left_semi")
        .join(vset.select(F.col("node").alias(dst)), dst, "left_semi")
        .localCheckpoint()
    )
    # path decision + fast-path input in ONE bounded pull (see the
    # identical move in connected_components): the separate count() job
    # is gone on the driver path; the distributed path still counts the
    # (checkpointed) edges for its stats
    pdf = (
        edges.limit(driver_max_edges + 1).toPandas()
        if driver_max_edges
        else None
    )
    if pdf is not None and len(pdf) <= driver_max_edges:
        n_edges = len(pdf)
        from ..operators.decisions import record

        record(
            "strongly_connected_components",
            n_edges=n_edges,
            driver_max_edges=driver_max_edges,
            path="driver_tarjan",
        )
        if stats is not None:
            stats["algorithm"] = "driver_tarjan"
            stats["n_edges"] = n_edges
        adj: dict = {}
        touched: set = set()
        for a, b in zip(pdf[src].tolist(), pdf[dst].tolist()):
            adj.setdefault(a, []).append(b)
            touched.add(a)
            touched.add(b)
        # iterative Tarjan (explicit stack — no recursion limit)
        index: dict = {}
        low: dict = {}
        on_stack: set = set()
        stack: list = []
        label: dict = {}
        counter = [0]

        def _scc_from(v0) -> None:
            work = [(v0, 0)]
            while work:
                v, pi = work[-1]
                if pi == 0:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append(v)
                    on_stack.add(v)
                recursed = False
                succs = adj.get(v, ())
                for i in range(pi, len(succs)):
                    w2 = succs[i]
                    if w2 not in index:
                        work[-1] = (v, i + 1)
                        work.append((w2, 0))
                        recursed = True
                        break
                    if w2 in on_stack and index[w2] < low[v]:
                        low[v] = index[w2]
                if recursed:
                    continue
                work.pop()
                if work:
                    pv = work[-1][0]
                    if low[v] < low[pv]:
                        low[pv] = low[v]
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w2 = stack.pop()
                        on_stack.discard(w2)
                        comp.append(w2)
                        if w2 == v:
                            break
                    m = min(comp)
                    for w2 in comp:
                        label[w2] = m

        for v in touched:
            if v not in index:
                _scc_from(v)
        spark = vertices.sparkSession
        id_type = vertices.select(F.col(id_col).alias("node")).schema[
            "node"
        ].dataType.simpleString()
        lbl = _local_label_df(
            spark, [(n, label[n]) for n in touched], id_type
        )
        return (
            vertices.select(F.col(id_col).alias("node"))
            .join(F.broadcast(lbl), "node", "left")
            .select("node", F.coalesce("label", "node").alias("label"))
        )

    if stats is not None:
        stats["algorithm"] = "fwbw_coloring"
        stats["n_edges"] = edges.count()
    remaining = vertices.select(F.col(id_col).alias("node")).localCheckpoint()
    done = None
    for outer in range(max_outer):
        e = (
            edges.join(
                remaining.select(F.col("node").alias(src)), src, "left_semi"
            )
            .join(remaining.select(F.col("node").alias(dst)), dst, "left_semi")
            .localCheckpoint()
        )
        # phase 1: forward min-color FIXPOINT (label sum strictly
        # decreases until convergence — same probe as CC; integral ids
        # only, which the registered graphs satisfy). Fixpoint is
        # LOAD-BEARING for correctness, not just quality: phase 2's
        # same-color restriction assumes color(v) = min{u : u ->* v};
        # a truncated propagation splits an SCC across color classes
        # and the leftover fragment — strong connectivity broken by the
        # removed members — would resolve to WRONG labels in later
        # rounds. So an unconverged loop must raise, never fall through
        # (max_iter bounds rounds per SCC-diameter; the driver-Tarjan
        # path has no such bound and handles <=1M-edge graphs).
        colors = remaining.select(
            "node", F.col("node").alias("color")
        ).localCheckpoint()
        prev = colors.agg(
            F.sum(F.col("color").cast("decimal(38,0)"))
        ).first()[0]
        for _ in range(max_iter):
            msgs = e.join(colors, e[src] == colors["node"]).select(
                F.col(dst).alias("node"), "color"
            )
            colors = (
                colors.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("color").alias("color"))
                .localCheckpoint()
            )
            cur = colors.agg(
                F.sum(F.col("color").cast("decimal(38,0)"))
            ).first()[0]
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                f"SCC forward coloring did not reach fixpoint within "
                f"max_iter={max_iter} rounds — the graph holds a "
                f"min-id propagation chain longer than that (e.g. a "
                f"directed cycle of > max_iter nodes). Raise max_iter; "
                f"truncating here would silently mislabel the SCC."
            )
        # phase 2: backward BFS from every class root, restricted to the
        # root's color class; reached set = SCC(root)
        member = colors.where(F.col("node") == F.col("color")).select(
            "node", F.col("color").alias("label")
        ).localCheckpoint()
        frontier = member
        while True:
            preds = (
                e.join(frontier, e[dst] == frontier["node"])
                .select(F.col(src).alias("node"), "label")
                .distinct()
                .join(
                    colors.withColumnRenamed("color", "label"),
                    ["node", "label"],
                    "left_semi",
                )
                .join(member.select("node"), "node", "left_anti")
                .localCheckpoint()
            )
            if preds.isEmpty():
                break
            member = member.unionByName(preds).localCheckpoint()
            frontier = preds
        done = member if done is None else done.unionByName(member)
        remaining = remaining.join(
            member.select("node"), "node", "left_anti"
        ).localCheckpoint()
        if remaining.isEmpty():
            break
    else:
        raise RuntimeError(
            f"SCC did not resolve within {max_outer} outer rounds"
        )
    if stats is not None:
        stats["outer_rounds"] = outer + 1
    return done.localCheckpoint()
