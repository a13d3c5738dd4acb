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

    Dedup of (item, actor) happens before the self-join so join input is
    minimal; the join shuffles on ``item_col`` once (the identical
    distinct subplan on both sides collapses to one ReusedExchange).
    After that dedup each (src, dst) pair occurs at most once per item,
    so the weight is a plain ``count`` — COUNT(DISTINCT item) would give
    the same number while paying an extra expand + shuffle.
    """
    pairs = df.select(item_col, actor_col).distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{item_col}") == F.col(f"b.{item_col}"))
            & (F.col(f"a.{actor_col}") != F.col(f"b.{actor_col}")),
        )
        .groupBy(
            F.col(f"a.{actor_col}").alias("src"),
            F.col(f"b.{actor_col}").alias("dst"),
        )
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
) -> DataFrame:
    """Connected components by min-label propagation — the iterative
    algorithm shape (no single SQL plan computes a fixpoint).

    Each iteration is one join + one min-aggregate: every node adopts the
    smallest label among itself and its neighbors, until a pass changes
    nothing. Converges in O(component diameter) rounds.  Lineage is cut
    every round with an eager ``localCheckpoint`` — without it the plan
    doubles per iteration and the driver dies planning round ~20 long
    before the executors break a sweat. At the billion-edge scale you'd
    swap in the large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce", SoCC'14) to cut the round count
    to O(log n); per-round mechanics stay exactly this join + min-agg.

    ``edges`` must contain both directions of each undirected edge (as
    ``co_occurrence_edges`` emits). Isolated vertices keep their own id
    as the component label. Deterministic: min is order-independent.
    """
    # the edge list is re-joined every round — materialize it once instead
    # of re-running its (possibly expensive) derivation per iteration
    edges = edges.select(src, dst).localCheckpoint()
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges[src] == labels["node"])
            .select(F.col(dst).alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neigh).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "_old"), "node")
            .where(F.col("label") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
