"""Vector similarity search over an embedding column (array<float>).

Everything stays in JVM expressions: the dot product is a left fold over
``zip_with`` in doubles — bit-identical to the DuckDB oracle's
``list_sum(list_transform(list_zip(...)))`` (verified), so thresholds and
rankings agree exactly across engines.

Scale path: brute force is the correctness baseline; sign-LSH bucketing
bounds the join fan-out (each vector only meets its bucket). For real
100 TB corpora you'd add an IVF variant with k-means centroids and probe
lists — the bucketed join shape below is the same, only the bucket
assignment changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


_INTEGRAL_TYPES = ("byte", "short", "int", "bigint")


def _require_integral_id(df: DataFrame, id_col: str) -> None:
    """The broadcast/blocked kernels carry ids as int64 numpy arrays and
    the tile schemas declare ``bigint`` — a string/decimal id would fail
    deep inside an Arrow batch. Fail fast at the API boundary instead."""
    dt = df.schema[id_col].dataType.simpleString()
    if dt not in _INTEGRAL_TYPES:
        raise TypeError(
            f"similarity id column {id_col!r} must be an integral type "
            f"(one of {_INTEGRAL_TYPES}), got {dt}; hash or zip your ids "
            "to bigint first (e.g. F.xxhash64 for opaque keys)"
        )


def _kernel_parts(sc, n: int) -> int:
    """Partition count for an Arrow kernel pass over ``n`` vectors:
    ≥512 vectors per task (the Python-worker roundtrip floor measured on
    the Lloyd path), capped at the session's parallelism, floor 4. A
    small corpus must not fan out to defaultParallelism near-empty
    Python workers per pass; a large one still uses the full machine —
    the same scale-adaptive rule ann_topk_ivf's refinement path and the
    d21 signature checkpoint already use."""
    return max(4, min(sc.defaultParallelism, -(-n // 512)))


_PAIRS_PER_TASK = 1 << 18  # ~262k scored pairs amortize a worker roundtrip ~50×


def _kernel_parts_pairs(sc, n_rows: int, n_cols: int) -> int:
    """Partition count for a kernel whose per-row work is O(n_cols) — the
    broadcast brute-force scans, where each task scores rows × all-vectors
    pairs. Sizing by ROWS (``_kernel_parts``) undersizes these: 512 rows
    of a 2k-vector corpus is ~1M pair scores ≈ 0.6 s of numpy per task
    while most of the machine idles (r14, measured on d13b). Sizing by
    PAIRS keeps each task ~50× the worker-roundtrip floor regardless of
    corpus shape; capped at session parallelism, floor 4 as everywhere."""
    return max(
        4, min(sc.defaultParallelism, -(-(n_rows * n_cols) // _PAIRS_PER_TASK))
    )


def _drop_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """A NULL embedding cannot participate in similarity: every matrix
    kernel would die on the inhomogeneous Arrow batch and every JVM fold
    would silently propagate NULL. Dropping at the API boundary is the
    documented contract (rows with missing features are not indexed);
    callers that must account for them anti-join against the result."""
    return df.where(F.col(vec_col).isNotNull())


# DuckDB twin of drop_nan_vectors below — AND this into an embeddings
# scan's WHERE clause so the oracle shares the engine's vector domain.
NAN_VECTOR_SQL = (
    "(embedding IS NULL OR len(list_filter(embedding, x -> isnan(x))) = 0)"
)


def drop_nan_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Vector-domain contract (nanemb, r14 — the e29 exclusion template):
    vectors CONTAINING an IEEE NaN component leave the similarity domain
    on BOTH engines at the loader. One NaN component turns every dot
    product / norm that touches the vector into NaN, and the engines
    then disagree SILENTLY: Spark SQL orders NaN ABOVE every real value,
    so a NaN cosine passes ``>= threshold`` gates and wins top-k windows
    while DuckDB's list arithmetic ranks differently (measured by
    ``scripts/probe_corpus.py nanemb`` at r13 HEAD: 9 silent ranking
    divergences, d09's pair count 57 → 18,777). A NaN inside an
    ``array<double>`` also collects back to the driver as Python None
    (object-dtype numpy batches), which is what killed d13b's Lloyd fold
    with a raw UFuncTypeError. NULL vectors are NOT decided here — they
    keep each caller's existing ``_drop_null_vectors`` / NULL-row
    semantics (the isNull disjunct only stops the NULL-propagating
    ``exists`` from dropping NULL rows as a side effect)."""
    return df.where(
        F.col(vec_col).isNull()
        | ~F.exists(vec_col, lambda x: F.isnan(x.cast("double")))
    )


# DuckDB twin of drop_nonfinite_vectors below — the FULL component
# contract (r15 nullemb widening): NULL components OR NaN components.
NONFINITE_VECTOR_SQL = (
    "(embedding IS NULL OR "
    "len(list_filter(embedding, x -> x IS NULL OR isnan(x))) = 0)"
)


def drop_nonfinite_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Full vector-domain contract (nullemb, r15 — the widening of
    ``drop_nan_vectors`` scheduled in registry.py's round-14-late
    frontier): vectors containing a NULL component OR a NaN component
    leave the similarity domain on BOTH engines at the loader. Spark's
    ``isnan`` returns FALSE for NULL, so a NULL-component vector passes
    the NaN-only filter; JVM folds then propagate NULL dots/cosines
    (comparisons → unknown → rows silently filtered or ranks drift)
    while the Arrow kernels see None → NaN in the float64 batch and die
    on the loud finite guard — neither is the declared result. Measured
    by ``scripts/probe_corpus.py nullemb`` at r14 HEAD: 9 silent
    divergences (the five cosine rankers, d36, d40, d60, d73). NULL
    vectors are NOT decided here — they keep each caller's existing
    ``_drop_null_vectors`` / NULL-row semantics (the isNull disjunct
    only stops the NULL-propagating ``exists`` from dropping NULL rows
    as a side effect)."""
    return df.where(
        F.col(vec_col).isNull()
        | ~F.exists(
            vec_col, lambda x: x.isNull() | F.isnan(x.cast("double"))
        )
    )


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in JVM expressions — exact but interpreted
    (~10µs/row: higher-order lambdas don't enter codegen). Use only for
    per-vector work (norms); pair-scale dots go through ``_dot_kernel``."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


@pandas_udf(DoubleType())  # DataType instance: no DDL parse at import time
def _dot_kernel(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched dot product preserving left-fold order.

    The accumulation loops over DIMENSIONS (k ascending) while numpy
    vectorizes over rows: each row's sum is acc = (((v0·w0) + v1·w1) + …),
    the exact IEEE sequence of the JVM fold and DuckDB's list_sum — so
    results are bit-identical to the oracle while running ~50× faster
    than the interpreted fold. numpy elementwise ops don't fuse (no FMA),
    which this exactness argument relies on.
    """
    if len(va) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    A = np.vstack(va.to_numpy())
    B = np.vstack(vb.to_numpy())
    acc = A[:, 0] * B[:, 0]
    for k in range(1, A.shape[1]):
        acc = acc + A[:, k] * B[:, k]
    return pd.Series(acc)


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn(out, F.sqrt(_dot(F.col("_v"), F.col("_v"))))


# above this row count the vector matrix no longer broadcasts; brute force
# falls back to the block-partitioned matrix join (and at real scale you
# use LSH/IVF, which cut the candidate space instead of tiling it)
MAX_BROADCAST_VECTORS = 200_000

# rows per block in the blocked matrix join: a 2048×2048 cosine tile is
# 32 MB of doubles — well inside an executor task's memory at any scale
BLOCK_ROWS = 2048

# above this many centroids the collected (ids, matrix, norms) tuple no
# longer belongs in a driver pull + executor broadcast: the auto-sized
# cell count grows as n/target_cell_rows, so at 10⁹ vectors the
# "centroid table" is a ~2M-vector matrix — the m18 docstring's "at
# 100 TB that pull becomes a broadcast-join against a stored centroid
# table" remedy, made a real guard (r13 verdict task 5). Above the
# threshold ``assign_cells`` switches to the block-partitioned centroid
# join below: the centroid side stays a DataFrame, vectors meet one
# 2048-centroid block per task, and the global argmax is a keyed
# aggregate — same downstream plan, no unbounded broadcast. 100k
# centroids × 64 dims × 8 B ≈ 51 MB, comfortably broadcastable; beyond
# that the blocked path's extra shuffle is cheaper than the OOM.
MAX_BROADCAST_CENTROIDS = 100_000


def _broadcast_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Materialize (ids, matrix, norms) for the broadcast side of a
    brute-force scan, rows sorted by id ASCENDING — the top-k kernel's
    tie-break (cosine desc, id asc) then falls out of one stable argsort
    over the whole batch instead of a per-query lexsort loop (r14).
    Norms use the same left-fold order as the oracle."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    if not rows:  # empty corpus: np.array([]) is 1-dim and [:, k] dies
        return ids, np.empty((0, 0), dtype=np.float64), np.empty(0)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.array([r[1] for r in rows], dtype=np.float64)[order]
    acc = M[:, 0] * M[:, 0]
    for k in range(1, M.shape[1]):
        acc = acc + M[:, k] * M[:, k]
    return ids, M, np.sqrt(acc)


def _cosine_block(A: np.ndarray, M: np.ndarray) -> np.ndarray:
    """All-pairs dot products of A (m×d) against M (n×d), accumulated in
    dimension order — each element gets the exact left-fold IEEE sequence
    of the JVM/DuckDB fold, vectorized as m×n outer updates."""
    acc = np.outer(A[:, 0], M[:, 0])
    for k in range(1, A.shape[1]):
        acc = acc + np.outer(A[:, k], M[:, k])
    return acc


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n: int | None = None,
    max_broadcast: int = MAX_BROADCAST_VECTORS,
) -> DataFrame:
    """All (i<j) pairs with cosine ≥ threshold — the embedding near-dup
    primitive.

    Block-broadcast brute force: the (small-side) vector matrix is
    broadcast once; each partition's batch computes an m×n cosine block in
    numpy and emits only the surviving pairs — no O(n²) join rows, no
    per-pair vector shipping. Above ``max_broadcast`` it switches to the
    block-partitioned matrix join (``_cosine_pairs_blocked``): still exact,
    but tiled over hash joins — no cartesian/nested-loop path exists at any
    n. At real corpus scale prefer LSH bucketing (``ann_topk_lsh``) or IVF,
    which cut the candidate space instead of tiling it.

    ``n`` is an optional known row count; pass it to skip the guard's
    count job."""
    import pandas as pd  # local: keep module import light

    from .decisions import record

    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    if n is None:
        n = df.count()
    record(
        "cosine_pairs",
        n=n,
        max_broadcast=max_broadcast,
        path="blocked" if n > max_broadcast else "broadcast",
    )
    if n > max_broadcast:
        return _cosine_pairs_blocked(df, id_col, vec_col, threshold, n=n)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(_broadcast_matrix(df, id_col, vec_col))

    def run(batches):
        ids_all, M, norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            C = _cosine_block(A, M)
            acc = A[:, 0] * A[:, 0]
            for k in range(1, A.shape[1]):
                acc = acc + A[:, k] * A[:, k]
            C = C / np.outer(np.sqrt(acc), norms)
            keep = (C >= threshold) & (qids[:, None] < ids_all[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"i": qids[r], "j": ids_all[c], "cosine": C[r, c]}
            )

    n_parts = _kernel_parts_pairs(df.sparkSession.sparkContext, n, n)
    return (
        df.select(id_col, vec_col)
        .repartition(n_parts)
        .mapInPandas(run, schema=f"i bigint, j bigint, cosine double")
    )


def _block_assign(df: DataFrame, id_col: str, vec_col: str, nb: int) -> DataFrame:
    """(id, vector, block) with an even deterministic hash blocking."""
    return df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("bigint").alias("_blk"),
    )


def _block_pairs_df(spark, nb: int, symmetric: bool):
    """Tiny driver-side (bi, bj) tile list: bi ≤ bj for symmetric pair
    enumeration (each unordered block pair once), full grid for query ×
    candidate tiling."""
    from ..tables import local_df

    pairs = [
        (bi, bj)
        for bi in range(nb)
        for bj in range(bi if symmetric else 0, nb)
    ]
    # LocalRelation (tables.local_df): the list-rows path would plan a
    # defaultParallelism-slice Python RDD whose every action pays
    # Python-worker roundtrips
    return local_df(spark, pairs, "bi bigint, bj bigint")


def _np_mat(series) -> np.ndarray:
    return np.array([list(v) for v in series], dtype=np.float64)


def _fold_norms(M: np.ndarray) -> np.ndarray:
    acc = M[:, 0] * M[:, 0]
    for k in range(1, M.shape[1]):
        acc = acc + M[:, k] * M[:, k]
    return np.sqrt(acc)


def _cosine_pairs_blocked(
    df: DataFrame, id_col: str, vec_col: str, threshold: float,
    block_rows: int = BLOCK_ROWS,
    n: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a block-partitioned matrix
    join — the big-n path where neither side broadcasts.

    Rows get a deterministic hash block id (~``block_rows`` rows per
    block); the driver enumerates the upper-triangular (bi ≤ bj) tile
    list; each side replicates to its tiles via a HASH join on the block
    id; a cogrouped Arrow kernel computes one m×n cosine tile per block
    pair and emits only surviving pairs. Total work is still O(n²) —
    inherent to exact all-pairs — but it is tiled across the cluster with
    bounded task memory, and no cartesian / broadcast-nested-loop join
    exists in the plan. Replication volume is O(n·nb) vectors, the
    standard blocked-GEMM trade. ``n`` forwards the caller's known row
    count so the big-n path doesn't pay a second full scan."""
    import pandas as pd

    spark = df.sparkSession
    if n is None:
        n = df.count()
    nb = max(1, -(-n // block_rows))
    e = _block_assign(df, id_col, vec_col, nb)
    # two fresh tile frames: reusing one triggers Spark's ambiguous
    # self-join analysis on the (bi, bj) columns
    tl = _block_pairs_df(spark, nb, symmetric=True)
    tr = _block_pairs_df(spark, nb, symmetric=True)
    left = e.join(F.broadcast(tl), e["_blk"] == tl["bi"]).select(
        "bi", "bj", F.col("_id").alias("_lid"), F.col("_v").alias("_lv")
    )
    right = e.join(F.broadcast(tr), e["_blk"] == tr["bj"]).select(
        "bi", "bj", F.col("_id").alias("_rid"), F.col("_v").alias("_rv")
    )

    def kernel(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"i": [], "j": [], "cosine": []})
        lids = l["_lid"].to_numpy(dtype=np.int64)
        rids = r["_rid"].to_numpy(dtype=np.int64)
        L, R = _np_mat(l["_lv"]), _np_mat(r["_rv"])
        C = _cosine_block(L, R) / np.outer(_fold_norms(L), _fold_norms(R))
        keep = C >= threshold
        if bi == bj:
            # diagonal tile: both sides hold the same rows; keep each
            # unordered pair once
            keep &= lids[:, None] < rids[None, :]
        else:
            keep &= lids[:, None] != rids[None, :]
        rr, cc = np.nonzero(keep)
        i = np.minimum(lids[rr], rids[cc])
        j = np.maximum(lids[rr], rids[cc])
        return pd.DataFrame({"i": i, "j": j, "cosine": C[rr, cc]})

    return (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(kernel, schema="i bigint, j bigint, cosine double")
    )


def ann_topk_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n: int | None = None,
    max_broadcast: int = MAX_BROADCAST_VECTORS,
) -> DataFrame:
    """Exact top-k neighbors per vector by cosine (desc, id asc on ties).

    Same block-broadcast design as ``cosine_pairs``: each partition scores
    its queries against the broadcast matrix and emits only k rows per
    query — the top-k selection happens inside the kernel, so no n² rows
    and no global window ever exist in the plan. Above ``max_broadcast``
    it switches to the block-partitioned matrix join
    (``_ann_topk_blocked``) — hash joins + per-tile top-k, no
    cartesian/nested-loop path at any n."""
    import pandas as pd

    from .decisions import record

    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    if n is None:
        n = df.count()
    record(
        "ann_topk_bruteforce",
        n=n,
        max_broadcast=max_broadcast,
        path="blocked" if n > max_broadcast else "broadcast",
    )
    if n > max_broadcast:
        return _ann_topk_blocked(df, id_col, vec_col, k, n=n)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(_broadcast_matrix(df, id_col, vec_col))

    def run(batches):
        ids_all, M, norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            C = _cosine_block(A, M)
            acc = A[:, 0] * A[:, 0]
            for kk in range(1, A.shape[1]):
                acc = acc + A[:, kk] * A[:, kk]
            C = C / np.outer(np.sqrt(acc), norms)
            C[qids[:, None] == ids_all[None, :]] = -np.inf  # mask self
            # ids_all is sorted ascending (_broadcast_matrix), so a STABLE
            # argsort of -C is exactly "cosine desc, neighbor id asc" —
            # the whole batch's top-k in one vectorized pass (r14; the
            # per-query lexsort loop was the kernel's Python hot spot)
            order = np.argsort(-C, axis=1, kind="stable")[:, :k]
            kk = order.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk),
                    "neighbor_id": ids_all[order].ravel(),
                    "rank": np.tile(np.arange(1, kk + 1), len(qids)),
                    "cosine": np.take_along_axis(C, order, axis=1).ravel(),
                }
            )

    n_parts = _kernel_parts_pairs(df.sparkSession.sparkContext, n, n)
    return (
        df.select(id_col, vec_col)
        .repartition(n_parts)
        .mapInPandas(
            run, schema="query_id bigint, neighbor_id bigint, rank bigint, cosine double"
        )
    )


def _ann_topk_blocked(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5,
    block_rows: int = BLOCK_ROWS,
    n: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors as a block-partitioned matrix join — the
    big-n path where the matrix no longer broadcasts.

    Full (query-block × candidate-block) tile grid; each tile's Arrow
    kernel emits only the per-tile top-k rows per query, so the global
    re-rank window sees ≤ nb·k candidates per query instead of n. Hash
    joins + cogroup only — no cartesian / nested-loop path at any n.
    ``n`` forwards the caller's known row count (no second scan)."""
    import pandas as pd

    spark = df.sparkSession
    if n is None:
        n = df.count()
    nb = max(1, -(-n // block_rows))
    e = _block_assign(df, id_col, vec_col, nb)
    tl = _block_pairs_df(spark, nb, symmetric=False)
    tr = _block_pairs_df(spark, nb, symmetric=False)
    left = e.join(F.broadcast(tl), e["_blk"] == tl["bi"]).select(
        "bi", "bj", F.col("_id").alias("_lid"), F.col("_v").alias("_lv")
    )
    right = e.join(F.broadcast(tr), e["_blk"] == tr["bj"]).select(
        "bi", "bj", F.col("_id").alias("_rid"), F.col("_v").alias("_rv")
    )

    def kernel(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(out)
        lids = l["_lid"].to_numpy(dtype=np.int64)
        rids = r["_rid"].to_numpy(dtype=np.int64)
        L, R = _np_mat(l["_lv"]), _np_mat(r["_rv"])
        C = _cosine_block(L, R) / np.outer(_fold_norms(L), _fold_norms(R))
        # sort candidate columns by id so one stable argsort of -C is
        # "cosine desc, id asc" for every query row at once (r14)
        corder = np.argsort(rids, kind="stable")
        rids = rids[corder]
        C = C[:, corder]
        C[lids[:, None] == rids[None, :]] = -np.inf  # mask self
        order = np.argsort(-C, axis=1, kind="stable")[:, :k]
        for row in range(len(lids)):
            sel = order[row]
            sel = sel[np.isfinite(C[row, sel])]
            out["query_id"].extend([lids[row]] * len(sel))
            out["neighbor_id"].extend(rids[sel])
            out["cosine"].extend(C[row, sel])
        return pd.DataFrame(out)

    cand = (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(kernel, schema="query_id bigint, neighbor_id bigint, cosine double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "cosine")
    )


def _lloyd_refine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    C: np.ndarray,
    iters: int,
) -> np.ndarray:
    """Distributed Lloyd refinement of the centroid matrix.

    Each iteration is ONE Arrow-batched pass that assigns every vector
    (argmax cosine against the broadcast centroids — cosine is
    scale-invariant in the centroid, so unnormalized means are
    equivalent to normalized) AND reduces it map-side to per-cell
    partial (count, sum-vector) rows: the pass emits at most
    n_cells rows per partition instead of one row per vector, so the
    driver pull is bounded by n_partitions × n_cells × dim — no
    per-vector shuffle at all (round 7 posexploded every vector into
    dim rows and shuffled n·dim rows per iteration; the partial-sum
    form is the map-side combine Catalyst could not see through the
    opaque mapInPandas). Empty cells keep their previous centroid.
    """
    import pandas as pd

    sc = df.sparkSession.sparkContext
    dim = C.shape[1]
    n_cells = C.shape[0]
    for _ in range(iters):
        bc = sc.broadcast(C)

        def cell_partials(batches):
            M = bc.value
            macc = M[:, 0] * M[:, 0]
            for kk in range(1, M.shape[1]):
                macc = macc + M[:, kk] * M[:, kk]
            mn = np.sqrt(macc)
            sums = np.zeros((n_cells, dim))
            counts = np.zeros(n_cells, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                # loud guard (r13 verdict task 2): a NaN component here
                # used to surface as a raw driver-side UFuncTypeError
                # (NaN in array<double> collects as object-dtype None)
                _require_finite_matrix(A, "lloyd_refine")
                acc = A[:, 0] * A[:, 0]
                for kk in range(1, A.shape[1]):
                    acc = acc + A[:, kk] * A[:, kk]
                S = _cosine_block(A, M) / np.outer(np.sqrt(acc), mn)
                cells = np.argmax(S, axis=1)
                np.add.at(sums, cells, A)
                counts += np.bincount(cells, minlength=n_cells)
            hit = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cell": hit.astype("int64"),
                    "cnt": counts[hit],
                    "s": [list(map(float, sums[c])) for c in hit],
                }
            )

        partials = (
            df.select(vec_col)
            .mapInPandas(
                cell_partials, schema="cell bigint, cnt bigint, s array<double>"
            )
            .collect()  # bounded: n_partitions × n_cells rows
        )
        newC = C.copy()
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in partials:
            sums[r["cell"]] += np.asarray(r["s"])
            counts[r["cell"]] += r["cnt"]
        hit = counts > 0
        newC[hit] = sums[hit] / counts[hit, None]
        C = newC
        bc.destroy()
    return C


def ann_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    n: int | None = None,
    max_broadcast: int = MAX_BROADCAST_VECTORS,
    materialize: bool = True,
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: vectors are assigned to the
    nearest of ``n_cells`` centroids; each query scans only its ``nprobe``
    nearest cells.

    Centroids start as deterministic seeds (the vectors with id <
    n_cells) so the default index is reproducible and oracle-checkable;
    ``lloyd_iters > 0`` refines them with distributed Lloyd iterations
    (``_lloyd_refine`` — one assignment pass + one bounded mean
    aggregation per iteration; recall-improving, property-tested) while
    the plan shape (broadcast centroids → one assignment pass → cell
    hash-join) is unchanged. Assignment is one Arrow-batched pass against the broadcast
    centroid matrix; candidate generation is a hash join on the cell id —
    per-query work drops from O(n) to O(n·nprobe/n_cells). Ties in
    centroid distance break toward the smaller centroid id, matching the
    oracle's ROW_NUMBER order. Cosines keep the dimension-ordered
    left-fold, so ranks agree bit-exactly across engines.

    The per-call ``assigned`` cache (read by both the query and member
    sides) is released before returning: with ``materialize=True`` (the
    default) the result is eagerly materialized with ``localCheckpoint``
    so the cache is consumed exactly once and library callers don't leak
    executor memory. ``materialize=False`` returns the lazy plan (for
    inspection/composition) and leaves the cache live — the CALLER must
    materialize the result exactly once and then clear it.
    """
    import pandas as pd

    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    if lloyd_iters > 0:
        # Refinement makes lloyd_iters + 1 full passes over the vectors
        # (one per iteration + the final index assignment); materialize
        # the projected frame once so each pass reads checkpointed
        # blocks instead of re-running the scan + null-drop. Partition
        # count scales with the data (≥512 vectors per task, capped at
        # defaultParallelism): each pass is an Arrow→numpy kernel whose
        # per-task cost is dominated by the Python-worker roundtrip, so
        # a small corpus must not fan out to 32 near-empty workers per
        # iteration, while a large one still uses the full machine.
        if n is None:
            n = df.count()
        parts = max(4, min(
            df.sparkSession.sparkContext.defaultParallelism, -(-n // 512)
        ))
        df = df.select(id_col, vec_col).repartition(parts).localCheckpoint()
    crows = sorted(
        df.where(F.col(id_col) < n_cells).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    cids = np.fromiter((r[0] for r in crows), dtype=np.int64, count=len(crows))
    if not crows:  # empty corpus: only the driver-side fold would die;
        C = np.empty((0, 0), dtype=np.float64)  # downstream Arrow
        cnorms = np.empty(0)  # kernels see no batches at all
    else:
        C = np.array([r[1] for r in crows], dtype=np.float64)
        if lloyd_iters > 0:
            C = _lloyd_refine(df, id_col, vec_col, C, lloyd_iters)
        cacc = C[:, 0] * C[:, 0]
        for kk in range(1, C.shape[1]):
            cacc = cacc + C[:, kk] * C[:, kk]
        cnorms = np.sqrt(cacc)
    bc = df.sparkSession.sparkContext.broadcast((cids, C, cnorms))

    def assign(batches):
        ids_c, M, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            acc = A[:, 0] * A[:, 0]
            for kk in range(1, A.shape[1]):
                acc = acc + A[:, kk] * A[:, kk]
            norms = np.sqrt(acc)
            S = _cosine_block(A, M) / np.outer(norms, cn)
            # ids_c is sorted ascending, so one STABLE argsort of -S is
            # exactly "ccos desc, cid asc" for every row (r14: replaces
            # the per-row lexsort + per-element list-building loop)
            order = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "_v": list(A),
                    "norm": norms,
                    "cell": ids_c[order[:, 0]],
                    "probes": list(ids_c[order]),
                }
            )

    schema = f"{id_col} bigint, _v array<double>, norm double, cell bigint, probes array<bigint>"
    if n is None:
        n = df.count()
    base = df.select(id_col, vec_col)
    if lloyd_iters <= 0:
        # size the scan for the kernel (≥512 vectors/task, see
        # _kernel_parts); the Lloyd path already sized and checkpointed
        # its partitioning above — no extra exchange
        base = base.repartition(
            _kernel_parts(df.sparkSession.sparkContext, n)
        )
    assigned = base.mapInPandas(assign, schema=schema).cache()
    # read twice: query side and member side

    from .decisions import record

    record(
        "ann_topk_ivf",
        n=n,
        max_broadcast=max_broadcast,
        path="broadcast" if n <= max_broadcast else "cell_join",
    )
    if n <= max_broadcast:
        out = _ivf_broadcast_topk(assigned, id_col, k)
        if materialize:
            out = out.localCheckpoint()
            assigned.unpersist()
        return out

    q = assigned.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("va"),
        F.col("norm").alias("na"), F.explode("probes").alias("cell"),
    )
    m = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("vb"),
        F.col("norm").alias("nb"), F.col("cell"),
    )
    cos = _dot_kernel(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        q.join(m, ["cell"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cell",
            F.col("rank").cast("bigint").alias("rank"), "cosine",
        )
    )
    if materialize:
        out = out.localCheckpoint()
        assigned.unpersist()
    return out


def _ivf_broadcast_topk(assigned: DataFrame, id_col: str, k: int) -> DataFrame:
    """Broadcast-index IVF scoring: the (id, vector, norm, cell) table is
    broadcast once and each partition scores its queries against only the
    members of their probed cells — no per-pair vector shipping, no n²
    rows. Same left-fold cosine sequence as the join path, so results are
    identical; used below ``MAX_BROADCAST_VECTORS``."""
    import pandas as pd

    rows = assigned.select(id_col, "_v", "norm", "cell").collect()
    ids = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.fromiter((r[2] for r in rows), dtype=np.float64, count=len(rows))
    cells = np.fromiter((r[3] for r in rows), dtype=np.int64, count=len(rows))
    cell_idx = {int(c): np.nonzero(cells == c)[0] for c in np.unique(cells)}
    bc = assigned.sparkSession.sparkContext.broadcast((ids, M, norms, cells, cell_idx))

    def run(batches):
        ids_all, Mm, nn, cc, cidx = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # batch queries by probe-set signature: every query sharing a
            # probe set scores against the same candidate matrix, so the
            # dominant cost (the query x candidate cosine block) runs as
            # ONE numpy matmul per distinct probe set instead of one
            # GEMV per query row (nprobe-of-n_cells sets are few, and
            # co-partitioned queries repeat them constantly)
            out = {"query_id": [], "neighbor_id": [], "cell": [], "rank": [], "cosine": []}
            groups: dict[tuple, list[int]] = {}
            for r in range(len(pdf)):
                groups.setdefault(tuple(pdf["probes"].iloc[r]), []).append(r)
            for probes, rws in groups.items():
                cand = np.concatenate(
                    [cidx.get(int(c), np.empty(0, dtype=np.int64)) for c in probes]
                )
                if len(cand) == 0:
                    continue
                # candidate ids ascending, so a stable argsort of -S is
                # "cosine desc, id asc" for every query row at once; the
                # per-row work left is only the self-exclusion on the
                # first k+1 entries (r14: replaces per-query lexsort)
                cand = cand[np.argsort(ids_all[cand], kind="stable")]
                Q = np.array(
                    [list(pdf["_v"].iloc[r]) for r in rws], dtype=np.float64
                )
                qn = np.fromiter(
                    (pdf["norm"].iloc[r] for r in rws), dtype=np.float64, count=len(rws)
                )
                S_all = _cosine_block(Q, Mm[cand]) / np.outer(qn, nn[cand])
                order_all = np.argsort(-S_all, axis=1, kind="stable")[:, : k + 1]
                for gi, r in enumerate(rws):
                    qid = int(pdf[id_col].iloc[r])
                    sel = order_all[gi]
                    top = sel[ids_all[cand[sel]] != qid][:k]
                    if len(top) == 0:
                        continue
                    out["query_id"].extend([qid] * len(top))
                    out["neighbor_id"].extend(ids_all[cand[top]])
                    out["cell"].extend(cc[cand[top]])
                    out["rank"].extend(range(1, len(top) + 1))
                    out["cosine"].extend(S_all[gi][top])
            yield pd.DataFrame(out)

    return assigned.mapInPandas(
        run,
        schema="query_id bigint, neighbor_id bigint, cell bigint, rank bigint, cosine double",
    )


def sign_lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket id: bit d = sign(vec[d]) ≥ 0.

    Deterministic and engine-portable (no RNG on executors). A production
    variant would use md5-derived pseudo-random hyperplanes — same bucket
    join shape.
    """
    v = _as_double(vec)
    bucket = None
    for d in range(n_planes):
        term = F.when(F.element_at(v, d + 1) >= 0, F.lit(1 << d)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("bigint")


def ann_topk_lsh(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same sign-LSH
    bucket, ranked by exact cosine. The bucket equality turns the O(n²)
    crossJoin into a hash join on the bucket key — the scale path."""
    df = _drop_null_vectors(df, vec_col)  # Arrow kernels die on NULLs
    e = with_norm(df, vec_col).select(
        F.col(id_col),
        F.col("_v"),
        F.col("norm"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    a = e.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("va"),
        F.col("norm").alias("na"), F.col("bucket"),
    )
    b = e.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket"),
    )
    cos = _dot_kernel(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        a.join(b, ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "bucket",
            F.col("rank").cast("bigint").alias("rank"), "cosine",
        )
    )


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    *,
    with_vec: bool = False,
    max_broadcast_centroids: int = MAX_BROADCAST_CENTROIDS,
    n: int | None = None,
) -> DataFrame:
    """Assign every vector to its cosine-nearest deterministic seed
    centroid (the vectors with id < ``n_cells`` — the ``ann_topk_ivf``
    convention) and return ``(id, cell BIGINT, ccos DOUBLE)`` plus,
    with ``with_vec=True``, the double vector ``_v`` and its left-fold
    ``norm`` (so downstream pair joins need no re-scan).

    This is THE shared assignment kernel for every auto-sized-cell
    operator (``semantic_dedup``, ``contrastive_pairs``, the d63/d64/m18
    audits via ``_seed_assign_with_cos``): one Arrow-batched pass per
    vector against the broadcast centroid matrix, vectorized n·n_cells
    block cosines — the interpreted JVM ``F.aggregate`` fold at
    corpus-scaled cell counts measured 68.7 s at 30× rows in m18's
    second draft, and the same shape in d44 was the r13 verdict's one
    plan-level finding. Ties break (ccos desc, cid asc) via np.lexsort,
    matching the oracles' ROW_NUMBER order; cosines keep the
    dimension-ordered left fold, so assignment is bit-exact vs SQL.

    Above ``max_broadcast_centroids`` the centroid side no longer
    belongs in a driver collect + broadcast (auto-sizing makes it
    corpus-proportional); assignment switches to a block-partitioned
    centroid JOIN: centroids stay a DataFrame cut into
    ``BLOCK_ROWS``-sized hash blocks, vectors meet one block per cogroup
    tile, each tile emits its block-best (ccos, cid) per vector, and a
    keyed max-struct aggregate picks the global winner — identical
    results (the fold arithmetic is blocking-independent; the reduce
    re-applies the exact tie order), bounded memory at any centroid
    count. Callers must apply the vector-domain contract first
    (``drop_nan_vectors``): both kernels raise loudly on a NaN
    component rather than let NaN win an argmax.
    """
    import pandas as pd

    from .decisions import record

    _require_integral_id(df, id_col)
    record(
        "assign_cells",
        n_cells=n_cells,
        max_broadcast_centroids=max_broadcast_centroids,
        path="blocked" if n_cells > max_broadcast_centroids else "broadcast",
    )
    base_schema = f"{id_col} bigint, cell bigint, ccos double"
    vec_schema = base_schema + ", _v array<double>, norm double"
    if n_cells > max_broadcast_centroids:
        return _assign_cells_blocked(
            df, id_col, vec_col, n_cells, with_vec=with_vec
        )
    crows = sorted(
        df.where(F.col(id_col) < n_cells).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    cids = np.fromiter((r[0] for r in crows), dtype=np.int64, count=len(crows))
    if not crows:  # empty corpus: the kernel sees no centroids and
        C = np.empty((0, 0), dtype=np.float64)  # yields nothing
        cnorms = np.empty(0)
    else:
        C = np.array([r[1] for r in crows], dtype=np.float64)
        _require_finite_matrix(C, "assign_cells(centroids)")
        cnorms = _fold_norms(C)
    bc = df.sparkSession.sparkContext.broadcast((cids, C, cnorms))

    def kernel(batches):
        ids_c, M, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0 or len(ids_c) == 0:
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            _require_finite_matrix(A, "assign_cells")
            norms = _fold_norms(A)
            S = _cosine_block(A, M) / np.outer(norms, cn)
            # ids_c ascending → argmax's first-maximum IS the
            # (ccos desc, cid asc) winner, whole batch at once (r14:
            # replaces the per-row lexsort + per-element list building)
            best = np.argmax(S, axis=1)
            out = {
                id_col: pdf[id_col].astype("int64"),
                "cell": ids_c[best],
                "ccos": S[np.arange(len(S)), best],
            }
            if with_vec:
                out["_v"] = list(A)
                out["norm"] = norms
            yield pd.DataFrame(out)

    src = df.select(id_col, vec_col)
    if n is not None:
        # callers that know the vector count size the kernel pass
        # (≥512 vectors/task — see _kernel_parts) instead of inheriting
        # the scan's box-width partitioning
        src = src.repartition(_kernel_parts(df.sparkSession.sparkContext, n))
    return src.mapInPandas(
        kernel, schema=vec_schema if with_vec else base_schema
    )


def _require_finite_matrix(A: np.ndarray, where: str) -> None:
    """Loud kernel-side twin of the loader-side ``drop_nan_vectors``
    contract: a NaN component must never reach an argmax/mean kernel —
    numpy's lexsort places NaN LAST while Spark SQL orders it FIRST, so
    a silent pass here is a silent cross-engine ranking divergence (and
    driver collects of NaN arrays come back as object-dtype None, the
    raw UFuncTypeError d13b used to die with)."""
    if A.size and np.isnan(A).any():
        # NOTE: a SQL NULL *component* inside the array also lands here —
        # Arrow/numpy materialize None as NaN in the float64 batch (the
        # nullemb probe's crash class). Loud either way; the r15/r16
        # schedule (registry.py) widens the loader contract to exclude
        # NULL components explicitly on both engines.
        raise ValueError(
            f"{where}: NaN (or NULL) vector component reached the "
            "assignment kernel; vectors containing non-finite "
            "components leave the vector domain at the loader "
            "(similarity.drop_nan_vectors — the nanemb contract). "
            "Filter the input before calling this operator."
        )


def _assign_cells_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    *,
    with_vec: bool = False,
    block_rows: int = BLOCK_ROWS,
) -> DataFrame:
    """Centroid-table join path of ``assign_cells`` — the >100k-centroid
    regime where the centroid matrix must not be collected/broadcast.

    Shape: both sides get deterministic hash blocks (vectors ~block_rows
    per block, centroids likewise); the (vector-block × centroid-block)
    tile grid is two crossed ``spark.range`` frames (never a driver-side
    list — at 10⁹ vectors the grid itself is 10⁸ rows); each cogroup
    tile runs the same fold-exact block-cosine kernel and emits ONE
    block-best (ccos, cid) row per vector per centroid block; a keyed
    max-struct aggregate ((ccos, -cid) — exact tie order, no float
    negation) picks the global cell. The n·n_cells dot products are the
    irreducible cost of EXACT assignment; what this path removes is the
    unbounded driver pull, not the FLOPs — at real 100 TB scale you cap
    centroid count or go hierarchical, and this operator keeps working
    either way."""
    import pandas as pd

    spark = df.sparkSession
    nb_c = max(1, -(-n_cells // block_rows))
    cents = df.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("_cid"),
        _as_double(F.col(vec_col)).alias("_cv"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb_c)).cast("bigint").alias("bj"),
    )
    n = df.count()
    nb_v = max(1, -(-n // block_rows))
    vecs = df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb_v)).cast("bigint").alias("bi"),
    )
    tiles = (
        spark.range(nb_v).select(F.col("id").alias("bi"))
        .crossJoin(spark.range(nb_c).select(F.col("id").alias("bj")))
    )
    # both sides replicate across the tile grid (vectors once per
    # centroid block, centroids once per vector block) — the same
    # discipline as _ann_topk_blocked's full (bi, bj) grid; each tile
    # then holds ≤ block_rows rows of each side
    left = vecs.join(tiles, "bi").select("bi", "bj", "_id", "_v")
    right = cents.join(tiles, "bj").select("bi", "bj", "_cid", "_cv")

    def tile_best(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"_id": [], "_ccos": [], "_cid": []}).astype(
                {"_id": "int64", "_ccos": "float64", "_cid": "int64"}
            )
        A, M = _np_mat(l["_v"]), _np_mat(r["_cv"])
        _require_finite_matrix(A, "assign_cells[blocked]")
        _require_finite_matrix(M, "assign_cells[blocked centroids]")
        cids = r["_cid"].to_numpy(dtype=np.int64)
        S = _cosine_block(A, M) / np.outer(_fold_norms(A), _fold_norms(M))
        # sort columns by cid so argmax's first-maximum is the exact
        # (ccos desc, cid asc) winner for every row at once (r14)
        corder = np.argsort(cids, kind="stable")
        best = corder[np.argmax(S[:, corder], axis=1)]
        return pd.DataFrame(
            {
                "_id": l["_id"].to_numpy(dtype=np.int64),
                "_ccos": S[np.arange(len(S)), best],
                "_cid": cids[best],
            }
        )

    # one row per (vector, centroid-block); cogroup repartitions BOTH
    # sides by the tile key, so each kernel call holds ≤ block_rows
    # vectors × ≤ block_rows centroids
    per_block = (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(tile_best, schema="_id bigint, _ccos double, _cid bigint")
    )
    win = per_block.groupBy("_id").agg(
        F.max(
            F.struct(F.col("_ccos").alias("c"), (-F.col("_cid")).alias("nc"))
        ).alias("w")
    ).select(
        F.col("_id").alias(id_col),
        (-F.col("w.nc")).cast("bigint").alias("cell"),
        F.col("w.c").alias("ccos"),
    )
    if not with_vec:
        return win
    ev = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    return win.join(ev, id_col).select(id_col, "cell", "ccos", "_v", "norm")


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 16,
    threshold: float = 0.8,
    target_cell_rows: int = 512,
    max_broadcast_centroids: int = MAX_BROADCAST_CENTROIDS,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: assign every vector to its
    cosine-nearest of ``n_cells`` deterministic seed centroids (the
    vectors with id < n_cells, as in ``ann_topk_ivf``), then mark as
    duplicate any vector whose cell contains an EARLIER (smaller-id)
    vector with cosine ≥ ``threshold``. Returns one row per vector:
    (id, cell BIGINT, is_dup BOOLEAN, dup_of BIGINT; -1 when kept).

    Scale shape: assignment is ONE Arrow-batched pass per vector against
    the broadcast centroid matrix (same kernel discipline as
    ``ann_topk_ivf`` — replaced the earlier crossJoin form, which pushed
    n·k vector rows through Arrow and paid an assignment shuffle;
    measured 3.5x faster end-to-end). The dup scan self-joins ON THE
    CELL KEY only (never all-pairs), but its pair space is Σ cell_pop²,
    so the cell count must GROW with the corpus: ``n_cells=None`` sizes
    it as ceil(n / target_cell_rows), keeping per-cell population — and
    thus pair work per row — constant, where a fixed k silently degrades
    to O(n²/k). The oracle-checked registered query (d26) uses
    ``n_cells=None`` too — its SQL derives the same max(16, ceil(n/512))
    from COUNT(*), so auto-sizing and cross-engine comparability coexist.
    Pass an explicit ``n_cells`` only when cell identity must be pinned
    independently of corpus size.

    Ties in centroid distance break toward the smaller centroid id
    (np.lexsort on (cid, -ccos)), matching the oracle's
    ROW_NUMBER(ORDER BY ccos DESC, cid ASC); cosines keep the
    dimension-ordered left fold, so assignment is bit-exact vs the SQL.
    """
    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    df = drop_nan_vectors(df, vec_col)  # nanemb vector-domain contract
    n = df.count() if n_cells is None else None
    if n_cells is None:
        n_cells = max(16, -(-n // target_cell_rows))
    sides = (
        assign_cells(
            df, id_col, vec_col, n_cells, with_vec=True,
            max_broadcast_centroids=max_broadcast_centroids, n=n,
        )
        .select(F.col(id_col).alias("_id"), "_v", "norm", "cell")
        .localCheckpoint()  # consumed three times: two join sides + output
    )
    assign = sides.select("_id", "cell")
    a = sides.select(
        F.col("_id").alias("_i"), F.col("cell"),
        F.col("_v").alias("va"), F.col("norm").alias("na"),
    )
    b = sides.select(
        F.col("_id").alias("_j"), F.col("cell"),
        F.col("_v").alias("vb"), F.col("norm").alias("nb"),
    )
    cos = _dot_kernel(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dup = (
        a.join(b, ["cell"])
        .where(F.col("_i") < F.col("_j"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .groupBy("_j")
        .agg(F.min("_i").alias("dup_of"))
    )
    return (
        assign.join(dup, assign._id == dup._j, "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("cell").cast("bigint").alias("cell"),
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
        )
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m_sub: int = 8,
    n_codes: int = 16,
    query_mod: int = 20,
    max_query_id: int | None = 2000,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC): split each vector into ``m_sub`` contiguous subvectors,
    quantize every subvector to the nearest of ``n_codes`` codebook
    entries (per-subspace codebooks seeded from the vectors with
    id < n_codes — the same deterministic-seed convention as
    ``ann_topk_ivf``), then answer the query batch (ids divisible by
    ``query_mod``) by scanning the CODES, not the vectors: the distance
    from query q to database vector x is the sum over subspaces of q's
    precomputed lookup-table entry for x's code.

    Returns (query_id, neighbor_id, rank, adc_e9) — the top ``k``
    neighbors per query by ADC distance, ascending, ties broken toward
    the smaller neighbor id. ``adc_e9`` is the ADC distance where every
    per-subspace squared-L2 term was floored to integer nano-units
    BEFORE summing, so both the code assignment (argmin over integers)
    and the ADC sum (integer addition, order-free) are exactly
    reproducible in any engine — no float-accumulation-order hazard.

    Scale shape (r14: both hot passes are Arrow kernels — the previous
    interpreted ``F.aggregate`` folds were the operator's measured wall,
    ~18 s of the 21 s sf0.1 task time; guide §4.2): the codebook side is
    ``n_codes`` rows pulled once and broadcast into the ENCODE kernel,
    which emits each vector's code (per-subspace argmin over
    nano-floored integer distances) plus, for query rows, the full
    distance LUT. The bounded LUT batch is then broadcast into the ADC
    SCAN kernel, which scores the code table against every query in
    numpy integer arithmetic and emits only its per-task top-k rows, so
    the global rank window sees ≤ tasks·k rows per query instead of n.
    The scan never touches the original vectors. Every per-subspace
    squared-L2 accumulates dimension-by-dimension (numpy elementwise ops
    don't fuse), reproducing the JVM/DuckDB left fold bit-for-bit before
    the integer floor; the ADC sums are pure int64 adds — order-free. At
    real scale you compose this with the IVF cell pruning of
    ``ann_topk_ivf`` (scan only probed cells); this operator is the
    in-cell ADC kernel. Mirrors FAISS IVFADC (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).
    """
    import pandas as pd

    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    # full vector-domain contract (r15 widening): a NaN component makes
    # every subspace distance NaN (Spark's FLOOR(...)::BIGINT silently
    # maps it to 0 where DuckDB refuses loudly — the d36 crash class),
    # and a NULL component slips past the NaN-only filter and poisons
    # the BIGINT distance column to float64; both leave the domain on
    # BOTH engines
    df = drop_nonfinite_vectors(df, vec_col)
    sc = df.sparkSession.sparkContext
    e = df.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    # codebook: bounded by construction (vid < n_codes), ascending cid so
    # argmin's first-minimum is the smaller-cid tie-break
    seed_rows = sorted(
        e.where(F.col("vid") < n_codes).collect(), key=lambda r: r["vid"]
    )
    cids = np.fromiter((r["vid"] for r in seed_rows), dtype=np.int64,
                       count=len(seed_rows))
    C = (
        np.array([r["v"] for r in seed_rows], dtype=np.float64)
        if seed_rows else np.empty((0, 0), dtype=np.float64)
    )
    bc_seeds = sc.broadcast((cids, C))
    n = e.count()  # sizes both kernel fan-outs (scale-adaptive, not the box)
    nc_eff = len(seed_rows)

    def encode(batches):
        cids_, C_ = bc_seeds.value
        for pdf in batches:
            if len(pdf) == 0 or len(C_) == 0:
                continue  # empty corpus/codebook: no codes, no queries
            lens = np.fromiter((len(v) for v in pdf["v"]), dtype=np.int64,
                               count=len(pdf))
            if ((lens % m_sub) != 0).any():
                bad = int(lens[(lens % m_sub) != 0][0])
                raise ValueError(
                    f"pq_adc_topk: vector length {bad} is not divisible "
                    f"by m_sub={m_sub}; trailing dimensions would be "
                    "silently dropped — pick m_sub dividing the dimension"
                )
            A = np.array([list(v) for v in pdf["v"]], dtype=np.float64)
            w = A.shape[1] // m_sub
            # D[row, m, ci]: nano-floored subspace distances — the exact
            # left-fold order of the oracle (dim-by-dim accumulation)
            D = np.empty((len(A), m_sub, len(cids_)), dtype=np.int64)
            for m in range(m_sub):
                for ci in range(len(cids_)):
                    acc = (A[:, m * w] - C_[ci, m * w]) ** 2
                    for kk in range(1, w):
                        d1 = (A[:, m * w + kk] - C_[ci, m * w + kk]) ** 2
                        acc = acc + d1
                    D[:, m, ci] = np.floor(acc * 1e9).astype(np.int64)
            code = cids_[np.argmin(D, axis=2)]  # first min = smallest cid
            qmask = (pdf["vid"].to_numpy(dtype=np.int64) % query_mod) == 0
            if max_query_id is not None:
                qmask &= pdf["vid"].to_numpy(dtype=np.int64) < max_query_id
            # lut layout: [seed_index * m_sub + m], seed indices ascending
            lut = [
                D[r].T.ravel().tolist() if qmask[r] else None
                for r in range(len(A))
            ]
            yield pd.DataFrame(
                {"vid": pdf["vid"], "code": list(code), "lut": lut}
            )

    enc = (
        # per-row encode work is n_codes × d flops — size by the scored
        # (row, code) pairs like the brute-force kernels
        e.repartition(_kernel_parts_pairs(sc, n, max(1, nc_eff)))
        .mapInPandas(
            encode, schema="vid bigint, code array<bigint>, lut array<bigint>"
        )
        .localCheckpoint()  # one encode pass feeds the LUT pull + the scan
    )
    # the query BATCH must not scale with the corpus — an ADC scan is
    # O(n_queries · n_codes_scanned), so tying queries to n makes the
    # registered query quadratic at scale (measured: 2.7 s → 93 s at
    # 10×). max_query_id pins a fixed deterministic batch, the real
    # ANN-serving shape; pass None to rank every query_mod-th vector.
    q_rows = sorted(
        enc.where(F.col("lut").isNotNull()).select("vid", "lut").collect(),
        key=lambda r: r["vid"],
    )
    qids = np.fromiter((r["vid"] for r in q_rows), dtype=np.int64,
                       count=len(q_rows))
    LUT = (
        np.array([r["lut"] for r in q_rows], dtype=np.int64).reshape(
            len(q_rows), nc_eff, m_sub
        )
        if q_rows else np.empty((0, nc_eff, m_sub), dtype=np.int64)
    )
    bc_lut = sc.broadcast((qids, LUT))
    bc_cids = sc.broadcast(cids)

    def adc_scan(batches):
        qids_, LUT_ = bc_lut.value
        cids_ = bc_cids.value
        for pdf in batches:
            if len(pdf) == 0 or len(qids_) == 0:
                continue
            nids = pdf["vid"].to_numpy(dtype=np.int64)
            codes_m = np.array([list(c) for c in pdf["code"]], dtype=np.int64)
            idx = np.searchsorted(cids_, codes_m)  # code value → seed index
            adc = LUT_[:, idx[:, 0], 0]
            for m in range(1, m_sub):
                adc = adc + LUT_[:, idx[:, m], m]  # int64 adds: order-free
            # per-task top-k per query (adc asc, nid asc): the global
            # window then ranks ≤ tasks·k candidates, a superset of the
            # true top-k by the standard partial-top-k argument
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids_)):
                row = adc[qi]
                sel = nids != qids_[qi]
                nid_s, row_s = nids[sel], row[sel]
                top = np.lexsort((nid_s, row_s))[:k]
                out_q.append(np.full(len(top), qids_[qi], dtype=np.int64))
                out_n.append(nid_s[top])
                out_d.append(row_s[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "adc_e9": np.concatenate(out_d),
                }
            )

    pairs = (
        enc.select("vid", "code")
        .repartition(_kernel_parts_pairs(sc, n, max(1, len(qids))))
        .mapInPandas(
            adc_scan, schema="query_id bigint, neighbor_id bigint, adc_e9 bigint"
        )
    )

    w = W.partitionBy("query_id").orderBy(
        F.col("adc_e9").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "adc_e9",
        )
    )


def ann_topk_multiprobe_lsh(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3, n_planes: int = 8
) -> DataFrame:
    """Multi-probe sign-LSH top-k: each QUERY probes its own bucket plus
    every bucket at Hamming distance 1 (one sign flipped) — the
    Lv et al. multi-probe trick (VLDB'07): recall of many hash tables
    from ONE index, paying query-side fan-out (n_planes+1 probes)
    instead of (n_planes+1)× index storage. Candidates still come from
    an equi-join on the bucket key (the scale path — never all-pairs);
    the probe fan-out is an explode on the query side only, so the
    INDEX side of the join is identical to ``ann_topk_lsh``'s.

    A vector sitting just across one hyperplane from its near-duplicate
    — the classic LSH miss — is recovered here; ties and ranking follow
    the exact-cosine discipline of the single-probe variant.
    """
    df = _drop_null_vectors(df, vec_col)  # Arrow kernels die on NULLs
    e = with_norm(df, vec_col).select(
        F.col(id_col),
        F.col("_v"),
        F.col("norm"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("bigint")
            for p in range(n_planes)
        ],
    )
    a = e.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("va"),
        F.col("norm").alias("na"), F.explode(probes).alias("bucket"),
    )
    b = e.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket"),
    )
    cos = _dot_kernel(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        a.join(b, ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"), "cosine",
        )
    )


def contrastive_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pos_threshold: float = 0.45,
    neg_lo: float = 0.30,
    n_cells: int | None = None,
    target_cell_rows: int = 512,
    max_broadcast_centroids: int = MAX_BROADCAST_CENTROIDS,
) -> DataFrame:
    """Within-cell contrastive pair mining: assign every vector to its
    cosine-nearest deterministic seed centroid (id < n_cells, the
    ``ann_topk_ivf`` convention), then label same-cell pairs 'positive'
    (cos ≥ ``pos_threshold``) or 'hard_negative' (``neg_lo`` ≤ cos <
    ``pos_threshold``) — the training-data miner for embedding models.

    Scale contract (the d26 lesson, enforced here at the OPERATOR
    layer): the pair space is Σ cell_pop², so ``n_cells=None`` sizes the
    cell count as ceil(n / target_cell_rows) — per-cell population, and
    thus pair work per row, stays constant as the corpus grows, where a
    fixed cell count degrades quadratically (measured 10.5× wall at 10×
    rows with 16 fixed cells — SCALE.md). The registered query (d44)
    uses auto-sizing too; its oracle derives the identical count from
    COUNT(*). Pass an explicit ``n_cells`` only when cell identity must
    be pinned independently of corpus size.

    Assignment goes through the shared Arrow ``assign_cells`` kernel
    (r13 verdict task 4: the earlier draft scored every vector against
    ALL centroids with interpreted JVM ``F.aggregate`` folds over a
    ``broadcast(cents)`` nested-loop join — with auto-sized n_cells =
    n/512 that is O(n²d/512) interpreted work, the exact shape m18's
    second draft measured at 68.7 s for 30× rows); pair cosines use the
    Arrow ``_dot_kernel`` (bit-identical left fold, ~50× the interpreted
    fold), so results stay engine-exact while both hot loops are
    vectorized. Above ``max_broadcast_centroids`` assignment takes the
    blocked centroid-table join path instead of an unbounded broadcast.
    """
    _require_integral_id(df, id_col)
    df = _drop_null_vectors(df, vec_col)
    df = drop_nan_vectors(df, vec_col)  # nanemb vector-domain contract
    n = df.count() if n_cells is None else None
    if n_cells is None:
        n_cells = max(16, -(-n // target_cell_rows))
    assign = (
        assign_cells(
            df, id_col, vec_col, n_cells, with_vec=True,
            max_broadcast_centroids=max_broadcast_centroids, n=n,
        )
        .select(F.col(id_col).alias("vid"), "cell", "_v", "norm")
        .localCheckpoint()  # consumed twice: the two pair-join sides
    )
    a = assign.select(
        F.col("vid").alias("i"), "cell",
        F.col("_v").alias("va"), F.col("norm").alias("na"),
    )
    b = assign.select(
        F.col("vid").alias("j"), F.col("cell").alias("cellb"),
        F.col("_v").alias("vb"), F.col("norm").alias("nb"),
    )
    return (
        a.join(b, (F.col("cell") == F.col("cellb")) & (F.col("i") < F.col("j")))
        .withColumn(
            "cosine",
            _dot_kernel(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cosine") >= neg_lo)
        .select(
            "i", "j", "cell", "cosine",
            F.when(F.col("cosine") >= pos_threshold, "positive")
            .otherwise("hard_negative")
            .alias("label"),
        )
    )

