"""Temporal join operators Spark lacks natively: as-of join and
bounded-range self-join.

Both avoid the naive theta-join (BroadcastNestedLoopJoin) that would scan
O(n·m) pairs:

- ``asof_join``: the union-and-carry formulation — tag both sides, union,
  and carry the latest right-side row forward with a running window per
  key. One shuffle on the key, linear scan per partition; no pair space
  at all. This is how you as-of join two 10-TB tables.
- ``range_self_join``: bucketize event time by the gap width; rows can
  only pair with neighbors in the same or adjacent bucket, so exploding
  one side to its 3 candidate buckets turns the range predicate into a
  hash-join key. Each qualifying pair matches exactly once (the other
  side keeps a single bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the latest right row of the
    same key with right_ts <= left_ts (inclusive). Left rows keep NULLs
    when no right row precedes them.

    The right side must be unique per (key, right_ts) — dedupe upstream
    to pin tie semantics (DuckDB's ASOF JOIN has the same requirement for
    determinism).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_rts", F.lit(None).cast("timestamp"))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    # align schemas for the union
    lcols = [c for c in left.columns]
    lhs_u = lhs.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        "_side",
        *[F.col(c) for c in lcols if c not in (key, left_ts)],
        *[F.lit(None).cast(rhs.schema[c].dataType).alias(c) for c in right_cols],
    )
    rhs_u = rhs.select(
        F.col(key),
        "_ts",
        "_side",
        *[F.lit(None).cast(lhs.schema[c].dataType).alias(c) for c in lcols if c not in (key, left_ts)],
        *[F.col(c) for c in right_cols],
    ).withColumn("_r_ts_src", F.col("_ts"))
    lhs_u = lhs_u.withColumn("_r_ts_src", F.lit(None).cast("timestamp"))

    # right rows sort before left rows at equal timestamps → inclusive <=
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lhs_u.unionByName(rhs_u).select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in right_cols],
        F.last("_r_ts_src", ignorenulls=True).over(w).alias("_asof_ts"),
    )
    out = carried.where(F.col("_side") == 1).select(
        F.col(key),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in (key, left_ts)],
        *[F.col(f"_asof_{c}").alias(c) for c in right_cols],
        F.col("_asof_ts").alias(f"asof_{right_ts}"),
    )
    return out


def range_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_s: float,
) -> DataFrame:
    """All same-key row pairs (id_a < id_b) whose timestamps are within
    ``max_gap_s`` seconds — via gap-width time bucketing, not a nested
    loop. Returns (key, i, j, gap_s) where gap_s = t_j − t_i (signed)."""
    gap_us = int(max_gap_s * 1_000_000)
    base = df.select(
        F.col(key), F.col(id_col), F.unix_micros(F.col(ts)).alias("_us"),
        (F.unix_micros(F.col(ts)) / gap_us).cast("bigint").alias("_bkt"),
    )
    a = base.select(
        F.col(key),
        F.col(id_col).alias("i"),
        F.col("_us").alias("_us_i"),
        F.explode(
            F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)
        ).alias("_bkt"),
    )
    b = base.select(
        F.col(key), F.col(id_col).alias("j"), F.col("_us").alias("_us_j"), "_bkt"
    )
    return (
        a.join(b, [key, "_bkt"])
        .where(
            (F.col("i") < F.col("j"))
            & (F.abs(F.col("_us_j") - F.col("_us_i")) <= gap_us)
        )
        .select(
            key,
            "i",
            "j",
            ((F.col("_us_j") - F.col("_us_i")) / 1_000_000.0).alias("gap_s"),
        )
    )
