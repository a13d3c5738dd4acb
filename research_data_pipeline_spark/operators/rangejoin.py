"""Binned interval (range) join — the scale-safe form of
``point BETWEEN start AND end``.

Spark has no native interval-join physical operator: a raw range
predicate between two facts compiles to BroadcastNestedLoopJoin (or a
cartesian) — O(n·m) comparisons that are fine at 10k rows and fatal at
100 TB. The standard fix (used by Databricks' range-join hints and
GeoSpark-style spatial binning) is to discretize time into fixed-width
bins: each point lands in exactly ONE bin, each interval is exploded to
every bin it covers, the join becomes an EQUI-join on the bin id that
Catalyst executes as a shuffled (or broadcast) hash join, and the exact
range predicate runs as a residual filter on the collision set only.

Because a point belongs to exactly one bin and an interval emits each
covered bin once, every qualifying (interval, point) pair meets exactly
once — no post-join dedup is needed, so the operator composes with
plain aggregations.

Sizing: work is Σ_interval ceil(len/bin_us) interval rows plus the
per-bin collision products, so ``bin_us`` should sit near the median
interval length — much smaller explodes long intervals into many rows,
much larger degrades toward per-bin cartesian. Both failure modes
degrade gracefully (correctness never depends on the bin width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    t_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row whose integer ``t_col`` falls in the
    CLOSED range [``start_col``, ``end_col``] of an ``intervals`` row.

    All three key columns must be integers on the same scale (epoch-µs
    in this repo). Returns intervals' columns + points' columns (names
    must not collide; rename beforehand). ``how='inner'`` only — the
    bin explosion makes outer semantics ambiguous at this layer; wrap
    with an anti/left join on the interval key for "no match" rows.
    """
    if how != "inner":
        raise ValueError("binned_interval_join supports how='inner' only")
    # integer `div`, not `/`: float division can round a point sitting one
    # µs inside a bin boundary into the neighboring bin and silently drop
    # the pair
    w = int(bin_width)
    ivl = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST(`{start_col}` AS BIGINT) div {w}"),
                F.expr(f"CAST(`{end_col}` AS BIGINT) div {w}"),
            )
        ),
    )
    pts = points.withColumn("_bin", F.expr(f"CAST(`{t_col}` AS BIGINT) div {w}"))
    return (
        ivl.join(pts, "_bin")
        .where(
            F.col(t_col).between(F.col(start_col), F.col(end_col))
        )
        .drop("_bin")
    )
