"""Snapshot diff — CDC between two versions of a keyed table.

A pipeline that re-lands a 100 TB table daily needs the delta, not the
table: what was added, what disappeared, what changed. This computes it
as ONE full-outer join on the key (the only shuffle; both sides hash-
partition on the key, so co-partitioned/bucketed snapshots diff with no
exchange at all) plus column-wise comparison for change detection —
deliberately NOT a row-hash compare, because rendering floats to
strings for hashing is engine- and locale-dependent while column
equality is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots sharing a schema.

    Returns one row per key present in either side: the key columns plus
    ``status`` ∈ {'added', 'removed', 'modified', 'unchanged'} and the
    old/new values of every compare column (``<col>_old`` / ``<col>_new``,
    NULL on the absent side). NULL-safe equality (`<=>`) makes NULL→value
    transitions count as modifications instead of vanishing.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
