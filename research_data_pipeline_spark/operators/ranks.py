"""Ranking operators, including pandas-parity integer ranks.

The reference stores author ranks computed by pandas
``rank(ascending=0).astype(int)`` (/root/reference/dags/scripts/
final_tables.py:161-164): ties get the *average* rank, then truncation.
Spark's rank()/dense_rank() cannot reproduce that directly; combining
rank() (= min rank of the tie group) with a tie-count window gives
floor(min_rank + (ties-1)/2) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def pandas_int_rank(
    df: DataFrame,
    metric: str,
    out_col: str = "rank",
    ascending: bool = False,
) -> DataFrame:
    """pandas average-rank truncated to int, descending by default.

    Note the global window: fine for dimension-sized inputs (the reference
    ranks 29k authors). For fact-scale ranking switch to a two-phase
    range-partitioned rank (orderBy + zipWithIndex-equivalent via
    ``row_number`` inside range partitions) — the reference semantics only
    ever rank an aggregated (small) table.
    """
    order = F.col(metric).asc() if ascending else F.col(metric).desc()
    w_rank = W.orderBy(order)
    w_ties = W.partitionBy(metric)
    return (
        df.withColumn("_min_rank", F.rank().over(w_rank))
        .withColumn("_ties", F.count(F.lit(1)).over(w_ties))
        .withColumn(
            out_col,
            F.floor((2 * F.col("_min_rank") + F.col("_ties") - 1) / 2.0).cast("bigint"),
        )
        .drop("_min_rank", "_ties")
    )


def spark_rank(df: DataFrame, metric: str, out_col: str = "rank", ascending: bool = False) -> DataFrame:
    """Plain SQL rank() (ties share min rank) — the idiomatic non-parity rank."""
    order = F.col(metric).asc() if ascending else F.col(metric).desc()
    return df.withColumn(out_col, F.rank().over(W.orderBy(order)).cast("bigint"))
