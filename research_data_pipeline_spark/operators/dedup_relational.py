"""Deterministic key-based deduplication.

pandas ``drop_duplicates(subset, keep='first')`` (/root/reference/dags/
scripts/raw_to_tables.py:58, final_tables.py:113) keeps the first row in
*input order* — a notion Spark deliberately does not preserve across
shuffles. The scalable deterministic equivalent pins an explicit ordering
per key group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def deterministic_dedup(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep exactly one row per key group, chosen by ``order_by`` (first wins).

    One hash-shuffle on ``keys``; AQE handles skewed hot keys. Equivalent
    to ``dropDuplicates(keys)`` but stable under retries and partitioning
    — a hard requirement for idempotent sinks (SURVEY S7's
    ON CONFLICT DO NOTHING parity).
    """
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def dedup_exact(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Order-insensitive exact dedup (``dropDuplicates``) for when any
    representative row is acceptable."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()
