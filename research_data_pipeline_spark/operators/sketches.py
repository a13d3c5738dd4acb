"""Approximate/sketch operators — the 100 TB substitutes for exact
statistics when exactness stops being worth the shuffle.

Exact counterparts exist in the query suite (countDistinct, median,
mode); these trade bounded error for one-pass mergeability:

- ``approx_distinct``: HyperLogLog++ (`approx_count_distinct`) — fixed
  few-KB state per group vs an exact distinct shuffle.
- ``approx_quantiles``: Greenwald-Khanna (`percentile_approx`) with an
  explicit accuracy knob.
- ``hash_sample``: DETERMINISTIC downsampling by id hash — unlike
  ``df.sample`` (seeded per-partition RNG, changes under repartition),
  the same row set survives retries, re-partitioning, and re-runs; the
  right way to cut a reproducible training subset.
- ``heavy_hitters``: frequent items above a support threshold
  (``freqItems``' one-pass lossy counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, group_by: list[str] | None = None,
                    rsd: float = 0.05) -> DataFrame:
    agg = F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    return df.groupBy(*group_by).agg(agg) if group_by else df.agg(agg)


def approx_quantiles(df: DataFrame, col: str, probabilities: list[float],
                     accuracy: int = 10_000) -> list[float]:
    return df.approxQuantile(col, probabilities, 1.0 / accuracy)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                buckets: int = 1_000_000) -> DataFrame:
    """Keep rows where hash(id) mod buckets < fraction·buckets."""
    cut = int(fraction * buckets)
    return df.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)) < cut)


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> list:
    [row] = df.stat.freqItems([col], support).collect()
    return sorted(row[f"{col}_freqItems"])
