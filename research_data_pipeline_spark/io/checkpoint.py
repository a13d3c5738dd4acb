"""Compute-or-reuse checkpointing (SURVEY S9).

The reference's idempotency pattern — "if the CSV exists, read it,
otherwise compute and write it" (final_tables.py:12-26 and 5 more sites)
— as a parquet-based job wrapper. This is driver logic, not an operator;
at scale it's what makes a 12-hour pipeline resumable.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def compute_or_reuse(
    spark: SparkSession,
    path: str,
    compute: Callable[[], DataFrame],
    force: bool = False,
) -> DataFrame:
    """Return the checkpointed DataFrame at ``path`` if present, else run
    ``compute``, persist it, and return the re-read (so downstream reads
    the materialized, statistics-bearing parquet, not the live plan)."""
    marker = os.path.join(path, "_SUCCESS")
    if not force and os.path.exists(marker):
        return spark.read.parquet(path)
    df = compute()
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def invalidate(path: str) -> None:
    """Refresh-by-delete (S10; research_pipeline_dag.py:39-54)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
