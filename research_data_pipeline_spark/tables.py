"""Test-data table access (see TESTDATA.md).

All ``queries()`` callables load through here so the session is aligned
(UTC, AQE) regardless of who constructed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return ensure_parallelism(normalize_nanos(df))


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Restore scan parallelism for unsplittable inputs.

    A parquet file with one row group gives Spark exactly one split no
    matter what ``maxPartitionBytes`` says, so every scan-side stage —
    explode, regex, hashing, partial aggregation — serializes on ONE core
    (the sf0.1 test tables are all single-row-group: 600k lineitem rows
    on 1 of 32 cores). One cheap round-robin shuffle of the raw input
    restores full parallelism for everything downstream.

    Gated: only fires when the scan yields fewer than half the cluster's
    task slots. Real-scale inputs (many files / row groups) pass through
    untouched, so no shuffle is ever added at 100 TB. Catalyst still
    pushes filters and column pruning through the Repartition node, so
    scan pushdown is unaffected (asserted in test_plans.py). The explicit
    partition count keeps AQE from re-coalescing the tiny shuffle back to
    one partition.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if _scan_partitions(df) * 2 < target:
        return df.repartition(target)
    return df


# (plan-identity → scan split count): the .rdd probe compiles a physical
# plan (~0.1-0.2s, py4j round-trips) — too expensive to re-pay on every
# load() of the same static file. Keyed by the scan's logical plan text
# (embeds path + schema), not the path alone, so a changed file layout
# with a new session still re-probes.
_SCAN_PARTS: dict[str, int] = {}


def _scan_partitions(df: DataFrame) -> int:
    key = df._jdf.queryExecution().logical().toString()
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    return _SCAN_PARTS[key]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ad-hoc ``spark.sql`` works
    against the same normalized schemas the DataFrame queries see — the
    SQL-first entry point for users coming from the reference's
    Postgres/DuckDB workflow."""
    for name in TPCH_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def epoch_us(c) -> F.Column:
    """Epoch microseconds of a timestamp column, NTZ-tolerant.

    Parquet TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ; with
    the session pinned to UTC the cast is a no-op re-tag, matching DuckDB's
    naive-as-UTC ``epoch_us``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


def normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize parquet timestamp physical types to session-TZ TIMESTAMP.

    - TIMESTAMP(NANOS) arrives as long (see session.py's nanosAsLong);
      truncate to micros — the same conversion DuckDB applies.
    - TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ; with the
      session pinned to UTC the cast is a no-op re-tag matching DuckDB's
      naive-as-UTC reading, and it keeps ``unix_micros``/``window`` et al.
      (which require TIMESTAMP) working regardless of how the data was
      written.
    """
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df
