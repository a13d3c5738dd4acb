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
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    return ensure_parallelism(normalize_nanos(df), path=path)


def ensure_parallelism(df: DataFrame, path: str | None = None) -> DataFrame:
    """Restore scan parallelism for unsplittable inputs.

    Parquet parallelism is bounded by ROW GROUPS, not bytes: a file with
    one row group yields exactly one non-empty task no matter what
    ``maxPartitionBytes`` says, so every scan-side stage — explode,
    regex, hashing, partial aggregation — serializes on ONE core (the
    sf test tables are all single-row-group: 600k lineitem rows on 1 of
    32 cores). One cheap round-robin shuffle of the raw input restores
    full parallelism for everything downstream.

    Gated: only fires when the input's parallelizable units number fewer
    than half the cluster's task slots. Real-scale inputs (many files /
    row groups) pass through untouched, so no shuffle is ever added at
    100 TB. Units are counted from parquet footers when ``path`` is
    local (exact — Spark's byte-range split count OVERCOUNTS a large
    single-row-group file, where most splits come up empty), falling
    back to the planner's split count for remote filesystems. Catalyst
    still pushes filters and column pruning through the Repartition
    node, so scan pushdown is unaffected (asserted in test_plans.py).
    The explicit partition count keeps AQE from re-coalescing the tiny
    shuffle back to one partition.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if _parallel_units(df, path, target) * 2 < target:
        return df.repartition(target)
    return df


# probe cache: footer reads are cheap but load() is called repeatedly on
# the same static files; the .rdd fallback compiles a physical plan
# (~0.1-0.2s) and must never be re-paid per call. Keyed on the path PLUS
# a cheap layout fingerprint (file count + total bytes + newest mtime),
# so a write-then-reload workflow that overwrites a dataset in-session
# re-probes instead of reusing the stale unit count.
_SCAN_UNITS: dict[tuple, int] = {}


def invalidate_scan_units(path: str | None = None) -> None:
    """Drop cached scan-unit probes for ``path`` (all paths when None).

    The fingerprint in the cache key already catches local rewrites; this
    hook exists for callers that rewrite REMOTE datasets in-session
    (fingerprint ``()`` treats them as immutable) — e.g.
    ``io.layout.compact_parquet`` after swapping a directory's layout."""
    if path is None:
        _SCAN_UNITS.clear()
        return
    for key in [k for k in _SCAN_UNITS if k[0] == path]:
        del _SCAN_UNITS[key]


def _layout_fingerprint(path: str) -> tuple:
    """(n_files, total_bytes, max_mtime_ns) for a local path; () when the
    path isn't local (remote layouts can't be statted cheaply — treated
    as immutable for the process lifetime, the pre-existing behavior)."""
    import glob
    import os

    if "://" in path and not path.startswith("file://"):
        return ()
    local = path[len("file://"):] if path.startswith("file://") else path
    if os.path.isfile(local):
        files = [local]
    elif os.path.isdir(local):
        files = glob.glob(os.path.join(local, "*.parquet"))
    else:
        return ()
    stats = [os.stat(f) for f in files]
    return (
        len(files),
        sum(s.st_size for s in stats),
        max((s.st_mtime_ns for s in stats), default=0),
    )


def _parallel_units(df: DataFrame, path: str | None, target: int) -> int:
    if path is not None:
        key = (path, _layout_fingerprint(path))
    else:
        key = (df._jdf.queryExecution().logical().toString(), ())
    if key in _SCAN_UNITS:
        return _SCAN_UNITS[key]
    units: int | None = None
    if path is not None:
        units = _local_row_groups(path, enough=target)
    if units is None:
        units = df.rdd.getNumPartitions()
    _SCAN_UNITS[key] = units
    return units


def _local_row_groups(path: str, enough: int) -> int | None:
    """Total parquet row groups under a LOCAL path, or None when the path
    isn't local / isn't parquet (remote stores fall back to the planner
    probe). Short-circuits at ``enough`` files — a many-file dataset is
    splittable regardless of row-group counts."""
    import glob
    import os

    if "://" in path and not path.startswith("file://"):
        return None
    local = path[len("file://"):] if path.startswith("file://") else path
    if os.path.isfile(local):
        files = [local]
    elif os.path.isdir(local):
        files = sorted(glob.glob(os.path.join(local, "*.parquet")))
    else:
        return None
    if not files:
        return None
    if len(files) >= enough:
        return len(files)
    try:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).num_row_groups for f in files)
    except Exception:
        return None


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ad-hoc ``spark.sql`` works
    against the same normalized schemas the DataFrame queries see — the
    SQL-first entry point for users coming from the reference's
    Postgres/DuckDB workflow."""
    for name in TPCH_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny driver-side DataFrame as a pure-JVM ``LocalRelation``.

    ``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into
    ``defaultParallelism`` Python-RDD slices, and EVERY downstream action
    then pays one Python-worker roundtrip per slice — serially when the
    consumer is ``coalesce(1)`` (measured on a 32-core session: a 5-row
    ``coalesce(1).write.parquet`` took ~6 s, 32 sequential worker hops;
    the identical write off this Arrow path takes ~0.1 s). Routing the
    rows through a pandas frame makes createDataFrame take the Arrow
    conversion, which plans as a JVM LocalRelation — no Python workers
    at action time, on any core count. ``dtype=object`` keeps None as
    SQL NULL instead of pandas' NaN coercion. ``schema`` may be a
    StructType (column names taken from it) or a DDL string (columns
    mapped positionally, as createDataFrame does for pandas input)."""
    import pandas as pd
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    pdf = pd.DataFrame(
        [tuple(r) for r in rows],
        columns=[f.name for f in st.fields],
        dtype=object,
    )
    return spark.createDataFrame(pdf, st)


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
