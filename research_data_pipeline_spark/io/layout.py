"""Physical layout helpers: bucketing and partitioned writes.

At 100 TB the dominant cost of the fact-to-fact joins (authorship,
lineitem self-joins, co-occurrence edges) is the shuffle. Bucketing both
sides on the join key at write time makes those joins exchange-free:
Spark reads co-located buckets and sort-merge-joins them directly.
``tests/test_layout.py`` asserts the Exchange really disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    ``n_buckets`` should divide evenly into the cluster's parallelism;
    bucket pruning applies to equality predicates on the bucket keys.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by or keys:
        writer = writer.sortBy(*(sort_by or keys))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (test/diagnostic)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def shuffle_metrics(df: DataFrame) -> dict[str, int]:
    """Execute ``df`` and sum shuffle metrics across every Exchange node
    of the EXECUTED plan: {"bytes": shuffleBytesWritten, "records":
    shuffleRecordsWritten, "exchanges": n}.

    The measured counterpart to :func:`n_exchanges` — plan-text
    assertions prove an Exchange disappeared, this proves how many bytes
    it was moving. Run with AQE disabled for a stable node tree
    (AdaptiveSparkPlanExec hides its final children from py4j traversal).
    """
    df.collect()
    totals = {"bytes": 0, "records": 0, "exchanges": 0}

    def walk(node) -> None:
        if "Exchange" in node.nodeName():
            totals["exchanges"] += 1
            m = node.metrics()
            for key, out in (("shuffleBytesWritten", "bytes"),
                             ("shuffleRecordsWritten", "records")):
                if m.contains(key):
                    totals[out] += int(m.apply(key).value())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text as a string (test/diagnostic):
    shows PushedFilters, ReadSchema, join strategies, codegen spans."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    The small-files problem is the quiet killer of long-lived 100 TB
    tables: thousands of KB-sized files from incremental appends turn
    every scan into a task-scheduling storm and every footer read into an
    S3 request stampede. This compacts in place: read → repartition to
    ceil(total_bytes / target) → write to a sibling temp dir → atomic-ish
    swap (delete old, rename temp), all through the Hadoop FileSystem API
    so the same code runs on HDFS/S3A. ``sort_within_by`` optionally
    sorts within files so min/max row-group statistics become selective
    (the poor man's Z-order for one key). Returns the new file count.

    Not transactional — run it from the single writer that owns the
    table, the same serialization contract as write_jdbc_idempotent.
    """
    import math

    from . import fs
    from ..tables import invalidate_scan_units

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    total = fs.size_bytes(spark, path)
    if total == 0:
        # An orphaned temp/old sibling means a previous compaction died
        # mid-swap and the data lives ONLY there — silently returning 0
        # would mask the half-finished state forever. Fail loudly with
        # the recovery hint instead.
        if fs.exists(spark, tmp) or fs.exists(spark, old):
            raise IOError(
                f"compact_parquet: {path} is empty but a leftover "
                f"{tmp if fs.exists(spark, tmp) else old} exists — a prior "
                "compaction crashed mid-swap; rename it back to recover"
            )
        return 0
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_within_by:
        df = df.repartition(n_files).sortWithinPartitions(*sort_within_by)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(tmp)
    # Swap order matters for crash safety: park the live dir aside FIRST,
    # promote the temp, then drop the parked copy. A crash between any
    # two steps leaves the data intact under exactly one of path /
    # path__compact_old / path__compact_tmp — never deleted-with-tmp-only
    # (the advisor's failure mode for the old delete-then-rename order).
    jfs, src = fs._fs_and_path(spark, tmp)
    _, dst = fs._fs_and_path(spark, path)
    _, parked = fs._fs_and_path(spark, old)
    fs.delete(spark, old)  # clear any stale parked copy from a crash
    if not jfs.rename(dst, parked):
        raise IOError(f"compact_parquet: rename {path} -> {old} failed")
    if not jfs.rename(src, dst):
        # roll back so the table stays readable at its original path
        jfs.rename(parked, dst)
        raise IOError(f"compact_parquet: rename {tmp} -> {path} failed")
    fs.delete(spark, old)
    invalidate_scan_units(path)
    return n_files
