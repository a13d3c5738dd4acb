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


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text as a string (test/diagnostic):
    shows PushedFilters, ReadSchema, join strategies, codegen spans."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
