"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose every operator implemented in
``research_data_pipeline_spark`` (see SURVEY.md §2 inventory); the driver
verifies each Spark result against the DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from research_data_pipeline_spark.registry import all_specs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: grouped pricing summary (TPC-H Q1 shape) at sf0.001."""
    from research_data_pipeline_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
