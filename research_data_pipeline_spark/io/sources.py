"""Source readers (SURVEY S1-S6).

Every reader takes an explicit schema where the reference relied on
inference — at 100 TB schema inference is a full extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The six fields the reference parses from the arXiv JSON-lines snapshot
# (raw_to_tables.py:34-45) — declaring them lets Spark's JSON reader skip
# the rest of each record (S1 projection pushdown).
ARXIV_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("categories", T.StringType()),
        T.StructField("update_date", T.StringType()),
        T.StructField(
            "authors_parsed", T.ArrayType(T.ArrayType(T.StringType()))
        ),
    ]
)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with projection pushdown (S1;
    raw_to_tables.py:34-48)."""
    return spark.read.schema(schema).json(path)


def read_csv_tolerant(
    spark: SparkSession, path: str, schema: T.StructType | None = None, sep: str = ","
) -> DataFrame:
    """Malformed-row-dropping CSV read (S2; pandas
    ``error_bad_lines=False`` at research_pipeline_dag.py:150-155)."""
    reader = (
        spark.read.option("header", True).option("mode", "DROPMALFORMED").option("sep", sep)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # parity only; avoid at scale
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — columnar like parquet (predicate pushdown, column
    pruning, vectorized read all apply); the schema argument prunes the
    read schema up front instead of after the scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (row-oriented interchange format). The spark-avro module
    is a separate JVM artifact; raise a clear error when this deployment
    doesn't ship it rather than an opaque ClassNotFoundException."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as ex:  # pragma: no cover - depends on deployment jars
        if "avro" in str(ex).lower() or "DATA_SOURCE_NOT_FOUND" in str(ex):
            raise NotImplementedError(
                "spark-avro is not on the classpath; submit with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from ex
        raise


def read_excel_dim(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """Excel workbook → DataFrame (S4; augmentations.py:66,82).

    Dimension-sized by definition, so the driver-side pandas read +
    ``createDataFrame`` is the right shape (the CWTS workbook is ~20k
    rows). Column names are normalized like the reference
    (augmentations.py:68: lower + underscores).
    """
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet)
    pdf.columns = [str(c).replace(" ", "_").lower() for c in pdf.columns]
    return spark.createDataFrame(pdf)
