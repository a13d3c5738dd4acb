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
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sep: str = ",",
    header: bool = True,
    **options,
) -> DataFrame:
    """Malformed-row-dropping CSV read (S2; pandas
    ``error_bad_lines=False`` at research_pipeline_dag.py:150-155).
    ``header=False`` + explicit schema reads headerless part files
    (e.g. the neo4j-admin export layout); extra ``options`` pass
    through to the reader (quote dialect, multiLine)."""
    reader = (
        spark.read.option("header", header).option("mode", "DROPMALFORMED").option("sep", sep)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # parity only; avoid at scale
    return reader.csv(path)


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    target_schema: T.StructType,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Read a parquet dataset whose schema DRIFTED over its lifetime and
    reconcile every file to ``target_schema``.

    A table appended to for years accumulates files with added columns,
    widened types, and renamed fields; a plain read either fails or
    silently serves whichever footer Spark sampled first. This reader:

    - merges footers (``mergeSchema``) so added columns survive,
    - applies ``renames`` (old → new) for columns that changed name —
      when both the old and new name exist in the merged schema the new
      one wins per row via coalesce (the rename-era boundary),
    - fills columns absent from the merged schema entirely with typed
      NULLs,
    - casts every column to the target type (widened ints, string→date),
    - returns columns in ``target_schema`` order, extra columns dropped.

    Type WIDENING (int→bigint era boundaries) is beyond parquet's
    ``mergeSchema`` (CANNOT_MERGE_SCHEMAS); on that failure the reader
    falls back to grouping the files by footer schema — one footer read
    per file, the same cost mergeSchema itself pays — reconciling each
    era group independently, and unioning. ``mergeSchema`` reads every
    footer either way — acceptable as an explicit opt-in for evolving
    tables; stable tables should keep the cheap single-footer path of
    ``spark.read.parquet``.
    """
    try:
        df = spark.read.option("mergeSchema", True).parquet(path)
        return _reconcile(df, target_schema, renames)
    except Exception as ex:
        if "CANNOT_MERGE_SCHEMAS" not in str(ex):
            raise
    from . import fs

    jfs, p = fs._fs_and_path(spark, path)
    it = jfs.listFiles(p, True)
    by_schema: dict[str, list[str]] = {}
    while it.hasNext():
        f = it.next().getPath().toString()
        name = f.rsplit("/", 1)[-1]
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        key = spark.read.parquet(f).schema.simpleString()  # footer only
        by_schema.setdefault(key, []).append(f)
    # basePath anchors each era group's leaf files to the dataset root so
    # hive-style partition columns (values that exist only in directory
    # names) are still derived — a bare per-file read would drop them and
    # _reconcile would silently backfill typed NULLs for partitioned
    # evolving tables
    eras = [
        _reconcile(
            spark.read.option("basePath", path).parquet(*files),
            target_schema,
            renames,
        )
        for files in by_schema.values()
    ]
    out = eras[0]
    for e in eras[1:]:
        out = out.unionByName(e)
    return out


def _reconcile(
    df: DataFrame,
    target_schema: T.StructType,
    renames: dict[str, str] | None,
) -> DataFrame:
    from pyspark.sql import functions as F

    have = set(df.columns)
    for old, new in (renames or {}).items():
        if old in have and new in have:
            df = df.withColumn(new, F.coalesce(F.col(new), F.col(old)))
        elif old in have:
            df = df.withColumnRenamed(old, new)
        have = set(df.columns)
    return df.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in target_schema.fields
        ]
    )


def read_parquet_tolerant(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan that SKIPS corrupt files instead of failing the job.

    At fleet scale some object is always truncated (killed writer,
    partial upload) — one bad file must not kill a 100 TB scan. This is
    the explicit opt-in: per-read ``ignoreCorruptFiles`` (scoped to this
    reader, NOT the session-wide SQL conf, so correctness-critical reads
    elsewhere still fail loudly). Pass ``schema`` to also survive the
    case where the corrupt file is the one footer Spark would have
    sampled for inference.
    """
    reader = spark.read.option("ignoreCorruptFiles", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


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


_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'B7' → 1 (zero-based column index from an A1-style cell ref)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _read_xlsx_minimal(path: str, sheet: int = 0):
    """Dependency-free .xlsx reader (ECMA-376 spreadsheetML): enough of
    the format for dimension workbooks — shared strings, inline strings,
    numeric cells; first row is the header. Used when pandas' engine
    (openpyxl) isn't installed."""
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(_SSML + "t"))
                for si in root.iter(_SSML + "si")
            ]
        # numeric-suffix sort: lexicographic would put sheet10.xml before
        # sheet2.xml, so an integer sheet index hits the wrong sheet in
        # 10+-sheet workbooks
        import re

        def _sheet_key(n: str):
            m = re.search(r"sheet(\d+)\.xml$", n)
            return (0, int(m.group(1)), n) if m else (1, 0, n)

        sheets = sorted(
            (n for n in names if n.startswith("xl/worksheets/sheet")),
            key=_sheet_key,
        )
        root = ET.fromstring(z.read(sheets[sheet]))
        grid: list[dict[int, object]] = []
        for row in root.iter(_SSML + "row"):
            cells: dict[int, object] = {}
            for c in row.iter(_SSML + "c"):
                ci = _col_index(c.get("r", "A"))
                t = c.get("t")
                if t == "inlineStr":
                    cells[ci] = "".join(tt.text or "" for tt in c.iter(_SSML + "t"))
                    continue
                ve = c.find(_SSML + "v")
                if ve is None or ve.text is None:
                    continue
                if t == "s":
                    cells[ci] = shared[int(ve.text)]
                elif t == "str":
                    cells[ci] = ve.text
                else:
                    text = ve.text
                    if not any(ch in text for ch in ".eE"):
                        # keep integers exact — routing through float()
                        # loses precision above 2^53
                        cells[ci] = int(text)
                    else:
                        num = float(text)
                        cells[ci] = int(num) if num.is_integer() else num
            grid.append(cells)
    width = max((max(r) + 1 for r in grid if r), default=0)
    header = [grid[0].get(i, f"col{i}") for i in range(width)] if grid else []
    data = [[r.get(i) for i in range(width)] for r in grid[1:]]
    return pd.DataFrame(data, columns=[str(h) for h in header])


def read_excel_dim(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """Excel workbook → DataFrame (S4; augmentations.py:66,82).

    Dimension-sized by definition, so the driver-side read +
    ``createDataFrame`` is the right shape (the CWTS workbook is ~20k
    rows). Uses pandas' engine when available, else the built-in minimal
    spreadsheetML parser. Column names are normalized like the reference
    (augmentations.py:68: lower + underscores).
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError:
        pdf = _read_xlsx_minimal(path, sheet if isinstance(sheet, int) else 0)
    pdf.columns = [str(c).replace(" ", "_").lower() for c in pdf.columns]
    return spark.createDataFrame(pdf)
