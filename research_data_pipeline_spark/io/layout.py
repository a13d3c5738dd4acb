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


def zorder_value(cols: list, bits: int = 16):
    """Morton/Z-order key over pre-scaled integer columns.

    Each input column must already be an integer in [0, 2**bits); the
    result interleaves their bits (column 0 owns the lowest bit). A
    multi-dimensional sort on this single key keeps rows that are close
    in EVERY dimension close in the file, so parquet row-group min/max
    stats prune selective predicates on ANY of the interleaved columns —
    a plain sort gives that to its leading column only. Pure bit
    arithmetic, whole-stage-codegen'd, no UDF.

    ``bits * len(cols)`` must fit in the 63 value bits of a BIGINT: the
    top interleaved bit of 4×16 lands on bit 63 (sign — keys wrap
    negative) and Spark's shiftleft masks its shift count mod 64, so 5+
    columns would silently wrap bits onto low positions. Either way the
    Morton order is wrong, so over-wide keys fail loudly here instead.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_value: bits*len(cols) = {bits}*{n} = {bits * n} "
            "exceeds the 63 value bits of BIGINT; lower bits (e.g. "
            f"bits={63 // n}) or interleave fewer columns"
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for ci, c in enumerate(cols):
            z = z + (
                F.shiftleft(
                    F.shiftright(F.col(c) if isinstance(c, str) else c, b)
                    .bitwiseAND(F.lit(1))
                    .cast("bigint"),
                    b * n + ci,
                )
            )
    return z


def scale_to_bits(col, mn, mx, bits: int = 16):
    """Affinely map a numeric column with known [mn, mx] bounds onto the
    integer grid [0, 2**bits) — the normalization step before
    ``zorder_value``. Bounds come from a one-row aggregate of the input
    (cheap: column stats), not per-row shuffles."""
    from pyspark.sql import functions as F

    span = F.lit(mx).cast("double") - F.lit(mn).cast("double")
    unit = (col.cast("double") - F.lit(mn).cast("double")) / (span + F.lit(1e-9))
    cell = F.floor(unit * F.lit(float(1 << bits))).cast("bigint")
    return F.least(F.greatest(cell, F.lit(0)), F.lit((1 << bits) - 1))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` as parquet Z-ORDERED on ``cols``: scale each column
    to the [0, 2**bits) grid using its global min/max, interleave into a
    Morton key, range-partition + sort by it, drop the key, write.

    This is the multi-dimensional clustering step a 100 TB fact table
    needs when queries filter on several independent columns (user AND
    time, part AND date): one physical order serves them all, and the
    judge of that claim is ``row_groups_pruned`` below — footer stats,
    not plans. ``row_group_bytes`` shrinks parquet row groups in tests
    so pruning is observable on small data.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"_mn_{c}") for c in cols],
        *[F.max(c).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        scale_to_bits(F.col(c), bounds[f"_mn_{c}"], bounds[f"_mx_{c}"], bits).alias(
            f"_z_{c}"
        )
        for c in cols
    ]
    zdf = (
        df.select("*", *scaled)
        .withColumn("_z", zorder_value([f"_z_{c}" for c in cols], bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_z_{c}" for c in cols])
    )
    writer = zdf.write.mode("overwrite")
    if row_group_bytes:
        # page size must shrink with the block size or the writer's
        # per-page floor keeps row groups coarse on small test data
        writer = writer.option("parquet.block.size", str(row_group_bytes)).option(
            "parquet.page.size", str(max(1024, row_group_bytes // 2))
        )
    writer.parquet(path)


def row_groups_pruned(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(kept, total) parquet row groups whose [min, max] footer stats
    overlap the closed predicate range [lo, hi] — engine-independent
    ground truth for what ANY stats-aware scanner (Spark, DuckDB, Trino)
    must read for ``col BETWEEN lo AND hi``."""
    import os

    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    kept = total = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                kept += 1
            elif not (st.max < lo or st.min > hi):
                kept += 1
    return kept, total


# ---------------------------------------------------------------------------
# Durable bucketed-authorship store (round-12 verdict task 7)
#
# The sf10 measurement (SCALE.md round-12): bucketing the authorship fact
# on author_id makes dwh3 9.1x faster (71.1 -> 7.8 s) and dwh4 2.0x, for
# one 24.5 s write. The DECISION, made here once instead of per-caller:
# `star_tables` PROBES for this store and prefers it when present, but
# never builds it implicitly — materializing a fact-scale bucketed copy
# is a WRITE (24.5 s at sf10, hours at 100 TB, double storage) and a
# read-path query that silently performs it would wreck the first
# caller's latency and surprise the storage bill. Building is one
# explicit maintenance call (`build_bucketed_authorship`), after which
# every consumer — dwh1-dwh4, the bench, ad-hoc per-author queries, in
# THIS session or any later one — flips automatically via the probe.
# Refresh-by-delete when the dataset is rewritten (fs.delete on the
# store path), the same contract as the skew-stats store.
#
# Cross-session mechanics: bucket metadata lives in the session catalog,
# which is in-memory here — so the store keeps a tiny _BUCKET_META
# sidecar (n_buckets + schema DDL) next to the data, and the probe
# re-registers the external bucketed table into a fresh session's
# catalog with one DDL statement. No Hive metastore needed.

_AUTHORSHIP_META = "_BUCKET_META"


def _artifact_path(kind: str, sf_dir: str) -> str:
    """Relocatable artifact home keyed by dataset path — the same scheme
    as the skew-stats store (queries/relational.py:_skew_store_path)."""
    import hashlib
    import os

    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "spark-warehouse",
    )
    root = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", default).rstrip("/")
    # the store path is interpolated into re-registration DDL
    # (probe_bucketed_authorship); validate ONCE at configuration time so
    # a quote/newline in the artifact root fails here with a clear error
    # instead of as a broken CREATE TABLE at probe time (r13 advisor)
    bad = set(root) & set("'`\"\n\r;")
    if bad:
        raise ValueError(
            "SPARK_GRAFT_ARTIFACT_DIR contains characters unsafe for the "
            f"layout store's registration DDL ({sorted(bad)}): {root!r}"
        )
    ds = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    return f"{root}/{kind}/{ds}"


def bucketed_authorship_path(sf_dir: str) -> str:
    return _artifact_path("bucketed_authorship", sf_dir)


def _authorship_table_name(sf_dir: str) -> str:
    import hashlib
    import os

    ds = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    return f"rdp_bucketed_authorship_{ds}"


def build_bucketed_authorship(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> str:
    """One-time maintenance write: materialize the distinct authorship
    projection of ``sf_dir``'s lineitem, bucketed + sorted on author_id,
    into the artifact store. Returns the registered table name. Every
    subsequent `star_tables(spark, sf_dir)` in any session prefers it
    via `probe_bucketed_authorship` until the store is deleted."""
    from pyspark.sql import functions as F

    from . import fs
    from ..tables import load

    l = load(spark, sf_dir, "lineitem")
    authorship = l.select(
        F.col("l_orderkey").alias("article_id"),
        F.col("l_suppkey").alias("author_id"),
    ).distinct()
    path = bucketed_authorship_path(sf_dir)
    table = _authorship_table_name(sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # crash ordering + CTAS contract (r13 advisor): write_bucketed's
    # saveAsTable into an external LOCATION refuses a non-empty directory
    # (allowNonEmptyLocationInCTAS=false), so leftover data files from a
    # crash mid-write — or a cross-session rebuild where the table isn't
    # in this catalog — would fail the documented refresh/retry path.
    # Delete the ENTIRE store path first; the sidecar (the probe's
    # validity marker) goes with it, so the probe reports no store for
    # the whole rewrite window, and it is written LAST, after the data
    # committed.
    fs.delete(spark, path)
    # dataset fingerprint BEFORE the write (the store must describe the
    # bytes it was built from): probe treats a mismatch as store-absent,
    # so a dataset regenerated in place invalidates the store instead of
    # silently serving stale authorship rows
    fprint = fs.fingerprint(spark, f"{sf_dir.rstrip('/')}/lineitem.parquet")
    write_bucketed(
        authorship, table, ["author_id"], n_buckets=n_buckets, path=path
    )
    schema_ddl = spark.table(table)._jdf.schema().toDDL()
    fs.write_text(
        spark,
        f"{path}/{_AUTHORSHIP_META}",
        f"{n_buckets}\n{fprint}\n{schema_ddl}",
    )
    return table


def probe_bucketed_authorship(spark: SparkSession, sf_dir: str):
    """The guarded layout probe: the bucketed authorship table for
    ``sf_dir`` if its store exists (registering it into this session's
    catalog if needed), else None. One fs.exists on the sidecar when the
    store is absent — cheap enough for every star_tables call."""
    from . import fs

    path = bucketed_authorship_path(sf_dir)
    meta = f"{path}/{_AUTHORSHIP_META}"
    if not fs.exists(spark, meta):
        return None
    parts = fs.read_text(spark, meta).split("\n", 2)
    if len(parts) < 3:
        # pre-r14 sidecar without a dataset fingerprint: stale format,
        # treat as store-absent (rebuild is one explicit call)
        return None
    n_buckets, fprint, schema_ddl = parts
    if fprint != fs.fingerprint(
        spark, f"{sf_dir.rstrip('/')}/lineitem.parquet"
    ):
        # the dataset was regenerated IN PLACE since the store was
        # built — serving it would silently return stale authorship
        # rows (r13 advisor); the caller falls back to the raw scan
        # until build_bucketed_authorship refreshes the store
        return None
    table = _authorship_table_name(sf_dir)
    if not spark.catalog.tableExists(table):
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY (author_id) SORTED BY (author_id) "
            f"INTO {int(n_buckets)} BUCKETS LOCATION '{path}'"
        )
    return spark.table(table)
