"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` but every default here is chosen to also
hold on a multi-executor cluster: AQE for runtime re-planning (skew joins,
partition coalescing), UTC session time so results are engine-portable,
Arrow for any pandas-UDF hop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

RUNTIME_CONFS = {
    # settable on a live session (the driver hands us its own session for
    # __spark_entry__ calls — apply_runtime_confs() aligns it).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # let AQE re-partition below cached plans too — without this a
    # .cache() anywhere pins the static shuffle partition count and a
    # foreign session's 200-partition default drowns small stages in
    # task overhead
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # AQE coalesces batch shuffles, but streaming state-store partitioning
    # is fixed at query start from this conf (no AQE) — a foreign session's
    # 200-partition default means 200 state stores on a 32-core box. Size
    # to local parallelism; a real cluster sets this to ~2-3x total cores.
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 32),
    # the events table carries TIMESTAMP(NANOS) parquet, which Spark refuses
    # natively; read as long and truncate to micros in tables.load (matches
    # DuckDB's nanos→micros truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Align a possibly-foreign session with the engine's runtime confs."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf locked by the host — non-fatal
            pass
    return spark


def get_spark(
    app: str = "research-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match cores in local mode; a real cluster would size this to
        # ~2-3x total cores or rely on AQE coalescing from a higher start.
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
