"""Event-time analytics over the ``events`` table (SURVEY §2.9 extension).

The reference is yearly batch with no streams; the engine adds the
event-time operator set (tumbling windows, sessionization) in both batch
and Structured Streaming forms. Batch and streaming share semantics —
the streaming variant (streaming/jobs.py) is checked against the same
DuckDB oracle as the batch one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import REGISTRY
from ..tables import load

D = "decimal(12,4)"

_TUMBLING_ORACLE = """
SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def _tumbling(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@REGISTRY.add("e01_tumbling_counts", _TUMBLING_ORACLE, "events", "window-agg")
def e01_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts/sums (batch form).

    ``F.window`` buckets align to the epoch, as does DuckDB
    ``time_bucket`` for sub-day widths — both engines agree bucket-exact.
    """
    return _tumbling(load(spark, sf_dir, "events"))


@REGISTRY.add("e02_streaming_tumbling", _TUMBLING_ORACLE, "events", "streaming")
def e02_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation executed as a Structured Streaming query.

    Runs the parquet file through ``readStream`` (complete output mode →
    every window present once the source drains) and returns the final
    in-memory table. Proves batch/stream semantic parity on one oracle.
    """
    from ..streaming.jobs import run_tumbling_stream_to_batch

    return run_tumbling_stream_to_batch(spark, f"{sf_dir}/events.parquet")


@REGISTRY.add(
    "e03_sessionize",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           epoch_us(MIN(ts)) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_s
    FROM numbered GROUP BY user_id, session_id
    """,
    "events",
    "sessionize",
)
def e03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + prefix-sum.

    The batch formulation of ``session_window``: partition by user (one
    shuffle), per-user ordered scan — no global sort, scales with users.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.count(F.lit(1)).alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0).alias(
            "duration_s"
        ),
    ).select("user_id", F.col("session_id").cast("bigint").alias("session_id"),
             "session_start_us", "n_events", "duration_s")
