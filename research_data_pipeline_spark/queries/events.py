"""Event-time analytics over the ``events`` table (SURVEY §2.9 extension).

The reference is yearly batch with no streams; the engine adds the
event-time operator set (tumbling windows, sessionization) in both batch
and Structured Streaming forms. Batch and streaming share semantics —
the streaming variant (streaming/jobs.py) is checked against the same
DuckDB oracle as the batch one.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import REGISTRY
from ..tables import load

D = "decimal(12,4)"

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


# Shared by e01 and its streaming twin e02 (r12 closed the twin's slot):
# NaN excluded from the aggregate domain (r11 NaN sweep, the e27/e29/e31
# contract — Spark's NaN->decimal cast is silent while DuckDB's is
# loud); NULL rows stay (counted; the sum skips them).
_TUMBLING_NANSAFE_ORACLE = """
WITH ev AS (
    SELECT * FROM events WHERE value IS NULL OR NOT isnan(value)
)
SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM ev
GROUP BY 1, 2
"""


@REGISTRY.add("e01_tumbling_counts", _TUMBLING_NANSAFE_ORACLE, "events",
              "window-agg")
def e01_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts/sums (batch form).

    ``F.window`` buckets align to the epoch, as does DuckDB
    ``time_bucket`` for sub-day widths — both engines agree bucket-exact.
    NaN rows are excluded from the aggregate domain on both engines (r11
    NaN-sweep contract); NULLs stay."""
    return _tumbling(
        load(spark, sf_dir, "events").where(
            F.col("value").isNull() | ~F.isnan("value")
        )
    )


@REGISTRY.add("e02_streaming_tumbling", _TUMBLING_NANSAFE_ORACLE, "events",
              "streaming")
def e02_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation executed as a Structured Streaming query.

    Runs the parquet file through ``readStream`` (complete output mode →
    every window present once the source drains) and returns the final
    in-memory table. Proves batch/stream semantic parity on one oracle —
    including e01's NaN-exclusion domain contract (the filter lives in
    the streaming job so batch and stream share one oracle).
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


# ---------------------------------------------------------------------------
# Sliding windows — SURVEY §2.9 extension (streaming/jobs.py:sliding_agg)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e04_sliding_counts",
    """
    WITH buckets AS (
        SELECT event_type,
               unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
                   AS w_start
        FROM events
    )
    SELECT epoch_us(w_start) AS window_start_us,
           epoch_us(w_start + INTERVAL '10 minutes') AS window_end_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM buckets GROUP BY w_start, event_type
    """,
    "events",
    "window-agg",
)
def e04_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 (each event lands in exactly two
    windows). Same ``sliding_agg`` runs unchanged on a stream with a
    watermark bounding state."""
    from ..streaming.jobs import sliding_agg

    return sliding_agg(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# JSON property extraction — engine extension (events.props is JSON text)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e05_json_props",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    "events",
    "json",
)
def e05_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction + aggregation.

    ``get_json_object`` stays JVM-side; at scale, promote hot JSON fields
    to typed columns at ingest (``from_json`` with an explicit schema)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Grouped-map Pandas UDF — SURVEY §2.9 UDF surface (iterative per-group fold)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e06_ewma_user_value",
    """
    SELECT user_id,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.7 * acc + 0.3 * x) AS ewma,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    "events",
    "pandas-udf",
)
def e06_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA via ``applyInPandas`` (SURVEY §2.9 UDF surface).

    An order-dependent left fold SQL aggregates can't express — the shape
    used for per-entity iterative state (the reference's per-author Python
    loops, final_tables.py:143-158, done right: one shuffle, Arrow
    batches, no driver loop). Left-fold in float64 matches DuckDB's
    list_reduce bit-exactly.
    """
    return ewma_per_user(load(spark, sf_dir, "events"))


def ewma_per_user(e: DataFrame) -> DataFrame:
    """EWMA (0.7·acc + 0.3·x) over each user's (ts, event_id)-ordered
    values: one groupBy shuffle, Arrow-batched fold.

    Skew behavior: a pathological user's whole history lands in ONE task
    as one collected array — deliberate (the fold is order-dependent), and
    cheap up to millions of events per user (~24 B/event in the array;
    tested at 10⁶ events for a single hot user). AQE's skew handling
    can't split a single group, so beyond ~10⁷ events/user, segment the
    fold: EWMA composes affinely ((scale, offset) per segment, folded in
    segment order — the ``scalable_prefix_sum`` two-phase shape). For
    skewed JOINS, use ``operators.skew.salted_join``.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ewma_batch(series_col):
        # one Arrow batch carries thousands of users; the per-user fold is
        # a plain python loop over that user's (short) ordered array —
        # ~100x less per-group overhead than a grouped-map UDF call per user
        out = np.empty(len(series_col), dtype=np.float64)
        for r, vals in enumerate(series_col):
            acc = float(vals[0])
            for x in vals[1:]:
                acc = 0.7 * acc + 0.3 * float(x)
            out[r] = acc
        return pd.Series(out)

    ewma = pandas_udf(_ewma_batch, DoubleType())

    per_user = (
        e.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("evs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.transform("evs", lambda s: s["value"]).alias("vals"),
            "n_events",
        )
    )
    return per_user.select("user_id", ewma("vals").alias("ewma"), "n_events")


# ---------------------------------------------------------------------------
# Streaming stateful dedup — streaming/jobs.py:streaming_dedup
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e07_streaming_dedup",
    "SELECT DISTINCT event_id FROM events",
    "events",
    "streaming",
    "dedup",
)
def e07_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup executed as a streaming query (dropDuplicates state),
    drained to a batch result — the ON CONFLICT DO NOTHING idempotency of
    the reference's sink (sql_queries.py:98-138), streaming form."""
    from ..streaming.jobs import run_dedup_stream_to_batch

    return run_dedup_stream_to_batch(spark, f"{sf_dir}/events.parquet", keys=["event_id"])


# ---------------------------------------------------------------------------
# Arbitrary stateful streaming — applyInPandasWithState
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e08_stateful_user_stats",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY user_id
    """,
    "events",
    "streaming",
    "stateful",
)
def e08_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (GroupState) executed as a real streaming
    query and drained to batch; single-batch source → the update-mode
    emission equals the batch aggregate, giving an exact oracle.

    NULL/NaN values are outside the stateful domain on both engines
    (e24's contract — Arrow hands pandas both as NaN, so one malformed
    event would otherwise freeze the user's running max; see
    streaming/jobs.py::stateful_user_stats)."""
    from ..streaming.jobs import run_stateful_stats_to_batch

    return run_stateful_stats_to_batch(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# As-of join — operators/temporal.py (DuckDB has native ASOF JOIN to check)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e09_asof_purchase_attribution",
    """
    WITH v AS (
        SELECT user_id, ts, MAX(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), p AS (
        SELECT user_id, event_id AS purchase_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
           v.view_id,
           epoch_us(v.ts) AS view_ts_us,
           (epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0 AS gap_s
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    "events",
    "asof",
)
def e09_asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest view at
    or before it. Union-and-carry implementation — one shuffle on the
    key, no pair space (operators/temporal.py:asof_join)."""
    from ..operators.temporal import asof_join
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = asof_join(purchases, views, key="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "purchase_id",
        "user_id",
        epoch_us("ts").alias("purchase_ts_us"),
        "view_id",
        epoch_us("asof_ts").alias("view_ts_us"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          - F.unix_micros(F.col("asof_ts").cast("timestamp"))) / 1_000_000.0).alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# Bounded range self-join — operators/temporal.py (bucketed, no BNLJ)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e10_event_bursts",
    """
    SELECT a.user_id, a.event_id AS i, b.event_id AS j,
           (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 14400000000
    """,
    "events",
    "range-join",
)
def e10_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 4 hours — gap-width time bucketing
    turns the range predicate into a hash-join key
    (operators/temporal.py:range_self_join)."""
    from ..operators.temporal import range_self_join

    e = load(spark, sf_dir, "events")
    return range_self_join(e, key="user_id", ts="ts", id_col="event_id", max_gap_s=14400)


# ---------------------------------------------------------------------------
# Hypertable-style multi-granularity rollup (one pass, exploded buckets)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "e11_multigrain_rollup",
    """
    -- ev: NaN excluded from the aggregate domain (r11 NaN sweep, the
    -- e27/e29/e31 contract: Spark's NaN->decimal cast is silent while
    -- DuckDB's is loud); NULL rows stay (counted; the sum skips them)
    WITH ev AS (
        SELECT * FROM events WHERE value IS NULL OR NOT isnan(value)
    )
    SELECT '5min' AS grain, epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM ev GROUP BY 2
    UNION ALL
    SELECT 'hour', epoch_us(date_trunc('hour', ts)),
           CAST(COUNT(*) AS BIGINT), CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
    FROM ev GROUP BY 2
    UNION ALL
    SELECT 'day', epoch_us(date_trunc('day', ts)),
           CAST(COUNT(*) AS BIGINT), CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
    FROM ev GROUP BY 2
    """,
    "events",
    "rollup",
)
def e11_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate-style rollup at 3 granularities in ONE scan:
    each event explodes to its (grain, bucket) coordinates, then a single
    groupBy aggregates all grains together (vs 3 separate scans).

    The 5-min bucket FLOORS via exact integer arithmetic
    (``us - pmod(us, gap)``): the old ``CAST(us/gap AS BIGINT)*gap``
    truncates toward zero, which puts pre-1970 events (negative epoch
    micros) in a bucket one gap too HIGH and makes bucket 0 two gaps
    wide — found by the round-11 epoch-straddle corpus probe
    (scripts/probe_corpus.py epochs); DuckDB's time_bucket (origin
    2000-01-03, 300s-aligned ⇒ epoch-equivalent) and Spark's own
    window()/date_trunc all floor. Identical output for ts >= 1970.
    NaN rows are excluded from the aggregate domain on both engines (r11
    NaN-sweep contract); NULLs stay."""
    e = load(spark, sf_dir, "events").where(
        F.col("value").isNull() | ~F.isnan("value")
    )
    us = F.unix_micros("ts")
    five_min = F.timestamp_micros(us - F.pmod(us, F.lit(300_000_000)))
    grains = F.array(
        F.struct(F.lit("5min").alias("grain"), five_min.alias("bucket")),
        F.struct(F.lit("hour").alias("grain"), F.date_trunc("hour", "ts").alias("bucket")),
        F.struct(F.lit("day").alias("grain"), F.date_trunc("day", "ts").alias("bucket")),
    )
    return (
        e.select(F.explode(grains).alias("g"), "value")
        .groupBy(F.col("g.grain").alias("grain"), F.col("g.bucket").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .select(
            "grain",
            F.unix_micros("bucket").alias("bucket_us"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
_US_PER_HOUR = 3_600_000_000

_GAPFILL_ORACLE = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // {_US_PER_HOUR} AS hour FROM events
    ),
    counts AS (SELECT user_id, hour, COUNT(*) AS n FROM e GROUP BY 1, 2),
    spans AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM e GROUP BY 1),
    hours AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM spans)
    SELECT h.user_id, h.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM hours h LEFT JOIN counts c USING (user_id, hour)
"""


@REGISTRY.add("e12_gapfill_hourly", _GAPFILL_ORACLE, "events", "resample")
def e12_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with zero-filled gaps (time-series
    regularization): each user's own [first, last] hour range is densified
    via ``sequence`` + ``explode`` — the dense grid is generated, not
    joined against a calendar table, so the plan stays two groupBys and
    one left join, all keyed on user_id (a single shuffle key family)."""
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events").select(
        "user_id", (epoch_us("ts") / _US_PER_HOUR).cast("bigint").alias("hour")
    )
    counts = e.groupBy("user_id", "hour").agg(F.count(F.lit(1)).alias("n"))
    spans = e.groupBy("user_id").agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    hours = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    return hours.join(counts, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


# ---------------------------------------------------------------------------
# streaming session windows: new session when the gap >= 30 min — exactly
# Spark's session_window merge rule (events merge iff diff < gap), so the
# batch oracle reproduces the streaming state machine
_SESSIONS_ORACLE = """
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         >= 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_s
    FROM numbered GROUP BY user_id, session_id
"""


@REGISTRY.add("e13_streaming_sessions", _SESSIONS_ORACLE, "events", "streaming")
def e13_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation as a real append-mode streaming query
    (native ``session_window`` state merging + watermark-flush sentinel);
    checked against the batch gap-scan oracle."""
    from ..streaming.jobs import run_session_stream_to_batch

    return run_session_stream_to_batch(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
_SSJOIN_ORACLE = """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.value IS NULL OR NOT isnan(e.value)
    GROUP BY 1
"""


@REGISTRY.add("e14_stream_static_join", _SSJOIN_ORACLE, "events", "streaming")
def e14_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream hash-joins a broadcast
    customer dimension inside each micro-batch, then aggregates by
    segment (complete mode → totals equal the batch join)."""
    from ..streaming.jobs import run_stream_static_join_to_batch

    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_stream_static_join_to_batch(spark, f"{sf_dir}/events.parquet", dim)


# ---------------------------------------------------------------------------
_FUNNEL_ORACLE = """
    WITH v AS (
        SELECT user_id, MIN(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS tc
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1
    )
    SELECT v.user_id,
           CAST(CASE WHEN p.tp IS NOT NULL THEN 3
                     WHEN c.tc IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
           epoch_us(v.tv) AS view_us, epoch_us(c.tc) AS click_us, epoch_us(p.tp) AS purchase_us
    FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id
"""


@REGISTRY.add("e15_funnel", _FUNNEL_ORACLE, "events", "funnel")
def e15_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: each stage's timestamp is
    the first qualifying event strictly after the previous stage. Three
    conditional min-aggregations and two left joins, all shuffling on
    user_id — co-partitioned end to end, so AQE plans one exchange
    family, not three."""
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("tv"))
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("tp").isNotNull(), 3)
            .when(F.col("tc").isNotNull(), 2)
            .otherwise(1)
            .cast("bigint")
            .alias("stage"),
            epoch_us("tv").alias("view_us"),
            epoch_us("tc").alias("click_us"),
            epoch_us("tp").alias("purchase_us"),
        )
    )


# ---------------------------------------------------------------------------
_COHORT_ORACLE = """
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week, date_trunc('week', e.ts) AS active_week
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT epoch_us(cohort_week) AS cohort_week_us,
           -- exact division of Monday-aligned week starts, NOT
           -- date_diff('week', ...): DuckDB's week diff counts
           -- truncated epoch-anchored 7-day boundaries, so on a
           -- 1970-straddling range it merges adjacent weeks (Dec-29 and
           -- Jan-5 both "2 weeks since" a Dec-15 cohort) — found by the
           -- round-11 epoch-straddle probe; identical for ts >= 1970
           (epoch_us(active_week) - epoch_us(cohort_week))
               // 604800000000 AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY 1, 2
"""


@REGISTRY.add("e16_cohort_retention", _COHORT_ORACLE, "events", "cohort")
def e16_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    in each subsequent active week. Two aggregations and one join, all
    keyed on user_id, then a small (cohort x week) rollup — the fact
    table is touched twice, never cross-joined."""
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = (
        e.join(first, "user_id")
        .select("user_id", "cohort_week", F.date_trunc("week", "ts").alias("active_week"))
        .distinct()
    )
    weeks_since = (
        (F.unix_micros("active_week") - F.unix_micros("cohort_week"))
        / (7 * 24 * 3600 * 1_000_000)
    ).cast("bigint")
    return activity.groupBy(
        epoch_us("cohort_week").alias("cohort_week_us"),
        weeks_since.alias("weeks_since"),
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


# ---------------------------------------------------------------------------
_ATTRIB_ORACLE = """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 2 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


@REGISTRY.add("e17_stream_stream_join", _ATTRIB_ORACLE, "events", "streaming")
def e17_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution as a real stream-STREAM inner join:
    two watermarked streams over the same source, equi-key + event-time
    range condition (the state-bounding shape Structured Streaming
    requires), append mode, drained and checked against the batch
    self-join oracle. Complements e14's stream-static join — this is the
    two-moving-sides case (state evicts by watermark + range, so join
    state is O(users x window) at any stream length)."""
    from ..streaming.jobs import run_stream_stream_join_to_batch

    return run_stream_stream_join_to_batch(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
_ATTRIB_OUTER_ORACLE = """
    SELECT c.event_id AS click_id,
           CAST(COALESCE(p.event_id, -1) AS BIGINT) AS purchase_id,
           c.user_id,
           CAST(COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS BIGINT) AS lag_us
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 2 HOUR
     AND p.event_type = 'purchase'
    WHERE c.event_type = 'click'
"""


@REGISTRY.add("e18_stream_stream_outer_join", _ATTRIB_OUTER_ORACLE, "events", "streaming")
def e18_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e17's attribution join in LEFT OUTER form: unmatched clicks emit a
    sentinel row once the watermark proves no purchase can still arrive —
    the outer-emission + state-timeout path of the stream-stream join
    (exercised with a two-sided sentinel so the drain closes all state).
    Checked against the batch LEFT JOIN oracle."""
    from ..streaming.jobs import run_stream_stream_outer_join_to_batch

    return run_stream_stream_outer_join_to_batch(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# e19: per-user inter-arrival statistics — the activity-cadence profile
# (bot detection: tiny uniform gaps; churn signals: huge ones). One lag
# window per user partition + one grouped aggregate; both shuffles share
# the user_id key. Median is the exact interpolating statistic in both
# engines (A4 discipline, as q17).
_GAP_ORACLE = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           MEDIAN(gap_us) AS median_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
"""


@REGISTRY.add("e19_user_gap_stats", _GAP_ORACLE, "events", "window")
def e19_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event inter-arrival gaps: count, exact median, min, max.
    Users with a single event have no gap and drop out in both engines."""
    from pyspark.sql import Window

    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        (epoch_us(F.col("ts")) - F.lag(epoch_us(F.col("ts"))).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.median("gap_us").alias("median_gap_us"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


# ---------------------------------------------------------------------------
# e20: rolling 7-day distinct users (DAU / WAU-style reach) per observed
# day, plus the DAU/WAU "stickiness" ratio in ppm. Rolling COUNT(DISTINCT)
# admits no window-frame form; the scale-safe shape is a CONTRIBUTION
# EXPLODE — each distinct (user, day) emits the ≤7 report days it reaches,
# then one hash groupBy counts distinct users per report day. Pure
# equi-shuffles (no range join / nested loop), cost bounded at 7× the
# distinct (user, day) set regardless of total event volume — the plan a
# 100 TB event log needs. Report days outside the observed domain are
# dropped by a broadcast semi join (the day dimension is tiny).
_DAU_ORACLE = """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    contrib AS (
        SELECT ud.user_id, ud.day + CAST(t.i AS INTEGER) AS report_day
        FROM ud CROSS JOIN generate_series(0, 6) AS t(i)
    ),
    r AS (
        SELECT c.report_day, COUNT(DISTINCT c.user_id) AS dau7
        FROM contrib c JOIN days d ON c.report_day = d.day
        GROUP BY c.report_day
    ),
    d1 AS (SELECT day, COUNT(DISTINCT user_id) AS dau1 FROM ud GROUP BY day)
    SELECT CAST(r.report_day AS VARCHAR) AS day,
           CAST(d1.dau1 AS BIGINT) AS dau1,
           CAST(r.dau7 AS BIGINT) AS dau7,
           CAST((1000000 * d1.dau1) // r.dau7 AS BIGINT) AS stickiness_ppm
    FROM r JOIN d1 ON d1.day = r.report_day
"""


@REGISTRY.add("e20_rolling_dau", _DAU_ORACLE, "events", "window")
def e20_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per observed day via contribution
    explode (each (user, day) reaches days d..d+6), not a range join."""
    e = load(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("dnum")
    ).distinct()
    days = ud.select("dnum").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.expr("sequence(dnum, dnum + 6)")).alias("report_dnum"),
    )
    r = (
        contrib.join(
            F.broadcast(days.withColumnRenamed("dnum", "report_dnum")),
            "report_dnum",
            "semi",
        )
        .groupBy("report_dnum")
        .agg(F.countDistinct("user_id").alias("dau7"))
    )
    d1 = ud.groupBy("dnum").agg(F.countDistinct("user_id").alias("dau1"))
    return r.join(d1, r["report_dnum"] == d1["dnum"]).select(
        F.date_format(
            F.date_add(F.lit("1970-01-01"), F.col("report_dnum")), "yyyy-MM-dd"
        ).alias("day"),
        F.col("dau1").cast("bigint").alias("dau1"),
        F.col("dau7").cast("bigint").alias("dau7"),
        F.expr("(1000000 * dau1) div dau7").cast("bigint").alias("stickiness_ppm"),
    )


# ---------------------------------------------------------------------------
# e21: per-user TIME-WEIGHTED average value — each event's value holds
# until the user's next event (step-function integral / interval TWAP, the
# tick-data aggregation order books and sensor feeds need; plain AVG
# over-weights bursts). Integer discipline end-to-end: values become exact
# cents via floor(v·100 + 0.5) (both engines floor the same double), hold
# durations are epoch-microsecond BIGINTs from one per-user lag window,
# and the weighted mean is one integer division — no float accumulation,
# so shuffle order cannot perturb the result. Scale shape: the lag window
# and the grouped sum share the user_id exchange.
_TWAP_ORACLE = """
    WITH held AS (
        SELECT user_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) - epoch_us(ts) AS hold_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_held,
           CAST(SUM(hold_us) AS BIGINT) AS total_held_us,
           CAST(SUM(CAST(cents AS HUGEINT) * hold_us) // SUM(hold_us)
                AS BIGINT) AS twap_cents
    FROM held
    WHERE hold_us IS NOT NULL AND hold_us > 0
    GROUP BY user_id
"""


@REGISTRY.add("e21_time_weighted_avg", _TWAP_ORACLE, "events", "window")
def e21_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-weighted (step-function) mean value per user; the final
    event of each user has no hold interval and drops out in both
    engines."""
    from pyspark.sql import Window

    from ..tables import epoch_us

    from ..functions.core import money_cents

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = e.select(
        "user_id",
        # money_cents, not the inline FLOOR idiom: floor(NaN) is a silent
        # 0 engine-side while the oracle refuses loudly (r11 NaN triage)
        money_cents("value").alias("cents"),
        (F.lead(epoch_us(F.col("ts"))).over(w) - epoch_us(F.col("ts"))).alias(
            "hold_us"
        ),
    ).where(F.col("hold_us").isNotNull() & (F.col("hold_us") > 0))
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_held"),
        F.sum("hold_us").cast("bigint").alias("total_held_us"),
        # DECIMAL(38,0)/HUGEINT intermediate (the q43 discipline): the
        # cents·hold_us product sum passes 2⁶³ at tick-data scale — big
        # cents × µs-holds × many rows; the divided result is back in
        # cents range, so the BIGINT output cast is safe
        F.expr(
            "CAST(SUM(CAST(cents AS DECIMAL(38,0)) * hold_us)"
            " div SUM(hold_us) AS BIGINT)"
        ).alias("twap_cents"),
    )


# ---------------------------------------------------------------------------
# e22: event-type transition matrix — the Markov-chain summary behind
# next-action prediction, funnel drop-off triage, and bot fingerprinting
# (bots show near-deterministic rows). One LEAD over the per-user
# (ts, event_id) order gives each event its successor type; the
# (from_type, to_type) counts then reduce in a single map-side-combined
# aggregation. Transition probabilities are integer ppm of the from-type's
# outgoing total — the totals table is |event_type|-sized, so its join
# back onto the matrix is a broadcast, and one BIGINT division cannot
# diverge between engines. Scale shape: the lead window shuffles on
# user_id once (same exchange every per-user operator here shares), and
# everything after is tiny.
_TRANSITION_ORACLE = """
    WITH nxt AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    m AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM nxt WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n) AS out_n FROM m GROUP BY 1)
    SELECT m.from_type, m.to_type,
           CAST(m.n AS BIGINT) AS n,
           CAST((m.n * 1000000) // tot.out_n AS BIGINT) AS p_ppm
    FROM m JOIN tot USING (from_type)
"""


@REGISTRY.add("e22_transition_matrix", _TRANSITION_ORACLE, "events", "window")
def e22_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type → to_type) transition counts and integer-ppm
    probabilities from one per-user LEAD window; each user's last event
    has no successor and drops out in both engines."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    m = nxt.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = m.groupBy("from_type").agg(F.sum("n").alias("out_n"))
    return m.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("(n * 1000000) div out_n").cast("bigint").alias("p_ppm"),
    )


# ---------------------------------------------------------------------------
# e23: watermark-SCOPED streaming dedup with duplicate replay — the
# state-bounded production variant of e07 (whose dropDuplicates state
# grows forever on an infinite stream). Batch 1 streams the whole
# fixture; batch 2 replays event_id % 100 == 0 at arrival time max_ts.
# Keys first seen before max_ts - 2×7d have had their state evicted →
# the replay re-emits (n_emits = 2, at-least-once); keys inside the
# horizon dedup silently (n_emits = 1). The ±1 day exclusion band around
# the eviction boundary keeps both engines' answers identical without
# pinning Spark's internal <= vs < eviction compare.
_WM_DEDUP_ORACLE = """
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
    re AS (
        SELECT event_id FROM events, mx
        WHERE event_id % 100 = 0 AND ts < max_ts - INTERVAL 15 DAY
    )
    SELECT event_id, CAST(COUNT(*) AS BIGINT) AS n_emits FROM (
        SELECT event_id FROM events
        UNION ALL SELECT event_id FROM re
    ) GROUP BY event_id
"""


@REGISTRY.add("e23_watermark_dedup_replay", _WM_DEDUP_ORACLE, "events",
              "streaming", "dedup")
def e23_watermark_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark under a real duplicate replay: every
    key emits once, plus a second emission for replayed keys whose dedup
    state the 7-day watermark horizon already evicted."""
    from ..streaming.jobs import run_watermark_dedup_replay

    return run_watermark_dedup_replay(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# e24: per-user record-breaking events on Spark 4's transformWithState
# API (streaming/jobs.py:record_break_stats) — typed ValueState, the
# successor surface to e08's applyInPandasWithState. The oracle is the
# batch window form: an event "breaks the record" when its value exceeds
# the running max of all earlier events (event-time order, event_id
# tie-break).
_RECORD_ORACLE = """
    WITH w AS (
        -- NULL and NaN values neither set nor break a record (matches
        -- the operator's source filter; without it a NULL event with no
        -- prior record passed the IS NULL arm below and was counted,
        -- and a NaN poisoned the running max on either engine)
        SELECT user_id, value,
               MAX(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE prev_max IS NULL OR value > prev_max)
                AS BIGINT) AS n_records,
           MAX(value) AS max_value
    FROM w GROUP BY user_id
"""


# the registered artifact drains a deterministic 20% user sample (the
# e38 discipline, [[sample-gated-audits]]): full-population e24 measured
# 3.4 s → 25.1 s at 10× rows in the r11 scale grid — the Python stateful
# API pays a per-key call, so wall time is linear in entities. The
# full-population operator stays pinned in test_streaming_semantics.py.
_RECORD_SAMPLED_ORACLE = _RECORD_ORACLE.replace(
    "FROM events",
    "FROM (SELECT * FROM events WHERE ('0x' || substr(md5(CAST(user_id AS"
    " VARCHAR)), 1, 8))::UBIGINT % 1000000 < 200000) events",
)


@REGISTRY.add("e24_record_high_counts", _RECORD_SAMPLED_ORACLE, "events",
              "streaming", "stateful")
def e24_record_high_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-water-mark monitor per user (20% deterministic user sample):
    how many events set a new all-time value record, and the final
    record — run as a real stateful streaming query drained to batch."""
    from ..streaming.jobs import run_record_breaks_to_batch

    return run_record_breaks_to_batch(
        spark, f"{sf_dir}/events.parquet", user_sample_ppm=200_000
    )


# ---------------------------------------------------------------------------
# e25: interval (range) join — "who else was active while user u warmed
# up": each user's opening window [first event, +30 min] joined against
# EVERY other user's events falling inside it. A raw BETWEEN join is a
# nested-loop at scale; the engine's binned_interval_join discretizes
# time into 10-minute bins so the range predicate rides an equi-join on
# the bin id (operators/rangejoin.py — the Databricks-range-join-hint /
# spatial-binning trick as a composable operator). Counts are exact:
# each qualifying pair meets in exactly one bin.
_IVL_LEN_US = 30 * 60 * 1_000_000
_IVL_BIN_US = 10 * 60 * 1_000_000
_INTERVAL_ORACLE = f"""
    WITH firsts AS (
        SELECT user_id, epoch_us(MIN(ts)) AS win_start_us,
               epoch_us(MIN(ts)) + {_IVL_LEN_US} AS win_end_us
        FROM events GROUP BY user_id
    )
    SELECT f.user_id, f.win_start_us, f.win_end_us,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_other_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_other_users
    FROM firsts f
    JOIN events e
      ON epoch_us(e.ts) BETWEEN f.win_start_us AND f.win_end_us
     AND e.user_id <> f.user_id
    GROUP BY 1, 2, 3
"""


@REGISTRY.add("e25_interval_overlap_counts", _INTERVAL_ORACLE, "events",
              "range-join")
def e25_interval_overlap_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user opening-window overlap: events and distinct users from
    OTHER users inside [first_ts, first_ts + 30 min], via the binned
    interval join (10-minute bins — no nested-loop in the plan,
    asserted in test_plans.py)."""
    from ..operators.rangejoin import binned_interval_join
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    firsts = (
        e.groupBy("user_id")
        .agg(F.min(epoch_us(F.col("ts"))).alias("win_start_us"))
        .withColumn("win_end_us", F.col("win_start_us") + F.lit(_IVL_LEN_US))
    )
    pts = e.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("p_event_id"),
        epoch_us(F.col("ts")).alias("t_us"),
    )
    joined = binned_interval_join(
        firsts, pts, "win_start_us", "win_end_us", "t_us", _IVL_BIN_US
    ).where(F.col("p_user_id") != F.col("user_id"))
    return joined.groupBy("user_id", "win_start_us", "win_end_us").agg(
        F.count("p_event_id").cast("bigint").alias("n_other_events"),
        F.countDistinct("p_user_id").cast("bigint").alias("n_other_users"),
    )


# ---------------------------------------------------------------------------
# e26: incremental aggregate maintenance — the materialized-view shape:
# per-user stats over the first 25 days exist as a persisted STATE
# table; the last days arrive as a delta batch. The engine computes the
# partial state of each side and MERGES them (count ⊕ sum ⊕ min ⊕ max —
# the algebraic combine, one union + re-agg over state-sized rows, never
# re-reading the base facts), while the oracle aggregates the full table
# directly: hash equality proves the maintenance algebra, exactly the
# s13-sketch / d21-dedup pattern for general aggregates. Decimal(12,4)
# sums keep the merge bit-exact; avg is derived at read time from the
# merged (sum, count), never maintained itself (non-algebraic).
_INC_SPLIT = "2024-01-26"
_INC_AGG_ORACLE = f"""
    -- NaN excluded from the maintained-aggregate domain (r11 NaN sweep,
    -- same contract as e27/e29/e31: Spark's NaN->decimal cast is silent
    -- while DuckDB's is loud, and MIN/MAX NaN conventions differ); NULL
    -- rows stay — sums/extrema skip them, n_events counts them.
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    WHERE value IS NULL OR NOT isnan(value)
    GROUP BY user_id
"""


@REGISTRY.add("e26_incremental_agg_merge", _INC_AGG_ORACLE, "events",
              "incremental")
def e26_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stats via base-state ⊕ delta-state merge (split at
    2024-01-26) — must equal the direct full-table aggregation. NaN is
    excluded from the maintained domain (explicit contract, as e31)."""
    ev = load(spark, sf_dir, "events").select(
        "ts", "user_id", "value"
    ).where(F.col("value").isNull() | ~F.isnan("value"))
    split = F.to_timestamp(F.lit(_INC_SPLIT))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast(D)).alias("sum_dec"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    base = partial(ev.where(F.col("ts") < split))
    delta = partial(ev.where(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("total_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# e27: distribution-drift report — the feature-monitoring pass a training
# pipeline runs before trusting a new data drop: per event_type, the
# `value` distribution of the month's FIRST half vs its second half over
# 10 equi-width bins of the GLOBAL [min, max]. Outputs are exact
# integers (counts + ppm shares + delta); no PSI/KL scalar because ln()
# is libm-dependent — the per-bin ppm deltas carry the same signal and
# survive the cross-engine hash gate. Two scans' worth of work in ONE
# pass (conditional aggregation on the half flag); the min/max is a
# 1-row broadcast.
_DRIFT_SPLIT = "2024-01-16"
_DRIFT_BINS = 10
_DRIFT_ORACLE = f"""
    -- ev: NaN excluded from the distribution domain (engine contract;
    -- NULL stays and bins at 0 via the COALESCE, as before)
    WITH ev AS (
        SELECT ts, event_type, value FROM events
        WHERE value IS NULL OR NOT isnan(value)
    ),
    b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM ev),
    binned AS (
        SELECT e.event_type,
               LEAST(CAST(COALESCE(FLOOR((e.value - b.mn)
                                          / NULLIF(b.mx - b.mn, 0)
                                          * {_DRIFT_BINS}), 0) AS BIGINT),
                     {_DRIFT_BINS - 1}) AS bin,
               CASE WHEN e.ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END
                   AS early
        FROM ev e CROSS JOIN b
    ), counts AS (
        SELECT event_type, bin,
               CAST(SUM(early) AS BIGINT) AS n_early,
               CAST(COUNT(*) - SUM(early) AS BIGINT) AS n_late
        FROM binned GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               SUM(n_early) AS t_early, SUM(n_late) AS t_late
        FROM counts GROUP BY 1
    )
    SELECT c.event_type, c.bin, c.n_early, c.n_late,
           CAST(c.n_early * 1000000 // NULLIF(t.t_early, 0) AS BIGINT)
               AS share_early_ppm,
           CAST(c.n_late * 1000000 // NULLIF(t.t_late, 0) AS BIGINT)
               AS share_late_ppm,
           CAST(c.n_early * 1000000 // NULLIF(t.t_early, 0)
                - c.n_late * 1000000 // NULLIF(t.t_late, 0) AS BIGINT)
               AS delta_ppm
    FROM counts c JOIN tot t ON t.event_type = c.event_type
"""


@REGISTRY.add("e27_distribution_drift", _DRIFT_ORACLE, "events", "quality")
def e27_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type early-vs-late value-distribution drift over 10 global
    equi-width bins: counts, ppm shares, ppm delta — all exact. NaN is
    excluded from the distribution domain (r11 NaN sweep: Spark's
    floor(NaN) silently bins it at 0 while DuckDB refuses the cast)."""
    ev = load(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).where(F.col("value").isNull() | ~F.isnan("value"))
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    split = F.to_timestamp(F.lit(_DRIFT_SPLIT))
    binned = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        # NULLIF+COALESCE: a constant-value corpus (mx == mn) puts every
        # row in bin 0 deterministically on both engines, instead of an
        # ANSI 0/0 crash
        F.least(
            F.coalesce(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / F.expr("nullif(mx - mn, 0)")
                    * F.lit(_DRIFT_BINS)
                ),
                F.lit(0),
            ).cast("bigint"),
            F.lit(_DRIFT_BINS - 1).cast("bigint"),
        ).alias("bin"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("early"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("early").cast("bigint").alias("n_early"),
        (F.count(F.lit(1)) - F.sum("early")).cast("bigint").alias("n_late"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_early").alias("t_early"), F.sum("n_late").alias("t_late")
    )
    return (
        counts.join(tot, "event_type")
        .select(
            "event_type", "bin", "n_early", "n_late",
            # NULLIF: if EVERY event falls on one side of the split
            # (degenerate clock), the other window's share is NULL on
            # both engines, never an ANSI divide-by-zero
            F.expr("n_early * 1000000 div nullif(t_early, 0)")
            .cast("bigint").alias("share_early_ppm"),
            F.expr("n_late * 1000000 div nullif(t_late, 0)")
            .cast("bigint").alias("share_late_ppm"),
            F.expr(
                "n_early * 1000000 div nullif(t_early, 0)"
                " - n_late * 1000000 div nullif(t_late, 0)"
            ).cast("bigint").alias("delta_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# e28: gaps-and-islands — per-user consecutive-active-day streaks, the
# classic interval-compression primitive (SCD-2 builders, session
# coalescing, uptime reports all reduce to it). The trick is pure
# algebra: rank active days per user, subtract the rank (in days) from
# the day itself, and consecutive runs collapse onto one anchor date —
# no iteration, one distinct + one window + one groupBy. Dates are
# grouped as DATE values end to end (no epoch math to drift).
_STREAK_ORACLE = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), anchored AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM days
    )
    SELECT user_id,
           CAST(strftime(MIN(day), '%Y-%m-%d') AS VARCHAR) AS streak_start,
           CAST(strftime(MAX(day), '%Y-%m-%d') AS VARCHAR) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM anchored
    GROUP BY user_id, anchor
"""


@REGISTRY.add("e28_activity_streaks", _STREAK_ORACLE, "events", "windows")
def e28_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks via the rank-subtraction
    islands trick; emits (user_id, streak_start, streak_end, n_days)."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    anchored = days.select(
        "user_id",
        "day",
        F.date_sub(
            "day",
            F.row_number()
            .over(W.partitionBy("user_id").orderBy("day"))
            .cast("int"),
        ).alias("anchor"),
    )
    return anchored.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).drop("anchor")


# ---------------------------------------------------------------------------
# e29: robust outlier detection — median/MAD, the screen that survives
# the contamination that wrecks mean/stddev z-scores (one bad sensor
# shifts a mean; it cannot shift a median). Two exact interpolated
# medians (value, then |value − median|, the q17/q26-proven parity) and
# a 3·MAD cut. Two grouped percentile passes + one broadcast-back join —
# no window over the full data.
_MAD_CUT = 3.0
_MAD_ORACLE = """
    -- ev: NaN is excluded from the robust screen's domain (it is a
    -- DIFFERENT defect class than numeric deviation, and the engines'
    -- quantile/percentile NaN conventions differ); NULL rows stay —
    -- both engines' quantiles skip them while n_events counts them.
    WITH ev AS (
        SELECT event_type, value FROM events
        WHERE value IS NULL OR NOT isnan(value)
    ), med AS (
        SELECT event_type, quantile_cont(value, 0.50) AS med
        FROM ev GROUP BY 1
    ), mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.50) AS mad
        FROM ev e JOIN med m ON m.event_type = e.event_type
        GROUP BY 1
    )
    SELECT e.event_type, m.med AS median_value, d.mad AS mad_value,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE abs(e.value - m.med) > 3.0 * d.mad)
                AS BIGINT) AS n_outliers
    FROM ev e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    GROUP BY 1, 2, 3
"""


@REGISTRY.add("e29_mad_outliers", _MAD_ORACLE, "events", "quality")
def e29_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type median/MAD and the 3·MAD outlier count — the robust
    data-quality screen. NaN values are excluded (a different defect
    class; the engines' quantile NaN conventions differ), NULLs stay:
    quantiles skip them while n_events counts them."""
    ev = load(spark, sf_dir, "events").select("event_type", "value").where(
        F.col("value").isNull() | ~F.isnan("value")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy(
            "event_type",
            F.col("med").alias("median_value"),
            F.col("mad").alias("mad_value"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(_MAD_CUT) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# e30: the STREAMING materialized view — e26's algebraic state merge run
# as a real multi-micro-batch foreachBatch query maintaining a parquet
# state table (tmp-then-swap writes, last-applied-batch-id idempotence
# for foreachBatch's at-least-once replays). The drained state must
# equal the one-shot batch aggregation — the same oracle as e26.
@REGISTRY.add("e30_stream_agg_merge", _INC_AGG_ORACLE, "events",
              "streaming", "incremental")
def e30_stream_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stats maintained as a streaming materialized view
    (streaming/jobs.run_stream_agg_merge_to_batch)."""
    from ..streaming.jobs import run_stream_agg_merge_to_batch

    return run_stream_agg_merge_to_batch(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# e31: mergeable second MOMENTS — the variance companion to e26's
# count/sum/min/max maintenance. Welford/Chan float combines are
# order-sensitive (not reproducible across merge trees); the exact
# alternative is sufficient statistics in integer units: v_e4 =
# decimal(12,4)·10⁴ is an exact integer, so (n, Σv, Σv²) merge by plain
# integer addition — any merge order, any shard count, bit-identical.
# Variance derives at read time as (n·Σv² − (Σv)²) div n² in e8 units.
# r11 (r10 verdict task 4): the sums ride DECIMAL(38,0)/HUGEINT — the
# e21/q43 discipline — because Σv² passes 2⁶³ at tick-data magnitudes
# (v_e4 ~4·10¹¹ on the big-values probe squares to 1.6·10²³ per event).
# Outputs: Σv/Σv²/var render as exact digit STRINGS (the s08 pattern —
# DuckDB materializes HUGEINT/DECIMAL(38,0) as float64 in pandas, so a
# numeric emit breaks the representation-sensitive hash); n and the
# value-ranged mean stay BIGINT. Residual envelope: s1², n·s2 and n²
# must fit 38 digits — ~10× past int64 on s1, 10²⁰× on s2 — and BOTH
# engines fail LOUDLY beyond it (Spark ANSI decimal overflow, DuckDB
# HUGEINT overflow), never silently.
_MOM_ORACLE = f"""
    WITH v AS (
        -- NaN excluded from the moment domain (r11 NaN sweep: Spark's
        -- NaN->decimal cast is silent while DuckDB's is loud; exclusion
        -- is the explicit contract, same as e27/e29). NULL values stay
        -- and are skipped by the sums while COUNT(*) counts the row.
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS HUGEINT) AS v_e4
        FROM events
        WHERE value IS NULL OR NOT isnan(value)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v_e4) AS VARCHAR) AS s1_e4,
           CAST(SUM(v_e4 * v_e4) AS VARCHAR) AS s2_e8,
           CAST(SUM(v_e4) // COUNT(*) AS BIGINT) AS mean_e4,
           CAST((COUNT(*) * SUM(v_e4 * v_e4) - SUM(v_e4) * SUM(v_e4))
                // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)) AS VARCHAR)
               AS var_e8
    FROM v GROUP BY user_id
"""


@REGISTRY.add("e31_incremental_moments", _MOM_ORACLE, "events", "incremental")
def e31_incremental_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moment sufficient statistics assembled by MERGING
    base-state ⊕ delta-state exact integer sums on DECIMAL(38,0)
    (split at 2024-01-26, as e26) — must equal the direct full-table
    computation at any magnitude inside the 38-digit envelope. NaN is
    excluded from the moment domain (explicit contract, as e27/e29);
    NULLs stay — sums skip them, n counts them."""
    ev = load(spark, sf_dir, "events").select(
        "ts", "user_id", "value"
    ).where(F.col("value").isNull() | ~F.isnan("value"))
    split = F.to_timestamp(F.lit(_INC_SPLIT))
    # decimal(18,0) per-row unit: the square types as decimal(37,0) and
    # the sums widen to decimal(38,0) without hitting Spark's precision
    # cap at the TYPE level; actual VALUE overflow raises under ANSI
    v_e4 = (F.col("value").cast("decimal(12,4)") * 10000).cast("decimal(18,0)")

    def partial(df: DataFrame) -> DataFrame:
        return df.select("user_id", v_e4.alias("v")).groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("v") * F.col("v")).cast("decimal(38,0)").alias("s2"),
        )

    merged = (
        partial(ev.where(F.col("ts") < split))
        .unionByName(partial(ev.where(F.col("ts") >= split)))
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s1").cast("decimal(38,0)").alias("s1_e4"),
            F.sum("s2").cast("decimal(38,0)").alias("s2_e8"),
        )
    )
    merged = merged.withColumn(
        "v_num",
        F.expr("CAST(n AS DECIMAL(38,0)) * s2_e8 - s1_e4 * s1_e4"),
    ).withColumn("nn", F.expr("CAST(n AS DECIMAL(38,0)) * n"))
    return merged.select(
        "user_id", "n",
        F.col("s1_e4").cast("string").alias("s1_e4"),
        F.col("s2_e8").cast("string").alias("s2_e8"),
        F.expr("s1_e4 div n").cast("bigint").alias("mean_e4"),
        # exact integer division WITHOUT `div`: Spark's div on decimal
        # operands returns BIGINT and silently WRAPS past 2⁶³ (measured
        # on the big-values corpus: Spark emitted DuckDB's value − 2⁶⁴).
        # X ≥ 0 (Cauchy-Schwarz), so subtract the exact decimal modulus
        # first — the remaining quotient is an integer, which decimal
        # division at scale 6 renders exactly before the (38,0) recast.
        F.expr(
            "CAST(CAST((v_num - v_num % nn) / nn AS DECIMAL(38,0))"
            " AS STRING)"
        ).alias("var_e8"),
    )


# ---------------------------------------------------------------------------
# e32: out-of-order ARRIVAL audit — the number that sizes a stream's
# watermark: per user, how many events arrive (event_id = ingest
# sequence) with an event time EARLIER than something already seen, and
# how late the worst one is. Partitioned running max (user-keyed window,
# never a global one) + integer µs lateness.
_OOO_ORACLE = """
    WITH w AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS t_us,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seen_max_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE t_us < seen_max_us) AS BIGINT)
               AS n_out_of_order,
           CAST(COALESCE(MAX(seen_max_us - t_us)
                         FILTER (WHERE t_us < seen_max_us), 0) AS BIGINT)
               AS max_lateness_us
    FROM w GROUP BY user_id
"""


@REGISTRY.add("e32_out_of_order_audit", _OOO_ORACLE, "events", "quality",
              "streaming")
def e32_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user out-of-order arrival counts and worst lateness in µs —
    the watermark-sizing audit."""
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us(F.col("ts")).alias("t_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    audited = ev.withColumn("seen_max_us", F.max("t_us").over(w))
    late = F.col("t_us") < F.col("seen_max_us")
    return audited.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("bigint")
        .alias("n_out_of_order"),
        F.coalesce(
            F.max(F.when(late, F.col("seen_max_us") - F.col("t_us"))),
            F.lit(0),
        ).cast("bigint").alias("max_lateness_us"),
    )


# ---------------------------------------------------------------------------
# e33: cumulative user GROWTH — the running-distinct curve every
# dashboard wants, computed WITHOUT a running-distinct (which would
# carry a per-day set): each user's first-seen day reduces the problem
# to a per-day count + a cumulative sum over the DAY table (30 rows —
# the only window is calendar-sized, never data-sized).
_GROWTH_ORACLE = """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ), daily AS (
        SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(n_new AS BIGINT) AS n_new_users,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_cum_users
    FROM daily
"""


@REGISTRY.add("e33_user_growth", _GROWTH_ORACLE, "events", "windows")
def e33_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new and cumulative distinct users via the first-seen-day
    reduction; the cumulative window runs over calendar days only."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("n_cum_users"),
    )


# ---------------------------------------------------------------------------
# e34: SCD TYPE-2 interval build — the warehouse-history twin of q37's
# snapshot CDC: collapse each user's event-type sequence into versioned
# validity intervals (valid_from/valid_to, half-open; the current
# version has NULL valid_to). Gaps-and-islands over a deterministic
# (ts, event_id) order: change flag -> running version number -> one
# keyed agg per island -> LEAD for the closing edge. Every window is
# per-user; timestamps cross engines as epoch microseconds.
_SCD2_ORACLE = """
    WITH o AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
    ), runs AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM o
    ), island AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               MIN(event_type) AS state,
               epoch_us(MIN(ts)) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, version
    )
    SELECT user_id, version, state, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
               IS NULL AS is_current,
           n_events
    FROM island
"""


@REGISTRY.add("e34_scd2_intervals", _SCD2_ORACLE, "events", "warehouse",
              "cdc")
def e34_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned SCD2 validity intervals of each user's event-type state
    (valid_to NULL on the open current version)."""
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = F.lag("event_type").over(wo)
    chg = F.when(
        lagged.isNull() | (lagged != F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.withColumn(
        "version",
        F.sum(chg).over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    island = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        epoch_us(F.min("ts")).alias("valid_from_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wv = W.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from_us").over(wv)
    return island.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "state",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# e35: POINT-IN-TIME training-set assembly — the feature-store primitive
# (leakage-safe label/feature join): every 'purchase' event is a label
# row whose features are computed over that user's history STRICTLY
# before the label timestamp (frame ends at 1 PRECEDING, never the
# current row — the leakage bug this operator exists to prevent). All
# windows are keyed by user; value sums ride DECIMAL(12,4) (exact,
# order-free), recency crosses engines as epoch microseconds.
_PIT_ORACLE = """
    WITH ev AS (
        -- NaN rows excluded from the feature-history domain on both
        -- engines (r11 NaN-sweep contract: Spark's NaN->decimal cast is
        -- silent while DuckDB's is loud); NULL values stay — counted in
        -- n_prior_events, skipped by the spend sum.
        SELECT * FROM events WHERE value IS NULL OR NOT isnan(value)
    ), h AS (
        SELECT event_id, user_id, event_type, ts,
               epoch_us(ts) AS ts_us,
               COUNT(*) OVER w AS n_prior_events,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER w AS n_prior_purchases,
               SUM(CAST(value AS DECIMAL(12,4))) OVER w AS prior_value,
               LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts_us AS label_ts_us,
           CAST(COALESCE(n_prior_events, 0) AS BIGINT) AS n_prior_events,
           CAST(COALESCE(n_prior_purchases, 0) AS BIGINT)
               AS n_prior_purchases,
           CAST(CAST(COALESCE(prior_value, 0) AS VARCHAR) AS DOUBLE)
               AS prior_value_sum,
           ts_us - prev_us AS us_since_prev_event
    FROM h WHERE event_type = 'purchase'
"""


@REGISTRY.add("e35_pit_training_set", _PIT_ORACLE, "events", "features",
              "training")
def e35_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe training rows: one row per purchase label with the
    user's strictly-prior activity features (counts, exact prior spend,
    microseconds since the previous event). NaN rows are excluded from
    the feature-history domain on both engines (r11 NaN-sweep
    contract); NULLs stay."""
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNull() | ~F.isnan("value")
    )
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    wp = wo.rowsBetween(W.unboundedPreceding, -1)
    h = ev.select(
        "event_id",
        "user_id",
        "event_type",
        epoch_us(F.col("ts")).alias("ts_us"),
        F.count(F.lit(1)).over(wp).alias("n_prior_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(wp).alias("n_prior_purchases"),
        F.sum(F.col("value").cast(D)).over(wp).alias("prior_value"),
        F.lag(epoch_us(F.col("ts"))).over(wo).alias("prev_us"),
    )
    return h.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("label_ts_us"),
        F.coalesce("n_prior_events", F.lit(0)).cast("bigint")
        .alias("n_prior_events"),
        F.coalesce("n_prior_purchases", F.lit(0)).cast("bigint")
        .alias("n_prior_purchases"),
        F.coalesce(F.col("prior_value"), F.lit(0).cast(D)).cast("double")
        .alias("prior_value_sum"),
        (F.col("ts_us") - F.col("prev_us")).alias("us_since_prev_event"),
    )


# ---------------------------------------------------------------------------
# e36: AS-OF snapshot over the e34 SCD2 history — time travel: rebuild
# every user's state at a single instant T (the midpoint of the event
# log, derived identically in both engines as exact integer µs). One
# scalar agg broadcast onto the interval table, then a pure per-row
# interval-containment filter — at 100 TB this is a metadata-cheap
# filter over the history table, no shuffle beyond e34's own.
_ASOF_ORACLE = f"""
    WITH scd AS ({_SCD2_ORACLE}),
    t AS (
        SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT)
            AS snap_us
        FROM events
    )
    SELECT s.user_id, s.version, s.state, s.valid_from_us, s.n_events,
           t.snap_us
    FROM scd s CROSS JOIN t
    WHERE s.valid_from_us <= t.snap_us
      AND (s.valid_to_us IS NULL OR s.valid_to_us > t.snap_us)
"""


@REGISTRY.add("e36_asof_snapshot", _ASOF_ORACLE, "events", "warehouse",
              "cdc")
def e36_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every user's SCD2 state as of the event-log midpoint instant
    (half-open interval containment; open versions qualify)."""
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events")
    us = epoch_us(F.col("ts"))
    t = ev.agg(
        F.min(us).alias("_mn"), F.max(us).alias("_mx")
    ).select(F.expr("CAST((_mn + _mx) div 2 AS BIGINT)").alias("snap_us"))
    scd = e34_scd2_intervals(spark, sf_dir)
    return (
        scd.crossJoin(F.broadcast(t))
        .where(
            (F.col("valid_from_us") <= F.col("snap_us"))
            & (F.col("valid_to_us").isNull()
               | (F.col("valid_to_us") > F.col("snap_us")))
        )
        .select("user_id", "version", "state", "valid_from_us", "n_events",
                "snap_us")
    )


# ---------------------------------------------------------------------------
# e37: half-life-DECAYED user value — the recency-weighted engagement
# score every ranking/retention system keeps. Exact by construction:
# decay is a STEP half-life (weight halves every 30 days of age,
# constant within the epoch — 1e6 >> (age/30) in integer arithmetic),
# so the per-event weighted cents are BIGINT products, not a float
# pow() whose libm rounding could differ between engines (ln() parity
# is pinned by d28; pow() is not). Age anchors to the log's max
# timestamp; the scalar broadcasts. One keyed agg per user — no
# windows, no sorts.
_DECAY_ORACLE = """
    WITH t AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
    ev AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents,
               LEAST((t.now_us - epoch_us(ts)) // 86400000000 // 30, 62)
                   AS epochs
        FROM events CROSS JOIN t
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS raw_cents,
           CAST(SUM(cents * (1000000 // (CAST(1 AS BIGINT) << epochs)))
                AS BIGINT) AS decayed_cents_ppm
    FROM ev GROUP BY user_id
"""


@REGISTRY.add("e37_decayed_user_value", _DECAY_ORACLE, "events", "features")
def e37_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spend under a 30-day step half-life anchored at the log
    maximum (integer ppm weights — engine-exact, no float pow)."""
    from ..functions.core import money_cents_decimal
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events")
    us = epoch_us(F.col("ts"))
    t = ev.agg(F.max(us).alias("now_us"))
    return (
        ev.select(
            "user_id",
            us.alias("us"),
            # loud-on-NaN variant of the DECIMAL cents idiom (r11 triage:
            # DECIMAL(NaN)=NULL silently dropped rows from sums)
            money_cents_decimal("value").alias("cents"),
        )
        .crossJoin(F.broadcast(t))
        .withColumn(
            "epochs",
            F.expr("least((now_us - us) div 86400000000 div 30, 62)"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("raw_cents"),
            F.sum(
                F.expr(
                    "cents * (1000000 div shiftleft(cast(1 as bigint),"
                    " cast(epochs as int)))"
                )
            ).cast("bigint").alias("decayed_cents_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# e38: STREAMING SCD2 maintenance — e34's interval build run as a real
# multi-micro-batch stateful streaming query (applyInPandasWithState;
# state = the open version per user, four scalars). The drain splits
# the log at its time midpoint into two real batches — versions opened
# in batch 1 must close against carried state in batch 2 — plus a
# flush-sentinel batch emitting still-open versions. The registered
# artifact drains a deterministic 20% user sample (the Python stateful
# API pays a per-key-per-batch call, so wall time is linear in
# entities; the sampled drain audits the identical state machine —
# tests/test_streaming_semantics.py runs the full-population operator
# and pins the cross-batch carry). Oracle: e34's gaps-and-islands over
# the same sampled users — streaming and batch must agree row-for-row.
_SCD2_SAMPLED_ORACLE = _SCD2_ORACLE.replace(
    "FROM events",
    "FROM (SELECT * FROM events WHERE ('0x' || substr(md5(CAST(user_id AS"
    " VARCHAR)), 1, 8))::UBIGINT % 1000000 < 200000) events",
)


@REGISTRY.add("e38_streaming_scd2", _SCD2_SAMPLED_ORACLE, "events",
              "streaming", "warehouse", "cdc")
def e38_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals maintained by a stateful streaming query
    across micro-batch boundaries (20% deterministic user sample),
    drained and checked against the batch gaps-and-islands oracle."""
    from ..streaming.jobs import run_scd2_stream_to_batch

    return run_scd2_stream_to_batch(
        spark, f"{sf_dir}/events.parquet", user_sample_ppm=200_000
    )


# ---------------------------------------------------------------------------
# e39: TEMPORAL dimension join — the fact-to-SCD2 pattern every
# warehouse runs: enrich each purchase event with the user's versioned
# state AS OF the event's own timestamp (half-open containment; the
# open current version catches the tail). The plan is a keyed equi-join
# on user_id with the interval predicate as a post-join filter — the
# right shape because SCD2 versions per user are few (fan-out = version
# count, not a range-join pair space); a dimension with huge per-key
# version counts would switch to e25's binned range join. Joining each
# purchase to the version OPENED BY ITSELF is the classic off-by-one:
# the filter uses <= / > exactly as the oracle does, so an event that
# opens version v lands in v (its own state), not v-1.
_TDJ_ORACLE = f"""
    WITH scd AS ({_SCD2_ORACLE}),
    fact AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts_us, f.cents,
           s.version, s.state, s.valid_from_us
    FROM fact f
    JOIN scd s
      ON s.user_id = f.user_id
     AND s.valid_from_us <= f.ts_us
     AND (s.valid_to_us IS NULL OR s.valid_to_us > f.ts_us)
"""


@REGISTRY.add("e39_temporal_dim_join", _TDJ_ORACLE, "events", "warehouse",
              "cdc")
def e39_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases enriched with the user's SCD2 state as of each event's
    timestamp (keyed join + interval filter; version fan-out bounded)."""
    from ..functions.core import money_cents_decimal
    from ..tables import epoch_us

    scd = e34_scd2_intervals(spark, sf_dir).select(
        "user_id", "version", "state", "valid_from_us", "valid_to_us"
    )
    fact = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            epoch_us(F.col("ts")).alias("ts_us"),
            # loud-on-NaN variant of the DECIMAL cents idiom (r11 triage)
            money_cents_decimal("value").alias("cents"),
        )
    )
    return (
        fact.join(scd, "user_id")
        .where(
            (F.col("valid_from_us") <= F.col("ts_us"))
            & (F.col("valid_to_us").isNull()
               | (F.col("valid_to_us") > F.col("ts_us")))
        )
        .select("event_id", "user_id", "ts_us", "cents", "version", "state",
                "valid_from_us")
    )


# ---------------------------------------------------------------------------
# e40: top SESSION PATHS — the product-analytics staple after
# sessionization: which exact event-type sequences do sessions follow
# most often (onboarding funnels, rage paths, drop-in-one-step)?
# Sessions come from e03's gap logic (30-min inactivity); each
# session's path is its event types joined in (ts, event_id) order —
# order imposed by sorting (ts_us, event_id, event_type) structs, not
# collect order, so the path string is deterministic under any
# partitioning. Top 25 by (count desc, path asc): result-bounded
# TakeOrderedAndProject, never a global sort of the path table.
_PATHS_K = 25
_PATHS_ORACLE = """
    WITH w AS (
        SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM w
    ), paths AS (
        SELECT user_id, session_id,
               array_to_string(list(event_type ORDER BY ts_us, event_id),
                               '>') AS path,
               CAST(COUNT(*) AS BIGINT) AS path_len
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT path,
           CAST(MIN(path_len) AS BIGINT) AS path_len,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 25
"""


@REGISTRY.add("e40_session_paths", _PATHS_ORACLE, "events", "sessions",
              "funnel")
def e40_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 25 most common exact session event-type paths (30-min gap
    sessions; deterministic struct-sort order inside each session)."""
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    us = epoch_us(F.col("ts"))
    lag_us = epoch_us(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_sess",
        F.when(lag_us.isNull() | ((us - lag_us) > gap_us), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).withColumn("ts_us", us)
    paths = (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts_us", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).cast("bigint").alias("path_len"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.min("path_len").cast("bigint").alias("path_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(_PATHS_K)
    )


# ---------------------------------------------------------------------------
# e41: MULTI-TOUCH attribution — e09 gives the purchase to the single
# latest view; real marketing attribution splits it across EVERY touch
# (view/click) in the 24 h window before the purchase. The allocation
# must be exact money: cents are FLOOR(value·100 + 0.5) BIGINTs, each
# touch gets cents div n, and the integer remainder goes to the LAST
# touch (the deterministic tie-break), so SUM(linear_cents) per purchase
# equals the purchase's cents exactly — an invariant a float split can't
# give. Plan: one equi-join on user_id with the time window as a
# residual filter (pair space is per-user touches × purchases, never
# cross-user), then one purchase-partitioned window.
_MTA_WIN_US = 24 * 3600 * 1_000_000
_MTA_ORACLE = f"""
    WITH t AS (
        SELECT user_id, event_id AS touch_id, event_type AS touch_type,
               epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('view', 'click')
    ), p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT p.purchase_id, p.user_id, p.cents, t.touch_id, t.touch_type,
               t.t_us,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                  ORDER BY t.t_us, t.touch_id) AS touch_rank
        FROM p JOIN t ON t.user_id = p.user_id
         AND t.t_us < p.p_us AND t.t_us >= p.p_us - {_MTA_WIN_US}
    )
    SELECT purchase_id, user_id, touch_id, touch_type,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(touch_rank AS BIGINT) AS touch_rank,
           CAST(cents // n_touches
                + CASE WHEN touch_rank = n_touches
                       THEN cents % n_touches ELSE 0 END AS BIGINT)
               AS linear_cents
    FROM j
"""


@REGISTRY.add("e41_multitouch_attribution", _MTA_ORACLE, "events",
              "attribution")
def e41_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's exact cents split
    evenly across its user's view/click touches in the prior 24 h, the
    integer remainder assigned to the last touch so the per-purchase sum
    is exact. Negative cents (refunds/chargebacks) are safe: Spark `div`
    and DuckDB BIGINT `//` BOTH truncate toward zero with matching `%`,
    so n·(c div n) + c % n == c holds on both engines — pinned by
    tests/test_unicode_parity.py::
    test_integer_split_division_parity_on_negatives."""
    from ..functions.core import money_cents
    from ..tables import epoch_us

    e = load(spark, sf_dir, "events")
    t = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        epoch_us(F.col("ts")).alias("t_us"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        epoch_us(F.col("ts")).alias("p_us"),
        # money_cents, not the inline FLOOR idiom: floor(NaN) is a silent
        # 0 engine-side while the oracle refuses loudly (r11 NaN triage)
        money_cents("value").alias("cents"),
    )
    j = p.join(t, "user_id").where(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _MTA_WIN_US)
    )
    j = j.select(
        "purchase_id", "user_id", "cents", "touch_id", "touch_type",
        F.count(F.lit(1)).over(W.partitionBy("purchase_id"))
        .alias("n_touches"),
        F.row_number().over(
            W.partitionBy("purchase_id").orderBy("t_us", "touch_id")
        ).alias("touch_rank"),
    )
    return j.select(
        "purchase_id", "user_id", "touch_id", "touch_type",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        F.col("touch_rank").cast("bigint").alias("touch_rank"),
        F.expr(
            "CAST(cents div n_touches + CASE WHEN touch_rank = n_touches"
            " THEN cents % n_touches ELSE 0 END AS BIGINT)"
        ).alias("linear_cents"),
    )


# ---------------------------------------------------------------------------
# e42: CDC APPLY — q37 diffs two snapshots into a change stream; this is
# the other direction: fold an (at-least-once, possibly replayed) change
# stream into the final snapshot. The stream is lineitem rows keyed by
# order: lsn = l_linenumber (monotone within key), op = D when
# l_returnflag = 'R' else U, payload = price cents (this synthetic
# lineitem repeats linenumbers within an order, so the commit order is
# the deterministic total order (lsn, op, cents) in both engines). The
# stream is
# deliberately UNIONED WITH ITSELF to model at-least-once delivery —
# apply must dedup (key, lsn) before picking the max-lsn change, so the
# replayed stream produces byte-identical state (the idempotence a real
# CDC consumer needs). Deleted keys are absent from the output. Plan:
# one distinct + one greatest-per-group window, both keyed on l_orderkey.
_CDC_ORACLE = """
    WITH raw AS (
        SELECT l_orderkey AS key, CAST(l_linenumber AS BIGINT) AS lsn,
               CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM lineitem
    ), stream AS (
        SELECT * FROM raw UNION ALL SELECT * FROM raw
    ), dedup AS (
        SELECT DISTINCT key, lsn, op, cents FROM stream
    ), ranked AS (
        SELECT key, lsn, op, cents,
               ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY lsn DESC, op DESC, cents DESC)
                   AS rn,
               COUNT(*) OVER (PARTITION BY key) AS n_changes
        FROM dedup
    )
    SELECT key AS l_orderkey, CAST(lsn AS BIGINT) AS last_lsn,
           cents AS final_cents,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""


@REGISTRY.add("e42_cdc_apply", _CDC_ORACLE, "events", "cdc", "merge")
def e42_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply an at-least-once CDC stream (self-unioned to model replay)
    to a snapshot: dedup (key, lsn), keep each key's max-lsn change,
    drop keys whose last op is a delete.

    r13 nanmoney swap: the payload cents use the loud
    ``money_cents_decimal`` helper at this site's exact DECIMAL(12,2)
    shape — Spark's silent NaN→NULL cast would erase a poisoned price
    from the CDC payload (and shift the deterministic (lsn, op, cents)
    commit order) while the oracle refuses loudly. Raises on the
    nanmoney corpus, byte-identical on clean ones
    (tests/test_nan_inputs.py)."""
    from ..functions.core import money_cents_decimal

    l = load(spark, sf_dir, "lineitem")
    raw = l.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").cast("bigint").alias("lsn"),
        F.when(F.col("l_returnflag") == "R", "D").otherwise("U").alias("op"),
        money_cents_decimal("l_extendedprice", dec="decimal(12,2)")
        .alias("cents"),
    )
    stream = raw.unionByName(raw)  # at-least-once replay
    dedup = stream.distinct()
    ranked = dedup.select(
        "key", "lsn", "op", "cents",
        F.row_number().over(
            W.partitionBy("key").orderBy(
                F.col("lsn").desc(), F.col("op").desc(), F.col("cents").desc()
            )
        ).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("key")).alias("n_changes"),
    )
    return ranked.where((F.col("rn") == 1) & (F.col("op") != "D")).select(
        F.col("key").alias("l_orderkey"),
        F.col("lsn").alias("last_lsn"),
        F.col("cents").alias("final_cents"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


# ---------------------------------------------------------------------------
# e43: CHURN LABELS — PIT-correct label generation, the other half of
# e35's feature rows: at snapshot T (the log midpoint, derived as exact
# integer µs in both engines), every user active at-or-before T gets
# label churned ⇔ zero events in (T, T + 30 d]. Features visible to the
# model (prior count, recency at T) come strictly from ≤ T; the label
# strictly from the horizon window — the temporal hygiene that makes
# the training set honest. One keyed aggregation over events with the
# scalar snapshot broadcast.
_CHURN_HORIZON_US = 30 * 24 * 3600 * 1_000_000
_CHURN_ORACLE = f"""
    WITH t AS (
        SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT)
            AS snap_us
        FROM events
    ), u AS (
        SELECT user_id, t.snap_us,
               SUM(CASE WHEN epoch_us(ts) <= t.snap_us THEN 1 ELSE 0 END)
                   AS n_before,
               MAX(CASE WHEN epoch_us(ts) <= t.snap_us
                        THEN epoch_us(ts) END) AS last_before_us,
               SUM(CASE WHEN epoch_us(ts) > t.snap_us
                         AND epoch_us(ts) <= t.snap_us + {_CHURN_HORIZON_US}
                        THEN 1 ELSE 0 END) AS n_in_horizon
        FROM events CROSS JOIN t
        GROUP BY user_id, t.snap_us
    )
    SELECT user_id,
           CAST(snap_us AS BIGINT) AS snap_us,
           CAST(n_before AS BIGINT) AS n_events_before,
           CAST(snap_us - last_before_us AS BIGINT) AS recency_us,
           CAST(n_in_horizon AS BIGINT) AS n_events_horizon,
           n_in_horizon = 0 AS churned
    FROM u WHERE n_before > 0
"""


@REGISTRY.add("e43_churn_labels", _CHURN_ORACLE, "events", "training",
              "labels")
def e43_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT-correct churn labels at the log-midpoint snapshot: features
    from ≤T only, the label from the (T, T+30d] horizon only."""
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events")
    t = ev.agg(
        F.expr(
            "CAST((min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) div 2 AS BIGINT)"
        ).alias("snap_us")
    )
    e = ev.select("user_id", epoch_us(F.col("ts")).alias("ts_us"))
    u = e.crossJoin(F.broadcast(t)).groupBy("user_id", "snap_us").agg(
        F.sum(F.when(F.col("ts_us") <= F.col("snap_us"), 1).otherwise(0))
        .alias("n_before"),
        F.max(F.when(F.col("ts_us") <= F.col("snap_us"), F.col("ts_us")))
        .alias("last_before_us"),
        F.sum(
            F.when(
                (F.col("ts_us") > F.col("snap_us"))
                & (F.col("ts_us") <= F.col("snap_us") + _CHURN_HORIZON_US),
                1,
            ).otherwise(0)
        ).alias("n_in_horizon"),
    )
    return u.where(F.col("n_before") > 0).select(
        "user_id",
        F.col("snap_us").cast("bigint").alias("snap_us"),
        F.col("n_before").cast("bigint").alias("n_events_before"),
        (F.col("snap_us") - F.col("last_before_us")).cast("bigint")
        .alias("recency_us"),
        F.col("n_in_horizon").cast("bigint").alias("n_events_horizon"),
        (F.col("n_in_horizon") == 0).alias("churned"),
    )
