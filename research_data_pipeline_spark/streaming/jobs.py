"""Structured Streaming forms of the engine's event-time operators.

The reference is yearly batch only (research_pipeline_dag.py:406-407);
streaming is the engine's extension surface (SURVEY §2.9). Batch and
streaming variants share the same aggregation logic so they provably
agree — e02 in queries/events.py checks the streaming result against the
same DuckDB oracle as the batch query.

Local tests drive file sources synchronously with
``processAllAvailable()``; on a cluster the same plans run against Kafka
with watermark-bounded state.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D = "decimal(12,4)"


def _ephemeral_dir(prefix: str) -> str:
    """Temp dir for a drain's EPHEMERAL streaming state — the checkpoint
    and staged-source dirs that ``_run_stream_to_batch`` removes in its
    ``finally``. Placed on tmpfs (/dev/shm) when available: the
    micro-batch machinery writes the offset WAL, commit log and
    state-store delta files once per batch, and those small-file
    round-trips are the measured per-batch floor (~120 ms/batch on ext4
    vs ~half that on tmpfs; e17 2.32 → 1.79 s, e23 2.88 → 2.22 s,
    best-of-2 at sf0.1). Semantics-free for the drain harness because
    the checkpoint is deleted on return by construction — a production
    streaming job must point checkpointLocation at durable storage
    instead, which is exactly the fault-tolerance contract this
    harness's drained-batch result does not need."""
    base = "/dev/shm"
    if not (os.path.isdir(base) and os.access(base, os.W_OK)):
        base = None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def tumbling_agg(df: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Shared batch/streaming tumbling aggregation (exact decimal sums)."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
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


def watermarked_tumbling_agg(df: DataFrame, window: str = "5 minutes", late: str = "10 minutes") -> DataFrame:
    """Streaming variant with bounded state: late rows beyond the
    watermark are dropped, windows finalize and leave state."""
    return tumbling_agg(df.withWatermark("ts", late), window)


def _stream_state_partitions(
    spark: SparkSession, events_path: str, commit_bound: bool = False
) -> int:
    """Streaming state-store partitioning is FIXED at query start from
    spark.sql.shuffle.partitions — AQE never touches it. Size it to the
    SOURCE, not the box, clamped to [2, session default] so a 100 TB
    landing dir keeps the session's full parallelism while a small
    backfill doesn't pay hundreds of near-empty state stores per
    micro-batch. Two operator classes want opposite sizing (r15 sweep at
    sf0.1, best-of-2 per point):

    - ``commit_bound=True`` — stream-stream joins, where every partition
      carries FOUR state stores (two sides × keyToNumValues/
      keyWithIndexToValue) re-committed every micro-batch including the
      no-data watermark batches: ~64 MB of input per partition. The
      sweep shows them DEGRADING with parallelism (e17: 2.0 s at 2
      parts → 5.5 s at 32) because per-partition commit overhead
      dominates their tiny per-row work.
    - default — aggregations, dedup, session windows and the
      Python-stateful operators, whose per-batch cost is per-row/per-key
      COMPUTE (for applyInPandasWithState, a per-key pandas walk inside
      one Python worker per partition): ~128 KB of input per partition,
      so the walk actually parallelizes (e08 2.18 → 1.16 s, e38 4.40 →
      3.35 s, e02 1.73 → 1.20 s) while the single-store commit stays
      negligible. At production source sizes both rules clamp to the
      session default, i.e. the cluster's configured shuffle
      parallelism decides."""
    from ..io import fs

    default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        nbytes = fs.size_bytes(spark, events_path)
    except Exception:
        return default
    per_part = (64 << 20) if commit_bound else (128 << 10)
    return max(2, min(default, -(-nbytes // per_part)))


def _run_stream_to_batch(spark: SparkSession, events_path: str, transform,
                         output_mode: str,
                         sentinel: DataFrame | list[DataFrame] | None = None,
                         reader_options: dict[str, str] | None = None,
                         commit_bound: bool = False,
                         size_from: str | None = None) -> DataFrame:
    """Run ``transform(stream_df)`` as a real streaming query over the
    parquet file and return the drained result as a batch DataFrame.

    ``sentinel`` rows (if given) are staged as later source files: their
    event time advances the watermark past every real session/window so
    append-mode state flushes deterministically on drain. Callers filter
    the sentinel keys back out. A LIST of DataFrames stages each as its
    own strictly-later file (modification-time order), so that with
    ``maxFilesPerTrigger=1`` each becomes its own micro-batch — the knob
    replay/eviction tests need, since stateful operators evict expired
    state at the END of the batch in which the watermark passed it.

    The staged-source and checkpoint temp dirs are removed on exit, and
    the memory-sink table is dropped once its rows are copied into a
    cached DataFrame — repeated runs must not accumulate /tmp dirs or
    session temp views.
    """
    from ..session import apply_runtime_confs
    from ..tables import normalize_nanos

    apply_runtime_confs(spark)
    schema = spark.read.parquet(events_path).schema
    # the streaming file source requires a directory; stage the single
    # parquet file into one (a real deployment points at a landing dir)
    src_dir = _ephemeral_dir("rdp_stream_src_")
    ckpt_dir = _ephemeral_dir("rdp_stream_ckpt_")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # absolutize: a relative source path would make the symlink
        # resolve relative to the TEMP dir and dangle (hit by the sf1/sf3
        # scale datasets, which live under the repo as relative paths)
        events_abs = os.path.abspath(events_path)
        if os.path.isdir(events_abs):
            # multi-file parquet dataset: stage each part flat into the
            # landing dir (the file stream source does not recurse)
            parts = sorted(
                f for f in os.listdir(events_abs) if f.endswith(".parquet")
            )
            for f in parts:
                os.symlink(os.path.join(events_abs, f),
                           os.path.join(src_dir, f))
        else:
            staged = os.path.join(src_dir, os.path.basename(events_abs))
            try:
                os.symlink(events_abs, staged)
            except OSError:
                shutil.copyfile(events_abs, staged)
        if sentinel is not None:
            sentinels = sentinel if isinstance(sentinel, list) else [sentinel]
            # the file source orders by modification time; stamp each
            # sentinel file strictly after EVERY staged input part (and
            # after the previous sentinel) so batch splitting via
            # maxFilesPerTrigger is deterministic even on the copyfile
            # fallback, where everything shares the current clock second
            seen = {
                os.path.join(src_dir, f)
                for f in os.listdir(src_dir)
                if f.endswith(".parquet")
            }
            staged_mtime = max(os.stat(p).st_mtime for p in seen)
            for i, s in enumerate(sentinels, start=1):
                s.write.mode("append").parquet(src_dir)
                t = staged_mtime + 60 * i
                for fn in os.listdir(src_dir):
                    p = os.path.join(src_dir, fn)
                    if p not in seen and fn.endswith(".parquet"):
                        os.utime(p, (t, t))
                        seen.add(p)
        reader = spark.readStream.schema(schema)
        for k, v in (reader_options or {}).items():
            reader = reader.option(k, v)
        stream = normalize_nanos(reader.parquet(src_dir))
        name = f"stream_{uuid.uuid4().hex[:8]}"
        # state partitions size from the full logical SOURCE: a caller
        # that pre-stages a slice of it (scd2's half1) passes the
        # original path via size_from so the per-key work still sees the
        # stream's true volume, not the staged fraction's
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(_stream_state_partitions(
                spark, size_from or events_path, commit_bound
            )),
        )
        q = (
            transform(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
            # materialize before stopping the query (memory sink is
            # session-scoped), then detach from the sink table so it can
            # be dropped
            out = spark.table(name).cache()
            out.count()
        finally:
            q.stop()
            spark.catalog.dropTempView(name)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def run_tumbling_stream_to_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Tumbling aggregation as a streaming query; complete output mode →
    the in-memory table holds every window once the source is exhausted,
    making the result comparable to the batch oracle.

    NaN values are excluded from the aggregate domain at the stream
    boundary (e01's batch contract, shared oracle — Spark's NaN->decimal
    cast is silent while DuckDB refuses); NULL rows stay: counted, the
    decimal sum skips them identically in both engines."""
    return _run_stream_to_batch(
        spark,
        events_path,
        lambda s: tumbling_agg(
            s.where(F.col("value").isNull() | ~F.isnan("value"))
        ),
        "complete",
    )


def run_dedup_stream_to_batch(spark: SparkSession, events_path: str,
                              keys: list[str]) -> DataFrame:
    """``dropDuplicates`` state over a stream, drained to batch. Append
    mode: each key's first arrival is emitted exactly once."""
    return _run_stream_to_batch(
        spark, events_path, lambda s: s.dropDuplicates(keys).select(*keys), "append"
    )


def streaming_dedup(df: DataFrame, keys: list[str], late: str = "10 minutes") -> DataFrame:
    """Stateful exact dedup on a stream: watermark bounds the dedup state
    (reference's ON CONFLICT DO NOTHING idempotency, streaming form)."""
    return df.withWatermark("ts", late).dropDuplicates(keys)


def run_watermark_dedup_replay(spark: SparkSession, events_path: str,
                               delay: str = "7 days") -> DataFrame:
    """``dropDuplicatesWithinWatermark`` with a real duplicate REPLAY —
    the state-BOUNDED production variant of ``run_dedup_stream_to_batch``
    (whose ``dropDuplicates`` state grows forever on an infinite stream).

    Three micro-batches (``maxFilesPerTrigger=1``): batch 1 is the
    events file (emits every key's first arrival; its max event time
    sets the next watermark to ``max_ts - delay``); batch 2 is a single
    advancer row — stateful operators evict expired state at the END of
    the batch in which the watermark has passed it, so this batch is
    what actually evicts (verified: a replay arriving in batch 2 still
    deduped against stale state); batch 3 replays a deterministic subset
    of keys (``event_id % 100 == 0``) at arrival time ``max_ts``. Keys whose
    first arrival was older than ``max_ts - 2·delay`` have had their
    dedup state EVICTED, so the replay is re-emitted (the at-least-once
    cost of bounding state); keys still inside the horizon dedup
    silently. The replay set excludes a ±1 day band around the eviction
    boundary so both engines agree without pinning Spark's <= vs <
    eviction comparison; each behavior is asserted non-empty in
    tests/test_streaming_semantics.py.

    Output: (event_id, n_emits) — n_emits is 2 for evicted-then-replayed
    keys, 1 otherwise. Returns a batch DataFrame after drain.
    """
    from ..session import apply_runtime_confs
    from ..tables import normalize_nanos

    apply_runtime_confs(spark)
    ev = normalize_nanos(spark.read.parquet(events_path))
    # one scalar to the driver (bounded): the fixture's max event time
    max_ts = ev.agg(F.max("ts")).first()[0]
    if max_ts is None:  # empty source: a NULL literal breaks the
        import datetime as dt  # interval arithmetic; any fixed epoch

        max_ts = dt.datetime(1970, 1, 1)  # matches zero rows
    replay = (
        ev.where(
            (F.col("event_id") % 100 == 0)
            & (
                (F.col("ts") < F.lit(max_ts) - F.expr("INTERVAL 15 DAYS"))
                | (F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 13 DAYS"))
            )
        )
        .withColumn("ts", F.lit(max_ts))
        .coalesce(1)
    )
    # the trigger must swallow the WHOLE input as batch 1: per-part
    # batches would advance the watermark mid-input and drop keys whose
    # first arrival lands in a later part as late data. So the trigger
    # size is the input's file count, and the advancer is padded to a
    # full batch of (mostly empty) part files.
    abs_path = os.path.abspath(events_path)
    n_input = (
        len([f for f in os.listdir(abs_path) if f.endswith(".parquet")])
        if os.path.isdir(abs_path)
        else 1
    )
    advancer = (
        ev.limit(1)
        .withColumn("event_id", F.lit(-1).cast("long"))
        .withColumn("ts", F.lit(max_ts))
        .repartition(n_input)
    )
    emitted = _run_stream_to_batch(
        spark,
        events_path,
        lambda s: s.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id"),
        "append",
        sentinel=[advancer, replay.repartition(n_input)],
        reader_options={"maxFilesPerTrigger": str(n_input)},
    )
    return (
        emitted.where(F.col("event_id") >= 0)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_emits"))
    )


def sliding_agg(df: DataFrame, window: str = "10 minutes", slide: str = "5 minutes",
                late: str = "10 minutes") -> DataFrame:
    """Sliding-window counts (streaming or batch input)."""
    src = df.withWatermark("ts", late) if df.isStreaming else df
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type",
            "n_events",
        )
    )


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful per-user aggregation via ``applyInPandasWithState``
    — the arbitrary-state operator (running event count + max value kept
    in GroupState across micro-batches, update-mode emission).

    Built-in windowed aggs cover sums/counts; this is the surface for
    logic they can't express (per-entity model state, CEP-ish rules).
    State is partitioned by user — scales with the state store, bounded
    by a TTL/timeout in production.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    # NULL and NaN values are excluded from the stateful domain before
    # the walk (e24's neither-sets-nor-breaks contract, r12): Arrow hands
    # the pandas worker BOTH as NaN, so a single malformed event would
    # make ``max(-inf, nan)`` poison the running max for its user forever
    # while the DuckDB oracle's MAX ranks NaN greatest — neither engine's
    # convention is the monitored quantity. Users with only excluded
    # values are absent, same as the oracle's filtered frame.
    return (
        stream.select("user_id", "value")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def run_stateful_stats_to_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Drain the stateful operator over the file source. The single-file
    source forms one micro-batch, so the update-mode emission equals the
    final per-user aggregate (oracle-checkable)."""
    return _run_stream_to_batch(spark, events_path, stateful_user_stats, "update")


def _tws_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` talks to a state server
    over protobuf; without a working ``google.protobuf`` the streaming
    runner crashes at query start. Probe once so the operator can choose
    the API up front instead of dying mid-stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def record_break_stats(stream: DataFrame) -> DataFrame:
    """Per-user record-breaking-event tracker — the canonical
    high-water-mark monitor (fraud ceilings, leaderboard breaks, SLA
    worst-cases). State is two scalars per user (running max, record
    count).

    Uses Spark 4's ``transformWithStateInPandas`` (typed ValueState,
    TTL/timers available) when its protobuf dependency is present;
    otherwise the same semantics on ``applyInPandasWithState`` (e08's
    surface, no extra dependency) — both walked in (ts, event_id) order
    within the key's batch slice, so the record count is the event-time
    answer for the drained single-batch harness.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType([
        StructField("cur_max", DoubleType()),
        StructField("n_records", LongType()),
    ])
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_records", LongType()),
        StructField("max_value", DoubleType()),
    ])

    def _walk(batch, cur_max, n_records):
        for v in batch.sort_values(["ts", "event_id"])["value"]:
            v = float(v)
            if cur_max is None or v > cur_max:
                cur_max = v
                n_records += 1
        return cur_max, n_records

    # A NULL or NaN value can neither set nor break a record (r11
    # alignment — without the filter, the first NULL/NaN arrived as NaN,
    # became cur_max, and every later `v > nan` comparison was False:
    # one malformed event froze the monitor for its user forever). Users
    # with only NULL/NaN values are absent, same as the oracle's frame.
    src = stream.select("user_id", "ts", "event_id", "value").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )

    if _tws_available():  # pragma: no cover - needs protobuf
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class RecordBreaks(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getValueState("hwm", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                import pandas as pd

                cur_max, n_records = (
                    self._state.get() if self._state.exists() else (None, 0)
                )
                cur_max, n_records = _walk(
                    pd.concat(list(rows)), cur_max, n_records
                )
                self._state.update((cur_max, n_records))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_records": [n_records],
                     "max_value": [cur_max]}
                )

            def close(self) -> None:
                pass

        return src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RecordBreaks(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        cur_max, n_records = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            cur_max, n_records = _walk(pdf, cur_max, n_records)
        state.update((cur_max, n_records))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_records": [n_records],
             "max_value": [cur_max]}
        )

    return src.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def run_record_breaks_to_batch(
    spark: SparkSession, events_path: str,
    user_sample_ppm: int | None = None,
) -> DataFrame:
    """Drain the transformWithState operator over the file source; the
    single-batch source makes the update-mode emission the exact
    per-user event-time answer.

    ``user_sample_ppm`` applies the e38 discipline (r11 scale grid:
    full-population e24 measured 3.4 s → 25.1 s at 10× rows — the
    Python stateful API pays a per-key call, wall time linear in
    ENTITIES): a deterministic md5 user bucket caps the registered
    artifact's key volume while the full-population operator stays
    exercised in tests/test_streaming_semantics.py. Production-scale
    full-population monitors belong on the JVM state backends."""

    def transform(s: DataFrame) -> DataFrame:
        if user_sample_ppm is not None:
            bucket = F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint")
            s = s.where(bucket % 1000000 < user_sample_ppm)
        return record_break_stats(s)

    return _run_stream_to_batch(spark, events_path, transform, "update")


SESSION_GAP_US = 30 * 60 * 1_000_000


def session_agg(df: DataFrame) -> DataFrame:
    """Native session windows (30-min gap): state merges adjacent events
    per user; a session closes when the watermark passes last_ts + gap.
    ``w.end`` is defined as last event time + gap, so the in-session
    duration is ``end - gap - start`` — no second scan for max(ts)."""
    return (
        df.withWatermark("ts", "0 seconds")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            ((F.unix_micros("w.end") - SESSION_GAP_US - F.unix_micros("w.start"))
             / 1_000_000.0).alias("duration_s"),
        )
    )


def _sentinel_row(spark: SparkSession, events_path: str, margin_s: int) -> DataFrame:
    """One schema-identical row with user_id = -1 and event time
    ``margin_s`` past the corpus max — staged after the real file so the
    0-second watermark sweeps past every real session's end and append
    mode flushes all state on drain."""
    from pyspark.sql.types import LongType

    raw = spark.read.parquet(events_path)
    mx = raw.agg(F.max("ts")).collect()[0][0]
    if mx is None:  # empty source: nothing buffered, no flush needed
        return raw.limit(0)
    if isinstance(raw.schema["ts"].dataType, LongType):  # nanos-as-long file
        ts_lit = F.lit(int(mx) + margin_s * 1_000_000_000).cast("bigint")
    else:
        import datetime as dt

        # cast to the file's own ts type (TIMESTAMP vs TIMESTAMP_NTZ) so the
        # staged sentinel parquet matches the readStream schema exactly
        ts_lit = F.lit(mx + dt.timedelta(seconds=margin_s)).cast(
            raw.schema["ts"].dataType
        )
    return raw.limit(1).withColumn("ts", ts_lit).withColumn(
        "user_id", F.lit(-1).cast(raw.schema["user_id"].dataType)
    )


def run_session_stream_to_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Session-window aggregation as a real append-mode streaming query.

    Append mode only emits sessions the watermark has closed — without
    help, each user's LAST session would stay in state forever on a
    drained source. The sentinel row advances event time past every
    session end, flushing them; its own (user_id = -1) session is
    filtered back out.
    """
    out = _run_stream_to_batch(
        spark,
        events_path,
        session_agg,
        "append",
        sentinel=_sentinel_row(spark, events_path, margin_s=2 * 3600),
    )
    return out.where(F.col("user_id") >= 0)


def run_stream_static_join_to_batch(
    spark: SparkSession, events_path: str, dim: DataFrame
) -> DataFrame:
    """Stream-static enrichment join + aggregation: each micro-batch
    hash-joins against the (broadcast) static dimension — the streaming
    form of the reference's augmentation joins. Complete output mode so
    the drained totals equal the batch result."""

    def transform(s: DataFrame) -> DataFrame:
        # NaN excluded from the maintained-aggregate domain at the stream
        # boundary (e01/e02 contract, mirrored in e14's oracle WHERE);
        # NULL rows stay — counted, skipped by the decimal sum
        s = s.where(F.col("value").isNull() | ~F.isnan("value"))
        return (
            s.join(F.broadcast(dim), s["user_id"] == dim["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
            )
        )

    return _run_stream_to_batch(spark, events_path, transform, "complete")


ATTRIBUTION_WINDOW = "2 hours"


def click_purchase_attribution(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Click→purchase attribution join: every purchase matched to every
    click by the same user in the preceding ``ATTRIBUTION_WINDOW``.

    Shared by the batch oracle form and the stream-stream form — the join
    condition (equi user key + event-time range) is exactly what
    Structured Streaming requires to bound join state: each side's
    watermark plus the range predicate lets the store evict clicks older
    than the window, so state is O(users × window), not O(stream).

    Inputs must carry (event_id, user_id, ts) with disambiguated names
    (click_id/click_ts, purchase_id/purchase_ts) — renaming is the
    caller's job because stream watermarks attach to the renamed column.
    """
    cond = (
        (clicks["c_user"] == purchases["p_user"])
        & (purchases["purchase_ts"] > clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return clicks.join(purchases, cond).select(
        F.col("click_id"),
        F.col("purchase_id"),
        F.col("c_user").alias("user_id"),
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def _attribution_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def run_stream_stream_join_to_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Stream-STREAM inner join drained to batch: clicks and purchases
    are two watermarked streams derived from the same source; the range
    condition bounds both state stores (clicks evict after the
    attribution window + watermark delay, purchases immediately after
    their watermark). Append mode — inner-join matches emit as soon as
    both rows have arrived; the drained result equals the batch join."""

    def transform(s: DataFrame) -> DataFrame:
        clicks, purchases = _attribution_sides(s)
        return click_purchase_attribution(
            clicks.withWatermark("click_ts", "1 minute"),
            purchases.withWatermark("purchase_ts", "1 minute"),
        )

    return _run_stream_to_batch(
        spark, events_path, transform, "append", commit_bound=True
    )


def run_stream_to_partitioned_parquet(
    spark: SparkSession, events_path: str, dest: str
) -> None:
    """Drain the event stream into date-partitioned parquet via
    ``foreachBatch`` + dynamic partition overwrite: a replayed micro-batch
    rewrites exactly the partitions it already wrote (idempotent retry),
    and downstream readers prune on the date directory — the
    streaming-to-lake landing pattern.
    """
    from ..io.sinks import write_partitions_incremental
    from ..session import apply_runtime_confs
    from ..tables import normalize_nanos

    apply_runtime_confs(spark)
    schema = spark.read.parquet(events_path).schema
    src_dir = _ephemeral_dir("rdp_stream_src_")
    ckpt_dir = _ephemeral_dir("rdp_stream_ckpt_")
    try:
        staged = os.path.join(src_dir, os.path.basename(events_path))
        try:
            os.symlink(events_path, staged)
        except OSError:
            shutil.copyfile(events_path, staged)
        stream = normalize_nanos(spark.readStream.schema(schema).parquet(src_dir))

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            write_partitions_incremental(
                batch_df.withColumn("event_date", F.to_date("ts")), dest, ["event_date"]
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def run_stream_upsert_to_jdbc(
    spark: SparkSession,
    events_path: str,
    url: str,
    table: str,
    keys: list[str],
    properties: dict | None = None,
) -> None:
    """Streaming upsert into a JDBC target with exactly-once EFFECT.

    Structured Streaming's file source + checkpoint gives at-least-once
    delivery to ``foreachBatch``; composing it with the transactional
    MERGE sink (io/sinks.write_jdbc_merge) upgrades the EFFECT to
    exactly-once: a replayed micro-batch re-MERGEs the same keys and the
    database's WHEN NOT MATCHED arm skips every row the first attempt
    committed. No batch-id bookkeeping table is needed — idempotence
    lives in the key semantics, which also covers the harder failure
    (a retry AND new data in the same replayed batch).

    The streaming-side contract: every row carries a stable unique key
    (here the event id), the one requirement for MERGE-based
    exactly-once. This is the lake/warehouse landing pattern for
    streams whose sink lacks native transactional batch ids.
    """
    from ..io.sinks import write_jdbc_merge
    from ..session import apply_runtime_confs
    from ..tables import normalize_nanos

    apply_runtime_confs(spark)
    schema = spark.read.parquet(events_path).schema
    src_dir = _ephemeral_dir("rdp_stream_src_")
    ckpt_dir = _ephemeral_dir("rdp_stream_ckpt_")
    try:
        staged = os.path.join(src_dir, os.path.basename(events_path))
        try:
            os.symlink(events_path, staged)
        except OSError:
            shutil.copyfile(events_path, staged)
        stream = normalize_nanos(
            spark.readStream.schema(schema).parquet(src_dir)
        ).select("event_id", "user_id", "event_type", "value")

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            write_jdbc_merge(
                batch_df,
                url,
                table,
                keys=keys,
                order_by=[F.col(c).asc() for c in batch_df.columns if c not in keys],
                properties=properties,
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def click_purchase_attribution_outer(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """LEFT OUTER form of ``click_purchase_attribution``: clicks with no
    purchase in the window emit one row with sentinel -1 ids (NULL-free
    for the external comparator). In streaming, the unmatched row is
    emitted only when the watermark proves no future purchase can match —
    the state-timeout semantics that distinguish outer from inner."""
    cond = (
        (clicks["c_user"] == purchases["p_user"])
        & (purchases["purchase_ts"] > clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return clicks.join(purchases, cond, "leftOuter").select(
        F.col("click_id"),
        F.coalesce(F.col("purchase_id"), F.lit(-1)).cast("bigint").alias("purchase_id"),
        F.col("c_user").alias("user_id"),
        F.coalesce(
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts"), F.lit(-1)
        ).cast("bigint").alias("lag_us"),
    )


def run_stream_stream_outer_join_to_batch(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Stream-STREAM left-outer join drained to batch. Outer rows only
    materialize when the GLOBAL watermark (min across both sides) passes
    a click's window end, so the drain stages one sentinel click AND one
    sentinel purchase (user_id = -1, event time past corpus max + window)
    — each advances its own side's watermark, closing every real click's
    state; the sentinels' own rows are filtered back out."""

    def transform(s: DataFrame) -> DataFrame:
        clicks, purchases = _attribution_sides(s)
        return click_purchase_attribution_outer(
            clicks.withWatermark("click_ts", "1 minute"),
            purchases.withWatermark("purchase_ts", "1 minute"),
        )

    base = _sentinel_row(spark, events_path, margin_s=3 * 3600)
    sent = base.withColumn("event_type", F.lit("click")).unionByName(
        base.withColumn("event_type", F.lit("purchase"))
    )
    out = _run_stream_to_batch(
        spark, events_path, transform, "append", sentinel=sent,
        commit_bound=True,
    )
    return out.where(F.col("user_id") >= 0)


# the applied-batch marker lives INSIDE the atomically-swapped state dir
# (leading underscore = invisible to the parquet reader, like _SUCCESS):
# state rows and marker commit in ONE rename, so no crash point exists
# where state is updated but the batch id unrecorded (a separate meta.json
# written after the swap had exactly that window — a foreachBatch replay
# of the batch would then fold it into state a second time).
_STATE_MARKER = "_applied_batch.json"


def _fold_state_batch(state_dir: str, part: DataFrame, batch_id: int) -> bool:
    """Fold one micro-batch's partial aggregate ``part`` (user_id, cnt,
    sum_dec, mn, mx) into the persisted state table, tmp-then-swap, with
    replay idempotence: returns False (no-op) when ``batch_id`` was
    already committed — the marker rides inside the swapped directory,
    so the skip decision and the state content can never disagree."""
    import json

    from pyspark.sql import functions as F

    D = "decimal(12,4)"
    marker_path = os.path.join(state_dir, _STATE_MARKER)
    applied = -1
    if os.path.exists(marker_path):
        applied = json.load(open(marker_path))["last_batch_id"]
    if batch_id <= applied:
        return False  # replay: already folded into state, skip
    if os.path.exists(state_dir):
        state = part.sparkSession.read.parquet(state_dir)
        merged = (
            state.unionByName(part)
            .groupBy("user_id")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.sum("sum_dec").cast(D).alias("sum_dec"),
                F.min("mn").alias("mn"),
                F.max("mx").alias("mx"),
            )
        )
    else:
        merged = part
    tmp = state_dir + f"__tmp{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    # marker written into tmp BEFORE the swap: the rename below commits
    # state rows and applied-batch id atomically
    json.dump(
        {"last_batch_id": batch_id}, open(os.path.join(tmp, _STATE_MARKER), "w")
    )
    if os.path.exists(state_dir):
        old = state_dir + f"__old{batch_id}"
        os.rename(state_dir, old)
        os.rename(tmp, state_dir)
        shutil.rmtree(old)
    else:
        os.rename(tmp, state_dir)
    return True


def run_stream_agg_merge_to_batch(
    spark: SparkSession, events_path: str, n_source_files: int = 3
) -> DataFrame:
    """Streaming MATERIALIZED VIEW: maintain per-user (count, sum, min,
    max) in a parquet state table, merged algebraically by
    ``foreachBatch`` micro-batch — the streaming twin of the batch
    incremental-agg query (e26), and the continuous form of a 100 TB
    daily ingest's rollup maintenance.

    Mechanics: the source is staged as ``n_source_files`` parquet files
    with ``maxFilesPerTrigger=1`` under an available-now trigger, so the
    stream really processes multiple micro-batches. Each batch computes
    its partial state (batch-sized agg) and merges it with the persisted
    state (state-sized union + re-agg — base facts are never re-read),
    writing tmp-then-swap so a crash never leaves half a state table.
    Idempotence: the state directory carries the last applied batch id;
    a replayed batch (foreachBatch is at-least-once under retries) is
    skipped instead of double-counted. Decimal(12,4) sums keep the
    merge bit-exact; the drained result equals the one-shot batch
    aggregation, which is exactly what the oracle computes.
    """
    from pyspark.sql import functions as F

    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    src_dir = _ephemeral_dir("rdp_mv_src_")
    ckpt_dir = _ephemeral_dir("rdp_mv_ckpt_")
    state_root = tempfile.mkdtemp(prefix="rdp_mv_state_")
    state_dir = os.path.join(state_root, "state")
    D = "decimal(12,4)"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # size the per-batch partial aggregations and state re-agg to the
        # SOURCE like every other drain (this runner is stateless at the
        # engine level — foreachBatch — so the conf only shapes its batch
        # shuffles; AQE is off inside streaming batches, so without this
        # a 3-batch drain of a tiny backfill pays session-default-many
        # near-empty shuffle partitions and state files per batch)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(_stream_state_partitions(spark, events_path)),
        )
        (
            spark.read.parquet(os.path.abspath(events_path))
            .select("user_id", "value")
            # NaN excluded from the maintained-aggregate domain at the
            # staging boundary (r11 NaN-sweep contract, mirrors e26's
            # batch domain and the shared oracle's WHERE); NULLs stay —
            # counted, skipped by sum, and MIN/MAX NaN conventions never
            # engage.
            .where(F.col("value").isNull() | ~F.isnan("value"))
            .repartition(n_source_files)
            .write.mode("overwrite")
            .parquet(src_dir)
        )
        schema = spark.read.parquet(src_dir).schema

        def partial(df: DataFrame) -> DataFrame:
            return df.groupBy("user_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum(F.col("value").cast(D)).cast(D).alias("sum_dec"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )

        def merge(batch: DataFrame, batch_id: int) -> None:
            _fold_state_batch(state_dir, partial(batch), batch_id)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(state_dir)
            .select(
                "user_id",
                F.col("cnt").alias("n_events"),
                F.col("sum_dec").cast("double").alias("total_value"),
                F.col("mn").alias("min_value"),
                F.col("mx").alias("max_value"),
            )
            .localCheckpoint()
        )
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        for d in (src_dir, ckpt_dir, state_root):
            shutil.rmtree(d, ignore_errors=True)


def scd2_stateful(stream: DataFrame) -> DataFrame:
    """Streaming SCD TYPE-2 maintenance via ``applyInPandasWithState`` —
    the CDC-history twin of the batch gaps-and-islands build
    (queries/events.e34): per-user state is the OPEN version (current
    event type, version number, valid_from, event count); a change event
    closes it (emitting the completed interval exactly once) and opens
    the next; a ``__flush__`` sentinel emits the open version with a
    NULL ``valid_to_us``. State is four scalars per user — bounded by
    the entity population, not the event volume — and versions opened in
    one micro-batch close correctly in a later one (asserted by the
    two-real-batch drain in ``run_scd2_stream_to_batch``).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("version", LongType()),
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
        StructField("is_current", BooleanType()),
        StructField("n_events", LongType()),
    ])
    state_schema = StructType([
        StructField("cur_type", StringType()),
        StructField("version", LongType()),
        StructField("valid_from", LongType()),
        StructField("n", LongType()),
    ])

    def update(key, pdfs, st: GroupState):
        import pandas as pd

        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
        cur_type, version, valid_from, n = (
            st.get if st.exists else (None, 0, 0, 0)
        )
        out = []
        for ts_us, event_id, etype in zip(
            rows["ts_us"], rows["event_id"], rows["event_type"]
        ):
            if etype == "__flush__":
                if cur_type is not None:
                    out.append((key[0], version, cur_type, valid_from,
                                None, True, n))
                continue
            if cur_type is None:
                cur_type, version, valid_from, n = etype, 1, int(ts_us), 1
            elif etype == cur_type:
                n += 1
            else:
                out.append((key[0], version, cur_type, valid_from,
                            int(ts_us), False, n))
                cur_type, version, valid_from, n = (
                    etype, version + 1, int(ts_us), 1
                )
        st.update((cur_type, version, valid_from, n))
        yield pd.DataFrame(
            out,
            columns=["user_id", "version", "state", "valid_from_us",
                     "valid_to_us", "is_current", "n_events"],
        )

    return (
        stream.select(
            "user_id", "event_id", "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_scd2_stream_to_batch(spark: SparkSession, events_path: str,
                             user_sample_ppm: int | None = None) -> DataFrame:
    """Drain the streaming SCD2 operator over THREE micro-batches: the
    event log split at its time midpoint (two real batches, so open
    versions must survive the batch boundary and close against state,
    not batch-local data) plus a per-user ``__flush__`` sentinel batch
    that emits every still-open version. The drained update-mode output
    is the complete interval table — byte-comparable to the batch
    gaps-and-islands oracle."""
    from ..session import apply_runtime_confs
    from ..tables import epoch_us, normalize_nanos

    apply_runtime_confs(spark)
    ev = normalize_nanos(spark.read.parquet(events_path)).select(
        "event_id", "ts", "user_id", "event_type"
    )
    if user_sample_ppm is not None:
        # deterministic entity sample (portable md5 bucket): the Python
        # stateful API pays a per-key-per-batch call (~0.3 ms), so wall
        # time is linear in ENTITIES — a sampled drain audits the same
        # state machine at a fifth of the call volume. Production-scale
        # full-population SCD2 belongs on the JVM state backends
        # (transformWithState / Scala mapGroupsWithState); this operator
        # is the semantics reference.
        bucket = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        ev = ev.where(bucket % 1000000 < user_sample_ppm)
    us = epoch_us(F.col("ts"))
    mn, mx = ev.agg(F.min(us), F.max(us)).first()
    if mn is None:
        # day-zero: no events, no intervals — return the output shape
        # (LocalRelation via tables.local_df, not a Python-RDD plan)
        from ..tables import local_df

        return local_df(
            spark,
            [],
            "user_id long, version long, state string, valid_from_us long,"
            " valid_to_us long, is_current boolean, n_events long",
        )
    mid = (mn + mx) // 2
    half1 = ev.where(us < F.lit(mid)).coalesce(1)
    half2 = ev.where(us >= F.lit(mid)).coalesce(1)
    flush = (
        ev.select("user_id").distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.timestamp_micros(F.lit(mx + 86_400_000_000)).alias("ts"),
            F.col("user_id"),
            F.lit("__flush__").alias("event_type"),
        )
        .coalesce(1)
    )
    stage = _ephemeral_dir("rdp_scd2_half1_")
    try:
        half1_path = os.path.join(stage, "half1")
        half1.write.parquet(half1_path)
        return _run_stream_to_batch(
            spark,
            half1_path,
            scd2_stateful,
            "update",
            sentinel=[half2, flush],
            reader_options={"maxFilesPerTrigger": "1"},
            size_from=events_path,
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
