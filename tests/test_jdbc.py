"""S7 JDBC round-trip against a real embedded database.

Spark ships Apache Derby on its classpath (for the Hive metastore), so
the idempotent sink is exercised end-to-end: create, replay the same
batch (no dupes), append an overlapping batch (only new keys land) —
the reference's INSERT ... ON CONFLICT DO NOTHING contract
(sql_queries.py:98-138)."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_data_pipeline_spark.io.sinks import write_jdbc_idempotent

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _read(spark, url, table):
    return spark.read.jdbc(url=url, table=table, properties=PROPS)


def test_jdbc_insert_dedupe_reinsert(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    batch1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b-dup"), (3, "c")], "id bigint, val string"
    )

    # first load: in-batch dup on id=2 collapses deterministically
    write_jdbc_idempotent(
        batch1, url, "t", keys=["id"], order_by=[F.col("val").asc()], properties=PROPS
    )
    got = {r["id"]: r["val"] for r in _read(spark, url, "t").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    # replay of the SAME batch: nothing inserted twice
    write_jdbc_idempotent(
        batch1, url, "t", keys=["id"], order_by=[F.col("val").asc()], properties=PROPS
    )
    assert _read(spark, url, "t").count() == 3

    # overlapping batch: only the new key lands; existing rows untouched
    batch2 = spark.createDataFrame(
        [(3, "c-conflict"), (4, "d")], "id bigint, val string"
    )
    write_jdbc_idempotent(
        batch2, url, "t", keys=["id"], order_by=[F.col("val").asc()], properties=PROPS
    )
    got = {r["id"]: r["val"] for r in _read(spark, url, "t").collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_jdbc_probe_failure_propagates(spark, tmp_path):
    """A transient probe failure (here: unreachable database) must RAISE,
    not silently skip the anti-join and append duplicates — the old bare
    ``except Exception: pass`` violated the ON-CONFLICT-DO-NOTHING
    contract on any non-'missing table' error."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "id bigint, val string")
    bad_url = f"jdbc:derby:{tmp_path}/nonexistent-db"  # no ;create=true
    with pytest.raises(Exception):
        write_jdbc_idempotent(
            df, bad_url, "t", keys=["id"], order_by=[F.col("val").asc()],
            properties=PROPS,
        )


def test_jdbc_table_exists_probe(spark, tmp_path):
    from research_data_pipeline_spark.io.sinks import _jdbc_table_exists

    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    df = spark.createDataFrame([(1, "a")], "id bigint, val string")
    assert not _jdbc_table_exists(spark, url, "probe_t", PROPS)
    write_jdbc_idempotent(
        df, url, "probe_t", keys=["id"], order_by=[F.col("val").asc()],
        properties=PROPS,
    )
    assert _jdbc_table_exists(spark, url, "probe_t", PROPS)
    # unquoted identifiers are case-folded by the engine; the probe must
    # find the table under any input spelling
    assert _jdbc_table_exists(spark, url, "PROBE_T", PROPS)


def test_jdbc_merge_concurrent_overlapping_writers(spark, tmp_path):
    """The MERGE upsert must keep ON-CONFLICT-DO-NOTHING semantics under
    CONCURRENCY: two writers with overlapping key sets run at once; the
    target must end with exactly one row per key and no lost rows —
    the anti-join sink cannot guarantee this (both writers snapshot the
    same existing keys), the serialized server-side MERGE can."""
    import threading

    from research_data_pipeline_spark.io.sinks import write_jdbc_merge

    url = f"jdbc:derby:{tmp_path}/mergedb;create=true"
    # create the target up-front so the writers only race the MERGE
    seed = spark.createDataFrame([(0, "seed")], "id bigint, val string")
    write_jdbc_merge(seed, url, "mt", keys=["id"], order_by=[F.col("val").asc()],
                     properties=PROPS)

    b1 = spark.createDataFrame(
        [(i, f"w1-{i}") for i in range(1, 60)], "id bigint, val string"
    )
    b2 = spark.createDataFrame(
        [(i, f"w2-{i}") for i in range(30, 90)], "id bigint, val string"
    )
    errs: list[Exception] = []

    def run(batch):
        try:
            write_jdbc_merge(batch, url, "mt", keys=["id"],
                             order_by=[F.col("val").asc()], properties=PROPS)
        except Exception as ex:  # surfaces in the main thread's assert
            errs.append(ex)

    t1 = threading.Thread(target=run, args=(b1,))
    t2 = threading.Thread(target=run, args=(b2,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    rows = _read(spark, url, "mt").collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicate keys after concurrent merge"
    assert set(ids) == set(range(0, 90)), "lost rows after concurrent merge"
    # overlapping keys kept exactly one writer's value
    vals = {r["id"]: r["val"] for r in rows}
    for i in range(30, 60):
        assert vals[i] in (f"w1-{i}", f"w2-{i}")


def test_jdbc_merge_replay_is_idempotent(spark, tmp_path):
    from research_data_pipeline_spark.io.sinks import write_jdbc_merge

    url = f"jdbc:derby:{tmp_path}/mergedb2;create=true"
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b-dup")], "id bigint, val string"
    )
    for _ in range(2):  # second run is a full replay
        write_jdbc_merge(batch, url, "mt2", keys=["id"],
                         order_by=[F.col("val").asc()], properties=PROPS)
    got = {r["id"]: r["val"] for r in _read(spark, url, "mt2").collect()}
    assert got == {1: "a", 2: "b"}


def test_streaming_upsert_exactly_once_effect(spark, tmp_path):
    """Streaming foreachBatch + transactional MERGE: draining the same
    source twice (fresh checkpoint = full replay, the worst-case
    at-least-once redelivery) leaves the target with exactly one row per
    event key, values identical to a single clean run."""
    from research_data_pipeline_spark.streaming.jobs import run_stream_upsert_to_jdbc

    url = f"jdbc:derby:{tmp_path}/sdb;create=true"
    events = "/root/testdata/sf0.001/events.parquet"
    expected = spark.read.parquet(events).count()

    run_stream_upsert_to_jdbc(spark, events, url, "stream_t", ["event_id"], PROPS)
    first = _read(spark, url, "stream_t").orderBy("event_id").collect()
    assert len(first) == expected

    # full replay (new checkpoint dir inside the job): nothing duplicates
    run_stream_upsert_to_jdbc(spark, events, url, "stream_t", ["event_id"], PROPS)
    second = _read(spark, url, "stream_t").orderBy("event_id").collect()
    assert second == first
