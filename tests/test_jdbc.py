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
