"""Sinks (SURVEY S3, S7, S8, S10).

The reference loads Postgres with row-at-a-time INSERT ... ON CONFLICT DO
NOTHING (sql_queries.py:98-138, research_pipeline_dag.py:126-140). The
Spark-native equivalent is dedupe-before-write + bulk ``df.write`` —
idempotency moves from the database constraint to the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def _jdbc_table_exists(
    spark: SparkSession, url: str, table: str, properties: dict
) -> bool:
    """Explicit existence probe via JDBC ``DatabaseMetaData.getTables`` —
    so 'table missing' (expected on first load) is distinguishable from
    transient read failures (auth/network/driver), which must PROPAGATE:
    swallowing them would silently skip the anti-join and break the
    ON-CONFLICT-DO-NOTHING contract with duplicate inserts.

    Unquoted identifiers are case-folded differently per engine (Derby/
    Postgres fold opposite ways), so the probe tries exact, UPPER, and
    lower spellings; a ``schema.table`` name is split into the metadata
    schema pattern.
    """
    jvm = spark._jvm
    if properties.get("driver"):
        # make sure the driver is registered with java.sql.DriverManager
        jvm.java.lang.Class.forName(properties["driver"])
    props = jvm.java.util.Properties()
    for k, v in properties.items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        md = conn.getMetaData()
        schema, _, name = table.rpartition(".")
        schemas = {schema or None, (schema.upper() or None), (schema.lower() or None)}
        for s in schemas:
            for t in (name, name.upper(), name.lower()):
                rs = md.getTables(None, s, t, None)
                try:
                    if rs.next():
                        return True
                finally:
                    rs.close()
        return False
    finally:
        conn.close()


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_partitions_incremental(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic partition
    overwrite) — the incremental daily-load pattern. A static overwrite
    would wipe the whole dataset to land one day's data; dynamic mode
    replaces just the touched directories, so backfilling one partition
    of a 100 TB table rewrites gigabytes, not the table.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str, sep: str = ",") -> None:
    """CSV write for reference parity (S3; raw_to_tables.py:201-206)."""
    df.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)


def write_jdbc_idempotent(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    order_by: list[Column],
    mode: str = "append",
    properties: dict | None = None,
) -> None:
    """JDBC sink with ON-CONFLICT-DO-NOTHING parity (S7;
    sql_queries.py:98-138): deterministic dedup on the key set within the
    batch, plus — in append mode — a left-anti join against the keys
    already in the target table, so replaying a load inserts nothing
    twice. The write itself is vectorized batches per partition —
    replacing the reference's ~100k single-row INSERTs with |partitions|
    round-trip streams.

    The existing-keys probe reads only the key columns (projection pushed
    to the database). For huge targets, bound it with a predicate-
    partitioned read or push the dedup into a DB-side staging MERGE; for
    the reference's dimension/fact sizes one key scan is the right trade.
    """
    from ..operators.dedup_relational import deterministic_dedup

    deduped = deterministic_dedup(df, keys=keys, order_by=order_by)
    props = properties or {}
    if mode == "append" and _jdbc_table_exists(df.sparkSession, url, table, props):
        # table present: any failure reading existing keys now PROPAGATES —
        # proceeding without the anti-join would insert duplicates
        existing = df.sparkSession.read.jdbc(
            url=url, table=table, properties=props
        ).select(*keys)
        # materialize the probe NOW: .jdbc() below may lock the table
        existing = existing.localCheckpoint()
        deduped = deduped.join(existing, keys, "left_anti")
    deduped.write.jdbc(url=url, table=table, mode=mode, properties=props)


def write_jdbc_merge(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    order_by: list[Column],
    properties: dict | None = None,
) -> None:
    """True MERGE-semantics upsert (S7 under CONCURRENT writers; the
    reference's per-row INSERT ... ON CONFLICT DO NOTHING,
    sql_queries.py:98-138, made transactional and bulk).

    ``write_jdbc_idempotent`` is dedupe-before-write: correct for the
    reference's sequential loads but racy when two writers overlap (both
    anti-join against the same snapshot, both insert the same key). Here
    conflict resolution moves INTO the database, where it is atomic:

    1. deterministic in-batch dedup on the key set;
    2. distributed bulk write into a per-writer staging table — the
       cluster-scale transfer path (no driver-side row loop);
    3. ONE server-side ``MERGE INTO target USING staging ... WHEN NOT
       MATCHED THEN INSERT`` on a SERIALIZABLE autocommit-off
       connection. Two overlapping merges serialize on the target's
       locks; the loser re-evaluates NOT MATCHED against the winner's
       committed rows and skips them — no duplicates, no lost rows;
    4. drop the staging table (also on failure).

    First-ever load: the target is created empty (schema from ``df``)
    before the MERGE; if two writers race the CREATE, the loser's error
    is swallowed only when the table turns out to exist.
    """
    import uuid

    from ..operators.dedup_relational import deterministic_dedup

    props = properties or {}
    deduped = deterministic_dedup(df, keys=keys, order_by=order_by)
    spark = df.sparkSession
    staging = f"{table}_stg_{uuid.uuid4().hex[:12]}"
    if not _jdbc_table_exists(spark, url, table, props):
        try:
            deduped.limit(0).write.jdbc(url=url, table=table, mode="append", properties=props)
        except Exception:
            if not _jdbc_table_exists(spark, url, table, props):
                raise
    deduped.write.jdbc(url=url, table=staging, mode="overwrite", properties=props)

    jvm = spark._jvm
    if props.get("driver"):
        jvm.java.lang.Class.forName(props["driver"])
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, v)
    # Spark's JDBC writer CREATEs columns as quoted (case-sensitive)
    # identifiers, so the MERGE must quote them identically or the
    # unquoted reference case-folds to a different name
    def _q(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'

    cols = deduped.columns
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    col_list = ", ".join(_q(c) for c in cols)
    src_list = ", ".join(f"s.{_q(c)}" for c in cols)
    merge_sql = (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({src_list})"
    )
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        conn.setTransactionIsolation(
            jvm.java.sql.Connection.TRANSACTION_SERIALIZABLE
        )
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            st.executeUpdate(merge_sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
    finally:
        try:
            st2 = conn.createStatement()
            st2.executeUpdate(f"DROP TABLE {staging}")
            conn.commit()
            st2.close()
        except Exception:
            pass  # staging cleanup is best-effort; orphans are harmless
        conn.close()


def graph_sink(vertices: DataFrame, edges: DataFrame, base_path: str) -> None:
    """Graph sink (S8): the Neo4j MERGE batching loop
    (neo4j_queries.py:39-123) becomes two partitioned parquet datasets;
    MERGE idempotency = dropDuplicates on the id/key columns.

    For an actual Neo4j hand-off use
    ``io.neo4j_export.export_neo4j_admin`` — it emits the
    neo4j-admin bulk-import CSV layout (typed headers, id-uniqueness
    validation, ready import command) from the same vertex/edge
    DataFrames."""
    write_parquet(vertices.dropDuplicates(["id", "label"]), f"{base_path}/vertices")
    write_parquet(edges.dropDuplicates(), f"{base_path}/edges")
