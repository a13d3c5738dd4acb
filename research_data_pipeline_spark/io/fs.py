"""Hadoop FileSystem helpers: path probes that work on ANY Spark-supported
filesystem (local, HDFS, S3A, ...), not just the driver's local disk.

``os.path`` only sees the local FS — a checkpoint probe or size estimate
done that way silently misbehaves the moment a pipeline runs against
``hdfs://`` or ``s3a://`` URIs. Routing through the JVM's
``org.apache.hadoop.fs.FileSystem`` keeps the semantics identical across
schemes (the reference keeps all state in Postgres so it never faces
this; see /root/reference/dags/scripts/final_tables.py:29-41 for its
local-CSV resume analog).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path didn't exist."""
    fs, p = _fs_and_path(spark, path)
    return bool(fs.delete(p, True))


def size_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (file or directory), 0 if absent."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small UTF-8 text file (sidecar/marker metadata) through
    the Hadoop FS API so it lands next to the data on ANY scheme."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small UTF-8 text file written by :func:`write_text`."""
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


def fingerprint(spark: SparkSession, path: str) -> str:
    """Cheap recursive dataset fingerprint: total bytes + newest file
    modification time under ``path`` ("absent" if it doesn't exist).
    Used by layout-store sidecars to detect a dataset regenerated IN
    PLACE (same path, new bytes), which the path-keyed artifact scheme
    alone cannot see — a stale bucketed store would otherwise serve old
    rows until someone remembers the refresh-by-delete contract."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return "absent"
    total = 0
    newest = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        total += int(st.getLen())
        newest = max(newest, int(st.getModificationTime()))
    return f"{total}:{newest}"
