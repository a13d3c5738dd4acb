"""Deterministic synthetic media table over ``documents``.

The test corpus has no binary media, so blobs are derived from document
text entirely JVM-side (md5 → unhex → repeat): deterministic, exactly
reproducible in SQL by the DuckDB oracle, and shaped like real ingested
media — an opaque ``payload BINARY`` plus typed, kind-dependent metadata
columns. At 100 TB the same schema holds real bytes; everything
downstream (pruning, mapInPandas batching) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]


def media_table(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, kind, payload, width, height, sample_rate,
    n_frames).

    payload = md5(text) bytes repeated ``1 + doc_id % 7`` times (16–112
    bytes); kind cycles image/audio/video by doc_id; metadata columns are
    NULL for kinds they don't apply to (sparse typed metadata, not a
    string map — filters on them prune without decoding).
    """
    d = F.col("doc_id")
    is_img = d % 3 == 0
    is_aud = d % 3 == 1
    is_vid = d % 3 == 2
    return documents.select(
        "doc_id",
        F.when(is_img, "image").when(is_aud, "audio").otherwise("video").alias("kind"),
        F.unhex(F.expr("repeat(md5(text), cast(1 + doc_id % 7 as int))")).alias("payload"),
        F.when(is_img, (8 + d % 24).cast("int")).alias("width"),
        F.when(is_img, (8 + (d * 7) % 24).cast("int")).alias("height"),
        F.when(is_aud, (8000 + (d % 5) * 2000).cast("int")).alias("sample_rate"),
        F.when(is_vid, (4 + d % 12).cast("int")).alias("n_frames"),
    )


# SQL fragments for the DuckDB oracle: decode byte ``i`` (1-based, 1..16)
# of md5(text) from its hex form — keeps the oracle independent of Spark's
# binary functions.
def hex_digit_sql(expr: str, pos: str) -> str:
    ch = f"substring({expr}, {pos}, 1)"
    return f"(ascii({ch}) - CASE WHEN {ch} <= '9' THEN 48 ELSE 87 END)"


def md5_byte_sql(text_expr: str, i: str) -> str:
    h = f"md5({text_expr})"
    return (
        f"(16 * {hex_digit_sql(h, f'2*({i})-1')} + {hex_digit_sql(h, f'2*({i})')})"
    )


# Unfiltered base: one row per document, payload-derived columns NULL when
# text is NULL (matching the Spark side, where payload = unhex(repeat(
# md5(text), r)) is NULL for NULL text). Used directly only by the pure
# metadata audits (m01 inventory, m05 packer, m15 integrity), which keep
# broken rows and must see the same NULLs the engine sees.
MEDIA_CTE_ALL = """
    SELECT doc_id, text,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(1 + doc_id % 7 AS BIGINT) AS r,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(16 * (1 + doc_id % 7) AS BIGINT) END AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN CAST(8 + doc_id % 24 AS INT) END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(8 + (doc_id * 7) % 24 AS INT) END AS height,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 5) * 2000 AS INT) END
               AS sample_rate,
           CASE WHEN doc_id % 3 = 2 THEN CAST(4 + doc_id % 12 AS INT) END AS n_frames
    FROM documents
"""

# r11 (r10 verdict task 2): the default fragment shares the media
# operators' drop-NULL-payload API contract (multimodal/ops.py filters
# NULL payloads before any codec/Arrow kernel), so every nested oracle
# stops emitting md5(NULL)-derived rows a poisoned corpus would create.
MEDIA_CTE = f"""
    SELECT * FROM ({MEDIA_CTE_ALL}) WHERE text IS NOT NULL
"""
