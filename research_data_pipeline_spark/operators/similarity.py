"""Vector similarity search over an embedding column (array<float>).

Everything stays in JVM expressions: the dot product is a left fold over
``zip_with`` in doubles — bit-identical to the DuckDB oracle's
``list_sum(list_transform(list_zip(...)))`` (verified), so thresholds and
rankings agree exactly across engines.

Scale path: brute force is the correctness baseline; sign-LSH bucketing
bounds the join fan-out (each vector only meets its bucket). For real
100 TB corpora you'd add an IVF variant with k-means centroids and probe
lists — the bucketed join shape below is the same, only the bucket
assignment changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn(out, F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All (i<j) pairs with cosine ≥ threshold — the embedding near-dup
    primitive. O(n²) pair enumeration: correctness baseline; swap the join
    condition for an LSH-bucket equality (``ann_topk_lsh``) at scale."""
    e = with_norm(df, vec_col).select(F.col(id_col), F.col("_v"), F.col("norm"))
    a = e.select(F.col(id_col).alias("i"), F.col("_v").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col(id_col).alias("j"), F.col("_v").alias("vb"), F.col("norm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("i", "j", "cosine")
    )


def ann_topk_bruteforce(df: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per vector by cosine (desc, id asc on ties)."""
    e = with_norm(df, vec_col).select(F.col(id_col), F.col("_v"), F.col("norm"))
    a = e.select(F.col(id_col).alias("query_id"), F.col("_v").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col(id_col).alias("neighbor_id"), F.col("_v").alias("vb"), F.col("norm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "cosine")
    )


def sign_lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket id: bit d = sign(vec[d]) ≥ 0.

    Deterministic and engine-portable (no RNG on executors). A production
    variant would use md5-derived pseudo-random hyperplanes — same bucket
    join shape.
    """
    v = _as_double(vec)
    bucket = None
    for d in range(n_planes):
        term = F.when(F.element_at(v, d + 1) >= 0, F.lit(1 << d)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("bigint")


def ann_topk_lsh(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same sign-LSH
    bucket, ranked by exact cosine. The bucket equality turns the O(n²)
    crossJoin into a hash join on the bucket key — the scale path."""
    e = with_norm(df, vec_col).select(
        F.col(id_col),
        F.col("_v"),
        F.col("norm"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    a = e.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("va"),
        F.col("norm").alias("na"), F.col("bucket"),
    )
    b = e.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        a.join(b, ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "bucket",
            F.col("rank").cast("bigint").alias("rank"), "cosine",
        )
    )
