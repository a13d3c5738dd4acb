"""Chunk-level dedup (d22), n-gram decontamination (d23), and NTILE
bucketing (d24) building blocks, plus the strategy-decision log the
scale demo (scripts/scale_demo.py) relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_data_pipeline_spark.functions import text as T


def _chunks(spark, text: str, size: int = 20) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        T.token_chunks(F.col("text"), size).alias("c")
    ).first()["c"]


def test_token_chunks_exact_multiple(spark):
    out = _chunks(spark, "a b c d e f", size=3)
    assert out == ["a b c", "d e f"]


def test_token_chunks_ragged_tail(spark):
    out = _chunks(spark, "a b c d e f g", size=3)
    assert out == ["a b c", "d e f", "g"]


def test_token_chunks_short_doc_single_chunk(spark):
    assert _chunks(spark, "one two", size=20) == ["one two"]


def test_word_shingles_below_n_is_empty(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    out = df.select(T.word_shingles(F.col("text"), 13).alias("s")).first()["s"]
    assert out == []


def test_decision_log_records_guard_choice(spark):
    from research_data_pipeline_spark.operators import decisions
    from research_data_pipeline_spark.operators.similarity import cosine_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    cosine_pairs(df, "vec_id", "embedding", threshold=0.9)
    assert decisions.LAST["cosine_pairs"]["path"] == "broadcast"

    cosine_pairs(df, "vec_id", "embedding", threshold=0.9, max_broadcast=3)
    d = decisions.LAST["cosine_pairs"]
    assert d["path"] == "blocked" and d["n"] == 6 and d["max_broadcast"] == 3
