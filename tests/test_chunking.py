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


def test_overlap_chunker_covers_every_token_with_exact_overlap(spark):
    """d35 invariants on crafted lengths around the window/stride
    boundaries: every token position is inside >=1 chunk, consecutive
    full chunks overlap by exactly W-S tokens, and no chunk is empty."""
    from research_data_pipeline_spark.queries.docs import (
        _CHUNK_S,
        _CHUNK_W,
        d35_overlap_chunks,
    )
    import tempfile

    lens = [1, 47, 48, 49, 63, 64, 65, 111, 112, 113, 200]
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)), "src")
        for i, n in enumerate(lens)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        ).write.parquet(f"{td}/documents.parquet")
        out = d35_overlap_chunks(spark, td).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(lens):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert chunks[0].start_tok == 1
        assert all(c.chunk_len >= 1 for c in chunks)
        # coverage: union of [start, start+len) spans 1..n contiguously
        covered_to = 0
        for c in chunks:
            assert c.start_tok <= covered_to + 1  # no gap
            covered_to = max(covered_to, c.start_tok + c.chunk_len - 1)
        assert covered_to == n, (i, n, covered_to)
        # overlap between consecutive chunks is exactly W - S when the
        # earlier chunk is full-width
        for a, b in zip(chunks, chunks[1:]):
            if a.chunk_len == _CHUNK_W:
                overlap = a.start_tok + a.chunk_len - b.start_tok
                assert overlap == _CHUNK_W - _CHUNK_S, (i, a, b)
        # chunk count matches the closed form
        expect = 1 + (max(n - _CHUNK_W, 0) + _CHUNK_S - 1) // _CHUNK_S
        assert len(chunks) == expect, (i, n, len(chunks), expect)
