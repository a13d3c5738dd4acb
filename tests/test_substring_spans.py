"""d50 exact substring-span semantics on constructed corpora: maximal
runs, cross-doc-only sharing, 1-based inclusive positions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _spans(spark, docs):
    """Run the d50 pipeline on an in-memory documents frame."""
    import research_data_pipeline_spark.queries.docs as D

    d = spark.createDataFrame(docs, "doc_id bigint, text string")

    # reuse the registered query body by monkey-free substitution: the
    # query loads from parquet, so inline its algebra here via the same
    # constants to keep this test pinned to the shipped K
    from pyspark.sql import Window

    K = D._SPAN_K
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("t")).where(F.size("t") >= K)
    sh = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (K - 1)),
                lambda i: F.md5(F.array_join(F.slice("t", i, K), " ")),
            )
        ).alias("p0", "h"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    shared = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = sh.join(shared, "h", "left_semi").withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    out = marked.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + (K - 1)).cast("bigint").alias("span_end"),
        (F.max("pos") - F.min("pos") + K).cast("bigint").alias("span_len"),
    ).drop("grp")
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in out.collect()
    )


def test_cross_doc_span_is_maximal_and_positioned(spark):
    # 12 shared tokens inside different contexts -> one maximal span per
    # doc, exactly the shared region, 1-based inclusive
    shared = " ".join(f"s{i}" for i in range(12))
    docs = [
        (1, "a b " + shared + " c"),      # span tokens 3..14
        (2, shared + " x y z"),           # span tokens 1..12
        (3, "u v w " + " ".join(f"q{i}" for i in range(10))),  # no sharing
    ]
    assert _spans(spark, docs) == [
        (1, 3, 14, 12),
        (2, 1, 12, 12),
    ]


def test_within_doc_repetition_alone_does_not_mark(spark):
    # the same 8-token run twice in ONE doc: countDistinct(doc_id)=1 ->
    # not a cross-doc duplicate, no spans
    run = " ".join(f"r{i}" for i in range(8))
    assert _spans(spark, [(1, run + " mid " + run)]) == []


def test_two_disjoint_shared_regions_stay_separate_spans(spark):
    a = " ".join(f"a{i}" for i in range(9))
    b = " ".join(f"b{i}" for i in range(10))
    docs = [
        (1, a + " gapgap1 gapgap2 " + b),
        (2, a + " other filler tokens here " + b),
    ]
    got = _spans(spark, docs)
    # each doc: two maximal spans of 9 and 10 tokens
    lens = sorted((d, ln) for d, _, _, ln in got)
    assert lens == [(1, 9), (1, 10), (2, 9), (2, 10)]
