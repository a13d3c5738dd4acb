"""Distributed Bloom filter: no false negatives, mergeable word table,
and the incremental-dedup prefilter returning identical results while
actually pruning store joins for definitely-novel batch rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_data_pipeline_spark.operators import bloom
from research_data_pipeline_spark.operators import incremental_dedup as inc


def _values(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_no_false_negatives_and_bounded_fpr(spark):
    stored = [f"key-{i}" for i in range(500)]
    filt = bloom.build(_values(spark, stored), "v", n_bits=1 << 14).localCheckpoint()

    probe_in = bloom.with_might_contain(
        _values(spark, stored), "v", filt, n_bits=1 << 14
    )
    assert probe_in.where(~F.col("might_contain")).count() == 0  # never FN

    absent = [f"other-{i}" for i in range(2000)]
    probe_out = bloom.with_might_contain(
        _values(spark, absent), "v", filt, n_bits=1 << 14
    )
    fp = probe_out.where(F.col("might_contain")).count()
    # 500 keys * 5 hashes in 16384 bits -> theoretical FPR ~0.4%; allow 5x
    assert fp < 0.02 * len(absent), f"FPR too high: {fp}/{len(absent)}"


def test_merge_after_append(spark, tmp_path):
    path = str(tmp_path / "bl")
    bloom.build(_values(spark, ["a", "b"]), "v", n_bits=1 << 12).write.mode(
        "overwrite"
    ).parquet(path)
    bloom.build(_values(spark, ["c"]), "v", n_bits=1 << 12).write.mode(
        "append"
    ).parquet(path)
    merged = bloom.merge(spark.read.parquet(path)).localCheckpoint()
    got = bloom.with_might_contain(
        _values(spark, ["a", "b", "c"]), "v", merged, n_bits=1 << 12
    )
    assert got.where(~F.col("might_contain")).count() == 0
    # one row per word after merge
    assert merged.groupBy("word").count().where(F.col("count") > 1).count() == 0


def test_bloom_prefilter_identical_results_and_prunes(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i}") for i in range(20)],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        # 0-4: exact copies of corpus docs; 5-24: novel rows the filter
        # should rule out without touching the store joins
        [(100 + i, f"alpha beta gamma delta token{i}") for i in range(5)]
        + [(200 + i, f"unrelated text number {i} with fresh words{i}") for i in range(20)],
        "doc_id bigint, text string",
    )
    store = str(tmp_path / "sigs")
    inc.write_signature_store(corpus, "doc_id", "text", store, with_bloom=True)

    plain = {
        r["doc_id"]: (r["dup_of_corpus"], r["matched_id"], r["match_kind"])
        for r in inc.dedup_against_store(spark, batch, store).collect()
    }
    pre = {
        r["doc_id"]: (r["dup_of_corpus"], r["matched_id"], r["match_kind"])
        for r in inc.dedup_against_store(spark, batch, store, use_bloom=True).collect()
    }
    assert plain == pre

    from research_data_pipeline_spark.operators.decisions import LAST

    stat = LAST["incremental_dedup_bloom"]
    assert stat["survivors"] < stat["n"], "prefilter pruned nothing"
    # every true duplicate must survive the filter (no false negatives)
    assert stat["survivors"] >= 5
