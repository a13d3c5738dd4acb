"""Incremental corpus-history dedup (d21): persisted signature store,
no-recompute resume, and batch-vs-store match semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from research_data_pipeline_spark.operators import incremental_dedup as inc


@pytest.fixture()
def corpus_batch(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "a completely different sentence about spark"),
        ],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            # exact dup of 1 (same token set, different order/repetition)
            (10, "quick brown fox jumps over the lazy dog the the"),
            # novel
            (11, "nothing in the corpus resembles this peculiar string"),
            # exact text copy of 2
            (12, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id bigint, text string",
    )
    return corpus, batch


def test_store_roundtrip_and_match(spark, corpus_batch, tmp_path):
    corpus, batch = corpus_batch
    store = str(tmp_path / "sigs")
    inc.write_signature_store(corpus, "doc_id", "text", store)
    out = {
        r["doc_id"]: (r["dup_of_corpus"], r["matched_id"], r["match_kind"])
        for r in inc.dedup_against_store(spark, batch, store).collect()
    }
    assert out[10] == (True, 1, "exact")  # fingerprint ignores order/repeats
    assert out[11] == (False, -1, "none")
    assert out[12] == (True, 2, "exact")


def test_resume_does_not_recompute_or_read_corpus_text(spark, corpus_batch, tmp_path):
    """The point of the store: resuming against it must not touch corpus
    text. Proven two ways: (1) the match plan's file scans reference ONLY
    the store path, and (2) the match still works after the corpus
    DataFrame's source is gone — there is nothing to recompute from."""
    corpus, batch = corpus_batch
    src = str(tmp_path / "corpus_src")
    store = str(tmp_path / "sigs")
    corpus.write.parquet(src)
    inc.write_signature_store(spark.read.parquet(src), "doc_id", "text", store)

    result = inc.dedup_against_store(spark, batch, store)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "sigs" in plan
    assert "corpus_src" not in plan, "match must not rescan corpus text"

    # delete the corpus source entirely: the store alone must suffice
    for root, _, files in os.walk(src, topdown=False):
        for f in files:
            os.remove(os.path.join(root, f))
    assert result.count() == 3


def test_append_leaves_old_signatures_untouched(spark, corpus_batch, tmp_path):
    """Daily ingest appends the new day's signatures; yesterday's parquet
    files must be byte-identical afterwards (never recomputed)."""
    corpus, batch = corpus_batch
    store = str(tmp_path / "sigs")
    inc.write_signature_store(corpus, "doc_id", "text", store)

    def snapshot():
        return {
            f: (os.path.getsize(os.path.join(store, f)),
                os.path.getmtime(os.path.join(store, f)))
            for f in os.listdir(store)
            if f.endswith(".parquet")
        }

    day1 = snapshot()
    inc.write_signature_store(batch, "doc_id", "text", store, mode="append")
    day2 = snapshot()
    assert set(day1) <= set(day2) and len(day2) > len(day1)
    for f, meta in day1.items():
        assert day2[f] == meta, f"day-1 signature file {f} was rewritten"
    # the appended store now matches batch docs exactly against themselves
    out = inc.dedup_against_store(spark, batch, store)
    assert out.where(~F.col("dup_of_corpus")).count() == 0


def test_signature_table_is_shuffle_free(spark, corpus_batch):
    """Building dedup state for a 100 TB corpus must be one map-only pass:
    the signature projection may not contain an exchange."""
    corpus, _ = corpus_batch
    plan = (
        inc.signature_table(corpus, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_agreement_threshold_matches_banding():
    """>= MIN_AGREE component agreement must imply a full-band collision,
    otherwise the banded probe could miss verified pairs."""
    rows_per_band = inc.N_HASHES // inc.BANDS
    max_disagree = inc.N_HASHES - inc.MIN_AGREE
    # worst case: every disagreement lands in a different band
    assert max_disagree < inc.BANDS, (
        "threshold too loose for band count: a qualifying pair could "
        "disagree in every band and never surface as a candidate"
    )
    assert rows_per_band * inc.BANDS == inc.N_HASHES


def test_cluster_merge_audit_flags_merges_on_stale_store(spark):
    """d68's core on a deliberately STALE store: doc 10 (new) matches
    stored docs 1 and 2, which the frozen store still holds as separate
    clusters — the audit must emit 'merges' with both matches counted
    and the min frozen canonical assigned. Doc 11 attaches to one
    cluster; doc 12 matches nothing and opens its own."""
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.operators.incremental_dedup import (
        cluster_merge_audit,
    )

    new_ids = spark.createDataFrame([(10,), (11,), (12,)], "doc_id long")
    matches = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 3)], "nd long, sd long"
    )
    frozen = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 3)], "doc_id long, fc long"
    )
    got = {
        r["doc_id"]: (
            r["n_matches"], r["n_stored_clusters"], r["canonical_id"],
            r["action"],
        )
        for r in cluster_merge_audit(new_ids, matches, frozen).collect()
    }
    assert got[10] == (2, 2, 1, "merges")
    assert got[11] == (1, 1, 3, "attached")
    assert got[12] == (0, 0, 12, "new_cluster")
