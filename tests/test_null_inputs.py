"""NULL-payload robustness: rows with a NULL embedding / media payload /
value must be DROPPED by the feature operators (documented contract),
never crash an Arrow kernel with an inhomogeneous batch."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
NULLABLE = {
    "documents": ("text", "doc_id"),
    "embeddings": ("embedding", "vec_id"),
    "events": ("value", "event_id"),
    "orders": ("o_totalprice", "o_orderkey"),
}

SAMPLE = [
    "d09_embedding_near_dups", "d10_ann_topk", "d13_ann_ivf",
    "d26_semantic_dedup", "d36_pq_adc_topk", "d44_contrastive_pairs",
    "m02_media_decode_stats", "m08_png_roundtrip", "m10_thumbnail",
    "m11_audio_downsample", "e29_mad_outliers", "s14_poisson_bootstrap",
    # round-7 families: nulled doc text must not crash the sampled
    # calibration audits or DSIR; nulled embeddings must be dropped by
    # the ingest assigner; nulled event values must not break the
    # decimal-cents features
    "d55_sketch_calibration", "d56_dsir_importance",
    "d60_incremental_ann_ingest", "e35_pit_training_set",
    "e37_decayed_user_value", "s18_cuped_theta",
    # round-8 families: nulled embeddings must be dropped by the shared
    # assignment pass; nulled event values must not break exact cents;
    # nulled doc text must not crash shingling or the quality prior
    "d61_dup_ngram_coverage", "d62_source_quality_prior",
    "d63_ivf_balance_audit", "d64_embedding_outliers",
    "e41_multitouch_attribution", "m13_phash_pairs",
    "q44_guarded_hot_key_agg", "s20_srm_check", "d66_heldout_nll",
    "m14_scene_cuts", "s21_mann_whitney_u", "q45_order_reconciliation",
    # round-9 families: nulled media payloads must be filtered before
    # the codec kernels; nulled embeddings dropped before assignment;
    # nulled doc text must not crash gram hashing or span islands;
    # nulled event values must not break exact cents in CUSUM/ratio
    "q47_guarded_skew_join", "m16_keyframes",
    "m17_audio_fingerprint_pairs", "m18_cross_modal_pairs",
    "d69_eval_decontamination", "d70_span_dedup_weights",
    "s22_cusum_drift", "s23_delta_method_ratio",
    # round-10: the three queries whose Arrow kernels crashed on NULL
    # inputs under full-column execution (found by the poisoned-corpus
    # oracle sweep; fixed by API-boundary drops)
    "d11_ann_lsh", "d39_ann_multiprobe_lsh", "m04_byte_histogram",
]


@pytest.fixture(scope="module")
def nulled_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nulled_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t in NULLABLE:
            col, key = NULLABLE[t]
            df = df.withColumn(
                col,
                F.when(F.col(key) % 7 == 0, None).otherwise(F.col(col)),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", SAMPLE)
def test_query_survives_null_payloads(spark, nulled_dir, name):
    from research_data_pipeline_spark.registry import all_specs

    # noop sink, NOT count(): count() lets Catalyst prune columns, which
    # hid three Arrow-kernel crashes on NULL inputs (d11/d39/m04, round
    # 10) — the full plan must execute every output column
    all_specs()[name].fn(spark, nulled_dir).write.format("noop").mode(
        "overwrite"
    ).save()


POISONED_PARITY = [
    # round-10 advisor gap: no-crash is weaker than parity — the media
    # oracles used to emit rows for NULL-text docs (md5(NULL) bands,
    # NULL first_byte) that the operators' drop-NULL-payload contract
    # never produces. Run the FULL oracle compare on the nulled corpus.
    "m13_phash_pairs", "m14_scene_cuts", "m16_keyframes",
    "m17_audio_fingerprint_pairs",
    # d73's dense leg must drop NULL embeddings on BOTH engines (the
    # nulled corpus nulls vec 0 — the pinned query vector — so the
    # whole dense leg goes empty and fusion degenerates to lex-only,
    # identically on both sides)
    "d73_hybrid_rrf_fusion",
    # round-11 (r10 verdict task 2): the whole _E_CTE family — the
    # shared oracle fragment now filters NULL embeddings to match the
    # operators' _drop_null_vectors contract
    "d09_embedding_near_dups", "d10_ann_topk", "d11_ann_lsh",
    "d13_ann_ivf", "d13b_ivf_lloyd_recall", "d26_semantic_dedup",
    "d36_pq_adc_topk", "d39_ann_multiprobe_lsh", "d40_random_projection",
    "d44_contrastive_pairs", "d60_incremental_ann_ingest",
    "d63_ivf_balance_audit", "d64_embedding_outliers",
    # the MEDIA_CTE family (filtered default) and the three metadata
    # audits on MEDIA_CTE_ALL (NULL-aware n_bytes, kept rows)
    "m01_media_metadata", "m02_media_decode_stats", "m03_frame_sample",
    "m04_byte_histogram", "m05_shard_packing", "m06_media_exact_dedup",
    "m07_frame_dedup", "m15_media_integrity",
    # the round-11 per-query alignments (r10 verdict task 3)
    "d14_pack_context_windows", "d24_length_ntile", "d45_span_corruption",
    "d51_gopher_rules", "e24_record_high_counts", "s21_mann_whitney_u",
    "e31_incremental_moments",
]


@pytest.mark.parametrize("name", POISONED_PARITY)
def test_media_oracle_parity_on_null_text(spark, nulled_dir, name):
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nulled_dir), spec.oracle, nulled_dir, name)


def test_null_vectors_are_dropped_not_scored(spark, nulled_dir):
    # contract: a NULL embedding is absent from similarity output
    from research_data_pipeline_spark.operators.similarity import (
        ann_topk_bruteforce,
    )
    from research_data_pipeline_spark.tables import load

    e = load(spark, nulled_dir, "embeddings")
    out = ann_topk_bruteforce(e, "vec_id", "embedding", k=3)
    null_ids = {r[0] for r in e.where(F.col("embedding").isNull())
                .select("vec_id").collect()}
    got_ids = {r[0] for r in out.select("query_id").distinct().collect()}
    assert null_ids and not (null_ids & got_ids)
