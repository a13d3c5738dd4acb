"""Empty-input robustness: a production job must survive an empty
partition / day-zero table, not crash. A representative query from
every family runs against schema-only copies of all ten tables and must
return an (empty or seeded) DataFrame, never raise."""

from __future__ import annotations

import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SAMPLE = [
    "q01_pricing_summary", "q04_top_order_per_customer",
    "q26_acctbal_quartiles", "q37_snapshot_diff", "q38_retention_purge",
    "d01_token_stats", "d04_fingerprint_dedup", "d08_ngram_jaccard",
    "d19_dedup_clusters", "d29_source_mixture", "d36_pq_adc_topk",
    "d38_bpe_encode", "d43_corpus_funnel",
    "e01_tumbling_counts", "e25_interval_overlap_counts",
    "e27_distribution_drift", "e28_activity_streaks", "e29_mad_outliers",
    "g01_label_counts", "g06_pagerank", "g12_hits_authorities",
    "s01_hash_sample", "s13_hll_registers", "s14_poisson_bootstrap",
    # round-7 families
    "d55_sketch_calibration", "d56_dsir_importance", "d58_leakage_free_split",
    "d59_minhash_calibration", "e34_scd2_intervals", "e37_decayed_user_value",
    "e38_streaming_scd2", "g14_link_prediction", "g15_degree_assortativity",
    "q43_join_skew_audit", "s17_weighted_quartiles", "s18_cuped_theta",
    # round-8 families
    "d61_dup_ngram_coverage", "d62_source_quality_prior",
    "d63_ivf_balance_audit", "d64_embedding_outliers",
    "e41_multitouch_attribution", "e42_cdc_apply",
    "g16_personalized_pagerank", "m13_phash_pairs",
    "q44_guarded_hot_key_agg", "s19_log_histogram_quantiles",
    "s20_srm_check", "d65_token_budget_allocation", "d66_heldout_nll",
    "d67_dedup_threshold_sweep", "m14_scene_cuts",
    "g17_harmonic_centrality", "s21_mann_whitney_u",
    "q45_order_reconciliation", "e43_churn_labels",
    "q46_referential_orphans", "m15_media_integrity",
    # round-9 families
    "q47_guarded_skew_join", "m16_keyframes",
    "m17_audio_fingerprint_pairs", "m18_cross_modal_pairs",
    "d68_incremental_clusters", "d69_eval_decontamination",
    "d70_span_dedup_weights", "d71_cluster_conductance",
    "s22_cusum_drift", "s23_delta_method_ratio",
    # round-10 families: empty corpora must flow through both RRF legs
    # and the SCC driver path (0-edge union-find/Tarjan on empty frames)
    "d73_hybrid_rrf_fusion", "g18_strongly_connected",
    # round-10 empty-parity probe: the queries whose driver-side matrix
    # folds / watermark builds crashed on empty input under full-column
    # execution (fixed with zero-row guards)
    "d09_embedding_near_dups", "d10_ann_topk", "d13_ann_ivf",
    "d13b_ivf_lloyd_recall", "d24_length_ntile",
    "e13_streaming_sessions", "e18_stream_stream_outer_join",
    "e23_watermark_dedup_replay",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_tables"))
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .write.parquet(f"{d}/{t}.parquet")
        )
    return d


@pytest.mark.parametrize("name", SAMPLE)
def test_query_survives_empty_tables(spark, empty_dir, name):
    from research_data_pipeline_spark.registry import all_specs

    # noop sink, NOT count(): count() lets Catalyst prune columns, which
    # hid five driver-side matrix folds + two streaming watermark builds
    # crashing on empty input (round-10 empty-parity probe)
    all_specs()[name].fn(spark, empty_dir).write.format("noop").mode(
        "overwrite"
    ).save()


def test_d24_small_corpus_matches_ntile(spark, tmp_path):
    """n < k is a legal curriculum (r10 advisor item 4): with 3 documents
    NTILE(10) gives buckets of size <= 1, i.e. bucket == row_number —
    the closed form's q=0 branch. Full oracle parity, not just no-crash."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    d = str(tmp_path / "small")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            df = df.limit(3)
        df.write.parquet(f"{d}/{t}.parquet")
    spec = all_specs()["d24_length_ntile"]
    assert_parity(spec.fn(spark, d), spec.oracle, d, "d24@n=3")
