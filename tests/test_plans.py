"""Physical-plan assertions: the scale claims (pushdown, pruning,
broadcast, codegen) hold in the plans Catalyst actually produces —
regressions here mean a 100 TB scan reads columns or rows it shouldn't.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from research_data_pipeline_spark.io.layout import formatted_plan
from research_data_pipeline_spark.registry import all_specs

SPECS = all_specs()


def _plan(spark, sf_dir, name):
    return formatted_plan(SPECS[name].fn(spark, sf_dir))


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)", plan)


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # reaches PushedFilters


def test_q01_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    [schema] = _read_schemas(plan)
    # lineitem has 16 columns; the summary needs 7
    assert len(schema.split(",")) <= 8, schema


def test_q02_dims_broadcast_not_shuffled(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # every scan is column-pruned: the widest table read needs < 4 cols
    for schema in _read_schemas(plan):
        assert len(schema.split(",")) <= 4, schema


def test_g02_ego_pruned_before_self_join(spark, sf_dir):
    # the disjunctive ego predicate cannot push below the co-occurrence
    # self-join, so the inputs must be pre-pruned to the ego's orders via
    # a semi-join — a full order×supplier pair join is a 100-TB killer
    plan = _plan(spark, sf_dir, "g02_ego_cosuppliers")
    semi_pos = plan.find("LeftSemi")
    assert semi_pos != -1, "self-join input is not ego-pruned (no semi-join)"
    # and the semi-join side is broadcast (the ego order set is tiny)
    assert "BroadcastHashJoin" in plan


def test_d06_no_duplicate_candidate_verification(spark, sf_dir):
    # first-match band emission: every candidate pair is produced by
    # exactly one band branch, so no post-verify deduplication pass
    # (HashAggregate over the pair stream) should exist in the plan.
    # The registered query materializes (localCheckpoint cuts lineage),
    # so inspect the operator's lazy plan directly.
    from research_data_pipeline_spark.operators.text_dedup import minhash_lsh_pairs
    from research_data_pipeline_spark.tables import load

    d = load(spark, sf_dir, "documents")
    plan = formatted_plan(
        minhash_lsh_pairs(d, "doc_id", "text", materialize=False)
    )
    spark.catalog.clearCache()  # materialize=False leaves the caches live
    # ONE fused candidate join over the exploded (band_idx, band_key)
    # stream (r14): no per-band branch union, no post-verify dedup pass
    # (the remaining joins are the dictionary vocab-encode join inlined
    # on each self-join side, not candidate joins)
    assert "Union" not in plan  # per-band branches are gone
    assert "posexplode" in plan  # fused band-key explode feeds the join
    assert "SortMergeJoin" not in plan  # join broadcasts under the guard


def test_relational_queries_have_no_python_in_plan(spark, sf_dir):
    # the whole q* suite must stay JVM-side: no row-at-a-time Python
    # (BatchEvalPython) and no Arrow fallback (ArrowEvalPython) either —
    # those nodes break whole-stage codegen and pay serialization per row
    for name in sorted(SPECS):
        if not name.startswith("q"):
            continue
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name


def test_d27_bm25_stays_jvm_side(spark, sf_dir):
    # BM25 is pure column arithmetic — any Python eval node in its plan
    # means the scoring fell off the codegen path
    plan = _plan(spark, sf_dir, "d27_bm25_topk")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the top-k must be a per-partition heap + driver merge, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_d28_bigram_lm_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "d28_bigram_lm_nll")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_d26_semantic_dedup_no_cartesian(spark, sf_dir):
    # assignment happens inside one mapInPandas pass against the
    # broadcast centroid matrix, so the plan must contain NO unkeyed join
    # of any kind — a CartesianProduct or nested-loop node would mean the
    # vector×vector (or vector×centroid) pair space leaked into the plan
    plan = _plan(spark, sf_dir, "d26_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_adds_no_shuffle(spark, sf_dir):
    # membership is k broadcast joins: probing a dataframe must not
    # repartition it
    from research_data_pipeline_spark.operators import bloom
    from research_data_pipeline_spark.tables import load

    d = load(spark, sf_dir, "documents").select(
        F.md5("text").alias("v")
    )
    filt = bloom.build(d, "v", n_bits=1 << 14).localCheckpoint()
    plan = formatted_plan(bloom.with_might_contain(d, "v", filt, n_bits=1 << 14))
    assert "Exchange hashpartitioning" not in plan, plan


def test_e20_rolling_dau_no_nested_loop(spark, sf_dir):
    # the rolling 7-day distinct is a contribution explode + hash
    # aggregations — a range-join formulation would appear here as a
    # BroadcastNestedLoopJoin / CartesianProduct and die at scale
    plan = _plan(spark, sf_dir, "e20_rolling_dau")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_g10_lcc_no_python_no_cartesian(spark, sf_dir):
    # degree + wedge-closing joins are all keyed; coefficient is integer
    # column arithmetic
    plan = _plan(spark, sf_dir, "g10_clustering_coefficient")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_e21_q34_window_queries_stay_jvm_side(spark, sf_dir):
    for name in ("e21_time_weighted_avg", "q34_range_frame_revenue"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_batch3_queries_stay_jvm_side(spark, sf_dir):
    # q35's single-row broadcast total is the one sanctioned nested-loop
    # (1 row × parts); everything else must be keyed joins, no Python
    for name in ("q35_global_share_parts", "d33_tfidf_top_terms",
                 "s10_countmin_sketch"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_batch4_queries_stay_jvm_side(spark, sf_dir):
    # s11's single-row min/max broadcast is the sanctioned nested-loop
    # (1 row × customers, q35's shape); q36 must join on the block key
    # (equi-join with levenshtein as a post-join filter), never all-pairs
    for name in ("s11_equiwidth_histogram", "e22_transition_matrix",
                 "q36_fuzzy_name_blocks"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    plan = _plan(spark, sf_dir, "q36_fuzzy_name_blocks")
    # the block key must be a JOIN key (the formatted plan's "Left keys"
    # list under a hash/sort-merge join node), not merely survive in a
    # post-join Filter/Project — a regression to cartesian-plus-filter
    # would still contain the substring 'blk'
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
        r"[\s\S]{0,200}?Left keys \[\d+\]: \[blk#",
        plan,
    ), plan[:2000]


def test_d34_quantization_is_shuffle_free(spark, sf_dir):
    """SQ8 quantization is a pure map — any keyed Exchange in its plan
    means a scale regression (the operator's 100 TB story is 'no shuffle
    at all'). The only allowed Exchange is ensure_parallelism's gated
    round-robin scan repartition, which never fires on real multi-row-
    group inputs."""
    plan = _plan(spark, sf_dir, "d34_sq8_quantization")
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan, plan[:1500]
    assert "EvalPython" not in plan  # stays JVM-side, no UDF


def test_d36_pq_adc_kernels_and_no_pair_join(spark, sf_dir):
    # r14: the encode pass and the ADC scan are Arrow kernels over
    # broadcasts of the bounded sides (16-row codebook; query-batch
    # LUTs) — the previous interpreted F.aggregate folds were ~18 s of
    # the operator's 21 s sf0.1 task time. No join may materialize the
    # n·n_queries pair space: the scan emits per-task top-k rows only,
    # so the plan must hold NO cartesian/nested-loop join and NO
    # pickled-row Python evaluator (MapInPandas is the sanctioned node).
    plan = _plan(spark, sf_dir, "d36_pq_adc_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan  # the ADC scan kernel
    assert "BatchEvalPython" not in plan  # no pickled-row UDF path


def test_e25_interval_join_is_equi_not_nested_loop(spark, sf_dir):
    # the whole point of binned_interval_join: the BETWEEN predicate must
    # ride a hash join on the bin id, never a nested-loop/cartesian scan
    plan = _plan(spark, sf_dir, "e25_interval_overlap_counts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_bin" in plan  # the equi key actually reaches the join


def test_session_batch5_queries_stay_jvm_side(spark, sf_dir):
    # the round's relational/sketch additions: all pure DataFrame algebra
    # — no Python evaluator, no cartesian anywhere (m10 is the sanctioned
    # mapInPandas codec pass and is excluded; d36's broadcast-NLJ ADC
    # scan has its own dedicated assertion above)
    for name in (
        "d37_containment_pairs",
        "d38_bpe_encode",
        "e26_incremental_agg_merge",
        "e27_distribution_drift",
        "e28_activity_streaks",
        "g12_hits_authorities",
        "q37_snapshot_diff",
        "q38_retention_purge",
        "s13_hll_registers",
        "s14_poisson_bootstrap",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_session_batch6_queries_stay_jvm_side(spark, sf_dir):
    # late-session additions: all JVM expression plans (d45's masking is
    # a higher-order transform, not a UDF; q40 goes through spark.sql);
    # d39 is excluded from the no-Python check — its cosines ride the
    # sanctioned Arrow _dot_kernel like d11's — but still must keep the
    # bucket equi-join (asserted below)
    for name in (
        "d40_random_projection",
        "d41_dedup_savings",
        "d45_span_corruption",
        "d46_regex_pretokenizer",
        "e29_mad_outliers",
        "q39_target_encoding",
        "q40_sql_surface",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # d45's claim is stronger: a pure map — no exchange of any kind
    plan = _plan(spark, sf_dir, "d45_span_corruption")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    plan = _plan(spark, sf_dir, "d39_ann_multiprobe_lsh")
    assert "CartesianProduct" not in plan
    assert "bucket" in plan  # probe fan-out joins on the bucket key


def test_final_r6_and_r7_queries_stay_jvm_side(spark, sf_dir):
    # the remaining round-6 family (d49 winnowing, s15/s16 sampling) plus
    # round-7's d50 substring spans: pure DataFrame algebra — no Python
    # evaluator, no cartesian; windows are per-doc/per-stratum keyed
    for name in (
        "d49_winnowing_fingerprints",
        "d50_substring_spans",
        "d51_gopher_rules",
        "d52_source_kl_divergence",
        "s15_stratified_topk_sample",
        "s16_weighted_median",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # d50's shared-shingle detection must stay a keyed aggregation +
    # semi-join on the hash — never a pairwise join of shingle streams
    plan = _plan(spark, sf_dir, "d50_substring_spans")
    assert "LeftSemi" in plan


def test_round7_batch2_queries_stay_jvm_side(spark, sf_dir):
    # d53 composes the shared LSH pair stream + label joins, d54 rides
    # d38's JVM-side BPE encode, e34's SCD2 build is per-user windows +
    # one keyed agg: all must stay whole-stage-codegen-able with no
    # Python evaluator and no cartesian pair space.
    for name in (
        "d53_cross_source_leakage",
        "d54_tokenizer_fertility",
        "e34_scd2_intervals",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # m12 decodes WAV payloads through the sanctioned Arrow kernel —
    # Python is expected there, but the pair space must never be: the
    # quality gate is a pure per-row map + one global threshold agg.
    plan = _plan(spark, sf_dir, "m12_audio_quality")
    assert "CartesianProduct" not in plan
    # e34's windows are all keyed by user_id — no global (unpartitioned)
    # window may appear; a single-partition sort would serialize the
    # corpus through one task at 100 TB.
    plan = _plan(spark, sf_dir, "e34_scd2_intervals")
    assert "SinglePartition" not in plan


def test_round7_batch3_queries_stay_jvm_side(spark, sf_dir):
    # d55 composes d07's banded pairs (no new pair space), d56's DSIR
    # scoring is two keyed aggs + a vocabulary-sized broadcast join,
    # d57's rank window is vocabulary-sized by design, e35/e36 are
    # keyed windows + a broadcast scalar, g14's wedges come from the
    # thresholded sparse graph, s17 runs over distinct prices per
    # group: none may use a Python evaluator or a cartesian product.
    for name in (
        "d55_sketch_calibration",
        "d56_dsir_importance",
        "d57_vocab_coverage",
        "e35_pit_training_set",
        "e36_asof_snapshot",
        "g14_link_prediction",
        "s17_weighted_quartiles",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # d56's token-score table must reach the doc-token join as a
    # broadcast (vocabulary-sized dictionary, never a shuffled join)
    plan = _plan(spark, sf_dir, "d56_dsir_importance")
    assert "BroadcastHashJoin" in plan
    # e35's windows are all keyed by user_id — a global sort here would
    # serialize the event log through one task
    plan = _plan(spark, sf_dir, "e35_pit_training_set")
    assert "SinglePartition" not in plan


def test_s18_cuped_no_python_no_cartesian(spark, sf_dir):
    # CUPED is two keyed aggs + one scalar broadcast; the DECIMAL(38,0)
    # sufficient statistics must stay JVM-side column arithmetic
    plan = _plan(spark, sf_dir, "s18_cuped_theta")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_d58_g15_stay_jvm_side(spark, sf_dir):
    # d58 adds only a codegen bucket expression on top of d19's cluster
    # table; g15 is degree joins + one scalar agg on DECIMAL(38,0)
    for name in ("d58_leakage_free_split", "g15_degree_assortativity"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
    plan = _plan(spark, sf_dir, "g15_degree_assortativity")
    assert "EvalPython" not in plan


def test_q43_e37_stay_jvm_side(spark, sf_dir):
    # q43 is one map-side-combined agg per audited key; e37 is one
    # broadcast scalar + one keyed agg — pure integer arithmetic
    for name in ("q43_join_skew_audit", "e37_decayed_user_value"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_d59_minhash_calibration_no_cartesian(spark, sf_dir):
    # candidates come from the banded equi-joins; signature lookups are
    # broadcast under the guard — no unkeyed join may exist
    plan = _plan(spark, sf_dir, "d59_minhash_calibration")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d60_ingest_no_pair_space(spark, sf_dir):
    # assignment is one Arrow pass against the broadcast centroid
    # matrix — the vector×centroid pair space must never reach the plan
    plan = _plan(spark, sf_dir, "d60_incremental_ann_ingest")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e39_temporal_join_is_keyed(spark, sf_dir):
    # the interval predicate must ride a user_id equi-join (post-join
    # filter), never a range-join pair space or Python evaluator
    plan = _plan(spark, sf_dir, "e39_temporal_dim_join")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e40_session_paths_bounded_topk(spark, sf_dir):
    # the top-25 cut must be a per-partition heap + driver merge
    # (TakeOrderedAndProject), never a global sort of the path table
    plan = _plan(spark, sf_dir, "e40_session_paths")
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round8_pair_generators_never_cartesian(spark, sf_dir):
    """The round-8 pair/candidate generators must ride keyed equi-joins:
    no CartesianProduct and no BroadcastNestedLoopJoin anywhere in d61
    (shingle dfreq join), m13 (band join), or e41 (per-user touch
    window)."""
    for name in ("d61_dup_ngram_coverage", "m13_phash_pairs",
                 "e41_multitouch_attribution"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_s19_windows_never_row_scaled(spark, sf_dir):
    """s19's windows run over bucket (<=40 rows) and distinct-value
    state — the exact-quantile verification must NOT rank raw rows (the
    first draft did; 15.7s at sf1). The plan proves it: every Window
    consumes an aggregate, so a Scan never feeds a Window directly."""
    plan = _plan(spark, sf_dir, "s19_log_histogram_quantiles")
    assert "Window" in plan
    # both window inputs are HashAggregate outputs (bucket counts /
    # distinct-value counts), so the single-partition windows order
    # domain-sized state, never the row count
    assert plan.count("HashAggregate") >= 4, plan


def test_d68_no_cc_recompute_in_plan(spark, sf_dir):
    """d68 assigns a new batch against the FROZEN artifacts: both the
    cluster store and the pair stream enter the plan as materialized
    localCheckpoint scans (ExistingRDD), never as recomputed lineage —
    so the plan contains NO minhash aggregate and NO iterative CC label
    joins (those live in the shared builds, paid once per corpus), only
    keyed joins/aggs over the artifacts. EvalPython would mean the
    signature kernel re-ran; a SortAggregate over collect_list-style
    minhash state would mean the pair stream rebuilt."""
    plan = _plan(spark, sf_dir, "d68_incremental_clusters")
    assert "Scan ExistingRDD" in plan  # the frozen artifacts
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the signature build's distinguishing ops must be absent
    assert "minhash" not in plan.lower()


def test_d73_fusion_stays_kbounded_jvm(spark, sf_dir):
    # hybrid RRF: both legs must be cut by per-partition heap + driver
    # merge (TakeOrderedAndProject) BEFORE the fusion join; the dense
    # cosine is a JVM fold (no Python nodes); the only nested-loop
    # allowed is the documented one-row broadcast build side (query
    # vector / corpus-stats row), never a data×data cartesian
    plan = _plan(spark, sf_dir, "d73_hybrid_rrf_fusion")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2


def test_g18_every_window_keyed_no_python(spark, sf_dir):
    # SCC over the handoff graph: the per-order LAG, the top-2
    # sparsifier and the scc_size count are ALL keyed windows — no
    # SinglePartition exchange anywhere — and nothing falls to Python
    # (the guarded driver path broadcasts its label table back)
    plan = _plan(spark, sf_dir, "g18_strongly_connected")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_d44_contrastive_no_nested_loop(spark, sf_dir):
    # r14: assignment rides the shared Arrow assign_cells kernel — the
    # old broadcast(cents) all-centroids scoring was an unkeyed
    # BroadcastNestedLoopJoin (the r13 verdict's one plan-level finding);
    # no unkeyed join may reach the plan
    plan = _plan(spark, sf_dir, "d44_contrastive_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
