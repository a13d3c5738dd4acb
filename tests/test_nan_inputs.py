"""NaN robustness (round-11 eighth adversarial sweep): IEEE NaN in a
double column is a DIFFERENT defect class than NULL — engines disagree
on NaN far more often (ordering, quantiles, casts). The full-registry
state is recorded by `scripts/probe_corpus.py nan`; this file pins the
two queries whose NaN contract is now explicit (e24, e29) and the
engine behavior the remaining triage is built on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .test_null_inputs import TABLES


@pytest.fixture(scope="module")
def nan_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nan_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 11 == 0, F.lit(float("nan")))
                .otherwise(F.col("value")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize(
    "name",
    ["e24_record_high_counts", "e29_mad_outliers",
     "e27_distribution_drift", "e31_incremental_moments",
     "e26_incremental_agg_merge"],
)
def test_nan_contract_queries_stay_oracle_exact(spark, nan_dir, name):
    """e24: NaN neither sets nor breaks a record (a NaN used to become
    cur_max and freeze the per-user monitor). e29/e27/e31/e26: NaN is
    excluded from the quantile/distribution/moment domain (explicit
    contract on both engines). All pinned by full parity."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nan_dir), spec.oracle, nan_dir, name)


def test_spark_floor_nan_is_silent_zero(spark):
    """The engine-behavior fact the NaN triage documents (SURVEY r11):
    Spark's FLOOR(double) returns BIGINT and maps NaN to 0 SILENTLY even
    under ANSI mode, while DuckDB refuses the NaN->INT64 conversion
    loudly. The exact-cents idiom `CAST(FLOOR(v*100+0.5) AS BIGINT)`
    therefore silently turns a NaN money value into 0 cents — the
    documented hazard behind the scheduled money_cents() loud helper.
    If a Spark upgrade changes this, the triage must be revisited."""
    row = spark.range(1).select(
        F.expr("CAST(FLOOR(double('NaN') * 100 + 0.5) AS BIGINT)").alias("c")
    ).first()
    assert row["c"] == 0  # silent — the hazard, not the desired behavior


def test_money_cents_loud_on_nan_null_passthrough(spark):
    """The r12-batch helper: exact cents on values, NULL passthrough,
    RAISE on NaN (the loud contract the inline idiom lacks)."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from research_data_pipeline_spark.functions.core import money_cents

    # expectations follow IEEE doubles exactly as the inline idiom does:
    # 1.005 is stored as 1.00499…, so *100+0.5 floors to 100 (both
    # engines agree — the idiom's exactness claim is about the shared
    # double, not decimal re-interpretation)
    ok = spark.createDataFrame(
        [(1.005,), (2.994,), (-3.005,), (None,)], "v double"
    ).select(money_cents("v").alias("c")).collect()
    assert [r["c"] for r in ok] == [100, 299, -300, None]

    bad = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    with pytest.raises(Exception, match="NaN money value"):
        bad.select(money_cents("v").alias("c")).collect()


def test_money_cents_decimal_matches_inline_idiom_and_raises_on_nan(spark):
    """The decimal-shape variant must be BYTE-IDENTICAL to the inline
    `CAST(CAST(v AS DECIMAL(12,4)) * 100 AS BIGINT)` on every non-NaN
    value — including the cents-boundary values where HALF_UP-at-4-
    decimals-then-truncate differs from floor(v*100+0.5) — and LOUD on
    NaN (the inline idiom silently maps NaN->NULL via the decimal
    cast)."""
    from research_data_pipeline_spark.functions.core import (
        money_cents_decimal,
    )

    # cents-boundary corpus: .xx5 and .xx49/.xx51 neighborhoods, exact
    # halves at the 4th decimal, negatives, zero, large magnitudes
    vals = [
        1.005, 2.994, -3.005, 0.0, 0.004999, 0.005001, 12.34495,
        12.34505, -12.34505, 99999999.9999, -99999999.9999, 0.00005,
        -0.00005, 7.77775, 123.4567, None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.select(money_cents_decimal("v").alias("c")).collect()
    ref = df.select(
        F.expr("CAST(CAST(v AS DECIMAL(12,4)) * 100 AS BIGINT)").alias("c")
    ).collect()
    assert [r["c"] for r in got] == [r["c"] for r in ref]

    # the inline idiom is SILENT on NaN (NULL) — the hazard
    silent = spark.createDataFrame([(float("nan"),)], "v double").select(
        F.expr("CAST(CAST(v AS DECIMAL(12,4)) * 100 AS BIGINT)").alias("c")
    ).first()
    assert silent["c"] is None
    # the helper is loud
    bad = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    with pytest.raises(Exception, match="NaN money value"):
        bad.select(money_cents_decimal("v").alias("c")).collect()


@pytest.mark.parametrize(
    "name",
    ["e01_tumbling_counts", "e11_multigrain_rollup",
     "e30_stream_agg_merge", "e35_pit_training_set",
     "e02_streaming_tumbling", "e14_stream_static_join",
     "e08_stateful_user_stats"],
)
def test_r12_nan_exclusion_queries_stay_oracle_exact(spark, nan_dir, name):
    """Round-12 batch of the NaN-exclusion contract (e27/e29/e31
    template): NaN rows leave the aggregate/feature-history domain on
    BOTH engines, NULLs stay. Full parity on the NaN-poisoned corpus."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nan_dir), spec.oracle, nan_dir, name)


@pytest.mark.parametrize(
    "name",
    ["e21_time_weighted_avg", "q44_guarded_hot_key_agg",
     "e37_decayed_user_value", "e39_temporal_dim_join",
     "s18_cuped_theta", "e41_multitouch_attribution",
     "s21_mann_whitney_u", "s22_cusum_drift", "s23_delta_method_ratio",
     "s24_msprt_always_valid"],
)
def test_r12_money_cents_swaps_raise_loudly_on_nan(spark, nan_dir, name):
    """Round-12 money_cents/_decimal swaps: on a NaN-poisoned value
    column these queries now REFUSE loudly (matching the oracle's
    behavior class) instead of silently zeroing/dropping cents."""
    from research_data_pipeline_spark.registry import all_specs

    spec = all_specs()[name]
    with pytest.raises(Exception, match="NaN money value"):
        spec.fn(spark, nan_dir).collect()


@pytest.mark.parametrize(
    "name",
    ["e21_time_weighted_avg", "q44_guarded_hot_key_agg",
     "e37_decayed_user_value", "e39_temporal_dim_join",
     "s18_cuped_theta", "e41_multitouch_attribution",
     "s21_mann_whitney_u", "s22_cusum_drift", "s23_delta_method_ratio",
     "s24_msprt_always_valid", "q45_order_reconciliation"],
)
def test_r12_money_cents_swaps_unchanged_on_clean_data(spark, name):
    """The never-taken NaN branch changes nothing on contract-conforming
    data: full oracle parity at sf0.001 post-swap."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    sf = "/root/testdata/sf0.001"
    assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)


def test_q45_money_cents_raises_on_nan_money_columns(spark, tmp_path):
    """q45's cents lambda hits lineitem/orders money columns, not
    events.value — poison l_extendedprice to prove the swap is loud on
    ITS domain (the shared nan_dir only poisons events)."""
    from research_data_pipeline_spark.registry import all_specs

    d = str(tmp_path / "q45_nan")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "lineitem":
            df = df.withColumn(
                "l_extendedprice",
                F.when(F.col("l_orderkey") % 7 == 0, F.lit(float("nan")))
                .otherwise(F.col("l_extendedprice")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    spec = all_specs()["q45_order_reconciliation"]
    with pytest.raises(Exception, match="NaN money value"):
        spec.fn(spark, d).collect()


@pytest.fixture(scope="module")
def nanmoney_dir(spark, tmp_path_factory):
    """The r12 nanmoney corpus shape (scripts/probe_corpus.py nanmoney):
    NaN in lineitem/orders money columns instead of events.value."""
    d = str(tmp_path_factory.mktemp("nanmoney_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "lineitem":
            df = df.withColumn(
                "l_extendedprice",
                F.when(F.col("l_orderkey") % 13 == 0, F.lit(float("nan")))
                .otherwise(F.col("l_extendedprice")),
            )
        elif t == "orders":
            df = df.withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 13 == 0, F.lit(float("nan")))
                .otherwise(F.col("o_totalprice")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize(
    "name", ["q40_sql_surface", "s14_poisson_bootstrap",
             "q17_segment_price_stats", "q28_segment_quartiles",
             "s04_approx_quantiles"]
)
def test_nanmoney_contract_queries_stay_oracle_exact(
    spark, nanmoney_dir, name
):
    """The lineitem/orders NaN-exclusion sites — q40/s14 (free r12 head
    slots) plus the three r13 silent quantile divergences (q17 median,
    q28 quartiles, s04 GK sketch: Spark orders NaN HIGH in percentiles
    while DuckDB's quantile skips it). NaN prices leave the domain on
    BOTH engines, NULLs stay. Full parity on the nanmoney corpus."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nanmoney_dir), spec.oracle, nanmoney_dir, name)


@pytest.mark.parametrize(
    "name", ["q15_rollup_revenue", "e42_cdc_apply"]
)
def test_r13_money_decimal_swaps_raise_loudly_on_nanmoney(
    spark, nanmoney_dir, name
):
    """Round-13 in-band decimal swaps: on a NaN-poisoned money column
    these queries now REFUSE loudly (matching the oracle's NaN→DECIMAL
    refusal class) instead of silently dropping the row via Spark's
    NaN→NULL decimal cast."""
    from research_data_pipeline_spark.registry import all_specs

    spec = all_specs()[name]
    with pytest.raises(Exception, match="NaN money value"):
        spec.fn(spark, nanmoney_dir).collect()


@pytest.mark.parametrize(
    "name", ["q15_rollup_revenue", "e42_cdc_apply",
             "q17_segment_price_stats", "q28_segment_quartiles",
             "s04_approx_quantiles"]
)
def test_r13_nanmoney_sites_unchanged_on_clean_data(spark, name):
    """The never-taken NaN branch (q15/e42) and the never-matching NaN
    filter (q17/q28/s04) change nothing on contract-conforming data:
    full oracle parity at sf0.001 post-change."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    sf = "/root/testdata/sf0.001"
    assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)


def test_money_dec_matches_plain_cast_and_raises_on_nan(spark):
    """money_dec (the summable-DECIMAL sibling): byte-identical to the
    plain CAST(v AS DECIMAL(12,4)) on every non-NaN value including
    NULL, loud on NaN (the plain cast silently maps NaN->NULL)."""
    from research_data_pipeline_spark.functions.core import money_dec

    vals = [1.005, 2.994, -3.005, 0.0, 12.34505, -12.34505,
            99999999.9999, 0.00005, 123.4567, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.select(money_dec("v").alias("c")).collect()
    ref = df.select(F.expr("CAST(v AS DECIMAL(12,4))").alias("c")).collect()
    assert [r["c"] for r in got] == [r["c"] for r in ref]

    silent = spark.createDataFrame([(float("nan"),)], "v double").select(
        F.expr("CAST(v AS DECIMAL(12,4))").alias("c")
    ).first()
    assert silent["c"] is None  # the hazard
    bad = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    with pytest.raises(Exception, match="NaN money value"):
        bad.select(money_dec("v").alias("c")).collect()


_R14_MONEY_SWAP_SITES = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q10_running_revenue",
    "q24_cube_revenue", "q29_grouping_sets", "q34_range_frame_revenue",
    "q35_global_share_parts", "q47_guarded_skew_join", "s08_column_stats",
]


@pytest.mark.parametrize("name", _R14_MONEY_SWAP_SITES)
def test_r14_money_decimal_swaps_raise_loudly_on_nanmoney(
    spark, nanmoney_dir, name
):
    """Round-14 pre-scheduled batch (the last 9 engine-silent
    NaN→DECIMAL row-loss sites): on a NaN-poisoned money column these
    queries now REFUSE loudly, matching the oracle's NaN→DECIMAL
    refusal class, instead of Spark's silent NaN→NULL cast dropping the
    row from every sum/min/max."""
    from research_data_pipeline_spark.registry import all_specs

    spec = all_specs()[name]
    with pytest.raises(Exception, match="NaN money value"):
        spec.fn(spark, nanmoney_dir).collect()


@pytest.mark.parametrize("name", _R14_MONEY_SWAP_SITES)
def test_r14_money_swap_sites_unchanged_on_clean_data(spark, name):
    """The never-taken NaN branch changes nothing on contract-conforming
    data: full oracle parity at sf0.001 post-swap for all 9 sites."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    sf = "/root/testdata/sf0.001"
    assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)


@pytest.fixture(scope="module")
def nanemb_dir(spark, tmp_path_factory):
    """The r13 nanemb corpus shape (scripts/probe_corpus.py nanemb):
    IEEE NaN in component 0 of every 13th embedding vector — the ANN
    family's NaN surface (Spark orders NaN above every real value, so a
    NaN cosine passes thresholds and wins top-k windows)."""
    d = str(tmp_path_factory.mktemp("nanemb_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 13 == 0,
                    F.expr(
                        "concat(array(cast('NaN' as float)), "
                        "slice(embedding, 2, size(embedding) - 1))"
                    ),
                ).otherwise(F.col("embedding")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


_R14_NANEMB_SITES = [
    "d26_semantic_dedup", "d34_sq8_quantization", "d36_pq_adc_topk",
    "d40_random_projection", "d13b_ivf_lloyd_recall",
    "d63_ivf_balance_audit", "d64_embedding_outliers",
    "m18_cross_modal_pairs", "d44_contrastive_pairs",
]


@pytest.mark.parametrize("name", _R14_NANEMB_SITES)
def test_r14_nanemb_sites_stay_oracle_exact(spark, nanemb_dir, name):
    """The r14 vector-domain batch: NaN-containing vectors leave the
    similarity domain on BOTH engines (similarity.drop_nan_vectors +
    the _E_CTE_FIN / per-oracle WHERE fragments), so these nine sites
    are value-exact on a NaN-poisoned embedding corpus — they were 4
    silent divergences + 4 crashes (+ d44's would-be regression under
    its Arrow-kernel rewrite) before the contract."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nanemb_dir), spec.oracle, nanemb_dir, name)


@pytest.mark.parametrize("name", _R14_NANEMB_SITES)
def test_r14_nanemb_sites_unchanged_on_clean_data(spark, name):
    """The never-matching NaN filter changes nothing on
    contract-conforming data: full oracle parity at sf0.001."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    sf = "/root/testdata/sf0.001"
    assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)


@pytest.fixture(scope="module")
def nullemb_dir(spark, tmp_path_factory):
    """The r14-late nullemb corpus shape (scripts/probe_corpus.py
    nullemb): SQL NULL in component 0 of every 13th embedding vector —
    passes the NaN-only filter (Spark's isnan(NULL) is FALSE), then
    silently poisons JVM folds (NULL cosine → unknown comparisons) and
    BIGINT output columns, or fires the Arrow kernels' loud guard."""
    d = str(tmp_path_factory.mktemp("nullemb_tables"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 13 == 0,
                    F.expr(
                        "concat(array(cast(NULL as float)), "
                        "slice(embedding, 2, size(embedding) - 1))"
                    ),
                ).otherwise(F.col("embedding")),
            )
        df.write.parquet(f"{d}/{t}.parquet")
    return d


# The r15 batch (registry.py's round-14-late nullemb frontier): the five
# cosine rankers take their FIRST vector-domain fragment (they were the
# last nanemb silent divergences), and d36/d40/d60/d73 widen their r14
# NaN-only fragment to the full NULL-or-NaN component contract.
_R15_NULLEMB_SITES = [
    "d09_embedding_near_dups", "d10_ann_topk", "d11_ann_lsh",
    "d13_ann_ivf", "d39_ann_multiprobe_lsh",
    "d36_pq_adc_topk", "d40_random_projection",
    "d60_incremental_ann_ingest", "d73_hybrid_rrf_fusion",
]


@pytest.mark.parametrize("name", _R15_NULLEMB_SITES)
def test_r15_nullemb_sites_stay_oracle_exact(spark, nullemb_dir, name):
    """Full NULL-or-NaN component contract: these nine sites are
    value-exact on a NULL-component-poisoned embedding corpus — they
    were the nine silent divergences of the r14-late nullemb probe."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nullemb_dir), spec.oracle, nullemb_dir, name)


@pytest.mark.parametrize("name", _R15_NULLEMB_SITES)
def test_r15_nullemb_sites_stay_oracle_exact_on_nanemb(spark, nanemb_dir, name):
    """The same nine sites under the r13 nanemb corpus: the five cosine
    rankers were nanemb's remaining silent divergences and are now
    value-exact; the widened d36/d40/d60/d73 keep their r14 NaN
    behavior."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    assert_parity(spec.fn(spark, nanemb_dir), spec.oracle, nanemb_dir, name)


@pytest.mark.parametrize("name", _R15_NULLEMB_SITES)
def test_r15_nullemb_sites_unchanged_on_clean_data(spark, name):
    """The never-matching NULL-or-NaN filter changes nothing on
    contract-conforming data: full oracle parity at sf0.001."""
    from research_data_pipeline_spark.registry import all_specs

    from .oracle import assert_parity

    spec = all_specs()[name]
    sf = "/root/testdata/sf0.001"
    assert_parity(spec.fn(spark, sf), spec.oracle, sf, name)


def test_assign_kernel_raises_loudly_on_nan_vector(spark):
    """Kernel-side twin of the loader contract: a NaN component that
    reaches the shared assignment kernel raises a named error instead of
    silently losing the argmax (numpy sorts NaN LAST where Spark SQL
    sorts it FIRST) — and instead of d13b's old raw UFuncTypeError from
    the object-dtype driver collect."""
    from research_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.5, float("nan")])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="vector component reached"):
        sim.assign_cells(df, "vec_id", "embedding", 1).collect()


def test_lloyd_refine_raises_loudly_on_nan_vector(spark):
    """The Lloyd mean fold takes the same loud guard (r13 verdict task
    2): NaN vectors reaching lloyd_iters>0 raise the contract error."""
    from research_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)]
        + [(8, [float("nan"), 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="vector component reached"):
        sim.ann_topk_ivf(
            df, "vec_id", "embedding", k=2, n_cells=4, nprobe=1,
            lloyd_iters=1,
        ).count()
