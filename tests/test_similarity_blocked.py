"""The big-n similarity fallback is a block-partitioned matrix join:
identical results to the broadcast kernel, and NO cartesian /
broadcast-nested-loop join in the plan at any n (the round-1 fallback was
an inequality-only join that Spark executed as BroadcastNestedLoopJoin —
fatal exactly in the regime the fallback exists for)."""

from __future__ import annotations

import pandas as pd
import pytest

from research_data_pipeline_spark.io.layout import formatted_plan
from research_data_pipeline_spark.operators import similarity as sim

FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_blocked_cosine_pairs_matches_broadcast(emb):
    base = _sorted_pdf(sim.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4))
    # block_rows=32 forces a real multi-tile grid on the tiny fixture
    blocked = _sorted_pdf(
        sim._cosine_pairs_blocked(emb, "vec_id", "embedding", 0.4, block_rows=32)
    )
    pd.testing.assert_frame_equal(base, blocked, check_exact=True)


def test_blocked_ann_topk_matches_broadcast(emb):
    base = _sorted_pdf(sim.ann_topk_bruteforce(emb, "vec_id", "embedding", k=5))
    blocked = _sorted_pdf(
        sim._ann_topk_blocked(emb, "vec_id", "embedding", k=5, block_rows=32)
    )
    pd.testing.assert_frame_equal(base, blocked, check_exact=True)


def test_no_nested_loop_join_at_any_n(emb):
    # max_broadcast=0 forces the public entry points onto the big-n path;
    # the plans must stay hash-join + cogroup shaped
    for df in (
        sim.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4, max_broadcast=0),
        sim.ann_topk_bruteforce(emb, "vec_id", "embedding", k=5, max_broadcast=0),
        # materialize=False keeps the lazy plan visible (the default
        # eagerly checkpoints, which collapses it to an ExistingRDD scan)
        sim.ann_topk_ivf(
            emb, "vec_id", "embedding", k=3, max_broadcast=0, materialize=False
        ),
    ):
        plan = formatted_plan(df)
        for bad in FORBIDDEN:
            assert bad not in plan, plan
        assert "FlatMapCoGroupsInPandas" in plan or "SortMergeJoin" in plan or (
            "BroadcastHashJoin" in plan
        ), plan
    emb.sparkSession.catalog.clearCache()  # materialize=False leaves the cache to us


def test_broadcast_paths_also_clean(emb):
    for df in (
        sim.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4),
        sim.ann_topk_bruteforce(emb, "vec_id", "embedding", k=5),
    ):
        plan = formatted_plan(df)
        for bad in FORBIDDEN:
            assert bad not in plan, plan


def test_lloyd_refinement_improves_ivf_recall(spark):
    """Adversarial seeding: the 4 seed centroids (id < n_cells) all sit in
    ONE of four well-separated clusters, so the unrefined index collapses
    every vector into that cluster's cells and cross-cluster probes miss.
    Lloyd iterations must spread the centroids and raise recall@k vs the
    exact brute-force top-k."""
    import numpy as np

    from research_data_pipeline_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    rng = np.random.default_rng(7)
    centers = np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10]],
        dtype=float,
    )
    rows = []
    vid = 0
    # ids 0..3 (the seeds) first, ALL drawn from cluster 0
    for _ in range(4):
        rows.append((vid, [float(x) for x in centers[0] + rng.normal(0, 0.3, 4)])); vid += 1
    for c in range(4):
        for _ in range(40):
            rows.append((vid, [float(x) for x in centers[c] + rng.normal(0, 0.3, 4)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(df, "vec_id", "embedding", k=3).collect()
    }

    def recall(result) -> float:
        got = {(r["query_id"], r["neighbor_id"]) for r in result.collect()}
        return len(got & exact) / len(exact)

    seed = recall(ann_topk_ivf(df, "vec_id", "embedding", k=3, n_cells=4, nprobe=1))
    refined = recall(
        ann_topk_ivf(
            df, "vec_id", "embedding", k=3, n_cells=4, nprobe=1, lloyd_iters=3
        )
    )
    assert refined > seed, (seed, refined)
    assert refined >= 0.9, refined


def test_pq_adc_rejects_indivisible_dimension(spark):
    """m_sub must divide the vector dimension: width truncation would
    silently drop trailing dims from every subspace distance (advisor
    round-6). The guard is in-plan (raise_error), no validation pass."""
    import pytest

    from research_data_pipeline_spark.operators.similarity import pq_adc_topk

    bad = spark.createDataFrame(
        [(i, [float(i + j) for j in range(10)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="not divisible"):
        pq_adc_topk(
            bad, "vec_id", "embedding", m_sub=3, k=2, n_codes=8, query_mod=10
        ).count()


def test_assign_cells_blocked_matches_broadcast(emb):
    """The >MAX_BROADCAST_CENTROIDS guard (r13 verdict task 5): the
    block-partitioned centroid join must reproduce the broadcast
    kernel's (cell, ccos) bit-exactly — the fold arithmetic is
    blocking-independent and the keyed max-struct reduce re-applies the
    (ccos desc, cid asc) tie order. block_rows=4 forces a real
    multi-block grid on the tiny fixture."""
    e = sim.drop_nan_vectors(
        sim._drop_null_vectors(emb, "embedding"), "embedding"
    )
    base = _sorted_pdf(sim.assign_cells(e, "vec_id", "embedding", 16))
    blocked = _sorted_pdf(
        sim._assign_cells_blocked(
            e, "vec_id", "embedding", 16, block_rows=4
        )
    )
    pd.testing.assert_frame_equal(base, blocked, check_exact=True)


def test_assign_cells_blocked_with_vec_matches_broadcast(emb):
    """with_vec=True on the blocked path joins the vectors back by key;
    _v and the left-fold norm must equal the broadcast kernel's."""
    e = sim.drop_nan_vectors(
        sim._drop_null_vectors(emb, "embedding"), "embedding"
    )
    base = _sorted_pdf(
        sim.assign_cells(e, "vec_id", "embedding", 16, with_vec=True)
        .withColumn("_v", sim.F.col("_v").cast("string"))
    )
    blocked = _sorted_pdf(
        sim._assign_cells_blocked(
            e, "vec_id", "embedding", 16, with_vec=True, block_rows=4
        ).withColumn("_v", sim.F.col("_v").cast("string"))
    )
    pd.testing.assert_frame_equal(base, blocked, check_exact=True)


def test_semantic_dedup_flips_to_blocked_centroids(emb):
    """max_broadcast_centroids=0 forces the auto-sized-cell operator onto
    the centroid-table join path: identical verdict rows."""
    base = _sorted_pdf(
        sim.semantic_dedup(emb, "vec_id", "embedding", n_cells=16,
                           threshold=0.4)
    )
    flipped = _sorted_pdf(
        sim.semantic_dedup(emb, "vec_id", "embedding", n_cells=16,
                           threshold=0.4, max_broadcast_centroids=0)
    )
    pd.testing.assert_frame_equal(base, flipped, check_exact=True)


def test_contrastive_pairs_flips_to_blocked_centroids(emb):
    base = _sorted_pdf(
        sim.contrastive_pairs(emb, "vec_id", "embedding", n_cells=16)
    )
    flipped = _sorted_pdf(
        sim.contrastive_pairs(emb, "vec_id", "embedding", n_cells=16,
                              max_broadcast_centroids=0)
    )
    pd.testing.assert_frame_equal(base, flipped, check_exact=True)
