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
