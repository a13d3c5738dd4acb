"""rrf_fuse: the generic N-leg reciprocal-rank fusion operator behind
d73 — exact-integer micro-unit scores, full-outer semantics for docs
missing from a leg."""

from __future__ import annotations

import pytest


def _leg(spark, rows):
    return spark.createDataFrame(rows, "id bigint, rank bigint")


def test_rrf_fuse_matches_hand_computation(spark):
    from research_data_pipeline_spark.operators.search import rrf_fuse

    lex = _leg(spark, [(10, 1), (20, 2), (30, 3)])
    dense = _leg(spark, [(30, 1), (40, 2)])
    got = {
        r["id"]: (r["rank_1"], r["rank_2"], r["rrf_micro"], r["fused_rank"])
        for r in rrf_fuse([lex, dense], k=60).collect()
    }
    # hand: 10**6 // (60 + rank)
    assert got[30] == (3, 1, 10**6 // 63 + 10**6 // 61, 1)
    assert got[10] == (1, None, 10**6 // 61, 2)
    assert got[20] == (2, None, 10**6 // 62, 3)
    assert got[40] == (None, 2, 10**6 // 62, 4)
    # tie between 20 and 40 (both 16129) broken by id ascending
    assert got[20][3] < got[40][3]


def test_rrf_fuse_three_legs_and_top_cut(spark):
    from research_data_pipeline_spark.operators.search import rrf_fuse

    a = _leg(spark, [(1, 1), (2, 2)])
    b = _leg(spark, [(2, 1), (3, 2)])
    c = _leg(spark, [(3, 1), (1, 2)])
    out = rrf_fuse([a, b, c], k=60, top=2).collect()
    assert len(out) == 2
    got = {r["id"]: r["rrf_micro"] for r in out}
    # every doc appears in exactly 2 legs at ranks {1,2}
    assert set(got.values()) == {10**6 // 61 + 10**6 // 62}
    # top=2 keeps ids 1 and 2 (tie broken by id)
    assert set(got) == {1, 2}


def test_rrf_fuse_empty_and_single_leg(spark):
    from research_data_pipeline_spark.operators.search import rrf_fuse

    with pytest.raises(ValueError, match="at least one leg"):
        rrf_fuse([])
    solo = _leg(spark, [(5, 1)])
    [row] = rrf_fuse([solo]).collect()
    assert (row["id"], row["rrf_micro"], row["fused_rank"]) == (
        5, 10**6 // 61, 1,
    )
