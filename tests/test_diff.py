"""snapshot_diff row-level semantics: statuses, NULL transitions."""

from __future__ import annotations

from research_data_pipeline_spark.operators.diff import snapshot_diff


def test_snapshot_diff_statuses_and_null_transitions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    rows = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "modified",   # NULL -> value counts as a change
        3: "modified",   # value -> NULL counts as a change
        4: "removed",
        5: "added",
    }
