"""Property-based differential tests (hypothesis): the custom temporal
operators agree with independent implementations (pandas.merge_asof,
brute-force pair scan) on adversarially-generated inputs — tie
timestamps, empty sides, key skew, gap-boundary pairs.

Examples are capped small: each example builds Spark DataFrames and runs
jobs, so the value is in the generator's edge cases, not volume.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from research_data_pipeline_spark.operators.temporal import asof_join, range_self_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-100, 100)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=rows_left, rrows=rows_right)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    lpdf = pd.DataFrame(
        {"k": [k for k, _ in lrows], "ts": [_ts(s) for _, s in lrows], "lid": range(len(lrows))}
    )
    rpdf = pd.DataFrame(
        {"k": [k for k, _, _ in rrows], "ts": [_ts(s) for _, s, _ in rrows],
         "val": [v for _, _, v in rrows]}
    ).drop_duplicates(subset=["k", "ts"])  # operator contract: unique (key, ts)
    # pin dtypes: an empty frame would otherwise come out float64/object
    rpdf = rpdf.astype({"k": "int64", "val": "int64"})
    rpdf["ts"] = pd.to_datetime(rpdf["ts"])

    left = spark.createDataFrame(lpdf)
    right = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k bigint, ts timestamp, val bigint")
    )
    got = (
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")
        .select("k", "ts", "lid", "val")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    want = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]),
        rpdf.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)

    assert list(got["lid"]) == list(want["lid"])
    got_vals = [None if pd.isna(v) else int(v) for v in got["val"]]
    want_vals = [None if pd.isna(v) else int(v) for v in want["val"]]
    assert got_vals == want_vals


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=14
    ),
    gap=st.integers(1, 15),
)
def test_range_self_join_matches_bruteforce(spark, rows, gap):
    pdf = pd.DataFrame(
        {"k": [k for k, _ in rows], "ts": [_ts(s) for _, s in rows], "id": range(len(rows))}
    )
    got = {
        (r["k"], r["i"], r["j"])
        for r in range_self_join(
            spark.createDataFrame(pdf), key="k", ts="ts", id_col="id", max_gap_s=float(gap)
        ).collect()
    }
    want = set()
    recs = pdf.to_dict("records")
    for a in recs:
        for b in recs:
            if (
                a["k"] == b["k"]
                and a["id"] < b["id"]
                and abs((b["ts"] - a["ts"]).total_seconds()) <= gap
            ):
                want.add((a["k"], a["id"], b["id"]))
    assert got == want
