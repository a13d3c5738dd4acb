"""Differential test: every registered query vs its DuckDB oracle at
sf0.01 — the exact check the driver's correctness gate runs."""

from __future__ import annotations

import pytest

from research_data_pipeline_spark.registry import all_specs

from .oracle import assert_parity

SF_DIR = "/root/testdata/sf0.01"
SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke, mirrors driver's weak check
    else:
        assert_parity(df, spec.oracle, SF_DIR, name=name)
