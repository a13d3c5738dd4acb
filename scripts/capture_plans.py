#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
       python scripts/capture_plans.py r14_before            # all queries

Writes plans/<dir>/<query>_<suffix>.txt where <tag> is split on the last
underscore into (dir, suffix), e.g. tag "r14_before" -> plans/r14/<q>_before.txt.

Note: for iterative operators (graph fixpoints, BFS) most of the work runs
EAGERLY during DataFrame construction (localCheckpoint per round); the
captured plan is the final assembly over materialized intermediates — the
per-round shape is documented in the operator docstrings instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    rdir, _, suffix = tag.rpartition("_")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rdir
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from research_data_pipeline_spark.registry import all_specs
    from research_data_pipeline_spark.session import get_spark

    specs = all_specs()
    if not names:
        names = sorted(specs)
    spark = get_spark(app="rdp-plans")
    n_ok = 0
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # capture what we can; note the failure
            plan = f"PLAN CAPTURE FAILED: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ok += 1
        spark.catalog.clearCache()
    print(f"captured {n_ok} plans into {out_dir} (suffix _{suffix})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
