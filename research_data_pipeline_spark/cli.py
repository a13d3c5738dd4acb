"""Command-line entry point: list and run registered queries.

    rdp-spark list                         # every registered query + tags
    rdp-spark run q01_pricing_summary      # run one, print the result
    rdp-spark run d06_minhash_lsh --sf-dir /data/sf1 --limit 50
    rdp-spark sql "SELECT COUNT(*) FROM lineitem"

The SQL subcommand registers every table as a temp view first
(``tables.register_views``), so ad-hoc SQL sees the same normalized
schemas the DataFrame queries use.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rdp-spark")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory of parquet tables (default $SPARK_GRAFT_SF_DIR)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run one registered query")
    runp.add_argument("name")
    runp.add_argument("--limit", type=int, default=20, help="rows to show")
    sqlp = sub.add_parser("sql", help="run ad-hoc SQL over the tables")
    sqlp.add_argument("query")
    sqlp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    from .registry import all_specs

    if args.cmd == "list":
        for name, spec in sorted(all_specs().items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{', '.join(spec.tags) or '-'}] ({oracle})")
        return 0

    from .session import get_spark

    spark = get_spark(app=f"rdp-cli-{args.cmd}")
    if args.cmd == "run":
        specs = all_specs()
        if args.name not in specs:
            print(f"unknown query {args.name!r}; see `rdp-spark list`", file=sys.stderr)
            return 2
        specs[args.name].fn(spark, args.sf_dir).show(args.limit, truncate=False)
    else:  # sql
        from .tables import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
