"""Data-quality checks replacing the reference's database constraints.

The reference enforces integrity with Postgres PKs (sql_queries.py:26,48,
57,67,76,88) and Neo4j uniqueness constraints
(research_pipeline_dag.py:291-294); Spark has no constraints, so these
become explicit validation aggregations — run them after a job, fail the
run on violation. Each check is a single aggregation, no collect of data
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str


def check_unique_key(df: DataFrame, keys: list[str], name: str = "") -> CheckResult:
    """PK / uniqueness-constraint parity (G9)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("d"),
    ).collect()[0]
    ok = agg["n"] == agg["d"]
    return CheckResult(
        name or f"unique({','.join(keys)})", ok, f"rows={agg['n']} distinct={agg['d']}"
    )


def check_not_null(df: DataFrame, cols: list[str], name: str = "") -> CheckResult:
    aggs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    bad = {c: row[c] for c in cols if row[c]}
    return CheckResult(name or f"not_null({','.join(cols)})", not bad, f"nulls={bad}")


def check_referential(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str = ""
) -> CheckResult:
    """FK parity: no child key missing from the parent (the reference
    *repairs* instead of checking — analytical_queries.ipynb cell 10; the
    engine validates after its repair joins)."""
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .where(F.col("k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("k")), "k", "left_anti"
        )
        .count()
    )
    return CheckResult(
        name or f"fk({child_key}->{parent_key})", orphans == 0, f"orphans={orphans}"
    )


def run_star_schema_checks(tables: dict[str, DataFrame]) -> list[CheckResult]:
    """The full constraint set of sql_queries.py:16-90 as checks."""
    t = tables
    return [
        check_unique_key(t["article"], ["article_id"], "article.pk"),
        check_unique_key(t["author"], ["author_id"], "author.pk"),
        check_unique_key(t["journal"], ["journal_issn"], "journal.pk"),
        check_unique_key(t["category"], ["category_id"], "category.pk"),
        check_not_null(t["article"], ["article_id", "title"], "article.notnull"),
        check_referential(t["authorship"], "article_id", t["article"], "article_id"),
        check_referential(t["authorship"], "author_id", t["author"], "author_id"),
        check_referential(t["article_category"], "article_id", t["article"], "article_id"),
        check_referential(t["article_category"], "category_id", t["category"], "category_id"),
        check_referential(t["article"], "journal_issn", t["journal"], "journal_issn"),
    ]


def quality_report(tables: dict[str, DataFrame],
                   fks: list[tuple[str, str, str, str]],
                   uniques: list[tuple[str, str]],
                   not_nulls: list[tuple[str, str]]) -> DataFrame:
    """One DataFrame of (tbl, chk, n_violations) for a whole schema —
    the ANALYZE/dbt-test style report the per-check helpers above don't
    compose into. All checks are single aggregations or anti-join
    counts; nothing is collected. Deterministic, so it is itself
    oracle-checkable (registered as s12).

    fks: (child_tbl, child_key, parent_tbl, parent_key)
    uniques: (tbl, key); not_nulls: (tbl, col)
    """
    frames = []
    for tbl, key in uniques:
        frames.append(
            tables[tbl].agg(
                (F.count(F.lit(1)) - F.count_distinct(F.col(key)))
                .cast("bigint").alias("n_violations")
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(f"unique_{key}").alias("chk"),
                "n_violations",
            )
        )
    for tbl, col in not_nulls:
        frames.append(
            tables[tbl].agg(
                F.coalesce(F.sum(F.col(col).isNull().cast("bigint")), F.lit(0))
                .cast("bigint").alias("n_violations")
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(f"not_null_{col}").alias("chk"),
                "n_violations",
            )
        )
    for child, ckey, parent, pkey in fks:
        orphans = tables[child].join(
            tables[parent].select(F.col(pkey).alias(ckey)).distinct(),
            ckey,
            "left_anti",
        )
        frames.append(
            orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(child).alias("tbl"),
                F.lit(f"fk_{ckey}_to_{parent}").alias("chk"),
                "n_violations",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
