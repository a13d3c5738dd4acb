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
