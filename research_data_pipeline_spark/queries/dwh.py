"""The reference's four DWH analytics queries (README.md:184-283),
re-expressed as DataFrame plans over the star schema.

Postgres-specific semantics reproduced deliberately:
- computed LIMIT ``0.01 * COUNT(*) / 100`` (W3) → driver-side scalar k;
- ``mode() WITHIN GROUP (ORDER BY x)`` (A6) → count + row_number with the
  order-by tie-break;
- the null-rejecting self-LEFT-JOIN greatest-per-group (J4) keeps ALL
  tied rows → rank()==1, not row_number;
- ``(sum(x::DECIMAL)::int) / count`` integer division (A3/F10);
- ``TO_CHAR(x,'fm99%')`` (F11).

Deterministic divergence note: Postgres ``ORDER BY rank LIMIT k`` breaks
rank-ties arbitrarily; these implementations pin (rank, author_id) so
results are stable under retries — documented rather than replicated
nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.core import pct_string


def _top_authors(author: DataFrame, extra_cols: list[str], pct: float = 0.01) -> DataFrame:
    """Top pct% by rank_total_pubs with computed k (README.md:188).

    k stays IN the plan as a broadcast scalar aggregate — a driver-side
    ``count()`` would force the whole author build to execute twice (once
    for k, once for the query) or demand a cache; the scalar cross-join
    keeps each DWH query a single action with no cached state to release.
    The row_number window is global but runs over the dimension-sized
    author table (pinned by (rank, author_id) — same tie-break as the
    oracle's topk CTE), never over facts.
    """
    k = author.agg(
        F.floor(F.count(F.lit(1)) * pct / 100).cast("bigint").alias("_k")
    )
    # single-partition window BY DESIGN: author is dimension-sized,
    # never facts
    w = W.orderBy("rank_total_pubs", "author_id")
    return (
        author.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(k))
        .where(F.col("_rn") <= F.col("_k"))
        .select("author_id", F.col("rank_total_pubs").alias("rank"), *extra_cols)
    )


def q1_top_publishers(author: DataFrame, pct: float = 0.01) -> DataFrame:
    """DWH Q1 (README.md:185-188): top authors by publication count."""
    return _top_authors(author, ["total_pubs"], pct).select(
        "author_id", "rank", F.col("total_pubs").alias("publications")
    )


def q2_top_journals(
    author: DataFrame, authorship: DataFrame, article: DataFrame, journal: DataFrame,
    pct: float = 0.01,
) -> DataFrame:
    """DWH Q2 (README.md:193-220): each top author's modal journal and its
    share of their publications.

    mode() = most-published journal, ties to the alphabetically first
    (Postgres order-by tie-break); the share uses Postgres integer
    division (count*100/publications)::int then 'fm99%' formatting.
    """
    top = _top_authors(author, ["total_pubs"], pct).withColumnRenamed(
        "total_pubs", "publications"
    )
    counted = (
        top.join(authorship, "author_id")
        .join(article.select("article_id", "journal_issn"), "article_id")
        .join(journal.select("journal_issn", "journal_title"), "journal_issn")
        .groupBy("author_id", "rank", "publications", "journal_title")
        .agg(F.count(F.lit(1)).alias("number"))
    )
    w = W.partitionBy("author_id").orderBy(F.col("number").desc(), F.col("journal_title").asc())
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "author_id",
            "rank",
            "publications",
            F.col("journal_title").alias("top_journal"),
            pct_string(
                F.floor(F.col("number") * 100 / F.col("publications"))
            ).alias("percentage_of_all_publications"),
        )
        .orderBy("rank", "author_id")
    )


def _per_author_year(
    author: DataFrame, authorship: DataFrame, article: DataFrame, pct: float,
    extra_author_cols: list[str] | None = None,
) -> DataFrame:
    top = _top_authors(author, extra_author_cols or [], pct)
    return (
        top.join(authorship, "author_id")
        .join(
            article.select(
                "article_id", "year", F.col("n_cites").cast("decimal(38,6)").alias("_cites")
            ),
            "article_id",
        )
    )


def q3_most_productive_year(
    author: DataFrame, authorship: DataFrame, article: DataFrame, pct: float = 0.01
) -> DataFrame:
    """DWH Q3 (README.md:226-250): per top author, the year with the
    highest integer-division avg cites; ties all kept (J4 anti-join)."""
    per_year = (
        _per_author_year(author, authorship, article, pct)
        .groupBy("author_id", "rank", "year")
        .agg(
            F.count("year").alias("pub"),
            # (sum(n_cites::DECIMAL)::int) / count — two integer steps
            F.floor(F.sum("_cites").cast("long") / F.count("year")).cast("long").alias("avg_cites"),
        )
    )
    w = W.partitionBy("author_id").orderBy(F.col("avg_cites").desc())
    return (
        per_year.withColumn("_rk", F.rank().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "author_id", "rank",
            F.col("year").alias("most_influential_year"),
            F.col("pub").alias("count_of_pub"),
            "avg_cites",
        )
        .orderBy("rank", "author_id", "most_influential_year")
    )


def q4_most_influential_year(
    author: DataFrame, authorship: DataFrame, article: DataFrame, pct: float = 0.01
) -> DataFrame:
    """DWH Q4 (README.md:255-281): per top author, the year with max
    summed h-index (the reference sums the author-constant h-index over
    that year's authorship rows — reproduced literally)."""
    top = _top_authors(author, ["total_pubs", "hindex", "avg_cites"], pct)
    per_year = (
        top.join(authorship, "author_id")
        .join(article.select("article_id", "year"), "article_id")
        .groupBy("author_id", "rank", "year")
        .agg(
            F.sum("hindex").cast("double").alias("hindex_sum"),
            F.sum("total_pubs").cast("double").alias("pub"),
            F.sum("avg_cites").alias("avg_cites_sum"),
        )
        .select(
            "author_id", "rank", "year",
            F.col("hindex_sum").alias("hindex"),
            "pub",
            F.col("avg_cites_sum").alias("avg_cites"),
        )
    )
    w = W.partitionBy("author_id").orderBy(F.col("hindex").desc())
    return (
        per_year.withColumn("_rk", F.rank().over(w))
        .where(F.col("_rk") == 1)
        .select("author_id", "rank", "hindex", "pub", "avg_cites", "year")
        .orderBy("rank", "author_id", "year")
    )
