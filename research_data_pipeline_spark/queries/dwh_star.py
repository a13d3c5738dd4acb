"""The reference's four DWH analytics queries (README.md:184-283) under
the driver oracle, over a star schema derived deterministically from the
TPC-H test tables:

- authorship  := DISTINCT (l_orderkey → article_id, l_suppkey → author_id)
- article     := orders × customer (year, synthetic n_cites string,
                 journal_issn from the customer's nation)
- journal     := nation (issn, title)
- author      := per-supplier stats (total_pubs, SQL-rank, real h-index,
                 integer-division avg_cites)

The derivation is a fixed projection — what these rows put under the
hard driver signal is the DWH query SEMANTICS the reference pins
(computed LIMIT ``pct·COUNT(*)/100``, mode() order-by tie-break,
rank-ties-all-kept, Postgres integer division, TO_CHAR 'fm99%'); the
author-stats math itself is driver-verified separately (q05 h-index,
q06 pandas ranks) and pipeline-tested on FIXTURES-shaped data.

``pct=10`` (vs the reference's 0.01%) keeps the computed k nonzero at
test scale — k's *derivation* is identical.

Documented divergence (intentional, both engines agree with each other):
the reference's DWH Q2-Q4 wrap the final SELECT in a second outer
``ORDER BY final.rank LIMIT pct·COUNT(*)/100`` (README.md:193-283).
With rank() ties all kept, that outer LIMIT truncates an *unspecified*
subset of tied rows — non-deterministic output under the driver's
hash compare — so both the Spark queries and the oracles keep ALL tied
rows and drop the outer LIMIT, alongside the tie-break pinning already
noted above. Row counts can therefore exceed the reference's k when the
k-th rank is tied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranks import RANK_WINDOW_MAX_DISTINCT, spark_rank
from ..registry import REGISTRY
from ..tables import load
from .dwh import q1_top_publishers, q2_top_journals, q3_most_productive_year, q4_most_influential_year

_PCT = 10.0


def star_tables(
    spark: SparkSession,
    sf_dir: str,
    full_author: bool = False,
    authorship: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(author, authorship, article, journal) star schema from TPC-H.

    One shuffle family: authorship/cites/pubs all partition by author_id
    (suppliers — a dimension), article by order key; the author table is
    dimension-sized so its SQL rank uses the two-phase value-rank (no
    full-data single-partition window).

    Everything is LAZY — no cache, no driver count. Each DWH query is one
    action; the authorship distinct feeds several consumers inside that
    one plan, and AQE's stage reuse dedupes the identical scan+shuffle
    fragments. At 100 TB that is the only viable shape anyway: caching a
    fact-scale distinct pins executor memory, while reused exchanges are
    free.

    ``full_author`` adds the h-index window + avg-cites aggregation (a
    fact-scale shuffle each) — only dwh4 reads those columns, so the
    other queries skip that work entirely (column pruning can't remove a
    join that was already planned)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    if authorship is None:
        # layout probe (r13, decision documented at io/layout.py): prefer
        # the durable bucketed authorship store when one was built for
        # this dataset — the per-author aggregations below become
        # exchange-free (measured at sf10: dwh3 9.1×, dwh4 2.0×,
        # SCALE.md round-12) and the rows are identical by construction
        # (the store IS the distinct projection, materialized). Never
        # built implicitly: that's a fact-scale write a read path must
        # not hide. One cheap fs.exists when absent.
        from ..io.layout import probe_bucketed_authorship
        from ..operators.decisions import record

        authorship = probe_bucketed_authorship(spark, sf_dir)
        record(
            "star_authorship",
            path="bucketed_store" if authorship is not None else "raw_scan",
        )
        if authorship is None:
            l = load(spark, sf_dir, "lineitem")
            authorship = l.select(
                F.col("l_orderkey").alias("article_id"),
                F.col("l_suppkey").alias("author_id"),
            ).distinct()
    # else: caller supplies a materialized authorship — typically a table
    # bucketed on author_id (io.layout.write_bucketed), which makes the
    # per-author aggregation below exchange-free (tests/test_layout.py
    # proves the Exchange disappears and measures the shuffle-bytes win)
    article = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("o_orderkey").alias("article_id"),
            F.year("o_orderdate").cast("bigint").alias("year"),
            (F.col("o_custkey") % 100).cast("string").alias("n_cites"),
            F.concat(F.lit("J-"), F.col("c_nationkey").cast("string")).alias("journal_issn"),
        )
    )
    journal = n.select(
        F.concat(F.lit("J-"), F.col("n_nationkey").cast("string")).alias("journal_issn"),
        F.col("n_name").alias("journal_title"),
    )
    if full_author:
        # Fused single-pass author stats: every authorship row matches an
        # article (l_orderkey ⊆ o_orderkey), so total_pubs == per-author
        # cites-row count and pubs/h-index/avg-cites all come out of ONE
        # row_number window + ONE aggregation — the groupBy reuses the
        # window's author_id partitioning (no extra exchange), replacing
        # the pubs ⋈ hindex ⋈ avgc three-aggregation join chain. Same
        # h-index semantics as operators.hindex (fused here so the three
        # stats share the window's shuffle).
        from pyspark.sql import Window as W

        cites = authorship.join(
            article.select("article_id", F.col("n_cites").cast("bigint").alias("cites")),
            "article_id",
        ).select("author_id", "cites")
        w = W.partitionBy("author_id").orderBy(F.col("cites").desc())
        base = (
            cites.withColumn("_rn", F.row_number().over(w))
            .groupBy("author_id")
            .agg(
                F.count(F.lit(1)).alias("total_pubs"),
                F.coalesce(
                    F.max(F.when(F.col("cites") >= F.col("_rn"), F.col("_rn"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("hindex"),
                F.floor(F.sum("cites") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("avg_cites"),
            )
        )
    else:
        base = authorship.groupBy("author_id").agg(
            F.count(F.lit(1)).alias("total_pubs")
        )
    author = spark_rank(
        base, "total_pubs", out_col="rank_total_pubs",
        distinct_hint=RANK_WINDOW_MAX_DISTINCT,  # pub counts: dictionary-sized
    )
    return author, authorship, article, journal


_STAR_CTES = f"""
    authorship AS (
        SELECT DISTINCT l_orderkey AS article_id, l_suppkey AS author_id
        FROM lineitem
    ),
    article AS (
        SELECT o_orderkey AS article_id,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
               CAST(o_custkey % 100 AS VARCHAR) AS n_cites,
               'J-' || CAST(c_nationkey AS VARCHAR) AS journal_issn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    journal AS (
        SELECT 'J-' || CAST(n_nationkey AS VARCHAR) AS journal_issn,
               n_name AS journal_title
        FROM nation
    ),
    cites AS (
        SELECT a.author_id, CAST(ar.n_cites AS BIGINT) AS cites
        FROM authorship a JOIN article ar ON a.article_id = ar.article_id
    ),
    pubs AS (SELECT author_id, COUNT(*) AS total_pubs FROM authorship GROUP BY 1),
    hind AS (
        SELECT author_id,
               CAST(COALESCE(MAX(CASE WHEN cites >= rn THEN rn END), 0) AS BIGINT)
                   AS hindex
        FROM (SELECT author_id, cites,
                     ROW_NUMBER() OVER (PARTITION BY author_id
                                        ORDER BY cites DESC) AS rn
              FROM cites)
        GROUP BY 1
    ),
    avgc AS (
        SELECT author_id,
               CAST(FLOOR(CAST(SUM(cites) AS BIGINT) / (COUNT(*) * 1.0)) AS BIGINT)
                   AS avg_cites
        FROM cites GROUP BY 1
    ),
    author AS (
        SELECT p.author_id, p.total_pubs,
               CAST(RANK() OVER (ORDER BY p.total_pubs DESC) AS BIGINT)
                   AS rank_total_pubs,
               h.hindex, av.avg_cites
        FROM pubs p
        JOIN hind h ON p.author_id = h.author_id
        JOIN avgc av ON p.author_id = av.author_id
    ),
    topk AS (
        SELECT author_id, total_pubs, rank_total_pubs, hindex, avg_cites
        FROM (SELECT author.*,
                     ROW_NUMBER() OVER (ORDER BY rank_total_pubs, author_id) AS _rn
              FROM author)
        WHERE _rn <= (SELECT CAST(FLOOR(COUNT(*) * {_PCT} / 100) AS BIGINT)
                      FROM author)
    )
"""

_DWH1_ORACLE = f"""
    WITH {_STAR_CTES}
    SELECT author_id, rank_total_pubs AS "rank", total_pubs AS publications
    FROM topk
"""


@REGISTRY.add("dwh1_top_publishers", _DWH1_ORACLE, "dwh", "topk")
def dwh1_top_publishers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DWH Q1 (README.md:185-188): top pct% authors by publication count,
    computed-LIMIT semantics (W3)."""
    author, *_ = star_tables(spark, sf_dir)
    return q1_top_publishers(author, pct=_PCT)


_DWH2_ORACLE = f"""
    WITH {_STAR_CTES},
    counted AS (
        SELECT t.author_id, t.rank_total_pubs AS "rank",
               t.total_pubs AS publications, j.journal_title,
               COUNT(*) AS number
        FROM topk t
        JOIN authorship au ON t.author_id = au.author_id
        JOIN article ar ON au.article_id = ar.article_id
        JOIN journal j ON ar.journal_issn = j.journal_issn
        GROUP BY 1, 2, 3, 4
    )
    SELECT author_id, "rank", publications,
           journal_title AS top_journal,
           CAST(CAST(FLOOR(number * 100 / publications) AS INTEGER) AS VARCHAR)
               || '%' AS percentage_of_all_publications
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY author_id
                                       ORDER BY number DESC, journal_title ASC) AS _rn
          FROM counted)
    WHERE _rn = 1
"""


@REGISTRY.add("dwh2_top_journals", _DWH2_ORACLE, "dwh", "mode")
def dwh2_top_journals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DWH Q2 (README.md:193-220): each top author's modal journal —
    mode() order-by tie-break (A6), integer division + 'fm99%' (F10/F11)."""
    author, authorship, article, journal = star_tables(spark, sf_dir)
    return q2_top_journals(author, authorship, article, journal, pct=_PCT)


_DWH3_ORACLE = f"""
    WITH {_STAR_CTES},
    per_year AS (
        SELECT t.author_id, t.rank_total_pubs AS "rank", ar.year,
               COUNT(*) AS pub,
               CAST(FLOOR(CAST(SUM(CAST(ar.n_cites AS DECIMAL(38,6))) AS BIGINT)
                          / (COUNT(*) * 1.0)) AS BIGINT) AS avg_cites
        FROM topk t
        JOIN authorship au ON t.author_id = au.author_id
        JOIN article ar ON au.article_id = ar.article_id
        GROUP BY 1, 2, 3
    )
    SELECT author_id, "rank", year AS most_influential_year,
           pub AS count_of_pub, avg_cites
    FROM (SELECT *, RANK() OVER (PARTITION BY author_id
                                 ORDER BY avg_cites DESC) AS _rk
          FROM per_year)
    WHERE _rk = 1
"""


@REGISTRY.add("dwh3_most_productive_year", _DWH3_ORACLE, "dwh", "greatest-per-group")
def dwh3_most_productive_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DWH Q3 (README.md:226-250): per top author, the year with the
    highest integer-division avg cites; rank-ties ALL kept (J4)."""
    author, authorship, article, _ = star_tables(spark, sf_dir)
    return q3_most_productive_year(author, authorship, article, pct=_PCT)


_DWH4_ORACLE = f"""
    WITH {_STAR_CTES},
    per_year AS (
        SELECT t.author_id, t.rank_total_pubs AS "rank", ar.year,
               CAST(SUM(t.hindex) AS DOUBLE) AS hindex,
               CAST(SUM(t.total_pubs) AS DOUBLE) AS pub,
               CAST(SUM(t.avg_cites) AS BIGINT) AS avg_cites
        FROM topk t
        JOIN authorship au ON t.author_id = au.author_id
        JOIN article ar ON au.article_id = ar.article_id
        GROUP BY 1, 2, 3
    )
    SELECT author_id, "rank", hindex, pub, avg_cites, year
    FROM (SELECT *, RANK() OVER (PARTITION BY author_id
                                 ORDER BY hindex DESC) AS _rk
          FROM per_year)
    WHERE _rk = 1
"""


@REGISTRY.add("dwh4_most_influential_year", _DWH4_ORACLE, "dwh", "greatest-per-group")
def dwh4_most_influential_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DWH Q4 (README.md:255-281): per top author, the year with max
    summed h-index (author-constant h-index summed over that year's
    authorship rows — reproduced literally)."""
    author, authorship, article, _ = star_tables(spark, sf_dir, full_author=True)
    return q4_most_influential_year(author, authorship, article, pct=_PCT)
