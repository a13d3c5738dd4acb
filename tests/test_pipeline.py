"""End-to-end + differential tests of the reference-parity pipeline.

The author-statistics job and the DWH queries are checked against an
independent DuckDB SQL formulation of the documented semantics over the
same inputs — differential testing of the hard math (medians, h-index,
pandas ranks, two-hop distincts, mode tie-breaks, integer division).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from research_data_pipeline_spark.quality import run_star_schema_checks
from research_data_pipeline_spark.transforms.pipeline import run_pipeline

from .fixtures import cwts_rows, fake_fetcher, names_genders_rows, write_arxiv_raw


@pytest.fixture(scope="session")
def raw_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("arxiv") / "arxiv_raw.jsonl"
    write_arxiv_raw(str(p))
    return str(p)


@pytest.fixture(scope="session")
def pipeline_tables(spark, raw_path):
    names_genders = spark.createDataFrame(
        names_genders_rows(), "first_name string, alph_value string, gender string, prob string"
    )
    cwts = spark.createDataFrame(
        cwts_rows(),
        "source_title string, print_issn string, electronic_issn string, snip double, year int",
    ).where(F.col("year") == 2021)
    tables = run_pipeline(spark, raw_path, names_genders, cwts, fake_fetcher)
    return {k: v.cache() for k, v in tables.items()}


def test_pipeline_produces_all_tables(pipeline_tables):
    for name in ["article", "journal", "authorship", "author", "article_category", "category"]:
        assert pipeline_tables[name].count() > 0, f"{name} is empty"


def test_quality_checks_pass(pipeline_tables):
    results = run_star_schema_checks(pipeline_tables)
    failures = [r for r in results if not r.ok]
    assert not failures, failures


def test_ingestion_edge_cases(spark, raw_path):
    from research_data_pipeline_spark.transforms.ingestion import extract_tables

    t = extract_tables(spark, raw_path)
    cats = {r.categories for r in spark.read.json(raw_path).select("categories").collect()}
    arts = t["article"].join(
        spark.read.json(raw_path).select(
            F.col("id").alias("article_id"), "categories"
        ).dropDuplicates(["article_id"]),
        "article_id",
    )
    kept_cats = {r.categories for r in arts.select("categories").distinct().collect()}
    # 'physics' excluded even when a cs. category is present
    assert "physics.optics cs.AI" not in kept_cats
    # wildcard regex keeps 'ics.yy' (pandas str.contains('cs.') parity)
    assert "ics.yy" in kept_cats
    # pure math excluded
    assert "math.ST" not in kept_cats

    # dot-less category code → null subdom
    adap = t["category"].where(F.col("category_id") == "adap-org").collect()
    assert adap and adap[0].subdom is None and adap[0].superdom == "adap-org"

    # author_id: cleaned last + first initial; unicode folded
    ids = {r.author_id for r in t["author"].select("author_id").distinct().collect()}
    assert any(a.startswith("OBrien") for a in ids)  # punctuation stripped
    assert all(len(a) >= 4 for a in ids)  # short ids removed
    # unaccented: Sinivälï → Sinivali → initial S; Müller → Muller
    assert any(a.startswith("Muller") for a in ids)

    # duplicate article ids deduplicated
    assert (
        t["article"].groupBy("article_id").count().where(F.col("count") > 1).count() == 0
    )


def _register(con, tables):
    for name, df in tables.items():
        con.register(name, df.toPandas())


AUTHOR_STATS_ORACLE = """
WITH facts AS (
    SELECT au.author_id, au.article_id,
           CAST(ar.n_cites AS DOUBLE) AS cites, ar.n_authors
    FROM authorship au JOIN article ar ON au.article_id = ar.article_id
), base AS (
    SELECT author_id, COUNT(*) AS total_pubs,
           CAST(SUM(cites) AS BIGINT) AS total_cites,
           MEDIAN(n_authors - 1) AS med_coauthors
    FROM facts GROUP BY author_id
), ranked AS (
    SELECT author_id, cites,
           ROW_NUMBER() OVER (PARTITION BY author_id
                              ORDER BY cites DESC, article_id) AS rn
    FROM facts
), hid AS (
    SELECT author_id,
           CAST(COALESCE(MAX(CASE WHEN cites >= rn THEN rn END), 0) AS BIGINT) AS hindex
    FROM ranked GROUP BY author_id
), co AS (
    SELECT a.author_id, COUNT(DISTINCT b.author_id) - 1 AS n_unique_coauthors
    FROM authorship a JOIN authorship b ON a.article_id = b.article_id
    GROUP BY a.author_id
)
SELECT b.author_id, b.total_pubs, b.total_cites,
       ROUND(b.total_cites * 1.0 / b.total_pubs, 3) AS avg_cites,
       b.med_coauthors, co.n_unique_coauthors, hid.hindex
FROM base b JOIN hid USING (author_id) JOIN co USING (author_id)
"""


def test_author_stats_vs_duckdb(spark, pipeline_tables):
    got = (
        pipeline_tables["author"]
        .select(
            "author_id", "total_pubs", "total_cites", "avg_cites",
            "med_coauthors", "n_unique_coauthors", "hindex",
        )
        .toPandas()
        .sort_values("author_id", ignore_index=True)
    )
    con = duckdb.connect()
    _register(con, {k: pipeline_tables[k] for k in ["authorship", "article"]})
    exp = (
        con.execute(AUTHOR_STATS_ORACLE).fetchdf().sort_values("author_id", ignore_index=True)
    )
    # the Spark author table is restricted to authors surviving dedup →
    # compare on the intersection (oracle has every authorship author)
    exp = exp[exp.author_id.isin(got.author_id)].reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ["total_pubs", "total_cites", "hindex", "n_unique_coauthors"]:
        assert (got[col].astype(int) == exp[col].astype(int)).all(), col
    for col in ["avg_cites", "med_coauthors"]:
        assert (got[col] - exp[col]).abs().max() < 1e-9, col


def test_pandas_rank_parity_vs_pandas(pipeline_tables):
    """rank_* columns must equal pandas rank(ascending=0).astype(int)."""
    pdf = pipeline_tables["author"].toPandas()
    for metric, col in [
        ("total_pubs", "rank_total_pubs"),
        ("total_cites", "rank_total_cites"),
        ("avg_cites", "rank_avg_cites"),
        ("hindex", "rank_hindex"),
    ]:
        expected = pdf[metric].rank(ascending=False).astype(int)
        assert (pdf[col] == expected).all(), col


def test_dwh_queries_vs_duckdb(spark, pipeline_tables):
    from research_data_pipeline_spark.queries import dwh

    t = pipeline_tables
    con = duckdb.connect()
    _register(con, t)
    n = t["author"].count()
    k = int(n * 0.05)  # larger pct so small fixture yields k ≥ 1
    assert k >= 1

    q1 = dwh.q1_top_publishers(t["author"], pct=5.0).toPandas()
    e1 = con.execute(
        f"""SELECT author_id, rank_total_pubs AS rank, total_pubs AS publications
            FROM author ORDER BY rank_total_pubs, author_id LIMIT {k}"""
    ).fetchdf()
    assert q1.sort_values(["rank", "author_id"], ignore_index=True).equals(
        e1.sort_values(["rank", "author_id"], ignore_index=True)
    )

    q2 = dwh.q2_top_journals(
        t["author"], t["authorship"], t["article"], t["journal"], pct=5.0
    ).toPandas()
    e2 = con.execute(
        f"""
        WITH top AS (
            SELECT author_id, rank_total_pubs AS rank, total_pubs AS publications
            FROM author ORDER BY rank_total_pubs, author_id LIMIT {k}
        ), counted AS (
            SELECT top.author_id, top.rank, top.publications, j.journal_title,
                   COUNT(*) AS number
            FROM top
            JOIN authorship au ON top.author_id = au.author_id
            JOIN article ar ON au.article_id = ar.article_id
            JOIN journal j ON ar.journal_issn = j.journal_issn
            GROUP BY ALL
        )
        SELECT author_id, rank, publications, journal_title AS top_journal,
               CAST(CAST(FLOOR(number * 100 / publications) AS INT) AS VARCHAR) || '%'
                   AS percentage_of_all_publications
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY author_id
                       ORDER BY number DESC, journal_title) AS rn FROM counted)
        WHERE rn = 1
        """
    ).fetchdf()
    key = ["author_id"]
    assert q2.sort_values(key, ignore_index=True)[sorted(q2.columns)].equals(
        e2.sort_values(key, ignore_index=True)[sorted(e2.columns)]
    )

    q3 = dwh.q3_most_productive_year(
        t["author"], t["authorship"], t["article"], pct=5.0
    ).toPandas()
    e3 = con.execute(
        f"""
        WITH top AS (
            SELECT author_id, rank_total_pubs AS rank
            FROM author ORDER BY rank_total_pubs, author_id LIMIT {k}
        ), per_year AS (
            SELECT top.author_id, top.rank, ar.year, COUNT(ar.year) AS pub,
                   CAST(SUM(CAST(ar.n_cites AS DECIMAL(38,6))) AS BIGINT) // COUNT(ar.year)
                       AS avg_cites
            FROM top
            JOIN authorship au ON top.author_id = au.author_id
            JOIN article ar ON au.article_id = ar.article_id
            GROUP BY ALL
        )
        SELECT author_id, rank, year AS most_influential_year, pub AS count_of_pub, avg_cites
        FROM (SELECT *, RANK() OVER (PARTITION BY author_id ORDER BY avg_cites DESC) rk
              FROM per_year)
        WHERE rk = 1
        """
    ).fetchdf()
    key3 = ["author_id", "most_influential_year"]
    assert q3.sort_values(key3, ignore_index=True)[sorted(q3.columns)].astype(str).equals(
        e3.sort_values(key3, ignore_index=True)[sorted(e3.columns)].astype(str)
    )

    q4 = dwh.q4_most_influential_year(
        t["author"], t["authorship"], t["article"], pct=5.0
    ).toPandas()
    e4 = con.execute(
        f"""
        WITH top AS (
            SELECT author_id, rank_total_pubs AS rank, total_pubs, hindex, avg_cites
            FROM author ORDER BY rank_total_pubs, author_id LIMIT {k}
        ), per_year AS (
            SELECT top.author_id, top.rank, ar.year,
                   CAST(SUM(top.hindex) AS DOUBLE) AS hindex,
                   CAST(SUM(top.total_pubs) AS DOUBLE) AS pub,
                   SUM(top.avg_cites) AS avg_cites
            FROM top
            JOIN authorship au ON top.author_id = au.author_id
            JOIN article ar ON au.article_id = ar.article_id
            GROUP BY ALL
        )
        SELECT author_id, rank, hindex, pub, avg_cites, year
        FROM (SELECT *, RANK() OVER (PARTITION BY author_id ORDER BY hindex DESC) rk
              FROM per_year)
        WHERE rk = 1
        """
    ).fetchdf()
    key4 = ["author_id", "year"]
    g4 = q4.sort_values(key4, ignore_index=True)[sorted(q4.columns)]
    x4 = e4.sort_values(key4, ignore_index=True)[sorted(e4.columns)]
    assert len(g4) == len(x4)
    for c in g4.columns:
        if g4[c].dtype.kind == "f":
            assert (g4[c] - x4[c]).abs().max() < 1e-9, c
        else:
            assert (g4[c].astype(str) == x4[c].astype(str)).all(), c


def test_graph_build_and_queries(pipeline_tables):
    from research_data_pipeline_spark.graph import queries as gq

    g = gq.build_graph(pipeline_tables)
    lc = {r.label: r.cnt for r in gq.label_counts(g).collect()}
    assert lc["Author"] == pipeline_tables["author"].count()
    assert lc["Article"] == pipeline_tables["article"].count()

    # COAUTHORS weight = number of shared articles (multiplicity, G7) and
    # both directions present
    co = g["COAUTHORS"].cache()
    pair = co.orderBy(F.col("n_shared").desc(), "src", "dst").first()
    if pair:
        rev = co.where((F.col("src") == pair.dst) & (F.col("dst") == pair.src)).first()
        assert rev is not None and rev.n_shared == pair.n_shared

    # ego network of the most-connected author
    hub = co.groupBy("src").count().orderBy(F.col("count").desc(), "src").first().src
    ego = gq.ego_network(g, hub)
    assert ego.count() > 0
    assert ego.where(F.col("src") != hub).count() == 0

    # PUBLISHED_IN joins article→journal
    assert g["PUBLISHED_IN"].count() == pipeline_tables["article"].where(
        F.col("journal_issn").isNotNull()
    ).count()


def test_quality_report_counts_violations_on_dirty_data(spark):
    """The s12 report's non-zero paths: dup keys, nulls, FK orphans all
    counted exactly."""
    from research_data_pipeline_spark.quality import quality_report

    parent = spark.createDataFrame([(1, "a"), (2, "b"), (2, "c")],
                                   "pk bigint, v string")
    child = spark.createDataFrame(
        [(1, None), (1, 5.0), (9, 1.0), (8, None)], "fk bigint, x double"
    )
    out = {
        (r.tbl, r.chk): r.n_violations
        for r in quality_report(
            {"p": parent, "c": child},
            fks=[("c", "fk", "p", "pk")],
            uniques=[("p", "pk")],
            not_nulls=[("c", "x")],
        ).collect()
    }
    assert out[("p", "unique_pk")] == 1       # 3 rows, 2 distinct
    assert out[("c", "not_null_x")] == 2
    assert out[("c", "fk_fk_to_p")] == 2      # fk 9 and 8 orphaned


def test_checkpointed_pipeline_resumes_after_crash(spark, raw_path, tmp_path):
    """Stage-checkpointed pipeline: a crash during enrichment reruns ONLY
    the missing stages — the ingest checkpoints survive and the fetch is
    not repeated once the enriched checkpoint exists."""
    import os

    from research_data_pipeline_spark.transforms.pipeline import (
        run_pipeline,
        run_pipeline_checkpointed,
    )
    from .fixtures import fake_fetcher

    names_genders = spark.createDataFrame(
        names_genders_rows(),
        "first_name string, alph_value string, gender string, prob string",
    )
    cwts = spark.createDataFrame(
        cwts_rows(),
        "source_title string, print_issn string, electronic_issn string, "
        "snip double, year int",
    ).where(F.col("year") == 2021)
    ckpt = str(tmp_path / "ckpt")
    log = tmp_path / "fetchlog"
    log.mkdir()
    log_dir = str(log)  # fetchers run on executors: count via marker files

    def dying_fetcher(dois):
        raise RuntimeError("api down")

    def counting_fetcher(dois):
        for d in dois:
            open(os.path.join(log_dir, d.replace("/", "_")), "w").close()
        return fake_fetcher(dois)

    with pytest.raises(Exception):
        run_pipeline_checkpointed(
            spark, raw_path, names_genders, cwts, dying_fetcher, ckpt
        )
    # ingest checkpoints committed before the crash
    assert os.path.exists(f"{ckpt}/raw_article/_SUCCESS")
    assert not os.path.exists(f"{ckpt}/enriched/_SUCCESS")

    out = run_pipeline_checkpointed(
        spark, raw_path, names_genders, cwts, counting_fetcher, ckpt
    )
    fetches_first_complete = len(os.listdir(log_dir))
    assert fetches_first_complete > 1  # the resume actually fetched

    # third run: everything checkpointed — zero new fetches, same tables
    out2 = run_pipeline_checkpointed(
        spark, raw_path, names_genders, cwts, counting_fetcher, ckpt
    )
    assert len(os.listdir(log_dir)) == fetches_first_complete
    plain = run_pipeline(spark, raw_path, names_genders, cwts, fake_fetcher)
    for name in ("article", "journal", "authorship", "author"):
        assert sorted(map(tuple, out2[name].collect())) == sorted(
            map(tuple, plain[name].collect())
        ), name
