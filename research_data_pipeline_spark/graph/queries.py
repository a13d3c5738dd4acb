"""arXiv property-graph construction + the reference's Cypher query
surface as DataFrame functions (SURVEY §2.8).

Graph build parity (research_pipeline_dag.py:285-369):
- nodes: Author, Article, Journal, Category (uniqueness constraints →
  quality checks);
- AUTHORED = authorship rows; BELONGS_TO = article_category rows;
- COAUTHORS: Cypher CREATE per shared article, both directions — the
  multi-edge multiplicity is carried as n_shared weight (graph.build);
- PUBLISHED_IN: article⋈journal on ISSN (dag :364-369).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import co_occurrence_edges, vertices_from


def build_graph(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Vertex + typed-edge DataFrames from the star schema."""
    vertices = vertices_from(
        {
            "Author": (tables["author"], "author_id"),
            "Article": (tables["article"], "article_id"),
            "Journal": (tables["journal"], "journal_issn"),
            "Category": (tables["category"], "category_id"),
        }
    )
    authored = tables["authorship"].select(
        F.col("author_id").alias("src"), F.col("article_id").alias("dst")
    )
    belongs_to = tables["article_category"].select(
        F.col("article_id").alias("src"), F.col("category_id").alias("dst")
    )
    coauthors = co_occurrence_edges(
        tables["authorship"], item_col="article_id", actor_col="author_id",
        weight_col="n_shared",
    )
    published_in = (
        tables["article"]
        .join(tables["journal"], "journal_issn")
        .select(F.col("article_id").alias("src"), F.col("journal_issn").alias("dst"))
    )
    return {
        "vertices": vertices,
        "AUTHORED": authored,
        "BELONGS_TO": belongs_to,
        "COAUTHORS": coauthors,
        "PUBLISHED_IN": published_in,
    }


def label_counts(graph: dict[str, DataFrame]) -> DataFrame:
    """G1 (research_pipeline_dag.py:265-275): node counts per label."""
    return graph["vertices"].groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


def edge_counts(graph: dict[str, DataFrame]) -> DataFrame:
    """G2 (research_pipeline_dag.py:277-282)."""
    parts = []
    for rel in ["AUTHORED", "BELONGS_TO", "COAUTHORS", "PUBLISHED_IN"]:
        parts.append(
            graph[rel].select(F.lit(rel).alias("rel")).groupBy("rel").agg(
                F.count(F.lit(1)).alias("cnt")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ego_network(graph: dict[str, DataFrame], author_id: str) -> DataFrame:
    """G3 (README.md:296-311): 1-hop undirected COAUTHORS neighborhood.
    COAUTHORS carries both directions, so filtering src covers the
    undirected match."""
    return graph["COAUTHORS"].where(F.col("src") == author_id)


def papers_in_journal(
    graph: dict[str, DataFrame], journal: DataFrame, title: str
) -> DataFrame:
    """G4 (README.md:319-322): articles published in a named journal."""
    issns = journal.where(F.col("journal_title") == title).select(
        F.col("journal_issn").alias("dst")
    )
    return graph["PUBLISHED_IN"].join(F.broadcast(issns), "dst").select(
        F.col("src").alias("article_id")
    )


def articles_by_subdomain(
    graph: dict[str, DataFrame],
    article: DataFrame,
    category: DataFrame,
    subdom: str,
    min_cites: int,
) -> DataFrame:
    """G5 (README.md:330-333): articles in a subdomain with n_cites above
    a threshold (n_cites is a string column — DECIMAL cast, F10)."""
    cats = category.where(F.col("subdom") == subdom).select(
        F.col("category_id").alias("dst")
    )
    hot = article.where(F.col("n_cites").cast("decimal(38,6)") > min_cites).select(
        F.col("article_id").alias("src")
    )
    return graph["BELONGS_TO"].join(F.broadcast(cats), "dst").join(hot, "src").select(
        F.col("src").alias("article_id"), F.col("dst").alias("category_id")
    )


def coauthors_per_article(
    graph: dict[str, DataFrame], author_id: str
) -> DataFrame:
    """G6 (analytical_queries.ipynb cells 57-59): per article of the
    author, the list of co-authors (collect + unwind + collect →
    collect_list after the two-hop join)."""
    mine = graph["AUTHORED"].where(F.col("src") == author_id).select(
        F.col("dst").alias("article_id")
    )
    others = graph["AUTHORED"].where(F.col("src") != author_id).select(
        F.col("dst").alias("article_id"), F.col("src").alias("coauthor_id")
    )
    return (
        mine.join(others, "article_id")
        .groupBy("article_id")
        .agg(F.sort_array(F.collect_list("coauthor_id")).alias("coauthors"))
    )
