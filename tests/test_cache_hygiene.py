"""Library callers must not leak cached plans: every operator that takes
an internal ``.cache()`` (dwh star tables, IVF assignment) releases it
before returning, with the result eagerly localCheckpoint-ed so the
release is safe. Asserted via the SQL cache manager — empty after each
query WITHOUT bench.py's manual ``clearCache``."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dwh_queries_release_star_caches(spark, sf_dir):
    from research_data_pipeline_spark.queries.dwh_star import (
        dwh1_top_publishers,
        dwh4_most_influential_year,
    )

    spark.catalog.clearCache()  # clean slate
    assert dwh1_top_publishers(spark, sf_dir).count() >= 0
    assert _sql_cache_empty(spark), "dwh1 left cached plans behind"
    assert dwh4_most_influential_year(spark, sf_dir).count() >= 0
    assert _sql_cache_empty(spark), "dwh4 left cached plans behind"


def test_ann_ivf_releases_assignment_cache(spark, sf_dir):
    from research_data_pipeline_spark.operators.similarity import ann_topk_ivf
    from research_data_pipeline_spark.tables import load

    spark.catalog.clearCache()
    emb = load(spark, sf_dir, "embeddings")
    out = ann_topk_ivf(emb, "vec_id", "embedding", k=3)
    assert out.count() > 0
    assert _sql_cache_empty(spark), "ann_topk_ivf left cached plans behind"


def test_similarity_rejects_non_integral_ids(spark, sf_dir):
    import pytest

    from research_data_pipeline_spark.operators.similarity import (
        ann_topk_bruteforce,
        cosine_pairs,
    )
    from research_data_pipeline_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "sid", F.col("vec_id").cast("string")
    )
    with pytest.raises(TypeError, match="integral"):
        cosine_pairs(emb, "sid", "embedding", threshold=0.9)
    with pytest.raises(TypeError, match="integral"):
        ann_topk_bruteforce(emb, "sid", "embedding", k=3)


def test_text_dedup_operators_release_caches(spark, sf_dir):
    from research_data_pipeline_spark.operators import text_dedup as dd
    from research_data_pipeline_spark.tables import load

    spark.catalog.clearCache()
    d = load(spark, sf_dir, "documents")
    assert dd.minhash_lsh_pairs(d, "doc_id", "text").count() >= 0
    assert _sql_cache_empty(spark), "minhash_lsh_pairs left cached plans"
    assert dd.simhash_pairs(d, "doc_id", "text").count() >= 0
    assert _sql_cache_empty(spark), "simhash_pairs left cached plans"
    assert dd.ngram_jaccard_pairs(d, "doc_id", "text").count() >= 0
    assert _sql_cache_empty(spark), "ngram_jaccard_pairs left cached plans"


def test_ivf_assign_table_shared_across_consumers(spark, sf_dir):
    """d63/d64 read ONE materialized assignment table per (session,
    dataset): the cache holds exactly one entry after both run, both
    consumers see the same object, and the SQL cache manager stays
    empty (localCheckpoint, not .cache())."""
    from research_data_pipeline_spark.queries import docs

    docs._IVF_ASSIGN_CACHE.clear()
    spark.catalog.clearCache()
    t1 = docs._ivf_assign_table(spark, sf_dir)
    assert docs.d63_ivf_balance_audit(spark, sf_dir).count() > 0
    assert docs.d64_embedding_outliers(spark, sf_dir).count() > 0
    t2 = docs._ivf_assign_table(spark, sf_dir)
    assert t1 is t2, "assignment pass rebuilt within one session/dataset"
    assert len(docs._IVF_ASSIGN_CACHE) == 1
    assert _sql_cache_empty(spark)


def test_co_edge_table_shared_and_row_identical(spark, sf_dir):
    """g05-g17/q08/q16 read ONE materialized co-supplier edge table per
    (session, dataset): single cache entry shared across consumers, SQL
    cache manager stays empty (localCheckpoint, not .cache()), and the
    memoized rows are exactly a fresh co_occurrence_edges build."""
    from research_data_pipeline_spark.graph.build import co_occurrence_edges
    from research_data_pipeline_spark.queries import graph_analytics as ga
    from research_data_pipeline_spark.tables import load

    ga._CO_EDGE_CACHE.clear()
    spark.catalog.clearCache()
    t1 = ga._co_edge_table(spark, sf_dir)
    assert ga.g05_connected_components(spark, sf_dir).count() > 0
    t2 = ga._co_edge_table(spark, sf_dir)
    assert t1 is t2, "co-edge table rebuilt within one session/dataset"
    assert len(ga._CO_EDGE_CACHE) == 1
    assert _sql_cache_empty(spark)
    fresh = co_occurrence_edges(
        load(spark, sf_dir, "lineitem"),
        item_col="l_orderkey",
        actor_col="l_suppkey",
    )
    assert t1.exceptAll(fresh).isEmpty() and fresh.exceptAll(t1).isEmpty()
