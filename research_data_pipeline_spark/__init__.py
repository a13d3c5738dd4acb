"""research_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capability surface of
``qetdr/research-data-pipeline`` (see /root/reference, SURVEY.md) as an
idiomatic Spark library: declarative DataFrame/SQL plans optimized by
Catalyst, plus the LLM-training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Nothing in here is a port: the reference delegates execution to
Postgres/Neo4j/pandas; this engine expresses every transformation,
enrichment, aggregation and query semantic natively on Spark.
"""

__version__ = "0.1.0"
