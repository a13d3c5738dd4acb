"""Augmentation stage: external enrichment re-expressed for Spark.

Reference behavior being reproduced (citations into /root/reference):
- Crossref REST enrichment of article type / citation count / ISSN,
  sequential GETs at ~2.5 rec/s with CSV checkpoints
  (augmentations.py:10-57, final_tables.py:29-41);
- CWTS journal-indicator lookup with the print-ISSN-wins quirk
  (augmentations.py:96-123);
- first-name → gender broadcast lookup (final_tables.py:117-121).

Spark-first: enrichment is ``mapInPandas`` with a pluggable fetcher —
each partition batches its HTTP calls (rate-limit lives in the fetcher),
so throughput scales with executors instead of a single driver loop, and
a failed partition retries idempotently. Tests inject a deterministic
fake fetcher; the live implementation is
``http_fetcher.RateLimitedHttpFetcher`` (stdlib urllib, token-bucket
throttle, retry/backoff — exercised against a real local HTTP server in
tests/test_http_fetcher.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fetcher: list[doi] -> {doi: (type, n_cites, issn|None)}
Fetcher = Callable[[list[str]], dict[str, tuple[str, int, str | None]]]


def enrich_articles(
    article: DataFrame, fetcher: Fetcher, batch_size: int = 200
) -> DataFrame:
    """Fill type / n_cites / journal_issn by DOI where type is missing
    (augmentations.py:10-57: only rows whose type is NaN are fetched;
    non-'ok' responses and errors leave the row unchanged; a missing ISSN
    key leaves journal_issn unchanged).

    n_cites lands as a *string* column — DWH parity (sql_queries.py:24).
    """
    schema = article.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            todo = pdf["type"].isna()
            dois = pdf.loc[todo, "doi"].dropna().tolist()
            results: dict[str, tuple[str, int, str | None]] = {}
            for i in range(0, len(dois), batch_size):
                results.update(fetcher(dois[i : i + batch_size]))
            if results:
                hit = pdf["doi"].map(results.__contains__) & todo
                pdf.loc[hit, "type"] = pdf.loc[hit, "doi"].map(lambda d: results[d][0])
                pdf.loc[hit, "n_cites"] = pdf.loc[hit, "doi"].map(
                    lambda d: str(results[d][1])
                )
                issn = pdf.loc[hit, "doi"].map(lambda d: results[d][2])
                keep = issn.notna()
                pdf.loc[hit[hit].index[keep], "journal_issn"] = issn[keep]
            yield pdf

    return article.mapInPandas(run, schema=schema)


_CACHE_SCHEMA = "doi string, type string, n_cites string, journal_issn string"


def enrich_articles_resumable(
    article: DataFrame,
    fetcher: Fetcher,
    cache_path: str,
    batch_size: int = 200,
    checkpoint_every: int = 2000,
) -> DataFrame:
    """Checkpoint-resumable enrichment: the reference throttles Crossref
    and checkpoints every 2,000 rows so a half-day job can resume
    (final_tables.py:29-41, augmentations.py:10-57). Spark form: fetched
    (doi → result) rows land in a parquet *fetch cache*; a restart
    anti-joins pending DOIs against the cache and fetches only the
    remainder.

    The driver loop commits one ``checkpoint_every``-DOI chunk at a time —
    Spark's output committer makes each chunk append all-or-nothing, so a
    crash loses at most the in-flight chunk. The worklist is computed
    DISTRIBUTED: a two-phase global row number (``scalable_prefix_sum``
    over doi order — no single-partition window) assigns each pending DOI
    a chunk id, and only the distinct chunk ids reach the driver
    (|todo| / checkpoint_every values — 9 for the reference's 18k-DOI
    run), never the DOI strings themselves. The fetch itself runs as
    ``mapInPandas`` over each chunk's partitions.
    """
    import math

    spark = article.sparkSession
    from ..io import fs
    from ..operators.ranks import scalable_prefix_sum

    pending = (
        article.where(F.col("type").isNull() & F.col("doi").isNotNull())
        .select("doi")
        .distinct()
    )
    have_cache = fs.exists(spark, cache_path)
    if have_cache:
        done = spark.read.parquet(cache_path).select("doi").distinct()
        todo = pending.join(done, "doi", "left_anti")
    else:
        todo = pending
    chunked = scalable_prefix_sum(
        todo.withColumn("_one", F.lit(1)), "doi", "_one", out="_rn"
    ).select(
        "doi",
        F.expr(f"(_rn - 1) div {int(checkpoint_every)}").alias("_chunk"),
    )
    # bounded driver state: one value per chunk, not per DOI
    chunk_ids = sorted(
        r[0] for r in chunked.select("_chunk").distinct().collect()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ds = pdf["doi"].tolist()
            results: dict[str, tuple[str, int, str | None]] = {}
            for i in range(0, len(ds), batch_size):
                results.update(fetcher(ds[i : i + batch_size]))
            yield pd.DataFrame(
                {
                    "doi": list(results),
                    "type": [results[d][0] for d in results],
                    "n_cites": [str(results[d][1]) for d in results],
                    "journal_issn": [results[d][2] for d in results],
                }
            )

    n_parts = max(1, math.ceil(checkpoint_every / batch_size))
    for cid in chunk_ids:
        cdf = (
            chunked.where(F.col("_chunk") == cid)
            .select("doi")
            .repartition(n_parts)
        )
        cdf.mapInPandas(run, schema=_CACHE_SCHEMA).write.mode("append").parquet(cache_path)

    if not fs.exists(spark, cache_path):  # nothing pending and no history
        return article
    fetched = (
        spark.read.parquet(cache_path)
        .groupBy("doi")  # defensive: an append replay can't fan the join out
        .agg(
            F.min("type").alias("_f_type"),
            F.min("n_cites").alias("_f_cites"),
            F.min("journal_issn").alias("_f_issn"),
        )
    )
    out = article.join(fetched, "doi", "left")
    miss = F.col("type").isNull() & F.col("_f_type").isNotNull()
    return (
        out.withColumn("n_cites", F.when(miss, F.col("_f_cites")).otherwise(F.col("n_cites")))
        .withColumn(
            "journal_issn",
            F.when(miss & F.col("_f_issn").isNotNull(), F.col("_f_issn")).otherwise(
                F.col("journal_issn")
            ),
        )
        .withColumn("type", F.when(miss, F.col("_f_type")).otherwise(F.col("type")))
        .select(*article.columns)
    )


def filter_journal_articles(article: DataFrame) -> DataFrame:
    """Keep only journal articles (final_tables.py:51)."""
    return article.where(F.col("type") == "journal-article")


def journal_from_articles(article: DataFrame, cwts: DataFrame) -> DataFrame:
    """Derive the journal dimension from distinct article ISSNs and the
    CWTS indicators (final_tables.py:60-88, augmentations.py:96-123).

    Reference quirk reproduced (J5): a journal matches if its ISSN equals
    the CWTS *print or electronic* ISSN, but title/snip are only copied
    from a **print**-ISSN match — electronic-only matches end up with a
    NULL title and are dropped by the final filter. When several CWTS rows
    share a print ISSN, pandas ``.index[0]`` takes the first — pinned here
    by ordering on source_title then snip.

    Plan shape: distinct ISSNs (one shuffle on a dimension-sized set) +
    broadcast of the CWTS table.
    """
    issns = (
        article.select(F.col("journal_issn")).where(F.col("journal_issn").isNotNull()).distinct()
    )
    cwts_first = (
        cwts.where(F.col("print_issn").isNotNull())
        .groupBy("print_issn")
        .agg(
            F.min_by(
                F.struct("source_title", "snip"), F.struct("source_title", "snip")
            ).alias("_best")
        )
        .select(
            "print_issn",
            F.col("_best.source_title").alias("journal_title"),
            F.col("_best.snip").cast("double").alias("snip_latest"),
        )
    )
    return (
        issns.join(
            F.broadcast(cwts_first), issns.journal_issn == cwts_first.print_issn, "left"
        )
        .where(F.col("journal_title").isNotNull())
        .select("journal_issn", "journal_title", "snip_latest")
    )


def add_gender(author: DataFrame, names_genders: DataFrame) -> DataFrame:
    """Gender lookup by first name (final_tables.py:117-121), broadcast
    left join (J1).

    The raw lookup file can carry duplicate first names — pandas merge
    would fan out; dedup on first_name (first occurrence by gender order)
    keeps the join 1:1 and deterministic.
    """
    lookup = (
        names_genders.select("first_name", "gender")
        .groupBy("first_name")
        .agg(F.min("gender").alias("gender"))
    )
    return author.join(F.broadcast(lookup), "first_name", "left")
