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
fake fetcher; live use would inject a requests-based one.
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
