"""Full-text relevance and language-model scoring over the documents table.

Two corpus-trained scorers a training-data pipeline runs at ingest:

- ``bm25_topk``: classic BM25 (Robertson/Spärck Jones) over an inverted
  index derived in-plan — the retrieval primitive behind contamination
  checks ("which training docs score highest against this benchmark
  query?") and boilerplate mining.
- ``bigram_nll``: an order-2 add-one-smoothed language model trained on
  the corpus itself, scoring each document's negative log-likelihood —
  the KenLM-shaped quality-filter signal (high NLL ⇒ the doc is unlike
  the corpus: noise, wrong language, or garbled extraction).

Numeric discipline (registry.py module docstring): every per-term /
per-bigram contribution is a product-and-divide chain of IEEE doubles
derived from exact integers — bit-identical across engines — floored to
integer micro-units (×1e6) BEFORE the per-document sum, so the sum is an
exact associative BIGINT aggregation that no shuffle order can perturb.
The only transcendental is ``ln``; a last-ulp disagreement would have to
land within ~1e-10 of an integer boundary to flip a floor, which the
parity suite would catch.

Scale shape: tokenize → explode is the only row-multiplying step; BM25
filters to the query vocabulary BEFORE any shuffle (the explode feeds a
``isin`` prune), so the per-term aggregation touches candidate postings
only. Corpus statistics (N, avgdl, per-term df, bigram counts) are
aggregations keyed on term/bigram; the tiny scalar stats row and the
query-term df table are broadcast. Top-k goes through orderBy+limit
(TakeOrderedAndProject — per-partition heap + driver merge, no global
sort) with the rank window applied to the k survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

# BM25 constants as exact binary fractions: every derived literal
# (k1+1=2.25, 1-b=0.25) is exactly representable, so Spark and the SQL
# oracle fold them to the same double.
BM25_K1 = 1.25
BM25_B = 0.75
SCALE = 1_000_000.0  # micro-unit fixed-point scale for floored contributions


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-terms query.

    Returns (id, score_e6 BIGINT, n_terms BIGINT, rank BIGINT): the
    floored-micro-unit BM25 score, how many distinct query terms the
    document contains, and the dense 1-based rank (ties broken by id).
    Documents containing no query term are not candidates.
    """
    did = F.col(id_col)
    dl = docs.select(did, T.token_count(F.col(text_col)).alias("dl"))
    # one tiny row: corpus size + mean document length (exact-int division)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    postings = docs.select(
        did, F.explode(T.tokens(F.col(text_col))).alias("term")
    ).where(F.col("term").isin(query_terms))
    tf = postings.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    tf_d = F.col("tf").cast("double")
    df_d = F.col("df").cast("double")
    dl_d = F.col("dl").cast("double")
    n_d = F.col("n_docs").cast("double")
    tf_sat = tf_d * F.lit(BM25_K1 + 1.0) / (
        tf_d + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dl_d / F.col("avgdl")))
    )
    idf = F.log(F.lit(1.0) + ((n_d - df_d) + F.lit(0.5)) / (df_d + F.lit(0.5)))
    contrib_e6 = F.floor(tf_sat * idf * F.lit(SCALE))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(contrib_e6).alias("score_e6"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    topk = scored.orderBy(F.col("score_e6").desc(), F.col(id_col)).limit(k)
    # unpartitioned window, DELIBERATE: ranks only the <= k limit
    # survivors (TakeOrderedAndProject already cut the corpus); the
    # "No Partition Defined" warning is benign here — a constant
    # partitionBy(lit(0)) is folded away and does not hush it
    w = Window.orderBy(F.col("score_e6").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


def bm25_topk_oracle(query_terms: list[str], k: int = 25) -> str:
    """DuckDB oracle mirroring ``bm25_topk`` expression-for-expression."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ), stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        WHERE term IN ({terms})
        GROUP BY doc_id, term
    ), dfq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT t.doc_id,
               SUM(CAST(FLOOR(
                   (CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0}
                    / (CAST(t.tf AS DOUBLE)
                       + {BM25_K1} * ({1.0 - BM25_B}
                                      + {BM25_B} * (CAST(d.dl AS DOUBLE) / s.avgdl))))
                   * ln(1.0 + ((CAST(s.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE)) + 0.5)
                              / (CAST(q.df AS DOUBLE) + 0.5))
                   * {SCALE}
               ) AS BIGINT)) AS score_e6,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM tf t
        JOIN dfq q USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(score_e6 AS BIGINT) AS score_e6, n_terms,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank
        FROM scored
    )
    WHERE rank <= {k}
    """


def bigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document NLL under an add-one-smoothed bigram LM trained on
    the same corpus.

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V) with V the corpus vocabulary
    size, so each position's NLL is ln((c1 + V) / (c12 + 1)) ≥ 0. Returns
    (id, n_bigrams BIGINT, nll_e6 BIGINT, avg_nll DOUBLE). Documents with
    fewer than two tokens have no bigrams and are excluded.

    Scale shape: bigrams come from one zip-shift of the token array (no
    self-join); corpus model tables are groupBy aggregations keyed on
    (w1, w2) / w1, joined back by key (hash joins — the model scales with
    vocabulary², not corpus size, but is NOT assumed broadcastable); the
    scalar V crosses via broadcast. Per-document sums are exact BIGINT.
    """
    did = F.col(id_col)
    toks = T.tokens(F.col(text_col))
    pairs = docs.select(
        did,
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # Model tables DERIVE from occ, which is MATERIALIZED once
    # (localCheckpoint — MEMORY_AND_DISK, executor-resident, spillable;
    # a cluster run would persist the same intermediate): the earlier
    # form re-tokenized + exploded + shuffled the whole corpus once per
    # consumer branch (three corpus-sized exchanges — ReuseExchange does
    # not fire here because column pruning and pushed notnull filters
    # de-canonicalize the branches). Now the single (doc, w1, w2) agg is
    # the only corpus-sized exchange; c2/c1 are bounded re-aggs of it.
    occ = (
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .localCheckpoint()
    )
    c2 = (
        occ.groupBy("w1", "w2")
        .agg(F.sum("n_occ").alias("c2"))
        .localCheckpoint()  # vocab-squared-bounded; read by c1/vocab/join
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # |vocabulary| WITHOUT re-exploding the corpus: every token of a doc
    # with >= 2 tokens appears as some bigram's w1 or w2 (both already in
    # the bounded c2 table); only single-token docs contribute tokens no
    # bigram carries — a filtered scan whose explode touches those rows
    # alone. The countDistinct input shrinks from corpus-token-sized to
    # ~2|c2| + singletons.
    singletons = docs.where(F.size(T.tokens(F.col(text_col))) == 1).select(
        F.explode(T.tokens(F.col(text_col))).alias("w")
    )
    vocab = (
        c2.select(F.col("w1").alias("w"))
        .unionByName(c2.select(F.col("w2").alias("w")))
        .unionByName(singletons)
        .agg(F.countDistinct("w").alias("v"))
    )
    nll_pos_e6 = F.floor(
        F.log(
            (F.col("c1").cast("double") + F.col("v").cast("double"))
            / (F.col("c2").cast("double") + F.lit(1.0))
        )
        * F.lit(SCALE)
    )
    # Fold the model into ONE per-(w1,w2) score table BEFORE touching the
    # corpus-sized occ stream (r14): c2 ⋈ c1 ⋈ vocab are all
    # vocabulary-bounded, so the corpus path pays a single (w1, w2) join
    # instead of the previous (w1, w2) join followed by a second
    # corpus-wide w1 join (HashPartitioning(w1,w2) does not satisfy a
    # w1-keyed join, so that chain re-exchanged the whole joined stream
    # when c1 was too big to broadcast). Every occ key exists in c2 and
    # every c2.w1 in c1, so the inner joins keep identical rows and the
    # per-position score is computed from the same (c2, c1, v) doubles.
    score = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", nll_pos_e6.alias("_nll_pos_e6"))
    )
    return (
        occ.join(score, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("_nll_pos_e6")).alias("nll_e6"),
        )
        .select(
            id_col,
            "n_bigrams",
            "nll_e6",
            (F.col("nll_e6").cast("double") / F.col("n_bigrams")).alias("avg_nll"),
        )
    )


BIGRAM_NLL_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), pairs AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
    ), c2 AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), vocab AS (
        SELECT COUNT(DISTINCT token) AS v
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    ), occ AS (
        SELECT doc_id, w1, w2, COUNT(*) AS n_occ FROM pairs GROUP BY doc_id, w1, w2
    ), agg AS (
        SELECT o.doc_id,
               SUM(o.n_occ) AS n_bigrams,
               SUM(o.n_occ * CAST(FLOOR(
                   ln((CAST(c1.c1 AS DOUBLE) + CAST(vocab.v AS DOUBLE))
                      / (CAST(c2.c2 AS DOUBLE) + 1.0))
                   * {SCALE}
               ) AS BIGINT)) AS nll_e6
        FROM occ o
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN vocab
        GROUP BY o.doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(nll_e6 AS BIGINT) AS nll_e6,
           CAST(nll_e6 AS DOUBLE) / n_bigrams AS avg_nll
    FROM agg
"""


def bigram_nll_heldout(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document NLL of EVAL documents under the add-one bigram LM
    trained ONLY on the train split — the held-out scoring a
    contamination-aware quality pipeline runs (d28 scores the corpus
    under itself; this is the train→eval direction a leakage audit
    needs). Unseen bigrams smooth to ln((c1 + V) / 1) and unseen left
    words to ln(V); ``n_unseen`` counts eval bigram occurrences absent
    from the train model. Model tables are train-vocabulary-sized keyed
    aggregations; eval occurrences LEFT-join them by key.
    Returns (id, n_bigrams, n_unseen, nll_e6, avg_nll)."""

    def pairs_of(docs: DataFrame, keep_id: bool):
        toks = T.tokens(F.col(text_col))
        cols = [F.col(id_col)] if keep_id else []
        return docs.select(
            *cols,
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        ).select(
            *([id_col] if keep_id else []),
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )

    c2 = (
        pairs_of(train, keep_id=False)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint()  # train-vocab²-bounded; read by c1 + the join
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        train.select(F.explode(T.tokens(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    occ = pairs_of(eval_docs, keep_id=True).groupBy(
        id_col, "w1", "w2"
    ).agg(F.count(F.lit(1)).alias("n_occ"))
    nll_pos_e6 = F.floor(
        F.log(
            (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
             + F.col("v").cast("double"))
            / (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(1.0))
        )
        * F.lit(SCALE)
    )
    return (
        occ.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.col("n_occ")
                * F.when(F.col("c2").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_unseen"),
            F.sum(F.col("n_occ") * nll_pos_e6).cast("bigint").alias("nll_e6"),
        )
        .select(
            id_col, "n_bigrams", "n_unseen", "nll_e6",
            (F.col("nll_e6").cast("double") / F.col("n_bigrams")).alias(
                "avg_nll"
            ),
        )
    )


def rrf_fuse(
    legs: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists (Cormack,
    Clarke & Buettcher 2009): RRF(d) = Σ_legs 10⁶ div (k + rank_leg(d)),
    in exact integer micro-units so the fused order is associative and
    hash-stable. Each leg is (id_col, rank_col [, ...]); a document
    missing from a leg contributes 0. Returns one row per document seen
    in ANY leg: (id_col, rank_1..rank_N nullable BIGINT, rrf_micro,
    fused_rank), cut to ``top`` when given.

    Scale shape: legs arrive top-k-bounded (that is what makes them
    "retrieval lists"), so the full-outer join chain and the final rank
    window touch Σ|legs| ≤ N·k rows — driver-size, never corpus-size.
    The hot work happened upstream in the leg retrievals.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    fused = None
    rank_cols = []
    for i, leg in enumerate(legs, 1):
        rc = f"rank_{i}"
        rank_cols.append(rc)
        part = leg.select(
            F.col(id_col), F.col(rank_col).cast("bigint").alias(rc)
        )
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    score = None
    for rc in rank_cols:
        term = F.coalesce(
            F.expr(f"1000000 div ({int(k)} + {rc})"), F.lit(0)
        )
        score = term if score is None else score + term
    fused = fused.withColumn("rrf_micro", score.cast("bigint"))
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col(id_col))
    # unpartitioned window, DELIBERATE: it ranks the <= N*k fused rows
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("bigint")
    )
    if top is not None:
        out = out.where(F.col("fused_rank") <= top)
    return out
