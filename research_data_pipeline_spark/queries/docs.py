"""Training-data pipeline queries over ``documents`` and ``embeddings``.

Dedup (exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + LSH ANN), and text analysis (lang-ID,
quality, token stats, fingerprinting) — the operator set a 100 TB
LLM-data pipeline needs, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import similarity as sim
from ..operators import text_dedup as dd
from ..registry import REGISTRY
from ..tables import load

# --- shared SQL fragments for the oracles ---------------------------------
_TOKS = "string_split(text, ' ')"
_DTOKS = f"list_distinct({_TOKS})"


def _marker_count_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKS}, x -> x IN ({lst})))"


# ---------------------------------------------------------------------------
@REGISTRY.add(
    "d01_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len({_DTOKS}) AS BIGINT) AS n_distinct_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT)
               AS n_bpe_ish_tokens,
           (LENGTH(text) - (len({_TOKS}) - 1)) * 1.0 / len({_TOKS}) AS mean_token_len
    FROM documents
    """,
    "text",
)
def d01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex (SURVEY north-star text ops)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        F.size(F.array_distinct(T.tokens(t))).cast("bigint").alias("n_distinct_tokens"),
        T.bpe_ish_token_count(t).alias("n_bpe_ish_tokens"),
        T.mean_token_len(t).alias("mean_token_len"),
    )


# ---------------------------------------------------------------------------
_lang_score_cols = ",\n           ".join(
    f"CAST({_marker_count_sql(words)} AS BIGINT) AS score_{lang}"
    for lang, words in sorted(T.LANG_MARKERS.items())
)
_langs_sorted = sorted(T.LANG_MARKERS)
_argmax_sql = "CASE"
_best = f"{_marker_count_sql(T.LANG_MARKERS[_langs_sorted[0]])}"
# build nested greatest-with-first-tie-break: lang wins only on strict >
_argmax_sql = f"'{_langs_sorted[0]}'"
_best_expr = _marker_count_sql(T.LANG_MARKERS[_langs_sorted[0]])
for _lang in _langs_sorted[1:]:
    _score = _marker_count_sql(T.LANG_MARKERS[_lang])
    _argmax_sql = f"CASE WHEN {_score} > {_best_expr} THEN '{_lang}' ELSE {_argmax_sql} END"
    _best_expr = f"greatest({_score}, {_best_expr})"


@REGISTRY.add(
    "d02_lang_id",
    f"""
    SELECT doc_id, lang AS lang_declared,
           {_lang_score_cols},
           {_argmax_sql} AS lang_pred
    FROM documents
    """,
    "text",
)
def d02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with deterministic tie-break."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scores = T.lang_scores(t)
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
        T.lang_id(t).alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
_STOP_LST = ", ".join(f"'{w}'" for w in T.STOPWORDS)


@REGISTRY.add(
    "d03_quality_score",
    f"""
    SELECT doc_id,
           least(1.0, len({_TOKS}) / 100.0) * 0.4
           + len({_DTOKS}) * 1.0 / len({_TOKS}) * 0.3
           + least(1.0, ((LENGTH(text) - (len({_TOKS}) - 1)) * 1.0 / len({_TOKS})) / 8.0) * 0.2
           + least(1.0, len(list_filter({_TOKS}, x -> x IN ({_STOP_LST}))) / 5.0) * 0.1
               AS quality
    FROM documents
    """,
    "text",
)
def d03_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap deterministic quality heuristic (pre-model filter)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


# ---------------------------------------------------------------------------
@REGISTRY.add(
    "d04_fingerprint_dedup",
    f"""
    SELECT md5(array_to_string(list_sort({_DTOKS}), ' ')) AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY 1
    """,
    "dedup",
)
def d04_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint (sorted-distinct-token) duplicate groups."""
    d = load(spark, sf_dir, "documents")
    return dd.fingerprint_dedup_groups(d, "doc_id", "text")


# ---------------------------------------------------------------------------
@REGISTRY.add(
    "d05_exact_dedup",
    """
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY 1
    """,
    "dedup",
)
def d05_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-hash duplicate groups (hash-groupBy, the 100 TB workhorse)."""
    d = load(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(d, "doc_id", "text")


# ---------------------------------------------------------------------------
_N_HASHES, _BANDS, _MH_THRESHOLD = 16, 4, 0.9
_mh_cols = ",\n           ".join(
    f"min(md5('{i}:' || token)) AS mh{i}" for i in range(_N_HASHES)
)
_rpb = _N_HASHES // _BANDS

# Mega-cluster band-escalation bar (round 12, the 100×-grid LSH wedge):
# a band bucket holding more than this many documents has pop² candidate
# mass against ~linear true pairs (the boilerplate pathology — 46% of the
# sf0.1 corpus shares ONE band-0 bucket, SCALE.md round-11-late), so
# within such buckets candidacy escalates to the FULL-signature key
# (rows-per-band → n_hashes). Full-width is the measured choice: every
# band carries its own skeleton-dominated mega bucket, a half-width
# extended key only splits it in two, and the full signature reaches the
# irreducible floor (1,219 sf0.1 docs share an IDENTICAL 16-hash
# signature — unprunable under any banding by LSH completeness).
# sf0.01's 500-doc corpus can never reach the bar (driver correctness
# rows unchanged); sf0.1's 2,311-doc bucket and the sf10 grid's
# ~2.7k-doc replica buckets DO escalate — a declared recall change,
# engine and oracle in lockstep (d06/d19 rotation-flagged, d55/d59
# calibration audits re-pin the agreement curve).
_ESCALATE_POP = 1000


def _band_cand_ctes(escalate_pop: int = _ESCALATE_POP) -> str:
    """bands/pband/cand CTE fragment shared by every LSH oracle — mirrors
    ``operators/text_dedup.minhash_lsh_pairs``'s band-escalation rule
    exactly: a pair is a candidate iff some band's value matches AND
    (that bucket's population ≤ the bar OR the FULL 16-hash signature
    also matches). Tests pass a tiny ``escalate_pop`` to pin the RULE
    against the engine on corpora where buckets actually exceed it, not
    just the default bar.
    """
    full = "||".join(f"mh{i}" for i in range(_N_HASHES))
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, {concat} AS band_val, "
        "{ext} AS band_ext FROM mh".format(
            b=b,
            concat="||".join(f"mh{b * _rpb + r}" for r in range(_rpb)),
            ext=full,
        )
        for b in range(_BANDS)
    )
    return f"""bands AS (
        {band_selects}
    ), pband AS (
        SELECT doc_id, band_idx, band_val, band_ext,
               COUNT(*) OVER (PARTITION BY band_idx, band_val) AS pop
        FROM bands
    ), cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM pband a JOIN pband b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
         AND (a.pop <= {escalate_pop} OR a.band_ext = b.band_ext)
    )"""


_BAND_CAND_CTES = _band_cand_ctes()

_MINHASH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM documents
    ), tok AS (
        SELECT doc_id, unnest(tokens) AS token FROM toks
    ), mh AS (
        SELECT doc_id, {_mh_cols}
        FROM tok GROUP BY doc_id
    ), {_BAND_CAND_CTES}
    SELECT c.i, c.j,
           len(list_intersect(ta.tokens, tb.tokens)) * 1.0
             / (len(ta.tokens) + len(tb.tokens) - len(list_intersect(ta.tokens, tb.tokens)))
               AS jaccard
    FROM cand c
    JOIN toks ta ON ta.doc_id = c.i
    JOIN toks tb ON tb.doc_id = c.j
    WHERE len(list_intersect(ta.tokens, tb.tokens)) * 1.0
            / (len(ta.tokens) + len(tb.tokens) - len(list_intersect(ta.tokens, tb.tokens)))
          >= {_MH_THRESHOLD}
"""


# One LSH pair computation serves every threshold ≥ the loosest registered
# one: band candidates are threshold-INDEPENDENT (collisions come from the
# signatures alone), and the exact-jaccard verification emits the jaccard
# column — so pairs(t) ≡ pairs(t_min) filtered to jaccard ≥ t, value-for-
# value. d06 (pairs at 0.9) and d19 (clusters at 0.95) previously each ran
# the full tokenize + signature + band-join pipeline; a production run
# shares one signature/pair table, and so does this suite. The cache holds
# the localCheckpoint-materialized pair table keyed by (session, dataset);
# entries from stopped sessions are evicted on insert.
_PAIR_STREAM_CACHE: dict[tuple[str, str], DataFrame] = {}


def _lsh_pair_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PAIR_STREAM_CACHE.get(key)
    if cached is None:
        d = load(spark, sf_dir, "documents")
        cached = dd.minhash_lsh_pairs(
            d, "doc_id", "text", n_hashes=_N_HASHES, bands=_BANDS,
            threshold=min(_MH_THRESHOLD, _CLUSTER_T),
        )
        for k in [k for k in _PAIR_STREAM_CACHE if k[0] != key[0]]:
            del _PAIR_STREAM_CACHE[k]
        _PAIR_STREAM_CACHE[key] = cached
    return cached


@REGISTRY.add("d06_minhash_lsh", _MINHASH_ORACLE, "dedup", "lsh")
def d06_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash({_N_HASHES} perms) + {_BANDS}-band LSH candidates, verified
    with exact token-set Jaccard ≥ 0.9."""
    return _lsh_pair_stream(spark, sf_dir).where(
        F.col("jaccard") >= _MH_THRESHOLD
    )


# ---------------------------------------------------------------------------
_SIM_BITS, _SIM_MAXHAM = 16, 2
_HEXC = "ascii(substring(md5(token), {p}, 1)) - CASE WHEN substring(md5(token), {p}, 1) <= '9' THEN 48 ELSE 87 END"
_h_expr = "((({c1}) * 16 + ({c2})) * 16 + ({c3})) * 16 + ({c4})".format(
    c1=_HEXC.format(p=1), c2=_HEXC.format(p=2), c3=_HEXC.format(p=3), c4=_HEXC.format(p=4)
)
_vote_cols = ",\n           ".join(
    f"SUM(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(_SIM_BITS)
)
_sim_expr = " + ".join(
    f"CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(_SIM_BITS)
)

_SIMHASH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_DTOKS}) AS token FROM documents
    ), hashed AS (
        SELECT doc_id, CAST({_h_expr} AS BIGINT) AS h FROM tok
    ), votes AS (
        SELECT doc_id, {_vote_cols} FROM hashed GROUP BY doc_id
    ), sig AS (
        SELECT doc_id, CAST({_sim_expr} AS BIGINT) AS simhash FROM votes
    )
    SELECT a.doc_id AS i, b.doc_id AS j,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIM_MAXHAM}
"""


@REGISTRY.add("d07_simhash_pairs", _SIMHASH_ORACLE, "dedup", "simhash")
def d07_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash near-duplicate pairs (hamming ≤ 2)."""
    d = load(spark, sf_dir, "documents")
    return dd.simhash_pairs(d, "doc_id", "text", bits=_SIM_BITS, max_hamming=_SIM_MAXHAM)


# ---------------------------------------------------------------------------
_NGRAM_N, _NGRAM_T = 3, 0.05
_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - {_NGRAM_N - 2}), "
    f"i -> array_to_string(({_TOKS})[i:i+{_NGRAM_N - 1}], ' ')))"
)

_NGRAM_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {_SHINGLES} AS shingles FROM documents
        WHERE len({_TOKS}) >= {_NGRAM_N}
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT s.i, s.j,
           s.n_shared * 1.0 / (si.n_sh + sj.n_sh - s.n_shared) AS jaccard
    FROM shared s
    JOIN sizes si ON si.doc_id = s.i
    JOIN sizes sj ON sj.doc_id = s.j
    WHERE s.n_shared * 1.0 / (si.n_sh + sj.n_sh - s.n_shared) >= {_NGRAM_T}
"""


@REGISTRY.add("d08_ngram_jaccard", _NGRAM_ORACLE, "dedup", "ngram")
def d08_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard pairs via the inverted shingle index."""
    d = load(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(d, "doc_id", "text", n=_NGRAM_N, threshold=_NGRAM_T)


# ---------------------------------------------------------------------------
_COS_T = 0.4
_DOT = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"
_E_CTE = (
    "SELECT vec_id, embedding::DOUBLE[] AS v, "
    f"sqrt({_DOT.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm "
    "FROM embeddings "
    # r11 (r10 verdict task 2): every similarity operator drops NULL
    # embeddings at the API boundary (_drop_null_vectors) — the shared
    # oracle fragment must share that contract, else rank-shaped oracles
    # emit rows for NULL query vectors on a poisoned corpus (invisible on
    # the NULL-free driver corpora; d73's leg oracle was the template).
    "WHERE embedding IS NOT NULL"
)

# Shared NaN-vector exclusion (the nanemb contract, r14 — see
# similarity.drop_nan_vectors): vectors CONTAINING a NaN component leave
# the vector domain on BOTH engines. `_E_CTE_FIN` is the finite-domain
# variant of the shared embeddings CTE, adopted oracle-by-oracle as each
# query's engine side takes the loader filter (r14: d26/d34/d36/d40/d13b
# + the in-band d44/d63/d64/m18).
_NANEMB_SQL = "len(list_filter(embedding, x -> isnan(x))) = 0"
_E_CTE_FIN = _E_CTE + f" AND {_NANEMB_SQL}"

# r15 widening (similarity.drop_nonfinite_vectors, the registry's
# round-14-late nullemb frontier): vectors containing a NULL component
# OR a NaN leave the domain — Spark's isnan is FALSE for NULL, so the
# NaN-only fragment lets NULL-component vectors through, where they
# silently poison JVM folds (NULL cosine → unknown comparisons) and
# BIGINT output columns. Adopted r15 by the five cosine rankers
# (d09/d10/d11/d13/d39 — their first domain fragment) and by
# d36/d40/d60/d73 (widening their r14 NaN-only fragment); the six loud
# sites (d26/d44/d63/d64/m18/d13b) widen in r16 per the schedule.
_NULLEMB_SQL = "len(list_filter(embedding, x -> x IS NULL OR isnan(x))) = 0"
_E_CTE_FIN2 = _E_CTE + f" AND {_NULLEMB_SQL}"

_COS_PAIRS_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN2})
    SELECT a.vec_id AS i, b.vec_id AS j,
           {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) >= {_COS_T}
"""


@REGISTRY.add("d09_embedding_near_dups", _COS_PAIRS_ORACLE, "dedup", "embedding")
def d09_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4).

    Dot products are double left-folds — bit-identical across engines, so
    the threshold cut is exact. Vectors with a NULL or NaN component
    leave the domain on both engines (r15 nullemb contract — a NaN
    cosine outranks every real value in Spark while DuckDB disagrees
    silently; zero rows filtered on clean corpora)."""
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    return sim.cosine_pairs(e, "vec_id", "embedding", threshold=_COS_T)


# ---------------------------------------------------------------------------
_ANN_K = 5
_ANN_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN2}),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) AS cosine
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {_ANN_K}
"""


@REGISTRY.add("d10_ann_topk", _ANN_ORACLE, "similarity", "ann")
def d10_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors per vector (brute-force baseline).
    NULL-or-NaN-component vectors leave the domain on both engines (r15
    nullemb contract; zero rows filtered on clean corpora)."""
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    return sim.ann_topk_bruteforce(e, "vec_id", "embedding", k=_ANN_K)


# ---------------------------------------------------------------------------
_LSH_K, _LSH_PLANES = 3, 8
_bucket_sql = " + ".join(
    f"CASE WHEN v[{d + 1}] >= 0 THEN {1 << d} ELSE 0 END" for d in range(_LSH_PLANES)
)
_ANN_LSH_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, v, norm, CAST({_bucket_sql} AS BIGINT) AS bucket
        FROM ({_E_CTE_FIN2})
    ), pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
               {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, bucket, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {_LSH_K}
"""


@REGISTRY.add("d11_ann_lsh", _ANN_LSH_ORACLE, "similarity", "ann", "lsh")
def d11_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the scale path: bucket hash-join, no n²).
    NULL-or-NaN-component vectors leave the domain on both engines (r15
    nullemb contract; zero rows filtered on clean corpora)."""
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    return sim.ann_topk_lsh(e, "vec_id", "embedding", k=_LSH_K, n_planes=_LSH_PLANES)


# ---------------------------------------------------------------------------
_IVF_K, _IVF_CELLS, _IVF_NPROBE = 3, 16, 2
_ANN_IVF_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN2}),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e WHERE vec_id < {_IVF_CELLS}),
    scored AS (
        SELECT e.vec_id, c.cid, {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) AS ccos
        FROM e CROSS JOIN cents c
    ),
    pr AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored
    ),
    assign AS (SELECT vec_id, cid AS cell FROM pr WHERE rn = 1),
    probes AS (SELECT vec_id, cid AS cell FROM pr WHERE rn <= {_IVF_NPROBE}),
    pairs AS (
        SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id, a.cell,
               {_DOT.format(a='q.v', b='m.v')} / (q.norm * m.norm) AS cosine
        FROM probes p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
        JOIN e q ON q.vec_id = p.vec_id
        JOIN e m ON m.vec_id = a.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cell, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {_IVF_K}
"""


@REGISTRY.add("d13_ann_ivf", _ANN_IVF_ORACLE, "similarity", "ann", "ivf")
def d13_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN: nearest-of-16 deterministic seed centroids,
    2-cell probe lists, exact cosine rank within probed cells.
    NULL-or-NaN-component vectors leave the domain on both engines (r15
    nullemb contract; zero rows filtered on clean corpora)."""
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    return sim.ann_topk_ivf(
        e, "vec_id", "embedding", k=_IVF_K, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE
    )


# ---------------------------------------------------------------------------
# d13b: the Lloyd-REFINED IVF path under the within-bound oracle pattern
# (registry docstring): the approximate result's quality is reduced to a
# boolean the oracle asserts TRUE. Measured mean recall@3 vs the exact
# brute-force answer on the test embeddings: UNREFINED seeds 0.303
# (sf0.001) / 0.339 (sf0.01); after 2 distributed Lloyd iterations 0.388 /
# 0.402. The 0.35 bound therefore discriminates: it fails on the seed
# centroids at every test scale and passes only when the refinement
# actually runs and improves the index. Everything is deterministic (seed
# centroids are the id<16 vectors; Lloyd is exact arithmetic), so the
# boolean is stable across runs and partitionings.
_IVF_LLOYD_ITERS = 2
_IVF_RECALL_BOUND = 0.35
_IVF_RECALL_ORACLE = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(3 AS BIGINT) AS k,
           TRUE AS within_bound
    FROM embeddings
    WHERE embedding IS NOT NULL AND {_NANEMB_SQL}
"""


@REGISTRY.add("d13b_ivf_lloyd_recall", _IVF_RECALL_ORACLE, "similarity", "ann", "ivf")
def d13b_ivf_lloyd_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the Lloyd-refined IVF index against the exact
    brute-force top-k (d10's operator): one row
    (n_queries, k, within_bound) where within_bound ⇔ mean recall ≥ 0.35.
    Every query has exactly k exact neighbors (n ≫ k), so mean per-query
    recall equals hits / (k · n_queries) — computed as two scalar
    aggregates joined in-plan, no driver-side math.

    NaN-containing vectors leave the domain on BOTH engines at this
    loader (nanemb contract): a NaN component used to reach the Lloyd
    mean fold, where the driver collect turned it into object-dtype
    None and died with a raw UFuncTypeError — the kernel now also
    carries a loud finite guard (similarity._require_finite_matrix)."""
    e = sim.drop_nan_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    exact = sim.ann_topk_bruteforce(e, "vec_id", "embedding", k=_IVF_K).select(
        "query_id", "neighbor_id"
    )
    ivf = sim.ann_topk_ivf(
        e, "vec_id", "embedding", k=_IVF_K, n_cells=_IVF_CELLS,
        nprobe=_IVF_NPROBE, lloyd_iters=_IVF_LLOYD_ITERS,
    ).select("query_id", "neighbor_id")
    totals = exact.agg(
        F.count_distinct("query_id").alias("_nq"), F.count(F.lit(1)).alias("_nx")
    )
    hits = exact.join(ivf, ["query_id", "neighbor_id"], "leftsemi").agg(
        F.count(F.lit(1)).alias("_nh")
    )
    return totals.crossJoin(hits).select(
        F.col("_nq").cast("bigint").alias("n_queries"),
        F.lit(_IVF_K).cast("bigint").alias("k"),
        # vacuously within bound over zero queries (and ANSI-safe: the
        # division never evaluates on an empty corpus)
        F.when(F.col("_nx") == 0, F.lit(True))
        .otherwise(F.col("_nh") / F.col("_nx") >= F.lit(_IVF_RECALL_BOUND))
        .alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing — training-data hygiene (functions/text.py maskers)
# ---------------------------------------------------------------------------
_PII_SRC = (
    "text || ' contact user' || doc_id || '@example.com or visit "
    "https://ex.com/d' || doc_id || ' call +1-555-000-' || doc_id"
)
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_URL_RE = r"https?://[^\s]+"
_PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


@REGISTRY.add(
    "d12_pii_scrub",
    f"""
    WITH src AS (SELECT doc_id, {_PII_SRC} AS raw FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_URL_RE}')) AS BIGINT) AS n_urls,
           md5(regexp_replace(regexp_replace(regexp_replace(raw,
               '{_URL_RE}', '<URL>', 'g'),
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM src
    """,
    "text",
    "pii",
)
def d12_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (URLs → emails → phones) + detection counts; documents
    get deterministic synthetic PII appended so the scrub is exercised.
    All JVM regexp builtins — one codegen pass over the scan."""
    d = load(spark, sf_dir, "documents")
    raw = F.expr(_PII_SRC)
    counts = T.pii_counts(raw)
    return d.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_urls"].alias("n_urls"),
        F.md5(T.scrub_pii(raw)).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
_PACK_BUDGET = 512

_PACK_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
    ),
    c AS (
        -- CAST: DuckDB's window SUM over BIGINT yields HUGEINT, which
        -- fetchdf() materializes as float64; Spark emits int64. The driver
        -- hash is representation-sensitive, so pin both sides to BIGINT.
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running
        FROM t
    )
    SELECT doc_id, n_tokens, running,
           CAST((running - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS shard_id
    FROM c
"""


@REGISTRY.add("d14_pack_context_windows", _PACK_ORACLE, "text", "packing")
def d14_pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~{_PACK_BUDGET}-token training shards by global
    running token count (streaming concatenation order = doc_id, which
    must be unique — ties would make any engine's prefix sum ambiguous).

    The prefix sum is the two-phase ``scalable_prefix_sum`` — range
    partition + local cumsum + offset join — so no single-partition
    global window exists in the plan; a shard is then just the integer
    quotient of the shard-start offset.
    """
    from ..operators.ranks import scalable_prefix_sum

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    c = scalable_prefix_sum(d, "doc_id", "n_tokens", out="running")
    return c.select(
        "doc_id",
        "n_tokens",
        "running",
        F.expr(f"(running - n_tokens) div {_PACK_BUDGET}").alias("shard_id"),
    )


# ---------------------------------------------------------------------------
_RARE_K = 20

_RARE_BIGRAM_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                      x -> x[1] || ' ' || x[2])) AS bigram
        FROM t WHERE len(toks) >= 2
    ),
    c AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1),
    r AS (
        SELECT bg.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) FILTER (c.n <= {_RARE_K}) AS BIGINT) AS n_rare_bigrams
        FROM bg JOIN c USING (bigram) GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(r.n_bigrams, 0) AS n_bigrams,
           COALESCE(r.n_rare_bigrams, 0) AS n_rare_bigrams
    FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
"""


@REGISTRY.add("d15_rare_bigrams", _RARE_BIGRAM_ORACLE, "text", "quality")
def d15_rare_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based LM quality signal: per-document bigrams whose corpus
    frequency is <= {_RARE_K} (unusual word transitions flag noisy or
    machine-mangled text). Integer counts end to end — no log-prob float
    sums whose accumulation order an engine could disagree on. One
    explode + two hash aggregations + one (bigram-keyed) join."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = d.where(n >= 2).select("doc_id", F.explode(bigrams).alias("bigram"))
    c = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    r = (
        bg.join(c, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(F.col("n") <= _RARE_K, 1)).alias("n_rare_bigrams"),
        )
    )
    return d.select("doc_id").join(r, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_rare_bigrams", F.lit(0)).alias("n_rare_bigrams"),
    )


# ---------------------------------------------------------------------------
_ZIPF_ORACLE = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1)
    SELECT token, n, CAST(RANK() OVER (ORDER BY n DESC) AS BIGINT) AS rank
    FROM counts
"""


@REGISTRY.add("d16_token_zipf", _ZIPF_ORACLE, "text", "rank")
def d16_token_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency table with Zipf rank. The rank is the
    two-phase formulation (rank over DISTINCT counts, joined back), so
    the single-partition window touches |distinct frequencies| rows —
    at 100 TB that's thousands, not billions."""
    from ..operators.ranks import RANK_WINDOW_MAX_DISTINCT, spark_rank

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spark_rank(
        counts, "n", out_col="rank", ascending=False,
        distinct_hint=RANK_WINDOW_MAX_DISTINCT,  # Zipf frequencies: dictionary-sized
    ).select(
        "token", "n", "rank"
    )


# ---------------------------------------------------------------------------
_REP_N = 3

_REP_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - {_REP_N - 2}),
                              i -> array_to_string(toks[i:i+{_REP_N - 1}], ' '))
                   AS shingles
        FROM t WHERE len(toks) >= {_REP_N}
    )
    SELECT doc_id,
           CAST(len(shingles) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(shingles)) AS BIGINT) AS n_distinct,
           1.0 - (CAST(len(list_distinct(shingles)) AS DOUBLE) / len(shingles))
               AS repetition_ratio
    FROM sh
"""


def _rep_shingles_expr(toks_col: str) -> F.Column:
    """Per-row {_REP_N}-gram shingle array over an already-projected token
    array column — the d61 scan-side pattern (transform over sequence +
    array_join(slice)). Valid only where size(toks) >= _REP_N."""
    return F.expr(
        f"transform(sequence(1, size({toks_col}) - {_REP_N - 1}),"
        f" i -> array_join(slice({toks_col}, i, {_REP_N}), ' '))"
    )


@REGISTRY.add("d17_repetition_ratio", _REP_ORACLE, "text", "quality")
def d17_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-{_REP_N}-gram fraction per document — the Gopher/C4-style
    repetition quality filter (a high ratio flags boilerplate/spam before
    any model-based scoring).

    Shingles are a pure scan-side array expression (d61's transform-over-
    sequence pattern): the counts per doc come from size/array_distinct of
    the per-row array, so the plan has ZERO exchanges — no token-stream
    shuffle, no per-doc window sort, no aggregation (r14: the previous
    posexplode + lead-window + count_distinct shape shuffled the whole
    token stream and re-aggregated it just to recover per-doc counts the
    row already knew; measured 0.61 → 0.21 s at sf0.1 with value-identical
    output). Single IEEE division per row — bit-identical across engines.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = _rep_shingles_expr("_toks")
    return (
        d.where(F.size(toks) >= _REP_N)
        .select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            F.size(sh).cast("bigint").alias("n_shingles"),
            F.size(F.array_distinct(sh)).cast("bigint").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_distinct",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_shingles")
            ).alias("repetition_ratio"),
        )
    )


# ---------------------------------------------------------------------------
_CONTAM_ORACLE = """
    WITH fp AS (
        SELECT DISTINCT
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS fp,
               source
        FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
"""


@REGISTRY.add("d18_source_contamination", _CONTAM_ORACLE, "dedup", "contamination")
def d18_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: for every source pair, how many
    bag-of-words fingerprints (md5 of the sorted distinct token set)
    appear in BOTH — the train/test-leakage check run before any split
    ships.

    Scale shape: one distinct on (fingerprint, source) — fact-scale but
    map-side-combining — then a self-equi-join on the 128-bit fingerprint
    (hash join, collision-bucketed like d04) and a pair-keyed count. No
    text ever crosses the shuffle; only fingerprints do.
    """
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("fp"),
        "source",
    ).distinct()
    a = fp.select("fp", F.col("source").alias("src_a"))
    b = fp.select("fp", F.col("source").alias("src_b"))
    return (
        a.join(b, "fp")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


# ---------------------------------------------------------------------------
# Clustering runs at a TIGHTER threshold than pair reporting (d06): the
# transitive closure of 0.9-pairs chains through borderline matches and
# merges distinct documents; 0.95 is the conventional keep-one-per-cluster
# bar. (On this corpus: 953k pairs at >=0.9 vs 191k at >=0.95.)
_CLUSTER_T = 0.95
_CLUSTER_CTES = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM documents
    ), tok AS (
        SELECT doc_id, unnest(tokens) AS token FROM toks
    ), mh AS (
        SELECT doc_id, {_mh_cols}
        FROM tok GROUP BY doc_id
    ), {_BAND_CAND_CTES}, pairs AS (
        SELECT c.i, c.j
        FROM cand c
        JOIN toks ta ON ta.doc_id = c.i
        JOIN toks tb ON tb.doc_id = c.j
        WHERE len(list_intersect(ta.tokens, tb.tokens)) * 1.0
                / (len(ta.tokens) + len(tb.tokens)
                   - len(list_intersect(ta.tokens, tb.tokens)))
              >= {_CLUSTER_T}
    ), e AS (
        SELECT i AS src, j AS dst FROM pairs
        UNION ALL
        SELECT j, i FROM pairs
    ), walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node
        WHERE w.label < e.dst
    ), comp AS (
        SELECT node AS doc_id, MIN(label) AS canonical_id
        FROM walk GROUP BY node
    )"""

_CLUSTER_ORACLE = f"""{_CLUSTER_CTES}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(canonical_id AS BIGINT) AS canonical_id,
           CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
               AS cluster_size,
           doc_id = canonical_id AS is_canonical
    FROM comp
"""


# The RESOLVED cluster-canonical table (doc_id, canonical_id,
# cluster_size, is_canonical) is the third shared suite artifact: d19
# registers it, and d41 (savings), d43 (funnel), d48 (quality
# canonicals) and d58 (leakage-free split) all compose it. Before round
# 8 each consumer re-ran the iterative CC label rounds from the pair
# stream; a production pipeline resolves clusters ONCE per corpus and
# every downstream decision reads the table. Same cache contract as
# _PAIR_STREAM_CACHE / _BPE_ENC_CACHE: localCheckpoint-materialized,
# keyed by (session, dataset), stopped-session eviction; bench.py times
# the build separately under `shared`.
_CLUSTER_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cluster_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.build import connected_components

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CLUSTER_CACHE.get(key)
    if cached is None:
        d = load(spark, sf_dir, "documents")
        pairs = _lsh_pair_stream(spark, sf_dir).where(
            F.col("jaccard") >= _CLUSTER_T
        )
        # symmetrize: the CC operator propagates labels along edge
        # direction
        edges = pairs.select(
            F.col("i").alias("src"), F.col("j").alias("dst")
        ).unionByName(
            pairs.select(F.col("j").alias("src"), F.col("i").alias("dst"))
        )
        # the near-dup graph mixes dense cliques with long low-overlap
        # chains: hand off to star contraction after 3 propagation rounds
        # (measured fastest here; the default 6-round probe pays 3 extra
        # full-edge joins before reaching the same contraction)
        comp = connected_components(
            d.select("doc_id"), edges, id_col="doc_id", prop_rounds=3
        )
        w = W.partitionBy("canonical_id")
        cached = (
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("label").alias("canonical_id"),
            )
            .withColumn(
                "cluster_size", F.count(F.lit(1)).over(w).cast("bigint")
            )
            .withColumn(
                "is_canonical", F.col("doc_id") == F.col("canonical_id")
            )
            .localCheckpoint()
        )
        for k in [k for k in _CLUSTER_CACHE if k[0] != key[0]]:
            del _CLUSTER_CACHE[k]
        _CLUSTER_CACHE[key] = cached
    return cached


@REGISTRY.add("d19_dedup_clusters", _CLUSTER_ORACLE, "dedup", "lsh", "iterative")
def d19_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS with canonical selection — the step a
    production dedup pipeline runs after pair detection: transitive
    closure over the MinHash-LSH pair graph (a ~ b ~ c puts a,c in one
    cluster even when a,c never collided), canonical = min doc_id per
    component, keep-one-per-cluster via ``is_canonical``.

    Composition of two already-verified operators: d06's verified pair
    stream (eagerly materialized — the iterative step must not recompute
    LSH per round) feeds the auto-selecting connected-components
    operator (label propagation here; large/small-star contraction on
    high-diameter graphs). The oracle recomputes the same clusters via
    DuckDB's recursive-CTE reachability — a different fixpoint mechanism
    agreeing on every label, as in g05.

    Two suite artifacts are SHARED here: the pair stream with d06
    (``_lsh_pair_stream`` — band candidates don't depend on the
    threshold, so filtering to 0.95 is value-identical to a full run at
    0.95), and the resolved cluster table itself (``_cluster_table``)
    with d41/d43/d48/d58 — clusters are resolved once per (session,
    dataset) and every consumer reads the materialized table.
    """
    return _cluster_table(spark, sf_dir)


# ---------------------------------------------------------------------------
# Curation decision: the keep/reject verdict a training-data pipeline
# actually ships, composing the individually-verified signals (d02 lang,
# d03 quality, d17 repetition) into a first-failing-rule CASE.
_CUR_MIN_TOKENS = 20
_CUR_MIN_QUALITY = 0.55
_CUR_MAX_REP = 0.5

_CURATE_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents),
    sh AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - {_REP_N - 2}),
                              i -> array_to_string(toks[i:i+{_REP_N - 1}], ' '))
                   AS shingles
        FROM t WHERE len(toks) >= {_REP_N}
    ),
    rep AS (
        SELECT doc_id,
               1.0 - (CAST(len(list_distinct(shingles)) AS DOUBLE) / len(shingles))
                   AS rep_ratio
        FROM sh
    ),
    sig AS (
        SELECT t.doc_id,
               len(t.toks) AS n_tokens,
               {_argmax_sql.replace("text", "t.text")} AS lang_pred,
               least(1.0, len({_TOKS.replace("text", "t.text")}) / 100.0) * 0.4
               + len({_DTOKS.replace("text", "t.text")}) * 1.0
                 / len({_TOKS.replace("text", "t.text")}) * 0.3
               + least(1.0, ((LENGTH(t.text) - (len({_TOKS.replace("text", "t.text")}) - 1))
                             * 1.0 / len({_TOKS.replace("text", "t.text")})) / 8.0) * 0.2
               + least(1.0, len(list_filter({_TOKS.replace("text", "t.text")},
                                            x -> x IN ({_STOP_LST}))) / 5.0) * 0.1
                   AS quality,
               COALESCE(r.rep_ratio, 0.0) AS rep_ratio
        FROM t LEFT JOIN rep r ON t.doc_id = r.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           lang_pred, quality, rep_ratio,
           CASE
             WHEN n_tokens < {_CUR_MIN_TOKENS} THEN 'too_short'
             WHEN lang_pred <> 'en' THEN 'non_english'
             WHEN quality < {_CUR_MIN_QUALITY} THEN 'low_quality'
             WHEN rep_ratio > {_CUR_MAX_REP} THEN 'repetitive'
             ELSE 'kept'
           END AS verdict
    FROM sig
"""


@REGISTRY.add("d20_curation_filter", _CURATE_ORACLE, "text", "curation")
def d20_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/reject curation verdict per document — first-failing-rule
    CASE over the composed quality signals: token count, marker-word
    language ID (d02), heuristic quality score (d03), repeated-n-gram
    ratio (d17). This is the decision column a curation pipeline writes
    before materializing the filtered corpus.

    Scale shape: EVERY signal — lang, quality, token count, and the
    repetition ratio — is a scan-side column expression (r14: the
    repetition ratio was the d17 shingle aggregation joined back on
    doc_id, which shuffled the token stream, sorted a per-doc window and
    re-joined the corpus just to recover a per-row number; it now uses
    d17's transform-over-sequence shingle array, so the whole verdict is
    ONE exchange-free projection). The CASE is evaluated JVM-side; no
    Python anywhere.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = _rep_shingles_expr("_toks")
    sig = (
        d.select(
            "doc_id",
            T.lang_id(F.col("text")).alias("lang_pred"),
            T.quality_score(F.col("text")).alias("quality"),
            toks.alias("_toks"),
        )
        .select(
            "doc_id",
            F.size("_toks").cast("bigint").alias("n_tokens"),
            "lang_pred",
            "quality",
            F.when(
                F.size("_toks") >= _REP_N,
                F.lit(1.0)
                - F.size(F.array_distinct(sh)).cast("double") / F.size(sh),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )
    )
    verdict = (
        F.when(F.col("n_tokens") < _CUR_MIN_TOKENS, "too_short")
        .when(F.col("lang_pred") != "en", "non_english")
        .when(F.col("quality") < _CUR_MIN_QUALITY, "low_quality")
        .when(F.col("rep_ratio") > _CUR_MAX_REP, "repetitive")
        .otherwise("kept")
    )
    return sig.select(
        "doc_id", "n_tokens", "lang_pred", "quality", "rep_ratio",
        verdict.alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Incremental corpus-history dedup: the operation a daily 100 TB ingest
# actually runs — the NEW batch is checked against the signature store of
# everything already accepted, without recomputing (or even reading) old
# corpus text. Here the "corpus" is the 80% of documents with
# doc_id % 5 != 0 and the "batch" the remaining 20%; the pytest resume
# test exercises the persisted-store path (write_signature_store +
# dedup_against_store) and proves no corpus recompute.
#
# The oracle mirrors SEMANTICS, not the index: a batch doc is a near-dup
# when ≥ ceil(16·0.9) = 15 of its 16 minhash components agree with a
# corpus doc. Any such pair pigeonholes ≥3 of 4 bands into exact
# collision, so the banded Spark path and the threshold-only cross-join
# oracle produce identical result sets.
_INC_MIN_AGREE = 15
_INC_AGREE_SQL = " + ".join(
    f"CAST(b.mh{i} = c.mh{i} AS INT)" for i in range(_N_HASHES)
)
_INC_FP = "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
_INC_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
    ), batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), ctok AS (
        SELECT doc_id, unnest({_DTOKS}) AS token FROM corpus
    ), cmh AS (
        SELECT doc_id, {_mh_cols} FROM ctok GROUP BY doc_id
    ), btok AS (
        SELECT doc_id, unnest({_DTOKS}) AS token FROM batch
    ), bmh AS (
        SELECT doc_id, {_mh_cols} FROM btok GROUP BY doc_id
    ), cfp AS (
        SELECT doc_id, {_INC_FP} AS fp FROM corpus
    ), bfp AS (
        SELECT doc_id, {_INC_FP} AS fp FROM batch
    ), exact AS (
        SELECT b.doc_id AS bid, MIN(c.doc_id) AS exact_id
        FROM bfp b JOIN cfp c ON b.fp = c.fp GROUP BY b.doc_id
    ), near AS (
        SELECT b.doc_id AS bid, MIN(c.doc_id) AS near_id
        FROM bmh b JOIN cmh c ON {_INC_AGREE_SQL} >= {_INC_MIN_AGREE}
        GROUP BY b.doc_id
    )
    SELECT b.doc_id,
           (e.exact_id IS NOT NULL OR n.near_id IS NOT NULL) AS dup_of_corpus,
           CAST(COALESCE(e.exact_id, n.near_id, -1) AS BIGINT) AS matched_id,
           CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
                WHEN n.near_id IS NOT NULL THEN 'near'
                ELSE 'none' END AS match_kind
    FROM batch b
    LEFT JOIN exact e ON b.doc_id = e.bid
    LEFT JOIN near n ON b.doc_id = n.bid
"""


@REGISTRY.add("d21_incremental_dedup", _INC_ORACLE, "dedup", "incremental")
def d21_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch dedup against the accumulated corpus: exact (fingerprint
    equi-join) + near (LSH band probe, minhash-agreement verify), batch
    side broadcast so the corpus only ever streams map-side. Production
    entry point is ``incremental_dedup.dedup_against_store`` (persisted
    signature parquet, no corpus recompute on resume); this registered
    form derives both signature tables in-plan from the same split so
    the oracle can see identical inputs."""
    from ..operators import incremental_dedup as inc

    from ..io import fs

    d = load(spark, sf_dir, "documents")
    # ONE signature pass over the table, materialized, then split — the
    # in-plan analogue of the persisted store. Two separate
    # signature_table plans would scan + project the text twice, and the
    # 5 probe branches would re-run the corpus projection each (measured
    # ~2x on d21 before the checkpoint). The checkpoint partition count
    # is sized to the SOURCE (~64 MB of input per partition, floor 4),
    # not the box: the signature table is a tiny fraction of its text,
    # and every one of its partitions rides into all 6 probe consumers
    # as a task each — defaultParallelism partitions of a 5k-row table
    # meant 4 band branches × 32 near-empty tasks (measured: 32→4
    # partitions cut the checkpoint 2.9→0.7 s and the match 2.3→1.1 s
    # at sf0.1, identical rows). A 100 TB landing dir still fans out.
    nparts = max(
        4, -(-fs.size_bytes(spark, f"{sf_dir}/documents.parquet") // (64 << 20))
    )
    sig_all = (
        inc.signature_table(d, "doc_id", "text")
        .repartition(nparts)
        .localCheckpoint()
    )
    corpus_sig = sig_all.where(F.col("doc_id") % 5 != 0)
    batch_sig = sig_all.where(F.col("doc_id") % 5 == 0)
    return inc.match_against_corpus(batch_sig, corpus_sig)


# ---------------------------------------------------------------------------
# d22: chunk-level (paragraph-style) dedup — the CCNet/Dolma-shaped op:
# dedup at sub-document granularity so boilerplate shared across pages is
# measurable without throwing whole documents away. Scale shape: one
# explode (docs -> ~n_tokens/20 chunks), one groupBy(md5) for ownership,
# one join back, one groupBy(doc) — every shuffle keyed, no pair space.
_CHUNK = 20
_CHUNK_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    chunks AS (
        SELECT doc_id,
               unnest([md5(array_to_string(ts[(i-1)*{_CHUNK}+1 : i*{_CHUNK}], ' '))
                       FOR i IN generate_series(1, CAST(ceil(len(ts) / {_CHUNK}.0) AS BIGINT))]) AS h
        FROM t
    ),
    own AS (SELECT h, MIN(doc_id) AS owner FROM chunks GROUP BY h)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN o.owner < c.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN o.owner < c.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS dup_chunk_ratio
    FROM chunks c JOIN own o USING (h)
    GROUP BY c.doc_id
"""


@REGISTRY.add("d22_chunk_dedup", _CHUNK_ORACLE, "dedup", "text")
def d22_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup: split each document into consecutive 20-token
    chunks, assign each distinct chunk a canonical owner (min doc_id),
    and report per document how much of it is copied from earlier
    documents. A doc's own repeated chunks don't count (owner == self);
    cross-document copies do, instance by instance."""
    d = load(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id", F.explode(T.token_chunks(F.col("text"), _CHUNK)).alias("chunk")
    ).select("doc_id", F.md5("chunk").alias("h"))
    own = chunks.groupBy("h").agg(F.min("doc_id").alias("owner"))
    dup = F.when(F.col("owner") < F.col("doc_id"), F.lit(1)).otherwise(F.lit(0))
    return (
        chunks.join(own, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks")).alias(
                "dup_chunk_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# d23: benchmark decontamination — the GPT-3-style 13-gram collision
# check: flag every training document sharing any 13-gram with the
# benchmark set (here: source 'src0' plays the held-out benchmark).
# Scale shape: the benchmark gram set is DISTINCT and usually tiny
# relative to the corpus; the probe is one equi-join on a 128-bit hash
# (broadcastable when the benchmark fits), then one groupBy(doc). No
# pair space, no cross join — same inverted-index idea as d08/d18 but
# containment-against-a-reference semantics.
_NGRAM = 13
_DECON_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents
        WHERE len(string_split(text, ' ')) >= {_NGRAM}
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_distinct([md5(array_to_string(ts[i : i+{_NGRAM - 1}], ' '))
                       FOR i IN generate_series(1, len(ts) - {_NGRAM - 1})])) AS h
        FROM t
    ),
    bench AS (SELECT DISTINCT h FROM grams WHERE source = 'src0'),
    hits AS (
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM grams g JOIN bench b USING (h)
        WHERE g.source <> 'src0'
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_grams,
           COALESCE(h.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.source <> 'src0'
"""


@REGISTRY.add("d23_benchmark_decontamination", _DECON_ORACLE, "dedup", "text")
def d23_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-vs-benchmark contamination: a training doc is flagged
    when any of its distinct 13-grams appears in the benchmark corpus.
    Docs shorter than 13 tokens have no grams and are clean by
    definition (but still emitted — the output covers every training
    doc)."""
    d = load(spark, sf_dir, "documents")
    grams = d.where(F.size(T.tokens(F.col("text"))) >= _NGRAM).select(
        "doc_id",
        "source",
        F.explode(T.word_shingles(F.col("text"), _NGRAM)).alias("g"),
    ).select("doc_id", "source", F.md5("g").alias("h"))
    bench = grams.where(F.col("source") == "src0").select("h").distinct()
    hits = (
        grams.where(F.col("source") != "src0")
        .join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        d.where(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias(
                "n_contaminated_grams"
            ),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# d24: curriculum bucketing — global NTILE(10) by token count WITHOUT the
# single-partition window a naive ``ntile().over(Window.orderBy(...))``
# would create. The two-phase rank (operators/ranks.py: distinct-value
# histogram + tiny cumulative window, or range-partitioned prefix sum at
# high cardinality) yields the exact 1-based row number over a UNIQUE
# composite key, and SQL NTILE is a closed-form function of (row_number,
# n, k): the first n%k buckets take floor(n/k)+1 rows, the rest
# floor(n/k).
_NTILE_K = 10
_NTILE_ORACLE = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(NTILE(10) OVER (ORDER BY len(string_split(text, ' ')), doc_id) AS BIGINT)
               AS bucket
    FROM documents
    WHERE text IS NOT NULL
"""


@REGISTRY.add("d24_length_ntile", _NTILE_ORACLE, "text", "window")
def d24_length_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum buckets: every document assigned to one of 10
    equal-ish global buckets by (token count, doc_id) order — checked
    against DuckDB's NTILE. The order key is made unique by packing
    doc_id into the low digits, so rank == row_number and the bucket
    formula is exact."""
    from ..operators.ranks import spark_rank

    # Curriculum domain = documents WITH text (r11 alignment): a NULL
    # token count has no place in a length ordering. The explicit filter
    # also keeps the driver-scalar n consistent with the ranked set — the
    # rank operator drops NULL keys, so an unfiltered count() would size
    # the bucket formula over rows that never get ranked.
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).select("doc_id", T.token_count(F.col("text")).alias("n_tokens"))
    # unique composite order key: (n_tokens, doc_id) packed into one
    # bigint (doc_id stride safely above any doc_id in the corpus)
    keyed = d.withColumn(
        "_k", F.col("n_tokens") * F.lit(1_000_000_000) + F.col("doc_id")
    )
    n = keyed.count()  # computed-k pattern (SURVEY W3): driver scalar
    k = _NTILE_K
    if n == 0:  # NTILE over an empty corpus is legitimately empty
        return d.select(
            "doc_id", "n_tokens", F.lit(0).cast("bigint").alias("bucket")
        ).limit(0)
    # n < k is legal (NTILE over 1..9 rows = buckets of size <= 1): with
    # q = 0 and rem = n the cut covers every row, so bucket == row_number
    # and the q-division branch is never evaluated (r10 advisor note).
    q, rem = divmod(n, k)
    ranked = spark_rank(keyed, "_k", out_col="_r", ascending=True)
    r = F.col("_r")
    cut = rem * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    bucket = F.when(
        r <= cut, F.floor((r - 1) / (q + 1)) + 1
    ).otherwise(F.lit(rem) + F.floor((r - cut - 1) / q) + 1)
    return ranked.select(
        "doc_id", "n_tokens", bucket.cast("bigint").alias("bucket")
    )


# ---------------------------------------------------------------------------
# d25: deterministic global training-order shuffle — reproducible corpus
# order for training runs (same order on any cluster, any partitioning,
# any retry). Order key = md5 of the doc id with the id appended as a
# tie-break; position from the two-phase global rank (operators/ranks.py)
# so no single-partition window exists at any corpus size.
_SHUF_ORACLE = """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
"""


@REGISTRY.add("d25_deterministic_shuffle", _SHUF_ORACLE, "text", "sampling")
def d25_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible pseudo-random global order: md5-keyed rank, unique by
    construction (the 32-hex md5 is extended with the zero-padded id, so
    lexicographic order on the packed key == (md5, doc_id) order)."""
    from ..operators.ranks import spark_rank

    d = load(spark, sf_dir, "documents").select("doc_id")
    keyed = d.withColumn(
        "_k",
        F.concat(
            F.md5(F.col("doc_id").cast("string")),
            F.lit("-"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        ),
    )
    return spark_rank(keyed, "_k", out_col="shuffle_pos", ascending=True).select(
        "doc_id", F.col("shuffle_pos").cast("bigint").alias("shuffle_pos")
    )


# ---------------------------------------------------------------------------
# d27: BM25 retrieval over an in-plan inverted index — the contamination /
# boilerplate-mining primitive ("which training docs score highest against
# this query?"). Scoring spec + scale notes live in operators/search.py;
# scores are integer micro-units so the per-doc sum is order-exact.
_BM25_TERMS = ["dup", "spark", "vector", "merge"]
_BM25_K = 25

from ..operators import search as _search  # noqa: E402


@REGISTRY.add(
    "d27_bm25_topk",
    _search.bm25_topk_oracle(_BM25_TERMS, _BM25_K),
    "text",
    "search",
)
def d27_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 documents for the query {dup spark vector merge}:
    explode→isin prunes postings to the query vocabulary before any
    shuffle, df/stats broadcast, top-k via TakeOrderedAndProject."""
    d = load(spark, sf_dir, "documents")
    return _search.bm25_topk(d, _BM25_TERMS, k=_BM25_K)


# ---------------------------------------------------------------------------
# d73: HYBRID RETRIEVAL FUSION — the step a RAG-curation pipeline runs
# once it has BOTH a lexical index (d27's BM25) and a dense index
# (d10/d13's ANN): reciprocal-rank fusion of the two top-k lists,
# RRF = Σ_legs 10⁶ div (60 + rank) in exact integers (the Cormack/
# Clarke/Buettcher constant 60). Lexical leg = d27's exact query and k;
# dense leg = cosine of every embedding to one pinned query vector
# (vec 0) — an O(n) broadcast-one-vector JVM fold + TakeOrderedAndProject,
# never a pair join — so both inputs are k-bounded before the fusion
# and the fusion itself is k-sized (a full-outer join of two ≤k-row
# lists; a doc missing from a leg contributes 0). Both leg oracles nest
# verbatim.
_RRF_K = 25
_RRF_C = 60
_RRF_QVEC = 0
_RRF_ORACLE = f"""
    WITH lex AS ({_search.bm25_topk_oracle(_BM25_TERMS, _RRF_K)}),
    e AS (SELECT * FROM ({_E_CTE_FIN2}) WHERE v IS NOT NULL),
    q AS (SELECT v AS qv, norm AS qn FROM e WHERE vec_id = {_RRF_QVEC}),
    dcos AS (
        SELECT e.vec_id AS id,
               {_DOT.format(a='e.v', b='q.qv')} / (e.norm * q.qn) AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> {_RRF_QVEC}
    ),
    dense AS (
        SELECT id, vr FROM (
            SELECT id, ROW_NUMBER() OVER (ORDER BY cosine DESC, id ASC) AS vr
            FROM dcos
        ) WHERE vr <= {_RRF_K}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.id) AS doc_id,
               CAST(l.rank AS BIGINT) AS lex_rank,
               CAST(d.vr AS BIGINT) AS vec_rank,
               COALESCE(1000000 // ({_RRF_C} + l.rank), 0)
                 + COALESCE(1000000 // ({_RRF_C} + d.vr), 0) AS rrf_micro
        FROM lex l FULL OUTER JOIN dense d ON d.id = l.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank,
           CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id)
                   AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {_RRF_K}
"""


@REGISTRY.add("d73_hybrid_rrf_fusion", _RRF_ORACLE, "text", "search",
              "similarity")
def d73_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-25 (d27's exact lexical
    query) and the dense top-25 (cosine to the pinned query vector,
    computed as a broadcast-one-vector fold over the embeddings — O(n)
    map work, top-k via TakeOrderedAndProject). RRF scores are exact
    integer micro-units, so the fused order is hash-stable; the fusion
    join touches only the two ≤k-row lists."""
    d = load(spark, sf_dir, "documents")
    lex = _search.bm25_topk(d, _BM25_TERMS, k=_RRF_K).select(
        F.col("doc_id"), "rank"
    )

    # r15 nullemb widening: a NULL component makes the dense leg's fold
    # cosine NULL (row silently leaves the rank where the oracle keeps
    # it) — NULL-or-NaN-component vectors leave the domain on both
    # engines (zero rows filtered on clean corpora)
    e = sim.with_norm(
        sim.drop_nonfinite_vectors(
            sim._drop_null_vectors(
                load(spark, sf_dir, "embeddings"), "embedding"
            ),
            "embedding",
        ),
        "embedding",
    )
    q = e.where(F.col("vec_id") == _RRF_QVEC).select(
        F.col("_v").alias("qv"), F.col("norm").alias("qn")
    )
    dcos = (
        e.where(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            (sim._dot(F.col("_v"), F.col("qv"))
             / (F.col("norm") * F.col("qn"))).alias("cosine"),
        )
    )
    topd = dcos.orderBy(F.col("cosine").desc(), F.col("id")).limit(_RRF_K)
    # unpartitioned window, DELIBERATE: ranks only the <= k limit
    # survivors (TakeOrderedAndProject already cut the corpus)
    wv = W.orderBy(F.col("cosine").desc(), F.col("id"))
    dense = topd.withColumn(
        "rank", F.row_number().over(wv).cast("bigint")
    ).select(F.col("id").alias("doc_id"), "rank")

    return _search.rrf_fuse(
        [lex, dense], id_col="doc_id", k=_RRF_C, top=_RRF_K
    ).select(
        "doc_id",
        F.col("rank_1").alias("lex_rank"),
        F.col("rank_2").alias("vec_rank"),
        "rrf_micro",
        "fused_rank",
    )


# ---------------------------------------------------------------------------
# d28: corpus-trained bigram-LM NLL per document — the KenLM-shaped
# quality-filter signal (high NLL ⇒ unlike the corpus). Model tables are
# keyed aggregations (vocab², not corpus-sized); see operators/search.py.
@REGISTRY.add(
    "d28_bigram_lm_nll",
    _search.BIGRAM_NLL_ORACLE,
    "text",
    "quality",
)
def d28_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM trained on the corpus, scoring each
    document's total + mean negative log-likelihood in micro-nats."""
    d = load(spark, sf_dir, "documents")
    return _search.bigram_nll(d)


# ---------------------------------------------------------------------------
# d26: SemDeDup-shaped semantic dedup — cluster embeddings to IVF cells,
# then mark any vector with an earlier same-cell neighbor at cosine ≥ τ
# as a duplicate of the smallest such id. Unlike d09 (global pair list)
# this emits a per-vector KEEP/DROP verdict and never leaves the cell key,
# which is what makes it the 100 TB path: candidate generation is a
# keyed self-join, not a pair scan. The cell count is DERIVED FROM THE
# CORPUS COUNT in both engines — max(16, ceil(n/512)), the operator's
# auto-sizing — so per-cell population (and thus pair work per row) stays
# constant at any sf instead of the old fixed-16-cell O(n²/16) asymptote,
# while the oracle computes the identical value and stays comparable.
# Operator: similarity.semantic_dedup.
_SEM_ROWS, _SEM_T = 512, 0.4
_SEM_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN}),
    nc AS (SELECT GREATEST(16, CAST(CEIL(COUNT(*) / {_SEM_ROWS}.0) AS BIGINT)) AS n
           FROM e),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < (SELECT n FROM nc)),
    scored AS (
        SELECT e.vec_id, c.cid, {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) AS ccos
        FROM e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    dup AS (
        SELECT b.vec_id AS j, MIN(a.vec_id) AS dup_of
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e q ON q.vec_id = a.vec_id
        JOIN e m ON m.vec_id = b.vec_id
        WHERE {_DOT.format(a='q.v', b='m.v')} / (q.norm * m.norm) >= {_SEM_T}
        GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           d.dup_of IS NOT NULL AS is_dup,
           CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of
    FROM assign s LEFT JOIN dup d ON d.j = s.vec_id
"""


@REGISTRY.add("d26_semantic_dedup", _SEM_ORACLE, "dedup", "embedding", "ivf")
def d26_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector semantic KEEP/DROP: cosine-nearest seed centroid cell,
    dup when an earlier same-cell vector sits at cosine ≥ 0.4. Cell count
    auto-sizes with the corpus (n_cells=None → max(16, ceil(n/512)));
    the oracle derives the identical count, so the registered artifact
    carries no fixed-cell quadratic asymptote."""
    e = load(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        e, "vec_id", "embedding", n_cells=None, threshold=_SEM_T,
        target_cell_rows=_SEM_ROWS,
    )


# ---------------------------------------------------------------------------
# d29: training-mix computation — per-source corpus shares and
# temperature-flattened sampling weights (w_s ∝ tokens_s^0.5, the
# standard alpha-sampling that upweights small sources). The sqrt is
# IEEE-correctly-rounded (bit-identical across engines); weights are
# floored to integer micro-units BEFORE the normalizing sum so the
# denominator is an exact BIGINT — same discipline as d27/d28.
_MIX_ORACLE = f"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(FLOOR(sqrt(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS w_e6
        FROM documents GROUP BY source
    ), t AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(w_e6) AS BIGINT) AS total_w
        FROM s
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           CAST(s.n_tokens AS DOUBLE) / t.total_tokens AS token_share,
           s.w_e6,
           CAST(s.w_e6 AS DOUBLE) / t.total_w AS sample_weight
    FROM s CROSS JOIN t
"""


@REGISTRY.add("d29_source_mixture", _MIX_ORACLE, "text", "sampling")
def d29_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document/token totals, corpus share, and sqrt-
    temperature sampling weight — the mixture table a training loader
    consumes. One groupBy(source) plus a broadcast 1-row total."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("n_tokens"),
    ).withColumn(
        "w_e6",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)),
    )
    t = s.agg(
        F.sum("n_tokens").alias("total_tokens"), F.sum("w_e6").alias("total_w")
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total_tokens")).alias("token_share"),
        "w_e6",
        (F.col("w_e6").cast("double") / F.col("total_w")).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# d30: mixture RESAMPLING — the loader-side consumer of d29's weights:
# given a global token budget (⅕ of the corpus), derive each source's
# target token count from its temperature weight, convert to a
# per-source acceptance threshold in integer ppm, and accept documents
# by deterministic md5 bucket (the same engine-portable sampler as
# s01/s06 — rerunnable, resumable, no RNG state). Output is the per-
# source audit row a curation run logs: targets vs what the hash
# actually kept. All arithmetic is BIGINT (ppm + floor division);
# production corpora near 2^63/1e6 tokens would lift the ppm math to
# DECIMAL(38,0), noted here rather than hidden.
_RESAMPLE_ORACLE = f"""
    WITH pd AS (
        SELECT doc_id, source,
               CAST(len({_TOKS}) AS BIGINT) AS n_tok
        FROM documents
    ),
    s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(FLOOR(sqrt(CAST(SUM(n_tok) AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS w_e6
        FROM pd GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(SUM(w_e6) AS BIGINT) AS total_w FROM s),
    s3 AS (
        SELECT source, n_docs, n_tokens,
               ((total_tokens // 5) * w_e6) // total_w AS target_tokens,
               LEAST(1000000,
                     ((((total_tokens // 5) * w_e6) // total_w) * 1000000)
                     // n_tokens) AS accept_ppm
        FROM s CROSS JOIN t
    ),
    k AS (
        SELECT pd.source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(pd.n_tok) AS BIGINT) AS kept_tokens
        FROM pd JOIN s3 USING (source)
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000 < s3.accept_ppm
        GROUP BY pd.source
    )
    SELECT s3.source, s3.n_docs, s3.n_tokens, s3.target_tokens,
           s3.accept_ppm,
           COALESCE(k.kept_docs, 0) AS kept_docs,
           COALESCE(k.kept_tokens, 0) AS kept_tokens
    FROM s3 LEFT JOIN k ON s3.source = k.source
"""


@REGISTRY.add("d30_mixture_resample", _RESAMPLE_ORACLE, "text", "sampling")
def d30_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic per-source resample hitting d29's temperature
    targets under a ⅕-corpus token budget: per source, the target vs the
    tokens the md5-bucket sampler actually kept. Two groupBys on source
    plus one broadcast of the dictionary-sized mixture table — the accept
    test itself is a stateless per-row predicate, so the kept set is
    reproducible shard-by-shard at any scale."""
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents")
    pd_ = d.select(
        "doc_id", "source", T.token_count(F.col("text")).alias("n_tok")
    )
    s = pd_.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    ).withColumn(
        "w_e6",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)),
    )
    t = s.agg(
        F.sum("n_tokens").alias("total_tokens"), F.sum("w_e6").alias("total_w")
    )
    s3 = s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("((total_tokens div 5) * w_e6) div total_w").alias("target_tokens"),
    ).withColumn(
        "accept_ppm",
        F.least(F.lit(1000000).cast("bigint"),
                F.expr("(target_tokens * 1000000) div n_tokens")),
    )
    kept = (
        pd_.join(F.broadcast(s3.select("source", "accept_ppm")), "source")
        .where(md5_bucket(F.col("doc_id")) % 1000000 < F.col("accept_ppm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tok").alias("kept_tokens"),
        )
    )
    return s3.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        "target_tokens",
        "accept_ppm",
        F.coalesce("kept_docs", F.lit(0)).cast("bigint").alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# d31: per-document n-gram NOVELTY — what fraction of a doc's distinct
# 3-word shingles appear in NO other document. The inverse lens of the
# pairwise overlap ops (d08 finds similar pairs, d18/d23 cross-source
# collisions): novelty ranks documents by how much unique text they
# contribute, the signal used to prioritize genuinely-new content in a
# crawl refresh. One inverted shingle index (explode + groupBy), one
# join back, one per-doc aggregate — no pair space.
_NOV_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents
        WHERE len({_TOKS}) >= {_NGRAM_N}
    ), owners AS (
        SELECT s, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN o.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique_shingles,
           CAST(SUM(CASE WHEN o.n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS novelty
    FROM sh JOIN owners o USING (s)
    GROUP BY sh.doc_id
"""


@REGISTRY.add("d31_ngram_novelty", _NOV_ORACLE, "text", "dedup")
def d31_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's distinct 3-shingles owned by it alone
    (shingle inverted index; docs with < 3 tokens have no shingles and
    are excluded by both engines)."""
    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(T.word_shingles(F.col("text"), _NGRAM_N)).alias("s")
    )
    owners = sh.groupBy("s").agg(F.countDistinct("doc_id").alias("n_docs"))
    uniq = F.when(F.col("n_docs") == 1, F.lit(1)).otherwise(F.lit(0))
    return (
        sh.join(owners, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(uniq).alias("n_unique_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique_shingles",
            (
                F.col("n_unique_shingles").cast("double") / F.col("n_shingles")
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# d32: BPE merge-candidate ranking — the inner step of byte-pair-encoding
# tokenizer training: count adjacent character pairs across the corpus
# weighted by word frequency; the top pair is the next merge. Vocabulary-
# sized state (distinct words, then distinct pairs), never corpus-sized:
# the word-frequency table is the only corpus-scale aggregation.
_BPE_K = 20
_BPE_ORACLE = f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
    tf AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
    pairs AS (
        SELECT substring(t, i, 2) AS pair, f
        FROM tf, UNNEST(generate_series(1, length(t) - 1)) AS g(i)
    ),
    agg AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS n_occurrences FROM pairs GROUP BY pair)
    SELECT pair, n_occurrences, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank
        FROM agg
    )
    WHERE rank <= {_BPE_K}
"""


@REGISTRY.add("d32_bpe_merge_candidates", _BPE_ORACLE, "text", "tokenizer")
def d32_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs by frequency-weighted corpus count
    — the next-merge ranking a BPE trainer computes each round."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # guard the 1-char-token case: Spark's sequence(1, 0) helpfully
    # yields a DESCENDING [1, 0] (the word_shingles pitfall), which would
    # mint phantom pairs DuckDB's empty generate_series never sees
    starts = F.when(
        F.length("t") >= 2, F.sequence(F.lit(1), F.length("t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = tf.select(
        F.explode(
            F.transform(starts, lambda i: F.col("t").substr(i, F.lit(2)))
        ).alias("pair"),
        "f",
    )
    agg = pairs.groupBy("pair").agg(F.sum("f").alias("n_occurrences"))
    topk = agg.orderBy(F.col("n_occurrences").desc(), F.col("pair")).limit(_BPE_K)
    # unpartitioned window, DELIBERATE: it ranks only the <= _BPE_K
    # survivors of the limit above (TakeOrderedAndProject already cut the
    # corpus), so the "No Partition Defined" warning it logs is benign —
    # a constant partitionBy(lit(0)) is folded away and does not hush it
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair"))
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# d32b: ITERATED BPE training — the actual tokenizer-training inner loop,
# not just one candidate ranking: K rounds of (count adjacent symbol
# pairs weighted by word frequency → take the top pair → greedily merge
# it left-to-right in every word). Returns the K merges in training
# order with their pre-merge corpus counts — the start of a merges.txt.
#
# Scale shape: the corpus-sized work (word-frequency table) happens
# ONCE; every round after that runs on the VOCABULARY (distinct words),
# which is what makes industrial BPE trainers feasible — and the same
# property holds here: K-1 of the K rounds touch only |V| rows. The
# top-1 pair is a 1-row broadcast into the merge step, so the whole
# K-round loop is one lazy plan with no driver collect.
#
# Greedy merge semantics (both engines, verified property-tested): fold
# left-to-right over the word's symbols; when the accumulator's last
# symbol == left and the next symbol == right, replace the last symbol
# with left||right (consuming both), else append. "aaa" + (a,a) →
# [aa, a], never [a, aa] — the standard non-overlapping BPE scan. The
# DuckDB oracle folds into a US-separator-joined string (list_reduce's
# accumulator must be scalar); symbols never contain chr(31), so the
# separator test is an exact last-symbol match.
_BPE_ITERS = 5


def _bpe_oracle(k: int) -> str:
    parts = [f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
    tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok
           WHERE t <> '' GROUP BY t),
    w0 AS (SELECT list_transform(generate_series(1, length(t)),
                                 i -> substring(t, i, 1)) AS s, f FROM tf)"""]
    for i in range(1, k + 1):
        parts.append(f""",
    p{i} AS (
        SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(SUM(f) AS BIGINT) AS n
        FROM w{i - 1}, UNNEST(generate_series(1, len(s) - 1)) AS g(i)
        GROUP BY 1, 2
    ),
    t{i} AS (SELECT lhs, rhs, n FROM p{i} ORDER BY n DESC, lhs, rhs LIMIT 1),
    w{i} AS (
        SELECT string_split(
            list_reduce(s, (acc, x) ->
                CASE WHEN (acc = t{i}.lhs
                           OR ends_with(acc, chr(31) || t{i}.lhs))
                          AND x = t{i}.rhs
                     THEN acc || t{i}.rhs
                     ELSE acc || chr(31) || x END),
            chr(31)) AS s, f
        FROM w{i - 1} CROSS JOIN t{i}
    )""")
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, n AS n_occurrences "
        f"FROM t{i}" for i in range(1, k + 1)
    )
    parts.append(f"\n    {sel}")
    return "".join(parts)


_BPE_ITER_ORACLE = _bpe_oracle(_BPE_ITERS)


def _bpe_merge_round(
    words: DataFrame, carry: tuple[str, ...] = (), checkpoint: bool = False
) -> tuple[DataFrame, DataFrame]:
    """One BPE round on a (s: array<string>, f: bigint) vocabulary table:
    returns (top1 pair DataFrame, merged vocabulary DataFrame). ``carry``
    names extra vocabulary columns (e.g. the source word) preserved
    through the merge — they never reach the pair counts.

    ``checkpoint=True`` (the ITERATED callers, d32b/_bpe_enc_table) cuts
    lineage per round with vocabulary-sized localCheckpoints: without it
    every round's BroadcastExchange of top1 re-executes ALL earlier
    rounds' merges from scratch — O(iters²) recomputation observed as 43
    stages for 5 rounds (optimization r14). Single-round callers (d32)
    keep the default and a byte-identical plan. Rows are unchanged
    either way: top1 is a total order (n desc, lhs, rhs) and the merge
    fold is deterministic."""
    starts = F.when(
        F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(F.explode(starts).alias("i"), "s", "f").select(
        F.element_at("s", F.col("i")).alias("lhs"),
        F.element_at("s", F.col("i") + 1).alias("rhs"),
        "f",
    )
    top1 = (
        pairs.groupBy("lhs", "rhs")
        .agg(F.sum("f").alias("n"))
        .orderBy(F.col("n").desc(), "lhs", "rhs")
        .limit(1)
    )
    if checkpoint:
        top1 = top1.localCheckpoint()  # 1 row; feeds the broadcast AND the caller's union
    j = words.crossJoin(F.broadcast(top1.select("lhs", "rhs")))
    # greedy left-to-right fold; F.get is the ANSI-safe last-element probe
    # (NULL on the empty accumulator, no out-of-bounds error)
    merged = j.select(
        *carry,
        F.aggregate(
            "s",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.get(acc, F.size(acc) - 1) == F.col("lhs"))
                & (x == F.col("rhs")),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.concat(F.col("lhs"), F.col("rhs"))),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("s"),
        "f",
    )
    if checkpoint:
        merged = merged.localCheckpoint()  # vocabulary-sized
    return top1, merged


@REGISTRY.add("d32b_bpe_training", _BPE_ITER_ORACLE, "text", "tokenizer")
def d32b_bpe_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First ``_BPE_ITERS`` BPE merges learned from the corpus: per round,
    the winning (lhs, rhs) pair and its frequency-weighted count."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    words = tf.select(
        F.transform(
            F.sequence(F.lit(1), F.length("t")),
            lambda i: F.col("t").substr(i, F.lit(1)),
        ).alias("s"),
        "f",
    )
    steps = []
    for step in range(1, _BPE_ITERS + 1):
        top1, words = _bpe_merge_round(words, checkpoint=True)
        steps.append(
            top1.select(
                F.lit(step).cast("bigint").alias("step"),
                "lhs",
                "rhs",
                F.col("n").cast("bigint").alias("n_occurrences"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


# ---------------------------------------------------------------------------
# d33: per-source TF-IDF top terms — the "what characterizes this slice
# of the corpus" keyword profile (source auditing: a crawl whose top
# terms are boilerplate names its extraction bug; per-domain profiles
# feed mixture decisions). tf is the term's occurrence count within the
# source, idf = ln(N/df) over corpus-wide document frequency. Search.py
# discipline: one double chain (exact-int operands, one ln) floored to
# micro-units per (source, term) — no float aggregation anywhere — then
# an integer-ranked row_number window takes the top 10 per source with a
# lexicographic tie-break. Scale shape: explode → two keyed aggs (term,
# source×term), a term-keyed join against the vocabulary-sized df table
# (not force-broadcast — unbounded on an open corpus), one broadcast
# 1-row N; the window only sorts within source partitions.
_TFIDF_K = 10

_TFIDF_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM words GROUP BY source, term),
    scored AS (
        SELECT tf.source, tf.term, tf.tf, df.df,
               CAST(FLOOR(CAST(tf.tf AS DOUBLE)
                          * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS score_e6
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score_e6, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY score_e6 DESC, term ASC
        ) AS rnk
        FROM scored
    )
    WHERE rnk <= {_TFIDF_K}
"""


@REGISTRY.add("d33_tfidf_top_terms", _TFIDF_ORACLE, "text", "search")
def d33_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 TF-IDF terms per source; integer micro-unit scores, exact
    corpus-wide document frequencies, deterministic tie-break."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    df_t = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = words.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df_t is VOCABULARY-sized — unbounded on an open web corpus, so it is
    # NOT force-broadcast: the term-keyed hash join is the scale plan and
    # AQE still picks a broadcast when the vocab is actually small.
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_e6",
            F.expr(
                "CAST(FLOOR(CAST(tf AS DOUBLE)"
                " * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TFIDF_K)
        .select(
            "source", "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score_e6",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# d34: SQ8 scalar quantization of the embedding column — the compression
# step an ANN index (IVF+SQ8) applies before storing vectors: per-vector
# min/max range, 8-bit code per dimension, and the reconstruction-error
# audit a quantization job must emit (a silently lossy quantizer is a
# recall bug found months later). One elementwise pass, no shuffle at
# all: every output row is a function of its input row, so the operator
# scales embarrassingly at any corpus size.
#
# Numeric discipline: q = LEAST(CAST(FLOOR((x-mn)/scale + 0.5) AS
# BIGINT), 255) is one IEEE double chain then one floor — identical in
# both engines; q_sum is an exact BIGINT signature of the whole code
# array (so the hash compare covers every dimension, not just min/max);
# the max reconstruction error is floored to integer nano-units.
_SQ8_ORACLE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               -- nanemb contract: NaN-containing vectors leave the
               -- domain on both engines; NULL vectors keep d34's
               -- existing NULL-row semantics
               WHERE embedding IS NULL
                  OR len(list_filter(embedding, x -> isnan(x))) = 0),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    q AS (
        SELECT vec_id, v, mn, mx,
               CASE WHEN mx = mn
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(v, x -> LEAST(CAST(FLOOR(
                         (x - mn) / ((mx - mn) / 255.0) + 0.5) AS BIGINT),
                         255)) END AS qv
        FROM m
    ),
    r AS (
        SELECT vec_id, qv,
               CASE WHEN mx = mn
                    THEN list_transform(v, x -> 0.0)
                    ELSE list_transform(list_zip(qv, v), p ->
                         abs((mn + CAST(p[1] AS DOUBLE)
                              * ((mx - mn) / 255.0)) - p[2])) END AS errs
        FROM q
    )
    SELECT vec_id,
           CAST(len(qv) AS BIGINT) AS n_dims,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(FLOOR(list_max(errs) * 1000000000.0) AS BIGINT)
               AS max_err_e9
    FROM r
"""


@REGISTRY.add("d34_sq8_quantization", _SQ8_ORACLE, "embedding", "ann")
def d34_sq8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SQ8 quantization audit: dimension count, code range,
    exact integer code-array checksum, and max reconstruction error in
    nano-units. Pure map — zero shuffles (asserted in test_plans.py).
    NaN-containing vectors leave the domain on both engines (nanemb
    contract — Spark silently casts the NaN code/checksum to BIGINT
    where DuckDB refuses loudly); NULL vectors keep their existing
    NULL-row semantics."""
    e = sim.drop_nan_vectors(load(spark, sf_dir, "embeddings"), "embedding")
    v = F.col("embedding").cast("array<double>")
    m = e.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    qv = F.when(
        F.col("mx") == F.col("mn"),
        F.transform("v", lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            "v",
            lambda x: F.least(
                F.floor((x - F.col("mn")) / scale + F.lit(0.5)).cast("bigint"),
                F.lit(255).cast("bigint"),
            ),
        )
    )
    q = m.withColumn("qv", qv)
    errs = F.when(
        F.col("mx") == F.col("mn"),
        F.transform("v", lambda x: F.lit(0.0)),
    ).otherwise(
        F.zip_with(
            "qv",
            "v",
            lambda qi, x: F.abs(
                (F.col("mn") + qi.cast("double") * scale) - x
            ),
        )
    )
    r = q.withColumn("errs", errs)
    return r.select(
        "vec_id",
        F.size("qv").cast("bigint").alias("n_dims"),
        F.array_min("qv").cast("bigint").alias("q_min"),
        F.array_max("qv").cast("bigint").alias("q_max"),
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.floor(F.array_max("errs") * F.lit(1000000000.0))
        .cast("bigint")
        .alias("max_err_e9"),
    )


# ---------------------------------------------------------------------------
# d35: sliding-window CHUNKING with overlap — the retrieval/context
# chunker (64-token windows, stride 48 → 16-token overlap) that turns
# documents into index units. Distinct from d14 (which PACKS documents
# into fixed budgets): this SPLITS each document, and the overlap is the
# point — boundary-spanning text appears in two chunks so a retriever
# can't lose it. Scale shape: explode over a per-doc chunk-count
# sequence (pure map, no shuffle until the optional downstream dedup);
# chunk count is integer math, the chunk signature is the portable
# first-8-hex md5 over the space-joined window.
_CHUNK_W = 64
_CHUNK_S = 48
_CHUNK_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks,
               CAST(len({_TOKS}) AS BIGINT) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, n_tok,
               CAST(g.k AS BIGINT) AS chunk_idx,
               CAST(g.k * {_CHUNK_S} + 1 AS BIGINT) AS start_tok
        FROM d, UNNEST(generate_series(
            0, (GREATEST(n_tok - {_CHUNK_W}, 0) + {_CHUNK_S} - 1)
               // {_CHUNK_S})) AS g(k)
    )
    SELECT doc_id, chunk_idx, start_tok,
           LEAST({_CHUNK_W}, n_tok - start_tok + 1) AS chunk_len,
           ('0x' || substr(md5(array_to_string(
               toks[start_tok:start_tok
                    + LEAST({_CHUNK_W}, n_tok - start_tok + 1) - 1],
               ' ')), 1, 8))::UBIGINT AS chunk_sig
    FROM c
"""


@REGISTRY.add("d35_overlap_chunks", _CHUNK_ORACLE, "text", "chunking")
def d35_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document overlapping chunks: index, global token offset,
    length, and a portable md5 signature per 64-token window at stride
    48. One explode over integer chunk counts — no shuffle, no UDF."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        T.tokens(F.col("text")).alias("toks"),
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    n_chunks_minus1 = F.expr(
        f"(greatest(n_tok - {_CHUNK_W}, 0L) + {_CHUNK_S} - 1) div {_CHUNK_S}"
    )
    c = base.select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_chunks_minus1)
        ).alias("chunk_idx"),
    ).withColumn(
        "start_tok", F.col("chunk_idx") * _CHUNK_S + 1
    ).withColumn(
        "chunk_len",
        F.least(F.lit(_CHUNK_W).cast("bigint"),
                F.col("n_tok") - F.col("start_tok") + 1),
    )
    return c.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "chunk_len",
        F.conv(
            F.substring(
                F.md5(
                    F.array_join(
                        F.slice(
                            "toks",
                            F.col("start_tok").cast("int"),
                            F.col("chunk_len").cast("int"),
                        ),
                        " ",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("chunk_sig"),
    )


# ---------------------------------------------------------------------------
# d36: product-quantization ANN with asymmetric distance computation —
# the compressed-index complement to d13's IVF cell pruning and d34's
# SQ8 range audit (FAISS-style IVFADC = d13's cells + this kernel).
# Numeric discipline: each per-subspace squared-L2 term is a left-fold
# double chain floored to integer NANO-units before anything else, so
# code assignment is an integer argmin (tie -> smaller centroid id) and
# the ADC distance is an order-free BIGINT sum — exact cross-engine
# parity with no float-accumulation hazard.
_PQ_M, _PQ_CODES, _PQ_K, _PQ_QMOD = 8, 16, 5, 20
# fixed deterministic query batch: an ADC scan is O(n_q · n_codes), so
# the batch must NOT grow with the corpus (2.7 s → 93 s at 10× when it
# did); ids < 2000 ∧ divisible by 20 = 100 queries at sf0.1 and above
_PQ_QMAX = 2000
_PQ_SUBD = """CAST(FLOOR(1000000000.0 * list_sum(list_transform(
               list_zip(e.v[t.m*w+1 : t.m*w+w], s.cv[t.m*w+1 : t.m*w+w]),
               x -> (x[1]-x[2])*(x[1]-x[2])))) AS BIGINT)"""
_PQ_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      len(embedding) // {_PQ_M} AS w
               FROM embeddings
               WHERE embedding IS NOT NULL AND {_NULLEMB_SQL}),
    seeds AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_PQ_CODES}),
    sub AS (
        SELECT e.vec_id, s.cid, t.m, {_PQ_SUBD} AS d_e9
        FROM e CROSS JOIN seeds s CROSS JOIN range({_PQ_M}) t(m)
    ),
    codes AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d_e9 ASC, cid ASC) AS rn
            FROM sub) WHERE rn = 1
    ),
    adc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(l.d_e9) AS BIGINT) AS adc_e9
        FROM (SELECT vec_id FROM e
              WHERE vec_id % {_PQ_QMOD} = 0 AND vec_id < {_PQ_QMAX}) q
        JOIN codes c ON c.vec_id <> q.vec_id
        JOIN sub l ON l.vec_id = q.vec_id AND l.m = c.m AND l.cid = c.cid
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc_e9,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_e9 ASC, neighbor_id ASC) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_e9
    FROM ranked WHERE rank <= {_PQ_K}
"""


@REGISTRY.add("d36_pq_adc_topk", _PQ_ORACLE, "similarity", "ann", "pq")
def d36_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-5: 8 subspaces x 16 deterministic seed codebooks,
    integer-nano-unit subdistances, code-table scan for the query batch
    (ids divisible by 20). See operators/similarity.pq_adc_topk."""
    e = load(spark, sf_dir, "embeddings")
    return sim.pq_adc_topk(
        e, "vec_id", "embedding",
        k=_PQ_K, m_sub=_PQ_M, n_codes=_PQ_CODES, query_mod=_PQ_QMOD,
        max_query_id=_PQ_QMAX,
    )


# ---------------------------------------------------------------------------
# d37: directed shingle-containment pairs — the asymmetric dedup measure
# Jaccard misses (a chunk quoted inside a long page: containment ~1,
# Jaccard ~0). Integer-ppm score (n_shared·10⁶ div n_i): exact threshold
# cut, no float division in either engine.
_CONT_N, _CONT_T_PPM = 3, 100_000
_CONT_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - {_CONT_N - 2}), "
    f"i -> array_to_string(({_TOKS})[i:i+{_CONT_N - 1}], ' ')))"
)
_CONT_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {_CONT_SHINGLES} AS shingles FROM documents
        WHERE len({_TOKS}) >= {_CONT_N}
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT s.i, s.j,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(si.n_sh AS BIGINT) AS n_i,
           CAST(s.n_shared * 1000000 // si.n_sh AS BIGINT) AS containment_ppm
    FROM shared s JOIN sizes si ON si.doc_id = s.i
    WHERE s.n_shared * 1000000 // si.n_sh >= {_CONT_T_PPM}
"""


@REGISTRY.add("d37_containment_pairs", _CONT_ORACLE, "dedup", "ngram")
def d37_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-shingle containment pairs ≥ 0.1 (integer ppm) — the
    subset-duplication detector. See operators/text_dedup.containment_pairs."""
    d = load(spark, sf_dir, "documents")
    return dd.containment_pairs(
        d, "doc_id", "text", n=_CONT_N, threshold_ppm=_CONT_T_PPM
    )


# ---------------------------------------------------------------------------
# d38: BPE ENCODE — the application half of the tokenizer loop d32b
# trains: re-learn the same K merges, apply them (training order,
# same greedy left-to-right fold) to every DISTINCT word, then join the
# vocabulary-sized encode table back to the corpus for per-document
# token counts. Closes the train→encode loop: d32b emits merges.txt,
# d38 is the tokenizer run that consumes it.
#
# Scale shape: merges are learned and applied on the VOCABULARY
# (distinct words), never per occurrence — the corpus-sized work is one
# word-frequency pass plus one word-keyed join back (AQE broadcasts the
# encode table when the vocab is small; at web scale it's a keyed hash
# join, still |V| rows). saved_ppm is exact integer arithmetic.
def _bpe_encode_oracle(k: int) -> str:
    parts = [f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
    tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok
           WHERE t <> '' GROUP BY t),
    w0 AS (SELECT t, list_transform(generate_series(1, length(t)),
                                    i -> substring(t, i, 1)) AS s, f FROM tf)"""]
    for i in range(1, k + 1):
        parts.append(f""",
    p{i} AS (
        SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(SUM(f) AS BIGINT) AS n
        FROM w{i - 1}, UNNEST(generate_series(1, len(s) - 1)) AS g(i)
        GROUP BY 1, 2
    ),
    t{i} AS (SELECT lhs, rhs, n FROM p{i} ORDER BY n DESC, lhs, rhs LIMIT 1),
    w{i} AS (
        SELECT t, string_split(
            list_reduce(s, (acc, x) ->
                CASE WHEN (acc = t{i}.lhs
                           OR ends_with(acc, chr(31) || t{i}.lhs))
                          AND x = t{i}.rhs
                     THEN acc || t{i}.rhs
                     ELSE acc || chr(31) || x END),
            chr(31)) AS s, f
        FROM w{i - 1} CROSS JOIN t{i}
    )""")
    parts.append(f""",
    enc AS (SELECT t, CAST(len(s) AS BIGINT) AS n_sym FROM w{k}),
    dt AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
    SELECT dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(dt.t)) AS BIGINT) AS n_chars,
           CAST(SUM(enc.n_sym) AS BIGINT) AS n_tokens_bpe,
           CAST((SUM(length(dt.t)) - SUM(enc.n_sym)) * 1000000
                // SUM(length(dt.t)) AS BIGINT) AS saved_ppm
    FROM dt JOIN enc ON dt.t = enc.t
    WHERE dt.t <> ''
    GROUP BY dt.doc_id""")
    return "".join(parts)


_BPE_ENC_ORACLE = _bpe_encode_oracle(_BPE_ITERS)


# The learned encode table (word -> symbol count after K merges) is
# vocabulary-sized and expensive to derive (K iterated merge rounds);
# d38 and every audit composing it (d54 fertility) share ONE
# localCheckpoint-materialized copy per (session, dataset) — the same
# contract as _PAIR_STREAM_CACHE, with the same stopped-session
# eviction.
_BPE_ENC_CACHE: dict[tuple[str, str], DataFrame] = {}


def _bpe_enc_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_ENC_CACHE.get(key)
    if cached is None:
        d = load(spark, sf_dir, "documents")
        tf = (
            d.select(F.explode(T.tokens(F.col("text"))).alias("t"))
            .where(F.col("t") != "")
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("f"))
        )
        words = tf.select(
            "t",
            F.transform(
                F.sequence(F.lit(1), F.length("t")),
                lambda i: F.col("t").substr(i, F.lit(1)),
            ).alias("s"),
            "f",
        )
        for _ in range(_BPE_ITERS):
            _, words = _bpe_merge_round(words, carry=("t",), checkpoint=True)
        cached = words.select(
            "t", F.size("s").cast("bigint").alias("n_sym")
        ).localCheckpoint()
        for k in [k for k in _BPE_ENC_CACHE if k[0] != key[0]]:
            del _BPE_ENC_CACHE[k]
        _BPE_ENC_CACHE[key] = cached
    return cached



@REGISTRY.add("d38_bpe_encode", _BPE_ENC_ORACLE, "text", "tokenizer")
def d38_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts after the d32b-learned K merges:
    (doc_id, n_words, n_chars, n_tokens_bpe, saved_ppm)."""
    d = load(spark, sf_dir, "documents")
    enc = _bpe_enc_table(spark, sf_dir)
    dt = d.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("t")
    ).where(F.col("t") != "")
    return (
        dt.join(enc, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("t")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_tokens_bpe"),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "(n_chars - n_tokens_bpe) * 1000000 div n_chars"
            ).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# d39: multi-probe LSH ANN — Lv et al.'s recall fix for d11's classic
# failure mode (a near-duplicate sitting one hyperplane away hashes to a
# different bucket): each query probes its bucket plus all 8 Hamming-1
# flips, paying query-side fan-out instead of 9x index storage. A
# neighbor's single bucket matches at most one probe, so no pair dedup
# is needed; ranking is the exact-cosine discipline of d10/d11.
_MP_K = 3
_MP_FLIPS = "[" + ", ".join(str(f) for f in [0] + [1 << p for p in range(_LSH_PLANES)]) + "]"
_ANN_MP_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, v, norm, CAST({_bucket_sql} AS BIGINT) AS bucket
        FROM ({_E_CTE_FIN2})
    ), p AS (
        SELECT vec_id, v, norm, xor(bucket, t.f) AS bucket
        FROM e, UNNEST({_MP_FLIPS}) AS t(f)
    ), pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) AS cosine
        FROM p a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {_MP_K}
"""


@REGISTRY.add("d39_ann_multiprobe_lsh", _ANN_MP_ORACLE, "similarity", "ann", "lsh")
def d39_ann_multiprobe_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-3 (own bucket + 8 Hamming-1 probes).
    See operators/similarity.ann_topk_multiprobe_lsh.
    NULL-or-NaN-component vectors leave the domain on both engines (r15
    nullemb contract; zero rows filtered on clean corpora)."""
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings"), "embedding"
    )
    return sim.ann_topk_multiprobe_lsh(
        e, "vec_id", "embedding", k=_MP_K, n_planes=_LSH_PLANES
    )


# ---------------------------------------------------------------------------
# d40: Johnson-Lindenstrauss random projection — the dimensionality cut
# an embedding pipeline applies before LSH/clustering when 64-d vectors
# are still too wide for the index. The ±1 projection matrix (Achlioptas
# 2003: Rademacher entries preserve JL guarantees, no gaussians needed)
# is derived from md5("j-i") at BUILD time in Python — hashlib.md5 and
# SQL md5 are the same function, so both engines share the constant
# matrix verbatim (asserted in tests). Each projected component is a
# dimension-ordered fold of ±v_i: the exact IEEE sequence both engines
# produce; norm_ratio_e6 (projected/original, scaled by 1/√k) is floored
# to integer ppm — JL promises it concentrates near 1.
_JL_K, _JL_DIM = 4, 64


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{j}-{i}".encode()).digest()[0] < 128 else -1
            for i in range(_JL_DIM)
        ]
        for j in range(_JL_K)
    ]


_JL_S = _jl_signs()
_JL_PROJ_SQL = ", ".join(
    "list_sum(list_transform(list_zip(v, ["
    + ", ".join(f"{s}.0" for s in _JL_S[j])
    + "]), x -> x[1] * x[2])) AS p_{j}".format(j=j)
    for j in range(_JL_K)
)
_JL_NORM2_SQL = " + ".join(f"p_{j} * p_{j}" for j in range(_JL_K))
_JL_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN2}),
    p AS (SELECT vec_id, norm, {_JL_PROJ_SQL} FROM e)
    SELECT vec_id, {", ".join(f"p_{j}" for j in range(_JL_K))},
           CAST(FLOOR(1000000.0 * (sqrt({_JL_NORM2_SQL}) / sqrt({_JL_K}.0))
                      / norm) AS BIGINT) AS norm_ratio_e6
    FROM p
"""


@REGISTRY.add("d40_random_projection", _JL_ORACLE, "similarity", "projection")
def d40_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL projection 64→4 dims with the shared ±1 md5 matrix; emits the
    projected components and the integer-ppm norm-preservation ratio."""
    # similarity-family contract: NULL vectors are dropped at the API
    # boundary (a NULL projection row is useless downstream) and
    # NULL-or-NaN-component vectors leave the domain on both engines
    # (r15 widening — a NaN component floods every projection AND floors
    # to a silent BIGINT where the oracle refuses; a NULL component
    # slipped past the NaN-only filter and poisoned the BIGINT ratio to
    # float64); matches _E_CTE_FIN2's shared filter. Zero rows filtered
    # on the driver corpora.
    e = sim.drop_nonfinite_vectors(
        load(spark, sf_dir, "embeddings").where(
            F.col("embedding").isNotNull()
        ),
        "embedding",
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", v.alias("v")).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.zip_with("v", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )
    projs = [
        F.aggregate(
            F.zip_with(
                "v",
                F.array(*[F.lit(float(s)) for s in _JL_S[j]]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"p_{j}")
        for j in range(_JL_K)
    ]
    p = base.select("vec_id", "norm", *projs)
    norm2 = None
    for j in range(_JL_K):
        t = F.col(f"p_{j}") * F.col(f"p_{j}")
        norm2 = t if norm2 is None else norm2 + t
    return p.select(
        "vec_id",
        *[f"p_{j}" for j in range(_JL_K)],
        F.floor(
            F.lit(1000000.0)
            * (F.sqrt(norm2) / F.sqrt(F.lit(float(_JL_K))))
            / F.col("norm")
        ).cast("bigint").alias("norm_ratio_e6"),
    )


# ---------------------------------------------------------------------------
# d41: dedup SAVINGS audit — the number a data lead actually asks for
# after a dedup run: per source, how many documents and training TOKENS
# does keep-one-per-cluster remove? Pure composition: d19's cluster
# assignments (shared LSH pair stream — zero recompute in-session)
# joined back to the corpus for token accounting; the oracle reuses
# d19's recursive-CTE clustering verbatim (_CLUSTER_CTES) plus the
# summary join, so the two queries cannot drift apart.
_SAVINGS_ORACLE = f"""{_CLUSTER_CTES}
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE c.doc_id = c.canonical_id) AS BIGINT)
               AS n_kept,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS tok_total,
           CAST(COALESCE(SUM(len({_TOKS}))
                         FILTER (WHERE c.doc_id = c.canonical_id), 0)
                AS BIGINT) AS tok_kept,
           CAST((SUM(len({_TOKS}))
                 - COALESCE(SUM(len({_TOKS}))
                            FILTER (WHERE c.doc_id = c.canonical_id), 0))
                * 1000000 // SUM(len({_TOKS})) AS BIGINT) AS saved_ppm
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.source
"""


@REGISTRY.add("d41_dedup_savings", _SAVINGS_ORACLE, "dedup", "lsh", "audit")
def d41_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document/token savings of keep-one-per-cluster dedup
    (d19's clusters, shared pair stream)."""
    d = load(spark, sf_dir, "documents")
    clusters = _cluster_table(spark, sf_dir).select(
        "doc_id", "is_canonical"
    )
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    kept = F.when(F.col("is_canonical"), F.lit(1)).otherwise(F.lit(0))
    return (
        d.select("doc_id", "source", n_tok.alias("n_tok"))
        .join(clusters, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum("n_tok").cast("bigint").alias("tok_total"),
            F.sum(F.col("n_tok") * kept).cast("bigint").alias("tok_kept"),
        )
        .withColumn(
            "saved_ppm",
            F.expr("(tok_total - tok_kept) * 1000000 div tok_total")
            .cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# d43: the LLM corpus-prep FUNNEL — the whole curation story as one
# auditable report: per source, document attrition through quality
# filtering (d20's verdict) → near-dup dedup (d19's canonical
# selection) → benchmark decontamination (d23), plus the final token
# yield. Pure composition of three verified stages; the oracle nests
# each stage's own oracle verbatim (d20/d23 as WITH-subqueries, d19 via
# _CLUSTER_CTES), so the funnel cannot drift from the stages it
# reports on. Stage predicates are ANDed in fixed order — the counting
# semantics of a funnel dashboard, not a re-run of each stage on the
# previous stage's survivors (canonical selection is corpus-wide, as in
# an incremental production pipeline where the dedup index precedes any
# per-batch filter).
_FUNNEL_ORACLE = f"""{_CLUSTER_CTES},
    q AS (SELECT doc_id, verdict FROM ({_CURATE_ORACLE}) t),
    ct AS (SELECT doc_id, contaminated FROM ({_DECON_ORACLE}) t),
    j AS (
        SELECT d.source, len({_TOKS}) AS n_tok,
               q.verdict = 'kept' AS ok_q,
               q.verdict = 'kept' AND c.doc_id = c.canonical_id AS ok_qd,
               q.verdict = 'kept' AND c.doc_id = c.canonical_id
                   AND NOT COALESCE(ct.contaminated, FALSE) AS ok_all
        FROM documents d
        JOIN q ON q.doc_id = d.doc_id
        JOIN comp c ON c.doc_id = d.doc_id
        LEFT JOIN ct ON ct.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE ok_q) AS BIGINT) AS n_quality,
           CAST(COUNT(*) FILTER (WHERE ok_qd) AS BIGINT) AS n_deduped,
           CAST(COUNT(*) FILTER (WHERE ok_all) AS BIGINT) AS n_final,
           CAST(COALESCE(SUM(n_tok) FILTER (WHERE ok_all), 0) AS BIGINT)
               AS tok_final,
           CAST(COALESCE(SUM(n_tok) FILTER (WHERE ok_all), 0) * 1000000
                // SUM(n_tok) AS BIGINT) AS yield_ppm
    FROM j GROUP BY source
"""


@REGISTRY.add("d43_corpus_funnel", _FUNNEL_ORACLE, "dedup", "curation", "audit")
def d43_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation funnel: quality → dedup → decontamination
    attrition counts and final token yield (composition of d19/d20/d23)."""
    d = load(spark, sf_dir, "documents")
    q = d20_curation_filter(spark, sf_dir).select("doc_id", "verdict")
    c = _cluster_table(spark, sf_dir).select("doc_id", "is_canonical")
    ct = d23_benchmark_decontamination(spark, sf_dir).select(
        "doc_id", "contaminated"
    )
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    j = (
        d.select("doc_id", "source", n_tok.alias("n_tok"))
        .join(q, "doc_id")
        .join(c, "doc_id")
        .join(ct, "doc_id", "left")
        .select(
            "source",
            "n_tok",
            (F.col("verdict") == "kept").alias("ok_q"),
            ((F.col("verdict") == "kept") & F.col("is_canonical")).alias("ok_qd"),
            (
                (F.col("verdict") == "kept")
                & F.col("is_canonical")
                & ~F.coalesce(F.col("contaminated"), F.lit(False))
            ).alias("ok_all"),
        )
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            flag(F.col("ok_q")).alias("n_quality"),
            flag(F.col("ok_qd")).alias("n_deduped"),
            flag(F.col("ok_all")).alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("ok_all"), F.col("n_tok"))), F.lit(0)
            ).cast("bigint").alias("tok_final"),
            F.sum("n_tok").alias("_tok_total"),
        )
        .withColumn(
            "yield_ppm",
            F.expr("tok_final * 1000000 div _tok_total").cast("bigint"),
        )
        .drop("_tok_total")
    )


# ---------------------------------------------------------------------------
# d44: contrastive pair MINING — the training-data side of embedding
# models: within each IVF cell (cheap candidate structure, d13's
# deterministic seed assignment), label pairs as 'positive' (cos ≥
# 0.45) or 'hard_negative' (0.30 ≤ cos < 0.45 — close enough to teach
# the margin, far enough to be a true negative). The cell join keeps
# the pair space at Σ cell_pop², never n²; cosines are the d10-proven
# exact fold. Thresholds sit inside the data's observed within-cell
# band (max ≈ 0.49 at sf0.01) so both labels are populated. The cell
# count derives from the corpus count in BOTH engines — max(16,
# ceil(n/512)), the operator's auto-sizing — so per-cell population
# stays constant at any sf (the old fixed-16-cell variant measured
# 10.5× wall at 10× rows; SCALE.md).
_CP_POS, _CP_NEG_LO, _CP_ROWS = 0.45, 0.30, 512
_CONTRAST_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN}),
    nc AS (SELECT GREATEST(16, CAST(CEIL(COUNT(*) / {_CP_ROWS}.0) AS BIGINT)) AS n
           FROM e),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < (SELECT n FROM nc)),
    pr AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) DESC,
                   c.cid ASC) AS rn
        FROM e CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cid AS cell FROM pr WHERE rn = 1),
    pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j, a.cell,
               {_DOT.format(a='a2.v', b='b2.v')} / (a2.norm * b2.norm) AS cosine
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e a2 ON a2.vec_id = a.vec_id
        JOIN e b2 ON b2.vec_id = b.vec_id
    )
    SELECT i, j, cell, cosine,
           CASE WHEN cosine >= {_CP_POS} THEN 'positive'
                ELSE 'hard_negative' END AS label
    FROM pairs
    WHERE cosine >= {_CP_NEG_LO}
"""


@REGISTRY.add("d44_contrastive_pairs", _CONTRAST_ORACLE, "similarity",
              "training-data")
def d44_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cell positive / hard-negative pair mining for contrastive
    embedding training. Cell count auto-sizes with the corpus
    (n_cells=None → max(16, ceil(n/512))); the oracle derives the same
    count, so comparability holds at every sf with no fixed-cell
    asymptote — see operators/similarity.contrastive_pairs."""
    e = load(spark, sf_dir, "embeddings")
    return sim.contrastive_pairs(
        e, "vec_id", "embedding",
        pos_threshold=_CP_POS, neg_lo=_CP_NEG_LO, n_cells=None,
        target_cell_rows=_CP_ROWS,
    )


# ---------------------------------------------------------------------------
# d45: T5-style SPAN CORRUPTION — the deterministic masking pass a
# denoising-pretraining pipeline applies: tokens are grouped into
# 3-token spans, each span masks with p=0.15 drawn from md5(doc-span)
# integer ppm (reproducible across engines AND retries — an RNG-based
# masker silently changes the training set under task re-execution).
# One pure map: the mask decision, rebuild, and signature are all
# per-row expressions — no shuffle anywhere in the plan.
_SPAN_W, _SPAN_P_PPM = 3, 150_000
_SPAN_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, i, t[i] AS tok, (i - 1) // {_SPAN_W} AS span
        FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
    ), dec AS (
        SELECT doc_id, i, tok,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' ||
                                   CAST(span AS VARCHAR)), 1, 8))::UBIGINT
                   % 1000000 < {_SPAN_P_PPM} AS masked
        FROM pos
    ), rebuilt AS (
        SELECT doc_id,
               string_agg(CASE WHEN masked THEN '<X>' ELSE tok END,
                          ' ' ORDER BY i) AS corrupted,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(COUNT(*) FILTER (WHERE masked) AS BIGINT) AS n_masked
        FROM dec GROUP BY doc_id
    )
    SELECT doc_id, n_tok, n_masked,
           substr(md5(corrupted), 1, 16) AS corrupted_sig
    FROM rebuilt
"""


@REGISTRY.add("d45_span_corruption", _SPAN_ORACLE, "text", "augmentation")
def d45_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-token-span masking at p=0.15 with a portable md5
    signature of the corrupted text — zero-shuffle pure map."""
    # corruption domain = documents WITH text (r11 alignment): masking a
    # NULL document is meaningless and the oracle's UNNEST-over-tokens
    # shape never emits such rows. Zero rows filtered on driver corpora.
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split("text", " ")

    def masked(i):  # i = 0-based token index from the transform lambda
        span = F.floor(i / F.lit(_SPAN_W)).cast("bigint")
        u = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("doc_id").cast("string"),
                        span.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % 1000000
        return u < _SPAN_P_PPM

    corrupted = F.array_join(
        F.transform(
            toks,
            lambda tok, i: F.when(masked(i), F.lit("<X>")).otherwise(tok),
        ),
        " ",
    )
    n_masked = F.aggregate(
        F.transform(
            toks,
            lambda tok, i: F.when(masked(i), 1).otherwise(0).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        n_masked.alias("n_masked"),
        F.substring(F.md5(corrupted), 1, 16).alias("corrupted_sig"),
    )


# ---------------------------------------------------------------------------
# d46: regex PRETOKENIZATION counts — the GPT-2-style pre-tokenizer pass
# (letter runs / digit runs / single punctuation, the class-based core
# of the tiktoken pattern) as a corpus accounting query: per doc, token
# count by class plus distinct-token count. Both engines run the same
# class-based pattern (character classes behave identically in Java
# regex and RE2 — no lookarounds, which RE2 lacks). Pure map + one
# per-doc distinct, no corpus-wide shuffle.
_PRETOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
_PRETOK_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(text, '{_PRETOK_RE}') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x ~ '^[a-z]+$')) AS BIGINT)
               AS n_word,
           CAST(len(list_filter(toks, x -> x ~ '^[0-9]+$')) AS BIGINT)
               AS n_number,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
    FROM t
"""


@REGISTRY.add("d46_regex_pretokenizer", _PRETOK_ORACLE, "text", "tokenizer")
def d46_regex_pretokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc pretokenizer accounting: total / word-run / digit-run /
    distinct token counts under the shared class-based pattern."""
    d = load(spark, sf_dir, "documents")
    # idx=0 = whole match (Spark defaults to capture group 1; DuckDB to 0)
    toks = F.regexp_extract_all("text", F.lit(_PRETOK_RE), 0)
    is_word = lambda x: x.rlike("^[a-z]+$")
    is_num = lambda x: x.rlike("^[0-9]+$")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, is_word)).cast("bigint").alias("n_word"),
        F.size(F.filter(toks, is_num)).cast("bigint").alias("n_number"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# d47: scorer AGREEMENT audit — does the heuristic quality score (d03)
# rank documents the way the bigram-LM naturalness score (d28) does?
# Spearman rank correlation with deterministic dense ranking
# (row_number, doc_id tie-break — average-rank ties would need float
# rank arithmetic) in EXACT integers: Σd² is a BIGINT, ρ·10⁶ derives by
# integer division of n(n²−1). Both global ranks use the two-phase
# range-partitioned prefix sum — no single-partition window over the
# corpus exists in the plan. The oracle nests d03's and d28's own
# oracles verbatim, so the audit can't drift from the scorers.
_AGREE_ORACLE = f"""
    WITH q AS (SELECT doc_id, quality
               FROM ({REGISTRY.specs()["d03_quality_score"].oracle}) t),
    l AS (SELECT doc_id, nll_e6 // n_bigrams AS anll
          FROM ({_search.BIGRAM_NLL_ORACLE}) t),
    j AS (SELECT q.doc_id, q.quality, l.anll FROM q JOIN l USING (doc_id)),
    r AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id ASC) AS rq,
               ROW_NUMBER() OVER (ORDER BY anll ASC, doc_id ASC) AS rn
        FROM j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((rq - rn) * (rq - rn)) AS BIGINT) AS sum_d2,
           CAST((1000000::HUGEINT * (COUNT(*)::HUGEINT * (COUNT(*)::HUGEINT
                     * COUNT(*)::HUGEINT - 1))
                 - 6000000::HUGEINT * SUM((rq - rn) * (rq - rn))::HUGEINT)
                // (COUNT(*)::HUGEINT * (COUNT(*)::HUGEINT
                     * COUNT(*)::HUGEINT - 1)) AS BIGINT)
               AS rho_e6
    FROM r
"""


@REGISTRY.add("d47_scorer_agreement", _AGREE_ORACLE, "text", "quality",
              "audit")
def d47_scorer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman agreement between d03's heuristic quality and d28's
    LM naturalness, in exact integer micro-units."""
    from ..operators.ranks import scalable_prefix_sum

    q = d03_quality_score(spark, sf_dir).select("doc_id", "quality")
    l = d28_bigram_lm_nll(spark, sf_dir).select(
        "doc_id", F.expr("nll_e6 div n_bigrams").alias("anll")
    )
    j = (
        q.join(l, "doc_id")
        .withColumn("_one", F.lit(1).cast("bigint"))
        .withColumn("negq", -F.col("quality"))
    )
    # Chain the second rank pass over the FIRST pass's output: pass 1
    # localCheckpoints j-with-rq, so d03+d28 run once (not once per rank
    # branch) and rq rides along into pass 2 — no rq⋈rn re-join exists.
    # Two range-partitioned sorts remain (two different orderings), which
    # is the information-theoretic floor for two global ranks.
    r1 = scalable_prefix_sum(j, "negq", "_one", out="rq", tiebreak=["doc_id"])
    r2 = scalable_prefix_sum(r1, "anll", "_one", out="rn", tiebreak=["doc_id"])
    d = r2.select(
        ((F.col("rq") - F.col("rn")) * (F.col("rq") - F.col("rn"))).alias("d2")
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d2").cast("bigint").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        # 128-bit-safe: n³·10⁶ passes 2⁶³ near n = 45k docs (hit live at
        # the sf1 scale check) — the whole chain rides DECIMAL(38,0),
        # where `div` is still exact integral division
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (CAST(n AS DECIMAL(38,0)) * n * n - n)"
            " - CAST(6000000 AS DECIMAL(38,0)) * CAST(sum_d2 AS DECIMAL(38,0)))"
            " div (CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)"
        ).alias("rho_e6"),
    )


# ---------------------------------------------------------------------------
# d48: QUALITY-aware canonical selection — d19 keeps min-doc-id per
# near-dup cluster (stable, cheap); a production corpus keeps the BEST
# member: canonical = argmax d03-quality, tie → smaller doc_id. One
# max-over-(quality, -doc_id)-structs per cluster on top of d19's
# clusters (shared LSH pair stream — no recompute in-session); emits
# per-doc rows with both policies so the swap is auditable: how many
# clusters change canonical under the quality rule. Oracles nested
# verbatim (cluster CTEs + d03), as in d41/d43.
_QCANON_ORACLE = f"""{_CLUSTER_CTES},
    q AS (SELECT doc_id, quality
          FROM ({REGISTRY.specs()["d03_quality_score"].oracle}) t),
    m AS (
        SELECT c.canonical_id AS cluster_id, c.doc_id, q.quality
        FROM comp c JOIN q ON q.doc_id = c.doc_id
    ),
    best AS (
        SELECT cluster_id,
               (MAX({{'q': quality, 'negid': -doc_id}})).negid * -1
                   AS quality_canonical
        FROM m GROUP BY cluster_id
    )
    SELECT m.doc_id,
           CAST(m.cluster_id AS BIGINT) AS cluster_id,
           CAST(b.quality_canonical AS BIGINT) AS quality_canonical,
           m.doc_id = b.quality_canonical AS is_quality_canonical,
           b.quality_canonical <> m.cluster_id AS canonical_changed
    FROM m JOIN best b ON b.cluster_id = m.cluster_id
"""


@REGISTRY.add("d48_quality_canonicals", _QCANON_ORACLE, "dedup", "lsh",
              "curation")
def d48_quality_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-quality-member canonical per near-dup cluster (tie → smaller
    id), with the min-id-vs-quality policy delta flagged per row."""
    clusters = _cluster_table(spark, sf_dir).select(
        "doc_id", F.col("canonical_id").alias("cluster_id")
    )
    q = d03_quality_score(spark, sf_dir)
    m = clusters.join(q, "doc_id")
    best = m.groupBy("cluster_id").agg(
        (
            -F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("negid"),
                )
            )["negid"]
        ).cast("bigint").alias("quality_canonical")
    )
    return m.join(best, "cluster_id").select(
        "doc_id",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "quality_canonical",
        (F.col("doc_id") == F.col("quality_canonical")).alias(
            "is_quality_canonical"
        ),
        (F.col("quality_canonical") != F.col("cluster_id")).alias(
            "canonical_changed"
        ),
    )


# ---------------------------------------------------------------------------
# d49: WINNOWING fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
# the MOSS algorithm): hash every k-token shingle, slide a w-position
# window over the hash sequence, keep each window's MINIMUM — the
# selected set is a position-robust document fingerprint guaranteeing
# any match of length ≥ w+k−1 shares a fingerprint. Complements d04
# (whole-doc sorted-token fingerprint: exact-dup only) with the
# partial-overlap detector. Hashes are the portable 32-bit md5 prefix;
# the rolling min is a bounded ROWS frame (w positions), never a
# data-sized window; DISTINCT collapses runs where one minimum serves
# many windows. Output is per-doc: fingerprint count + exact BIGINT
# checksum so the hash gate covers the selected SET.
_WIN_K, _WIN_W = 4, 5
_WINNOW_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
        WHERE len({_TOKS}) >= {_WIN_K}
    ), grams AS (
        SELECT doc_id, i,
               ('0x' || substr(md5(array_to_string(t[i:i+{_WIN_K - 1}], ' ')),
                               1, 8))::UBIGINT::BIGINT AS h
        FROM toks, UNNEST(generate_series(1, len(t) - {_WIN_K - 1})) AS g(i)
    ), wins AS (
        SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
                   AS wmin,
               COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
                   AS wsize
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, wmin FROM wins WHERE wsize = {_WIN_W}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(wmin) AS BIGINT) AS fp_checksum,
           CAST(MIN(wmin) AS BIGINT) AS fp_min
    FROM fps GROUP BY doc_id
"""


@REGISTRY.add("d49_winnowing_fingerprints", _WINNOW_ORACLE, "dedup",
              "fingerprint")
def d49_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint summaries: k=4-token shingles,
    w=5 windows, per-doc selected-set count/checksum/min."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("t")).where(F.size("t") >= _WIN_K)
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (_WIN_K - 1)),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice("t", i, _WIN_K), " ")),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint"),
            )
        ).alias("pos", "h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    wins = grams.select(
        "doc_id",
        F.min("h").over(w).alias("wmin"),
        F.count(F.lit(1)).over(w).alias("wsize"),
    ).where(F.col("wsize") == _WIN_W)
    fps = wins.select("doc_id", "wmin").distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.sum("wmin").cast("bigint").alias("fp_checksum"),
        F.min("wmin").cast("bigint").alias("fp_min"),
    )


# ---------------------------------------------------------------------------
# d50: EXACT SUBSTRING-SPAN dedup (the Lee et al., "Deduplicating
# Training Data Makes Language Models Better", ACL'22 result, re-shaped
# for DataFrame algebra): find, per document, every MAXIMAL token span
# of length >= k that appears verbatim in at least one OTHER document.
# d22 fixes chunk granularity and d49 fingerprints partial overlap
# approximately; this is the exact span remover a dedup pipeline
# actually cuts with. Mechanics: hash every k-token shingle with its
# position (inverted shingle index, as d08), keep shingles shared by
# >= 2 distinct docs (ONE hash groupBy — the pair space never
# materializes, unlike a suffix-array join), then compress each doc's
# shared positions into maximal runs via gaps-and-islands (pos −
# row_number, e28's idiom): a run of r consecutive shared shingle
# starts is a duplicated span of exactly r+k−1 tokens. Every stage is
# a keyed shuffle on doc_id or shingle hash; windows are per-doc.
_SPAN_K = 8
_SUBSTR_SPAN_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
        WHERE len({_TOKS}) >= {_SPAN_K}
    ), sh AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS h
        FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_K - 1})) AS g(i)
    ), shared AS (
        SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ), marked AS (
        SELECT s.doc_id, s.pos,
               s.pos - ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                          ORDER BY s.pos) AS grp
        FROM sh s JOIN shared USING (h)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_SPAN_K - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + {_SPAN_K} AS BIGINT) AS span_len
    FROM marked GROUP BY doc_id, grp
"""


@REGISTRY.add("d50_substring_spans", _SUBSTR_SPAN_ORACLE, "dedup",
              "substring")
def d50_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal per-doc token regions (1-based, inclusive) covered by
    >= 8-token shingles each shared verbatim with another document —
    the UNION of duplicated regions, i.e. Lee et al.'s removal
    semantics (adjacent regions shared with different partners merge
    into one span). The exact-span counterpart of d49's approximate
    fingerprints."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("t")).where(F.size("t") >= _SPAN_K)
    sh = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (_SPAN_K - 1)),
                lambda i: F.md5(F.array_join(F.slice("t", i, _SPAN_K), " ")),
            )
        ).alias("p0", "h"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    shared = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = sh.join(shared, "h", "left_semi").withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return marked.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + (_SPAN_K - 1)).cast("bigint").alias("span_end"),
        (F.max("pos") - F.min("pos") + _SPAN_K).cast("bigint").alias(
            "span_len"
        ),
    ).drop("grp")


# ---------------------------------------------------------------------------
# d51: GOPHER-rule quality GATE (Rae et al., "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", 2021, App. A —
# the MassiveText filter): unlike d03's blended score, production
# curation cuts with per-rule BOOLEAN gates so every drop is
# attributable. Word-level rules (this corpus has no newlines, so the
# line-based rules are vacuous and omitted): word-count band, mean
# word length band, alphabetic-word fraction, minimum stopword count,
# and a repetition gate on the top-bigram share (the word-level analog
# of Gopher's duplicate-line fraction). Everything is one row-local
# projection except the bigram share (one per-doc keyed agg pair);
# ratios compare exact-integer-derived doubles, identical in both
# engines. Emits per-rule booleans + verdict + n_failed.
_GOP_MIN_W, _GOP_MAX_W = 20, 80
_GOP_MWL_LO, _GOP_MWL_HI = 3.0, 10.0
_GOP_ALPHA, _GOP_STOPS, _GOP_TOPBG = 0.8, 2, 0.07
_GOPHER_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w, text FROM documents
    ), bg AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS b
        FROM t, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
    ), bgc AS (
        SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
    ), share AS (
        SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_bg FROM bgc GROUP BY doc_id
    ), m AS (
        SELECT t.doc_id,
               len(w) AS n_words,
               (LENGTH(text) - (len(w) - 1)) * 1.0 / len(w) AS mwl,
               len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                   * 1.0 / len(w) AS alpha_frac,
               len(list_filter(w, x -> x IN ({_STOP_LST}))) AS stop_n,
               COALESCE(s.top_bg, 0.0) AS top_bg
        FROM t LEFT JOIN share s ON s.doc_id = t.doc_id
    ), r AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               n_words BETWEEN {_GOP_MIN_W} AND {_GOP_MAX_W} AS ok_word_count,
               mwl BETWEEN {_GOP_MWL_LO} AND {_GOP_MWL_HI} AS ok_mean_word_len,
               alpha_frac >= {_GOP_ALPHA} AS ok_alpha_words,
               stop_n >= {_GOP_STOPS} AS ok_stopwords,
               top_bg <= {_GOP_TOPBG} AS ok_repetition
        FROM m
    )
    SELECT doc_id, n_words, ok_word_count, ok_mean_word_len,
           ok_alpha_words, ok_stopwords, ok_repetition,
           CASE WHEN ok_word_count AND ok_mean_word_len AND ok_alpha_words
                     AND ok_stopwords AND ok_repetition
                THEN 'kept' ELSE 'dropped' END AS verdict,
           -- COALESCE: a NULL gate (NULL text) counts as FAILED, exactly
           -- like Spark's when(ok, 0).otherwise(1); without it the sum
           -- goes NULL and the column turns float64 (hash-gate breaker)
           CAST((NOT COALESCE(ok_word_count, FALSE))::INT
                + (NOT COALESCE(ok_mean_word_len, FALSE))::INT
                + (NOT COALESCE(ok_alpha_words, FALSE))::INT
                + (NOT COALESCE(ok_stopwords, FALSE))::INT
                + (NOT COALESCE(ok_repetition, FALSE))::INT AS BIGINT)
               AS n_failed
    FROM r
"""


@REGISTRY.add("d51_gopher_rules", _GOPHER_ORACLE, "text", "quality",
              "curation")
def d51_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule Gopher quality gates with an attributable verdict:
    word-count / mean-word-length bands, alphabetic-word fraction,
    stopword minimum, top-bigram-share repetition cap."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    base = d.select("doc_id", "text", w.alias("w"))
    n = F.size("w")
    bg = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("w", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("w", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("b"),
    )
    share = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                "top_bg"
            )
        )
    )
    is_alpha = lambda x: x.rlike("[a-zA-Z]")
    is_stop = lambda x: x.isin(*sorted(T.STOPWORDS))
    m = base.select(
        "doc_id",
        n.alias("n_words"),
        (
            (F.length("text") - (n - 1)).cast("double") / n.cast("double")
        ).alias("mwl"),
        (
            F.size(F.filter("w", is_alpha)).cast("double") / n.cast("double")
        ).alias("alpha_frac"),
        F.size(F.filter("w", is_stop)).alias("stop_n"),
    ).join(share, "doc_id", "left").withColumn(
        "top_bg", F.coalesce(F.col("top_bg"), F.lit(0.0))
    )
    ok_wc = F.col("n_words").between(_GOP_MIN_W, _GOP_MAX_W)
    ok_mwl = F.col("mwl").between(_GOP_MWL_LO, _GOP_MWL_HI)
    ok_alpha = F.col("alpha_frac") >= _GOP_ALPHA
    ok_stop = F.col("stop_n") >= _GOP_STOPS
    ok_rep = F.col("top_bg") <= _GOP_TOPBG
    oks = [ok_wc, ok_mwl, ok_alpha, ok_stop, ok_rep]
    names = ["ok_word_count", "ok_mean_word_len", "ok_alpha_words",
             "ok_stopwords", "ok_repetition"]
    all_ok = oks[0]
    for o in oks[1:]:
        all_ok = all_ok & o
    n_failed = sum(
        (F.when(o, 0).otherwise(1) for o in oks), F.lit(0)
    ).cast("bigint")
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        *[o.alias(nm) for o, nm in zip(oks, names)],
        F.when(all_ok, "kept").otherwise("dropped").alias("verdict"),
        n_failed.alias("n_failed"),
    )


# ---------------------------------------------------------------------------
# d52: per-source unigram KL DIVERGENCE vs the corpus — the CCNet-style
# domain-drift audit ("which source's language deviates most from the
# pool?"), the token-level counterpart of e27's numeric drift. Support-
# restricted KL: sum over words PRESENT in the source of
# P_s(w)·ln(P_s(w)/Q(w)) with P_s = c_s/n_s and corpus Q = c/n — every
# ratio is a quotient of exact BIGINTs, each term floored to integer
# micro-nats BEFORE the per-source sum (terms can be negative; floor
# agrees in both engines), so the aggregate is an exact BIGINT no
# shuffle order can perturb. Scale shape: one (source, word) agg and
# one (word) agg — model tables scale with vocabulary, the (source,
# word) join is keyed on the word, and the per-source scalars cross by
# broadcast. No corpus-sized join anywhere.
_SRCKL_ORACLE = """
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), sw AS (
        SELECT source, w, COUNT(*) AS c_s FROM tok GROUP BY source, w
    ), cw AS (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), ns AS (
        SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM sw GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM cw
    )
    SELECT sw.source,
           ns.n_s AS n_tokens,
           ns.n_types,
           CAST(SUM(CAST(FLOOR(
               (CAST(sw.c_s AS DOUBLE) / ns.n_s)
               * ln((CAST(sw.c_s AS DOUBLE) * t.n)
                    / (CAST(ns.n_s AS DOUBLE) * cw.c))
               * 1000000.0
           ) AS BIGINT)) AS BIGINT) AS kl_e6
    FROM sw
    JOIN cw USING (w)
    JOIN ns ON ns.source = sw.source
    CROSS JOIN tot t
    GROUP BY sw.source, ns.n_s, ns.n_types
"""


@REGISTRY.add("d52_source_kl_divergence", _SRCKL_ORACLE, "text", "quality",
              "audit")
def d52_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-restricted unigram KL(source ‖ corpus) per source, in
    exact integer micro-nats, with per-source token/type counts."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_s"))
    cw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ns = sw.groupBy("source").agg(
        F.sum("c_s").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    tot = cw.agg(F.sum("c").cast("bigint").alias("n"))
    term_e6 = F.floor(
        (F.col("c_s").cast("double") / F.col("n_s"))
        * F.log(
            (F.col("c_s").cast("double") * F.col("n"))
            / (F.col("n_s").cast("double") * F.col("c"))
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    return (
        sw.join(cw, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n_types")
        .agg(F.sum(term_e6).cast("bigint").alias("kl_e6"))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_types",
            "kl_e6",
        )
    )


# ---------------------------------------------------------------------------
# d53: cross-source near-dup LEAKAGE matrix — the provenance audit a
# multi-source corpus needs before mixing: which source pairs share
# near-duplicate content (same-source pairs = internal redundancy,
# cross-source pairs = syndication/mirroring that silently upweights a
# document through two "independent" sources). Pure composition over
# d06's verified LSH pairs (the SHARED in-session pair stream — no
# recompute) + one label join + two keyed aggs; the oracle nests d06's
# oracle verbatim so the audit can't drift from the dedup it audits.
_XSRC_ORACLE = f"""
    WITH p AS (
        SELECT i, j FROM ({REGISTRY.specs()["d06_minhash_lsh"].oracle}) t
    ),
    lab AS (SELECT doc_id, source FROM documents),
    e AS (
        SELECT LEAST(a.source, b.source) AS source_i,
               GREATEST(a.source, b.source) AS source_j,
               p.i, p.j
        FROM p
        JOIN lab a ON a.doc_id = p.i
        JOIN lab b ON b.doc_id = p.j
    ),
    pa AS (
        SELECT source_i, source_j, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM e GROUP BY source_i, source_j
    ),
    da AS (
        SELECT source_i, source_j,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
            SELECT source_i, source_j, i AS doc_id FROM e
            UNION ALL
            SELECT source_i, source_j, j AS doc_id FROM e
        ) GROUP BY source_i, source_j
    )
    SELECT pa.source_i, pa.source_j, pa.n_pairs, da.n_docs,
           pa.source_i <> pa.source_j AS is_cross_source
    FROM pa JOIN da USING (source_i, source_j)
"""


@REGISTRY.add("d53_cross_source_leakage", _XSRC_ORACLE, "dedup", "audit",
              "provenance")
def d53_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts per unordered source pair (plus distinct
    docs involved): internal redundancy on the diagonal, cross-source
    syndication off it."""
    pairs = d06_minhash_lsh(spark, sf_dir).select("i", "j")
    lab = load(spark, sf_dir, "documents").select("doc_id", "source")
    e = (
        pairs.join(lab.select(F.col("doc_id").alias("i"),
                              F.col("source").alias("sa")), "i")
        .join(lab.select(F.col("doc_id").alias("j"),
                         F.col("source").alias("sb")), "j")
        .select(
            F.least("sa", "sb").alias("source_i"),
            F.greatest("sa", "sb").alias("source_j"),
            "i", "j",
        )
    )
    pa = e.groupBy("source_i", "source_j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    da = (
        e.select("source_i", "source_j", F.col("i").alias("doc_id"))
        .unionByName(
            e.select("source_i", "source_j", F.col("j").alias("doc_id"))
        )
        .groupBy("source_i", "source_j")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    )
    return pa.join(da, ["source_i", "source_j"]).withColumn(
        "is_cross_source", F.col("source_i") != F.col("source_j")
    )


# ---------------------------------------------------------------------------
# d54: tokenizer FERTILITY audit per source — the standard tokenizer-
# evaluation table (how many BPE tokens per word / bytes per token does
# each source pay under the learned vocabulary?): high-fertility
# sources dominate the token budget and signal vocabulary mismatch.
# Pure composition over d38's per-doc BPE encoding (oracle nested
# verbatim) + one label join + one keyed agg; ratios are integer ppm
# (floored BIGINT division — exact in both engines).
_FERT_ORACLE = f"""
    WITH enc AS (
        SELECT doc_id, n_words, n_chars, n_tokens_bpe
        FROM ({_BPE_ENC_ORACLE}) t
    ),
    lab AS (SELECT doc_id, source FROM documents)
    SELECT lab.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
           CAST(SUM(enc.n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
           CAST(SUM(enc.n_tokens_bpe) * 1000000
                // SUM(enc.n_words) AS BIGINT) AS fertility_ppm,
           CAST(SUM(enc.n_chars) * 1000000
                // SUM(enc.n_tokens_bpe) AS BIGINT) AS chars_per_token_ppm
    FROM enc JOIN lab USING (doc_id)
    GROUP BY lab.source
"""


@REGISTRY.add("d54_tokenizer_fertility", _FERT_ORACLE, "text", "tokenizer",
              "audit")
def d54_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BPE fertility (tokens per word) and compression
    (chars per token) in integer ppm under the d32b-learned merges."""
    enc = d38_bpe_encode(spark, sf_dir).select(
        "doc_id", "n_words", "n_chars", "n_tokens_bpe"
    )
    lab = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        enc.join(lab, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens_bpe").cast("bigint").alias("n_tokens_bpe"),
            F.expr(
                "CAST(sum(n_tokens_bpe) * 1000000 div sum(n_words) AS BIGINT)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST(sum(n_chars) * 1000000 div sum(n_tokens_bpe) AS BIGINT)"
            ).alias("chars_per_token_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# d55: sketch CALIBRATION audit — how well does the 16-bit SimHash
# hamming distance predict exact token-set Jaccard on the pairs it
# surfaces? Production dedup tunes the hamming cutoff from exactly this
# table (per-hamming pair counts, mean/min/max exact similarity, and
# how many pairs clear the 0.9 near-dup bar). Calibration is an AUDIT,
# so it runs on a deterministic 20% id-hash doc sample (s01's portable
# md5 bucket): statistically sufficient for the per-hamming curve, and
# it caps the fixed-bit signature's collision mass — a b-bit simhash
# surfaces ~n²·c/2ᵇ random collisions, super-linear in the corpus
# (measured 2.0M→43.7M pairs at 10× docs), while the sampled audit
# stays at 4% of that pair space at every scale. Exact Jaccard rides
# the dictionary-bitmask fast path; everything crosses engines as
# exact integers (ppm via BIGINT floor division).
_CALIB_SAMPLE_PPM = 200_000
_CALIB_DOCS_SQL = (
    "(SELECT doc_id, text FROM documents "
    "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
    f"% 1000000 < {_CALIB_SAMPLE_PPM}) documents"
)
_CALIB_ORACLE = f"""
    WITH pairs AS (
        SELECT i, j, hamming
        FROM ({_SIMHASH_ORACLE.replace("FROM documents", "FROM " + _CALIB_DOCS_SQL)}) t
    ), toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM {_CALIB_DOCS_SQL}
    ), scored AS (
        SELECT p.hamming,
               CAST(1000000 * len(list_intersect(ta.tokens, tb.tokens))
                    // (len(ta.tokens) + len(tb.tokens)
                        - len(list_intersect(ta.tokens, tb.tokens)))
                    AS BIGINT) AS jaccard_ppm
        FROM pairs p
        JOIN toks ta ON ta.doc_id = p.i
        JOIN toks tb ON tb.doc_id = p.j
    )
    SELECT hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(jaccard_ppm) // COUNT(*) AS BIGINT) AS avg_jaccard_ppm,
           CAST(MIN(jaccard_ppm) AS BIGINT) AS min_jaccard_ppm,
           CAST(MAX(jaccard_ppm) AS BIGINT) AS max_jaccard_ppm,
           CAST(SUM(CASE WHEN jaccard_ppm >= 900000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_dup
    FROM scored GROUP BY hamming
"""


@REGISTRY.add("d55_sketch_calibration", _CALIB_ORACLE, "dedup", "audit",
              "simhash")
def d55_sketch_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard calibration of the SimHash candidates, per hamming
    distance: pair counts, mean/min/max exact similarity (integer ppm),
    and how many clear the 0.9 near-dup threshold.

    Scale shape: the sample filter is a pure codegen scan predicate, the
    pair table is banded (never all-pairs) over the 20% sample — 4% of
    the full corpus's pair mass at every scale, which tames the b-bit
    signature's inherent n²/2ᵇ collision growth — and exact Jaccard
    rides the dictionary-bitmask fast path
    (``text_dedup.exact_jaccard_ppm``, O(vocab/64) bit-ops per pair),
    then one agg over ≤ max_hamming+1 groups."""
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents").where(
        md5_bucket(F.col("doc_id")) % 1000000 < _CALIB_SAMPLE_PPM
    )
    pairs = dd.simhash_pairs(
        d, "doc_id", "text", bits=_SIM_BITS, max_hamming=_SIM_MAXHAM
    ).select("i", "j", "hamming")
    scored = dd.exact_jaccard_ppm(pairs, d, "doc_id", "text").select(
        "hamming", "jaccard_ppm"
    )
    return scored.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("CAST(sum(jaccard_ppm) div count(*) AS BIGINT)").alias(
            "avg_jaccard_ppm"
        ),
        F.min("jaccard_ppm").cast("bigint").alias("min_jaccard_ppm"),
        F.max("jaccard_ppm").cast("bigint").alias("max_jaccard_ppm"),
        F.sum(F.when(F.col("jaccard_ppm") >= 900000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_near_dup"),
    )


# ---------------------------------------------------------------------------
# d56: DSIR-style IMPORTANCE selection (Xie et al. 2023, public arXiv
# 2302.03169): score every document by the unigram log-likelihood ratio
# between a target domain (source 'src0' plays the high-quality seed)
# and the raw corpus, keep documents the ratio favors. Per-token score
# is FLOOR(ln(ratio)·1e6) — the same fixed-point ln discipline d28's
# bigram NLL already pins across engines — summed per doc over exact
# BIGINT occurrence counts, so the doc score is integer-exact. The
# selection threshold is LR > 1 (score > 0): a pure per-row filter —
# no global sort/quantile pass exists anywhere in the plan.
_DSIR_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_TOKS}) AS token FROM documents
    ), occ AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM tok GROUP BY doc_id, token
    ), cnt AS (
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS c_corpus,
               CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_target
        FROM tok GROUP BY token
    ), tot AS (
        SELECT CAST(SUM(c_corpus) AS BIGINT) AS n_corpus,
               CAST(SUM(c_target) AS BIGINT) AS n_target,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM cnt
    ), score AS (
        SELECT cnt.token,
               CAST(FLOOR(ln(
                   ((CAST(cnt.c_target AS DOUBLE) + 1.0)
                        * (CAST(tot.n_corpus AS DOUBLE) + CAST(tot.v AS DOUBLE)))
                   / ((CAST(cnt.c_corpus AS DOUBLE) + 1.0)
                        * (CAST(tot.n_target AS DOUBLE) + CAST(tot.v AS DOUBLE)))
               ) * 1000000) AS BIGINT) AS score_e6
        FROM cnt CROSS JOIN tot
    )
    SELECT o.doc_id,
           MIN(d.source) AS source,
           CAST(SUM(o.n_occ) AS BIGINT) AS n_tok,
           CAST(SUM(o.n_occ * s.score_e6) AS BIGINT) AS importance_e6,
           CAST(SUM(o.n_occ * s.score_e6) AS BIGINT) > 0 AS kept
    FROM occ o
    JOIN score s USING (token)
    JOIN documents d ON d.doc_id = o.doc_id
    GROUP BY o.doc_id
"""


@REGISTRY.add("d56_dsir_importance", _DSIR_ORACLE, "text", "curation",
              "mixture")
def d56_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR unigram importance: per-doc log-likelihood ratio (target
    'src0' vs raw corpus, add-1 smoothed, fixed-point µ-nats) and the
    LR>1 keep decision.

    Scale shape: one token explode feeds BOTH count tables (corpus and
    target counts come from one conditional agg), the per-token score
    table is vocabulary-sized (broadcast join back onto doc-token
    occurrences), and selection is a per-row comparison — the 100 TB
    plan is two keyed shuffles (doc-token agg, token agg) and zero
    global sorts."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source",
                   F.explode(F.split("text", " ")).alias("token"))
    occ = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    cnt = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_corpus"),
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("c_target"),
    )
    tot = cnt.agg(
        F.sum("c_corpus").cast("bigint").alias("n_corpus"),
        F.sum("c_target").cast("bigint").alias("n_target"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    score = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        F.floor(
            F.log(
                ((F.col("c_target").cast("double") + F.lit(1.0))
                 * (F.col("n_corpus").cast("double") + F.col("v").cast("double")))
                / ((F.col("c_corpus").cast("double") + F.lit(1.0))
                   * (F.col("n_target").cast("double") + F.col("v").cast("double")))
            ) * F.lit(1000000)
        ).cast("bigint").alias("score_e6"),
    )
    imp = (
        occ.join(F.broadcast(score), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_tok"),
            F.sum(F.col("n_occ") * F.col("score_e6"))
            .cast("bigint")
            .alias("importance_e6"),
        )
    )
    return imp.join(d.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "n_tok", "importance_e6",
        (F.col("importance_e6") > 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# d57: vocabulary COVERAGE curve — for candidate vocabulary sizes k
# (powers of two), what share of all token occurrences do the top-k
# most frequent tokens cover? The standard table for sizing a tokenizer
# vocabulary (where the curve flattens, stop paying embedding rows).
# The curve lives on the VOCABULARY (dictionary-sized, bounded by the
# language — it does not grow with corpus rows), so the rank window over
# distinct tokens is deliberately tiny; coverage crosses engines as
# integer ppm on exact BIGINT occurrence sums.
_KS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 1024, 4096, 16384]
_COV_ORACLE = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ), cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token
    ), ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r FROM cnt
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS vocab_size
        FROM cnt
    ), ks AS (SELECT unnest({_KS!r}) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           tot.vocab_size,
           CAST(COALESCE(SUM(ranked.c), 0) AS BIGINT) AS covered_occurrences,
           tot.total AS total_occurrences,
           CAST(COALESCE(SUM(ranked.c), 0) * 1000000 // tot.total AS BIGINT)
               AS coverage_ppm
    FROM ks CROSS JOIN tot
    LEFT JOIN ranked ON ranked.r <= ks.k
    GROUP BY ks.k, tot.vocab_size, tot.total
"""


@REGISTRY.add("d57_vocab_coverage", _COV_ORACLE, "text", "tokenizer",
              "audit")
def d57_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of the top-k vocabulary for k in
    powers of two (integer ppm): the vocabulary-sizing curve."""
    d = load(spark, sf_dir, "documents")
    cnt = d.select(F.explode(F.split("text", " ")).alias("token")).groupBy(
        "token"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # vocabulary-sized window (bounded by the language, not the corpus):
    # the single partition here holds |vocab| rows by design
    ranked = cnt.select(
        "c",
        F.row_number()
        .over(W.partitionBy(F.lit(0)).orderBy(F.col("c").desc(), "token"))
        .alias("r"),
    )
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    from ..tables import local_df

    # LocalRelation, not a 32-slice Python RDD (tables.local_df)
    ks = local_df(d.sparkSession, [(k,) for k in _KS], "k int")
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(F.broadcast(ranked), F.col("r") <= F.col("k"), "left")
        .groupBy("k", "vocab_size", "total")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint")
             .alias("covered_occurrences"))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "vocab_size",
            "covered_occurrences",
            F.col("total").alias("total_occurrences"),
            F.expr(
                "CAST(covered_occurrences * 1000000 div total AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# d58: LEAKAGE-FREE train/test split — s06's deterministic id-hash
# split has a blind spot on near-duplicate corpora: two near-dup docs
# can land on opposite sides and the eval set silently scores
# memorization. The fix is to split by CLUSTER: every member inherits
# its d19 canonical's bucket, so a near-dup pair (even a transitively
# connected one) can never straddle the split. `would_leak` flags docs
# whose naive own-id bucket disagrees — the rows s06 would have
# leaked. Pure composition (d19's cluster oracle nested verbatim) +
# the portable md5 bucket; no new shuffle beyond d19's own.
_SPLIT_EXPR = (
    "('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 8))::UBIGINT % 1000000"
)
_LFS_ORACLE = f"""{_CLUSTER_CTES}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(canonical_id AS BIGINT) AS canonical_id,
           CASE WHEN {_SPLIT_EXPR.format(id='canonical_id')} < 800000
                THEN 'train'
                WHEN {_SPLIT_EXPR.format(id='canonical_id')} < 900000
                THEN 'val' ELSE 'test' END AS split,
           (CASE WHEN {_SPLIT_EXPR.format(id='canonical_id')} < 800000
                 THEN 'train'
                 WHEN {_SPLIT_EXPR.format(id='canonical_id')} < 900000
                 THEN 'val' ELSE 'test' END)
           <> (CASE WHEN {_SPLIT_EXPR.format(id='doc_id')} < 800000
                    THEN 'train'
                    WHEN {_SPLIT_EXPR.format(id='doc_id')} < 900000
                    THEN 'val' ELSE 'test' END) AS would_leak
    FROM comp
"""


@REGISTRY.add("d58_leakage_free_split", _LFS_ORACLE, "dedup", "sampling",
              "training")
def d58_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware 80/10/10 split: every doc takes its d19 canonical's
    md5 bucket so near-dup pairs never straddle train/eval; would_leak
    marks docs a naive per-doc split would have placed differently."""
    from .sampling import md5_bucket

    def split_of(c):
        b = md5_bucket(c) % 1000000
        return (
            F.when(b < 800000, "train").when(b < 900000, "val")
            .otherwise("test")
        )

    clusters = _cluster_table(spark, sf_dir).select(
        "doc_id", "canonical_id"
    )
    return clusters.select(
        "doc_id",
        "canonical_id",
        split_of(F.col("canonical_id")).alias("split"),
        (split_of(F.col("canonical_id"))
         != split_of(F.col("doc_id"))).alias("would_leak"),
    )


# ---------------------------------------------------------------------------
# d59: MinHash ESTIMATOR calibration — d55's twin for the other sketch:
# per signature-agreement count (how many of the 16 MinHash components
# match), the exact-Jaccard distribution over the banded candidates.
# E[agreement/16] = Jaccard is the textbook estimator claim; this table
# is the measured version (and shows the band floor: every candidate
# agrees on ≥ rows-per-band components). Same 20% id-hash sample and
# bitmask verification as d55; candidates come from the SAME banded
# operator the dedup path uses (threshold=0 skips only the final keep
# filter — band structure and verification are identical).
# 10% sample (vs d55's 20%): with 4-row bands a J≈0.5 pair still
# collides with P≈23%, so the unfiltered candidate mass is the
# quadratic-ish term the audit sample must cap harder.
_MHCAL_SAMPLE_PPM = 100_000
_MHCAL_DOCS_SQL = (
    "(SELECT doc_id, text FROM documents "
    "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
    f"% 1000000 < {_MHCAL_SAMPLE_PPM}) documents"
)
_MH_EST = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(16)
)
_MHCAL_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_DTOKS}) AS token FROM {_MHCAL_DOCS_SQL}
    ), mh AS (
        SELECT doc_id, {_mh_cols}
        FROM tok GROUP BY doc_id
    ), {_BAND_CAND_CTES}, toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM {_MHCAL_DOCS_SQL}
    ), scored AS (
        SELECT CAST({_MH_EST} AS BIGINT) AS est_match,
               CAST(1000000 * len(list_intersect(ta.tokens, tb.tokens))
                    // (len(ta.tokens) + len(tb.tokens)
                        - len(list_intersect(ta.tokens, tb.tokens)))
                    AS BIGINT) AS jaccard_ppm
        FROM cand c
        JOIN mh a ON a.doc_id = c.i
        JOIN mh b ON b.doc_id = c.j
        JOIN toks ta ON ta.doc_id = c.i
        JOIN toks tb ON tb.doc_id = c.j
    )
    SELECT est_match,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(jaccard_ppm) // COUNT(*) AS BIGINT) AS avg_jaccard_ppm,
           CAST(MIN(jaccard_ppm) AS BIGINT) AS min_jaccard_ppm,
           CAST(MAX(jaccard_ppm) AS BIGINT) AS max_jaccard_ppm
    FROM scored GROUP BY est_match
"""


@REGISTRY.add("d59_minhash_calibration", _MHCAL_ORACLE, "dedup", "audit",
              "lsh")
def d59_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard distribution per MinHash signature-agreement count
    over the banded candidates (10% id-hash sample) — the measured form
    of the agreement/16 ≈ Jaccard estimator claim."""
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents").where(
        md5_bucket(F.col("doc_id")) % 1000000 < _MHCAL_SAMPLE_PPM
    )
    # emit_counts fuses exact (inter, union) into the band verification
    # itself — no second bitmask pass, no re-join of the doc sides —
    # and emit_est rides the signature columns through the band joins so
    # est_match needs no second signature pipeline and no per-pair
    # signature lookup joins (optimization r14: the previous shape
    # rebuilt minhash_signatures over the sample and joined both sides
    # back on — a full tokenize+groupBy pass plus two joins, all for
    # columns the band join already held)
    return (
        dd.minhash_lsh_pairs(
            d, "doc_id", "text", threshold=0.0, emit_counts=True,
            emit_est=True,
        )
        .select(
            "est_match",
            F.expr(
                "CAST(1000000 * n_inter div n_union AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .groupBy("est_match")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("CAST(sum(jaccard_ppm) div count(*) AS BIGINT)").alias(
                "avg_jaccard_ppm"
            ),
            F.min("jaccard_ppm").cast("bigint").alias("min_jaccard_ppm"),
            F.max("jaccard_ppm").cast("bigint").alias("max_jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# d60: incremental ANN INGEST audit — the d21 story for the vector
# index: a production IVF index is a persisted artifact; daily batches
# are ASSIGNED to the frozen centroids (one Arrow pass against the
# broadcast 16×d matrix — no retrain, no index rebuild), and this table
# is the re-train trigger: per-cell base/new counts and growth, hot
# cells drifting away from uniform mean the centroids no longer fit
# the data. Base/new split is the portable md5 bucket (80/20); the
# oracle recomputes assignment from the same seed centroids with the
# left-fold dot (argmax ties break toward the smaller centroid id,
# as in d13 — operator/oracle agreement on that is already proven).
_INGEST_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN2}),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < {_IVF_CELLS}),
    scored AS (
        SELECT e.vec_id, c.cid,
               {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) AS ccos
        FROM e CROSS JOIN cents c
    ),
    pr AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored
    ),
    lab AS (
        SELECT vec_id, cid AS cell,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
                   % 1000000 >= 800000 AS is_new
        FROM pr WHERE rn = 1
    )
    SELECT cell,
           CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) * 1000000
                // NULLIF(SUM(CASE WHEN is_new THEN 0 ELSE 1 END), 0)
                AS BIGINT) AS growth_ppm
    FROM lab GROUP BY cell
"""


@REGISTRY.add("d60_incremental_ann_ingest", _INGEST_ORACLE, "similarity",
              "ann", "incremental")
def d60_incremental_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell base/new counts and growth (integer ppm) when the 20%
    md5-bucket batch is assigned to the frozen seed-centroid IVF index
    — the retrain-trigger audit; assignment is one Arrow-batched pass
    against the broadcast centroid matrix, no index rebuild."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    # r15 nullemb widening: a NULL component passes isNotNull but turns
    # the Arrow batch's float64 row into NaN — silent cell drift vs the
    # oracle; NULL-or-NaN-component vectors leave the domain on both
    # engines (zero rows filtered on clean corpora)
    e = sim.drop_nonfinite_vectors(
        sim._drop_null_vectors(
            load(spark, sf_dir, "embeddings"), "embedding"
        ),
        "embedding",
    )
    crows = sorted(
        e.where(F.col("vec_id") < _IVF_CELLS)
        .select("vec_id", "embedding").collect(),
        key=lambda r: r[0],
    )
    cids = np.fromiter((r[0] for r in crows), dtype=np.int64, count=len(crows))
    C = np.array([r[1] for r in crows], dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1)) if len(crows) else np.zeros(0)
    bc = spark.sparkContext.broadcast((cids, C, cn))
    out_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("cell", LongType()),
    ])

    def assign(batches):
        ids_c, M, cnorm = bc.value
        for pdf in batches:
            if len(pdf) == 0 or len(ids_c) == 0:
                continue
            A = np.array([list(v) for v in pdf["embedding"]],
                         dtype=np.float64)
            norms = np.sqrt((A * A).sum(axis=1))
            S = (A @ M.T) / np.outer(norms, cnorm)
            # argmax with ties toward the smaller centroid id: ids_c is
            # ascending and np.argmax takes the FIRST maximum
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                "cell": ids_c[np.argmax(S, axis=1)],
            })

    assigned = e.select("vec_id", "embedding").mapInPandas(
        assign, out_schema
    )
    from .sampling import md5_bucket

    lab = assigned.withColumn(
        "is_new", md5_bucket(F.col("vec_id")) % 1000000 >= 800000
    )
    return lab.groupBy("cell").agg(
        F.sum(F.when(F.col("is_new"), 0).otherwise(1)).cast("bigint")
        .alias("n_base"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("bigint")
        .alias("n_new"),
        F.expr(
            "CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) * 1000000"
            " div NULLIF(sum(CASE WHEN is_new THEN 0 ELSE 1 END), 0)"
            " AS BIGINT)"
        ).alias("growth_ppm"),
    )


# ---------------------------------------------------------------------------
# d61: DUPLICATED n-GRAM COVERAGE — the Lee-et-al corpus statistic that
# motivates span dedup (d50 finds the spans; this measures the mass):
# for each document, what fraction of its 5-gram OCCURRENCES is text
# that also appears in at least one other document? One shuffle keyed on
# the shingle (groupBy → distinct-doc count), one keyed on doc_id — the
# standard two-exchange job. The shuffle key is a 60-bit md5 prefix of
# the shingle (the suite's portable hash-bucket pattern), NOT the raw
# 5-gram string: the text is dropped before BOTH exchanges, so shuffle
# bytes are 8-byte keys instead of ~30-byte strings — the 100 TB shape.
# A hash collision glues two shingles and can only OVERSTATE
# duplication, never lose mass (and both engines hash identically, so
# parity holds bit-for-bit regardless).
_DUPCOV_N = 5
_GRAM = (
    f"array_to_string(toks[i:i+{_DUPCOV_N - 1}], ' ')"
)
_DUPCOV_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) >= {_DUPCOV_N}
    ), occ AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {_DUPCOV_N - 2}),
                      i -> CAST(CAST('0x' || substr(md5({_GRAM}), 1, 15)
                                AS UBIGINT) AS BIGINT)))
                   AS gh
        FROM t
    ), dfreq AS (
        SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM occ GROUP BY gh
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup,
           CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS dup_ppm
    FROM occ o JOIN dfreq d USING (gh)
    GROUP BY o.doc_id
"""


@REGISTRY.add("d61_dup_ngram_coverage", _DUPCOV_ORACLE, "dedup", "text",
              "audit")
def d61_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated 5-gram coverage (integer ppm of shingle
    occurrences whose text appears in ≥2 documents) — the corpus
    duplication-mass audit behind span-dedup decisions. Shuffles the
    60-bit md5 prefix of each shingle, never the shingle text — and the
    occurrence stream shuffles exactly ONCE (to the distinct
    (gh, doc_id) pair grain, carrying the occurrence count); the
    doc-frequency aggregate and the nd-join both run over the far
    smaller pair table, whose gh-exchange Spark reuses across the two
    consumers (ReusedExchange), so the hash is computed once per
    occurrence and the heavy table crosses the wire once."""
    d = load(spark, sf_dir, "documents").where(
        F.size(T.tokens(F.col("text"))) >= _DUPCOV_N
    )
    occ = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {_DUPCOV_N - 1}),"
                " i -> CAST(conv(substring(md5("
                f"array_join(slice(split(text, ' '), i, {_DUPCOV_N}), ' ')"
                "), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("gh"),
    )
    pairs = occ.groupBy("gh", "doc_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dfreq = pairs.groupBy("gh").agg(F.count(F.lit(1)).alias("nd"))
    return (
        pairs.join(dfreq, "gh")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, F.col("cnt")).otherwise(0))
            .cast("bigint").alias("n_dup"),
            F.expr(
                "CAST(sum(CASE WHEN nd >= 2 THEN cnt ELSE 0 END) * 1000000"
                " div sum(cnt) AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# d62: SOURCE QUALITY PRIOR — empirical-Bayes shrinkage of the per-source
# mean quality toward the corpus mean: sources with few documents get
# pulled to the prior, high-volume sources keep their own mean. This is
# the number a mixture policy (d29) reads when a NEW source appears with
# 50 documents: its raw mean is noise, the shrunk prior is usable.
# Quality here is the type-token ratio in integer ppm (distinct tokens
# per token), so every stage — per-doc score, corpus mean, shrunk
# posterior — stays in exact BIGINT arithmetic across both engines.
_SQP_K = 20  # pseudo-count: the prior weighs as 20 documents
_Q_PPM = f"CAST(len({_DTOKS}) * 1000000 // len({_TOKS}) AS BIGINT)"
_SQP_ORACLE = f"""
    WITH q AS (
        SELECT source, {_Q_PPM} AS q_ppm FROM documents
    ), g AS (
        SELECT CAST(SUM(q_ppm) // COUNT(*) AS BIGINT) AS gq FROM q
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q_ppm) // COUNT(*) AS BIGINT) AS mean_q_ppm,
           CAST((SUM(q_ppm) + {_SQP_K} * (SELECT gq FROM g))
                // (COUNT(*) + {_SQP_K}) AS BIGINT) AS prior_q_ppm,
           CAST((SUM(q_ppm) + {_SQP_K} * (SELECT gq FROM g))
                // (COUNT(*) + {_SQP_K})
                - SUM(q_ppm) // COUNT(*) AS BIGINT) AS shrink_ppm
    FROM q GROUP BY source
"""


@REGISTRY.add("d62_source_quality_prior", _SQP_ORACLE, "text", "quality",
              "audit")
def d62_source_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean type-token quality (integer ppm) shrunk toward
    the corpus mean with a 20-doc pseudo-count — the empirical-Bayes
    prior a mixture policy reads for low-volume sources."""
    d = load(spark, sf_dir, "documents")
    q = d.select(
        "source",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("q_ppm"),
    )
    g = q.agg(
        F.expr("CAST(sum(q_ppm) div count(*) AS BIGINT)").alias("gq")
    )
    per_src = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("q_ppm").alias("_sum"),
    )
    return per_src.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        F.expr("CAST(_sum div n_docs AS BIGINT)").alias("mean_q_ppm"),
        F.expr(
            f"CAST((_sum + {_SQP_K} * gq) div (n_docs + {_SQP_K}) AS BIGINT)"
        ).alias("prior_q_ppm"),
        F.expr(
            f"CAST((_sum + {_SQP_K} * gq) div (n_docs + {_SQP_K})"
            " - _sum div n_docs AS BIGINT)"
        ).alias("shrink_ppm"),
    )


# ---------------------------------------------------------------------------
# d63/d64: IVF index-health audits. Both read ONE materialized seed-
# centroid assignment table per (session, dataset) — the _CLUSTER_CACHE
# contract applied to the IVF assignment pass (r08 verdict task 4): the
# Arrow kernel runs once, localCheckpoint materializes (vec_id, cell,
# ccos), and every consumer reads the artifact the way a production
# index pipeline assigns a corpus once per build. bench.py times the
# build separately under `shared`. The kernel ALSO emits the winning
# cosine (the left-fold _cosine_block kernel, ties toward the smaller
# centroid id — the exact arithmetic d13's oracle already certifies).
_IVF_ASSIGN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _ivf_assign_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _IVF_ASSIGN_CACHE.get(key)
    if cached is None:
        # NULL vectors drop (existing contract) AND NaN-containing
        # vectors leave the domain (nanemb, r14 — both d63/d64 oracles
        # read _E_CTE_FIN)
        e = sim.drop_nan_vectors(
            sim._drop_null_vectors(
                load(spark, sf_dir, "embeddings"), "embedding"
            ),
            "embedding",
        )
        cached = _seed_assign_with_cos(spark, e).localCheckpoint()
        for k in [k for k in _IVF_ASSIGN_CACHE if k[0] != key[0]]:
            del _IVF_ASSIGN_CACHE[k]
        _IVF_ASSIGN_CACHE[key] = cached
    return cached


def _seed_assign_with_cos(
    spark: SparkSession, e: DataFrame, n_cells: int = _IVF_CELLS
) -> DataFrame:
    """(vec_id, cell, ccos) for every embedding against the id<n_cells
    seed centroids — bit-exact left-fold cosines, argmax ties to the
    smaller id. The Arrow block kernel keeps the n·n_cells assignment
    vectorized (the interpreted JVM fold at corpus-scaled cell counts
    measured 68.7 s at 30× rows in m18's second draft). Delegates to the
    SHARED operator kernel ``similarity.assign_cells`` (r13 verdict
    tasks 4-5): the centroid pull stays n_cells-bounded below
    ``MAX_BROADCAST_CENTROIDS``, and above it the old docstring's "at
    100 TB that pull becomes a broadcast-join against a stored centroid
    table" remedy is now a REAL guard — assignment switches to the
    block-partitioned centroid join, same plan downstream.

    The kernel pass is sized to the vector count (``n=`` → ≥512
    vectors/task, similarity._kernel_parts): the one cheap count job
    replaces defaultParallelism near-empty Python workers per pass."""
    return sim.assign_cells(e, "vec_id", "embedding", n_cells, n=e.count())


_IVF_BAL_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN}),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < {_IVF_CELLS}),
    scored AS (
        SELECT e.vec_id, c.cid,
               {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) AS ccos
        FROM e CROSS JOIN cents c
    ),
    pr AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored
    ),
    asg AS (SELECT vec_id, cid AS cell FROM pr WHERE rn = 1),
    pc AS (SELECT cell, COUNT(*) AS nv FROM asg GROUP BY cell),
    tot AS (SELECT SUM(nv) AS n, MAX(nv) AS mx, COUNT(*) AS k FROM pc)
    SELECT pc.cell,
           CAST(pc.nv AS BIGINT) AS n_vecs,
           CAST(pc.nv * 1000000 // t.n AS BIGINT) AS share_ppm,
           CAST(t.mx * t.k * 1000000 // t.n AS BIGINT) AS index_skew_ppm
    FROM pc CROSS JOIN tot t
"""


@REGISTRY.add("d63_ivf_balance_audit", _IVF_BAL_ORACLE, "similarity", "ann",
              "audit")
def d63_ivf_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell population of the seed-centroid IVF index plus the q43
    skew statistic (max·k·10⁶ div n): a hot cell means probe latency is
    that cell's scan — the number that decides a Lloyd re-train or a
    cell split before a 100 TB index build. Reads the shared
    materialized assignment table (one Arrow pass per session/dataset)."""
    asg = _ivf_assign_table(spark, sf_dir)
    pc = asg.groupBy("cell").agg(F.count(F.lit(1)).alias("nv"))
    tot = pc.agg(
        F.sum("nv").alias("n"), F.max("nv").alias("mx"),
        F.count(F.lit(1)).alias("k"),
    )
    return pc.crossJoin(F.broadcast(tot)).select(
        "cell",
        F.col("nv").cast("bigint").alias("n_vecs"),
        F.expr("CAST(nv * 1000000 div n AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(mx * k * 1000000 div n AS BIGINT)").alias(
            "index_skew_ppm"
        ),
    )


_OUTL_FRAC_DIV = 20  # bottom 5% of each cell by centroid cosine
_OUTL_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN}),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < {_IVF_CELLS}),
    scored AS (
        SELECT e.vec_id, c.cid,
               {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) AS ccos
        FROM e CROSS JOIN cents c
    ),
    pr AS (
        SELECT vec_id, cid, ccos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored
    ),
    asg AS (SELECT vec_id, cid AS cell, ccos FROM pr WHERE rn = 1),
    rk AS (
        SELECT vec_id, cell, ccos,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY ccos ASC, vec_id ASC) AS r,
               COUNT(*) OVER (PARTITION BY cell) AS nc
        FROM asg
    )
    SELECT vec_id, cell, ccos,
           CAST(nc AS BIGINT) AS cell_n,
           r <= nc // {_OUTL_FRAC_DIV} AS is_outlier
    FROM rk
"""


@REGISTRY.add("d64_embedding_outliers", _OUTL_ORACLE, "similarity", "quality",
              "audit")
def d64_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier flags: each vector's cosine to its own
    cell centroid, with the bottom 5% of each cell (exact rank, ties to
    smaller vec_id) marked — the SemDeDup-style prune list for vectors
    the index represents worst. Cosines are bit-exact left-folds, so
    the flag is deterministic across engines and partitionings. Reads
    the shared materialized assignment table (one Arrow pass per
    session/dataset)."""
    asg = _ivf_assign_table(spark, sf_dir)
    rk = asg.select(
        "vec_id", "cell", "ccos",
        F.row_number().over(
            W.partitionBy("cell").orderBy(
                F.col("ccos").asc(), F.col("vec_id").asc()
            )
        ).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("cell")).alias("nc"),
    )
    return rk.select(
        "vec_id", "cell", "ccos",
        F.col("nc").cast("bigint").alias("cell_n"),
        (F.col("r") <= F.expr(f"nc div {_OUTL_FRAC_DIV}")).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# d65: TOKEN-BUDGET allocation — the step between d29's mixture weights
# and an actual training run: split a fixed token budget across sources
# proportional to the temperature weights so the per-source quotas are
# INTEGERS that sum to the budget EXACTLY. Largest-remainder (Hamilton)
# apportionment: floor every share, then hand the leftover units to the
# sources with the largest remainders (ties → source asc). Float
# proportional splits can't give Σ=budget; this is all-BIGINT. State is
# #sources-sized end to end.
_BUDGET_TOKENS = 1_000_000
_ALLOC_ORACLE = f"""
    WITH s AS (
        SELECT source,
               CAST(FLOOR(sqrt(CAST(SUM(len(string_split(text, ' ')))
                                    AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_e6
        FROM documents GROUP BY source
    ), t AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS tw,
                    CAST(COUNT(*) AS BIGINT) AS k FROM s),
    base AS (
        SELECT s.source, s.w_e6, t.tw,
               {_BUDGET_TOKENS} * s.w_e6 // t.tw AS floor_alloc,
               {_BUDGET_TOKENS} * s.w_e6 % t.tw AS rem
        FROM s CROSS JOIN t
    ), lo AS (
        SELECT CAST({_BUDGET_TOKENS} - SUM(floor_alloc) AS BIGINT)
            AS leftover FROM base
    ), rk AS (
        SELECT source, w_e6, floor_alloc, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS r
        FROM base
    )
    SELECT rk.source, rk.w_e6,
           CAST(rk.floor_alloc AS BIGINT) AS floor_alloc,
           CAST(rk.rem AS BIGINT) AS remainder,
           rk.r <= lo.leftover AS gets_extra,
           CAST(rk.floor_alloc
                + CASE WHEN rk.r <= lo.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM rk CROSS JOIN lo
"""


@REGISTRY.add("d65_token_budget_allocation", _ALLOC_ORACLE, "text",
              "sampling", "training")
def d65_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 10⁶-token budget across
    sources by the d29 temperature weights — integer quotas that sum to
    the budget exactly."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.expr(
            "CAST(FLOOR(sqrt(CAST(SUM(size(split(text, ' '))) AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("w_e6")
    )
    t = s.agg(F.sum("w_e6").alias("tw"))
    base = s.crossJoin(F.broadcast(t)).select(
        "source", "w_e6",
        F.expr(f"{_BUDGET_TOKENS} * w_e6 div tw").alias("floor_alloc"),
        F.expr(f"{_BUDGET_TOKENS} * w_e6 % tw").alias("rem"),
    )
    lo = base.agg(
        (F.lit(_BUDGET_TOKENS) - F.sum("floor_alloc")).cast("bigint")
        .alias("leftover")
    )
    rk = base.select(
        "source", "w_e6", "floor_alloc", "rem",
        F.row_number().over(
            W.orderBy(F.col("rem").desc(), F.col("source").asc())
        ).alias("r"),  # #sources rows — the window state is dictionary-sized
    )
    return rk.crossJoin(F.broadcast(lo)).select(
        "source", "w_e6",
        F.col("floor_alloc").cast("bigint").alias("floor_alloc"),
        F.col("rem").cast("bigint").alias("remainder"),
        (F.col("r") <= F.col("leftover")).alias("gets_extra"),
        (F.col("floor_alloc")
         + F.when(F.col("r") <= F.col("leftover"), 1).otherwise(0))
        .cast("bigint").alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# d67: DEDUP THRESHOLD SWEEP — the tuning table behind _CLUSTER_T: for
# each candidate keep-threshold, how many verified pairs survive and how
# many documents are touched? Pure composition over the SHARED pair
# stream (one tokenize+signature+band pass for the whole suite): band
# candidates are threshold-independent, so sweeping thresholds is four
# filters over one materialized table — the jaccard doubles are the
# hash-proven d06 values, compared against the same literals in both
# engines.
_SWEEP_PPM = [900000, 925000, 950000, 975000]
_SWEEP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM documents
    ), tok AS (
        SELECT doc_id, unnest(tokens) AS token FROM toks
    ), mh AS (
        SELECT doc_id, {_mh_cols}
        FROM tok GROUP BY doc_id
    ), {_BAND_CAND_CTES}, pairs AS (
        SELECT c.i, c.j,
               len(list_intersect(ta.tokens, tb.tokens)) * 1.0
                 / (len(ta.tokens) + len(tb.tokens)
                    - len(list_intersect(ta.tokens, tb.tokens))) AS jaccard
        FROM cand c
        JOIN toks ta ON ta.doc_id = c.i
        JOIN toks tb ON tb.doc_id = c.j
    ), th AS (SELECT unnest([{", ".join(str(t) for t in _SWEEP_PPM)}]) AS t),
    hits AS (
        SELECT th.t, p.i, p.j FROM th JOIN pairs p
          ON p.jaccard >= th.t / 1000000.0
    ), np AS (SELECT t, COUNT(*) AS n_pairs FROM hits GROUP BY t),
    nd AS (
        SELECT t, COUNT(DISTINCT d) AS n_docs
        FROM (SELECT t, i AS d FROM hits UNION ALL SELECT t, j FROM hits)
        GROUP BY t
    )
    SELECT np.t AS threshold_ppm,
           CAST(np.n_pairs AS BIGINT) AS n_pairs,
           CAST(nd.n_docs AS BIGINT) AS n_docs_affected
    FROM np JOIN nd ON nd.t = np.t
"""


@REGISTRY.add("d67_dedup_threshold_sweep", _SWEEP_ORACLE, "dedup", "lsh",
              "audit")
def d67_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified-pair and affected-doc counts at four candidate dedup
    thresholds — four filters over the one shared LSH pair stream."""
    pairs = _lsh_pair_stream(spark, sf_dir)
    th = F.explode(F.array(*[F.lit(t) for t in _SWEEP_PPM])).alias("t")
    hits = pairs.select("i", "j", "jaccard").select(
        th, "i", "j", "jaccard"
    ).where(F.col("jaccard") >= F.col("t") / F.lit(1000000.0))
    np_ = hits.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    nd = (
        hits.select("t", F.col("i").alias("d"))
        .unionByName(hits.select("t", F.col("j").alias("d")))
        .groupBy("t")
        .agg(F.count_distinct("d").cast("bigint").alias("n_docs_affected"))
    )
    return np_.join(nd, "t").select(
        F.col("t").cast("bigint").alias("threshold_ppm"),
        "n_pairs", "n_docs_affected",
    )


# ---------------------------------------------------------------------------
# d66: HELD-OUT NLL — the eval loop for the LM-quality signal: train the
# add-one bigram LM on the md5 80% train bucket ONLY, score the 10% val
# bucket under it. d28 scores the corpus under itself (a quality
# filter); this is the train→eval direction (an eval-integrity audit):
# n_unseen counts val bigrams the train model never saw, and avg_nll on
# the held-out set is the number a perplexity-filter threshold is tuned
# against. Same fixed-point discipline (per-position FLOOR(ln·1e6),
# BIGINT sums; ln is cross-engine-pinned, pow is not).
_HNLL_BUCKET = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000000"
)
_HNLL_ORACLE = f"""
    WITH tr AS (
        SELECT doc_id, text FROM documents WHERE {_HNLL_BUCKET} < 800000
    ), ev AS (
        SELECT doc_id, text FROM documents
        WHERE {_HNLL_BUCKET} >= 800000 AND {_HNLL_BUCKET} < 900000
    ), tt AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM tr
    ), tp AS (
        SELECT ts[i] AS w1, ts[i + 1] AS w2
        FROM tt, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
    ), c2 AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM tp GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), vocab AS (
        SELECT COUNT(DISTINCT token) AS v
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM tr)
    ), et AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM ev
    ), ep AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM et, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
    ), occ AS (
        SELECT doc_id, w1, w2, COUNT(*) AS n_occ FROM ep GROUP BY 1, 2, 3
    ), agg AS (
        SELECT o.doc_id,
               SUM(o.n_occ) AS n_bigrams,
               SUM(o.n_occ * CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END)
                   AS n_unseen,
               SUM(o.n_occ * CAST(FLOOR(
                   ln((CAST(COALESCE(c1.c1, 0) AS DOUBLE)
                       + CAST(vocab.v AS DOUBLE))
                      / (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 1.0))
                   * 1000000.0
               ) AS BIGINT)) AS nll_e6
        FROM occ o
        LEFT JOIN c2 USING (w1, w2)
        LEFT JOIN c1 USING (w1)
        CROSS JOIN vocab
        GROUP BY o.doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(n_unseen AS BIGINT) AS n_unseen,
           CAST(nll_e6 AS BIGINT) AS nll_e6,
           CAST(nll_e6 AS DOUBLE) / n_bigrams AS avg_nll
    FROM agg
"""


@REGISTRY.add("d66_heldout_nll", _HNLL_ORACLE, "text", "quality", "training")
def d66_heldout_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram NLL: val-bucket documents scored under the LM
    trained on the train bucket only, with unseen-bigram counts."""
    from ..operators.search import bigram_nll_heldout
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id")) % 1000000
    train = d.where(b < 800000)
    ev = d.where((b >= 800000) & (b < 900000))
    return bigram_nll_heldout(train, ev)


# ---------------------------------------------------------------------------
# d68: INCREMENTAL CLUSTER MAINTENANCE — the production answer to "do we
# re-cluster the corpus daily?": a 20% md5-bucket "new batch" is
# assigned against the FROZEN cluster store (the shared resolved
# cluster table restricted to stored docs, canonicals re-minimized over
# stored members) via the shared LSH pair stream — each new doc either
# ATTACHES to the one stored cluster it matches, flags a MERGE (its
# matches span ≥2 stored clusters — the signal that defers to the next
# full resolution), or opens a NEW cluster. The plan has NO CC
# iteration: it reads two materialized artifacts (cluster table + pair
# stream, both localCheckpoint scans) and runs keyed joins/aggs only —
# asserted in tests/test_plans.py. The oracle re-derives the frozen
# store from its own recursive-CC walk and the same md5 bucket split.
#
# Consistency invariant: because this registered form derives the store
# from the CURRENT corpus's resolution (restricted to stored members),
# today's bridges are already folded in, so 'merges' cannot appear —
# its absence IS the store-consistency check (a 'merges' row would
# prove the store stale relative to the pair stream). The branch itself
# is exercised on a deliberately stale store in
# tests/test_incremental_dedup.py via operators/incremental_dedup.
# cluster_merge_audit, the keyed-joins-only core this query calls.
_INC_NEW_PPM = 200_000
_INCCLUST_ORACLE = f"""{_CLUSTER_CTES},
    bkt AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   % 1000000 < {_INC_NEW_PPM} AS is_new
        FROM documents
    ),
    stored AS (
        SELECT c.doc_id, c.canonical_id
        FROM comp c JOIN bkt USING (doc_id) WHERE NOT is_new
    ),
    frozen AS (
        SELECT s.doc_id, m.fc
        FROM stored s
        JOIN (SELECT canonical_id, MIN(doc_id) AS fc
              FROM stored GROUP BY canonical_id) m USING (canonical_id)
    ),
    np AS (
        SELECT p.i AS nd, p.j AS sd
        FROM pairs p
        JOIN bkt a ON a.doc_id = p.i
        JOIN bkt b ON b.doc_id = p.j
        WHERE a.is_new AND NOT b.is_new
        UNION ALL
        SELECT p.j, p.i
        FROM pairs p
        JOIN bkt a ON a.doc_id = p.i
        JOIN bkt b ON b.doc_id = p.j
        WHERE b.is_new AND NOT a.is_new
    ),
    m AS (
        SELECT np.nd AS doc_id,
               COUNT(*) AS n_matches,
               COUNT(DISTINCT f.fc) AS n_clusters,
               MIN(f.fc) AS mc
        FROM np JOIN frozen f ON f.doc_id = np.sd
        GROUP BY np.nd
    )
    SELECT b.doc_id,
           CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
           CAST(COALESCE(m.n_clusters, 0) AS BIGINT) AS n_stored_clusters,
           CAST(COALESCE(m.mc, b.doc_id) AS BIGINT) AS canonical_id,
           CASE WHEN m.doc_id IS NULL THEN 'new_cluster'
                WHEN m.n_clusters = 1 THEN 'attached'
                ELSE 'merges' END AS action
    FROM bkt b LEFT JOIN m ON m.doc_id = b.doc_id
    WHERE b.is_new
"""


@REGISTRY.add("d68_incremental_clusters", _INCCLUST_ORACLE, "dedup", "lsh",
              "incremental")
def d68_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-audit table for a 20% new batch against the frozen cluster
    store: per new doc its verified stored matches, how many distinct
    stored clusters they span (≥2 ⇒ a deferred merge), the assigned
    canonical (min matched frozen canonical, else itself), and the
    action — no CC recompute anywhere in the plan."""
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents").select("doc_id")
    bkt = d.select(
        "doc_id",
        (md5_bucket(F.col("doc_id")) % 1000000 < _INC_NEW_PPM)
        .alias("is_new"),
    )
    ct = _cluster_table(spark, sf_dir)  # frozen shared artifact
    stored = ct.join(bkt.where(~F.col("is_new")), "doc_id").select(
        "doc_id", "canonical_id"
    )
    fmin = stored.groupBy("canonical_id").agg(
        F.min("doc_id").alias("fc")
    )
    frozen = stored.join(fmin, "canonical_id").select("doc_id", "fc")
    pairs = _lsh_pair_stream(spark, sf_dir).where(
        F.col("jaccard") >= _CLUSTER_T
    )
    pb = (
        pairs.join(bkt.select(F.col("doc_id").alias("i"),
                              F.col("is_new").alias("new_i")), "i")
        .join(bkt.select(F.col("doc_id").alias("j"),
                         F.col("is_new").alias("new_j")), "j")
    )
    np_ = (
        pb.where(F.col("new_i") & ~F.col("new_j"))
        .select(F.col("i").alias("nd"), F.col("j").alias("sd"))
        .unionByName(
            pb.where(F.col("new_j") & ~F.col("new_i"))
            .select(F.col("j").alias("nd"), F.col("i").alias("sd"))
        )
    )
    from ..operators.incremental_dedup import cluster_merge_audit

    return cluster_merge_audit(
        bkt.where(F.col("is_new")).select("doc_id"), np_, frozen
    )


# ---------------------------------------------------------------------------
# d69: EVAL-SET DECONTAMINATION — the audit that certifies d66's
# held-out split before its NLL means anything: for each validation
# document (the SAME md5 buckets d66 trains/evaluates on), how many of
# its distinct 8-grams also occur in ANY training document? A shared
# 8-gram is the GPT-3/Lee-style contamination signal: the val doc's
# loss is partly memorization, not generalization, and the doc should
# be dropped from the eval (or the train dup removed). Plan shape is
# d61's: the shuffle key is the 60-bit md5 prefix of the gram (text
# dropped before every exchange), the train side reduces to DISTINCT
# hashed grams, and one keyed left join + one doc-keyed agg produce the
# per-val-doc report. At 100 TB the train gram set is the big side —
# both exchanges stay keyed, nothing broadcasts.
_DECON_N = 8
_DECON_GRAM = f"array_to_string(toks[i:i+{_DECON_N - 1}], ' ')"
_DECON_ORACLE = f"""
    WITH b AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   % 1000000 AS bk
        FROM documents
    ), t AS (
        SELECT doc_id, {_TOKS} AS toks, bk FROM b
        WHERE len({_TOKS}) >= {_DECON_N}
    ), occ AS (
        SELECT DISTINCT doc_id, bk,
               unnest(list_transform(range(1, len(toks) - {_DECON_N - 2}),
                      i -> CAST(CAST('0x' || substr(md5({_DECON_GRAM}), 1, 15)
                                AS UBIGINT) AS BIGINT)))
                   AS gh
        FROM t
    ), tr AS (
        SELECT DISTINCT gh FROM occ WHERE bk < 800000
    ), va AS (
        SELECT doc_id, gh FROM occ WHERE bk >= 800000 AND bk < 900000
    )
    SELECT va.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN tr.gh IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN tr.gh IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS contamination_ppm,
           SUM(CASE WHEN tr.gh IS NOT NULL THEN 1 ELSE 0 END) > 0
               AS is_contaminated
    FROM va LEFT JOIN tr USING (gh)
    GROUP BY va.doc_id
"""


@REGISTRY.add("d69_eval_decontamination", _DECON_ORACLE, "text", "quality",
              "dedup", "training")
def d69_eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-val-doc 8-gram contamination against the train split (d66's
    exact md5 buckets): distinct-gram count, shared-with-train count,
    integer contamination ppm, and the drop flag. Hashed gram keys only
    cross the shuffle (d61's 60-bit md5-prefix pattern)."""
    from .sampling import md5_bucket

    d = load(spark, sf_dir, "documents").where(
        F.size(T.tokens(F.col("text"))) >= _DECON_N
    )
    occ = d.select(
        "doc_id",
        (md5_bucket(F.col("doc_id")) % 1000000).alias("bk"),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {_DECON_N - 1}),"
                " i -> CAST(conv(substring(md5("
                f"array_join(slice(split(text, ' '), i, {_DECON_N}), ' ')"
                "), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("gh"),
    ).distinct()
    tr = occ.where(F.col("bk") < 800000).select("gh").distinct()
    va = occ.where((F.col("bk") >= 800000) & (F.col("bk") < 900000)).select(
        "doc_id", "gh"
    )
    j = va.join(tr.withColumn("_hit", F.lit(1)), "gh", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("bigint").alias("n_shared"),
        F.expr(
            "CAST(sum(coalesce(_hit, 0)) * 1000000 div count(*) AS BIGINT)"
        ).alias("contamination_ppm"),
        (F.sum(F.coalesce("_hit", F.lit(0))) > 0).alias("is_contaminated"),
    )


# ---------------------------------------------------------------------------
# m18 (registered here with the embedding queries): CROSS-MODAL PAIR
# MINING — the CLIP-style step that pairs each image document with its
# best non-image "caption" candidate by embedding cosine, WITHOUT an
# all-pairs scan: both sides take the CORPUS-SCALED cell assignment
# (operators/similarity.cell_assign — n_cells = max(16, ceil(n/512)),
# the d44 scale contract), candidates come from the same-cell
# equi-join, cosines are the bit-exact left-fold, and the top-1 per
# image ranks by (cosine DESC, candidate id ASC). The cell count MUST
# scale with the corpus: the first draft read the fixed-16-seed shared
# audit table and measured 45.8 s at 30× rows (pair space n²/16 —
# quadratic); auto-sizing holds per-cell population constant so pair
# work per image is flat. Images with no same-cell candidate are
# absent — at 100 TB you raise nprobe, not the pair space. The oracle
# derives the identical cell count from COUNT(*).
_XM_ROWS = 512
_XM_ORACLE = f"""
    WITH e AS ({_E_CTE_FIN}),
    nc AS (SELECT GREATEST(16, CAST(CEIL(COUNT(*) / {_XM_ROWS}.0) AS BIGINT))
               AS n FROM e),
    cents AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
              WHERE vec_id < (SELECT n FROM nc)),
    pr AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   {_DOT.format(a='e.v', b='c.cv')} / (e.norm * c.cn) DESC,
                   c.cid ASC) AS rn
        FROM e CROSS JOIN cents c
    ),
    asg AS (SELECT vec_id, cid AS cell FROM pr WHERE rn = 1),
    img AS (
        SELECT a.vec_id AS i, a.cell, e.v AS vi, e.norm AS ni
        FROM asg a JOIN e ON e.vec_id = a.vec_id
        WHERE a.vec_id % 3 = 0
    ),
    cand AS (
        SELECT a.vec_id AS j, a.cell, e.v AS vj, e.norm AS nj
        FROM asg a JOIN e ON e.vec_id = a.vec_id
        WHERE a.vec_id % 3 <> 0
    ),
    p AS (
        SELECT img.i, cand.j, img.cell,
               {_DOT.format(a='img.vi', b='cand.vj')} / (img.ni * cand.nj)
                   AS cosine,
               COUNT(*) OVER (PARTITION BY img.i) AS cand_n,
               ROW_NUMBER() OVER (
                   PARTITION BY img.i
                   ORDER BY {_DOT.format(a='img.vi', b='cand.vj')}
                            / (img.ni * cand.nj) DESC, cand.j ASC) AS rn
        FROM img JOIN cand ON cand.cell = img.cell
    )
    SELECT i AS image_id, j AS match_id, cell, cosine,
           CAST(cand_n AS BIGINT) AS cand_n
    FROM p WHERE rn = 1
"""


@REGISTRY.add("m18_cross_modal_pairs", _XM_ORACLE, "similarity",
              "multimodal", "training-data")
def m18_cross_modal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 non-image caption candidate per image document by exact
    within-cell cosine: corpus-scaled cell count, Arrow block-cosine
    assignment, same-cell equi-join, left-fold pair cosine, ties to
    the smaller candidate id."""
    from pyspark.sql import Window as W

    e0 = sim.drop_nan_vectors(
        sim._drop_null_vectors(
            load(spark, sf_dir, "embeddings"), "embedding"
        ),
        "embedding",  # nanemb vector-domain contract (oracle: _E_CTE_FIN)
    )
    n_cells = max(16, -(-e0.count() // _XM_ROWS))
    # Arrow block-cosine assignment (vectorized n·n_cells) — the
    # interpreted JVM fold here measured 68.7 s at 30x rows
    asg = _seed_assign_with_cos(spark, e0, n_cells=n_cells).select(
        "vec_id", "cell"
    )
    ev = e0.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(sim._dot(F.col("v"), F.col("v"))))
    av = asg.join(ev, "vec_id").select(
        F.col("vec_id").alias("vid"), "cell", "v", "norm"
    )
    img = av.where(F.col("vid") % 3 == 0).select(
        F.col("vid").alias("i"), "cell",
        F.col("v").alias("vi"), F.col("norm").alias("ni"),
    )
    cand = av.where(F.col("vid") % 3 != 0).select(
        F.col("vid").alias("j"), "cell",
        F.col("v").alias("vj"), F.col("norm").alias("nj"),
    )
    p = img.join(cand, "cell").select(
        "i", "j", "cell",
        (sim._dot_kernel("vi", "vj") / (F.col("ni") * F.col("nj")))
        .alias("cosine"),
    )
    w = W.partitionBy("i")
    ranked = p.select(
        "i", "j", "cell", "cosine",
        F.count(F.lit(1)).over(w).alias("cand_n"),
        F.row_number().over(
            w.orderBy(F.col("cosine").desc(), F.col("j").asc())
        ).alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("i").alias("image_id"), F.col("j").alias("match_id"),
        "cell", "cosine", F.col("cand_n").cast("bigint").alias("cand_n"),
    )


# ---------------------------------------------------------------------------
# d70: SPAN-DEDUP TRAINING WEIGHTS — the ACTION on d50's span table
# (SoftDeDup-style): instead of dropping documents with duplicated
# regions, downweight them by the fraction of tokens inside any
# duplicated span, so the loss contribution of repeated text shrinks
# while unique text keeps full weight. d50's maximal spans can OVERLAP
# in token space (two shingle-start runs separated by a gap < k share
# tail tokens), so the duplicated-token count is the INTERVAL-UNION
# length per doc — islands over [start, end] with a cumulative-max end
# (both engines window-express this identically); summing span_len
# raw would double-count and could push weights negative. All integer:
# weight_ppm = 10⁶ − dup_ppm.
_SDW_ORACLE = f"""
    WITH spans AS ({_SUBSTR_SPAN_ORACLE}),
    s2 AS (
        SELECT doc_id, span_start, span_end,
               MAX(span_end) OVER (PARTITION BY doc_id ORDER BY span_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM spans
    ),
    isl AS (
        SELECT doc_id, span_start, span_end,
               SUM(CASE WHEN prev_max IS NULL
                          OR span_start > prev_max THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY span_start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM s2
    ),
    cov AS (
        SELECT doc_id,
               SUM(mx - mn + 1) AS dup
        FROM (SELECT doc_id, island, MIN(span_start) AS mn,
                     MAX(span_end) AS mx
              FROM isl GROUP BY doc_id, island)
        GROUP BY doc_id
    ),
    n AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT n.doc_id,
           CAST(n.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.dup, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(cov.dup, 0) * 1000000 // n.n_tokens AS BIGINT)
               AS dup_ppm,
           CAST(1000000 - COALESCE(cov.dup, 0) * 1000000 // n.n_tokens
                AS BIGINT) AS weight_ppm
    FROM n LEFT JOIN cov USING (doc_id)
"""


@REGISTRY.add("d70_span_dedup_weights", _SDW_ORACLE, "dedup", "text",
              "training")
def d70_span_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc soft-dedup training weight: 10⁶ minus the integer ppm of
    tokens covered by the interval-UNION of d50's duplicated spans
    (overlapping spans merge via cumulative-max islands, so no token
    counts twice and weights stay in [0, 10⁶])."""
    from pyspark.sql import Window

    spans = d50_substring_spans(spark, sf_dir)
    wdoc = Window.partitionBy("doc_id").orderBy("span_start")
    s2 = spans.select(
        "doc_id", "span_start", "span_end",
        F.max("span_end").over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("prev_max"),
    )
    isl = s2.select(
        "doc_id", "span_start", "span_end",
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("span_start") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    cov = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("span_start").alias("mn"), F.max("span_end").alias("mx")
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("mx") - F.col("mn") + 1).alias("dup"))
    )
    n = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return n.join(cov, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce("dup", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.expr(
            "CAST(coalesce(dup, 0) * 1000000 div n_tokens AS BIGINT)"
        ).alias("dup_ppm"),
        F.expr(
            "CAST(1000000 - coalesce(dup, 0) * 1000000 div n_tokens"
            " AS BIGINT)"
        ).alias("weight_ppm"),
    )


# ---------------------------------------------------------------------------
# d71: CLUSTER-CONDUCTANCE audit — the graph-quality number behind the
# 0.95 clustering threshold: for every resolved near-dup cluster, how
# many BORDERLINE edges (pairs at the 0.9 reporting threshold that the
# 0.95 clustering refused to merge) leave the cluster, relative to its
# volume in the 0.9 graph? Conductance ≈ 0 means the cluster is a
# clean clique; a high value means the threshold split a denser
# community and a retune (or a d68 merge review) is due. Composes BOTH
# shared artifacts — the pair stream (edges, with their exact
# jaccards) and the resolved cluster table (labels) — in keyed
# joins/aggs only; every quantity is an exact integer and the ppm is
# one BIGINT division with a zero-denominator guard (a cluster holding
# every edge has min(vol, 2m−vol) = 0).
_COND_ORACLE = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, {_DTOKS} AS tokens FROM documents
    ), tok AS (
        SELECT doc_id, unnest(tokens) AS token FROM toks
    ), mh AS (
        SELECT doc_id, {_mh_cols}
        FROM tok GROUP BY doc_id
    ), {_BAND_CAND_CTES}, pj AS (
        SELECT c.i, c.j,
               len(list_intersect(ta.tokens, tb.tokens)) * 1.0
                 / (len(ta.tokens) + len(tb.tokens)
                    - len(list_intersect(ta.tokens, tb.tokens))) AS jac
        FROM cand c
        JOIN toks ta ON ta.doc_id = c.i
        JOIN toks tb ON tb.doc_id = c.j
    ), p9 AS (
        SELECT i, j FROM pj WHERE jac >= {_MH_THRESHOLD}
    ), p95 AS (
        SELECT i, j FROM pj WHERE jac >= {_CLUSTER_T}
    ), e AS (
        SELECT i AS src, j AS dst FROM p95
        UNION ALL
        SELECT j, i FROM p95
    ), walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node
        WHERE w.label < e.dst
    ), comp AS (
        SELECT node AS doc_id, MIN(label) AS canonical_id
        FROM walk GROUP BY node
    ), members AS (
        SELECT canonical_id, COUNT(*) AS n
        FROM comp GROUP BY canonical_id HAVING COUNT(*) >= 2
    ), el AS (
        SELECT ci.canonical_id AS li, cj.canonical_id AS lj
        FROM p9
        JOIN comp ci ON ci.doc_id = p9.i
        JOIN comp cj ON cj.doc_id = p9.j
    ), tot AS (SELECT COUNT(*) AS m FROM p9),
    intr AS (
        SELECT li AS c, COUNT(*) AS ie FROM el WHERE li = lj GROUP BY li
    ), cut AS (
        SELECT c, COUNT(*) AS ce FROM (
            SELECT li AS c FROM el WHERE li <> lj
            UNION ALL
            SELECT lj FROM el WHERE li <> lj
        ) GROUP BY c
    )
    SELECT mem.canonical_id,
           CAST(mem.n AS BIGINT) AS n_members,
           CAST(COALESCE(i.ie, 0) AS BIGINT) AS internal_edges,
           CAST(COALESCE(cu.ce, 0) AS BIGINT) AS cut_edges,
           CAST(2 * COALESCE(i.ie, 0) + COALESCE(cu.ce, 0) AS BIGINT)
               AS volume,
           CAST(CASE WHEN LEAST(2 * COALESCE(i.ie, 0) + COALESCE(cu.ce, 0),
                               2 * t.m - (2 * COALESCE(i.ie, 0)
                                          + COALESCE(cu.ce, 0))) = 0
                     THEN 0
                     ELSE COALESCE(cu.ce, 0) * 1000000
                          // LEAST(2 * COALESCE(i.ie, 0)
                                   + COALESCE(cu.ce, 0),
                                   2 * t.m - (2 * COALESCE(i.ie, 0)
                                              + COALESCE(cu.ce, 0)))
                END AS BIGINT) AS conductance_ppm
    FROM members mem
    LEFT JOIN intr i ON i.c = mem.canonical_id
    LEFT JOIN cut cu ON cu.c = mem.canonical_id
    CROSS JOIN tot t
"""


@REGISTRY.add("d71_cluster_conductance", _COND_ORACLE, "dedup", "lsh",
              "graph", "audit")
def d71_cluster_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster conductance of the 0.95 near-dup clusters in the 0.9
    borderline-pair graph (cut/min(vol, 2m−vol) in integer ppm) — the
    threshold-tuning audit, reading the two shared artifacts with keyed
    joins/aggs only."""
    ct = _cluster_table(spark, sf_dir)
    lab = ct.select("doc_id", "canonical_id")
    members = ct.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("n")
    ).where(F.col("n") >= 2)
    p9 = _lsh_pair_stream(spark, sf_dir).select("i", "j")
    el = (
        p9.join(lab.select(F.col("doc_id").alias("i"),
                           F.col("canonical_id").alias("li")), "i")
        .join(lab.select(F.col("doc_id").alias("j"),
                         F.col("canonical_id").alias("lj")), "j")
        .select("li", "lj")
    )
    tot = p9.agg(F.count(F.lit(1)).alias("m"))
    intr = el.where(F.col("li") == F.col("lj")).groupBy(
        F.col("li").alias("c")
    ).agg(F.count(F.lit(1)).alias("ie"))
    cut = (
        el.where(F.col("li") != F.col("lj"))
        .select(F.col("li").alias("c"))
        .unionAll(
            el.where(F.col("li") != F.col("lj"))
            .select(F.col("lj").alias("c"))
        )
        .groupBy("c").agg(F.count(F.lit(1)).alias("ce"))
    )
    out = (
        members
        .join(intr, members["canonical_id"] == intr["c"], "left").drop("c")
        .join(cut, members["canonical_id"] == cut["c"], "left").drop("c")
        .crossJoin(F.broadcast(tot))
    )
    vol = "2 * coalesce(ie, 0) + coalesce(ce, 0)"
    den = f"LEAST({vol}, 2 * m - ({vol}))"
    return out.select(
        "canonical_id",
        F.col("n").cast("bigint").alias("n_members"),
        F.coalesce("ie", F.lit(0)).cast("bigint").alias("internal_edges"),
        F.coalesce("ce", F.lit(0)).cast("bigint").alias("cut_edges"),
        F.expr(f"CAST({vol} AS BIGINT)").alias("volume"),
        F.expr(
            f"CAST(CASE WHEN {den} = 0 THEN 0"
            f" ELSE coalesce(ce, 0) * 1000000 div ({den}) END AS BIGINT)"
        ).alias("conductance_ppm"),
    )


# ---------------------------------------------------------------------------
# d72: CLUSTER MERGE QUEUE — the review artifact d71's conductance and
# d68's per-doc merge flags both point at, at the grain a curator
# actually works: for every PAIR of resolved 0.95-clusters connected by
# at least one borderline 0.9-edge, how many edges connect them and how
# big are the two sides? Rank 1 is the strongest merge candidate (most
# borderline edges, ties to the smaller pair) — the ordered work queue
# for the next threshold review / full re-resolution. Same inputs as
# d71 (both shared artifacts), one extra keyed agg at cluster-pair
# grain; singleton "clusters" participate (a borderline edge to a
# singleton is still a merge candidate).
_MQ_ORACLE = f"""{_CLUSTER_CTES},
    b9 AS (
        SELECT c.i, c.j
        FROM cand c
        JOIN toks ta ON ta.doc_id = c.i
        JOIN toks tb ON tb.doc_id = c.j
        WHERE len(list_intersect(ta.tokens, tb.tokens)) * 1.0
                / (len(ta.tokens) + len(tb.tokens)
                   - len(list_intersect(ta.tokens, tb.tokens)))
              >= {_MH_THRESHOLD}
    ),
    sizes AS (
        SELECT canonical_id, COUNT(*) AS n FROM comp GROUP BY canonical_id
    ),
    cp AS (
        SELECT LEAST(ci.canonical_id, cj.canonical_id) AS ca,
               GREATEST(ci.canonical_id, cj.canonical_id) AS cb
        FROM b9
        JOIN comp ci ON ci.doc_id = b9.i
        JOIN comp cj ON cj.doc_id = b9.j
        WHERE ci.canonical_id <> cj.canonical_id
    ),
    q AS (
        SELECT ca, cb, COUNT(*) AS n_border FROM cp GROUP BY ca, cb
    )
    SELECT q.ca AS cluster_a, q.cb AS cluster_b,
           CAST(q.n_border AS BIGINT) AS n_border_edges,
           CAST(sa.n AS BIGINT) AS size_a,
           CAST(sb.n AS BIGINT) AS size_b,
           CAST(ROW_NUMBER() OVER (ORDER BY q.n_border DESC, q.ca ASC,
                                   q.cb ASC) AS BIGINT) AS review_rank
    FROM q
    JOIN sizes sa ON sa.canonical_id = q.ca
    JOIN sizes sb ON sb.canonical_id = q.cb
"""


@REGISTRY.add("d72_cluster_merge_queue", _MQ_ORACLE, "dedup", "lsh", "audit")
def d72_cluster_merge_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered merge-review queue at cluster-pair grain: borderline
    0.9-edge counts between distinct 0.95-clusters with both sizes,
    ranked by edge count (ties to the smaller pair). The global rank
    runs over the queue table, which is |cluster-pairs-with-border-
    edges|-sized — audit-scale, not corpus-scale."""
    from pyspark.sql import Window as W

    ct = _cluster_table(spark, sf_dir)
    lab = ct.select("doc_id", "canonical_id")
    sizes = ct.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("n"))
    p9 = _lsh_pair_stream(spark, sf_dir).select("i", "j")
    cp = (
        p9.join(lab.select(F.col("doc_id").alias("i"),
                           F.col("canonical_id").alias("li")), "i")
        .join(lab.select(F.col("doc_id").alias("j"),
                         F.col("canonical_id").alias("lj")), "j")
        .where(F.col("li") != F.col("lj"))
        .select(
            F.least("li", "lj").alias("ca"),
            F.greatest("li", "lj").alias("cb"),
        )
    )
    q = cp.groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("n_border"))
    out = (
        q.join(sizes.select(F.col("canonical_id").alias("ca"),
                            F.col("n").alias("size_a")), "ca")
        .join(sizes.select(F.col("canonical_id").alias("cb"),
                           F.col("n").alias("size_b")), "cb")
    )
    return out.select(
        F.col("ca").alias("cluster_a"),
        F.col("cb").alias("cluster_b"),
        F.col("n_border").cast("bigint").alias("n_border_edges"),
        F.col("size_a").cast("bigint").alias("size_a"),
        F.col("size_b").cast("bigint").alias("size_b"),
        F.row_number().over(
            W.orderBy(F.col("n_border").desc(), F.col("ca").asc(),
                      F.col("cb").asc())
        ).cast("bigint").alias("review_rank"),
    )
