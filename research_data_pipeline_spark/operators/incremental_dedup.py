"""Incremental dedup of a new batch against a persisted corpus-history
signature store.

A production training-data pipeline does not re-dedup the accumulated
corpus every day: each ingest batch is checked against the SIGNATURES of
everything already accepted (reference analogue: its compute-or-reuse
idempotency, final_tables.py:12-26, which skips recomputation of
already-materialized outputs — here the reusable artifact is the dedup
state itself). The store holds one row per corpus document:

    (doc_id, fingerprint, mh0..mh{n-1}, band0..band{b-1})

- ``fingerprint``: md5 of the sorted distinct token set (same definition
  as d04) — exact-ish duplicate identity.
- ``mh_i``: MinHash components over the distinct token set (same md5
  hash family as ``text_dedup.minhash_signatures``).
- ``band_b``: xxhash64 of the band's component slice — the LSH index key.

Building the store is a PURE PROJECTION: fingerprint and every minhash
component are per-row higher-order-function expressions (``transform`` +
``array_min`` over the distinct-token array), so writing signatures for
a 100 TB corpus is one scan with zero shuffles, and a daily append only
touches the new day's partition.

Matching a batch against the store never scans corpus text (the store IS
the dedup state — resuming does not recompute old signatures) and never
shuffles the corpus when the batch is broadcast-sized, the common daily-
ingest case: the batch side broadcasts into both the fingerprint equi-
join and the per-band joins, so the corpus store streams map-side
through every probe. Above ``MAX_BROADCAST_SIGNATURES`` batch rows the
joins degrade to plain hash joins on (fingerprint / band value).

Near-dup semantics: estimated Jaccard = fraction of agreeing minhash
components ≥ threshold. With n_hashes=16 / threshold 0.9 that means
≥ 15 of 16 agree, which PIGEONHOLES at least 3 of the 4 bands into
exact collision — so banded candidate generation loses nothing, and a
threshold-only oracle (cross join + agreement count) expresses the
same result set exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens
from .text_dedup import MAX_BROADCAST_SIGNATURES

N_HASHES = 16
BANDS = 4
THRESHOLD = 0.9
# ceil(n_hashes * threshold) agreeing components ⇒ est. jaccard ≥ threshold
MIN_AGREE = math.ceil(N_HASHES * THRESHOLD)


def signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    bands: int = BANDS,
) -> DataFrame:
    """Per-document signature row — a pure projection (no shuffle).

    The minhash components use ``transform`` + ``array_min`` over the
    distinct-token array instead of the explode + groupBy path: identical
    values (same md5 hash family, same min), but building dedup STATE
    must not cost a corpus-wide shuffle, and the per-row form keeps the
    store write a single map-only stage at any corpus size.
    """
    rows_per_band = n_hashes // bands
    dt = F.array_distinct(tokens(F.col(text_col)))

    # ONE aggregate pass accumulating all n mins at once instead of n
    # independent transform+array_min columns: same md5 count but a
    # single traversal of the token array, measured 1.3x faster steady-
    # state and ~2.5x cheaper on first run (the n-column form compiles n
    # separate higher-order evaluators). 'g' sorts after every md5 hex
    # char, so it is the identity for least(); an empty token array is
    # mapped back to the NULL the old array_min form produced.
    # Single-arg element lambda: a two-arg lambda would be bound by the
    # higher-order function as (element, INDEX) and silently hash with
    # the array position instead of the family index.
    acc = F.aggregate(
        dt,
        F.array_repeat(F.lit("g"), n_hashes),
        lambda a, t: F.array(
            *[
                F.least(a[i], F.md5(F.concat(F.lit(f"{i}:"), t)))
                for i in range(n_hashes)
            ]
        ),
    )
    staged = df.select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
        acc.alias("_a"),
        (F.size(dt) == 0).alias("_nodt"),
    )
    out = staged.select(
        id_col,
        "fingerprint",
        *[
            F.when(~F.col("_nodt"), F.col("_a")[i]).alias(f"mh{i}")
            for i in range(n_hashes)
        ],
    )
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    return out.select(id_col, "fingerprint", *[f"mh{i}" for i in range(n_hashes)], *band_cols)


def _probe_values(sig: DataFrame, bands: int) -> DataFrame:
    """Stack every store key a batch can probe with — the fingerprint and
    each band hash — into one string column (namespaced so a fingerprint
    can never alias a band value in the shared Bloom filter)."""
    parts = [
        sig.select(F.concat(F.lit("fp:"), F.col("fingerprint")).alias("v"))
    ] + [
        sig.select(
            F.concat(F.lit(f"b{b}:"), F.col(f"band{b}").cast("string")).alias("v")
        )
        for b in range(bands)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_signature_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    mode: str = "overwrite",
    n_hashes: int = N_HASHES,
    bands: int = BANDS,
    with_bloom: bool = False,
) -> None:
    """Persist the signature store (parquet). ``mode="append"`` is the
    daily-ingest path: yesterday's files are untouched — signatures are
    never recomputed for documents already in the store.

    ``with_bloom=True`` also writes a Bloom word table (``<path>_bloom``)
    over every probe key (fingerprint + band hashes). Appends just append
    word rows — the filter is mergeable, so the loader re-ORs duplicate
    words and yesterday's bloom rows are likewise never recomputed."""
    sig = signature_table(df, id_col, text_col, n_hashes, bands)
    sig.write.mode(mode).parquet(path)
    if with_bloom:
        from . import bloom

        # derive the filter from the just-written parquet, not the text
        # plan: a column-pruned scan of (fingerprint, band*) beats
        # re-tokenizing the batch, and an append sees only the new files'
        # rows if the caller filters — here geometry makes appends safe
        # regardless (duplicate word rows re-OR at load)
        written = sig.sparkSession.read.parquet(path)
        if mode == "append":
            # only the new batch's keys need new word rows; re-deriving
            # them from the in-plan signatures avoids re-reading the
            # whole store (old keys are already in the existing bloom)
            written = sig
        bloom.build(_probe_values(written, bands), "v").write.mode(mode).parquet(
            path + "_bloom"
        )


def match_against_corpus(
    batch_sig: DataFrame,
    corpus_sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    bands: int = BANDS,
    min_agree: int = MIN_AGREE,
) -> DataFrame:
    """Match batch signatures against corpus signatures.

    Returns one row per batch document:
    ``(doc_id, dup_of_corpus BOOLEAN, matched_id BIGINT, match_kind)``
    with ``matched_id = -1`` / ``match_kind = 'none'`` for novel docs
    (sentinels, not NULLs — the external comparator's canonicalizer is
    NULL-hostile). Exact fingerprint matches take precedence over near
    matches; ties resolve to the minimum corpus id (deterministic).

    Shuffle shape: the corpus side is only ever PROBED — when the batch
    fits the broadcast guard, the fingerprint join and all band joins
    are broadcast hash joins, so the corpus store streams through
    map-side with no exchange at any corpus size.

    The batch signature table is materialized once up front
    (``localCheckpoint``): it feeds the count, the fused probe join and
    the novel-doc left join, and re-running the 16-hash projection per
    consumer multiplies the batch's signature cost (measured 2x
    end-to-end on d21 with the pre-r14 6-consumer shape). Batch-sized state, bounded by the
    daily ingest. The CORPUS side is left lazy on purpose: when it comes
    from the parquet store a re-scan is a cheap column-pruned read, and
    materializing a corpus-sized table is exactly what the store exists
    to avoid — in-plan callers (the registered d21) checkpoint their own
    derived corpus signatures instead.
    """
    batch_sig = batch_sig.localCheckpoint()
    batch_n = batch_sig.count()
    bc = batch_n <= MAX_BROADCAST_SIGNATURES
    from .decisions import record

    record(
        "incremental_dedup",
        n=batch_n,
        max_broadcast=MAX_BROADCAST_SIGNATURES,
        path="broadcast" if bc else "hash_join",
    )

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bc else df

    # ONE exploded-key probe join for the fingerprint AND every near-dup
    # candidate key (r14 optimization — the corpus store streams through
    # exactly once instead of once per probe branch, 5 column-pruned
    # corpus scans → 1):
    #
    # - Candidate keys are BAND COMBINATIONS, not single bands. Component
    #   agreement ≥ min_agree allows at most (n_hashes - min_agree)
    #   disagreeing components, and one disagreement breaks at most one
    #   band — so every true near match collides EXACTLY on at least
    #   g = bands - (n_hashes - min_agree) full bands, and keying on
    #   size-g band subsets (C(bands, g) keys per row) is COMPLETE by the
    #   same pigeonhole the module docstring proves for single bands.
    #   The finer key is what kills the mega-bucket candidate mass: the
    #   sf0.1 corpus puts ~46% of documents in one band-0 bucket (shared
    #   boilerplate), and the single-band probe emitted ~n² candidates
    #   there only for the agreement filter to reject them — measured as
    #   a 2.2 s 16-task verification stage at sf0.1; a skeleton pair now
    #   has to share g full bands (g·rows_per_band minhash components)
    #   before it ever reaches the shuffle/broadcast.
    # - The fingerprint probe rides the same join as key index
    #   C(bands, g) with an xxhash64'd key, re-checked exactly on the
    #   carried fingerprint strings post-join (a 2⁻⁶⁴ hash merge can
    #   never fabricate an exact match).
    # - First-match emission is an integer post-filter (combo c matches
    #   ⟺ key equality; every earlier combo must have a differing band),
    #   so each (batch, corpus) candidate still surfaces exactly once.
    # - One groupBy then folds exact and near winners in the SAME pass.
    from itertools import combinations

    mis = max(0, n_hashes - min_agree)
    g = max(1, bands - mis)
    combos = list(combinations(range(bands), g))
    n_combos = len(combos)

    def _key_exprs(prefix: str) -> list:
        return [
            F.xxhash64(*[F.col(f"{prefix}band{b}") for b in combo])
            for combo in combos
        ] + [F.xxhash64(F.col(f"{prefix}fingerprint"))]

    corp_expl = corpus_sig.select(
        F.col(id_col).alias("_cid"),
        F.col("fingerprint").alias("_cfp"),
        *[F.col(f"mh{i}").alias(f"_c_mh{i}") for i in range(n_hashes)],
        *[F.col(f"band{b}").alias(f"_c_band{b}") for b in range(bands)],
        F.posexplode(F.array(*_key_exprs(""))).alias("_kidx", "_key"),
    )
    b_cols = [
        F.col(id_col).alias("_bid"),
        F.col("fingerprint").alias("_b_fingerprint"),
    ] + [
        F.col(c).alias(f"_b_{c}")
        for c in batch_sig.columns
        if c.startswith(("mh", "band"))
    ]
    # key exprs reference the ORIGINAL column names (not the _b_ aliases
    # defined in this same select — a lateral alias under a generator is
    # unsupported); both frames carry the same source column names
    batch_expl = batch_sig.select(
        *b_cols,
        F.posexplode(F.array(*_key_exprs(""))).alias("_bkidx", "_bkey"),
    )
    joined = corp_expl.join(
        _maybe_b(batch_expl),
        (F.col("_kidx") == F.col("_bkidx")) & (F.col("_key") == F.col("_bkey")),
    )

    agree = None
    for i in range(n_hashes):
        term = (F.col(f"_c_mh{i}") == F.col(f"_b_mh{i}")).cast("int")
        agree = term if agree is None else agree + term

    def _combo_match(ci: int) -> F.Column:
        c = None
        for b in combos[ci]:
            t = F.col(f"_c_band{b}") == F.col(f"_b_band{b}")
            c = t if c is None else c & t
        return c

    is_exact = (F.col("_kidx") == n_combos) & (
        F.col("_cfp") == F.col("_b_fingerprint")
    )
    near_first = None
    for ci in range(n_combos):
        t = F.col("_kidx") == F.lit(ci)
        for cj in range(ci):
            t = t & ~_combo_match(cj)
        near_first = t if near_first is None else near_first | t
    is_near = near_first & (agree >= F.lit(min_agree))

    hits = (
        joined.select(
            "_bid",
            "_cid",
            is_exact.alias("_is_exact"),
            is_near.alias("_is_near"),
        )
        .where(F.col("_is_exact") | F.col("_is_near"))
        .groupBy("_bid")
        .agg(
            F.min(F.when(F.col("_is_exact"), F.col("_cid"))).alias("_exact_id"),
            F.min(F.when(F.col("_is_near"), F.col("_cid"))).alias("_near_id"),
        )
    )
    out = (
        batch_sig.select(id_col)
        .join(hits, batch_sig[id_col] == hits["_bid"], "left")
        .drop("_bid")
    )
    matched = F.coalesce(F.col("_exact_id"), F.col("_near_id"))
    return out.select(
        id_col,
        matched.isNotNull().alias("dup_of_corpus"),
        F.coalesce(matched, F.lit(-1)).cast("bigint").alias("matched_id"),
        F.when(F.col("_exact_id").isNotNull(), F.lit("exact"))
        .when(F.col("_near_id").isNotNull(), F.lit("near"))
        .otherwise(F.lit("none"))
        .alias("match_kind"),
    )


def dedup_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    bands: int = BANDS,
    use_bloom: bool = False,
) -> DataFrame:
    """The daily-ingest entry point: signature the new batch (one map-only
    pass over batch text) and match it against the persisted store. The
    corpus is represented ONLY by its signature parquet — no corpus text
    is read and no old signature is recomputed (the resume test asserts
    the plan touches nothing but the store path).

    ``use_bloom=True`` (requires a store written ``with_bloom=True``)
    prefilters the batch through the persisted Bloom word table: a batch
    row none of whose probe keys (fingerprint, any band hash) might be in
    the store is DEFINITELY novel — it skips every store join and goes
    straight to the 'none' verdict. Zero false negatives, so results are
    identical to the unfiltered path; the store joins then run only on
    the filter's survivors, which for a mostly-novel daily batch is the
    difference between joining everything and joining almost nothing.
    """
    corpus_sig = spark.read.parquet(store_path)
    batch_sig = signature_table(batch, id_col, text_col, n_hashes, bands)
    if use_bloom:
        from . import bloom

        words = bloom.merge(spark.read.parquet(store_path + "_bloom"))
        flagged = batch_sig
        probes = [("fp:", F.col("fingerprint"))] + [
            (f"b{b}:", F.col(f"band{b}").cast("string")) for b in range(bands)
        ]
        hit = F.lit(False)
        for i, (ns, val) in enumerate(probes):
            flagged = flagged.withColumn(f"_pk{i}", F.concat(F.lit(ns), val))
            flagged = bloom.with_might_contain(
                flagged, f"_pk{i}", words, out=f"_mc{i}"
            )
            hit = hit | F.col(f"_mc{i}")
        flagged = flagged.withColumn("_candidate", hit).drop(
            *[c for i in range(len(probes)) for c in (f"_pk{i}", f"_mc{i}")]
        )
        flagged = flagged.localCheckpoint()  # read twice: survivors + pruned
        survivors = flagged.where(F.col("_candidate")).drop("_candidate")
        pruned = flagged.where(~F.col("_candidate")).select(
            F.col(id_col),
            F.lit(False).alias("dup_of_corpus"),
            F.lit(-1).cast("bigint").alias("matched_id"),
            F.lit("none").alias("match_kind"),
        )
        from .decisions import record

        record(
            "incremental_dedup_bloom",
            n=batch_sig.count(),
            survivors=survivors.count(),
            path="bloom_prefilter",
        )
        matched = match_against_corpus(
            survivors, corpus_sig, id_col=id_col, n_hashes=n_hashes, bands=bands
        )
        return matched.unionByName(pruned)
    return match_against_corpus(
        batch_sig, corpus_sig, id_col=id_col, n_hashes=n_hashes, bands=bands
    )


def cluster_merge_audit(
    new_ids: DataFrame,
    matches: DataFrame,
    frozen: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental cluster maintenance against a FROZEN store: per new
    document, fold its verified matches to stored documents through the
    store's labels and emit the merge-audit row — the keyed-joins-only
    core of d68 (no CC anywhere).

    ``new_ids``: (id_col) — today's batch. ``matches``: (nd, sd) —
    verified near-dup pairs, new side / stored side. ``frozen``:
    (id_col, fc) — the store's member→canonical map as of the last full
    resolution. Actions: 'attached' (matches span one stored cluster),
    'merges' (≥2 — the store is STALE relative to today's edge set;
    production queues the affected clusters for the next full
    resolution instead of re-clustering the corpus), 'new_cluster' (no
    match; the doc opens its own cluster). When the store was resolved
    over an edge set that already contains today's bridges, 'merges'
    cannot occur — its absence is the store-consistency check, and the
    branch is proven on a deliberately stale store in
    tests/test_incremental_dedup.py."""
    m = (
        matches.join(
            frozen.select(F.col(id_col).alias("sd"), "fc"), "sd"
        )
        .groupBy("nd")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.count_distinct("fc").alias("n_clusters"),
            F.min("fc").alias("mc"),
        )
    )
    return new_ids.join(
        m, new_ids[id_col] == m["nd"], "left"
    ).select(
        id_col,
        F.coalesce("n_matches", F.lit(0)).cast("bigint")
        .alias("n_matches"),
        F.coalesce("n_clusters", F.lit(0)).cast("bigint")
        .alias("n_stored_clusters"),
        F.coalesce("mc", F.col(id_col)).cast("bigint")
        .alias("canonical_id"),
        F.when(F.col("nd").isNull(), "new_cluster")
        .when(F.col("n_clusters") == 1, "attached")
        .otherwise("merges")
        .alias("action"),
    )
