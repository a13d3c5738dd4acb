"""Document deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Design point for 100 TB: never materialize the O(n²) pair space.

- Exact / fingerprint dedup: one hash-groupBy.
- MinHash+LSH: signature is a per-doc aggregation (one shuffle on doc_id
  after the token explode); candidate pairs come from a self-join on
  (band_idx, band_value) — the join key cardinality is the LSH bucket
  space, so only near-duplicates collide.
- SimHash: per-doc 16/64-bit signature; pairing by signature bucket (or,
  below a few million docs, a block-nested pair filter on hamming).
- n-gram Jaccard: candidates via the inverted shingle index (pairs must
  share ≥1 shingle — exact for any threshold > 0).

All hashing is md5-based (JVM builtin) so signatures are reproducible
across engines and runs — no seed state on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens

# above this many documents the per-band self-join build side (≈1 KB per
# signature row) no longer broadcasts; the band joins fall back to plain
# hash joins on the band value — same candidate set, one shuffle per band
MAX_BROADCAST_SIGNATURES = 100_000

# dictionary-vocabulary budget for the fused bitmask verification path —
# a JIT budget, not a memory bound (see token_bitmasks): vocab ≤ 512
# keeps the unrolled mask intersection inside HotSpot's huge-method
# bytecode limit (n_words ≤ 8)
MAX_DICTIONARY_VOCAB = 512


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-text duplicate groups: md5(text) → canonical (min) id + count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def fingerprint_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Near-exact dedup on the sorted-distinct-token fingerprint (robust to
    token order and repetition)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _distinct_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16
) -> DataFrame:
    """MinHash signature over the distinct token set.

    Hash family i = md5("i:" || token); the signature element is the
    lexicographic min — a valid permutation min because md5 is uniform on
    hex strings. One explode + one groupBy(doc) shuffle.
    """
    tok = _distinct_tokens(df, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def token_bitmasks(df: DataFrame, id_col: str, text_col: str,
                   max_vocab: int = MAX_DICTIONARY_VOCAB) -> tuple[DataFrame, int] | None:
    """Dictionary-encode each document's distinct-token SET as an array of
    64-bit mask words, or None when the vocabulary exceeds ``max_vocab``.

    Token-set intersection/union then cost O(vocab/64) bit-ops per pair
    instead of a per-pair array hash intersection. The vocabulary table
    is tiny by construction (≤ max_vocab), so both the token→bit join
    and the mask lookup broadcast.

    ``max_vocab`` is a JIT budget, not a memory bound (r12, measured at
    the 100× grid): the mask intersection unrolls to ~3×n_words
    popcount terms inside the consumer's generated code, and once that
    method passes HotSpot's huge-method bytecode limit it is never
    JIT-compiled — n_words=7 ran at full speed while n_words=33 fell
    off the cliff and ran INTERPRETED, 10×+ slower than plain int-array
    intersection. vocab ≤ 512 keeps n_words ≤ 8, comfortably inside the
    budget; larger vocabularies take the int-id array path, which is a
    small always-JIT expression.
    """
    from pyspark.sql import Window as W

    tok = _distinct_tokens(df, id_col, text_col)
    vocab = tok.select("token").distinct()
    n_vocab = vocab.count()  # driver scalar, bounded by max_vocab probe
    if n_vocab > max_vocab:
        return None
    n_words = (n_vocab + 63) // 64
    vocab_ids = vocab.select(
        # single-partition window BY DESIGN: input is the vocab table,
        # bounded <= max_vocab by the probe above (WindowExec's warning
        # fires but the input is dictionary-sized; a constant partition
        # key cannot silence it — Catalyst folds literals out of the spec)
        "token",
        (F.row_number().over(W.orderBy("token")) - 1).alias("tid"),
    )
    with_tid = tok.join(F.broadcast(vocab_ids), "token")
    word_aggs = [
        F.bit_or(
            F.when(
                (F.col("tid") / 64).cast("int") == w,
                F.expr("shiftleft(cast(1 as bigint), cast(tid % 64 as int))"),
            ).otherwise(0)
        ).alias(f"w{w}")
        for w in range(n_words)
    ]
    masks = (
        with_tid.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), *word_aggs)
        .select(
            id_col,
            "n_tokens",
            F.array(*[F.col(f"w{w}") for w in range(n_words)]).alias("mask"),
        )
    )
    return masks, n_words


def _dictionary_minhash_table(
    tok: DataFrame, id_col: str, n_hashes: int, vocab: list[str]
) -> tuple[DataFrame, int]:
    """Fused per-document (minhash signature, token bitmask) table over a
    driver-collected dictionary vocabulary (≤ the JIT budget — see
    ``token_bitmasks``; over it the caller's int-id array path is
    strictly faster because its generated code stays JITable).

    The n_hashes md5 hash families AND the bit ids are computed in
    PYTHON on the (tiny) vocabulary — ``hashlib.md5`` IS SQL ``md5``, so
    min-hash values are identical — and shipped as an Arrow-backed
    LocalRelation broadcast into the encode join (r15: the previous
    in-plan ``row_number`` window + per-token JVM md5 cost a
    single-partition window and kept the vocabulary derivation lazy in
    every consumer). Signature mins and bitmask words come out of ONE
    groupBy(doc) shuffle. The returned table is LAZY and uncached — the
    caller decides whether its consumption pattern needs a cache.
    """
    import hashlib

    from ..tables import local_df

    n_words = (len(vocab) + 63) // 64
    rows = [
        (
            t,
            tid,
            *[
                hashlib.md5(f"{i}:{t}".encode()).hexdigest()
                for i in range(n_hashes)
            ],
        )
        for tid, t in enumerate(sorted(vocab))
    ]
    vocab_enc = local_df(
        tok.sparkSession,
        rows,
        "token string, tid int, "
        + ", ".join(f"h{i} string" for i in range(n_hashes)),
    )
    with_tid = tok.join(F.broadcast(vocab_enc), "token")
    sig_aggs = [F.min(F.col(f"h{i}")).alias(f"mh{i}") for i in range(n_hashes)]
    word_aggs = [
        F.bit_or(
            F.when(
                (F.col("tid") / 64).cast("int") == w,
                F.expr("shiftleft(cast(1 as bigint), cast(tid % 64 as int))"),
            ).otherwise(0)
        ).alias(f"w{w}")
        for w in range(n_words)
    ]
    combined = (
        with_tid.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), *sig_aggs, *word_aggs)
        .select(
            id_col,
            "n_tokens",
            *[F.col(f"mh{i}") for i in range(n_hashes)],
            F.array(*[F.col(f"w{w}") for w in range(n_words)]).alias("mask"),
        )
    )
    return combined, n_words


def _int_encode_is_lossless(tok: DataFrame, force_strings: bool = False) -> bool:
    """The SINGLE owner of the int-id verification-encode decision
    (advisor r12: two copies of this probe had started to drift).

    Runs the EXACT corpus-wide injectivity probe — one aggregation
    comparing COUNT(DISTINCT token) with COUNT(DISTINCT xxhash64(token))
    — records the ``verify_token_encoding`` decision (the -1/-2 sentinel
    marks a forced string path without paying the probe), and returns
    True iff the xxhash64 encode is provably lossless on this corpus's
    vocabulary, so callers may ``F.xxhash64`` their token elements with
    pair-for-pair identical intersect/union sizes.
    """
    from .decisions import record

    if force_strings:
        n_vocab, n_hashed = -1, -2
    else:
        n_vocab, n_hashed = tok.agg(
            F.countDistinct("token"),
            F.countDistinct(F.xxhash64("token")),
        ).first()
    record(
        "verify_token_encoding",
        n_vocab=n_vocab,
        path="int_ids" if n_vocab == n_hashed else "strings",
    )
    return n_vocab == n_hashed


def _encoded_token_sets(
    df: DataFrame, id_col: str, text_col: str, force_strings: bool = False
) -> DataFrame:
    """Distinct-token sets for exact pair verification, dictionary-encoded
    to 64-bit integer ids when that encode is provably lossless.

    Per-candidate exact verification on mega-cluster corpora is the LSH
    pair stream's 100×-scale wall (SCALE.md round-11-late: ~15 µs per
    string-array intersection × ~1.16e9 candidates ≈ 5 core-hours), and
    integer arrays intersect ~1.9× faster than string arrays (measured on
    the exact wedge stage). The encode is ``xxhash64(token)`` — zero extra
    joins or shuffles — guarded by an EXACT corpus-wide injectivity probe:
    one aggregation comparing COUNT(DISTINCT token) with
    COUNT(DISTINCT xxhash64(token)). Equal counts prove the hash is
    injective on THIS corpus's vocabulary, and an injective element map
    preserves set intersection/union sizes exactly — so every emitted
    (i, j, jaccard) is identical to the string path, pair for pair
    (pinned by tests/test_properties.py). On a hash collision
    (~V²/2⁶⁵ — never observed; the guard exists so the fallback is loud
    in telemetry, not silent corruption) verification falls back to the
    string arrays.
    """
    tok = _distinct_tokens(df, id_col, text_col)
    arr = tokens(F.col(text_col))
    if _int_encode_is_lossless(tok, force_strings):
        arr = F.transform(arr, lambda t: F.xxhash64(t))
    return df.select(F.col(id_col), F.array_distinct(arr).alias("tokens"))


def _mask_intersection_size(ma, mb, n_words: int) -> F.Column:
    # unrolled at plan time: plain codegen expressions, no interpreted
    # higher-order functions in the per-pair hot path
    if n_words == 0:  # empty corpus: no vocabulary, no mask words
        return F.lit(0)
    terms = [
        F.bit_count(F.element_at(ma, w + 1).bitwiseAND(F.element_at(mb, w + 1)))
        for w in range(n_words)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
    materialize: bool = True,
    emit_counts: bool = False,
    emit_est: bool = False,
    verify_encoding: str = "auto",
    escalate_pop: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    token-set Jaccard. Returns (i, j, jaccard), i < j, jaccard ≥ threshold;
    ``emit_counts=True`` adds the exact integer (n_inter, n_union)
    columns so calibration callers (d59) derive integer-ppm similarity
    without a second verification pass; ``emit_est=True`` additionally
    carries the n_hashes signature columns through the band joins and
    emits ``est_match`` (how many components agree) per pair — the
    estimator-calibration column, fused here so callers never rebuild
    the signature pipeline or re-join the signature sides per pair. The
    default output is unchanged by both flags.

    Scale shape: one explode+groupBy for signatures; candidates from a
    hash self-join on (band_idx, xxhash64(band_val)) — a 64-bit join key
    instead of a 128-char concat string; verification is FUSED into the
    band joins on both paths (no per-pair lookup join): bitmask words
    when the vocabulary is dictionary-sized, else int-id-encoded token
    arrays riding the join sides (injectivity-guarded xxhash64 encode,
    ~1.9× per pair vs string arrays; ``verify_encoding="strings"``
    forces the string fallback). On the NON-escalated path the xxhash64
    band key can only ADD candidate pairs (a 2⁻⁶⁴ bucket merge), never
    drop one, and every candidate is verified with exact Jaccard — the
    output is unchanged. Under escalation that invariant weakens by the
    same 2⁻⁶⁴ class: a band-hash bucket merge inflates the window pop
    count and can push a sub-bar bucket over ``escalate_pop``, dropping
    true-band pairs whose (also hashed) full signature differs — a
    ~2⁻⁶⁴-per-bucket-pair divergence from an oracle keyed on the raw
    band values, never observed and far below the md5-collision noise
    floor the signature itself already carries.

    With ``materialize=True`` (default) the pair table is eagerly
    materialized via ``localCheckpoint`` and the internal signature/token
    caches are released before returning — library callers don't leak
    executor memory (same contract as similarity.ann_topk_ivf).
    ``materialize=False`` returns a lazy pair plan and skips the final
    checkpoint; the caller must consume the result once, then clear the
    internal caches. Caveat: when band escalation engages, the
    population pass itself runs EAGERLY in both modes (the banded table
    is localCheckpoint-ed so the per-band count windows execute once,
    not once per join branch, and the signature cache is released then
    and there — nothing left for the caller to clear); the checkpointed
    banded blocks are freed by Spark's ContextCleaner when the returned
    DataFrame is GC'd, in both modes.

    **Mega-cluster band escalation** (``escalate_pop``): real web corpora
    put large fractions of documents into ONE band bucket (shared
    boilerplate skeleton — measured 46% of the sf0.1 corpus in a single
    band-0 bucket, SCALE.md round-11-late), and candidate mass within a
    bucket is pop² while its true near-dup pairs are ~linear — the
    verification stage becomes the first 100 TB wall. Any band bucket
    whose population exceeds ``escalate_pop`` therefore escalates its
    candidacy rule from the rows-per-band band key to the FULL
    signature (rows-per-band → n_hashes: one band of every row): the
    join key itself gets finer, so the quadratic bucket mass collapses
    at the shuffle, not post-hoc. Full-width is the measured choice,
    not caution — on the sf0.1 corpus each band carries its own
    skeleton-dominated mega bucket and a HALF-width extended key only
    splits it in two (raw 2.7-3.6e6 pairs/band → 1.3-1.7e6), while the
    full signature reaches the irreducible floor (~0.77e6/band: 1,219
    documents share an IDENTICAL 16-hash signature, and
    signature-identical docs collide under every banding scheme — LSH
    completeness makes that mass unprunable). This CHANGES emitted
    recall inside mega buckets (a true pair there must now match every
    signature row, P = jaccardⁿ; identical documents always still
    match), so every oracle mirrors the rule exactly
    (queries/docs.py::_band_cand_ctes) and the d55/d59 calibration
    audits re-pin the agreement curve. Corpora with
    ``n_docs <= escalate_pop`` can never reach the bar and skip the
    population pass entirely (plans unchanged).
    """
    from .decisions import record

    rows_per_band = n_hashes // bands
    tok = _distinct_tokens(df, id_col, text_col)
    force_strings = verify_encoding == "strings"
    # ONE probe job for every up-front decision (r15, guide §1.2/§2.4 —
    # previously three serialized barrier jobs, each re-tokenizing the
    # corpus: a vocabulary count behind a throwaway cache, the
    # injectivity aggregation, and a signature count whose only real job
    # was materializing that cache): vocabulary size decides the
    # dictionary-vs-open verification path, countDistinct(xxhash64)
    # proves the int-id encode lossless exactly as before (equal counts
    # ⇔ injective on THIS corpus ⇔ intersect/union sizes preserved), and
    # countDistinct(id) IS the signature-table row count — the same
    # value the old sig.count() returned — for the broadcast and
    # escalation guards.
    n_vocab, n_hashed, n_docs = (
        x or 0
        for x in tok.agg(
            F.countDistinct("token"),
            F.countDistinct(F.xxhash64("token")),
            F.countDistinct(id_col),
        ).first()
    )
    int_ok = (not force_strings) and n_vocab == n_hashed
    record(
        "verify_token_encoding",
        n_vocab=(-1 if force_strings else n_vocab),
        path="int_ids" if int_ok else "strings",
    )
    if n_vocab <= MAX_DICTIONARY_VOCAB:
        # dictionary path: the whole vocabulary is bounded, so collect it
        # (one job, ≤ MAX_DICTIONARY_VOCAB rows) and encode hash families
        # + bit ids driver-side — see _dictionary_minhash_table
        vocab = [r[0] for r in tok.select("token").distinct().collect()]
        combined, n_words = _dictionary_minhash_table(
            tok, id_col, n_hashes, vocab
        )
        sig = combined
    else:
        combined, n_words = None, 0
        # Open vocabulary: the verification arrays are built in the SAME
        # groupBy as the signature (collect_list over the distinct-token
        # stream) and RIDE the band joins exactly like the bitmask
        # path's masks — jaccard is computed inline in each branch, so
        # shuffle volume is bands × (signatures + token sets), never
        # candidate-mass × arrays. The alternative (joining arrays onto
        # the candidate pairs) re-shuffles every candidate row with a
        # token array attached — measured at the 100× grid as a ~70 GB
        # exchange where this shape is megabytes per side. Tokens are
        # int-id-encoded (8-byte elements, ~1.9× faster intersects than
        # strings) under the exact injectivity probe above
        # (``verify_encoding="strings"`` pins the string fallback).
        elem = F.xxhash64("token") if int_ok else F.col("token")
        sig = tok.groupBy(id_col).agg(
            *[
                F.min(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))
                ).alias(f"mh{i}")
                for i in range(n_hashes)
            ],
            F.collect_list(elem).alias("tokens"),
        )
    use_broadcast = n_docs <= MAX_BROADCAST_SIGNATURES
    record(
        "minhash_lsh_pairs",
        n=n_docs,
        max_broadcast=MAX_BROADCAST_SIGNATURES,
        path="broadcast" if use_broadcast else "hash_join",
    )

    def _finish(out: DataFrame) -> DataFrame:
        if materialize:
            out = out.localCheckpoint()
            if not escalation:
                sig.unpersist()
        return out
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    carry = ["n_tokens", "mask"] if combined is not None else ["tokens"]
    if emit_est:
        # calibration callers only: the signature columns ride the band
        # joins (bands × n_hashes × 32-char md5 per doc of extra shuffle,
        # paid only under the flag) so est_match needs no signature
        # re-derivation or per-pair lookup join
        carry = carry + [f"mh{i}" for i in range(n_hashes)]
    # escalation engages only when a bucket COULD exceed the bar (and an
    # extended key exists to escalate to); otherwise no population pass,
    # no extra columns — the plan is byte-identical to the plain path
    escalation = bands > 1 and n_docs > escalate_pop
    record(
        "minhash_lsh_band_escalation",
        n=n_docs,
        escalate_pop=escalate_pop,
        path="escalating" if escalation else "plain",
    )
    if escalation:
        from pyspark.sql import Window as W

        fullsig = F.xxhash64(
            *[F.col(f"mh{i}") for i in range(n_hashes)]
        ).alias("fullsig")
        banded = sig.select(F.col(id_col), *carry, *band_cols, fullsig)
        for b in range(bands):
            banded = banded.withColumn(
                f"pop{b}", F.count(F.lit(1)).over(W.partitionBy(f"band{b}"))
            )
        # one row per doc; materialize so the per-band population windows
        # run once, not once per branch. The signature build runs INSIDE
        # this single checkpoint job (r15: the old shape cached sig and
        # paid a separate count job just to fill that cache, then threw
        # it away here) — sig has exactly one consumer on this path.
        banded = banded.localCheckpoint()
    else:
        # two consumers (both self-join sides read the signature table):
        # cache, materialized lazily by the first side; _finish releases
        sig = sig.cache()
        banded = sig.select(F.col(id_col), *carry, *band_cols)

    # First-match band emission via ONE fused self-join (r14 optimization):
    # a pair colliding in k bands must be verified once, not k times.
    # Each doc row explodes to ``bands`` (band_idx, band_key) entries and
    # the candidate join is a single equi-join on (band_idx, band_key);
    # the first-match rule — band b collides, every earlier band differs
    # — is a cheap integer post-filter on the carried band columns, so
    # each candidate pair still surfaces exactly once. Semantically
    # identical to the previous one-join-branch-per-band union (the
    # branch b join condition WAS band-b equality + this same filter) but
    # the driver plans/codegens ONE join instead of bands×(1..2), and the
    # build side broadcasts once instead of per branch — measured 8.3 →
    # ~5 s on the sf0.1 shared pair stream where the branch plan spent
    # ~4.5 s in driver gaps between jobs. Shuffle volume is unchanged
    # (bands × |docs| rows either way). Below the guard the build side
    # broadcasts (candidate join shuffle-free); above it the join is a
    # plain hash join on the exploded key — the scalable path, chosen
    # exactly like similarity.py's guarded broadcast.
    #
    # Under escalation a row's band-b key is the band value for sub-bar
    # buckets and xxhash64(band value, full signature) for mega buckets —
    # the SAME finer-key collapse of the pop² bucket mass as before (the
    # key itself gets finer at the shuffle/broadcast, not post-hoc). Band
    # values never mix classes (population is a bucket property), and the
    # exact collide predicate is re-checked in the filter, so a 2⁻⁶⁴
    # cross-class key collision adds no candidate the verification
    # doesn't already tolerate elsewhere.
    if escalation:
        key_exprs = [
            F.when(
                F.col(f"pop{b}") <= escalate_pop, F.col(f"band{b}")
            ).otherwise(F.xxhash64(F.col(f"band{b}"), F.col("fullsig")))
            for b in range(bands)
        ]
    else:
        key_exprs = [F.col(f"band{b}") for b in range(bands)]
    expl = banded.select(
        "*", F.posexplode(F.array(*key_exprs)).alias("bidx", "bkey")
    )

    def _collide(bj: int) -> F.Column:
        # exact collide-at-band-bj predicate on the carried columns: band
        # value equal, and — under escalation, when the bucket is mega —
        # full signature equal. a.pop == b.pop whenever the band values
        # match, so a's population decides symmetrically.
        c = F.col(f"a.band{bj}") == F.col(f"b.band{bj}")
        if escalation:
            c = c & (
                (F.col(f"a.pop{bj}") <= escalate_pop)
                | (F.col("a.fullsig") == F.col("b.fullsig"))
            )
        return c

    a, b = expl.alias("a"), expl.alias("b")
    joined = a.join(
        F.broadcast(b) if use_broadcast else b,
        (F.col("a.bidx") == F.col("b.bidx"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    first_match = None
    for bi in range(bands):
        # at bidx == bi: collide(bi) holds (re-checked exactly under
        # escalation, where the hashed key could cross classes; implied
        # by key equality otherwise) and every earlier band must differ
        t = F.col("a.bidx") == F.lit(bi)
        if escalation:
            t = t & _collide(bi)
        for bj in range(bi):
            t = t & ~_collide(bj)
        first_match = t if first_match is None else first_match | t
    if bands > 1 or escalation:
        joined = joined.where(first_match)

    # verification is fused into the candidate joins on BOTH paths:
    # masks (dictionary vocab) or int-id token arrays (open vocab) ride
    # along on both join sides, so jaccard is computed inline and no
    # separate per-pair lookup join exists at all
    if combined is not None:
        inter = _mask_intersection_size(F.col("a.mask"), F.col("b.mask"), n_words)
        union = F.col("a.n_tokens") + F.col("b.n_tokens") - inter
    else:
        inter = F.size(F.array_intersect(F.col("a.tokens"), F.col("b.tokens")))
        union = (
            F.size(F.col("a.tokens")) + F.size(F.col("b.tokens")) - inter
        )
    jac = inter.cast("double") / union
    extra = (
        [
            inter.cast("bigint").alias("n_inter"),
            union.cast("bigint").alias("n_union"),
        ]
        if emit_counts else []
    )
    if emit_est:
        est = None
        for k in range(n_hashes):
            term = F.when(F.col(f"a.mh{k}") == F.col(f"b.mh{k}"), 1).otherwise(0)
            est = term if est is None else est + term
        extra = extra + [est.cast("bigint").alias("est_match")]
    out = (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("i"),
            F.col(f"b.{id_col}").alias("j"),
            "jaccard",
            *extra,
        )
    )
    return _finish(out)


def simhash_values(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-document SimHash over distinct tokens.

    Token hash = first 4 hex chars of md5 (16-bit); each signature bit is
    the sign of the ±1 vote sum across tokens (ties → 1). One explode +
    one groupBy shuffle; signature is a plain integer column.
    """
    tok = _distinct_tokens(df, id_col, text_col)
    h = F.conv(F.substring(F.md5(F.col("token")), 1, bits // 4), 16, 10).cast("bigint")
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance.

    Pigeonhole banding: split the signature into (max_hamming+1)
    contiguous bit bands — a pair within hamming ≤ max_hamming differs
    in at most max_hamming bands, so at least one band matches EXACTLY.
    Candidates come from per-band equi-joins (first-match emission, as
    in ``minhash_lsh_pairs``: band b must match, every earlier band must
    differ, so each pair surfaces once); the exact hamming predicate
    then verifies. Equivalent output to the all-pairs scan, but the join
    keys are band values, never a cross product — the only shape that
    survives 10^9 documents.
    """
    nb = max_hamming + 1
    sizes = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    offsets = [sum(sizes[:i]) for i in range(nb)]
    sig = simhash_values(df, id_col, text_col, bits)
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        *[
            F.shiftright("simhash", offsets[i])
            .bitwiseAND(F.lit((1 << sizes[i]) - 1))
            .alias(f"hband{i}")
            for i in range(nb)
        ],
    ).cache()  # read by every band branch (stream + build sides)
    n_docs = banded.count()  # materializes the cache the branches reuse
    use_broadcast = n_docs <= MAX_BROADCAST_SIGNATURES
    from .decisions import record

    record(
        "simhash_pairs",
        n=n_docs,
        max_broadcast=MAX_BROADCAST_SIGNATURES,
        path="broadcast" if use_broadcast else "hash_join",
    )
    # one fused candidate join over the exploded (band_idx, band_value)
    # stream — same rewrite as minhash_lsh_pairs: the per-band join
    # branches collapse into a single equi-join plus the integer
    # first-match filter (band b matches exactly — key equality — and
    # every earlier band differs), so each pair surfaces once and the
    # driver plans one join instead of nb
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    expl = banded.select(
        "*",
        F.posexplode(
            F.array(*[F.col(f"hband{i}") for i in range(nb)])
        ).alias("bidx", "bkey"),
    )
    a, b = expl.alias("a"), expl.alias("b")
    joined = a.join(
        F.broadcast(b) if use_broadcast else b,
        (F.col("a.bidx") == F.col("b.bidx"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    first_match = None
    for bi in range(nb):
        t = F.col("a.bidx") == F.lit(bi)
        for bj in range(bi):
            t = t & (F.col(f"a.hband{bj}") != F.col(f"b.hband{bj}"))
        first_match = t if first_match is None else first_match | t
    out = (
        joined.where(first_match)
        .withColumn("hamming", ham.cast("bigint"))
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("i"),
            F.col(f"b.{id_col}").alias("j"),
            "hamming",
        )
    )
    if materialize:  # eager result, cache released (see minhash_lsh_pairs)
        out = out.localCheckpoint()
        banded.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.05,
    materialize: bool = True,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard pairs above ``threshold``.

    Candidate generation via the inverted shingle index: a pair with
    Jaccard > 0 shares ≥1 shingle, so grouping the shingle join by pair
    and counting shared shingles is *exact* (no LSH approximation) while
    only touching pairs that collide.
    """
    from pyspark.sql import Window as W

    # shingle stream via posexplode + lead windows: pure codegen + one
    # WindowExec, ~2.4x faster than interpreted per-position array slices
    # (measured at sf0.1), and the distinct exploded postings are exactly
    # what the inverted index needs — no per-doc array ever materializes
    w = W.partitionBy(id_col).orderBy("pos")
    # join on a 64-bit shingle hash, not the shingle text: far less shuffle
    # volume and cheaper equality; a 2⁻⁶⁴ hash merge is the only deviation
    exploded = (
        df.select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token"))
        .select(F.col(id_col), "pos", "token",
                *[F.lead("token", i).over(w) .alias(f"_t{i}") for i in range(1, n)])
        .where(F.col(f"_t{n-1}").isNotNull())
        .select(F.col(id_col),
                F.concat_ws(" ", "token", *[f"_t{i}" for i in range(1, n)]).alias("sh_text"))
        .dropDuplicates([id_col, "sh_text"])
        .select(F.col(id_col), F.xxhash64("sh_text").alias("shingle"))
        .cache()  # read 3x: sizes + both join branches
    )
    sh_sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col(id_col).alias("i"), F.col("shingle"))
    b = exploded.select(F.col(id_col).alias("j"), F.col("shingle"))
    shared = (
        a.join(b, ["shingle"])
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    si = sh_sizes.select(F.col(id_col).alias("i"), F.col("n_sh").alias("n_i"))
    sj = sh_sizes.select(F.col(id_col).alias("j"), F.col("n_sh").alias("n_j"))
    out = (
        shared.join(si, "i")
        .join(sj, "j")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double") / (F.col("n_i") + F.col("n_j") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )
    if materialize:  # eager result, cache released (see minhash_lsh_pairs)
        out = out.localCheckpoint()
        exploded.unpersist()
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_ppm: int = 100_000,
    materialize: bool = True,
) -> DataFrame:
    """Directed n-gram-shingle CONTAINMENT pairs: |A∩B| / |A| ≥ threshold,
    where A is the source doc's distinct shingle set. The asymmetric
    companion to ``ngram_jaccard_pairs`` — a short document quoted inside
    a long one scores near 1.0 here while its Jaccard stays tiny (the
    union is dominated by the long doc), so this is the detector for
    subset duplication: boilerplate blocks, quoted passages, chunk-level
    plagiarism surviving inside larger pages (Broder's containment
    measure, "On the resemblance and containment of documents", 1997).

    Returns (i, j, n_shared, n_i, containment_ppm) for every ORDERED pair
    i≠j with containment(i→j) ≥ threshold — integer parts-per-million
    (n_shared·10⁶ div n_i), so the threshold cut and the emitted score
    are exact in any engine; no float division anywhere.

    Scale shape is d08's inverted shingle index verbatim: candidates come
    from the shingle-keyed self-join (a pair with containment > 0 shares
    ≥1 shingle), so the pair space is Σ posting² per shingle — never
    all-pairs — and both directions of each colliding pair fall out of
    one groupBy. Join rides a 64-bit shingle hash, not shingle text.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    exploded = (
        df.select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token"))
        .select(F.col(id_col), "pos", "token",
                *[F.lead("token", i).over(w).alias(f"_t{i}") for i in range(1, n)])
        .where(F.col(f"_t{n-1}").isNotNull())
        .select(F.col(id_col),
                F.concat_ws(" ", "token", *[f"_t{i}" for i in range(1, n)]).alias("sh_text"))
        .dropDuplicates([id_col, "sh_text"])
        .select(F.col(id_col), F.xxhash64("sh_text").alias("shingle"))
        .cache()  # read 3x: sizes + both join branches
    )
    sh_sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col(id_col).alias("i"), F.col("shingle"))
    b = exploded.select(F.col(id_col).alias("j"), F.col("shingle"))
    shared = (
        a.join(b, ["shingle"])
        .where(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    si = sh_sizes.select(F.col(id_col).alias("i"), F.col("n_sh").alias("n_i"))
    out = (
        shared.join(si, "i")
        .withColumn(
            "containment_ppm",
            F.expr("n_shared * 1000000 div n_i").cast("bigint"),
        )
        .where(F.col("containment_ppm") >= threshold_ppm)
        .select(
            "i", "j",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_i").cast("bigint").alias("n_i"),
            "containment_ppm",
        )
    )
    if materialize:  # eager result, cache released (see minhash_lsh_pairs)
        out = out.localCheckpoint()
        exploded.unpersist()
    return out


def exact_jaccard_ppm(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    left: str = "i",
    right: str = "j",
) -> DataFrame:
    """Attach the exact distinct-token-set Jaccard (integer ppm, BIGINT
    floor division) to a candidate-pair table.

    Fast path: dictionary bitmasks (``token_bitmasks``) when the
    vocabulary is dictionary-sized — per-pair verification is
    O(vocab/64) bit-ops instead of a string-array hash intersection
    (the ~100x that makes calibration over millions of candidates
    tractable). Fallback: per-pair ``array_intersect`` on the
    distinct-token arrays. Both paths compute the identical integer
    (1e6 * |A∩B| div |A∪B|), so downstream parity is path-independent.
    """
    # per-doc lookup sides broadcast below the signature guard (masks are
    # one small row per doc); above it the joins stay keyed shuffles —
    # the same flip minhash_lsh_pairs makes
    n_docs = docs.count()
    use_broadcast = n_docs <= MAX_BROADCAST_SIGNATURES
    from .decisions import record

    record(
        "exact_jaccard_ppm",
        n=n_docs,
        max_broadcast=MAX_BROADCAST_SIGNATURES,
        path="broadcast" if use_broadcast else "hash_join",
    )
    bm = token_bitmasks(docs, id_col, text_col)
    if bm is not None:
        masks, n_words = bm
        if use_broadcast:
            masks = F.broadcast(masks.localCheckpoint())
        ta = masks.select(
            F.col(id_col).alias(left),
            F.col("n_tokens").alias("_na"),
            F.col("mask").alias("_ma"),
        )
        tb = masks.select(
            F.col(id_col).alias(right),
            F.col("n_tokens").alias("_nb"),
            F.col("mask").alias("_mb"),
        )
        inter = _mask_intersection_size(F.col("_ma"), F.col("_mb"), n_words)
        return (
            pairs.join(ta, left)
            .join(tb, right)
            .withColumn("_inter", inter.cast("bigint"))
            .withColumn(
                "jaccard_ppm",
                F.expr(
                    "CAST(1000000 * _inter div (_na + _nb - _inter) AS BIGINT)"
                ),
            )
            .drop("_na", "_nb", "_ma", "_mb", "_inter")
        )
    # same int-id verification lever as minhash_lsh_pairs' open-vocab
    # path: ~1.9x per-pair when the injectivity probe holds, integer
    # (inter, union) counts identical by injectivity either way
    toks = _encoded_token_sets(docs, id_col, text_col).withColumnRenamed(
        "tokens", "_t"
    )
    if use_broadcast:
        toks = F.broadcast(toks)
    return (
        pairs.join(toks.select(F.col(id_col).alias(left),
                               F.col("_t").alias("_ta")), left)
        .join(toks.select(F.col(id_col).alias(right),
                          F.col("_t").alias("_tb")), right)
        .withColumn(
            "_inter", F.size(F.array_intersect("_ta", "_tb")).cast("bigint")
        )
        .withColumn("_union",
                    (F.size("_ta") + F.size("_tb")).cast("bigint") - F.col("_inter"))
        .withColumn(
            "jaccard_ppm",
            F.expr("CAST(1000000 * _inter div _union AS BIGINT)"),
        )
        .drop("_ta", "_tb", "_inter", "_union")
    )
