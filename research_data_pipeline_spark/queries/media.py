"""Multimodal column queries (m01–m04).

The blobs are synthesized deterministically from ``documents`` (see
multimodal/synth.py), so every byte-level mapInPandas operator is checked
against a DuckDB oracle that re-derives the same bytes from md5 hex —
an independent implementation path end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import media_table, ops
from ..multimodal.synth import MEDIA_CTE, MEDIA_CTE_ALL, md5_byte_sql
from ..registry import REGISTRY
from ..tables import load

_BYTE = md5_byte_sql("text", "i")

# distinct bytes of each blob (positions 1..16 of md5; the payload repeats
# them r times)
_BYTES_CTE = f"""
    bytes AS (
        SELECT doc_id, i, {_BYTE} AS b
        FROM media, UNNEST(generate_series(1, 16)) AS t(i)
    )
"""


@REGISTRY.add(
    "m01_media_metadata",
    # MEDIA_CTE_ALL (not the NULL-filtered default): the ingest inventory
    # keeps broken rows — a NULL payload surfaces as NULL n_bytes/magic on
    # both engines, same as Spark's length(NULL)/hex(NULL).
    f"""
    WITH media AS ({MEDIA_CTE_ALL})
    SELECT doc_id, kind, n_bytes,
           substring(md5(text), 1, 8) AS magic,
           width, height, sample_rate, n_frames
    FROM media
    """,
    "multimodal",
)
def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata columns (ingest shape).

    Metadata and the blob prefix come from JVM builtins (length/substring/
    hex over binary) — no Python in the plan; a filter on ``kind`` or
    ``width`` would prune at the Parquet scan without touching bytes.
    """
    m = media_table(load(spark, sf_dir, "documents"))
    return m.select(
        "doc_id",
        "kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(payload, 1, 4)"))).alias("magic"),
        "width",
        "height",
        "sample_rate",
        "n_frames",
    )


@REGISTRY.add(
    "m02_media_decode_stats",
    f"""
    WITH media AS ({MEDIA_CTE}), {_BYTES_CTE}
    SELECT m.doc_id, m.kind, m.n_bytes,
           AVG(b.b) AS mean_byte,
           CAST(MAX(b.b) AS BIGINT) AS max_byte,
           CAST(SUM(b.b) * m.r AS BIGINT) AS byte_sum
    FROM media m JOIN bytes b ON b.doc_id = m.doc_id
    GROUP BY m.doc_id, m.kind, m.n_bytes, m.r
    """,
    "multimodal",
    "pandas-udf",
)
def m02_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode every blob in one Arrow-batched mapInPandas pass
    (byte count / mean / max / checksum), oracle-checked byte-for-byte."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.decode_stats(m)


@REGISTRY.add(
    "m03_frame_sample",
    f"""
    WITH media AS ({MEDIA_CTE}),
    frames AS (
        SELECT doc_id, text, n_bytes, unnest(generate_series(0, n_frames - 1)) AS idx,
               n_bytes // n_frames AS frame_len
        FROM media WHERE kind = 'video'
    )
    SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
           CAST(idx * frame_len AS BIGINT) AS offset,
           CAST(frame_len AS BIGINT) AS frame_len,
           CAST({md5_byte_sql("text", "(idx * frame_len) % 16 + 1")} AS BIGINT)
               AS first_byte
    FROM frames WHERE idx % 2 = 0
    """,
    "multimodal",
    "pandas-udf",
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: metadata filter prunes to kind='video'
    BEFORE the UDF, payload split into n_frames, every 2nd frame kept."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.sample_frames(m, every=2)


@REGISTRY.add(
    "m04_byte_histogram",
    f"""
    WITH media AS ({MEDIA_CTE}), {_BYTES_CTE}
    SELECT doc_id,
           SUM(CASE WHEN b < 64 THEN 1 ELSE 0 END) / 16.0 AS h0,
           SUM(CASE WHEN b >= 64 AND b < 128 THEN 1 ELSE 0 END) / 16.0 AS h1,
           SUM(CASE WHEN b >= 128 AND b < 192 THEN 1 ELSE 0 END) / 16.0 AS h2,
           SUM(CASE WHEN b >= 192 THEN 1 ELSE 0 END) / 16.0 AS h3
    FROM bytes GROUP BY doc_id
    """,
    "multimodal",
    "pandas-udf",
    "features",
)
def m04_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (normalized byte histogram — the embedding-model
    stand-in) via mapInPandas; fraction over the repeated payload equals
    the oracle's fraction over the 16 distinct bytes exactly."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.byte_histogram_features(m, bins=4)


# ---------------------------------------------------------------------------
_SHARD_BYTES = 4096

_SHARD_ORACLE = f"""
    -- MEDIA_CTE_ALL: the packer sees every row; a NULL payload has NULL
    -- n_bytes, which SUM OVER skips in both engines (running unchanged)
    -- and whose shard_id is NULL — identical to Spark's length(NULL).
    WITH media AS ({MEDIA_CTE_ALL}),
    c AS (
        -- CAST: DuckDB window SUM(BIGINT) -> HUGEINT -> float64 in fetchdf(),
        -- while Spark emits int64; pin to BIGINT so the value hashes match.
        SELECT doc_id, kind, n_bytes,
               CAST(SUM(n_bytes) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running
        FROM media
    )
    SELECT doc_id, kind, n_bytes, running,
           CAST((running - n_bytes) // {_SHARD_BYTES} AS BIGINT) AS shard_id
    FROM c
"""


@REGISTRY.add("m05_shard_packing", _SHARD_ORACLE, "multimodal", "packing")
def m05_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack media blobs into ~{_SHARD_BYTES}-byte archive shards by global
    running byte count — the WebDataset/tar-shard layout step, via the
    same two-phase ``scalable_prefix_sum`` as d14 (no single-partition
    window; byte sizes come from ``length(payload)``, no decode)."""
    from ..operators.ranks import scalable_prefix_sum

    m = media_table(load(spark, sf_dir, "documents")).select(
        "doc_id", "kind", F.length("payload").cast("bigint").alias("n_bytes")
    )
    c = scalable_prefix_sum(m, "doc_id", "n_bytes", out="running")
    return c.select(
        "doc_id", "kind", "n_bytes", "running",
        F.expr(f"(running - n_bytes) div {_SHARD_BYTES}").alias("shard_id"),
    )


# ---------------------------------------------------------------------------
# m06: exact media dedup — duplicate binary payloads collapse to a
# canonical owner, keyed Spark-side by md5 OVER THE RAW BYTES while the
# oracle groups by the blob's derivation inputs (md5(text), repeat
# count): two independent definitions of payload identity that must
# produce identical groups. One hash groupBy + one join back — the d04/
# d05 shape applied to binary columns.
_MEDIA_DEDUP_ORACLE = f"""
    WITH media AS (
        SELECT doc_id, md5(text) AS h, CAST(1 + doc_id % 7 AS BIGINT) AS r
        FROM documents
    ),
    g AS (
        SELECT h, r, MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM media GROUP BY h, r
    )
    SELECT m.doc_id, g.canonical_id, g.n_copies,
           m.doc_id = g.canonical_id AS is_canonical
    FROM media m JOIN g USING (h, r)
"""


@REGISTRY.add("m06_media_exact_dedup", _MEDIA_DEDUP_ORACLE, "multimodal", "dedup")
def m06_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media dedup: md5 over the payload BINARY (JVM-side,
    no decode) → canonical min-doc_id owner + copy count per blob."""
    m = media_table(load(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("payload").alias("ph")
    )
    g = m.groupBy("ph").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return m.join(g, "ph").select(
        "doc_id",
        "canonical_id",
        F.col("n_copies").cast("bigint").alias("n_copies"),
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# m07: frame-level dedup — the video analogue of d22's chunk dedup: how
# much of each clip is repeated frames (near-static content a curation
# pipeline downsamples or drops). Spark hashes the REAL frame bytes in
# one mapInPandas pass; the oracle re-derives each frame's byte STRING
# from md5 hex — two independent identity functions, equal because the
# per-frame md5 is injective on these byte sequences.
_FRAME_DEDUP_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    frames AS (
        SELECT doc_id, n_frames, text, n_bytes // n_frames AS flen,
               unnest(generate_series(0, n_frames - 1)) AS j
        FROM media WHERE kind = 'video'
    ),
    fid AS (
        SELECT doc_id, n_frames,
               array_to_string(
                   [CAST({md5_byte_sql("text", "((j * flen + k) % 16) + 1")} AS VARCHAR)
                    FOR k IN generate_series(0, flen - 1)], ',') AS fstr
        FROM frames
    )
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT fstr) AS BIGINT) AS n_distinct_frames,
           1.0 - CAST(COUNT(DISTINCT fstr) AS DOUBLE) / n_frames AS dup_frame_ratio
    FROM fid GROUP BY doc_id, n_frames
"""


@REGISTRY.add("m07_frame_dedup", _FRAME_DEDUP_ORACLE, "multimodal", "dedup")
def m07_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video distinct-frame count and duplicate-frame ratio
    (multimodal/ops.frame_hash_stats; metadata filter prunes to video
    before any bytes reach Python)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.frame_hash_stats(m)


# ---------------------------------------------------------------------------
# m08: the REAL PNG codec on fleet data — encode each image payload (as a
# 4-row gray bitmap) to an actual PNG, decode it back through
# multimodal/png.py, and emit decode-side pixel stats plus a
# pixel-exact roundtrip flag. The oracle computes the same stats from
# the source bytes directly: lossless encode→decode means any codec bug
# (wrong unfilter, bad IDAT split) shifts pixel_sum or flips
# roundtrip_ok. Filters rotate per doc (doc_id % 5) so None/Sub/Up/
# Average/Paeth all run on real data, not just in unit tests.
_PNG_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}), {_BYTES_CTE}
    SELECT m.doc_id,
           CAST(m.n_bytes / 4 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           CAST(SUM(b.b) * m.r AS BIGINT) AS pixel_sum,
           CAST(MAX(b.b) AS BIGINT) AS max_pixel,
           TRUE AS roundtrip_ok
    FROM media m JOIN bytes b ON b.doc_id = m.doc_id
    WHERE m.kind = 'image'
    GROUP BY m.doc_id, m.n_bytes, m.r
"""


@REGISTRY.add("m08_png_roundtrip", _PNG_ORACLE, "multimodal", "codec")
def m08_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG encode→decode over every image payload with pixel-exact
    verification (multimodal/ops.png_roundtrip_stats)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.png_roundtrip_stats(m)


# ---------------------------------------------------------------------------
# m09: the REAL WAV codec on fleet data — audio payload bytes as
# little-endian int16 PCM, encoded to an actual WAV container at the
# row's sample_rate, decoded back, verified sample-exact. The oracle
# recomputes the |sample| stats from the md5 byte pairs directly
# (sample_i = b(2i-1) + 256·b(2i), two's complement), so a byte-order or
# header bug in the codec shifts sum_abs / flips roundtrip_ok.
_WAV_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    samples AS (
        SELECT m.doc_id, m.sample_rate, m.r, m.n_bytes,
               {md5_byte_sql('m.text', '((2*s.i - 2) % 16) + 1')}
               + 256 * {md5_byte_sql('m.text', '((2*s.i - 1) % 16) + 1')} AS u
        FROM media m,
             UNNEST(generate_series(1, CAST(m.n_bytes / 2 AS BIGINT))) AS s(i)
        WHERE m.kind = 'audio'
    ),
    signed AS (
        SELECT doc_id, sample_rate, n_bytes,
               u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS v
        FROM samples
    )
    SELECT doc_id,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_bytes / 2 AS BIGINT) AS n_samples,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
           TRUE AS roundtrip_ok
    FROM signed
    GROUP BY doc_id, sample_rate, n_bytes
"""


@REGISTRY.add("m09_wav_roundtrip", _WAV_ORACLE, "multimodal", "codec")
def m09_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV encode→decode over every audio payload with sample-exact
    verification (multimodal/ops.wav_roundtrip_stats)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.wav_roundtrip_stats(m)


# ---------------------------------------------------------------------------
# m10: RESIZE on real pixels — the thumbnail step of an image-curation
# pipeline: decode through the real PNG codec, then 2×2 box-downsample
# with exact integer means (sum div 4, no float kernel). The oracle
# pools the same 2×2 neighborhoods straight from the md5-derived source
# bytes: pixel (i,j) of the 4×W bitmap is payload byte i·W+j (0-based),
# so each thumbnail cell is four byte lookups and one integer div —
# codec and pooling bugs both shift thumb_sum.
_THUMB_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    img AS (
        SELECT doc_id, text, CAST(n_bytes / 4 AS BIGINT) AS w
        FROM media WHERE kind = 'image'
    ),
    cells AS (
        SELECT m.doc_id, m.w,
               ({md5_byte_sql('m.text', '(((2*i.i) * m.w + 2*j.j) % 16) + 1')}
                + {md5_byte_sql('m.text', '(((2*i.i) * m.w + 2*j.j + 1) % 16) + 1')}
                + {md5_byte_sql('m.text', '(((2*i.i + 1) * m.w + 2*j.j) % 16) + 1')}
                + {md5_byte_sql('m.text', '(((2*i.i + 1) * m.w + 2*j.j + 1) % 16) + 1')}
               ) // 4 AS tp
        FROM img m,
             UNNEST(generate_series(0, 1)) AS i(i),
             UNNEST(generate_series(0, CAST(m.w / 2 AS BIGINT) - 1)) AS j(j)
    )
    SELECT doc_id,
           CAST(w / 2 AS BIGINT) AS thumb_w,
           CAST(2 AS BIGINT) AS thumb_h,
           CAST(SUM(tp) AS BIGINT) AS thumb_sum,
           CAST(MAX(tp) AS BIGINT) AS thumb_max
    FROM cells
    GROUP BY doc_id, w
"""


@REGISTRY.add("m10_thumbnail", _THUMB_ORACLE, "multimodal", "codec")
def m10_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 integer box-downsample of every image after a real PNG codec
    trip (multimodal/ops.thumbnail_stats)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.thumbnail_stats(m)


# ---------------------------------------------------------------------------
# m11: RESAMPLE on real samples — the audio twin of m10's image resize:
# decode through the real WAV codec, decimate 2:1 by pair-averaging
# with FLOOR division (truncation differs between engines on negative
# samples; floor is exactly expressible in both). The oracle rebuilds
# the int16 samples from the md5 byte pairs (m09's derivation) and
# floors the same pair means.
_ADS_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    samples AS (
        SELECT m.doc_id, m.sample_rate, m.n_bytes, s.i,
               {md5_byte_sql('m.text', '((2*s.i - 2) % 16) + 1')}
               + 256 * {md5_byte_sql('m.text', '((2*s.i - 1) % 16) + 1')} AS u
        FROM media m,
             UNNEST(generate_series(1, CAST(m.n_bytes / 2 AS BIGINT))) AS s(i)
        WHERE m.kind = 'audio'
    ),
    signed AS (
        SELECT doc_id, sample_rate, n_bytes, i,
               u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS v
        FROM samples
    ),
    pairs AS (
        SELECT a.doc_id, a.sample_rate, a.n_bytes,
               CAST(FLOOR((a.v + b.v) / 2.0) AS BIGINT) AS ds
        FROM signed a JOIN signed b
          ON b.doc_id = a.doc_id AND b.i = a.i + 1
        WHERE a.i % 2 = 1
    )
    SELECT doc_id,
           CAST(sample_rate / 2 AS BIGINT) AS out_rate,
           CAST(n_bytes / 4 AS BIGINT) AS n_out_samples,
           CAST(SUM(ds) AS BIGINT) AS out_sum,
           CAST(MAX(ABS(ds)) AS BIGINT) AS out_peak_abs
    FROM pairs
    GROUP BY doc_id, sample_rate, n_bytes
"""


@REGISTRY.add("m11_audio_downsample", _ADS_ORACLE, "multimodal", "codec")
def m11_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2:1 decimation of every audio payload after a real WAV codec trip
    (multimodal/ops.audio_downsample_stats)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.audio_downsample_stats(m)


# ---------------------------------------------------------------------------
# m12: audio QUALITY GATE on real decoded samples — the media twin of
# d51's text rules: near-clipped / near-silent sample counts, exact
# sum-of-squares (RMS numerator) and peak, computed AFTER a real WAV
# encode→decode trip so a codec bug shifts every stat. The oracle
# reconstructs the same int16 little-endian samples straight from the
# md5-derived payload bytes (8 distinct samples per 16-byte block,
# repeated r times — so every aggregate is the one-block aggregate
# scaled by r) and applies identical thresholds.
_AQ_CLIP, _AQ_SILENT = 30000, 1000
_AQ_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    aud AS (SELECT doc_id, text, r FROM media WHERE kind = 'audio'),
    smp AS (
        SELECT doc_id, r,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
        FROM (
            SELECT doc_id, r,
                   {md5_byte_sql('text', '2*g.i+1')}
                   + 256 * {md5_byte_sql('text', '2*g.i+2')} AS u
            FROM aud, UNNEST(generate_series(0, 7)) AS g(i)
        )
    ),
    agg AS (
        SELECT doc_id, MAX(r) AS r,
               SUM(v * v) AS sq, MAX(ABS(v)) AS pk,
               SUM(CASE WHEN ABS(v) >= {_AQ_CLIP} THEN 1 ELSE 0 END) AS cl,
               SUM(CASE WHEN ABS(v) <= {_AQ_SILENT} THEN 1 ELSE 0 END) AS si
        FROM smp GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(8 * r AS BIGINT) AS n_samples,
           CAST(r * sq AS BIGINT) AS sumsq,
           CAST(pk AS BIGINT) AS peak_abs,
           CAST(r * cl AS BIGINT) AS clipped_n,
           CAST(r * si AS BIGINT) AS silent_n,
           CASE WHEN cl = 0 AND si = 0 THEN 'kept' ELSE 'dropped' END
               AS verdict
    FROM agg
"""


@REGISTRY.add("m12_audio_quality", _AQ_ORACLE, "multimodal", "codec",
              "quality")
def m12_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping/silence/RMS gate over every audio payload after a real
    WAV codec trip (multimodal/ops.audio_quality_stats)."""
    m = media_table(load(spark, sf_dir, "documents"))
    return ops.audio_quality_stats(
        m, clip_abs=_AQ_CLIP, silent_abs=_AQ_SILENT
    )


# ---------------------------------------------------------------------------
# m13: PERCEPTUAL-HASH near-duplicate pairs on REAL decoded pixels — the
# image-dedup step of a multimodal curation pipeline: every image takes
# a 64-bit neighborhood-pair average-hash computed from pixels that went
# through the real PNG encode→decode trip (multimodal/ops.
# perceptual_hash — bit (j, a) set when pixels a and (a+j+1) mod 16 sum
# above twice the global mean), then pairs within hamming ≤ 3 surface
# via the d07 pigeonhole band join (4 bands of 16 bits — ≤3 differing
# bits cannot touch all 4 bands, so a qualifying pair must agree on ≥1
# band and candidates come from an equi-join, never an all-pairs scan).
# The oracle recomputes the hash straight from the md5-derived source
# bytes (encode→decode is lossless, so decode-side pixels equal source
# bytes; any codec corruption shifts the mean or flips pair sums and
# breaks the hash match). The round-8 16-bit form was the suite's one
# super-linear curve (15.5× wall at 30× rows: 2⁴ values per band);
# 16-bit bands collide ~2¹²× less, so the candidate mass stays
# pair-driven, not physics-driven, until n approaches 2¹⁶ — and the
# production knob stays the same: widen the hash / bands, identical
# plan. The hash rides as its four 16-bit band columns, so no 2⁶³
# overflow and no reassembly before the join.
_PH_MAXHAM = 3
_PH_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    b16 AS (
        SELECT doc_id, i, {_BYTE} AS b
        FROM media, UNNEST(generate_series(1, 16)) AS t(i)
        WHERE kind = 'image' AND text IS NOT NULL
    ),
    mn AS (SELECT doc_id, SUM(b) // 16 AS m FROM b16 GROUP BY doc_id),
    bands AS (
        SELECT x.doc_id, tj.j AS band_idx,
               CAST(SUM(CASE WHEN x.b + y.b > 2 * mn.m
                        THEN (1 << (x.i - 1)) ELSE 0 END) AS BIGINT)
                   AS band_val
        FROM b16 x, UNNEST(generate_series(0, 3)) AS tj(j), b16 y, mn
        WHERE y.doc_id = x.doc_id
          AND y.i = 1 + ((x.i - 1 + tj.j + 1) % 16)
          AND mn.doc_id = x.doc_id
        GROUP BY x.doc_id, tj.j
    ),
    ph AS (
        SELECT doc_id,
               MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
               MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
               MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
               MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
        FROM bands GROUP BY doc_id
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT c.i, c.j,
           CAST(bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
              + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
                AS BIGINT) AS hamming
    FROM cand c
    JOIN ph pa ON pa.doc_id = c.i
    JOIN ph pb ON pb.doc_id = c.j
    WHERE bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
        + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
        <= {_PH_MAXHAM}
"""


@REGISTRY.add("m13_phash_pairs", _PH_ORACLE, "multimodal", "dedup", "codec")
def m13_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (hamming ≤ 3 on the 64-bit
    neighborhood-pair hash of real decoded pixels, carried as four
    16-bit bands) via the pigeonhole band join — image dedup with the
    real codec in the loop. With 64 real bits, surviving pairs are true
    payload duplicates: at sf0.01 the corpus has none among images and
    the result is legitimately EMPTY (the 16-bit predecessor's rows
    were chance collisions); the value evidence lives in the sf0.1
    sweep (1 true dup pair), the band-completeness property test, and
    the hash reference unit test."""
    m = media_table(load(spark, sf_dir, "documents"))
    ph = ops.perceptual_hash(m).localCheckpoint()  # two join sides below
    bands = ph.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.expr(
            "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, band_val)"
        ),
    )
    a = bands.select(
        F.col("doc_id").alias("i"),
        *[F.col(f"b{k}").alias(f"pa{k}") for k in range(4)],
        "band_idx", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("j"),
        *[F.col(f"b{k}").alias(f"pb{k}") for k in range(4)],
        "band_idx", "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j", *[f"pa{k}" for k in range(4)],
                *[f"pb{k}" for k in range(4)])
        .distinct()
    )
    ham = F.expr(
        "bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)"
        " + bit_count(pa2 ^ pb2) + bit_count(pa3 ^ pb3)"
    )
    return cand.where(ham <= _PH_MAXHAM).select(
        "i", "j", ham.cast("bigint").alias("hamming")
    )


# ---------------------------------------------------------------------------
# m14: SCENE-CUT detection — the frame-delta pass a video-curation
# pipeline runs before sampling training frames: consecutive frames'
# byte-sum signatures are differenced per video (a keyed LAG window on
# the frames-sized table the decode pass emits, never on bytes), the
# delta normalizes to ppm of the maximum possible (255·frame_len) in
# exact integers, and a cut flags at ≥3% — on these synthetic videos
# frames repeat whenever frame_len ≡ 0 (mod 16), so zero-delta runs and
# real jumps both occur (the same structure m07's dup-frame ratio
# exploits). The oracle re-derives every frame sum from the md5 byte
# cycle.
_CUT_PPM = 30_000
_SCENE_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    vid AS (
        SELECT doc_id, text, n_frames, n_bytes // n_frames AS L
        FROM media WHERE kind = 'video' AND n_frames > 0
    ),
    fb AS (
        SELECT doc_id, p.p // L AS frame_idx, L,
               {md5_byte_sql('text', '(p.p % 16) + 1')} AS b
        FROM vid, UNNEST(generate_series(0, L * n_frames - 1)) AS p(p)
    ),
    fs AS (
        SELECT doc_id, frame_idx, L, SUM(b) AS fsum
        FROM fb GROUP BY 1, 2, 3
    ),
    d AS (
        SELECT doc_id, frame_idx, L, fsum,
               LAG(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS prev
        FROM fs
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(ABS(fsum - prev) AS BIGINT) AS delta_abs,
           CAST(ABS(fsum - prev) * 1000000 // (255 * L) AS BIGINT)
               AS delta_ppm,
           ABS(fsum - prev) * 1000000 // (255 * L) >= {_CUT_PPM} AS is_cut
    FROM d WHERE prev IS NOT NULL
"""


@REGISTRY.add("m14_scene_cuts", _SCENE_ORACLE, "multimodal", "video")
def m14_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame byte-sum deltas per video (exact integer ppm of
    the max possible) with ≥3% flagged as scene cuts; the window runs
    keyed by doc over the frames-sized signature table."""
    from pyspark.sql import Window as W

    m = media_table(load(spark, sf_dir, "documents"))
    fs = ops.frame_sums(m)
    d = fs.select(
        "doc_id", "frame_idx", "frame_len", "frame_sum",
        F.lag("frame_sum").over(
            W.partitionBy("doc_id").orderBy("frame_idx")
        ).alias("prev"),
    ).where(F.col("prev").isNotNull())
    delta_ppm = F.expr(
        "CAST(abs(frame_sum - prev) * 1000000 div (255 * frame_len)"
        " AS BIGINT)"
    )
    return d.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.expr("CAST(abs(frame_sum - prev) AS BIGINT)").alias("delta_abs"),
        delta_ppm.alias("delta_ppm"),
        (delta_ppm >= _CUT_PPM).alias("is_cut"),
    )


# ---------------------------------------------------------------------------
# m15: MEDIA INTEGRITY audit — the ingest gate a multimodal pipeline
# runs before any decode: does the payload's size match its declared
# metadata (videos: n_bytes divisible into n_frames equal frames;
# audio: whole int16 samples; images: 4-row bitmap width)? Pure JVM
# expressions over (kind, n_bytes, metadata) — no bytes reach Python,
# and at 100 TB this predicate prunes at the parquet scan before any
# Arrow batch ships.
_INTEG_ORACLE = f"""
    -- MEDIA_CTE_ALL: the integrity audit is the one consumer that must
    -- SEE broken payloads — a NULL payload (NULL n_bytes) counts as
    -- empty (CASE WHEN n_bytes > 0 falls through on NULL, exactly like
    -- Spark's when(length > 0, 0).otherwise(1)) and never as a shape
    -- mismatch (NULL arithmetic fails every WHEN on both engines).
    WITH media AS ({MEDIA_CTE_ALL})
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(CASE WHEN n_bytes > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_empty,
           CAST(SUM(CASE
                WHEN kind = 'video' AND (n_frames <= 0
                     OR n_bytes % n_frames <> 0) THEN 1
                WHEN kind = 'audio' AND n_bytes % 2 <> 0 THEN 1
                WHEN kind = 'image' AND n_bytes % 4 <> 0 THEN 1
                ELSE 0 END) AS BIGINT) AS n_shape_mismatch
    FROM media GROUP BY kind
"""


@REGISTRY.add("m15_media_integrity", _INTEG_ORACLE, "multimodal", "audit",
              "quality")
def m15_media_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind payload integrity: empty payloads and metadata/size
    shape mismatches, computed metadata-only (no decode, no Python)."""
    m = media_table(load(spark, sf_dir, "documents"))
    nb = F.length("payload")
    mismatch = (
        F.when(
            (F.col("kind") == "video")
            & ((F.col("n_frames") <= 0) | (nb % F.col("n_frames") != 0)),
            1,
        )
        .when((F.col("kind") == "audio") & (nb % 2 != 0), 1)
        .when((F.col("kind") == "image") & (nb % 4 != 0), 1)
        .otherwise(0)
    )
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
        F.sum(F.when(nb > 0, 0).otherwise(1)).cast("bigint")
        .alias("n_empty"),
        F.sum(mismatch).cast("bigint").alias("n_shape_mismatch"),
    )


# ---------------------------------------------------------------------------
# m16: KEYFRAME EXTRACTION at scene cuts — the composition that turns
# m14's detector into curation-ready training data: for each video,
# extract the FIRST frame of every scene (frame 0 opens scene 1; each
# m14 cut at frame f opens a new scene whose keyframe is f). Detection
# runs entirely JVM-side over the frames-sized signature table (one
# frame_sums Arrow pass + a keyed LAG window — the m14 plan, computed
# in ONE branch so the Python pass is not duplicated); the chosen
# indices collapse to a bounded per-video list (≤ n_frames) and a
# second Arrow pass (ops.extract_frames) touches the payload bytes
# exactly once to cut the frames out. The oracle nests m14's CTE chain
# verbatim and re-derives each keyframe's first byte from the md5 byte
# cycle.
_KF_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    vid AS (
        SELECT doc_id, text, n_frames, n_bytes // n_frames AS L
        FROM media
        WHERE kind = 'video' AND n_frames > 0 AND text IS NOT NULL
    ),
    fb AS (
        SELECT doc_id, p.p // L AS frame_idx, L,
               {md5_byte_sql('text', '(p.p % 16) + 1')} AS b
        FROM vid, UNNEST(generate_series(0, L * n_frames - 1)) AS p(p)
    ),
    fs AS (
        SELECT doc_id, frame_idx, L, SUM(b) AS fsum
        FROM fb GROUP BY 1, 2, 3
    ),
    d AS (
        SELECT doc_id, frame_idx, L, fsum,
               LAG(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS prev
        FROM fs
    ),
    keys AS (
        SELECT doc_id, frame_idx, L FROM d
        WHERE frame_idx = 0
           OR (prev IS NOT NULL
               AND ABS(fsum - prev) * 1000000 // (255 * L) >= {_CUT_PPM})
    ),
    ordered AS (
        SELECT k.doc_id, k.frame_idx, k.L, v.text,
               ROW_NUMBER() OVER (PARTITION BY k.doc_id
                                  ORDER BY k.frame_idx) AS scene_idx
        FROM keys k JOIN vid v ON v.doc_id = k.doc_id
    )
    SELECT doc_id,
           CAST(scene_idx AS BIGINT) AS scene_idx,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * L AS BIGINT) AS offset,
           CAST(L AS BIGINT) AS frame_len,
           CAST({md5_byte_sql('text', '(frame_idx * L) % 16 + 1')}
                AS BIGINT) AS first_byte
    FROM ordered
"""


@REGISTRY.add("m16_keyframes", _KF_ORACLE, "multimodal", "video", "dedup")
def m16_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-ready keyframe set per video: the first frame of every
    scene (frame 0 plus each m14 cut frame), detected JVM-side over the
    frames-sized signature table and extracted from the payload in one
    targeted Arrow pass."""
    from pyspark.sql import Window as W

    m = media_table(load(spark, sf_dir, "documents"))
    fs = ops.frame_sums(m)
    d = fs.select(
        "doc_id", "frame_idx", "frame_len", "frame_sum",
        F.lag("frame_sum").over(
            W.partitionBy("doc_id").orderBy("frame_idx")
        ).alias("prev"),
    )
    is_cut = F.col("prev").isNotNull() & (
        F.expr(
            "CAST(abs(frame_sum - prev) * 1000000 div (255 * frame_len)"
            " AS BIGINT)"
        )
        >= _CUT_PPM
    )
    keys = d.where((F.col("frame_idx") == 0) | is_cut).select(
        "doc_id", "frame_idx"
    )
    kf = ops.extract_frames(m, keys)
    return kf.select(
        "doc_id",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy("frame_idx")
        ).cast("bigint").alias("scene_idx"),
        "frame_idx", "offset", "frame_len", "first_byte",
    )


# ---------------------------------------------------------------------------
# m17: AUDIO-FINGERPRINT near-duplicate pairs through the REAL WAV
# codec — m13's image-dedup machinery transposed to the audio
# modality: every clip round-trips the real codec and takes the 64-bit
# neighborhood-pair hash over its decoded PCM BYTE stream
# (multimodal/ops.audio_fingerprint), then pairs within hamming ≤ 3
# surface via the same 4×16-bit pigeonhole band join. The byte view is
# the load-bearing choice: two sample-domain drafts (plain and
# weighted pair sums over the 8 int16 samples) measured 482 and 204
# chance hamming≤3 pairs at sf0.1 because 8 samples span only an
# 8-dim threshold-cell space; the 16-byte view restores m13's ~2⁵³-
# cell spread and the survivors are the true payload duplicates. The
# oracle recomputes from the md5 byte cycle (the codec trip is
# lossless byte-for-byte, little-endian pinned on the Spark side).
_AF_MAXHAM = 3
_AF_ORACLE = f"""
    WITH media AS ({MEDIA_CTE}),
    b16 AS (
        SELECT doc_id, i, {_BYTE} AS b
        FROM media, UNNEST(generate_series(1, 16)) AS t(i)
        WHERE kind = 'audio' AND text IS NOT NULL
    ),
    mn AS (SELECT doc_id, SUM(b) // 16 AS m FROM b16 GROUP BY doc_id),
    bands AS (
        SELECT x.doc_id, tj.j AS band_idx,
               CAST(SUM(CASE WHEN x.b + y.b > 2 * mn.m
                        THEN (1 << (x.i - 1)) ELSE 0 END) AS BIGINT)
                   AS band_val
        FROM b16 x, UNNEST(generate_series(0, 3)) AS tj(j), b16 y, mn
        WHERE y.doc_id = x.doc_id
          AND y.i = 1 + ((x.i - 1 + tj.j + 1) % 16)
          AND mn.doc_id = x.doc_id
        GROUP BY x.doc_id, tj.j
    ),
    ph AS (
        SELECT doc_id,
               MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
               MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
               MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
               MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
        FROM bands GROUP BY doc_id
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT c.i, c.j,
           CAST(bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
              + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
                AS BIGINT) AS hamming
    FROM cand c
    JOIN ph pa ON pa.doc_id = c.i
    JOIN ph pb ON pb.doc_id = c.j
    WHERE bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
        + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
        <= {_AF_MAXHAM}
"""


@REGISTRY.add("m17_audio_fingerprint_pairs", _AF_ORACLE, "multimodal",
              "dedup", "codec")
def m17_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs (hamming ≤ 3 on the 64-bit
    neighborhood-pair fingerprint of real WAV-codec-decoded samples,
    carried as four 16-bit bands) via the pigeonhole band join — the
    audio twin of m13. Surviving pairs are true payload duplicates;
    empty when the corpus has none among audio docs."""
    m = media_table(load(spark, sf_dir, "documents"))
    ph = ops.audio_fingerprint(m).localCheckpoint()  # two join sides
    bands = ph.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.expr(
            "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, band_val)"
        ),
    )
    a = bands.select(
        F.col("doc_id").alias("i"),
        *[F.col(f"b{k}").alias(f"pa{k}") for k in range(4)],
        "band_idx", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("j"),
        *[F.col(f"b{k}").alias(f"pb{k}") for k in range(4)],
        "band_idx", "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j", *[f"pa{k}" for k in range(4)],
                *[f"pb{k}" for k in range(4)])
        .distinct()
    )
    ham = F.expr(
        "bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)"
        " + bit_count(pa2 ^ pb2) + bit_count(pa3 ^ pb3)"
    )
    return cand.where(ham <= _AF_MAXHAM).select(
        "i", "j", ham.cast("bigint").alias("hamming")
    )
